"""Multimodal column pattern: opaque binary payloads + typed metadata.

Driver-mandated extension (SURVEY.md §2.11). The contract at 100 TB:
media lives as a ``binary`` column (or object-store URI) beside a typed
metadata struct; decode/feature-extraction runs as Arrow-batched Pandas
UDFs over ``mapInPandas`` so each executor processes whole record
batches without ever concentrating bytes on the driver.

The container has no image/audio libraries, so the decode kernel is a
clearly marked deterministic fake (`_fake_decode`) behind the real
Spark plumbing — schema, partitioning, UDF signature, and batch shape
are all production-real and tested; swapping in PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.catalog import Query
from ..sources.tables import load_table

# Metadata struct carried beside every payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the multimodal frame: text bytes stand in for media payloads."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level stats per source — pure built-ins, fully oracle-checkable.

    Demonstrates that binary columns flow through scans/groupBys like any
    other type (Tungsten treats them as byte arrays; no Python involved).
    """
    m = media_table(spark, sf_dir)
    return (
        m.groupBy(F.col("meta.source").alias("source"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.round(F.avg("meta.n_bytes"), 2).alias("avg_bytes"),
            F.max("meta.n_bytes").alias("max_bytes"),
        )
        .orderBy("source")
    )


MM_PAYLOAD_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       ROUND(AVG(octet_length(encode(text))), 2) AS avg_bytes,
       MAX(octet_length(encode(text))) AS max_bytes
FROM documents GROUP BY source ORDER BY source
"""


def _fake_decode(payload: bytes) -> tuple[int, float]:
    """STUB decode kernel — deterministic fake.

    Real deployments replace this with PIL/torchaudio/ffmpeg. Returns
    (n_frames, mean_byte): frame count faked as len//256, mean over the
    raw bytes as the stand-in "feature".
    """
    if payload is None:
        raise NotImplementedError("real media decode requires PIL/ffmpeg — not in container")
    n_frames = max(1, len(payload) // 256)
    # Raw (unrounded) mean: rounding happens JVM-side (F.round, HALF_UP)
    # so the oracle's ROUND matches bit-for-bit.
    mean_byte = float(sum(payload)) / max(1, len(payload))
    return n_frames, mean_byte


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    The UDF receives an iterator of pandas batches (bounded memory per
    executor core); each batch is decoded row-wise *inside* the batch —
    the Python crossing is per-batch, not per-row.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames, means = [], []
            for payload in pdf["payload"]:
                n_frames, mean_byte = _fake_decode(bytes(payload))
                frames.append(n_frames)
                means.append(mean_byte)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "n_frames": pd.array(frames, dtype="int32"),
                    "mean_byte": means,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(decode_batches, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_media(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """STUB resize kernel over ``mapInPandas`` (real: PIL ``Image.resize``).

    The fake "resize" deterministically resamples the byte stream to
    width*height bytes (stride sampling — the moral equivalent of
    nearest-neighbor). Plumbing is production-real: binary in, binary
    out, bounded Arrow batches, no driver involvement.
    """
    target = width * height

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if not b:
                    out.append(b"\x00" * target)
                    continue
                stride = max(1, len(b) // target)
                out.append((b[::stride] * (target // max(1, len(b[::stride])) + 1))[:target])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": pd.array([width] * len(pdf), dtype="int32"),
                    "height": pd.array([height] * len(pdf), dtype="int32"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(resize_batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

FRAME_BYTES = 256


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """STUB frame sampler over ``mapInPandas`` (real: ffmpeg keyframes).

    Treats each FRAME_BYTES-sized slice of the payload as a "frame" and
    emits every ``every_n``-th one — a row-multiplying (table-function
    style) Pandas UDF: one input row fans out to many output rows, still
    batch-at-a-time through Arrow.
    """

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = max(1, (len(b) + FRAME_BYTES - 1) // FRAME_BYTES)
                for i in range(0, n, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * FRAME_BYTES:(i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(frame_batches, FRAMES_SCHEMA)


def mm_frame_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-frame counts per doc — exercises the fan-out UDF path."""
    frames = sample_frames(media_table(spark, sf_dir))
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.length("frame")).alias("sampled_bytes"),
        )
        .orderBy("doc_id")
    )


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-and-featurize over the media table (Pandas-UDF path).

    The stub kernel is pure byte arithmetic, and the stand-in media
    table is UTF-8 text bytes, so an exact engine can replay it: for
    ASCII payloads (which `media_table` produces by construction here)
    byte values equal code points, making the fake decode fully
    oracle-checkable — the Pandas-UDF plumbing gets a real value check,
    not just a row count. Real deployments swap `_fake_decode` for
    PIL/ffmpeg and drop the oracle.
    """
    feats = extract_features(media_table(spark, sf_dir))
    return feats.select(
        "doc_id",
        "n_bytes",
        "n_frames",
        F.round("mean_byte", 4).alias("mean_byte"),
    ).orderBy("doc_id")


MM_DECODE_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(GREATEST(1, octet_length(encode(text)) // 256) AS INT) AS n_frames,
       ROUND(list_sum(list_transform(string_split(text, ''), c -> ord(c)))::DOUBLE
             / GREATEST(1, octet_length(encode(text))), 4) AS mean_byte
FROM documents ORDER BY doc_id
"""


MM_FRAMES_ORACLE = f"""
WITH d AS (SELECT doc_id, octet_length(encode(text)) AS L FROM documents),
n AS (SELECT doc_id, L, GREATEST(1, CAST(ceil(L / {FRAME_BYTES}.0) AS INT)) AS nf FROM d),
fr AS (SELECT doc_id, L, unnest(range(0, nf, 4)) AS i FROM n)
SELECT doc_id, COUNT(*) AS n_sampled,
       CAST(SUM(LEAST({FRAME_BYTES}, L - i * {FRAME_BYTES})) AS BIGINT) AS sampled_bytes
FROM fr GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = [
    Query("mm_payload_stats", "binary payload byte stats per source", mm_payload_stats,
          MM_PAYLOAD_ORACLE),
    Query("mm_decode_features", "Arrow-batched decode/feature-extract (stub kernel)",
          mm_decode_features, MM_DECODE_ORACLE),
    Query("mm_frame_sample_stats", "fan-out frame sampling via mapInPandas",
          mm_frame_sample_stats, MM_FRAMES_ORACLE),
]
