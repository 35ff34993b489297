"""Multimodal column pattern: opaque binary payloads + typed metadata.

Driver-mandated extension (SURVEY.md §2.11). The contract at 100 TB:
media lives as a ``binary`` column (or object-store URI) beside a typed
metadata struct; decode/feature-extraction runs as Arrow-batched Pandas
UDFs over ``mapInPandas`` so each executor processes whole record
batches without ever concentrating bytes on the driver.

Decode kernels come in two honesty tiers:

- **Real codecs** (round 6): PNG (from-spec stdlib implementation —
  chunk CRCs, IDAT inflate, scanline unfiltering) and WAV (RIFF/PCM
  via stdlib ``wave``) in ``media_codecs.py``. The registered
  ``mm_png_decode_stats`` / ``mm_wav_decode_stats`` queries synthesize
  payloads deterministically from doc_id executor-side, run the REAL
  decoder on them, and value-check the decoded features against a
  closed-form DuckDB oracle — the codec round trip is inside the
  correctness gate.
- **Stub kernel** (`_fake_decode`): generic JPEG/video decode still
  requires PIL/ffmpeg (not in container); the Spark plumbing — schema,
  partitioning, UDF signature, batch shape — is production-real and
  tested, and swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.catalog import Query
from ..sources.tables import load_table, spread_scan
from .lifecycle import scoped_cache

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

    The remaining honest gap is narrower than it used to be: REAL
    from-spec kernels now exist for PNG / WAV (``media_codecs``),
    baseline + progressive JPEG (``jpeg_codec`` /
    ``jpeg_progressive``), GIF-LZW, Y4M, AVI/MJPEG, MPEG-1 inter, and
    H.264 baseline I- AND P-slices (``h264_codec`` — CAVLC, Intra_4x4,
    P_Skip/P_L0_16x16 full-pel MC). This stub stands in only for what
    those subsets still exclude (CABAC / B-slices / deblocking /
    sub-pel MC in real-world H.264, and arbitrary crawl payloads) —
    closing that honestly needs ffmpeg, uninstallable in-container.
    """
    if payload is None:
        raise NotImplementedError(
            "generic media decode (real-world CABAC/B-slice H.264, "
            "arbitrary payloads) requires PIL/ffmpeg — not in "
            "container; from-spec kernels cover PNG/WAV/JPEG/GIF/Y4M/"
            "AVI-MJPEG/MPEG-1/H.264-baseline-I+P in media_codecs.py, "
            "jpeg_codec.py, gif_codec.py, mpeg1_codec.py, h264_codec.py"
        )
    n_frames = max(1, len(payload) // 256)
    # Raw (unrounded) mean: rounding happens JVM-side (F.round, HALF_UP)
    # so the oracle's ROUND matches bit-for-bit.
    mean_byte = float(sum(payload)) / max(1, len(payload))
    return n_frames, mean_byte


def _spread(df: DataFrame) -> DataFrame:
    """Fan the tiny id/payload frame across the cluster BEFORE an Arrow
    decode kernel.

    A single-file scan yields one input partition, which would serialize
    an embarrassingly-parallel decode onto one Python worker regardless
    of core count (measured: the sf0.1 documents scan is 1 partition, so
    mm_jpeg/mm_avi ran 1-way). Decode cost per row dwarfs bytes, so the
    spread is always FULL (``nbytes=None``) — but conditional: when the
    planned scan parallelism already reaches defaultParallelism
    (production many-file layout) no exchange is added, because an
    explicit ``repartition(N)`` always materializes a full shuffle (AQE
    does not coalesce a user-specified count).
    """
    return spread_scan(df)


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

    return media.select("doc_id", "payload").transform(_spread).mapInPandas(decode_batches, FEATURES_SCHEMA)


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

    return media.select("doc_id", "payload").transform(_spread).mapInPandas(resize_batches, RESIZED_SCHEMA)


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

    return media.select("doc_id", "payload").transform(_spread).mapInPandas(frame_batches, FRAMES_SCHEMA)


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


# --- REAL decode kernels (stdlib PNG + WAV codecs) ---------------------------
#
# Payload synthesis parameters — pure integer closed forms so the DuckDB
# oracle can recompute every decoded feature exactly (no float seams
# besides the final AVG/sqrt, identical IEEE ops on both engines).
PNG_W = "8 + doc_id % 9"      # 8..16
PNG_H = "5 + doc_id % 7"      # 5..11
WAV_N = "160 + doc_id % 241"  # samples, 160..400
WAV_SR = 8000

PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def mm_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode: synthesize → encode → decode → featurize.

    Per doc_id an RGB image with pixel[k] = (doc_id*31 + k) % 256 is
    PNG-encoded (rows cycle None/Sub/Up filters) and then decoded with
    the from-spec stdlib decoder; the emitted features come from the
    DECODED pixels, so the oracle match certifies the deflate/inflate/
    unfilter round trip, not the synthesis.
    """
    from .media_codecs import decode_png, encode_png

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in PNG_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 9, 5 + doc_id % 7
                px = bytes((doc_id * 31 + k) % 256 for k in range(w * h * 3))
                dw, dh, dc, dpx = decode_png(encode_png(w, h, px, channels=3))
                rows["doc_id"].append(doc_id)
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["n_channels"].append(dc)
                rows["n_pixels"].append(dw * dh)
                rows["mean_pixel"].append(float(sum(dpx)) / len(dpx))
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "n_channels": pd.array(rows["n_channels"], dtype="int32"),
                    "n_pixels": pd.array(rows["n_pixels"], dtype="int64"),
                    "mean_pixel": rows["mean_pixel"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, PNG_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_channels", "n_pixels",
        F.round("mean_pixel", 4).alias("mean_pixel"),
    ).orderBy("doc_id")


MM_PNG_DECODE_ORACLE = f"""
WITH d AS (SELECT doc_id, {PNG_W} AS w, {PNG_H} AS h FROM documents),
k AS (SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS k FROM d)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       3 AS n_channels, w * h AS n_pixels,
       ROUND(AVG((doc_id * 31 + k) % 256), 4) AS mean_pixel
FROM k GROUP BY doc_id, w, h ORDER BY doc_id
"""


# JPEG synthesis: dims in whole 8x8 blocks; every block is CONSTANT so
# the flat-qtable round trip is bit-exact (see jpeg_codec module
# docstring) and the oracle has a closed form over block values.
JPEG_BW = "1 + doc_id % 3"  # blocks wide -> width 8/16/24
JPEG_BH = "1 + doc_id % 2"  # blocks high -> height 8/16

JPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_components", T.IntegerType()),
        T.StructField("progressive", T.BooleanType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def mm_jpeg_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode: synthesize → baseline-JPEG encode → decode →
    featurize, with the from-spec stdlib codec (``jpeg_codec``: Huffman
    entropy coding, zigzag, dequant, IDCT).

    Per doc_id a grayscale image of 8x8-constant blocks (block (bx,by)
    value = (doc_id*17 + by*7 + bx*13) % 256) is encoded with the flat
    quantization table — the regime where JPEG is lossless — and
    decoded with the full marker+entropy+IDCT pipeline; features come
    from the DECODED pixels, so the oracle match certifies the whole
    round trip. EVEN doc_ids take the PROGRESSIVE (SOF2) path — encoded
    with the libjpeg-style successive-approximation scan script and
    decoded through the multi-scan spectral/approximation accumulator
    (``jpeg_progressive``) — odd doc_ids the baseline path, so one
    oracle row-set value-checks both entropy pipelines against the same
    closed form. Lossy-regime behavior (AC coefficients, coarse
    qtables, color) is value-bounded in ``tests/test_jpeg_codec.py`` /
    ``tests/test_jpeg_progressive.py``.
    """
    from .jpeg_codec import decode_jpeg, encode_jpeg
    from .jpeg_progressive import encode_jpeg_progressive

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in JPEG_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                bw, bh = 1 + doc_id % 3, 1 + doc_id % 2
                w, h = bw * 8, bh * 8
                px = bytes(
                    (doc_id * 17 + (y // 8) * 7 + (x // 8) * 13) % 256
                    for y in range(h)
                    for x in range(w)
                )
                prog = doc_id % 2 == 0
                enc = encode_jpeg_progressive if prog else encode_jpeg
                dw, dh, dc, dpx = decode_jpeg(enc(w, h, px, channels=1))
                rows["doc_id"].append(doc_id)
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["n_components"].append(dc)
                rows["progressive"].append(prog)
                rows["mean_pixel"].append(float(sum(dpx)) / len(dpx))
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "n_components": pd.array(rows["n_components"], dtype="int32"),
                    "progressive": pd.array(rows["progressive"], dtype="bool"),
                    "mean_pixel": rows["mean_pixel"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, JPEG_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_components", "progressive",
        F.round("mean_pixel", 4).alias("mean_pixel"),
    ).orderBy("doc_id")


MM_JPEG_DECODE_ORACLE = f"""
WITH d AS (SELECT doc_id, {JPEG_BW} AS bwn, {JPEG_BH} AS bhn FROM documents),
b AS (SELECT doc_id, bwn, bhn, unnest(range(0, bwn * bhn)) AS bi FROM d),
v AS (SELECT doc_id, bwn, bhn,
             (doc_id * 17 + (bi // bwn) * 7 + (bi % bwn) * 13) % 256 AS v
      FROM b)
SELECT doc_id, CAST(bwn * 8 AS INT) AS width, CAST(bhn * 8 AS INT) AS height,
       1 AS n_components, doc_id % 2 = 0 AS progressive,
       ROUND(AVG(v), 4) AS mean_pixel
FROM v GROUP BY doc_id, bwn, bhn ORDER BY doc_id
"""


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        # duration in MILLISECONDS: n*1000/8000 = n/8 is exact in binary
        # doubles, so there is no round-half seam between engines (n/8000
        # seconds lands on .xxxx5 boundaries where Spark's HALF_UP and
        # DuckDB's binary rounding disagree — measured on this corpus).
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def mm_wav_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WAV decode: synthesize PCM → RIFF-encode → decode → featurize.

    Per doc_id a 16-bit mono wave s_i = ((i*step) % 2048) - 1024 (step =
    doc_id % 7 + 1) is written through the stdlib ``wave`` encoder and
    read back with the real RIFF parser; header fields and the RMS over
    the DECODED samples are value-checked against the closed form.
    """
    import numpy as np

    from .media_codecs import decode_wav, encode_wav

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in WAV_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n, step = 160 + doc_id % 241, doc_id % 7 + 1
                samples = [((i * step) % 2048) - 1024 for i in range(n)]
                sr, ch, nf, decoded = decode_wav(encode_wav(samples, WAV_SR))
                a = np.asarray(decoded, dtype=np.float64)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(sr)
                rows["n_channels"].append(ch)
                rows["n_samples"].append(nf)
                rows["duration_ms"].append(nf * 1000.0 / sr)
                rows["rms"].append(float(np.sqrt(np.mean(a * a))))
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "sample_rate": pd.array(rows["sample_rate"], dtype="int32"),
                    "n_channels": pd.array(rows["n_channels"], dtype="int32"),
                    "n_samples": pd.array(rows["n_samples"], dtype="int64"),
                    "duration_ms": rows["duration_ms"],
                    "rms": rows["rms"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, WAV_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "sample_rate", "n_channels", "n_samples",
        "duration_ms",
        F.round("rms", 4).alias("rms"),
    ).orderBy("doc_id")


MM_WAV_DECODE_ORACLE = f"""
WITH d AS (SELECT doc_id, {WAV_N} AS n, doc_id % 7 + 1 AS step FROM documents),
s AS (SELECT doc_id, n, step, unnest(range(0, n)) AS i FROM d),
v AS (SELECT doc_id, n, ((i * step) % 2048) - 1024 AS s FROM s)
SELECT doc_id, {WAV_SR} AS sample_rate, 1 AS n_channels, n AS n_samples,
       n * 1000.0 / {WAV_SR} AS duration_ms,
       ROUND(sqrt(AVG(s * s)), 4) AS rms
FROM v GROUP BY doc_id, n ORDER BY doc_id
"""


PNG_SAFE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


def png_features_with_deadletter(media: DataFrame) -> DataFrame:
    """Decode a PNG payload column with per-row dead-lettering.

    At 100 TB some payloads WILL be truncated or corrupt; a decode
    error must become a row, never a task failure (the reference's
    dead-letter principle applied to media). Good rows carry decoded
    features; bad rows carry ``ok=false`` and the decoder's error
    message, ready to route to a rejected sink.
    """
    from .media_codecs import decode_png

    def safe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in PNG_SAFE_SCHEMA}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows["doc_id"].append(int(doc_id))
                try:
                    w, h, _c, px = decode_png(bytes(payload))
                    rows["ok"].append(True)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["mean_pixel"].append(float(sum(px)) / max(1, len(px)))
                    rows["error"].append(None)
                except Exception as exc:  # noqa: BLE001 — decode must never kill the task
                    rows["ok"].append(False)
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["mean_pixel"].append(None)
                    rows["error"].append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "ok": rows["ok"],
                    "width": pd.array(rows["width"], dtype="Int32"),
                    "height": pd.array(rows["height"], dtype="Int32"),
                    "mean_pixel": pd.array(rows["mean_pixel"], dtype="float64"),
                    "error": rows["error"],
                }
            )

    return media.select("doc_id", "payload").transform(_spread).mapInPandas(safe_batches, PNG_SAFE_SCHEMA)


# Dead-letter corruption plan, derivable from doc_id alone so the DuckDB
# oracle can predict every row: docs with doc_id % 10 == 7 are truncated
# at half length (the chunk walk's bounds check fires -> 'truncated'),
# doc_id % 10 == 3 get one byte inside the IDAT data flipped (the CRC
# walk fires -> 'crc'); everything else decodes cleanly.
DEADLETTER_TRUNC_MOD = 7
DEADLETTER_CRC_MOD = 3
_IDAT_FLIP_OFFSET = 46  # 8 sig + 25 IHDR chunk + 8 IDAT header + 5 into data


def _planted_png_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) frame: real encoded PNGs as a BINARY column,
    with deterministic corruption planted per the scheme above. The
    payload crosses the plan as stored bytes — the decoder downstream
    reads the column, not a kernel-internal synthesis."""
    from .media_codecs import encode_png

    def make_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 9, 5 + doc_id % 7
                px = bytes((doc_id * 31 + k) % 256 for k in range(w * h * 3))
                payload = encode_png(w, h, px, channels=3)
                if doc_id % 10 == DEADLETTER_TRUNC_MOD:
                    payload = payload[: len(payload) // 2]
                elif doc_id % 10 == DEADLETTER_CRC_MOD:
                    b = bytearray(payload)
                    b[_IDAT_FLIP_OFFSET] ^= 0xFF
                    payload = bytes(b)
                ids.append(doc_id)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").transform(_spread).mapInPandas(
        make_batches, "doc_id long, payload binary"
    )


def mm_png_deadletter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered dead-letter decode: REAL PNG payloads — 80% valid, 10%
    truncated, 10% CRC-corrupted, planted deterministically as a stored
    binary column — routed through ``png_features_with_deadletter``.
    Valid rows are value-checked on decoded features; corrupt rows on
    (ok=false, error class). This is the corrupt-payload contract the
    100 TB crawl needs: decode errors become rows, never task failures.
    """
    feats = png_features_with_deadletter(
        _planted_png_payloads(load_table(spark, sf_dir, "documents"))
    )
    error_kind = (
        F.when(F.col("ok"), "ok")
        .when(F.col("error").contains("truncated"), "truncated")
        .when(F.col("error").contains("CRC"), "crc")
        .otherwise("other")
    )
    return feats.select(
        "doc_id",
        "ok",
        "width",
        "height",
        F.round("mean_pixel", 4).alias("mean_pixel"),
        error_kind.alias("error_kind"),
    ).orderBy("doc_id")


MM_PNG_DEADLETTER_ORACLE = f"""
WITH d AS (SELECT doc_id, {PNG_W} AS w, {PNG_H} AS h, doc_id % 10 AS m
           FROM documents),
k AS (SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS k
      FROM d WHERE m NOT IN ({DEADLETTER_CRC_MOD}, {DEADLETTER_TRUNC_MOD})),
okrows AS (
  SELECT doc_id, TRUE AS ok, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         ROUND(AVG((doc_id * 31 + k) % 256), 4) AS mean_pixel, 'ok' AS error_kind
  FROM k GROUP BY doc_id, w, h
),
bad AS (
  SELECT doc_id, FALSE AS ok, CAST(NULL AS INT) AS width,
         CAST(NULL AS INT) AS height, CAST(NULL AS DOUBLE) AS mean_pixel,
         CASE WHEN m = {DEADLETTER_TRUNC_MOD} THEN 'truncated'
              ELSE 'crc' END AS error_kind
  FROM d WHERE m IN ({DEADLETTER_CRC_MOD}, {DEADLETTER_TRUNC_MOD})
)
SELECT * FROM okrows UNION ALL SELECT * FROM bad ORDER BY doc_id
"""


RESIZE_TO = 8  # nearest-neighbor target: RESIZE_TO x RESIZE_TO

PNG_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def mm_png_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: decode PNG → nearest-neighbor resample →
    re-encode → decode again → featurize.

    Source pixel for target (x, y) is (x·w // N, y·h // N) — the
    classic floor-mapped nearest neighbor. The resized image makes a
    SECOND full PNG round trip before features are read, so the oracle
    match certifies decode + resample + re-encode + re-decode.
    """
    from .media_codecs import decode_png, encode_png

    n = RESIZE_TO

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means = [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 9, 5 + doc_id % 7
                px = bytes((doc_id * 31 + k) % 256 for k in range(w * h * 3))
                dw, dh, dc, dpx = decode_png(encode_png(w, h, px, channels=3))
                resized = bytearray()
                for y in range(n):
                    sy = (y * dh) // n
                    for x in range(n):
                        sx = (x * dw) // n
                        base = (sy * dw + sx) * dc
                        resized += dpx[base:base + dc]
                # second round trip: the resized image is itself re-encoded
                rw, rh, rc, rpx = decode_png(encode_png(n, n, bytes(resized), channels=dc))
                ids.append(doc_id)
                means.append(float(sum(rpx)) / len(rpx))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": pd.array([n] * len(ids), dtype="int32"),
                    "height": pd.array([n] * len(ids), dtype="int32"),
                    "mean_pixel": means,
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(resize_batches, PNG_RESIZE_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", F.round("mean_pixel", 4).alias("mean_pixel")
    ).orderBy("doc_id")


MM_PNG_RESIZE_ORACLE = f"""
WITH d AS (SELECT doc_id, {PNG_W} AS w, {PNG_H} AS h FROM documents),
g AS (SELECT doc_id, w, h, unnest(range(0, {RESIZE_TO * RESIZE_TO * 3})) AS i FROM d),
m AS (SELECT doc_id, w, h, i % 3 AS c, (i // 3) % {RESIZE_TO} AS x,
             i // {RESIZE_TO * 3} AS y FROM g),
k AS (SELECT doc_id, (((y * h) // {RESIZE_TO}) * w + ((x * w) // {RESIZE_TO})) * 3 + c AS k
      FROM m)
SELECT doc_id, {RESIZE_TO} AS width, {RESIZE_TO} AS height,
       ROUND(AVG((doc_id * 31 + k) % 256), 4) AS mean_pixel
FROM k GROUP BY doc_id ORDER BY doc_id
"""


VAD_FRAME = 160       # 20 ms at 8 kHz
VAD_RMS_THRESHOLD = 512.0

WAV_VAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_voiced", T.IntegerType()),
        T.StructField("max_frame_rms", T.DoubleType()),
    ]
)


def mm_wav_vad_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio analysis: decode WAV → 20 ms frames → per-frame RMS →
    energy-based voice-activity counts (the classic VAD baseline).

    Works on the DECODED samples (same synth as ``mm_wav_decode_stats``),
    so the oracle match certifies RIFF parse + framing + energy math.
    """
    import numpy as np

    from .media_codecs import decode_wav, encode_wav

    def vad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nfs, nvs, mx = [], [], [], []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n, step = 160 + doc_id % 241, doc_id % 7 + 1
                samples = [((i * step) % 2048) - 1024 for i in range(n)]
                _sr, _ch, _nf, decoded = decode_wav(encode_wav(samples, WAV_SR))
                a = np.asarray(decoded, dtype=np.float64)
                rms = [
                    float(np.sqrt(np.mean(a[f:f + VAD_FRAME] ** 2)))
                    for f in range(0, len(a), VAD_FRAME)
                ]
                ids.append(doc_id)
                nfs.append(len(rms))
                nvs.append(sum(r >= VAD_RMS_THRESHOLD for r in rms))
                mx.append(max(rms))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": pd.array(nfs, dtype="int32"),
                    "n_voiced": pd.array(nvs, dtype="int32"),
                    "max_frame_rms": mx,
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(vad_batches, WAV_VAD_SCHEMA)
    )
    return feats.select(
        "doc_id", "n_frames", "n_voiced",
        F.round("max_frame_rms", 4).alias("max_frame_rms"),
    ).orderBy("doc_id")


MM_WAV_VAD_ORACLE = f"""
WITH d AS (SELECT doc_id, {WAV_N} AS n, doc_id % 7 + 1 AS step FROM documents),
s AS (SELECT doc_id, step, unnest(range(0, n)) AS i FROM d),
v AS (SELECT doc_id, i // {VAD_FRAME} AS f, ((i * step) % 2048) - 1024 AS s FROM s),
fr AS (
  SELECT doc_id, f, sqrt(AVG(s * s)) AS rms
  FROM v GROUP BY doc_id, f
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_frames,
       CAST(COUNT(*) FILTER (WHERE rms >= {VAD_RMS_THRESHOLD}) AS INT) AS n_voiced,
       ROUND(MAX(rms), 4) AS max_frame_rms
FROM fr GROUP BY doc_id ORDER BY doc_id
"""


# --- Y4M: real (uncompressed) video decode + frame sampling ----------------

Y4M_W, Y4M_H = 8, 8
Y4M_FRAMES = "1 + doc_id % 4"  # frames per synthesized clip
Y4M_STRIDE = 2  # sample every 2nd frame

Y4M_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("sampled_luma_sum", T.LongType()),
        T.StructField("mean_sampled_luma", T.DoubleType()),
    ]
)


def mm_y4m_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode: synthesize → Y4M encode → decode → frame-
    sample → featurize.

    Per doc_id a Cmono YUV4MPEG2 clip of ``1 + doc_id % 4`` constant
    frames (frame k filled with ``(doc_id*7 + k*13) % 256``) is encoded
    and then decoded with the from-spec stream parser; every
    ``Y4M_STRIDE``-th decoded frame is sampled and its luma aggregated.
    The emitted numbers come from the DECODED planes, so the oracle
    match certifies header parse + frame segmentation, not the
    synthesis. Compressed video stays honestly stubbed (needs ffmpeg).
    """
    from .media_codecs import decode_y4m, encode_y4m

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in Y4M_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 1 + doc_id % 4
                frames = [
                    bytes([(doc_id * 7 + k * 13) % 256]) * (Y4M_W * Y4M_H)
                    for k in range(n)
                ]
                w, h, dec = decode_y4m(encode_y4m(Y4M_W, Y4M_H, frames))
                sampled = dec[::Y4M_STRIDE]
                luma_sum = sum(sum(f) for f in sampled)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(len(dec))
                rows["n_sampled"].append(len(sampled))
                rows["sampled_luma_sum"].append(luma_sum)
                rows["mean_sampled_luma"].append(
                    float(luma_sum) / (len(sampled) * w * h)
                )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "n_frames": pd.array(rows["n_frames"], dtype="int32"),
                    "n_sampled": pd.array(rows["n_sampled"], dtype="int32"),
                    "sampled_luma_sum": pd.array(
                        rows["sampled_luma_sum"], dtype="int64"
                    ),
                    "mean_sampled_luma": rows["mean_sampled_luma"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, Y4M_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_frames", "n_sampled",
        "sampled_luma_sum",
        F.round("mean_sampled_luma", 4).alias("mean_sampled_luma"),
    ).orderBy("doc_id")


MM_Y4M_ORACLE = f"""
WITH d AS (SELECT doc_id, {Y4M_FRAMES} AS n FROM documents),
k AS (
  SELECT doc_id, n, unnest(range(0, n, {Y4M_STRIDE})) AS k FROM d
),
s AS (
  SELECT doc_id, n, COUNT(*) AS n_sampled,
         CAST(SUM(((doc_id * 7 + k * 13) % 256) * {Y4M_W} * {Y4M_H})
              AS BIGINT) AS luma_sum
  FROM k GROUP BY doc_id, n
)
SELECT doc_id, {Y4M_W} AS width, {Y4M_H} AS height,
       CAST(n AS INT) AS n_frames,
       CAST(n_sampled AS INT) AS n_sampled,
       luma_sum AS sampled_luma_sum,
       ROUND(luma_sum / (n_sampled * {Y4M_W} * {Y4M_H}), 4)
         AS mean_sampled_luma
FROM s ORDER BY doc_id
"""


# --- AVI/MJPEG: real COMPRESSED-video decode -------------------------------

AVI_W, AVI_H = 8, 8
AVI_FRAMES = "1 + doc_id % 3"

AVI_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_progressive", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def mm_avi_mjpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-video decode: synthesize → per-frame JPEG encode
    → AVI/MJPG wrap → container parse → per-frame entropy decode →
    featurize, all with the repo's from-spec codecs (``avi_codec`` +
    ``jpeg_codec``/``jpeg_progressive``).

    Per doc_id an AVI of ``1 + doc_id % 3`` grayscale 8x8 constant
    frames (frame k value = ``(doc_id*11 + k*29) % 256``) is built with
    frames
    alternating baseline/progressive JPEG entropy coding (progressive
    when ``(doc_id + k)`` is even) at the flat quantization table — the
    lossless regime — then decoded end-to-end. Features come from the
    DECODED frames (mean luma across all frames; the SOF2 marker count
    value-checks which entropy path each frame really took), so the
    oracle match certifies RIFF walk + avih agreement + both JPEG
    pipelines at once. Inter-frame codecs (H.264-class) stay honestly
    stubbed — MJPEG is the compressed-video format a stdlib-only engine
    can own.
    """
    from .avi_codec import decode_avi_mjpeg, encode_avi_mjpeg
    from .jpeg_codec import decode_jpeg, encode_jpeg, jpeg_sof_marker
    from .jpeg_progressive import encode_jpeg_progressive

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in AVI_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 1 + doc_id % 3
                payloads = []
                for k in range(n):
                    px = bytes([(doc_id * 11 + k * 29) % 256]) * (
                        AVI_W * AVI_H
                    )
                    enc = (
                        encode_jpeg_progressive
                        if (doc_id + k) % 2 == 0
                        else encode_jpeg
                    )
                    payloads.append(enc(AVI_W, AVI_H, px, channels=1))
                w, h, frames = decode_avi_mjpeg(
                    encode_avi_mjpeg(AVI_W, AVI_H, payloads)
                )
                luma = n_prog = 0
                for f in frames:
                    fw, fh, _c, px = decode_jpeg(f)
                    if (fw, fh) != (w, h):
                        raise ValueError("AVI frame dims disagree with header")
                    luma += sum(px)
                    # SOF2 detected by walking marker segments (the
                    # decode_jpeg discipline) — a payload-wide
                    # substring scan would false-positive on APPn/
                    # comment bodies containing FF C2
                    n_prog += int(jpeg_sof_marker(f) == 0xC2)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(len(frames))
                rows["n_progressive"].append(n_prog)
                rows["mean_luma"].append(float(luma) / (len(frames) * w * h))
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "n_frames": pd.array(rows["n_frames"], dtype="int32"),
                    "n_progressive": pd.array(
                        rows["n_progressive"], dtype="int32"
                    ),
                    "mean_luma": rows["mean_luma"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, AVI_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_frames", "n_progressive",
        F.round("mean_luma", 4).alias("mean_luma"),
    ).orderBy("doc_id")


MM_AVI_ORACLE = f"""
WITH d AS (SELECT doc_id, {AVI_FRAMES} AS n FROM documents),
f AS (SELECT doc_id, n, unnest(range(n)) AS k FROM d),
v AS (SELECT doc_id, n, k, (doc_id * 11 + k * 29) % 256 AS v FROM f)
SELECT doc_id, {AVI_W} AS width, {AVI_H} AS height,
       CAST(n AS INT) AS n_frames,
       CAST(SUM(CASE WHEN (doc_id + k) % 2 = 0 THEN 1 ELSE 0 END) AS INT)
         AS n_progressive,
       ROUND(AVG(v), 4) AS mean_luma
FROM v GROUP BY doc_id, n ORDER BY doc_id
"""


# --- H.264: real baseline-profile I-slice decode (CAVLC + intra pred) -------

H264_W, H264_H = 32, 32  # 2x2 macroblocks -> an 8x8 grid of 4x4 blocks
H264_FRAMES = "1 + doc_id % 3"
H264_LEVEL = "1 + (doc_id * 5 + k * 3) % 7"  # quantized DC level 1..7

H264_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_mb", T.IntegerType()),
        T.StructField("n_coded_blocks", T.IntegerType()),
        T.StructField("n_mode_v", T.IntegerType()),
        T.StructField("n_mode_h", T.IntegerType()),
        T.StructField("n_mode_dc", T.IntegerType()),
        T.StructField("qp", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def mm_h264_intra_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL H.264 baseline I-slice decode (``operators/h264_codec``,
    ITU-T H.264 subset: Annex-B NAL parse with emulation-prevention
    stripping, Exp-Golomb SPS/PPS/slice headers, CAVLC residuals with
    the nC neighbour context, LevelScale dequant + 4x4 inverse integer
    transform, and Intra_4x4 V/H/DC prediction with the real
    min(modeA, modeB) mode predictor).

    Per doc an Annex-B stream of ``1 + doc_id % 3`` IDR frames is
    synthesized and decoded; frame k is a constant plane whose value
    derives from its single quantized DC level L (the frame's first
    4x4 block DC-predicts 128 and carries L; every other block
    propagates the value through whichever of V/H/DC the per-block
    rotation picks — closed form ``block_mode``). Every output column
    is closed-form derivable, so the oracle value-checks the full
    parse/predict/reconstruct pipeline: one mis-signaled mode or a
    wrong dequant scale shifts ``mean_luma`` or the mode tallies.

    Closed forms: v_k = 128 + (160·L_k + 32) div 64 (QP 24 -> DC
    dequant scale 160, inverse-transform rounding (x+32)>>6);
    mode(bx, by) over the 8x8 block grid = the availability-filtered
    rotation of ``h264_codec.block_mode``.
    """
    from .h264_codec import H264_QP, decode_h264, encode_h264

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in H264_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 1 + doc_id % 3
                levels = [1 + (doc_id * 5 + k * 3) % 7 for k in range(n)]
                dec = decode_h264(encode_h264(H264_W, H264_H, levels, doc_id))
                if dec["width"] != H264_W or dec["height"] != H264_H:
                    raise ValueError("H.264 SPS dims disagree")
                luma = sum(sum(f) for f in dec["frames"])
                rows["doc_id"].append(doc_id)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_frames"].append(len(dec["frames"]))
                rows["n_mb"].append(
                    len(dec["frames"]) * (H264_W // 16) * (H264_H // 16)
                )
                rows["n_coded_blocks"].append(dec["n_coded_blocks"])
                rows["n_mode_v"].append(dec["n_mode_v"])
                rows["n_mode_h"].append(dec["n_mode_h"])
                rows["n_mode_dc"].append(dec["n_mode_dc"])
                rows["qp"].append(dec["qp"])
                rows["mean_luma"].append(
                    float(luma) / (len(dec["frames"]) * H264_W * H264_H)
                )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    **{
                        c: pd.array(rows[c], dtype="int32")
                        for c in (
                            "width", "height", "n_frames", "n_mb",
                            "n_coded_blocks", "n_mode_v", "n_mode_h",
                            "n_mode_dc", "qp",
                        )
                    },
                    "mean_luma": rows["mean_luma"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, H264_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_frames", "n_mb", "n_coded_blocks",
        "n_mode_v", "n_mode_h", "n_mode_dc", "qp",
        F.round("mean_luma", 4).alias("mean_luma"),
    ).orderBy("doc_id")


# The oracle replicates the two closed forms the codec's design pins:
# per-frame constant value v_k from the quantized DC level, and the
# availability-filtered mode rotation over the 8x8 block grid (the
# multiset of (bx, by) over a frame's 64 z-scanned blocks is exactly
# the 8x8 grid, so the SQL iterates the grid directly).
MM_H264_ORACLE = f"""
WITH d AS (SELECT doc_id, {H264_FRAMES} AS n FROM documents),
fr AS (SELECT doc_id, n, unnest(range(n)) AS k FROM d),
px AS (
  SELECT doc_id, n, k,
         128 + (160 * ({H264_LEVEL}) + 32) // 64 AS v
  FROM fr
),
blocks AS (
  SELECT doc_id, n, k, bx.range AS bx, by.range AS by,
         doc_id + k + bx.range + by.range AS cand
  FROM fr CROSS JOIN range(8) bx CROSS JOIN range(8) by
),
modes AS (
  SELECT doc_id,
         CASE WHEN bx = 0 AND by = 0 THEN 2
              WHEN by = 0 THEN CASE WHEN cand % 2 = 0 THEN 1 ELSE 2 END
              WHEN bx = 0 THEN CASE WHEN cand % 2 = 0 THEN 0 ELSE 2 END
              ELSE cand % 3 END AS mode
  FROM blocks
),
mtal AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN mode = 0 THEN 1 ELSE 0 END) AS INT) AS n_mode_v,
         CAST(SUM(CASE WHEN mode = 1 THEN 1 ELSE 0 END) AS INT) AS n_mode_h,
         CAST(SUM(CASE WHEN mode = 2 THEN 1 ELSE 0 END) AS INT) AS n_mode_dc
  FROM modes GROUP BY doc_id
),
lum AS (SELECT doc_id, ROUND(AVG(v), 4) AS mean_luma FROM px GROUP BY doc_id)
SELECT d.doc_id, {H264_W} AS width, {H264_H} AS height,
       CAST(n AS INT) AS n_frames,
       CAST(n * 4 AS INT) AS n_mb,
       CAST(n AS INT) AS n_coded_blocks,
       n_mode_v, n_mode_h, n_mode_dc,
       24 AS qp,
       mean_luma
FROM d JOIN mtal USING (doc_id) JOIN lum USING (doc_id)
ORDER BY doc_id
"""


# --- H.264 P-slice (inter) GOP decode ----------------------------------------

H264P_W, H264P_H = 64, 32  # 4x2 macroblocks; top MB row hosts the bumps
H264P_NP = "1 + doc_id % 3"  # P frames per GOP (1..3)
H264P_L0 = "1 + doc_id % 7"  # IDR frame's quantized DC level
H264P_Q = "1 + (doc_id * 3 + k * 5) % 6"  # P-frame residual level
H264P_COL = "(doc_id + k) % 4"  # coded MB column (top row)
H264P_MVX = "((doc_id + 2 * k) % 9) - 4"  # full-pel MV x, -4..4
H264P_MVY_FP = 16  # full-pel MV y: source rows sit in the never-bumped MB row 1

H264P_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_mb", T.IntegerType()),
        T.StructField("n_skip_mb", T.IntegerType()),
        T.StructField("n_p_mb", T.IntegerType()),
        T.StructField("n_coded_blocks", T.IntegerType()),
        T.StructField("sum_mvx_q", T.IntegerType()),
        T.StructField("sum_mvy_q", T.IntegerType()),
        T.StructField("n_mode_v", T.IntegerType()),
        T.StructField("n_mode_h", T.IntegerType()),
        T.StructField("n_mode_dc", T.IntegerType()),
        T.StructField("qp", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def mm_h264_inter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL H.264 baseline GOP decode — IDR I-slice plus P-slices
    (``operators/h264_codec`` P extension: mb_skip_run addressing, the
    8.4.1.1 P_Skip MV rule, P_L0_16x16 with CAVLC motion-vector
    differences against the 8.4.1.3 median predictor, Table 9-4 Inter
    coded_block_pattern, full-pel motion compensation with boundary
    clamping, and per-block DC residuals through the same dequant +
    inverse-transform pipeline as the intra query).

    Per doc a GOP of one IDR frame (constant plane, level L0) plus
    ``1 + doc_id % 3`` P frames is synthesized: each P frame is
    all-P_Skip except one top-row macroblock coded P_L0_16x16 whose
    motion vector samples the never-bumped second MB row (mvy = +16
    full-pel, so motion compensation reads a constant region even as
    bumps accumulate) and whose sixteen 4x4 blocks carry a flat DC
    residual. The bumped MB persists through later frames' zero-MV
    skips, so every column is closed-form: a wrong skip-MV rule, MV
    predictor, skip-run count, or inter dequant shifts ``mean_luma``,
    the MV sums, or the tallies.
    """
    from .h264_codec import decode_h264, encode_h264_gop

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in H264P_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                np_ = 1 + doc_id % 3
                i_level = 1 + doc_id % 7
                p_frames = []
                for k in range(1, np_ + 1):
                    col = (doc_id + k) % 4
                    mvx = ((doc_id + 2 * k) % 9) - 4
                    q = 1 + (doc_id * 3 + k * 5) % 6
                    p_frames.append((col, (4 * mvx, 4 * H264P_MVY_FP), q))
                dec = decode_h264(
                    encode_h264_gop(H264P_W, H264P_H, i_level, p_frames, doc_id)
                )
                if dec["width"] != H264P_W or dec["height"] != H264P_H:
                    raise ValueError("H.264 SPS dims disagree")
                luma = sum(sum(f) for f in dec["frames"])
                rows["doc_id"].append(doc_id)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_frames"].append(len(dec["frames"]))
                rows["n_mb"].append(
                    len(dec["frames"]) * (H264P_W // 16) * (H264P_H // 16)
                )
                rows["n_skip_mb"].append(dec["n_skip_mb"])
                rows["n_p_mb"].append(dec["n_p_mb"])
                rows["n_coded_blocks"].append(dec["n_coded_blocks"])
                rows["sum_mvx_q"].append(dec["sum_abs_mvx_q"])
                rows["sum_mvy_q"].append(dec["sum_abs_mvy_q"])
                rows["n_mode_v"].append(dec["n_mode_v"])
                rows["n_mode_h"].append(dec["n_mode_h"])
                rows["n_mode_dc"].append(dec["n_mode_dc"])
                rows["qp"].append(dec["qp"])
                rows["mean_luma"].append(
                    float(luma) / (len(dec["frames"]) * H264P_W * H264P_H)
                )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    **{
                        c: pd.array(rows[c], dtype="int32")
                        for c in (
                            "width", "height", "n_frames", "n_mb",
                            "n_skip_mb", "n_p_mb", "n_coded_blocks",
                            "sum_mvx_q", "sum_mvy_q", "n_mode_v",
                            "n_mode_h", "n_mode_dc", "qp",
                        )
                    },
                    "mean_luma": rows["mean_luma"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, H264P_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_frames", "n_mb", "n_skip_mb",
        "n_p_mb", "n_coded_blocks", "sum_mvx_q", "sum_mvy_q",
        "n_mode_v", "n_mode_h", "n_mode_dc", "qp",
        F.round("mean_luma", 4).alias("mean_luma"),
    ).orderBy("doc_id")


# Closed forms the GOP design pins: c0 from the IDR DC level; each P
# frame k bumps one fresh top-row MB by r_k = (160*q_k + 32) div 64
# (DC-only residual -> flat 4x4 offset), and the bump persists through
# every later frame's zero-MV skip copy, so frame k's total luma is
# c0*W*H + 256 * sum_{j<=k} r_j; the MV sums are the quarter-pel
# encoder parameters verbatim (the median predictor is 0 for the
# top-row coded MB, so MVD == MV).
MM_H264_INTER_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {H264P_NP} AS np,
         128 + (160 * ({H264P_L0}) + 32) // 64 AS c0
  FROM documents),
pr AS (
  SELECT doc_id, np, k.range AS k,
         (160 * (1 + (doc_id * 3 + k.range * 5) % 6) + 32) // 64 AS r,
         ABS(((doc_id + 2 * k.range) % 9) - 4) * 4 AS amvx
  FROM d CROSS JOIN range(1, 4) k
  WHERE k.range <= np),
bump AS (
  SELECT doc_id,
         CAST(SUM((np - k + 1) * r) * 256 AS BIGINT) AS extra,
         CAST(SUM(amvx) AS INT) AS sum_mvx_q,
         CAST(SUM(64) AS INT) AS sum_mvy_q
  FROM pr GROUP BY doc_id),
blocks AS (
  SELECT doc_id, bx.range AS bx, by.range AS by,
         doc_id + bx.range + by.range AS cand
  FROM d CROSS JOIN range(16) bx CROSS JOIN range(8) by),
modes AS (
  SELECT doc_id,
         CASE WHEN bx = 0 AND by = 0 THEN 2
              WHEN by = 0 THEN CASE WHEN cand % 2 = 0 THEN 1 ELSE 2 END
              WHEN bx = 0 THEN CASE WHEN cand % 2 = 0 THEN 0 ELSE 2 END
              ELSE cand % 3 END AS mode
  FROM blocks),
mtal AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN mode = 0 THEN 1 ELSE 0 END) AS INT) AS n_mode_v,
         CAST(SUM(CASE WHEN mode = 1 THEN 1 ELSE 0 END) AS INT) AS n_mode_h,
         CAST(SUM(CASE WHEN mode = 2 THEN 1 ELSE 0 END) AS INT) AS n_mode_dc
  FROM modes GROUP BY doc_id)
SELECT d.doc_id, {H264P_W} AS width, {H264P_H} AS height,
       CAST(np + 1 AS INT) AS n_frames,
       CAST((np + 1) * 8 AS INT) AS n_mb,
       CAST(np * 7 AS INT) AS n_skip_mb,
       CAST(np AS INT) AS n_p_mb,
       CAST(1 + 16 * np AS INT) AS n_coded_blocks,
       sum_mvx_q, sum_mvy_q,
       n_mode_v, n_mode_h, n_mode_dc,
       24 AS qp,
       ROUND(CAST(c0 * 2048 * (np + 1) + extra AS DOUBLE)
             / (2048 * (np + 1)), 4) AS mean_luma
FROM d JOIN bump USING (doc_id) JOIN mtal USING (doc_id)
ORDER BY doc_id
"""


# --- H.264 B-slice (biprediction) GOP decode ---------------------------------

H264B_NB = "1 + doc_id % 2"  # B frames per GOP (1..2)
H264B_COL = "doc_id % 4"  # P frame's bumped MB (raster idx, top row)
H264B_QP_ = "1 + (doc_id * 3 + 5) % 6"  # P-frame residual level

H264B_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_mb", T.IntegerType()),
        T.StructField("n_skip_mb", T.IntegerType()),
        T.StructField("n_p_mb", T.IntegerType()),
        T.StructField("n_b_l0", T.IntegerType()),
        T.StructField("n_b_l1", T.IntegerType()),
        T.StructField("n_b_bi", T.IntegerType()),
        T.StructField("n_coded_blocks", T.IntegerType()),
        T.StructField("sum_mv_l0_q", T.IntegerType()),
        T.StructField("sum_mv_l1_q", T.IntegerType()),
        T.StructField("qp", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def mm_h264_bipred_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL H.264 GOP decode with B-slice BIPREDICTION — the Main-
    profile temporal class on top of the baseline I+P codec
    (``operators/h264_codec`` B extension: B_L0/B_L1/B_Bi_16x16
    mb_types, per-list CAVLC motion-vector differences against the
    8.4.1.3 median predictor applied per reference list, the 8.2.4.2.4
    two-deep reference-list construction under pic_order_cnt_type 2,
    and the 8.4.2.3 default weighted prediction
    (predL0 + predL1 + 1) >> 1).

    Per doc a GOP of one IDR (constant plane c0), one reference P
    frame (one bumped top-row MB, exactly the inter query's fixture),
    and ``1 + doc_id % 2`` non-reference B frames is synthesized. Every
    B macroblock is coded, rotating through the three mb_types:
    L0-only MBs motion-compensate from the P frame's never-bumped
    bottom row (constant c0), L1-only MBs from the IDR (constant c0
    anywhere), and Bi MBs average a zero-MV L0 fetch (which READS the
    bump when the MB sits on the bumped column — the only place the
    bipred average is non-trivial) with a moving L1 fetch. Every
    column is closed-form: a wrong list-1 construction, per-list MV
    predictor, or biased average shifts ``mean_luma`` or the MV sums.
    """
    from .h264_codec import decode_h264, encode_h264_bgop

    def _mb_spec(doc_id: int, k: int, m: int):
        t = 1 + (doc_id + k + m) % 3
        mv0 = mv1 = None
        if t == 1:
            mv0 = (4 * (((doc_id + 2 * k + m) % 9) - 4), 64)
        elif t == 3:
            mv0 = (0, 0)
        if t in (2, 3):
            mv1 = (4 * (((doc_id + 3 * k + m) % 9) - 4), 0)
        coded = (doc_id + k + m) % 2 == 0
        lvl = (1 + (doc_id * 7 + k * 11 + m * 5) % 6) if coded else 0
        return (t, mv0, mv1, lvl)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in H264B_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                nb = 1 + doc_id % 2
                i_level = 1 + doc_id % 7
                p_spec = (
                    doc_id % 4,
                    (4 * ((doc_id % 9) - 4), 4 * H264P_MVY_FP),
                    1 + (doc_id * 3 + 5) % 6,
                )
                b_frames = [
                    [_mb_spec(doc_id, k, m) for m in range(8)]
                    for k in range(1, nb + 1)
                ]
                dec = decode_h264(
                    encode_h264_bgop(
                        H264P_W, H264P_H, i_level, p_spec, b_frames, doc_id
                    )
                )
                if dec["width"] != H264P_W or dec["height"] != H264P_H:
                    raise ValueError("H.264 SPS dims disagree")
                luma = sum(sum(f) for f in dec["frames"])
                n_frames = len(dec["frames"])
                rows["doc_id"].append(doc_id)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_frames"].append(n_frames)
                rows["n_mb"].append(
                    n_frames * (H264P_W // 16) * (H264P_H // 16)
                )
                rows["n_skip_mb"].append(dec["n_skip_mb"])
                rows["n_p_mb"].append(dec["n_p_mb"])
                rows["n_b_l0"].append(dec["n_b_l0"])
                rows["n_b_l1"].append(dec["n_b_l1"])
                rows["n_b_bi"].append(dec["n_b_bi"])
                rows["n_coded_blocks"].append(dec["n_coded_blocks"])
                rows["sum_mv_l0_q"].append(dec["sum_abs_mv_l0_q"])
                rows["sum_mv_l1_q"].append(dec["sum_abs_mv_l1_q"])
                rows["qp"].append(dec["qp"])
                rows["mean_luma"].append(
                    float(luma) / (n_frames * H264P_W * H264P_H)
                )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    **{
                        c: pd.array(rows[c], dtype="int32")
                        for c in (
                            "width", "height", "n_frames", "n_mb",
                            "n_skip_mb", "n_p_mb", "n_b_l0", "n_b_l1",
                            "n_b_bi", "n_coded_blocks", "sum_mv_l0_q",
                            "sum_mv_l1_q", "qp",
                        )
                    },
                    "mean_luma": rows["mean_luma"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, H264B_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_frames", "n_mb", "n_skip_mb",
        "n_p_mb", "n_b_l0", "n_b_l1", "n_b_bi", "n_coded_blocks",
        "sum_mv_l0_q", "sum_mv_l1_q", "qp",
        F.round("mean_luma", 4).alias("mean_luma"),
    ).orderBy("doc_id")


# Closed forms the B-GOP design pins: c0 and the P bump r_p as in the
# inter oracle; each B MB's value is its per-list prediction plus a
# DC-only residual constant. L0-only and L1-only MBs read constant-c0
# regions; a Bi MB reads its own position from the P frame (zero L0
# MV), so the MB on the bumped column averages in the bump:
# (2*c0 + r_p + 1) >> 1 = c0 + (r_p + 1) // 2. MV sums are the encoder
# parameters verbatim (|mvx|*4, plus the +64 quarter-pel vertical on
# L0-only MBs).
MM_H264_BIPRED_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {H264B_NB} AS nb,
         128 + (160 * (1 + doc_id % 7) + 32) // 64 AS c0,
         (160 * ({H264B_QP_}) + 32) // 64 AS r_p,
         {H264B_COL} AS col_p,
         ABS((doc_id % 9) - 4) * 4 AS p_amvx
  FROM documents),
mbgrid AS (
  SELECT doc_id, nb, c0, r_p, col_p, k.range AS k, m.range AS m,
         1 + (doc_id + k.range + m.range) % 3 AS t,
         (doc_id + k.range + m.range) % 2 = 0 AS coded,
         (160 * (1 + (doc_id * 7 + k.range * 11 + m.range * 5) % 6) + 32)
           // 64 AS r_b,
         ABS(((doc_id + 2 * k.range + m.range) % 9) - 4) * 4 AS amvx0,
         ABS(((doc_id + 3 * k.range + m.range) % 9) - 4) * 4 AS amvx1
  FROM d CROSS JOIN range(1, 3) k CROSS JOIN range(8) m
  WHERE k.range <= nb),
btal AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS INT) AS n_b_l0,
         CAST(SUM(CASE WHEN t = 2 THEN 1 ELSE 0 END) AS INT) AS n_b_l1,
         CAST(SUM(CASE WHEN t = 3 THEN 1 ELSE 0 END) AS INT) AS n_b_bi,
         CAST(SUM(CASE WHEN coded THEN 16 ELSE 0 END) AS INT) AS b_coded,
         CAST(SUM(CASE WHEN t = 1 THEN amvx0 + 64 ELSE 0 END) AS INT)
           AS sum_mv_l0_q,
         CAST(SUM(CASE WHEN t IN (2, 3) THEN amvx1 ELSE 0 END) AS INT)
           AS sum_mv_l1_q,
         CAST(SUM((CASE WHEN t = 3 AND m = col_p
                        THEN (r_p + 1) // 2 ELSE 0 END)
                  + (CASE WHEN coded THEN r_b ELSE 0 END)) AS BIGINT)
           AS b_extra
  FROM mbgrid GROUP BY doc_id)
SELECT d.doc_id, {H264P_W} AS width, {H264P_H} AS height,
       CAST(nb + 2 AS INT) AS n_frames,
       CAST((nb + 2) * 8 AS INT) AS n_mb,
       7 AS n_skip_mb,
       1 AS n_p_mb,
       n_b_l0, n_b_l1, n_b_bi,
       CAST(1 + 16 + b_coded AS INT) AS n_coded_blocks,
       sum_mv_l0_q, sum_mv_l1_q,
       24 AS qp,
       ROUND(CAST(c0 * 2048 * (nb + 2) + 256 * r_p + 256 * b_extra AS DOUBLE)
             / (2048 * (nb + 2)), 4) AS mean_luma
FROM d JOIN btal USING (doc_id)
ORDER BY doc_id
"""


# --- H.264 half-pel (6-tap) motion-compensation GOP decode -------------------

H264S_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_mb", T.IntegerType()),
        T.StructField("n_skip_mb", T.IntegerType()),
        T.StructField("n_p_mb", T.IntegerType()),
        T.StructField("n_halfpel_mb", T.IntegerType()),
        T.StructField("n_coded_blocks", T.IntegerType()),
        T.StructField("sum_mvx_q", T.IntegerType()),
        T.StructField("sum_mvy_q", T.IntegerType()),
        T.StructField("n_mode_v", T.IntegerType()),
        T.StructField("n_mode_h", T.IntegerType()),
        T.StructField("n_mode_dc", T.IntegerType()),
        T.StructField("qp", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def mm_h264_subpel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL H.264 GOP decode through HALF-SAMPLE motion compensation —
    the 8.4.2.2.1 (1,-5,20,20,-5,1) 6-tap luma interpolation
    (``operators/h264_codec._mc_subpel``), exercised across a real
    luma step edge so the filter output is value-load-bearing, not a
    constant-plane identity.

    Per doc a 3-frame GOP: an IDR (constant plane c0 = 128 +
    dequant(L0)), then P1 bumps macroblock 1 (columns 16..31, top row)
    by r1 with a zero MV — creating a step edge in the reference — and
    P2 codes one MB with a HALF-PEL MV whose 6-tap window straddles
    that edge. Even docs take the horizontal half position ``b`` (MV
    (4·dxp+2, 0) on MB 0, taps crossing the x=16 edge); odd docs the
    vertical half position ``h`` (MV (0, -4·m+2) on MB 5, taps
    crossing the y=16 edge from below). Because 32·c0 is a multiple of
    32, every interpolated sample is exactly c0 + ((r1·w + 16) >> 5)
    where w is the 6-tap prefix/suffix mass that lands in the bumped
    region — so the whole decode is closed-form: a wrong tap weight,
    rounding constant, shift, or boundary clamp shifts ``mean_luma``.

    Scale design: one Arrow ``mapInPandas`` over ``_spread`` ids, zero
    joins, zero shuffles beyond the final display ``orderBy`` — the
    same plan as the certified intra/inter queries.
    """
    from .h264_codec import decode_h264, encode_h264_gop

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in H264S_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                i_level = 1 + doc_id % 7
                q1 = 1 + doc_id % 6
                q2 = 1 + (doc_id * 5) % 6
                if doc_id % 2 == 0:
                    dxp = 4 + doc_id % 9
                    mb2, mv2 = 0, (4 * dxp + 2, 0)
                else:
                    m = 1 + doc_id % 9
                    mb2, mv2 = 5, (0, -4 * m + 2)
                dec = decode_h264(
                    encode_h264_gop(
                        H264P_W,
                        H264P_H,
                        i_level,
                        [(1, (0, 0), q1), (mb2, mv2, q2)],
                        doc_id,
                    )
                )
                if dec["width"] != H264P_W or dec["height"] != H264P_H:
                    raise ValueError("H.264 SPS dims disagree")
                luma = sum(sum(f) for f in dec["frames"])
                rows["doc_id"].append(doc_id)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_frames"].append(len(dec["frames"]))
                rows["n_mb"].append(
                    len(dec["frames"]) * (H264P_W // 16) * (H264P_H // 16)
                )
                rows["n_skip_mb"].append(dec["n_skip_mb"])
                rows["n_p_mb"].append(dec["n_p_mb"])
                rows["n_halfpel_mb"].append(dec["n_subpel_mb"])
                rows["n_coded_blocks"].append(dec["n_coded_blocks"])
                rows["sum_mvx_q"].append(dec["sum_abs_mvx_q"])
                rows["sum_mvy_q"].append(dec["sum_abs_mvy_q"])
                rows["n_mode_v"].append(dec["n_mode_v"])
                rows["n_mode_h"].append(dec["n_mode_h"])
                rows["n_mode_dc"].append(dec["n_mode_dc"])
                rows["qp"].append(dec["qp"])
                rows["mean_luma"].append(
                    float(luma) / (len(dec["frames"]) * H264P_W * H264P_H)
                )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    **{
                        c: pd.array(rows[c], dtype="int32")
                        for c in (
                            "width", "height", "n_frames", "n_mb",
                            "n_skip_mb", "n_p_mb", "n_halfpel_mb",
                            "n_coded_blocks", "sum_mvx_q", "sum_mvy_q",
                            "n_mode_v", "n_mode_h", "n_mode_dc", "qp",
                        )
                    },
                    "mean_luma": rows["mean_luma"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, H264S_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_frames", "n_mb", "n_skip_mb",
        "n_p_mb", "n_halfpel_mb", "n_coded_blocks", "sum_mvx_q",
        "sum_mvy_q", "n_mode_v", "n_mode_h", "n_mode_dc", "qp",
        F.round("mean_luma", 4).alias("mean_luma"),
    ).orderBy("doc_id")


# Closed forms: F0 = 2048·c0; F1 = F0 + 256·r1 (MB 1 bumped, zero-MV
# skips elsewhere); F2 = F1 + 16·OFF + 256·r2 where OFF is the 6-tap
# edge mass — per interpolated column/row j, the filter adds
# (r1·w(j) + 16) >> 5 on top of c0, w(j) = 32 − prefix(18−dxp−j) for
# the horizontal ``b`` case (suffix of the tap weights inside the
# bumped columns x ≥ 16) and prefix(m+2−i) for the vertical ``h`` case
# (taps inside the bumped rows y ≤ 15); prefix over (1,−5,20,20,−5,1)
# is (0,1,−4,16,36,31,32). FLOOR((…)/32.0) matches the decoder's
# arithmetic >> on the (possibly negative) 16−4·r1 term.
_H264S_PREFIX_SQL = (
    "CASE LEAST(6, GREATEST(0, {c})) WHEN 0 THEN 0 WHEN 1 THEN 1"
    " WHEN 2 THEN -4 WHEN 3 THEN 16 WHEN 4 THEN 36 WHEN 5 THEN 31"
    " ELSE 32 END"
)

MM_H264_SUBPEL_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         128 + (160 * (1 + doc_id % 7) + 32) // 64 AS c0,
         (160 * (1 + doc_id % 6) + 32) // 64 AS r1,
         (160 * (1 + (doc_id * 5) % 6) + 32) // 64 AS r2,
         4 + doc_id % 9 AS dxp,
         1 + doc_id % 9 AS m,
         doc_id % 2 = 0 AS horiz
  FROM documents),
edge AS (
  SELECT doc_id,
         CAST(SUM(CAST(FLOOR((r1 * (CASE WHEN horiz
             THEN 32 - ({_H264S_PREFIX_SQL.format(c="18 - dxp - t.range")})
             ELSE {_H264S_PREFIX_SQL.format(c="m + 2 - t.range")}
           END) + 16) / 32.0) AS BIGINT)) AS BIGINT) AS off
  FROM d CROSS JOIN range(16) t GROUP BY doc_id),
blocks AS (
  SELECT doc_id, bx.range AS bx, by.range AS by,
         doc_id + bx.range + by.range AS cand
  FROM d CROSS JOIN range(16) bx CROSS JOIN range(8) by),
modes AS (
  SELECT doc_id,
         CASE WHEN bx = 0 AND by = 0 THEN 2
              WHEN by = 0 THEN CASE WHEN cand % 2 = 0 THEN 1 ELSE 2 END
              WHEN bx = 0 THEN CASE WHEN cand % 2 = 0 THEN 0 ELSE 2 END
              ELSE cand % 3 END AS mode
  FROM blocks),
mtal AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN mode = 0 THEN 1 ELSE 0 END) AS INT) AS n_mode_v,
         CAST(SUM(CASE WHEN mode = 1 THEN 1 ELSE 0 END) AS INT) AS n_mode_h,
         CAST(SUM(CASE WHEN mode = 2 THEN 1 ELSE 0 END) AS INT) AS n_mode_dc
  FROM modes GROUP BY doc_id)
SELECT d.doc_id, {H264P_W} AS width, {H264P_H} AS height,
       3 AS n_frames, 24 AS n_mb, 14 AS n_skip_mb, 2 AS n_p_mb,
       1 AS n_halfpel_mb, 33 AS n_coded_blocks,
       CAST(CASE WHEN horiz THEN 4 * dxp + 2 ELSE 0 END AS INT) AS sum_mvx_q,
       CAST(CASE WHEN horiz THEN 0 ELSE 4 * m - 2 END AS INT) AS sum_mvy_q,
       n_mode_v, n_mode_h, n_mode_dc, 24 AS qp,
       ROUND(CAST(6144 * c0 + 512 * r1 + 16 * off + 256 * r2 AS DOUBLE)
             / 6144, 4) AS mean_luma
FROM d JOIN edge USING (doc_id) JOIN mtal USING (doc_id)
ORDER BY doc_id
"""


# --- H.264 quarter-pel (Table 8-12) motion-compensation GOP decode -----------

H264Q_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_mb", T.IntegerType()),
        T.StructField("n_skip_mb", T.IntegerType()),
        T.StructField("n_p_mb", T.IntegerType()),
        T.StructField("n_qpel_mb", T.IntegerType()),
        T.StructField("n_coded_blocks", T.IntegerType()),
        T.StructField("sum_mvx_q", T.IntegerType()),
        T.StructField("sum_mvy_q", T.IntegerType()),
        T.StructField("qp", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def mm_h264_qpel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL H.264 GOP decode through QUARTER-SAMPLE motion compensation
    — the Table 8-12 quarter positions (``a``/``c``/``d``/``n``:
    average-with-upward-rounding of the nearest integer sample and the
    6-tap half sample), exercised across a real luma step edge.

    Same 3-frame fixture as the half-pel query (IDR constant plane,
    P1 bumps MB 1 by r1 creating the edge), but P2's coded MB carries
    a quarter-pel MV: ``doc_id % 4`` rotates through a (fx=1) and c
    (fx=3) horizontally on MB 0 and d (fy=1) and n (fy=3) vertically
    on MB 5. Each interpolated sample is exactly
    ``c0 + ((g + bo + 1) >> 1)`` where ``g`` is the integer-sample
    bump mass (r1 when the full-sample sits in the bumped region) and
    ``bo`` the half-sample's 6-tap edge mass — so a wrong averaging
    direction (a vs c, d vs n), rounding constant, or clip order
    shifts ``mean_luma``.

    Scale design: one Arrow ``mapInPandas`` over ``_spread`` ids,
    zero joins — the certified intra/inter plan shape.
    """
    from .h264_codec import decode_h264, encode_h264_gop

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in H264Q_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                i_level = 1 + doc_id % 7
                q1 = 1 + doc_id % 6
                q2 = 1 + (doc_id * 5) % 6
                qf = doc_id % 4
                if qf < 2:  # horizontal: a (fx=1) / c (fx=3) on MB 0
                    dxp = 4 + doc_id % 9
                    mb2, mv2 = 0, (4 * dxp + (1 if qf == 0 else 3), 0)
                else:  # vertical: d (fy=1) / n (fy=3) on MB 5
                    m = 1 + doc_id % 9
                    mb2, mv2 = 5, (0, -4 * m + (1 if qf == 2 else 3))
                dec = decode_h264(
                    encode_h264_gop(
                        H264P_W,
                        H264P_H,
                        i_level,
                        [(1, (0, 0), q1), (mb2, mv2, q2)],
                        doc_id,
                    )
                )
                if dec["width"] != H264P_W or dec["height"] != H264P_H:
                    raise ValueError("H.264 SPS dims disagree")
                luma = sum(sum(f) for f in dec["frames"])
                rows["doc_id"].append(doc_id)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_frames"].append(len(dec["frames"]))
                rows["n_mb"].append(
                    len(dec["frames"]) * (H264P_W // 16) * (H264P_H // 16)
                )
                rows["n_skip_mb"].append(dec["n_skip_mb"])
                rows["n_p_mb"].append(dec["n_p_mb"])
                rows["n_qpel_mb"].append(dec["n_subpel_mb"])
                rows["n_coded_blocks"].append(dec["n_coded_blocks"])
                rows["sum_mvx_q"].append(dec["sum_abs_mvx_q"])
                rows["sum_mvy_q"].append(dec["sum_abs_mvy_q"])
                rows["qp"].append(dec["qp"])
                rows["mean_luma"].append(
                    float(luma) / (len(dec["frames"]) * H264P_W * H264P_H)
                )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    **{
                        c: pd.array(rows[c], dtype="int32")
                        for c in (
                            "width", "height", "n_frames", "n_mb",
                            "n_skip_mb", "n_p_mb", "n_qpel_mb",
                            "n_coded_blocks", "sum_mvx_q", "sum_mvy_q", "qp",
                        )
                    },
                    "mean_luma": rows["mean_luma"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, H264Q_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_frames", "n_mb", "n_skip_mb",
        "n_p_mb", "n_qpel_mb", "n_coded_blocks", "sum_mvx_q",
        "sum_mvy_q", "qp",
        F.round("mean_luma", 4).alias("mean_luma"),
    ).orderBy("doc_id")


# Closed forms: as the half-pel oracle, plus the quarter average —
# per position t, v = c0 + FLOOR((g + bo + 1)/2) with g the
# integer-sample bump mass (a: full sample at sx, in the bump iff
# dxp+t >= 16; c: at sx+1, iff dxp+t+1 >= 16; d: at sy, iff t <= m-1;
# n: at sy+1, iff t <= m-2) and bo the half-sample 6-tap edge mass of
# the subpel oracle.
MM_H264_QPEL_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         128 + (160 * (1 + doc_id % 7) + 32) // 64 AS c0,
         (160 * (1 + doc_id % 6) + 32) // 64 AS r1,
         (160 * (1 + (doc_id * 5) % 6) + 32) // 64 AS r2,
         4 + doc_id % 9 AS dxp,
         1 + doc_id % 9 AS m,
         doc_id % 4 AS qf
  FROM documents),
edge AS (
  SELECT doc_id,
         CAST(SUM(CAST(FLOOR((
           (CASE WHEN qf = 0 THEN CASE WHEN dxp + t.range >= 16 THEN r1 ELSE 0 END
                 WHEN qf = 1 THEN CASE WHEN dxp + t.range + 1 >= 16 THEN r1 ELSE 0 END
                 WHEN qf = 2 THEN CASE WHEN t.range <= m - 1 THEN r1 ELSE 0 END
                 ELSE CASE WHEN t.range <= m - 2 THEN r1 ELSE 0 END END)
           + CAST(FLOOR((r1 * (CASE WHEN qf < 2
               THEN 32 - ({_H264S_PREFIX_SQL.format(c="18 - dxp - t.range")})
               ELSE {_H264S_PREFIX_SQL.format(c="m + 2 - t.range")}
             END) + 16) / 32.0) AS BIGINT)
           + 1) / 2.0) AS BIGINT)) AS BIGINT) AS off
  FROM d CROSS JOIN range(16) t GROUP BY doc_id)
SELECT d.doc_id, {H264P_W} AS width, {H264P_H} AS height,
       3 AS n_frames, 24 AS n_mb, 14 AS n_skip_mb, 2 AS n_p_mb,
       1 AS n_qpel_mb, 33 AS n_coded_blocks,
       CAST(CASE WHEN qf = 0 THEN 4 * dxp + 1
                 WHEN qf = 1 THEN 4 * dxp + 3 ELSE 0 END AS INT) AS sum_mvx_q,
       CAST(CASE WHEN qf = 2 THEN 4 * m - 1
                 WHEN qf = 3 THEN 4 * m - 3 ELSE 0 END AS INT) AS sum_mvy_q,
       24 AS qp,
       ROUND(CAST(6144 * c0 + 512 * r1 + 16 * off + 256 * r2 AS DOUBLE)
             / 6144, 4) AS mean_luma
FROM d JOIN edge USING (doc_id)
ORDER BY doc_id
"""


# --- MPEG-1: real INTER-FRAME (motion-compensated) video decode -------------

MPEG_W, MPEG_H = 48, 32  # 3x2 macroblock grid
MPEG_MBS = 6
MPEG_FRAMES = "2 + doc_id % 3"  # 2..4

MPEG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_i", T.IntegerType()),
        T.StructField("n_p", T.IntegerType()),
        T.StructField("n_mc_mb", T.IntegerType()),
        T.StructField("n_skipped_mb", T.IntegerType()),
        T.StructField("n_intra_mb", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def mm_mpeg1_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL inter-frame video decode — the temporal-compression class
    the all-intra AVI/Motion-JPEG codec deliberately did not claim.

    Per doc_id a tiny MPEG-1 video elementary stream
    (``operators/mpeg1_codec``, ISO 11172-2 subset) is synthesized:
    frame 0 intra (6 constant macroblocks: background b with one
    sprite macroblock s), each later frame moves the sprite one
    macroblock in raster order. The encoder emits a REAL P-picture per
    move — a motion-compensated copy when the ±16-pel vector range
    reaches the sprite's old position (same row), an intra refresh when
    the move wraps rows, skipped macroblocks everywhere unchanged — and
    the decoder reconstructs via the full VLC/DC-prediction/motion
    pipeline. Every feature (frame counts, macroblock-type tallies,
    mean luma over DECODED pixels) is closed-form derivable, so the
    oracle value-checks the whole motion-compensation path: a decoder
    that mis-copies a single macroblock shifts ``mean_luma`` and the
    tallies.

    Closed forms (n = frames, pos_k = (doc_id+k) % 6, cols = 3):
    sprite moves old=pos_{k-1} -> new=pos_k; MC iff new in {1,2,4}
    (not an always-intra first/last macroblock, same row); coded set
    per P-frame = {0,5} ∪ {old,new}; skipped = 6 - |coded|; intra per
    P-frame = |coded| - [MC]; mean luma = (5b + s)/6 every frame.
    """
    from .mpeg1_codec import decode_mpeg1, encode_mpeg1

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W, H, cols = MPEG_W, MPEG_H, MPEG_W // 16

        def frame(bg: int, sp: int, pos: int) -> list[int]:
            f = [bg] * (W * H)
            my, mx = divmod(pos, cols)
            for yy in range(16):
                row = (my * 16 + yy) * W + mx * 16
                f[row : row + 16] = [sp] * 16
            return f

        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in MPEG_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 2 + doc_id % 3
                bg = (doc_id * 31) % 200 + 20
                sp = (bg + 101) % 256
                frames = [frame(bg, sp, (doc_id + k) % MPEG_MBS) for k in range(n)]
                moves = [None] + [
                    ((doc_id + k) % MPEG_MBS, (doc_id + k - 1) % MPEG_MBS)
                    for k in range(1, n)
                ]
                dec = decode_mpeg1(encode_mpeg1(W, H, frames, moves))
                if dec["width"] != W or dec["height"] != H:
                    raise ValueError("MPEG-1 header dims disagree")
                luma = sum(sum(f) for f in dec["frames"])
                rows["doc_id"].append(doc_id)
                rows["width"].append(dec["width"])
                rows["height"].append(dec["height"])
                rows["n_frames"].append(len(dec["frames"]))
                rows["n_i"].append(dec["n_i"])
                rows["n_p"].append(dec["n_p"])
                rows["n_mc_mb"].append(dec["n_mc_mb"])
                rows["n_skipped_mb"].append(dec["n_skipped_mb"])
                rows["n_intra_mb"].append(dec["n_intra_mb"])
                rows["mean_luma"].append(
                    float(luma) / (len(dec["frames"]) * W * H)
                )
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    **{
                        c: pd.array(rows[c], dtype="int32")
                        for c in (
                            "width", "height", "n_frames", "n_i", "n_p",
                            "n_mc_mb", "n_skipped_mb", "n_intra_mb",
                        )
                    },
                    "mean_luma": rows["mean_luma"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, MPEG_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_frames", "n_i", "n_p", "n_mc_mb",
        "n_skipped_mb", "n_intra_mb",
        F.round("mean_luma", 4).alias("mean_luma"),
    ).orderBy("doc_id")


MM_MPEG1_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {MPEG_FRAMES} AS n,
         (doc_id * 31) % 200 + 20 AS bg,
         ((doc_id * 31) % 200 + 20 + 101) % 256 AS sp
  FROM documents
),
pf AS (
  SELECT doc_id, n, unnest(range(1, n)) AS k FROM d
),
m AS (
  SELECT doc_id, n, k,
         (doc_id + k - 1) % {MPEG_MBS} AS old,
         (doc_id + k) % {MPEG_MBS} AS new
  FROM pf
),
per AS (
  SELECT doc_id, n, k,
         CASE WHEN new IN (1, 2, 4) THEN 1 ELSE 0 END AS mc,
         len(list_distinct([0, {MPEG_MBS} - 1, old, new])) AS coded
  FROM m
),
agg AS (
  SELECT doc_id,
         CAST(SUM(mc) AS INT) AS n_mc_mb,
         CAST(SUM({MPEG_MBS} - coded) AS INT) AS n_skipped_mb,
         CAST(SUM(coded - mc) AS INT) AS p_intra
  FROM per GROUP BY doc_id
)
SELECT d.doc_id, {MPEG_W} AS width, {MPEG_H} AS height,
       CAST(n AS INT) AS n_frames,
       1 AS n_i,
       CAST(n - 1 AS INT) AS n_p,
       COALESCE(n_mc_mb, 0) AS n_mc_mb,
       COALESCE(n_skipped_mb, 0) AS n_skipped_mb,
       CAST({MPEG_MBS} + COALESCE(p_intra, 0) AS INT) AS n_intra_mb,
       ROUND((5.0 * bg + sp) / 6.0, 4) AS mean_luma
FROM d LEFT JOIN agg USING (doc_id)
ORDER BY doc_id
"""


# --- GIF: real LZW decode + animation frame stats --------------------------

GIF_W = "6 + doc_id % 5"   # 6..10
GIF_H = "4 + doc_id % 4"   # 4..7
GIF_FRAMES = "1 + doc_id % 3"

GIF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_pixels_total", T.LongType()),
        T.StructField("mean_index", T.DoubleType()),
    ]
)


def mm_gif_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode: synthesize → LZW-compress → decode → featurize.

    Per doc_id an animated GIF89a (``1 + doc_id % 3`` full frames,
    pixel ``(doc_id*11 + f*29 + k) % 256``) is encoded with the
    from-spec LZW compressor and decoded with the full
    variable-code-width LZW decoder (``gif_codec``); the stats come
    from the DECODED index planes, so the oracle match certifies the
    compression round trip, dictionary growth and all.
    """
    from .gif_codec import decode_gif, encode_gif

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in GIF_STATS_SCHEMA}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 6 + doc_id % 5, 4 + doc_id % 4
                n = 1 + doc_id % 3
                frames = [
                    bytes((doc_id * 11 + f * 29 + k) % 256 for k in range(w * h))
                    for f in range(n)
                ]
                dw, dh, dec = decode_gif(encode_gif(w, h, frames))
                total = sum(sum(fr) for fr in dec)
                npx = dw * dh * len(dec)
                rows["doc_id"].append(doc_id)
                rows["width"].append(dw)
                rows["height"].append(dh)
                rows["n_frames"].append(len(dec))
                rows["n_pixels_total"].append(npx)
                rows["mean_index"].append(float(total) / npx)
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "width": pd.array(rows["width"], dtype="int32"),
                    "height": pd.array(rows["height"], dtype="int32"),
                    "n_frames": pd.array(rows["n_frames"], dtype="int32"),
                    "n_pixels_total": pd.array(
                        rows["n_pixels_total"], dtype="int64"
                    ),
                    "mean_index": rows["mean_index"],
                }
            )

    feats = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(decode_batches, GIF_STATS_SCHEMA)
    )
    return feats.select(
        "doc_id", "width", "height", "n_frames", "n_pixels_total",
        F.round("mean_index", 4).alias("mean_index"),
    ).orderBy("doc_id")


MM_GIF_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {GIF_W} AS w, {GIF_H} AS h, {GIF_FRAMES} AS n FROM documents
),
fk AS (
  SELECT doc_id, w, h, n,
         unnest(range(0, n)) AS f
  FROM d
),
px AS (
  SELECT doc_id, w, h, n, f, unnest(range(0, w * h)) AS k FROM fk
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(n AS INT) AS n_frames,
       CAST(w * h * n AS BIGINT) AS n_pixels_total,
       ROUND(AVG((doc_id * 11 + f * 29 + k) % 256), 4) AS mean_index
FROM px GROUP BY doc_id, w, h, n ORDER BY doc_id
"""


# --- perceptual-hash image dedup (aHash over decoded pixels) ---------------

PHASH_TWIN_OFFSET = 30_000_000
PHASH_TWIN_MOD = 10  # every 10th doc gets a perturbed twin image
PHASH_MAX_HAMMING = 3  # pigeonhole banding is exact at <= 3 of 64 bits

# Grayscale synthesis with a doc x position INTERACTION term: aHash is
# brightness-invariant by design, so any f(doc)+g(k) form would give
# every same-dims image an identical hash (constant shift) and flood
# the pair list. The (k % 5) * doc term makes unrelated docs decorrelate.
PHASH_W = "8 + doc_id % 9"
PHASH_H = "5 + doc_id % 7"
PHASH_PX = "(doc_id * 31 + k * k + (k % 5) * doc_id) % 256"

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("img_id", T.LongType()),
        T.StructField("ph_hi", T.LongType()),
        T.StructField("ph_lo", T.LongType()),
    ]
)


def _ahash_from_pixels(px: bytes, w: int, h: int) -> tuple[int, int]:
    """64-bit average hash: 8x8 nearest-neighbor samples thresholded by
    their own mean (integer compare: 64*v > total), packed lo/hi."""
    samples = [
        px[(r * h // 8) * w + (c * w // 8)] for r in range(8) for c in range(8)
    ]
    total = sum(samples)
    hi = lo = 0
    for i, v in enumerate(samples):
        if 64 * v > total:
            if i < 32:
                lo |= 1 << i
            else:
                hi |= 1 << (i - 32)
    return hi, lo


def mm_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs via perceptual hash over REAL decoded pixels.

    The crawl-pipeline image-dedup pass: per doc a grayscale image is
    PNG-encoded and decoded with the from-spec codec, aHash'd, and
    near-identical images (planted twins: every 10th doc repeated with
    +3 brightness on every 17th pixel) pair up at Hamming <= 3. The
    candidate join is the SimHash pigeonhole banding (4 x 16-bit
    chunks — exact at this threshold, never all-pairs); the oracle
    computes the same hashes closed-form and filters all pairs, equal
    by the pigeonhole argument. Brightness-*shift* invariance is
    inherent to aHash (threshold-by-own-mean), which is exactly why the
    perturbation must survive it: +3 on a sparse pixel subset moves
    samples RELATIVE to the mean.
    """
    from .media_codecs import decode_png, encode_png

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            his: list[int] = []
            los: list[int] = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 9, 5 + doc_id % 7
                base = bytes(
                    (doc_id * 31 + k * k + (k % 5) * doc_id) % 256
                    for k in range(w * h)
                )
                variants = [(doc_id, base)]
                if doc_id % PHASH_TWIN_MOD == 0:
                    twin = bytes(
                        min(v + 3, 255) if k % 17 == 0 else v
                        for k, v in enumerate(base)
                    )
                    variants.append((doc_id + PHASH_TWIN_OFFSET, twin))
                for img_id, px in variants:
                    _, _, _, dec = decode_png(encode_png(w, h, px, channels=1))
                    hi, lo = _ahash_from_pixels(dec, w, h)
                    ids.append(img_id)
                    his.append(hi)
                    los.append(lo)
            yield pd.DataFrame(
                {
                    "img_id": pd.array(ids, dtype="int64"),
                    "ph_hi": pd.array(his, dtype="int64"),
                    "ph_lo": pd.array(los, dtype="int64"),
                }
            )

    ph = scoped_cache(
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(hash_batches, PHASH_SCHEMA)
    )
    return _hamming_band_pairs(
        ph, "img_id", "ph_hi", "ph_lo", PHASH_MAX_HAMMING, out_prefix="img"
    )


def _hamming_band_pairs(
    fp: DataFrame,
    id_col: str,
    hi_col: str,
    lo_col: str,
    max_hamming: int,
    out_prefix: str,
) -> DataFrame:
    """Pairs at Hamming <= ``max_hamming`` over a 64-bit fingerprint via
    the SimHash pigeonhole banding (4 x 16-bit chunks — exact for
    thresholds <= 3 of 64 bits, never all-pairs). Emits
    (<out_prefix>_a, <out_prefix>_b, hamming)."""
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright(F.col(half), off)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("cv"),
            )
            for c, (half, off) in enumerate(
                [(lo_col, 0), (lo_col, 16), (hi_col, 0), (hi_col, 16)]
            )
        ]
    )
    ex = fp.select(id_col, hi_col, lo_col, F.explode(chunks).alias("cc")).select(
        id_col, hi_col, lo_col,
        F.col("cc.chunk").alias("chunk"), F.col("cc.cv").alias("cv"),
    )
    a, b = ex.alias("a"), ex.alias("b")
    hamming = (
        F.bit_count(F.col(f"a.{hi_col}").bitwiseXOR(F.col(f"b.{hi_col}")))
        + F.bit_count(F.col(f"a.{lo_col}").bitwiseXOR(F.col(f"b.{lo_col}")))
    )
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(hamming <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias(f"{out_prefix}_a"),
            F.col(f"b.{id_col}").alias(f"{out_prefix}_b"),
            hamming.cast("long").alias("hamming"),
        )
        .distinct()
        .orderBy(f"{out_prefix}_a", f"{out_prefix}_b")
    )


def _phash_oracle_sql() -> str:
    packs_lo = " + ".join(
        f"(CASE WHEN i = {i} AND 64 * v > total THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )
    packs_hi = " + ".join(
        f"(CASE WHEN i = {i} AND 64 * v > total THEN {1 << (i - 32)} ELSE 0 END)"
        for i in range(32, 64)
    )
    return f"""
WITH imgs AS (
  SELECT doc_id, doc_id AS img_id, 0 AS is_twin,
         {PHASH_W} AS w, {PHASH_H} AS h
  FROM documents
  UNION ALL
  SELECT doc_id, doc_id + {PHASH_TWIN_OFFSET} AS img_id, 1 AS is_twin,
         {PHASH_W} AS w, {PHASH_H} AS h
  FROM documents WHERE doc_id % {PHASH_TWIN_MOD} = 0
),
samples AS (
  SELECT img_id, is_twin, doc_id, w, h,
         unnest(range(0, 64)) AS i
  FROM imgs
),
vals AS (
  SELECT img_id, i,
         CASE WHEN is_twin = 1 AND k % 17 = 0
              THEN LEAST({PHASH_PX} + 3, 255)
              ELSE {PHASH_PX} END AS v
  FROM (
    SELECT img_id, is_twin, doc_id, i,
           ((i // 8) * h // 8) * w + ((i % 8) * w // 8) AS k
    FROM samples
  )
),
tot AS (SELECT img_id, SUM(v) AS total FROM vals GROUP BY img_id),
hashes AS (
  SELECT vals.img_id,
         CAST(SUM({packs_lo}) AS BIGINT) AS ph_lo,
         CAST(SUM({packs_hi}) AS BIGINT) AS ph_hi
  FROM vals JOIN tot USING (img_id)
  GROUP BY vals.img_id
)
SELECT a.img_id AS img_a, b.img_id AS img_b,
       CAST(bit_count(xor(a.ph_hi, b.ph_hi))
            + bit_count(xor(a.ph_lo, b.ph_lo)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.img_id < b.img_id
WHERE bit_count(xor(a.ph_hi, b.ph_hi)) + bit_count(xor(a.ph_lo, b.ph_lo))
      <= {PHASH_MAX_HAMMING}
ORDER BY img_a, img_b
"""


MM_PHASH_ORACLE = _phash_oracle_sql()


# --- audio fingerprint dedup (energy-band hash over decoded PCM) -----------

AFP_FRAME = 25  # samples per fingerprint frame
AFP_FRAMES = 64  # frames -> 64-bit fingerprint
AFP_TWIN_OFFSET = 40_000_000
AFP_TWIN_MOD = 10
AFP_MAX_HAMMING = 3

# PCM synthesis: doc-keyed phase, step, AND chirp rate. A plain
# sawtooth left same-step clips with near-identical frame-energy
# profiles (measured: 1536 pairs at sf0.01, almost all false); the
# quadratic chirp gives 97 x 29 (step, rate) classes, enough that
# unrelated clips' energy envelopes decorrelate (measured: exactly the
# 50 planted twins survive, zero false pairs).
AFP_SAMPLE = (
    "((doc_id * 7 + i * (3 + doc_id % 97)"
    " + (1 + doc_id % 29) * i * i) % 2048) - 1024"
)

AFP_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.LongType()),
        T.StructField("fp_hi", T.LongType()),
        T.StructField("fp_lo", T.LongType()),
    ]
)


def _afp_from_samples(samples: list[int]) -> tuple[int, int]:
    """64-bit energy fingerprint: per-frame energy thresholded by the
    clip mean (integer compare: 64 * e_f > total), packed lo/hi."""
    energies = [
        sum(s * s for s in samples[f * AFP_FRAME:(f + 1) * AFP_FRAME])
        for f in range(AFP_FRAMES)
    ]
    total = sum(energies)
    hi = lo = 0
    for f, e in enumerate(energies):
        if AFP_FRAMES * e > total:
            if f < 32:
                lo |= 1 << f
            else:
                hi |= 1 << (f - 32)
    return hi, lo


def mm_audio_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs via energy fingerprints over REAL decoded PCM.

    Completes dedup across modalities (text shingles, embeddings, image
    aHash, now audio): per doc a 16-bit mono clip is WAV round-tripped
    through the stdlib RIFF codec, its 64 frame energies thresholded by
    the clip mean into a 64-bit fingerprint (the shape of a chromaprint
    stage, minus the FFT the container can't justify in pure Python),
    and near-identical clips — planted twins with +2 on every 37th
    sample — pair at Hamming <= 3 via the exact pigeonhole banding.
    All energies are integers, so the fingerprint is bit-exact
    cross-engine and the oracle computes it closed-form over all pairs.
    """
    from .media_codecs import decode_wav, encode_wav

    n = AFP_FRAME * AFP_FRAMES

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            his: list[int] = []
            los: list[int] = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                step, chirp = 3 + doc_id % 97, 1 + doc_id % 29
                base = [
                    ((doc_id * 7 + i * step + chirp * i * i) % 2048) - 1024
                    for i in range(n)
                ]
                variants = [(doc_id, base)]
                if doc_id % AFP_TWIN_MOD == 0:
                    twin = [
                        min(s + 2, 1023) if i % 37 == 0 else s
                        for i, s in enumerate(base)
                    ]
                    variants.append((doc_id + AFP_TWIN_OFFSET, twin))
                for clip_id, samples in variants:
                    _, _, _, dec = decode_wav(encode_wav(samples, WAV_SR))
                    hi, lo = _afp_from_samples(dec)
                    ids.append(clip_id)
                    his.append(hi)
                    los.append(lo)
            yield pd.DataFrame(
                {
                    "clip_id": pd.array(ids, dtype="int64"),
                    "fp_hi": pd.array(his, dtype="int64"),
                    "fp_lo": pd.array(los, dtype="int64"),
                }
            )

    fp = scoped_cache(
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(fp_batches, AFP_SCHEMA)
    )
    return _hamming_band_pairs(
        fp, "clip_id", "fp_hi", "fp_lo", AFP_MAX_HAMMING, out_prefix="clip"
    )


def _afp_oracle_sql() -> str:
    n = AFP_FRAME * AFP_FRAMES
    packs_lo = " + ".join(
        f"(CASE WHEN f = {f} AND {AFP_FRAMES} * e > total THEN {1 << f} ELSE 0 END)"
        for f in range(32)
    )
    packs_hi = " + ".join(
        f"(CASE WHEN f = {f} AND {AFP_FRAMES} * e > total THEN {1 << (f - 32)} ELSE 0 END)"
        for f in range(32, 64)
    )
    return f"""
WITH clips AS (
  SELECT doc_id, doc_id AS clip_id, 0 AS is_twin FROM documents
  UNION ALL
  SELECT doc_id, doc_id + {AFP_TWIN_OFFSET} AS clip_id, 1 AS is_twin
  FROM documents WHERE doc_id % {AFP_TWIN_MOD} = 0
),
samples AS (
  SELECT clip_id, is_twin, doc_id, unnest(range(0, {n})) AS i FROM clips
),
vals AS (
  SELECT clip_id, i // {AFP_FRAME} AS f,
         CASE WHEN is_twin = 1 AND i % 37 = 0
              THEN LEAST({AFP_SAMPLE} + 2, 1023)
              ELSE {AFP_SAMPLE} END AS s
  FROM samples
),
energies AS (
  SELECT clip_id, f, CAST(SUM(s * s) AS BIGINT) AS e
  FROM vals GROUP BY clip_id, f
),
tot AS (SELECT clip_id, CAST(SUM(e) AS BIGINT) AS total FROM energies GROUP BY clip_id),
hashes AS (
  SELECT energies.clip_id,
         CAST(SUM({packs_lo}) AS BIGINT) AS fp_lo,
         CAST(SUM({packs_hi}) AS BIGINT) AS fp_hi
  FROM energies JOIN tot USING (clip_id)
  GROUP BY energies.clip_id
)
SELECT a.clip_id AS clip_a, b.clip_id AS clip_b,
       CAST(bit_count(xor(a.fp_hi, b.fp_hi))
            + bit_count(xor(a.fp_lo, b.fp_lo)) AS BIGINT) AS hamming
FROM hashes a JOIN hashes b ON a.clip_id < b.clip_id
WHERE bit_count(xor(a.fp_hi, b.fp_hi)) + bit_count(xor(a.fp_lo, b.fp_lo))
      <= {AFP_MAX_HAMMING}
ORDER BY clip_a, clip_b
"""


MM_AFP_ORACLE = _afp_oracle_sql()


# --- video fingerprint dedup (temporal-delta hash over decoded frames) -----
#
# Completes near-dup detection across every modality the engine
# decodes (text shingles, embeddings, image aHash, audio energy
# fingerprints — and now video): the fingerprint is the sequence of
# PER-FRAME luma DELTAS, which is invariant under a constant
# brightness shift — exactly the re-encode perturbation the planted
# twins apply — so shifted twins collide EXACTLY on the fingerprint
# and the candidate join is keyed on (n_frames, fp_md5), never
# all-pairs. Temporal-difference signatures are the standard video-fp
# trick (shot-boundary profiles); the md5 runs over the decimal
# delta string, which both engines render identically.

VFP_W, VFP_H = 8, 6
VFP_FRAMES = "6 + doc_id % 3"  # 5-7 deltas: >= 39 bits of fp entropy
VFP_TWIN_OFFSET = 50_000_000
VFP_TWIN_MOD = 10
#: luma synthesis: a degree-4 square-mod-prime scramble of (doc_id, k),
#: reduced mod 240 so the +2 twin shift can never clamp at 255 (which
#: would break shift invariance).  Per-frame luma carries < 8 bits of
#: shift-invariant signal, so fingerprint discrimination needs BOTH
#: enough frames (6-8 -> 5-7 deltas) and per-frame values with no
#: linear structure in doc_id (the r10 polynomial form made every pair
#: sharing doc_id%50 and %3 collide — quadratic synthetic pairs within
#: each class).  Simulated: 0 unrelated fp collisions at 500 and 5000
#: docs (the oracle/test scales), 4 at 500k (~1e-5 pair rate); each
#: intermediate stays under 1e16, far inside int64 on both engines.
VFP_P = 99_999_989  # prime modulus of the scramble
_VFP_M = f"((doc_id * 9973 + k * 997 + 7) % {VFP_P})"
_VFP_M2 = f"(({_VFP_M} * {_VFP_M} + 13) % {VFP_P})"
VFP_LUMA = f"(({_VFP_M2} * {_VFP_M2}) % {VFP_P}) % 240"

VFP_SCHEMA = T.StructType(
    [
        T.StructField("vid_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("luma0", T.LongType()),
        T.StructField("fp", T.StringType()),
    ]
)


def mm_video_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup pairs via temporal-delta fingerprints over REAL
    decoded frames.

    Per doc a Y4M clip of ``6 + doc_id % 3`` constant frames (frame k
    luma from ``VFP_LUMA``) is encoded and decoded with the from-spec
    YUV4MPEG2 codec; every ``VFP_TWIN_MOD``-th doc also emits a
    brightness-shifted twin (+2 on every pixel, re-encoded). The
    per-frame mean luma comes from the DECODED planes (exact integer:
    frames are constant), the fingerprint is md5 over the frame-delta
    sequence, and pairs join exactly on (n_frames, fingerprint) with
    the recovered brightness shift as the verify column (planted twins
    must show exactly +2).
    """
    import hashlib

    from .media_codecs import decode_y4m, encode_y4m

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            nfs: list[int] = []
            l0s: list[int] = []
            fps: list[str] = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 6 + doc_id % 3
                base = []
                for k in range(n):
                    m = (doc_id * 9973 + k * 997 + 7) % VFP_P
                    m2 = (m * m + 13) % VFP_P
                    base.append((m2 * m2 % VFP_P) % 240)
                variants = [(doc_id, 0)]
                if doc_id % VFP_TWIN_MOD == 0:
                    variants.append((doc_id + VFP_TWIN_OFFSET, 2))
                for vid_id, shift in variants:
                    frames = [
                        bytes([v + shift]) * (VFP_W * VFP_H) for v in base
                    ]
                    _, _, dec = decode_y4m(encode_y4m(VFP_W, VFP_H, frames))
                    means = [sum(f) // (VFP_W * VFP_H) for f in dec]
                    deltas = [b - a for a, b in zip(means, means[1:])]
                    ids.append(vid_id)
                    nfs.append(len(dec))
                    l0s.append(means[0])
                    fps.append(
                        hashlib.md5(
                            ",".join(str(d) for d in deltas).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "vid_id": pd.array(ids, dtype="int64"),
                    "n_frames": pd.array(nfs, dtype="int32"),
                    "luma0": pd.array(l0s, dtype="int64"),
                    "fp": fps,
                }
            )

    fp = scoped_cache(
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .transform(_spread)
        .mapInPandas(fp_batches, VFP_SCHEMA)
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.n_frames") == F.col("b.n_frames"))
            & (F.col("a.vid_id") < F.col("b.vid_id")),
        )
        .select(
            F.col("a.vid_id").alias("vid_a"),
            F.col("b.vid_id").alias("vid_b"),
            F.col("a.n_frames").alias("n_frames"),
            (F.col("b.luma0") - F.col("a.luma0")).alias("luma_shift"),
        )
        .orderBy("vid_a", "vid_b")
    )


MM_VFP_ORACLE = f"""
WITH vids AS (
  SELECT doc_id, doc_id AS vid_id, 0 AS shift FROM documents
  UNION ALL
  SELECT doc_id, doc_id + {VFP_TWIN_OFFSET} AS vid_id, 2 AS shift
  FROM documents WHERE doc_id % {VFP_TWIN_MOD} = 0
),
fr AS (
  SELECT vid_id, doc_id, shift, {VFP_FRAMES} AS n,
         unnest(range(0, {VFP_FRAMES})) AS k
  FROM vids
),
lum AS (
  SELECT vid_id, n, k, {VFP_LUMA} + shift AS luma FROM fr
),
dl AS (
  SELECT vid_id, n, k, luma,
         LEAD(luma) OVER (PARTITION BY vid_id ORDER BY k) - luma AS d
  FROM lum
),
fps AS (
  SELECT vid_id, n,
         md5(string_agg(CAST(d AS VARCHAR), ',' ORDER BY k)) AS fp
  FROM dl WHERE d IS NOT NULL GROUP BY vid_id, n
),
l0 AS (SELECT vid_id, luma AS luma0 FROM lum WHERE k = 0)
SELECT a.vid_id AS vid_a, b.vid_id AS vid_b,
       CAST(a.n AS INT) AS n_frames,
       CAST(b0.luma0 - a0.luma0 AS BIGINT) AS luma_shift
FROM fps a
JOIN fps b ON a.fp = b.fp AND a.n = b.n AND a.vid_id < b.vid_id
JOIN l0 a0 ON a0.vid_id = a.vid_id
JOIN l0 b0 ON b0.vid_id = b.vid_id
ORDER BY vid_a, vid_b
"""


QUERIES = [
    Query("mm_video_fp_dedup",
          "video near-dup pairs: temporal-delta fingerprint over "
          "real-codec-decoded frames, exact (n_frames, fp) join, "
          "brightness shift recovered per pair",
          mm_video_fp_dedup, MM_VFP_ORACLE),
    Query("mm_audio_fp_dedup",
          "audio near-dup pairs: energy fingerprint over real-codec-decoded "
          "PCM + pigeonhole Hamming banding",
          mm_audio_fp_dedup, MM_AFP_ORACLE),
    Query("mm_phash_dedup",
          "image near-dup pairs: aHash over real-codec-decoded pixels + "
          "pigeonhole Hamming banding",
          mm_phash_dedup, MM_PHASH_ORACLE),
    Query("mm_payload_stats", "binary payload byte stats per source", mm_payload_stats,
          MM_PAYLOAD_ORACLE),
    Query("mm_png_resize_stats",
          "REAL nearest-neighbor image resize through two full PNG round "
          "trips (decode -> resample -> re-encode -> re-decode)",
          mm_png_resize_stats, MM_PNG_RESIZE_ORACLE),
    Query("mm_wav_vad_stats",
          "REAL energy-based voice-activity detection over decoded PCM "
          "frames (20ms framing + per-frame RMS)",
          mm_wav_vad_stats, MM_WAV_VAD_ORACLE),
    Query("mm_png_deadletter_stats",
          "dead-letter PNG decode over planted stored payloads (valid + "
          "truncated + CRC-corrupt): errors become rows, never task failures",
          mm_png_deadletter_stats, MM_PNG_DEADLETTER_ORACLE),
    Query("mm_png_decode_stats",
          "REAL PNG decode (from-spec stdlib codec: CRC walk, inflate, "
          "unfilter) value-checked through an encode->decode round trip",
          mm_png_decode_stats, MM_PNG_DECODE_ORACLE),
    Query("mm_wav_decode_stats",
          "REAL WAV/PCM decode (stdlib RIFF parser) value-checked through "
          "an encode->decode round trip",
          mm_wav_decode_stats, MM_WAV_DECODE_ORACLE),
    Query("mm_jpeg_decode_stats",
          "REAL baseline JPEG decode (from-spec stdlib codec: Huffman, "
          "zigzag, dequant, IDCT) value-checked through the lossless "
          "flat-qtable round trip",
          mm_jpeg_decode_stats, MM_JPEG_DECODE_ORACLE),
    Query("mm_gif_decode_stats",
          "REAL animated-GIF decode (full variable-width LZW) via "
          "mapInPandas",
          mm_gif_decode_stats, MM_GIF_ORACLE),
    Query("mm_y4m_video_stats",
          "REAL uncompressed-video decode (YUV4MPEG2 parse + frame "
          "sampling) via mapInPandas",
          mm_y4m_video_stats, MM_Y4M_ORACLE),
    Query("mm_avi_mjpeg_stats",
          "REAL compressed-video decode (AVI RIFF walk + per-frame "
          "baseline/progressive JPEG entropy decode) via mapInPandas",
          mm_avi_mjpeg_stats, MM_AVI_ORACLE),
    Query("mm_mpeg1_video_stats",
          "REAL inter-frame video decode: from-spec MPEG-1 (ISO 11172-2) "
          "I/P subset — motion-compensated copies, skipped-macroblock "
          "propagation, intra refresh, DC-prediction chains — lossless "
          "round trip value-checked per macroblock tally",
          mm_mpeg1_video_stats, MM_MPEG1_ORACLE),
    Query("mm_h264_intra_stats",
          "REAL H.264 baseline I-slice decode (ITU-T H.264 subset: "
          "Annex-B NAL + emulation prevention, Exp-Golomb headers, "
          "CAVLC with nC context, LevelScale dequant + 4x4 inverse "
          "integer transform, Intra_4x4 V/H/DC prediction with the "
          "min(modeA,modeB) predictor) — lossless round trip, mode "
          "tallies + mean luma value-checked",
          mm_h264_intra_stats, MM_H264_ORACLE),
    Query("mm_h264_inter_stats",
          "REAL H.264 baseline GOP decode (IDR + P-slices: mb_skip_run, "
          "the 8.4.1.1 P_Skip MV rule, P_L0_16x16 CAVLC motion-vector "
          "differences vs the 8.4.1.3 median predictor, Table 9-4 Inter "
          "cbp, full-pel MC with boundary clamping, inter DC residuals) "
          "— skip/P tallies, |MV| sums + mean luma value-checked",
          mm_h264_inter_stats, MM_H264_INTER_ORACLE),
    Query("mm_h264_bipred_stats",
          "REAL H.264 Main-profile GOP decode with B-slice BIPREDICTION "
          "(B_L0/B_L1/B_Bi_16x16 mb_types, per-list CAVLC MVDs vs the "
          "8.4.1.3 median predictor per reference list, 8.2.4.2.4 "
          "two-deep reference-list construction, 8.4.2.3 default "
          "weighted prediction (p0+p1+1)>>1) — per-type tallies, "
          "per-list |MV| sums + mean luma value-checked",
          mm_h264_bipred_stats, MM_H264_BIPRED_ORACLE),
    Query("mm_h264_subpel_stats",
          "REAL H.264 GOP decode through HALF-SAMPLE motion compensation "
          "(the 8.4.2.2.1 (1,-5,20,20,-5,1) 6-tap luma interpolation "
          "across a genuine step edge, b and h positions, per-tap "
          "boundary clamping) — half-pel MB tally, |MV| sums + "
          "edge-mass mean luma value-checked",
          mm_h264_subpel_stats, MM_H264_SUBPEL_ORACLE),
    Query("mm_h264_qpel_stats",
          "REAL H.264 GOP decode through QUARTER-SAMPLE motion "
          "compensation (Table 8-12 a/c/d/n averages of the nearest "
          "integer + 6-tap half samples, across a genuine step edge) "
          "— quarter-pel MB tally, |MV| sums + mean luma value-checked",
          mm_h264_qpel_stats, MM_H264_QPEL_ORACLE),
    Query("mm_decode_features", "Arrow-batched decode/feature-extract (stub kernel)",
          mm_decode_features, MM_DECODE_ORACLE),
    Query("mm_frame_sample_stats", "fan-out frame sampling via mapInPandas",
          mm_frame_sample_stats, MM_FRAMES_ORACLE),
]
