"""Physical-layout maintenance: Z-order clustering and small-file compaction.

Data-skipping at 100 TB is a *layout* property: parquet readers prune
files and row groups by min/max statistics, and those statistics are
only selective if rows with similar values are physically adjacent.

- A linear sort makes stats selective on the leading column only.
- A Z-ORDER (Morton) curve interleaves the bit-level bucket indexes of
  several columns, so file min/max ranges stay tight on EVERY clustered
  column — point/range predicates on any of them prune files
  (the technique behind Delta/Iceberg OPTIMIZE ZORDER BY).

Implementation is pure column expressions: per-column equi-width bucket
index via ``width_bucket`` over driver-fetched min/max (two tiny
aggregates — not a sort), then bit interleave with shift/or — all
codegen, no UDF, no global sort. ``repartitionByRange(z)`` +
``sortWithinPartitions(z)`` clusters without a single-partition
bottleneck: the range exchange samples, so output files get
near-equal row counts.

Compaction bin-packs a directory of small files into ~target-sized
outputs — the standard post-streaming-ingest maintenance op. Reading
many tiny files costs a task + footer parse each; at 100 TB the
listing alone can dominate. Uses the same staged-swap as the upsert
sink so readers never observe a half-written directory.
"""

from __future__ import annotations

import math
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

ZORDER_BITS = 16  # bucket bits per column; 2 cols -> 32-bit z key


def zorder_key(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS) -> Column:
    """Morton key interleaving equi-width bucket indexes of ``cols``.

    Bounds come from one driver-side min/max aggregate (O(cols) scalars,
    not data); bucketization and bit-interleave are flat expressions.
    """
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols],
    ).head()
    n = (1 << bits) - 1
    bucket_cols = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        if lo is None or hi is None or hi == lo:
            bucket_cols.append(F.lit(0))
            continue
        frac = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo)
        bucket_cols.append(
            F.least(F.floor(frac * n), F.lit(n - 1)).cast("long")
        )
    # interleave: output bit (i*len(cols)+j) = bit i of column j's bucket
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucket_cols):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(bucket_cols) + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` clustered on the Z-curve of ``cols`` into ``n_files``.

    Range-partition by z key (sampled exchange — parallel, no global
    sort), sort within each partition, drop the key before writing so
    the layout is invisible to readers except through better pruning.
    """
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Bin-pack a parquet directory into ~``target_file_bytes`` files.

    Returns the new file count. Sizing uses the on-disk byte total (what
    actually governs read cost), not row counts. Staged-swap: the
    compacted copy is written beside the original and moved into place,
    so a crash never leaves a mix of old and new files.
    """
    p = Path(path)
    files = [f for f in p.rglob("*.parquet") if f.is_file()]
    total = sum(f.stat().st_size for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(path)
    staging = tempfile.mkdtemp(dir=str(p.parent), prefix=".compact_staging_")
    try:
        df.repartition(n_out).write.mode("overwrite").parquet(staging)
        backup = str(p) + ".compact_old"
        shutil.move(str(p), backup)
        shutil.move(staging, str(p))
        shutil.rmtree(backup)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    return n_out
