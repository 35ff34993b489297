"""Z-order clustering prunes on every clustered column; compaction bin-packs."""

from __future__ import annotations

import pyarrow.parquet as pq
from pathlib import Path

from pyspark.sql import functions as F

from csv_2_db_pipeline_data_engineering_spark.sinks.layout import (
    compact_parquet,
    write_zordered,
    zorder_key,
)
from csv_2_db_pipeline_data_engineering_spark.sources.tables import load_table
from tests.conftest import SF_DIR_CORRECTNESS

N_FILES = 16


def _files_overlapping(path: str, col: str, lo: float, hi: float) -> int:
    """Files whose parquet-footer [min,max] for ``col`` intersects [lo,hi]."""
    n = 0
    for f in Path(path).rglob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            n += 1
    return n


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-order on (o_custkey, o_totalprice) must make file-level min/max
    selective on BOTH columns; a linear sort is selective only on its
    leading column. Narrow range predicates should touch a strict
    subset of files in the z layout on each dimension."""
    orders = load_table(spark, SF_DIR_CORRECTNESS, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(orders, zpath, ["o_custkey", "o_totalprice"], N_FILES)
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.parquet(lpath)
    )

    # same data back
    assert spark.read.parquet(zpath).count() == orders.count()

    # narrow slice on each clustered dimension (~2% of the domain)
    z_cust = _files_overlapping(zpath, "o_custkey", 100, 130)
    z_price = _files_overlapping(zpath, "o_totalprice", 1000.0, 11000.0)
    lin_price = _files_overlapping(lpath, "o_totalprice", 1000.0, 11000.0)

    # z layout prunes on BOTH dims; the linear layout reads everything
    # for the non-leading dim
    assert z_cust < N_FILES / 2
    assert z_price < N_FILES / 2
    assert lin_price == N_FILES
    assert z_price < lin_price


def test_zorder_key_is_deterministic_and_bounded(spark):
    orders = load_table(spark, SF_DIR_CORRECTNESS, "orders")
    z = orders.select(zorder_key(orders, ["o_custkey", "o_totalprice"]).alias("z"))
    stats = z.agg(F.min("z"), F.max("z")).head()
    assert stats[0] >= 0 and stats[1] < (1 << 32)


def test_compaction_bin_packs(spark, tmp_path):
    path = str(tmp_path / "shards")
    nation = load_table(spark, SF_DIR_CORRECTNESS, "nation")
    nation.repartition(40).write.parquet(path)  # simulate tiny-file ingest
    before = len(list(Path(path).rglob("*.parquet")))
    assert before >= 25  # 25 rows -> empty shards still materialize files

    rows_before = spark.read.parquet(path).count()
    n_out = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    after = len(list(Path(path).rglob("*.parquet")))

    assert n_out == 1 and after == 1
    assert spark.read.parquet(path).count() == rows_before
