"""Event-time normalization shared by the streaming operators.

``withWatermark`` (and every event-time construct behind it) requires a
TIMESTAMP (with local timezone) column; parquet files written without
timezone metadata arrive as TIMESTAMP_NTZ under Spark 4's
``spark.sql.parquet.inferTimestampNTZ.enabled`` default. The engine pins
``spark.sql.session.timeZone`` to UTC (session.py), so the NTZ->LTZ cast
performed here is exactly "interpret the naive value as UTC" — no wall
clock shift, identical instants, and a no-op when the column is already
TIMESTAMP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Return ``df`` with ``col`` guaranteed to be TIMESTAMP (ltz)."""
    if isinstance(df.schema[col].dataType, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df
