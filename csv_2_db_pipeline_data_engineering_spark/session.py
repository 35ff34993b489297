"""SparkSession factory with scale-aware defaults.

The engine never *requires* its own session (every operator takes the
caller's ``SparkSession``), but ``get_session`` is the tuned entry point
for standalone runs and tests.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_session(
    app_name: str = "csv_2_db_pipeline_data_engineering_spark",
    master: str | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Defaults are chosen for the dual target: correctness locally on
    ``local[N]``, efficiency on a real cluster:

    - AQE on (runtime coalesce of shuffle partitions, skew-join splitting,
      dynamic broadcast conversion) — the single biggest lever at 100 TB.
    - Arrow on, for the few Pandas-UDF paths (multimodal decode).
    - ANSI off: the reference's coerce-style cast semantics
      (``pd.to_numeric(errors="coerce")``, ``src/transform.py:37-39``)
      map to NULL-on-failure casts. Operators also use ``try_``-variants
      so they stay correct under a foreign ANSI-on session.
    """
    # Python workers import this package by NAME when unpickling
    # mapInPandas/pandas_udf closures; a driver script that found the
    # package via sys.path editing (not cwd) would otherwise strand the
    # workers (sys.path edits don't propagate). The JVM — and the
    # worker daemon it spawns — inherits the driver's env at session
    # build, so pinning PYTHONPATH here makes the package importable
    # from any driver cwd.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pp + (os.pathsep if pp else "") + repo_root
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    master = master or (f"local[{cpus}]" if cpus else "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS,
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        # Wide operators (the 128-column MinHash signature agg) must stay
        # inside whole-stage codegen; the default cutoff is 100 fields.
        .config("spark.sql.codegen.maxFields", "256")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
