"""Generic isolated warm probe: N interleaved reps of [q1 control, targets...].

The r11/r12 probe protocol from BENCH_DELTAS.md generalized to any
catalog subset (tools/probe_events_json.py was the single-query form):
one boot, warm-up query, then N interleaved reps with scoped caches and
the session cache dropped between reps; min-of-N is the plan-cost
estimator and the q1 control divides host drift out of cross-boot
comparisons.

Usage: python tools/probe_queries.py [--reps N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
    release_scoped_caches,
)
from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog
from csv_2_db_pipeline_data_engineering_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONTROL = "q1_pricing_summary"


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    names = [CONTROL] + [n for n in args if n != CONTROL]
    catalog = get_catalog()
    missing = [n for n in names if n not in catalog]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    spark = get_session(
        app_name="probe_queries",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    nation = spark.read.parquet(os.path.join(SF_DIR, "nation.parquet"))
    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .withColumn("rn", F.row_number().over(w))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    all_reps: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"probe: {name}")
            t0 = time.monotonic()
            catalog[name].builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            all_reps[name].append(round(time.monotonic() - t0, 3))
            release_scoped_caches()
            spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "reps": reps,
                "mins": {n: min(t) for n, t in all_reps.items()},
                "all_reps": all_reps,
            }
        )
    )


if __name__ == "__main__":
    main()
