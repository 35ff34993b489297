"""10-rep isolated warm probe: events_json_stats vs the q1 control.

The r16 noise-adjudication ask (VERDICT r15 #5): events_json_stats was
the only raw bench regression in r15 (0.56 -> 0.80 s recorded,
~1.65x control-normalized) on code untouched since r12. This replays
the r11/r12 isolated-probe protocol from BENCH_DELTAS.md: one boot,
warm-up query, then N interleaved reps of [control, target] with
caches dropped between reps; min-of-N is the plan-cost estimator.

Usage: python tools/probe_events_json.py [reps]
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
NAMES = ["q1_pricing_summary", "events_json_stats"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    catalog = get_catalog()
    spark = get_session(
        app_name="probe_events_json",
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

    all_reps: dict[str, list[float]] = {n: [] for n in NAMES}
    for _ in range(reps):
        for name in NAMES:
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
