"""Dump the AQE FINAL (executed) plan of a catalog query.

The static explain("formatted") shows `AdaptiveSparkPlan
isFinalPlan=false` and never prints ReusedExchange nodes — those
materialize at runtime. This tool executes the query's OWN Dataset via
collect() (so its QueryExecution is the one that ran) and then captures
explain(), which now renders the final adaptive plan including
AQEShuffleRead and ReusedExchange nodes.

Usage: SPARK_GRAFT_SF_DIR=... python tools/aqe_executed_plan.py <out.txt> query
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import (
    release_scoped_caches,
)
from csv_2_db_pipeline_data_engineering_spark.plans.catalog import get_catalog
from csv_2_db_pipeline_data_engineering_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path, name = sys.argv[1], sys.argv[2]
    catalog = get_catalog()
    spark = get_session(
        app_name="aqe_executed_plan",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = catalog[name].builder(spark, SF_DIR)
    n = len(df.collect())  # executes THIS Dataset's QueryExecution
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    with open(out_path, "w") as f:
        f.write(plan)
    reused = plan.count("ReusedExchange")
    final = "isFinalPlan=true" in plan
    print(
        f"wrote {out_path}: rows={n} lines={len(plan.splitlines())} "
        f"ReusedExchange={reused} final={final}"
    )
    release_scoped_caches()
    spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
