"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf=0.01, then compares row count, column names, and
order-insensitive values. Exit 0 iff everything matches.

Usage: python tools/check_oracles.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from csv_2_db_pipeline_data_engineering_spark.operators.lifecycle import release_scoped_caches
from csv_2_db_pipeline_data_engineering_spark.session import get_session
from csv_2_db_pipeline_data_engineering_spark.sources.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        else:
            out[c] = s.astype(str) if s.dtype == object else s
    nd = pd.DataFrame(out)
    return nd.sort_values(by=list(nd.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    if problems:
        return problems
    # Driver-strictness: the driver hashes canonicalized VALUES, so a
    # float64 column on one side vs int64 on the other ("3.0" vs "3")
    # hash-mismatches even when numerically equal (the round-1 failure
    # mode: DuckDB SUM(int) -> HUGEINT -> float64). Fail on any
    # float-vs-integer dtype pair up front.
    for c in sorted(spark_df.columns):
        sf, of = spark_df[c], oracle_df[c]
        s_float = pd.api.types.is_float_dtype(sf)
        o_float = pd.api.types.is_float_dtype(of)
        s_int = pd.api.types.is_integer_dtype(sf)
        o_int = pd.api.types.is_integer_dtype(of)
        if (s_float and o_int) or (s_int and o_float):
            problems.append(
                f"dtype drift col {c}: spark={sf.dtype} oracle={of.dtype} "
                "(driver's exact hash would fail)"
            )
    if problems:
        return problems
    a, b = normalize(spark_df), normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            ok = [
                (pd.isna(x) and pd.isna(y)) or (not pd.isna(x) and not pd.isna(y)
                                                and math.isclose(float(x), float(y),
                                                                 rel_tol=1e-9, abs_tol=1e-6))
                for x, y in zip(av, bv)
            ]
            if not all(ok):
                i = ok.index(False)
                problems.append(f"col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}")
        else:
            neq = av.astype(str) != bv.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                problems.append(f"col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}")
    return problems


def main() -> int:
    only = set(sys.argv[1:])
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    spark = get_session(master="local[8]", shuffle_partitions="16")
    failures, checked, rows_only = 0, 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        finally:
            release_scoped_caches()  # query-scoped caches die with the query
        if name not in oracles:
            rows_only += 1
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.monotonic()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        checked += 1
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems[:3]))
        else:
            print(f"ok    {name}: {len(sdf)} rows [{time.monotonic()-t0:.1f}s]")
    print(f"\n{checked} oracle-checked, {rows_only} rows-only, {failures} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
