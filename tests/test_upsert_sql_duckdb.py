"""Execute the staging + ON CONFLICT merge SQL against a real database.

No Postgres runs in this container, so the reference's core sink
contract — rerun idempotency through ``INSERT ... ON CONFLICT DO
UPDATE`` (reference ``src/load.py:77-96``, ``README.md:150``) — is
exercised here against DuckDB, which implements the same PG-dialect
upsert statement. The SQL under test is the exact string
``sinks.jdbc.upsert_sql()`` sends over JDBC, and the DDL is the exact
``SALES_DDL`` bootstrap, so the merge semantics (insert new keys,
last-write-wins on conflict, one atomic statement) run for real instead
of stopping at SQL-text assertions. The live-PG twin stays in
``test_pg_integration.py`` behind ``SPARK_GRAFT_PG_URL``.

(``REJECTED_DDL`` uses the PG-only ``SERIAL`` type, so the dead-letter
append path keeps its SQL-text test + parquet twin only.)
"""

from __future__ import annotations

import duckdb
import pytest

from csv_2_db_pipeline_data_engineering_spark.schema import SALES_DDL, SALES_TABLE
from csv_2_db_pipeline_data_engineering_spark.sinks.jdbc import upsert_sql

STAGING = f"{SALES_TABLE}_staging"


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.execute(SALES_DDL)
    c.execute(
        f"""CREATE TABLE {STAGING} (
            transaction_id VARCHAR, customer_id INTEGER, product_name VARCHAR,
            quantity INTEGER, unit_price NUMERIC(10,2), transaction_date DATE,
            region VARCHAR, status VARCHAR, total_sale NUMERIC(10,2))"""
    )
    yield c
    c.close()


def _stage(con, rows):
    con.execute(f"DELETE FROM {STAGING}")
    con.executemany(
        f"INSERT INTO {STAGING} VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)", rows
    )
    con.execute(upsert_sql(STAGING))


ROW1 = ("T001", 101, "Widget Pro", 3, 19.99, "2024-01-15", "North", "completed", 59.97)


def test_merge_inserts_then_rerun_is_idempotent(con):
    rows = [ROW1, ("T002", 102, "Gadget Max", 1, 149.50, "2024-01-16", "South", "pending", 149.50)]
    _stage(con, rows)
    assert con.execute(f"SELECT COUNT(*) FROM {SALES_TABLE}").fetchone()[0] == 2

    # identical rerun: same statement, same staging contents -> no growth,
    # no value drift (the reference's "running 100 times == running once")
    _stage(con, rows)
    assert con.execute(f"SELECT COUNT(*) FROM {SALES_TABLE}").fetchone()[0] == 2
    got = con.execute(
        f"SELECT transaction_id, quantity, total_sale::DOUBLE FROM {SALES_TABLE} ORDER BY 1"
    ).fetchall()
    assert got == [("T001", 3, 59.97), ("T002", 1, 149.50)]


def test_merge_conflict_takes_staged_values(con):
    _stage(con, [ROW1])
    # same key, corrected quantity/total -> update must win
    _stage(con, [("T001", 101, "Widget Pro", 5, 19.99, "2024-01-15", "North", "completed", 99.95)])
    got = con.execute(
        f"SELECT quantity, total_sale::DOUBLE FROM {SALES_TABLE} WHERE transaction_id='T001'"
    ).fetchone()
    assert got == (5, 99.95)
    assert con.execute(f"SELECT COUNT(*) FROM {SALES_TABLE}").fetchone()[0] == 1


def test_merge_preserves_loaded_at_default(con):
    _stage(con, [ROW1])
    loaded = con.execute(
        f"SELECT loaded_at FROM {SALES_TABLE} WHERE transaction_id='T001'"
    ).fetchone()[0]
    assert loaded is not None, "loaded_at must come from the DB default"
