from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csv_2_db_pipeline_data_engineering_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session(master="local[4]", shuffle_partitions="8")
    yield s
    s.stop()


# 10-row fixture reproducing the reference's golden trace
# (README.md:163-167): 10 input -> 9 clean + 1 rejected (T006, missing
# status -> transformed to literal 'invalid' here? no: the golden reject is
# an invalid status value). Dirty-but-recoverable cases from FIXTURES.md:
# 3 date formats, whitespace/case noise, null status->unknown.
GOLDEN_CSV = """transaction_id,customer_id,product_name,quantity,unit_price,transaction_date,region,status
T001,101,Widget Pro,3,19.99,2024-01-15,North,Completed
t002 ,102, Gadget Max ,1,149.50,15/01/2024, SOUTH ,pending
T003,103,Widget Pro,2,19.99,Jan 16 2024,East,completed
T004,104,Doohickey,5,4.25,2024-01-16,West,cancelled
T005,105,Widget Pro,1,19.99,17/01/2024,North,
T006,106,Gadget Max,2,149.50,2024-01-17,South,shipped
T007,107,Thingamajig,4,9.99,Jan 18 2024,East,completed
T008,108,Widget Pro,6,19.99,2024-01-18,West,PENDING
T009,109,Doohickey,10,4.25,19/01/2024,North,completed
T010,110,Gadget Max,1,149.50,2024-01-19,South,Cancelled
"""


@pytest.fixture()
def golden_csv(tmp_path):
    p = tmp_path / "sales_data.csv"
    p.write_text(GOLDEN_CSV, encoding="utf-8")
    return str(p)
