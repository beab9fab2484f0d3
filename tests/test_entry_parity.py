"""Driver-gate rehearsal: run every queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet, compare row count +
columns + values (order-insensitive), mimicking CORRECTNESS_r{N}.json.

Runs at sf0.001 for speed; the driver uses sf0.01 (spot-checked manually).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.parity_util import assert_frames_match

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(entry_mod.oracle_sql()[name]).df()
    assert_frames_match(name, spark_pdf, duck_pdf)


def test_rows_only_queries(spark):
    for name in set(entry_mod.queries()) - set(ORACLE_KEYS):
        df = entry_mod.queries()[name](spark, SF_DIR)
        assert df.count() >= 0
        assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
