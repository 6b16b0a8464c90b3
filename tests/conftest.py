"""Shared pytest fixtures: one session-scoped SparkSession (local[*]),
testdata paths, and a DuckDB connection with the driver's views."""

from __future__ import annotations

import os

import duckdb
import pytest

from real_estate_bigdata_spark.schema import TABLE_NAMES
from real_estate_bigdata_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
#: override to sweep the oracle mirror at another scale factor
#: (e.g. SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001) — catches
#: data-dependent oracle brittleness the fixed-SF run can't see
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("WARN")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection mirroring the driver's oracle setup: each testdata
    table registered as a view (sf0.01)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_CORRECT}/{name}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_CORRECT
