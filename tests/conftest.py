from __future__ import annotations

import os

import duckdb
import pytest

from external_benchmarks_spark.catalog import TESTDATA_TABLES
from external_benchmarks_spark.session import get_spark

# Tests default to the smallest scale for speed; CI/driver correctness runs
# at sf0.01 — override with SPARK_GRAFT_TEST_SF_DIR.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()
