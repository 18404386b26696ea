"""Shared fixtures: one SparkSession + one DuckDB connection per session.

TEST_SF_DIR (default sf0.001) selects the fixture scale; the oracle
connection pre-registers the same views the driver's gate uses.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from ls_hadoop_3_0_spark.session import get_spark
from ls_hadoop_3_0_spark.tables import TABLES

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "streaming: genuine readStream micro-batch runs (the verify recipe's "
        "streaming leg: python -m pytest -m streaming)",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ls_hadoop_tests")
    yield s


def parquet_source(sf_dir: str, table: str) -> str:
    """read_parquet-able path: single fixture file OR Spark-written dir."""
    path = f"{sf_dir}/{table}.parquet"
    return f"{path}/*.parquet" if os.path.isdir(path) else path


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{parquet_source(SF_DIR, t)}')"
        )
    yield con
    con.close()
