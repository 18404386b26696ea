"""Robustness sweep: every registered query must run (not crash) on
EMPTY inputs with the production schemas.

At 100 TB, empty partitions/filtered-to-nothing inputs are routine; a
division-by-empty, min-of-nothing, or window-over-nothing crash in any
operator is a production incident. Fixture: zero-row copies of all ten
tables (schemas taken from the real sf0.001 parquet)."""

from __future__ import annotations

import os

import pytest

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.tables import TABLES

from .conftest import SF_DIR

EMPTY_DIR = "/root/repo/.scratch/empty_sf"


@pytest.fixture(scope="module")
def empty_sf(spark):
    os.makedirs(EMPTY_DIR, exist_ok=True)
    for t in TABLES:
        dst = f"{EMPTY_DIR}/{t}.parquet"
        if not os.path.exists(dst):
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(0).coalesce(
                1
            ).write.mode("overwrite").parquet(dst)
    return EMPTY_DIR


@pytest.mark.parametrize("key", sorted(engine.QUERIES))
def test_query_survives_empty_input(key, spark, empty_sf):
    df = engine.QUERIES[key](spark, empty_sf)
    n = df.count()
    # Global aggregates legitimately emit one (empty-stats) row; grouped /
    # per-row queries emit zero. Either way: no exception, sane count.
    assert n >= 0
