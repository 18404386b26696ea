"""The local gate: every oracle-backed key must hash-match DuckDB, and
every rows-only key must at least execute and return a stable schema.
This mirrors the driver's t2 check (at TEST_SF_DIR instead of sf0.01)."""

from __future__ import annotations

import pytest

import ls_hadoop_3_0_spark as engine

from .compare import assert_equivalent
from .conftest import SF_DIR

ORACLE_KEYS = sorted(engine.ORACLES)
ROWS_ONLY_KEYS = sorted(set(engine.QUERIES) - set(engine.ORACLES))


def test_registry_shape():
    assert set(engine.ORACLES) <= set(engine.QUERIES)
    assert len(engine.QUERIES) >= 40, "SURVEY §2 inventory shrank"


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(key, spark, duck):
    sdf = engine.QUERIES[key](spark, SF_DIR).toPandas()
    odf = duck.execute(engine.ORACLES[key]).fetchdf()
    assert_equivalent(sdf, odf, key)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_executes(key, spark):
    df = engine.QUERIES[key](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
