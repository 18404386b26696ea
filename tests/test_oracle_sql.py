"""Spark-free oracle-SQL guard: every registered oracle must parse and
execute in DuckDB against empty views with the production schemas.

Catches dialect drift (missing functions, syntax, bad view references)
in ~seconds, without a JVM — the fast half of the parity gate.
"""

from __future__ import annotations

import duckdb
import pytest

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.tables import TABLES

from .conftest import SF_DIR, parquet_source


@pytest.fixture(scope="module")
def duck_empty():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{parquet_source(SF_DIR, t)}') LIMIT 0"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", sorted(engine.ORACLES))
def test_oracle_sql_executes_on_empty_views(key, duck_empty):
    out = duck_empty.execute(engine.ORACLES[key]).fetchdf()
    assert len(out.columns) > 0
