"""Round-14 keys and pins.

Covers the r13 ADVICE items (DuckDB zero-norm oracle pin) and the r14
debut keys as they land.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from ls_hadoop_3_0_spark import ORACLES, QUERIES

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# ADVICE r13: the try_divide-NULL <-> DuckDB x/0.0 equivalence is a claim
# about the ORACLE engine, not just Spark — pin it in the oracle dialect so
# a DuckDB upgrade (>=1.1 flips ieee_floating_point_ops to true, making
# x/0.0 -> inf) fails loudly here instead of silently breaking parity on
# zero-norm vectors.


def test_zero_norm_null_pinned_in_duckdb():
    from ls_hadoop_3_0_spark.llm.dedup import NORM_EMB_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        "SELECT 1 AS vec_id, 0 AS label, "
        "       list_transform(generate_series(1, 64), i -> CAST(0.0 AS FLOAT))"
        "       AS embedding "
        "UNION ALL "
        "SELECT 2, 0, list_transform(generate_series(1, 64), "
        "                            i -> CAST(0.25 AS FLOAT))"
    )
    rows = {r[0]: r[2] for r in con.execute(NORM_EMB_SQL).fetchall()}
    con.close()
    # zero-norm vector: every element must be NULL (Spark try_divide form)
    assert rows[1] is not None and len(rows[1]) == 64
    assert all(x is None for x in rows[1]), rows[1][:4]
    # sanity: a regular vector still normalizes to finite non-NULL values
    assert all(x is not None and math.isfinite(x) for x in rows[2])
