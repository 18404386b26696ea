"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in the ``ls_hadoop_3_0_spark`` package; this
module only adapts its registry to the driver's shape. See SURVEY.md §2
for the key-by-key inventory and registry.py for the cross-engine
determinism rules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.operators.aggregates import pricing_summary
from ls_hadoop_3_0_spark.tables import DEFAULT_SF_DIR


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing summary: scan → pushed filter → partial/final
    hash aggregate → sort (SURVEY.md §7 Phase 0).
    """
    return pricing_summary(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(engine.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key (omissions ⇒ rows-only check)."""
    return dict(engine.ORACLES)
