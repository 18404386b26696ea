"""Set operations — SURVEY.md §2.7 (multi-input union + MR dedup idioms).

Reference surface: multi-path input union (U1, ``FileInputFormat.addInputPath``),
identity-map/identity-reduce distinct (U2 — the canonical MR dedup),
reduce-side intersect (U3) and except (U4) tag-and-filter idioms.

The two operand sets: customers active in 1998 vs customers with any
high-value order — genuinely overlapping, non-equal sets.

Scale notes: ``union`` is a zero-shuffle bag concat; ``distinct`` /
``intersect`` / ``except`` each shuffle once on the full row as key —
exactly the MR identity-reduce, but hash-based with partial
deduplication map-side (combiner analog) before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

_A_SQL = """
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
"""
_B_SQL = """
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
"""


def _operands(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(
        F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    b = orders.filter(F.col("o_totalprice") > 200000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    return a, b


@query(
    "set_union_all",
    f"SELECT custkey FROM (({_A_SQL}) UNION ALL ({_B_SQL}))",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 multi-input union (bag semantics, duplicates preserved)."""
    prepare(spark)
    a, b = _operands(spark, sf_dir)
    return a.unionByName(b)


@query(
    "set_distinct",
    f"SELECT DISTINCT custkey FROM (({_A_SQL}) UNION ALL ({_B_SQL}))",
)
def set_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 distinct — the canonical MR identity-map/identity-reduce dedup."""
    prepare(spark)
    a, b = _operands(spark, sf_dir)
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    f"({_A_SQL}) INTERSECT ({_B_SQL})",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 intersect (set semantics, like SQL INTERSECT)."""
    prepare(spark)
    a, b = _operands(spark, sf_dir)
    return a.intersect(b)


@query(
    "set_except",
    f"({_A_SQL}) EXCEPT ({_B_SQL})",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 except/minus (set semantics — ``subtract`` = SQL EXCEPT)."""
    prepare(spark)
    a, b = _operands(spark, sf_dir)
    return a.subtract(b)


@query(
    "set_intersect_all",
    f"({_A_SQL}) INTERSECT ALL ({_B_SQL})",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 bag-semantics intersect (multiplicity = min of the two sides)."""
    prepare(spark)
    a, b = _operands(spark, sf_dir)
    return a.intersectAll(b)


@query(
    "set_except_all",
    f"({_A_SQL}) EXCEPT ALL ({_B_SQL})",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 bag-semantics except (multiplicity-aware minus)."""
    prepare(spark)
    a, b = _operands(spark, sf_dir)
    return a.exceptAll(b)
