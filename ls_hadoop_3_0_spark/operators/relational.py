"""Projection / filter / per-row transforms — SURVEY.md §2.2.

Reference surface: ``Mapper`` 1→N row transform (P1), ``InverseMapper``
(P2, folded into P1), ``FieldSelectionMapper/Reducer`` cut-style field
projection (P5), predicate evaluation in user map code (P8). Chained
mappers (P7) are free: Catalyst collapses adjacent projections into one
whole-stage-codegen span (asserted in tests/test_plans.py).

Scale notes: all three queries are scan→narrow transforms — no shuffle at
all. Filters and column pruning reach the parquet reader (PushedFilters /
ReadSchema asserted in tests/test_plans.py), so at 100 TB these scan only
the referenced columns' pages and skip row groups by min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load


@query(
    "project_filter",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           c_acctbal,
           c_acctbal * 1.1 AS projected_bal,
           c_mktsegment
    FROM customer
    WHERE c_acctbal > 1000.0 AND c_nationkey < 20
    """,
)
def project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 ``Mapper``: project + filter + computed column (map-side only)."""
    prepare(spark)
    return (
        load(spark, sf_dir, "customer")
        .filter((F.col("c_acctbal") > 1000.0) & (F.col("c_nationkey") < 20))
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            "c_acctbal",
            (F.col("c_acctbal") * 1.1).alias("projected_bal"),
            "c_mktsegment",
        )
    )


@query(
    "predicate_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_quantity > 45.0
    """,
)
def predicate_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 predicate evaluation, declared so Catalyst pushes it to the scan.

    tests/test_plans.py asserts the physical plan shows ``PushedFilters``
    on l_shipdate/l_quantity and a pruned ``ReadSchema`` (4 of 11 cols) —
    the difference between reading 100 TB and reading ~3 TB.
    """
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_quantity") > 45.0)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "field_selection",
    """
    SELECT string_split(o_orderpriority, '-')[1] AS prio_num,
           string_split(o_orderpriority, '-')[2] AS prio_name,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
)
def field_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 ``FieldSelectionMapper`` (unix cut): split-by-delimiter + select.

    Field spec "0-:1" over '-'-delimited o_orderpriority (e.g. '3-MEDIUM').
    Spark getItem is 0-based; DuckDB list indexing is 1-based — mirrored.
    """
    prepare(spark)
    parts = F.split(F.col("o_orderpriority"), "-")
    return (
        load(spark, sf_dir, "orders")
        .select(parts.getItem(0).alias("prio_num"), parts.getItem(1).alias("prio_name"))
        .groupBy("prio_num", "prio_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )
