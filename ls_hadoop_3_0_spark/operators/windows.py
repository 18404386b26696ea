"""Analytic (window) functions — SURVEY.md §2.10 (EXT).

Absent in the reference (MR users hand-roll these with secondary sort +
stateful reducers); required for capability parity. All via
``pyspark.sql.Window``.

Scale notes: every window here partitions by a real key (mktsegment /
custkey) — one shuffle, then per-partition sorted evaluation; no
single-partition windows (the one in sort.sort_global is verification-
only and documented there). Running sums aggregate through decimals so
the emitted doubles are bit-stable (registry.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load


@query(
    "window_ranking",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           row_number()   OVER w AS rn,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           ntile(4)       OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number/rank/dense_rank/percent_rank/ntile."""
    prepare(spark)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_analytic",
    """
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
           o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER w AS first_price,
           nth_value(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic family: lag/lead/first/nth_value over per-customer history.

    Note lead() peeks past the frame end — Spark and DuckDB agree that
    lag/lead ignore the frame; first/nth respect it (growing frame here).
    """
    prepare(spark)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_ts"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
    )


@query(
    "window_running",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE)
               AS running_spend,
           COUNT(*) OVER w AS running_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-over-window: running per-customer spend (cumulative frame)."""
    prepare(spark)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(w).cast("double").alias(
            "running_spend"
        ),
        F.count(F.lit(1)).over(w).alias("running_orders"),
    )


@query(
    "window_range",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER w AS n_similar_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 50000.0 PRECEDING AND CURRENT ROW)
    """,
)
def window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: orders within 50k below the current price."""
    prepare(spark)
    # Fractional RANGE bounds aren't expressible via Window.rangeBetween
    # (ints only) — declared in SQL form, same Catalyst plan.
    return load(spark, sf_dir, "orders").selectExpr(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        "count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice "
        "RANGE BETWEEN 50000.0 PRECEDING AND CURRENT ROW) AS n_similar_price",
    )


@query(
    "window_topn_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer)
    WHERE rn <= 5
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group: the row_number ≤ N idiom (per-group heap at scale)."""
    prepare(spark)
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        load(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
    )
