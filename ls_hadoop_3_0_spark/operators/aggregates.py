"""Aggregation operators — SURVEY.md §2.4 (mapreduce.lib.aggregate parity).

Reference surface (SURVEY.md §2.4, jar-verified classes):
``IntSumReducer/LongSumReducer`` (A1), ``LongValueSum/DoubleValueSum`` (A2),
``LongValueMax/Min, StringValueMax/Min`` (A3), ``UniqValueCount`` (A4),
``ValueHistogram`` (A5), ``ValueAggregatorJob`` multi-aggregate driver (A6),
combiner partial aggregation (A7 — automatic in Spark: partial/final
HashAggregate, asserted in tests/test_plans.py), WordMean/Median/StdDev
examples (A8), counters/row count (A10), plus EXT rollup/cube (A9).

All single-pass ``groupBy().agg()`` — Spark plans partial (map-side)
aggregation before the shuffle, the moral equivalent of the MR combiner,
and AQE coalesces the post-shuffle partitions. At 100 TB the only knob is
shuffle partition count; no per-operator rework needed (no driver-side
state anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.exprs import davg, dsum, sql_davg, sql_dsum
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

CUTOFF = "1998-09-02 00:00:00"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary (scan→filter→agg→sort).

    Exercises one row of almost every §2 category (SURVEY.md §7 Phase 0).
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

query("pricing_summary", PRICING_SUMMARY_SQL)(pricing_summary)


@query(
    "agg_sum",
    f"""
    SELECT l_returnflag,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 ``IntSumReducer``/``LongValueSum``: grouped sum."""
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(dsum("l_quantity").alias("sum_qty"), dsum("l_extendedprice").alias("sum_price"))
    )


@query(
    "agg_minmax",
    """
    SELECT o_orderpriority,
           MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
           MIN(o_orderstatus) AS min_status, MAX(o_orderstatus) AS max_status
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 ``LongValueMax/Min`` + ``StringValueMax/Min`` (lexicographic)."""
    prepare(spark)
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderstatus").alias("min_status"),
            F.max("o_orderstatus").alias("max_status"),
        )
    )


@query(
    "agg_count",
    """
    SELECT o_orderstatus, COUNT(*) AS n_orders, COUNT(o_custkey) AS n_cust
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 row/key count (MR Counters + identity reduce)."""
    prepare(spark)
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.count("o_custkey").alias("n_cust"))
    )


@query(
    "agg_count_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 ``UniqValueCount``: exact distinct-value count per key."""
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
        )
    )


@query("agg_approx_distinct", None)  # sketch ≠ SQL-oracle: rows-only check
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 capped variant: HyperLogLog++ approximate distinct.

    The scale path for UniqValueCount's cap — constant memory per key at
    100 TB where exact distinct would shuffle every value. HLL sketches
    differ across engines, so this is a rows-only key; exactness bounds
    are asserted in tests/test_aggregates.py instead.
    """
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_part"))
    )


@query("agg_approx_quantile", None)  # sketch ≠ SQL-oracle: rows-only check
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 capped variant: Greenwald-Khanna approximate quantiles.

    The scale path next to ``agg_median``'s exact percentile: GK sketches
    merge associatively (constant memory per key, one pass, map-side
    partial) where exact quantiles need the full value multiset per key.
    Sketch internals differ across engines (DuckDB uses t-digest), so
    rows-only; tests/test_aggregates.py asserts each approx quantile
    lands within the 1% relative-rank bound of the exact answer.
    """
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 100
            ).alias("quartiles")
        )
        .select(
            "l_returnflag",
            F.col("quartiles")[0].alias("p25"),
            F.col("quartiles")[1].alias("p50"),
            F.col("quartiles")[2].alias("p75"),
        )
    )


@query(
    "agg_percentile_exact",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 oracle-backed twin of ``agg_approx_quantile``.

    The identical quartile surface (p25/p50/p75 of l_extendedprice per
    return flag) computed EXACTLY — Spark ``percentile`` vs DuckDB
    ``quantile_cont``, both continuous-interpolation, rounded to 6
    decimals per the registry's composed-double rule — so the quantile
    family gets a full rows+schema+hash correctness row while the
    GK-sketch key stays rows-only. At 100 TB the sketch is the default
    (one pass, constant memory per key, associative merge); exact
    percentile shuffles the full per-key value multiset and is the
    verification rung.
    """
    prepare(spark)
    qs = F.percentile("l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(qs.alias("qs"))
        .select(
            "l_returnflag",
            F.round(F.col("qs")[0], 6).alias("p25"),
            F.round(F.col("qs")[1], 6).alias("p50"),
            F.round(F.col("qs")[2], 6).alias("p75"),
        )
    )


@query(
    "agg_histogram",
    """
    WITH freq AS (
        SELECT o_orderpriority AS k, o_orderstatus AS v, COUNT(*) AS freq
        FROM orders GROUP BY 1, 2
    )
    SELECT k,
           COUNT(*) AS n_values,
           MIN(freq) AS min_freq,
           MAX(freq) AS max_freq,
           (CAST(SUM(freq) AS DOUBLE) / COUNT(*)) AS avg_freq,
           SQRT((CAST(SUM(freq * freq) AS DOUBLE)
                 - CAST(SUM(freq) AS DOUBLE) * SUM(freq) / COUNT(*))
                / (COUNT(*) - 1)) AS std_freq
    FROM freq GROUP BY k
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 ``ValueHistogram`` (SURVEY §2.4): per-key value-frequency stats.

    Two-level aggregation: count per (key,value), then frequency stats per
    key. Stddev via explicit exact-integer moments so both engines emit
    bit-identical doubles (see registry.py rules).
    """
    prepare(spark)
    freq = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("k"), F.col("o_orderstatus").alias("v"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    n = F.count(F.lit(1))
    s = F.sum("freq").cast("double")
    s2 = F.sum(F.col("freq") * F.col("freq")).cast("double")
    return freq.groupBy("k").agg(
        n.alias("n_values"),
        F.min("freq").alias("min_freq"),
        F.max("freq").alias("max_freq"),
        (s / n).alias("avg_freq"),
        F.sqrt((s2 - s * F.sum("freq") / n) / (n - 1)).alias("std_freq"),
    )


@query(
    "agg_multi",
    f"""
    SELECT l_returnflag,
           {sql_dsum('l_quantity')} AS sum_qty,
           MAX(l_extendedprice) AS max_price,
           MIN(l_discount) AS min_disc,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 ``ValueAggregatorJob``: many named aggregations in one pass."""
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.max("l_extendedprice").alias("max_price"),
            F.min("l_discount").alias("min_disc"),
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "agg_stats",
    f"""
    SELECT l_returnflag,
           COUNT(l_quantity) AS n,
           {sql_davg('l_quantity')} AS mean_qty,
           ({sql_dsum('l_quantity * l_quantity')}
            - {sql_dsum('l_quantity')} * {sql_dsum('l_quantity')} / COUNT(l_quantity))
               / (COUNT(l_quantity) - 1) AS var_qty,
           SQRT(({sql_dsum('l_quantity * l_quantity')}
            - {sql_dsum('l_quantity')} * {sql_dsum('l_quantity')} / COUNT(l_quantity))
               / (COUNT(l_quantity) - 1)) AS std_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 WordMean/WordStandardDeviation parity: mean/variance/stddev.

    Moments are exact decimal sums; variance composed with identical
    double arithmetic both sides (order-stable — see registry.py).
    Native ``stddev_samp``/``var_samp`` equivalence is asserted (with
    tolerance) in tests/test_aggregates.py.
    """
    prepare(spark)
    q = F.col("l_quantity")
    n = F.count(q)
    s = dsum(q)
    s2 = dsum(q * q)
    var = (s2 - s * s / n) / (n - 1)
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            (s / n).alias("mean_qty"),
            var.alias("var_qty"),
            F.sqrt(var).alias("std_qty"),
        )
    )


@query(
    "agg_median",
    """
    SELECT l_returnflag,
           round(median(l_quantity), 6) AS med_qty,
           round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 WordMedian parity: exact median + continuous percentile.

    Spark ``median``/``percentile`` are exact (linear interpolation),
    matching DuckDB ``median``/``quantile_cont``; both sides round to 6
    decimals per the registry's composed-double rule (the interpolation
    ``lo + frac*(hi-lo)`` could differ in the last bit under a different
    evaluation order). The streaming-scale variant is
    ``percentile_approx`` (KLL-style sketch), exercised in tests only —
    sketches don't hash-match across engines.
    """
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 6).alias("med_qty"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("p90_qty"),
        )
    )


@query(
    "agg_rollup",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (EXT) hierarchical subtotals — one pass instead of MR's N jobs."""
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
    )


@query(
    "agg_cube",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (EXT) full cross-dimensional subtotals."""
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_extendedprice").alias("sum_price"))
    )


@query(
    "agg_mode",
    """
    WITH freq AS (
        SELECT l_returnflag, l_quantity, COUNT(*) AS c
        FROM lineitem GROUP BY 1, 2
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                     ORDER BY c DESC, l_quantity) AS rn
        FROM freq
    )
    SELECT l_returnflag, l_quantity AS mode_qty, c AS mode_n
    FROM r WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5-family mode: most frequent value per key, ties to the LOWEST
    value — native ``F.mode`` leaves tie order engine-defined, so the
    deterministic formulation is count-then-pick (two hash aggregations
    + a per-key window over the tiny frequency table), which both
    engines mirror exactly.
    """
    prepare(spark)
    freq = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("c").desc(), "l_quantity")
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("c").alias("mode_n"),
        )
    )


@query(
    "agg_heavy_hitters",
    """
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING CAST(COUNT(*) AS DOUBLE) > 1.5 * (
        SELECT CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT o_custkey)
        FROM orders
    )
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4-family exact heavy hitters: keys with >1.5× the mean frequency.

    The curation-pipeline primitive for hot-key discovery (stop-grams,
    spam users, skewed join keys — the same keys dedup_ngram's DF cap
    drops). Plan: ONE aggregation of the fact (partial→final), a 1-row
    global stats aggregate broadcast as a scalar threshold, and a filter
    over the (small) per-key counts — never a second fact scan for the
    threshold. The threshold is exact-integer division on both engines,
    so the `>` cut cannot flip on aggregation order.
    """
    prepare(spark)
    o = load(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    stats = o.agg(
        (
            F.count(F.lit(1)).cast("double")
            / F.count_distinct(F.col("o_custkey"))
        ).alias("_mean_freq")
    )
    return (
        per_key.join(F.broadcast(stats))
        .filter(F.col("n_orders").cast("double") > 1.5 * F.col("_mean_freq"))
        .select("o_custkey", "n_orders")
    )


@query(
    "quantile_bucketize",
    f"""
    WITH r AS (
        SELECT o_totalprice AS v,
               row_number() OVER (ORDER BY o_totalprice) AS rn,
               COUNT(*) OVER () AS n
        FROM orders
    ),
    cuts AS (
        SELECT MAX(CASE WHEN rn = (n + 3) // 4 THEN v END) AS c1,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS c2,
               MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS c3
        FROM r
    ),
    b AS (
        SELECT v, CASE WHEN v <= c1 THEN 0 WHEN v <= c2 THEN 1
                       WHEN v <= c3 THEN 2 ELSE 3 END AS bucket
        FROM r CROSS JOIN cuts
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(v) AS min_price, MAX(v) AS max_price,
           {sql_dsum('v')} AS sum_price
    FROM b GROUP BY bucket
    """,
)
def quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-EXT quantile discretization: 4 equal-frequency price buckets.

    The QuantileDiscretizer / feature-binning pass every training
    pipeline runs on numeric columns. Cutpoints are DISCRETE order
    statistics — the value at sorted position ceil(q·n), positions
    computed in pure integer arithmetic — never interpolated doubles,
    so every comparison in the bucket rule is between exact stored
    values and the two engines cannot 1-ulp-diverge at a boundary (the
    reason this key does not reuse agg_percentile_exact's continuous
    interpolation, which is only round-6 comparable). Value-at-position
    is permutation-invariant under ties, so row_number's tie
    nondeterminism is harmless.

    Plan: the rank pass rides sort.global_rank (range partition →
    local rank → partition-count offsets — P-way parallel, no
    single-partition window: a bare ``row_number() OVER (ORDER BY v)``
    measured 9.8 s in ONE task at the 100× replica vs 4.3 s
    distributed, noop-sink protocol). row_number's tie order
    within a value run is nondeterministic, but the VALUE at a given
    rank is permutation-invariant, so the cutpoints are exact either
    way. The 1-row cut set is design-bounded → static broadcast is
    legitimate; one keyed aggregation closes it. At 100 TB the
    production path swaps the exact rank for sampled/sketched cutpoints
    (approx_quantile is the rows-only sibling) — this key is the exact
    verification rung.
    """
    from ls_hadoop_3_0_spark.operators.sort import global_rank

    prepare(spark)
    orders = load(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("v"))
    n = orders.count()  # exact scalar corpus stat
    p1, p2, p3 = (n + 3) // 4, (n + 1) // 2, (3 * n + 3) // 4
    r = global_rank(orders, F.col("v")).withColumnRenamed("rank", "rn")
    cuts = r.filter(F.col("rn").isin(p1, p2, p3)).agg(
        F.max(F.when(F.col("rn") == p1, F.col("v"))).alias("c1"),
        F.max(F.when(F.col("rn") == p2, F.col("v"))).alias("c2"),
        F.max(F.when(F.col("rn") == p3, F.col("v"))).alias("c3"),
    )
    bucket = (
        F.when(F.col("v") <= F.col("c1"), 0)
        .when(F.col("v") <= F.col("c2"), 1)
        .when(F.col("v") <= F.col("c3"), 2)
        .otherwise(3)
    )
    return (
        orders.crossJoin(F.broadcast(cuts))
        .select("v", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("v").alias("min_price"),
            F.max("v").alias("max_price"),
            dsum("v").alias("sum_price"),
        )
    )


@query(
    "agg_corr",
    """
    WITH q AS (
        SELECT l_returnflag,
               CAST(round(l_quantity * 1000000) AS BIGINT) AS x,
               CAST(round(l_extendedprice * 1000000) AS BIGINT) AS y
        FROM lineitem
    ),
    g AS (
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag, n AS n_rows,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(sqrt(
               greatest(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE),
                        CAST(0 AS DOUBLE))
               * greatest(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE),
                          CAST(0 AS DOUBLE))),
             CAST(0 AS DOUBLE)) AS corr_qty_price,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / NULLIF(greatest(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE),
                             CAST(0 AS DOUBLE)),
                    CAST(0 AS DOUBLE)) AS beta_qty_price
    FROM g
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-EXT Pearson correlation + OLS beta from exact scaled moments.

    Spark's corr/covar_samp stream doubles (order-dependent); this key
    computes corr(quantity, price) and the regression slope per return
    flag from exact integer moments instead: both columns quantized
    once to scaled longs, the five moments summed exactly (squares via
    HUGEINT/DECIMAL(38,0) — y² at 1e22 overflows a BIGINT), then one
    identical double expression on each engine. Variances are clamped
    at zero (quantized moments can round to a tiny negative —
    anomaly_zscore lesson) and zero-variance groups yield NULL via
    try_divide ↔ NULLIF, per the ANSI division discipline.

    Plan: one scan, one map-combined keyed aggregation, constant state
    per group — the moment pattern that scales to any corpus
    (analytics_trend class).
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    pre = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 1_000_000).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 1_000_000).cast("long").alias("y"),
    )

    def _sq(a: str, b: str):
        return F.sum(F.col(a).cast("decimal(19,0)") * F.col(b).cast("decimal(19,0)"))

    g = pre.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        _sq("x", "x").alias("sxx"),
        _sq("y", "y").alias("syy"),
        _sq("x", "y").alias("sxy"),
    )
    nD = F.col("n").cast("double")
    sxD, syD = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov = nD * F.col("sxy").cast("double") - sxD * syD
    vx = F.greatest(nD * F.col("sxx").cast("double") - sxD * sxD, F.lit(0.0))
    vy = F.greatest(nD * F.col("syy").cast("double") - syD * syD, F.lit(0.0))
    return g.select(
        "l_returnflag",
        F.col("n").alias("n_rows"),
        F.try_divide(cov, F.sqrt(vx * vy)).alias("corr_qty_price"),
        F.try_divide(cov, vx).alias("beta_qty_price"),
    )


@query(
    "agg_entropy",
    """
    WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
               FROM documents GROUP BY 1, 2),
    t AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
                 CAST(COUNT(*) AS BIGINT) AS n_langs
          FROM c GROUP BY source),
    e AS (
        SELECT c.source,
               SUM(CAST(round(-(CAST(c.c AS DOUBLE) / t.n_docs)
                     * ln(CAST(c.c AS DOUBLE) / t.n_docs)
                     * 1000000) AS BIGINT)) AS hq
        FROM c JOIN t USING (source) GROUP BY c.source
    )
    SELECT t.source, t.n_docs, t.n_langs,
           CAST(hq AS DOUBLE) / CAST(1000000 AS DOUBLE) AS entropy_nats,
           CAST(hq AS DOUBLE) / CAST(1000000 AS DOUBLE)
               / NULLIF(ln(CAST(t.n_langs AS DOUBLE)), CAST(0 AS DOUBLE))
               AS norm_entropy
    FROM t JOIN e ON t.source = e.source
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-EXT Shannon entropy of a categorical distribution per group.

    Profiling rung the histogram family lacks: how CONCENTRATED is each
    source's language mix? H = −Σ p ln p in nats plus the
    ln(k)-normalized form (NULL for single-language sources via
    try_divide ↔ NULLIF — ANSI discipline). Probabilities are exact-int
    divisions, ln is the proven pair, and every −p·ln p term quantizes
    to a scaled long BEFORE the per-group sum — no double summation
    anywhere, so the result is partitioning-independent.

    Plan: two keyed aggregations and one group-keyed join, all
    map-combined; per-group state is the (group × category) count table
    — the category vocabulary is design-bounded (langs), groups scale
    freely.
    """
    prepare(spark)
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    t = c.groupBy("source").agg(
        F.sum("c").alias("n_docs"), F.count(F.lit(1)).alias("n_langs")
    )
    p = F.col("c").cast("double") / F.col("n_docs")
    hq_term = F.round(-p * F.log(p) * 1_000_000).cast("long")
    e = (
        c.join(t.hint("merge"), "source")
        .select("source", hq_term.alias("hq"))
        .groupBy("source")
        .agg(F.sum("hq").alias("hq"))
    )
    ent = F.col("hq").cast("double") / F.lit(1_000_000.0)
    return t.join(e, "source").select(
        "source",
        "n_docs",
        "n_langs",
        ent.alias("entropy_nats"),
        F.try_divide(ent, F.log(F.col("n_langs").cast("double"))).alias(
            "norm_entropy"
        ),
    )


@query(
    "agg_listagg",
    f"""
    WITH r AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey)
                   AS rn
        FROM orders
    )
    SELECT o_orderpriority,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn)
               AS top_keys,
           {sql_dsum('o_totalprice')} AS top_total
    FROM r WHERE rn <= 3 GROUP BY o_orderpriority
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-EXT ordered string aggregation (Spark 4 ``listagg``).

    The SQL:2016 LISTAGG ... WITHIN GROUP surface (DuckDB mirror:
    ``string_agg(... ORDER BY ...)``): per order priority, the top-3
    order keys by price concatenated in rank order, plus their exact
    price sum. Aggregating strings is only oracle-safe when the
    element ORDER is pinned — the WITHIN GROUP clause is the whole
    point of the key; an unordered listagg is partitioning-dependent
    and would hash-diverge.

    Plan: per-group top-3 via ranked window (group-keyed shuffle), then
    a 5-row aggregation — input to listagg is top-N-bounded, so the
    concatenated strings can never grow with the corpus (the guard that
    makes string aggregation 100 TB-legal).
    """
    prepare(spark)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    r = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    return r.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(CAST(o_orderkey AS STRING), ',')"
            " WITHIN GROUP (ORDER BY rn)"
        ).alias("top_keys"),
        dsum("o_totalprice").alias("top_total"),
    )


#: Moment quantization: value quantized at 1e3 (xq ≤ ~5e5 for the
#: fixture's value range), power sums accumulated as DECIMAL(38,0) /
#: HUGEINT — exact at any corpus size (xq⁴ ≈ 6e22 per element needs
#: ~128-bit accumulation; a long would overflow at ~150k rows).
MOM_SCALE = 1000


@query(
    "agg_skewkurt",
    f"""
    WITH q AS (
        SELECT event_type,
               CAST(round(value * {MOM_SCALE}) AS BIGINT) AS xq
        FROM events
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(xq AS HUGEINT)) AS s1,
               SUM(CAST(xq AS HUGEINT) * xq) AS s2,
               SUM(CAST(xq AS HUGEINT) * xq * xq) AS s3,
               SUM(CAST(xq AS HUGEINT) * xq * xq * xq) AS s4
        FROM q GROUP BY event_type
    ),
    d AS (
        SELECT event_type, n,
               CAST(s1 AS DOUBLE) / {MOM_SCALE}.0 / n AS m1,
               CAST(s2 AS DOUBLE) / {MOM_SCALE * MOM_SCALE}.0 / n AS r2,
               CAST(s3 AS DOUBLE) / {MOM_SCALE ** 3}.0 / n AS r3,
               CAST(s4 AS DOUBLE) / {MOM_SCALE ** 4}.0 / n AS r4
        FROM s
    )
    SELECT event_type, n, m1 AS mean,
           (r2 - m1 * m1) AS m2,
           (r3 - (3.0 * m1) * r2 + (2.0 * m1) * (m1 * m1)) AS m3,
           (r4 - (4.0 * m1) * r3 + (6.0 * (m1 * m1)) * r2
               - (3.0 * (m1 * m1)) * (m1 * m1)) AS m4,
           ((r3 - (3.0 * m1) * r2 + (2.0 * m1) * (m1 * m1))
               / (sqrt(r2 - m1 * m1) * (r2 - m1 * m1))) AS skewness,
           (((r4 - (4.0 * m1) * r3 + (6.0 * (m1 * m1)) * r2
               - (3.0 * (m1 * m1)) * (m1 * m1))
               / ((r2 - m1 * m1) * (r2 - m1 * m1))) - 3.0) AS kurtosis_ex
    FROM d
    """,
)
def agg_skewkurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8-EXT exact higher moments: per-series skewness + excess kurtosis.

    The engines' own SKEWNESS/KURTOSIS stream doubles in visit order —
    unusable under a value-hash gate — so both sides derive the moments
    from EXACT quantized power sums (the embedding_norm_outliers
    discipline extended to 3rd/4th powers): xq = round(value·1e3),
    Σxq..Σxq⁴ as 128-bit integers, then central moments and ratios as
    the IDENTICAL double expression tree on both engines (the textual
    formulas in this oracle and the Column expressions below mirror
    token-for-token, so every intermediate is bit-identical;
    skew's denominator is written sqrt(m2)·m2 — two correctly-rounded
    IEEE ops — never pow(m2,1.5), whose libm differs per engine).

    Plan: one map-side quantization + one (event_type)-keyed partial/
    final aggregation — the same single-shuffle budget as agg_stats at
    any corpus size; the moment algebra runs on 5 rows.
    """
    prepare(spark)
    dec = "decimal(38,0)"
    xq = F.round(F.col("value") * MOM_SCALE).cast("long")
    q = load(spark, sf_dir, "events").select(
        "event_type", xq.alias("xq").cast(dec).alias("xq")
    )
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq").alias("s1"),
        F.sum(F.col("xq") * F.col("xq")).alias("s2"),
        F.sum(F.col("xq") * F.col("xq") * F.col("xq")).alias("s3"),
        F.sum(F.col("xq") * F.col("xq") * F.col("xq") * F.col("xq")).alias("s4"),
    )
    m1 = F.col("s1").cast("double") / float(MOM_SCALE) / F.col("n")
    r2 = F.col("s2").cast("double") / float(MOM_SCALE**2) / F.col("n")
    r3 = F.col("s3").cast("double") / float(MOM_SCALE**3) / F.col("n")
    r4 = F.col("s4").cast("double") / float(MOM_SCALE**4) / F.col("n")
    d = s.select("event_type", "n", m1.alias("m1"), r2.alias("r2"),
                 r3.alias("r3"), r4.alias("r4"))
    m1c, r2c, r3c, r4c = F.col("m1"), F.col("r2"), F.col("r3"), F.col("r4")
    m2 = r2c - m1c * m1c
    m3 = r3c - (F.lit(3.0) * m1c) * r2c + (F.lit(2.0) * m1c) * (m1c * m1c)
    m4 = (
        r4c
        - (F.lit(4.0) * m1c) * r3c
        + (F.lit(6.0) * (m1c * m1c)) * r2c
        - (F.lit(3.0) * (m1c * m1c)) * (m1c * m1c)
    )
    return d.select(
        "event_type",
        "n",
        m1c.alias("mean"),
        m2.alias("m2"),
        m3.alias("m3"),
        m4.alias("m4"),
        (m3 / (F.sqrt(m2) * m2)).alias("skewness"),
        ((m4 / (m2 * m2)) - F.lit(3.0)).alias("kurtosis_ex"),
    )


@query(
    "agg_approx_distinct_audit",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
           TRUE AS hll_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 sketch QUALITY GATE: HLL estimate audited against exact distinct.

    ``agg_approx_distinct`` is rows-only by design (sketch internals
    differ per engine); this key applies the knn_recall trick to HLL —
    run BOTH the sketch (rsd=0.02) and the exact distinct in one
    aggregation pass, emit the exact count plus a boolean asserting the
    estimate landed within 5% (2.5σ of the configured rsd). The oracle
    recomputes the exact side and pins the boolean TRUE — if Spark's
    HLL ever degrades past the bound, the key hash-fails. The sketch's
    weak-signal gap is closed without ever comparing sketch internals.

    Plan: one shuffle; HLL partials merge map-side while exact-distinct
    rides Spark's two-phase distinct aggregation. At 100 TB you would
    keep ONLY the HLL arm (that is the point of the sketch) — the exact
    arm here is the audit harness, same framing as knn_recall.
    """
    prepare(spark)
    g = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_distinct"),
            F.approx_count_distinct("l_partkey", 0.02).alias("est"),
        )
    )
    err = F.abs(F.col("est") - F.col("exact_distinct")).cast("double") / F.col(
        "exact_distinct"
    )
    return g.select(
        "l_returnflag",
        "exact_distinct",
        (err <= 0.05).alias("hll_within_5pct"),
    )


@query(
    "agg_approx_distinct_merge",
    """
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct,
           TRUE AS merge_matches,
           TRUE AS hll_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 sketch MERGEABILITY gate — the property that matters at 100 TB.

    A sketch is only useful at scale if partial sketches built
    independently per task merge into an answer that does NOT depend on
    how the corpus was split — that is what every executor partial
    aggregation relies on when thousands of tasks each see a slice.
    This key proves PARTITION-INDEPENDENCE end to end with the
    DataSketches HLL surface: the fact is sharded two unrelated ways
    (16 shards on l_orderkey vs 32 on l_suppkey — different key,
    different fan-out, and the same l_partkey lands in MANY shards of
    each, so the union must deduplicate register-wise), per-shard
    sketches built with ``hll_sketch_agg`` merge via ``hll_union_agg``,
    and the two merged estimates must be IDENTICAL (register-wise max
    is associative/commutative ⇒ identical union sketch ⇒ identical
    estimate — pinned TRUE by the oracle; any drift hash-fails).

    Deliberately NOT asserted: merged == single-pass estimate. A
    direct-built DataSketches sketch carries the HIP accumulator; a
    union invalidates HIP and falls back to the composite estimator,
    so the two differ by DESIGN (measured: 1999 vs 1991 on the 2000-key
    fixture — both inside the bound). The 5% accuracy bound vs the
    exact count is asserted for the MERGED estimate — the one a real
    multi-task aggregation would report.

    Plan: two shard-partial aggregations + unions; every stage combines
    map-side — shuffles only carry sketches/counts per (flag[, shard]).
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")

    def merged_est(shard: F.Column, n: int, alias: str) -> DataFrame:
        s = li.select("l_returnflag", "l_partkey", (shard % n).alias("shard"))
        per_shard = s.groupBy("l_returnflag", "shard").agg(
            F.hll_sketch_agg("l_partkey").alias("sk")
        )
        return per_shard.groupBy("l_returnflag").agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(alias)
        )

    a = merged_est(F.col("l_orderkey"), 16, "est_a")
    b = merged_est(F.col("l_suppkey"), 32, "est_b")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    err = F.abs(F.col("est_a") - F.col("exact_distinct")).cast("double") / F.col(
        "exact_distinct"
    )
    return (
        exact.join(a, "l_returnflag")
        .join(b, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_distinct",
            (F.col("est_a") == F.col("est_b")).alias("merge_matches"),
            (err <= 0.05).alias("hll_within_5pct"),
        )
    )


@query(
    "agg_approx_quantile_audit",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS p50_rank_ok,
           TRUE AS p90_rank_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 sketch QUALITY GATE: GK approximate quantiles audited by rank.

    ``agg_approx_quantile`` is rows-only (GK vs t-digest internals);
    this key checks the property GK actually guarantees — RANK error,
    TIE-AWARE: a value v is a valid p-quantile when the target rank
    p·n falls inside [count(< v), count(≤ v)] ± 1%·n (l_quantity is
    discretized, so count(≤ median)/n alone can legitimately sit far
    above 0.5 — the naive one-sided check false-alarms on ties).
    accuracy=10000 ⇒ GK bound 1e-4; 1% is 100× slack. The oracle pins
    both booleans TRUE and the exact group counts. Sketch values never
    cross engines — only exact integer rank counting does.

    Plan: one aggregation for the sketches, a broadcast of the 3-row
    (group, p50, p90) result back onto the fact (design-bounded side),
    and a second counting aggregation — two passes, both map-combined,
    at any scale.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    qs = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", F.array(F.lit(0.5), F.lit(0.9)), 10000)
        .alias("q")
    )
    qs = qs.select(
        "l_returnflag", F.col("q")[0].alias("p50"), F.col("q")[1].alias("p90")
    )
    j = li.join(F.broadcast(qs), "l_returnflag")
    g = j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_quantity") < F.col("p50")).cast("long")).alias("lt50"),
        F.sum((F.col("l_quantity") <= F.col("p50")).cast("long")).alias("le50"),
        F.sum((F.col("l_quantity") < F.col("p90")).cast("long")).alias("lt90"),
        F.sum((F.col("l_quantity") <= F.col("p90")).cast("long")).alias("le90"),
    )

    def rank_ok(lt: str, le: str, p: float):
        n = F.col("n").cast("double")
        return (F.col(lt).cast("double") <= (F.lit(p) + 0.01) * n) & (
            F.col(le).cast("double") >= (F.lit(p) - 0.01) * n
        )

    return g.select(
        "l_returnflag",
        "n",
        rank_ok("lt50", "le50", 0.5).alias("p50_rank_ok"),
        rank_ok("lt90", "le90", 0.9).alias("p90_rank_ok"),
    )


@query(
    "agg_argminmax",
    """
    WITH k AS (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
                   + o_orderkey AS tkey
        FROM orders
    )
    SELECT o_orderpriority,
           arg_max(o_orderkey, tkey) AS top_orderkey,
           MAX(o_totalprice) AS top_price,
           arg_min(o_orderkey, tkey) AS bottom_orderkey,
           MIN(o_totalprice) AS bottom_price
    FROM k GROUP BY o_orderpriority
    """,
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-EXT arg-min/arg-max: WHICH row holds each group's extreme.

    min_by/max_by (Spark) ↔ arg_min/arg_max (DuckDB) — the one-pass
    answer to "the orderkey of the priciest order per priority" that
    MR idioms solved with a secondary sort + first-record reduce.
    Both engines leave ties ENGINE-DEFINED, so the ordering key is made
    UNIQUE by construction: cents-scaled price ⊕ orderkey packed into
    one long (price < ~9×10⁸ and orderkey < 10¹⁰ fit disjoint digit
    ranges; ANSI overflow would be loud, not silent). One map-combined
    aggregation — the agg_minmax shuffle budget.
    """
    prepare(spark)
    tkey = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(10_000_000_000)
        + F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice", tkey.alias("tkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", F.col("tkey")).alias("top_orderkey"),
            F.max("o_totalprice").alias("top_price"),
            F.min_by("o_orderkey", F.col("tkey")).alias("bottom_orderkey"),
            F.min("o_totalprice").alias("bottom_price"),
        )
    )


@query(
    "agg_boolbit",
    """
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000.0) AS all_over_1k,
           bool_or(o_orderstatus = 'P') AS any_pending,
           CAST(bit_and(o_orderkey % 256) AS BIGINT) AS band,
           CAST(bit_or(o_orderkey % 256) AS BIGINT) AS bor,
           CAST(bit_xor(o_orderkey % 256) AS BIGINT) AS bxor
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_boolbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-EXT boolean/bitwise aggregates: bool_and/bool_or + bit_and/or/xor.

    The predicate-summary aggregates (EVERY/ANY of SQL:1999) and the
    bitmask folds — all associative/commutative, so they map-side
    combine like sums and are partition-order-proof by construction
    (xor/and/or over ints have no float surface at all). One shuffle.
    """
    prepare(spark)
    m = F.col("o_orderkey") % 256
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
            F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
            F.bit_and(m).alias("band"),
            F.bit_or(m).alias("bor"),
            F.bit_xor(m).alias("bxor"),
        )
    )
