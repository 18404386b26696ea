"""Composite analytical queries + scale techniques — SURVEY.md §2.3/§2.4/§4.

Multi-join analytics in the TPC-H idiom (the workloads a reference user
actually runs end-to-end) plus explicitly-demonstrated scale techniques:

- ``analytics_shipping_priority`` — Q3-shaped 3-way join + top-k revenue.
- ``analytics_regional_revenue``  — Q5-shaped 6-way star join (dims
  broadcast, supplier co-nation condition).
- ``agg_pivot``  — pivot (MR users run one job per column; one pass here).
- ``agg_salted`` — two-phase salted aggregation: the skew-mitigation
  rewrite (RehashPartitioner's job, SURVEY §2.6 D3) as an operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.exprs import dsum, sql_dsum
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import EVENTS_SQL, load

CUT = "1998-01-01 00:00:00"


@query(
    "analytics_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate < TIMESTAMP '{CUT}'
      AND l.l_shipdate  > TIMESTAMP '{CUT}'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def analytics_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped: unshipped-revenue top-10 (join → agg → TakeOrdered).

    customer⋈orders is a fact-dim join on the shuffle; the final top-10
    is TakeOrderedAndProject (per-partition heaps), not a global sort.
    """
    prepare(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(CUT).cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(CUT).cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "analytics_regional_revenue",
    f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def analytics_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped: local-supplier revenue by nation (6-way star join).

    region/nation are broadcast (design-bounded: fixed row counts at
    every SF); customer⋈orders⋈lineitem shuffle on their keys; the
    co-nation predicate rides the supplier join condition. Supplier is
    NOT statically hinted — it grows 10k×SF, so its strategy is left to
    size-based planning/AQE (which still broadcasts at fixture sizes).
    """
    prepare(spark)
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "agg_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS DOUBLE)
               AS qty_o,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS DOUBLE)
               AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one pass wide aggregation (explicit value list, no scan to
    discover columns — mandatory at scale)."""
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")))
        .select(
            "l_returnflag",
            F.col("O").cast("double").alias("qty_o"),
            F.col("F").cast("double").alias("qty_f"),
        )
    )


@query(
    "analytics_nation_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(o.o_orderdate) AS yr,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE sn.n_nationkey <> cn.n_nationkey
    GROUP BY sn.n_name, cn.n_name, year(o.o_orderdate)
    """,
)
def analytics_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: cross-nation shipping volume by (supp, cust, year).

    The nation dim joins twice under different roles (broadcast each
    time — nation is design-bounded); the inequality predicate rides as
    a post-join filter. Supplier is NOT statically hinted: it grows
    10k×SF, so its join strategy is left to size-based planning/AQE.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("o_orderdate").alias("yr"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
    )


@query(
    "analytics_returned_customers",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def analytics_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: top-20 customers by returned-item revenue.

    Pushed returnflag filter shrinks the fact before the joins; final
    top-20 is TakeOrderedAndProject.
    """
    prepare(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "agg_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 (EXT) explicit GROUPING SETS (rollup's general form) via SQL —
    one pass over the fact for all three granularities."""
    prepare(spark)
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    from ls_hadoop_3_0_spark.exprs import DEC

    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS sum_qty
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
    FROM lineitem WHERE l_orderkey <= 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey <= 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax
    FROM lineitem WHERE l_orderkey <= 200
    """,
)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide metric columns → long (metric, val) rows.

    Spark's native ``unpivot`` reads the fact once (the UNION-ALL oracle
    mirror reads it three times — exactly the rewrite melt avoids).
    """
    prepare(spark)
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 200)
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "metric",
            "val",
        )
        .withColumn(
            "metric",
            F.expr("substring(metric, 3)"),  # l_quantity -> quantity
        )
    )


@query(
    "agg_salted",
    f"""
    SELECT l_suppkey,
           {sql_dsum('l_extendedprice')} AS sum_price,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_suppkey
    """,
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — same answer as a plain groupBy
    (that's the point: the oracle IS the unsalted query).

    Phase 1 groups on (key, salt∈[0,8)) so one hot key spreads over 8
    reducers; phase 2 merges the 8 partials. Decimal partials keep the
    final double bit-identical to the one-phase plan. The salt column
    derives from a hash of the row's line number — any even spreader
    works; it never reaches the output.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    salted = li.withColumn("_salt", F.pmod(F.col("l_orderkey") * 31 + F.col("l_linenumber"), F.lit(8)))
    partial = salted.groupBy("l_suppkey", "_salt").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(25,6)")).alias("_psum"),
        F.count(F.lit(1)).alias("_pn"),
    )
    return partial.groupBy("l_suppkey").agg(
        F.sum("_psum").cast("double").alias("sum_price"),
        F.sum("_pn").alias("n"),
    )


@query(
    "analytics_priority_lines",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def analytics_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped: urgent-vs-other order counts per return flag.

    (TPC-H Q12 splits by l_shipmode; the fixture has no shipmode column,
    so returnflag plays the grouping role — the plan shape is identical.)
    The year filter pushes to the lineitem scan; both conditional counts
    ride ONE aggregation pass as CASE sums — the MR idiom would be two
    jobs or a custom combiner (SURVEY §2.4 A6).
    """
    prepare(spark)
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_count"),
        )
    )


@query(
    "analytics_order_distribution",
    """
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    ) per_cust
    GROUP BY n_orders
    """,
)
def analytics_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: distribution of orders-per-customer (custdist).

    Two chained aggregations over a LEFT OUTER join — zero-order
    customers must survive as n_orders=0 (COUNT of the null-extended
    side counts non-null keys only). The second groupBy keys on the
    first's output: AQE reuses the small intermediate without a wide
    shuffle at any scale.
    """
    prepare(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "analytics_small_qty",
    f"""
    SELECT ROUND({sql_dsum('l.l_extendedprice')} / 7.0, 6) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < (
          SELECT 0.5 * ((CAST(SUM(CAST(round(l2.l_quantity * 1000000) AS BIGINT))
                              AS DOUBLE) / 1000000.0) / COUNT(*))
          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def analytics_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped: revenue lost to small-quantity orders of one brand.

    The correlated AVG subquery decorrelates into a per-part aggregate
    joined back to the fact (exactly what Catalyst's
    RewriteCorrelatedScalarSubquery does to the oracle's form). Scale
    design: the per-part average is only needed for the brand's parts,
    so the fact is semi-join-pruned by the part dim BEFORE the
    aggregate — at 100 TB that's the difference between averaging
    every part and averaging 1/25 of them. Neither the brand key set
    nor the per-part average carries a static broadcast hint: both grow
    linearly with SF (part is 200k×SF), so their join strategy is left
    to size-based planning/AQE, which still broadcasts them while they
    measure small. The average composes from the exact scaled-long sum
    (exprs.dsum) so the `<` threshold comparison is bit-identical in
    both engines.
    """
    prepare(spark)
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    li = load(spark, sf_dir, "lineitem")
    brand_keys = p.select("p_partkey")
    brand_li = li.join(brand_keys, li.l_partkey == F.col("p_partkey"), "left_semi")
    avg_qty = brand_li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        brand_li.join(
            avg_qty, brand_li.l_partkey == F.col("a_partkey")
        )
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(dsum("l_extendedprice") / 7.0, 6).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "analytics_large_orders",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
           o.o_totalprice,
           t.sum_qty
    FROM (
        SELECT l_orderkey, {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING {sql_dsum('l_quantity')} > 150.0
    ) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def analytics_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: top-20 largest orders by total quantity (HAVING).

    The HAVING aggregate shrinks the fact to a handful of hot orders
    BEFORE any join — the surviving set is tiny at every scale, so both
    dimension joins broadcast it. Final top-20 is TakeOrderedAndProject.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150.0)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "analytics_idle_customers",
    f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           {sql_dsum('c.c_acctbal')} AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT CAST(SUM(CAST(round(c2.c_acctbal * 1000000) AS BIGINT))
                        AS DOUBLE) / 1000000.0 / COUNT(*)
            FROM customer c2 WHERE c2.c_acctbal > 0.0
          )
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    """,
)
def analytics_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: well-funded customers gone idle, by segment.

    Anti join (no orders since 2000 — every fixture customer has SOME
    order, so the date predicate is what makes the key non-trivial) +
    uncorrelated scalar average (computed once, broadcast as a 1-row
    dim — never a shuffle). The average composes from the exact
    scaled-long sum so the `>` threshold can't flip on aggregation
    order. (TPC-H Q22 groups by phone country code; the fixture has no
    phone column, so mktsegment plays that role.)
    """
    prepare(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum("c_acctbal") / F.count(F.lit(1))).alias("_threshold"))
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left_anti")
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_threshold"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@query(
    "analytics_promo_revenue",
    f"""
    SELECT ROUND(100.0
             * {sql_dsum("CASE WHEN p.p_type = 'PROMO'"
                         " THEN l.l_extendedprice * (1 - l.l_discount) END")}
             / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}, 6)
               AS promo_pct,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def analytics_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: share of one month's revenue from PROMO parts.

    The month filter prunes the fact at the scan (PushedFilters on
    l_shipdate). part is NOT hinted broadcast — unlike nation/region it
    scales with SF (200k rows per SF unit: billions at 100 TB), so the
    planner/AQE must pick broadcast-vs-shuffle from actual size (it
    broadcasts at test scale). Both sums ride ONE aggregation pass
    (conditional numerator via CASE), and the percent division happens
    once on the two deterministic dsum doubles, rounded to 6 — the same
    evaluation order the oracle mirrors.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", vol))
                / dsum(vol),
                6,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "analytics_bracket_revenue",
    f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#18' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def analytics_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped: revenue under OR'd multi-column predicate brackets.

    The disjunction mixes part-side (brand, size) and fact-side
    (quantity) conditions, so it can't fully push to either scan — but
    each bracket's fact-side range DOES push as
    ``l_quantity BETWEEN 1 AND 30`` (the OR's hull). part is left
    unhinted (it scales with SF — AQE broadcasts it at test scale,
    shuffles at warehouse scale); the residual OR applies post-join.
    The classic "predicates too entangled to prune" stress query.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#18")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(bracket)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "analytics_top_supplier",
    f"""
    WITH rev AS (
        SELECT l_suppkey,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def analytics_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped: supplier(s) with maximum quarterly revenue.

    The view-over-aggregate TPC-H shape: revenue per supplier for one
    quarter, then the argmax via a 1-row MAX joined back (the scalar is
    broadcast — metadata-scale, never a fact shuffle). Equality on the
    revenue double is safe because both sides of the comparison are the
    SAME dsum-derived exact value. supplier and rev both scale with SF,
    so their join is left unhinted for AQE to pick the strategy.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx")).drop("mx")
    sup = load(spark, sf_dir, "supplier")
    return sup.join(top, sup.s_suppkey == top.l_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


@query(
    "anomaly_zscore",
    f"""
    WITH st AS (
        SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
               {sql_dsum('value')} AS s, {sql_dsum('value * value')} AS q
        FROM events GROUP BY event_type
    ),
    p AS (
        SELECT event_type, s / n AS mean,
               sqrt(greatest(q / n - (s / n) * (s / n), CAST(0 AS DOUBLE)))
                   AS std
        FROM st
    )
    SELECT event_id, e.event_type, value,
           (value - mean) / NULLIF(std, 0) AS z
    FROM events e JOIN p ON e.event_type = p.event_type
    WHERE abs((value - mean) / NULLIF(std, 0)) > 3.0
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series z-score outlier detection (event-stream QC).

    Population moments per event_type from EXACT scaled-long sums
    (Σv, Σv²), variance/std composed with identical double arithmetic on
    both sides (registry.py rule — never the engines' streaming stddev),
    then flag |z| > 3. Both engines derive bit-identical means/stds from
    the exact moments, so the flag set and the emitted z values
    hash-match. The per-type stats table is bounded by the event-type
    vocabulary → broadcast; the fact streams map-side through the join.
    Uses `value` only — unit-drift-immune (no ts in the plan).

    Degenerate-series guards (identical both sides, so a drifted fixture
    can't split the engines): quantization can round q/n−(s/n)² to a tiny
    negative → clamp with greatest(·, 0) (Spark sqrt(neg) is NaN, DuckDB
    errors); a zero-variance series (one event, constant values) must
    yield NULL z, not DIVIDE_BY_ZERO under the session's ANSI mode →
    divide by NULLIF(std, 0) and let the |z| filter drop the NULLs.
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("value").alias("s"),
        dsum(F.col("value") * F.col("value")).alias("q"),
    )
    p = st.select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            F.greatest(
                F.col("q") / F.col("n")
                - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.nullif(F.col("std"), F.lit(0.0))
    return (
        ev.join(F.broadcast(p), "event_type")
        .filter(F.abs(z) > 3.0)
        .select("event_id", "event_type", "value", z.alias("z"))
    )


@query(
    "analytics_cohort_retention",
    f"""
    WITH first AS (
        SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_month,
           CAST((year(date_trunc('month', o.o_orderdate)) * 12
                 + month(date_trunc('month', o.o_orderdate)))
                - (year(cohort) * 12 + month(cohort)) AS BIGINT)
               AS months_since,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
           {sql_dsum('o.o_totalprice')} AS revenue
    FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
    GROUP BY cohort, 2
    """,
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: activity by first-order month × months since.

    The classic warehouse retention triangle: cohort each customer by
    the month of their first order, then count distinct active
    customers (and exact revenue) for every (cohort, months-since)
    cell. Month distance is computed as integer year·12+month
    arithmetic — portable across engines, no interval/months_between
    dialect drift. Two shuffles at any scale: the per-customer MIN and
    the cohort-cell aggregate; the first-order side is customer-sized
    and joins back on the same key the fact shuffles on.
    """
    prepare(spark)
    o = load(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    j = o.join(first, "o_custkey")
    om = F.date_trunc("month", F.col("o_orderdate"))
    months_since = (
        (F.year(om) * 12 + F.month(om))
        - (F.year("cohort") * 12 + F.month("cohort"))
    ).cast("long")
    return (
        j.groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_month"),
            months_since.alias("months_since"),
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_active"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@query(
    "analytics_trend",
    """
    WITH e AS (SELECT event_type, value,
                      epoch_ns(ts) // 3600000000000 AS hr
               FROM {events}),
    c AS (SELECT e.event_type, e.value, e.hr - m.h0 AS x
          FROM e, (SELECT MIN(hr) AS h0 FROM e) m),
    mo AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE)
                   / 1000000.0 AS sy,
               CAST(SUM(CAST(round(value * value * 1000000) AS BIGINT))
                   AS DOUBLE) / 1000000.0 AS syy,
               CAST(SUM(CAST(round(x * value * 1000000) AS BIGINT))
                   AS DOUBLE) / 1000000.0 AS sxy
        FROM c GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(CAST(round(
               (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0)
               * 1000000) AS BIGINT) AS DOUBLE) / 1000000.0 AS slope,
           CAST(CAST(round(
               ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))
               / NULLIF((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * syy - sy * sy), 0)
               * 1000000) AS BIGINT) AS DOUBLE) / 1000000.0 AS r2
    FROM mo
    """.format(events=EVENTS_SQL),
)
def analytics_trend(spark, sf_dir: str):
    """EXT monitoring workload: per-event-type linear trend (OLS) + r².

    The drift-detection query an ops pipeline runs over its metrics
    stream: regress ``value`` against event-time (hours since the
    corpus's first event) per event type; emit slope and coefficient of
    determination. All five OLS moments are EXACT: x is an integer hour
    index (centered on the global minimum so Σx² stays far inside
    int64), and the y moments go through the scaled-long lattice —
    slope/r² are then composed from identical doubles on both engines
    and re-quantized (the anomaly_zscore/graph._q6 float discipline).
    Zero-variance groups yield NULL via NULLIF on both sides, never a
    DIVIDE_BY_ZERO under ANSI mode.

    Plan: one scan + a 1-row global MIN (broadcast) + one
    map-side-combined aggregation per event type — two shuffles carrying
    one 6-number moment row per (type × partition) at any corpus size.
    """
    prepare(spark)
    e = load(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.expr("unix_timestamp(ts) div 3600").alias("hr"),
    )
    h0 = e.agg(F.min("hr").alias("h0"))
    c = e.crossJoin(F.broadcast(h0)).select(
        "event_type", "value", (F.col("hr") - F.col("h0")).alias("x")
    )
    q = lambda col: F.sum(F.round(col * 1_000_000).cast("long")).cast(  # noqa: E731
        "double"
    ) / F.lit(1_000_000.0)
    mo = c.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        q(F.col("value")).alias("sy"),
        q(F.col("value") * F.col("value")).alias("syy"),
        q(F.col("x") * F.col("value")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    den = F.nullif(nd * sxxd - sxd * sxd, F.lit(0.0))
    den_y = F.nullif(
        (nd * sxxd - sxd * sxd) * (nd * F.col("syy") - F.col("sy") * F.col("sy")),
        F.lit(0.0),
    )
    q6 = lambda col: F.round(col * 1_000_000).cast("long").cast("double") / F.lit(  # noqa: E731
        1_000_000.0
    )
    return mo.select(
        "event_type",
        "n",
        q6(num / den).alias("slope"),
        q6((num * num) / den_y).alias("r2"),
    )


@query(
    "basket_pairs",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM b),
    ic AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY p),
    pc AS (
        SELECT a.p AS part_a, b2.p AS part_b, CAST(COUNT(*) AS BIGINT) AS n_co
        FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, n_co,
           CAST(round(ln((CAST(n_co AS DOUBLE) * n.n_orders)
                         / (CAST(ia.c AS DOUBLE) * ib.c))
                      * 1000000) AS BIGINT)
               / CAST(1000000 AS DOUBLE) AS pmi
    FROM pc JOIN ic ia ON pc.part_a = ia.p
            JOIN ic ib ON pc.part_b = ib.p
            CROSS JOIN n
    ORDER BY n_co DESC, part_a, part_b LIMIT 50
    """,
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT market-basket mining: top co-occurring part pairs with PMI.

    The frequent-itemset (pairs) pass — same shape as token/document
    co-occurrence mining in a text pipeline. Baskets are orders; the
    pair generator is a self-join on the basket key, whose fan-out is
    DESIGN-bounded (≤ 7 lineitems per order ⇒ ≤ C(13,2) distinct-part
    pairs per basket) — the property that makes pair enumeration safe
    at 100 TB where an unbounded basket would need the dedup_ngram-style
    cap. Pairs seen ≥ 2× get pointwise mutual information
    ln(P(a,b)/(P(a)P(b))) from exact counts (ln pair proven; quantized
    through the scaled-long path), then a deterministic top-50
    (count desc, part ids) — TakeOrderedAndProject, no global sort.

    Part-frequency sides are part-vocabulary-scale (grows with SF) →
    merge hints, never static broadcast; the basket self-join shuffles
    once on the basket key.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    n_orders = b.select("o").distinct().count()  # exact scalar stat
    ic = b.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    a, b2 = b.alias("a"), b.alias("b2")
    pc = (
        a.join(b2, (F.col("a.o") == F.col("b2.o")) & (F.col("a.p") < F.col("b2.p")))
        .groupBy(
            F.col("a.p").alias("part_a"), F.col("b2.p").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
    )
    ia = ic.select(F.col("p").alias("part_a"), F.col("c").alias("ca"))
    ib = ic.select(F.col("p").alias("part_b"), F.col("c").alias("cb"))
    pmi = (
        F.round(
            F.log(
                (F.col("n_co").cast("double") * F.lit(n_orders))
                / (F.col("ca").cast("double") * F.col("cb"))
            )
            * 1_000_000
        ).cast("long")
        / F.lit(1_000_000.0)
    )
    return (
        pc.join(ia.hint("merge"), "part_a")
        .join(ib.hint("merge"), "part_b")
        .select("part_a", "part_b", "n_co", pmi.alias("pmi"))
        .orderBy(F.col("n_co").desc(), "part_a", "part_b")
        .limit(50)
    )


@query(
    "analytics_lorenz",
    """
    WITH rev AS (
        SELECT o_custkey,
               SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS rev_q
        FROM orders GROUP BY o_custkey
    ),
    r AS (
        SELECT o_custkey, rev_q,
               row_number() OVER (ORDER BY rev_q DESC, o_custkey) AS rn,
               COUNT(*) OVER () AS n,
               SUM(rev_q) OVER () AS total_q
        FROM rev
    ),
    d AS (
        SELECT ((rn - 1) * 10) // n AS decile, rev_q, total_q FROM r
    ),
    g AS (
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
               SUM(rev_q) AS dec_q, MAX(total_q) AS total_q
        FROM d GROUP BY decile
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_customers,
           (CAST(dec_q AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS revenue,
           (CAST(dec_q AS DOUBLE) / total_q) AS share,
           (CAST(SUM(dec_q) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / total_q) AS cum_share
    FROM g
    """,
)
def analytics_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT revenue-concentration (Lorenz/Pareto) curve by customer decile.

    "What share of revenue do the top 10 % of customers produce?" — the
    concentration question every revenue (and every token-frequency)
    distribution gets asked. Customers are ranked by exact scaled-long
    revenue, assigned to deciles with pure integer arithmetic
    ((rank−1)·10 div n — no float boundaries), and each decile reports
    its customer count, exact revenue, share, and cumulative share; the
    divisions happen once, on identical exact longs, at the 10-row tip.

    Plan: one map-combined keyed aggregation to customer grain, then
    sort.global_rank (range partition + offsets — no single-partition
    window over the corpus-scale customer table), one decile
    aggregation, and a 10-row window. The only driver scalars are the
    exact customer count and total (collected longs).
    """
    from pyspark.sql import Window

    from ls_hadoop_3_0_spark.operators.sort import global_rank

    prepare(spark)
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 1_000_000).cast("long")).alias(
                "rev_q"
            )
        )
    )
    r = global_rank(rev, F.col("rev_q").desc(), F.col("o_custkey"))
    tot = rev.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev_q").alias("total_q")
    ).collect()[0]
    n, total_q = tot["n"], tot["total_q"]  # exact scalar corpus stats
    if n == 0:
        # Empty corpus: the oracle's window CTEs all go empty → 0 rows.
        return spark.createDataFrame(
            [],
            "decile long, n_customers long, revenue double,"
            " share double, cum_share double",
        )
    g = (
        r.select(F.expr(f"((rank - 1) * 10) div {n}").alias("decile"), "rev_q")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev_q").alias("dec_q"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return g.select(
        F.col("decile").cast("long").alias("decile"),
        "n_customers",
        (F.col("dec_q").cast("double") / F.lit(1_000_000.0)).alias("revenue"),
        (F.col("dec_q").cast("double") / F.lit(float(total_q))).alias("share"),
        (F.sum("dec_q").over(w).cast("double") / F.lit(float(total_q))).alias(
            "cum_share"
        ),
    )


@query(
    "analytics_backlog",
    """
    WITH span AS (
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS d0,
               CAST(MAX(l.l_shipdate) AS DATE) AS d1
        FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
        SELECT d0 AS day, 1 AS delta FROM span
        UNION ALL
        SELECT d1, -1 FROM span WHERE d1 IS NOT NULL
    ),
    daily AS (
        SELECT day, CAST(SUM(delta) AS BIGINT) AS net_change
        FROM deltas GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, net_change,
           CAST(SUM(net_change) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS open_orders
    FROM daily
    """,
)
def analytics_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT open-orders backlog curve: sweep-line interval counting.

    How many orders are open (placed, not yet fully shipped) on each
    day — the classic interval-count question (concurrent sessions,
    active users, WIP inventory) answered with the sweep-line pattern
    this repo had not yet demonstrated: every interval becomes a +1
    event at its start and a −1 at its end, one keyed aggregation
    collapses events to net change per day, and a running sum walks
    the timeline. An order with no lineitems never closes (left join,
    NULL end → no −1 event), identically on both engines.

    Scale: the interval endpoints aggregate to TIME-SPAN-scale rows
    (one per active day) before the running sum, so the ordered window
    runs over a few-thousand-row series at ANY corpus size — the same
    metadata-scale-window argument as stream_late_drop's chunk prefix.
    The corpus-scale work is one fact join + one keyed count.
    """
    from pyspark.sql import Window

    prepare(spark)
    span = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("d1_ts"))
        .select(
            F.col("o_orderdate").cast("date").alias("d0"),
            F.col("d1_ts").cast("date").alias("d1"),
        )
    )
    deltas = span.select(F.col("d0").alias("day"), F.lit(1).alias("delta")).unionByName(
        span.filter(F.col("d1").isNotNull()).select(
            F.col("d1").alias("day"), F.lit(-1).alias("delta")
        )
    )
    daily = deltas.groupBy("day").agg(F.sum("delta").cast("long").alias("net_change"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "net_change",
        F.sum("net_change").over(w).cast("long").alias("open_orders"),
    )


@query(
    "analytics_market_share",
    f"""
    WITH base AS (
        SELECT year(o.o_orderdate) AS yr,
               CAST(round(l.l_extendedprice * (1 - l.l_discount) * 1000000)
                    AS BIGINT) AS revq,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = cn.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT yr,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN revq ELSE 0 END)
                AS DOUBLE) / 1000000.0 AS nation_revenue,
           CAST(SUM(revq) AS DOUBLE) / 1000000.0 AS total_revenue,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN revq ELSE 0 END)
                AS DOUBLE)
               / CAST(SUM(revq) AS DOUBLE) AS mkt_share
    FROM base GROUP BY yr
    """,
)
def analytics_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped: NATION_2's share of ASIA-market revenue per year.

    The share is a ratio of two exact scaled-long sums — one double
    division per output row, bit-identical across engines (the dsum
    invariant extended to ratios). 7-way star join: nation/region
    broadcast (design-bounded dims); orders⋈lineitem⋈customer shuffle
    on their keys — the classic fact-to-fact spine at 100 TB. Supplier
    (10k×SF) is NOT statically hinted — size-based planning/AQE decides.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    s = load(spark, sf_dir, "supplier")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rk")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    revq = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000
    ).cast("long")
    base = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("cn_rk"),
        )
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .select(
            F.year("o_orderdate").alias("yr"),
            revq.alias("revq"),
            "supp_nation",
        )
    )
    nat = F.sum(
        F.when(F.col("supp_nation") == "NATION_2", F.col("revq")).otherwise(0)
    )
    tot = F.sum("revq")
    return base.groupBy("yr").agg(
        (nat.cast("double") / 1e6).alias("nation_revenue"),
        (tot.cast("double") / 1e6).alias("total_revenue"),
        (nat.cast("double") / tot.cast("double")).alias("mkt_share"),
    )


@query(
    "analytics_product_profit",
    f"""
    SELECT sn.n_name AS nation, year(l.l_shipdate) AS yr,
           (CAST(SUM(CAST(round(
                (l.l_extendedprice * (1 - l.l_discount)
                 - CAST(0.6 AS DOUBLE) * p.p_retailprice * l.l_quantity)
                * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0) AS profit,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY sn.n_name, year(l.l_shipdate)
    """,
)
def analytics_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped: per-nation / per-ship-year profit on 'widget' parts.

    The fixture has no partsupp, so supply cost is proxied as
    0.6·p_retailprice·quantity (cast to DOUBLE in the oracle — the
    DECIMAL-literal drift rule). The part-name filter prunes the part
    dim BEFORE the join, and Catalyst pushes the resulting semi-join
    (bloom filter at runtime) into the lineitem scan. Neither part nor
    supplier carries a static broadcast hint — both grow with SF
    (200k×/10k×SF), so even the name-filtered part side is corpus-scale
    at 100 TB; size-based planning/AQE picks the build side at runtime.
    Only the fixed-25-row nation dim keeps its hint.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    amt = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .groupBy("nation", F.year("l_shipdate").alias("yr"))
        .agg(
            dsum(amt).alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "analytics_ship_latency",
    """
    SELECT CASE WHEN lag_days <= 30 THEN '0-30'
                WHEN lag_days <= 90 THEN '31-90'
                ELSE '90+' END AS latency_band,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_priority
    FROM (
        SELECT o.o_orderpriority,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    GROUP BY 1
    """,
)
def analytics_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped: priority mix by order→ship latency band.

    The fixture carries no l_shipmode/commitdate, so the Q12 question
    ("does slow shipping hit urgent orders?") is asked of the
    orderdate→shipdate lag, banded. datediff on DATE-truncated
    timestamps matches DuckDB's date_diff('day') exactly — integer day
    arithmetic, no timezone surface (fixtures are midnight-aligned).
    One fact-fact join on orderkey + a 3-group aggregation.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .select(
            F.when(lag <= 30, "0-30")
            .when(lag <= 90, "31-90")
            .otherwise("90+")
            .alias("latency_band"),
            hi.alias("hi"),
        )
        .groupBy("latency_band")
        .agg(
            F.sum(F.col("hi").cast("long")).alias("high_priority"),
            F.sum((~F.col("hi")).cast("long")).alias("low_priority"),
        )
    )


@query(
    "analytics_waiting_orders",
    """
    WITH per_supp AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_last
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
        SELECT l_orderkey, MAX(supp_last) AS order_last,
               COUNT(*) AS n_supps
        FROM per_supp GROUP BY l_orderkey
    )
    SELECT sn.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_blocking
    FROM per_supp ps
    JOIN per_order po ON po.l_orderkey = ps.l_orderkey
                      AND po.n_supps >= 2
                      AND ps.supp_last = po.order_last
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    GROUP BY sn.n_name
    """,
)
def analytics_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped: per-nation count of 'blocking supplier' incidents.

    A supplier blocks a multi-supplier order when its last shipment IS
    the order's last shipment. Two keyed aggregations over the same
    (orderkey[, suppkey]) grain — the second reuses the first's shuffle
    partitioning — then a co-partitioned self-join on orderkey; only
    the design-bounded nation dim carries a static broadcast hint
    (supplier grows 10k×SF — its strategy is AQE's call). No EXISTS
    subquery needed: the max-equality formulation is one pass where
    Q21's correlated NOT EXISTS would be a second corpus-scale probe.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.max("supp_last").alias("order_last"),
            F.count(F.lit(1)).alias("n_supps"),
        )
        .withColumnRenamed("l_orderkey", "po_orderkey")
    )
    s = load(spark, sf_dir, "supplier")
    sn = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    return (
        per_supp.join(
            per_order,
            (F.col("l_orderkey") == F.col("po_orderkey"))
            & (F.col("n_supps") >= 2)
            & (F.col("supp_last") == F.col("order_last")),
        )
        .join(s, s.s_suppkey == per_supp.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
        .groupBy("nation")
        .agg(F.count(F.lit(1)).alias("n_blocking"))
    )


@query(
    "analytics_rfm",
    f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), mx.maxd) AS r_days,
               CAST(COUNT(*) AS BIGINT) AS f_orders,
               SUM(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS m_spend
        FROM orders CROSS JOIN mx
        GROUP BY o_custkey, mx.maxd
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust),
    rr AS (SELECT r_days, row_number() OVER (ORDER BY r_days) AS rn FROM cust),
    rf AS (SELECT f_orders, row_number() OVER (ORDER BY f_orders) AS rn FROM cust),
    rm AS (SELECT m_spend, row_number() OVER (ORDER BY m_spend) AS rn FROM cust),
    cut AS (
        SELECT
          (SELECT MAX(CASE WHEN rn = (n.n + 3) // 4 THEN r_days END) FROM rr) AS r1,
          (SELECT MAX(CASE WHEN rn = (n.n + 1) // 2 THEN r_days END) FROM rr) AS r2,
          (SELECT MAX(CASE WHEN rn = (3 * n.n + 3) // 4 THEN r_days END) FROM rr) AS r3,
          (SELECT MAX(CASE WHEN rn = (n.n + 3) // 4 THEN f_orders END) FROM rf) AS f1,
          (SELECT MAX(CASE WHEN rn = (n.n + 1) // 2 THEN f_orders END) FROM rf) AS f2,
          (SELECT MAX(CASE WHEN rn = (3 * n.n + 3) // 4 THEN f_orders END) FROM rf) AS f3,
          (SELECT MAX(CASE WHEN rn = (n.n + 3) // 4 THEN m_spend END) FROM rm) AS m1,
          (SELECT MAX(CASE WHEN rn = (n.n + 1) // 2 THEN m_spend END) FROM rm) AS m2,
          (SELECT MAX(CASE WHEN rn = (3 * n.n + 3) // 4 THEN m_spend END) FROM rm) AS m3
        FROM n
    ),
    seg AS (
        SELECT
          (CASE WHEN r_days <= r1 THEN 0 WHEN r_days <= r2 THEN 1
                WHEN r_days <= r3 THEN 2 ELSE 3 END) || '|' ||
          (CASE WHEN f_orders <= f1 THEN 0 WHEN f_orders <= f2 THEN 1
                WHEN f_orders <= f3 THEN 2 ELSE 3 END) || '|' ||
          (CASE WHEN m_spend <= m1 THEN 0 WHEN m_spend <= m2 THEN 1
                WHEN m_spend <= m3 THEN 2 ELSE 3 END) AS segment,
          f_orders, m_spend
        FROM cust CROSS JOIN cut
    )
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(f_orders) AS BIGINT) AS total_orders,
           CAST(SUM(m_spend) AS DOUBLE) / 1000000.0 AS total_spend
    FROM seg GROUP BY segment
    """,
)
def analytics_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation with DISCRETE quartile boundaries.

    The classic marketing/churn feature: per customer Recency (days
    since last order, vs the corpus max date), Frequency (order count),
    Monetary (spend as an exact scaled long), each cut into quartiles
    by value-at-integer-position order statistics (the
    quantile_bucketize discipline — permutation-invariant under the
    heavy ties an integer order-count column guarantees, so the two
    engines cannot diverge at a boundary).

    Plan: one orders scan → customer-grain aggregation (map-combined),
    then three global_rank passes over the CUSTOMER summary (≪ fact;
    range-partitioned, no single-task window), a 1-row broadcast cut
    set, one final segment aggregation (≤64 rows).
    """
    from ls_hadoop_3_0_spark.operators.sort import global_rank

    prepare(spark)
    orders = load(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("maxd"))
    cust = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "maxd")
        .agg(
            F.max("o_orderdate").alias("lastd"),
            F.count(F.lit(1)).alias("f_orders"),
            F.sum(F.round(F.col("o_totalprice") * 1_000_000).cast("long")).alias(
                "m_spend"
            ),
        )
        .select(
            "o_custkey",
            F.datediff(F.to_date("maxd"), F.to_date("lastd")).alias("r_days"),
            "f_orders",
            "m_spend",
        )
        .localCheckpoint()  # customer-grain summary feeds 3 rank passes
    )
    n = cust.count()  # exact scalar (customer count)
    p1, p2, p3 = (n + 3) // 4, (n + 1) // 2, (3 * n + 3) // 4

    def cuts(col: str, a: str):
        r = global_rank(cust.select(F.col(col).alias("v")), F.col("v"))
        return r.filter(F.col("rank").isin(p1, p2, p3)).agg(
            F.max(F.when(F.col("rank") == p1, F.col("v"))).alias(f"{a}1"),
            F.max(F.when(F.col("rank") == p2, F.col("v"))).alias(f"{a}2"),
            F.max(F.when(F.col("rank") == p3, F.col("v"))).alias(f"{a}3"),
        )

    cut = cuts("r_days", "r").crossJoin(cuts("f_orders", "f")).crossJoin(
        cuts("m_spend", "m")
    )

    def q(col: str, a: str):
        return (
            F.when(F.col(col) <= F.col(f"{a}1"), 0)
            .when(F.col(col) <= F.col(f"{a}2"), 1)
            .when(F.col(col) <= F.col(f"{a}3"), 2)
            .otherwise(3)
        )

    seg = F.concat_ws(
        "|",
        q("r_days", "r").cast("string"),
        q("f_orders", "f").cast("string"),
        q("m_spend", "m").cast("string"),
    )
    return (
        cust.crossJoin(F.broadcast(cut))
        .select(seg.alias("segment"), "f_orders", "m_spend")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("f_orders").alias("total_orders"),
            (F.sum("m_spend").cast("double") / 1e6).alias("total_spend"),
        )
    )


@query(
    "analytics_yoy",
    f"""
    WITH yearly AS (
        SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
               SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                              * 1000000) AS BIGINT)) AS revq
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, year(o.o_orderdate)
    )
    SELECT nation, yr,
           CAST(revq AS DOUBLE) / 1000000.0 AS revenue,
           CAST(lag(revq) OVER w AS DOUBLE) / 1000000.0 AS prev_revenue,
           CAST(revq - lag(revq) OVER w AS DOUBLE)
               / CAST(lag(revq) OVER w AS DOUBLE) AS yoy_growth
    FROM yearly
    WINDOW w AS (PARTITION BY nation ORDER BY yr)
    """,
)
def analytics_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation.

    The reporting composite: fact join → (nation, year) aggregation →
    lag window over the GROUPED result. Growth is a ratio of exact
    scaled-long sums (both operands integers → the division is
    bit-identical). The window partitions are nation-bounded (25 rows
    of years each) — window state is report-scale, never fact-scale.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation")
    )
    revq = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000
    ).cast("long")
    yearly = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), F.col("nk") == c.c_nationkey)
        .groupBy("nation", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(revq).alias("revq"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    prev = F.lag("revq").over(w)
    return yearly.select(
        "nation",
        "yr",
        (F.col("revq").cast("double") / 1e6).alias("revenue"),
        (prev.cast("double") / 1e6).alias("prev_revenue"),
        ((F.col("revq") - prev).cast("double") / prev.cast("double")).alias(
            "yoy_growth"
        ),
    )


@query(
    "analytics_supplier_diversity",
    """
    WITH excl AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    ),
    ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM excl)
    )
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45' AND p_size BETWEEN 1 AND 8
    GROUP BY p_brand, p_type, p_size
    """,
)
def analytics_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog: how many distinct (non-excluded) suppliers can
    ship each (brand, type, size) part class.

    The composite a procurement dashboard runs: fact-derived distinct
    part↔supplier relationships, an anti-join against the blacklist
    (negative-balance suppliers — Q16's complaints filter), a dim join
    with pushed brand/size predicates, and a grouped COUNT(DISTINCT).

    Scale: the relationship set is `distinct` over two fact columns
    (map-side partial + one shuffle, far smaller than lineitem); the
    blacklist anti-join and the part join are left to AQE (both sides
    grow with SF — no static broadcast per the repo rule); the
    brand/size predicates push into the part scan, so the join build
    side is the filtered fraction only. COUNT(DISTINCT suppkey)
    expands to the standard two-phase aggregate — partial distinct
    map-side, exact at any scale.
    """
    prepare(spark)
    excl = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(excl, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45") & F.col("p_size").between(1, 8)
    )
    return (
        ps.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "analytics_revenue_forecast",
    f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue_delta,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(24 AS DOUBLE)
    """,
)
def analytics_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: revenue forgone to a narrow discount band.

    The simplest of the 22 shapes — a pure scan→filter→1-row aggregate
    with no join at all — included so the 22-query sweep is complete and
    because at 100 TB it is the best pushdown/codegen probe in the
    suite: every predicate (shipdate range, discount band, quantity cap)
    reaches the parquet scan as a PushedFilter, the projection is 2
    columns, and the whole plan is one WholeStageCodegen span ending in
    a partial+final agg — zero shuffled rows beyond 1 per task.

    Determinism: discount literals are 2-decimal parquet doubles both
    engines read bit-identically; the oracle casts every numeric literal
    to DOUBLE (DuckDB would otherwise compare against DECIMAL — the
    registry trap), and the sum is the scaled-long dsum.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(F.lit(0.05), F.lit(0.07))
            & (F.col("l_quantity") < F.lit(24.0))
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "analytics_min_cost_supplier",
    """
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    offers AS (
        SELECT c.l_partkey, c.unit_cost, e.s_suppkey, e.s_name,
               e.s_acctbal, e.n_name
        FROM cost c JOIN eu e ON c.l_suppkey = e.s_suppkey
        JOIN part p ON c.l_partkey = p.p_partkey
        WHERE p.p_size = 15
    ),
    best AS (
        SELECT l_partkey, MIN(unit_cost) AS best_cost
        FROM offers GROUP BY l_partkey
    )
    SELECT o.s_acctbal, o.s_name, o.n_name, o.l_partkey AS p_partkey,
           o.unit_cost
    FROM offers o JOIN best b
      ON o.l_partkey = b.l_partkey AND o.unit_cost = b.best_cost
    """,
)
def analytics_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog: cheapest EUROPE supplier(s) for each size-15 part.

    The fixture has no partsupp, so supply cost is derived from the fact
    table itself: per (part, supplier) the minimum observed unit price
    (extendedprice/quantity). The Q2 skeleton is intact — region-bound
    suppliers, a part-class filter, a groupwise minimum, and the
    min-achievers joined back (Catalyst plans the same decorrelated
    aggregate+join the original's correlated subquery becomes).

    Determinism: unit_cost is one IEEE double division on bit-identical
    parquet inputs (no summation), MIN is order-invariant, and the
    equality compares two values of the SAME derivation — no float trap.

    Scale: the cost table is a one-shuffle map-combined groupBy over the
    fact; nation/region are DESIGN-bounded (25/5 rows at any SF) and the
    only statically-broadcast sides; supplier and part joins are left to
    AQE (both grow with SF). The p_size predicate pushes into the part
    scan, and the best-cost table is |parts in class| rows — the
    min-achiever join is metadata-scale.
    """
    prepare(spark)
    cost = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    offers = (
        cost.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "unit_cost", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    best = offers.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("bp"))
            & (F.col("unit_cost") == F.col("best_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "unit_cost",
        )
    )


@query(
    "analytics_important_stock",
    f"""
    WITH v AS (
        SELECT l_partkey, {sql_dsum('l_extendedprice')} AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey, value
    FROM v
    WHERE value > CAST(2 AS DOUBLE) * (
        SELECT {sql_dsum('value')} / COUNT(*) FROM v
    )
    """,
)
def analytics_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog: parts carrying an outsized share of one
    nation's shipped value.

    partsupp-free adaptation: "stock value" per part = total
    extendedprice shipped by NATION_3's suppliers; keep parts above
    2× the average part value — the HAVING-vs-global-scalar shape (the
    one TPC-H query whose threshold is itself a query). The spec's own
    Q11 scales its fraction by 1/SF so the result survives scale-up;
    the average-relative form bakes that in with no SF knob: a fixed
    fraction of the GRAND total empties the result as the part
    vocabulary grows (measured: 0 rows at the 10× replica), while the
    2×-average cut is distribution-relative — ~9% of parts at every
    fixture decade (127 rows at sf0.01, 1228 at sf0.1/10×/100×).

    Determinism: per-part values are scaled-long dsums; the threshold
    re-quantizes those values (round(value·1e6) recovers the exact
    long — the iterative-numerics recipe), sums exactly, and divides by
    the part count with the SAME double arithmetic on both engines;
    the ×2 literal is binary-exact.

    Scale: one fact shuffle for the per-part groupBy (map-side partial);
    the nation filter reaches the supplier join early; nation is the
    only design-bounded broadcast; the threshold scalar re-aggregates
    the ALREADY-GROUPED per-part table (|parts| rows, not the fact) and
    lands as a 1-row broadcast against it — no second fact scan, no
    second fact shuffle, unlike the oracle's two-scan SQL form.
    """
    prepare(spark)
    nat = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    sup = load(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey", "l_extendedprice")
    v = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            dsum("l_extendedprice").alias("value"),
            F.sum(F.round(F.col("l_extendedprice") * 1_000_000).cast("long")).alias(
                "_sv"
            ),
        )
    )
    # _sv IS round(value·1e6) exactly (value = _sv/1e6 by construction),
    # so the threshold reuses it instead of re-rounding the double.
    avg = v.agg(
        ((F.sum("_sv") / F.lit(1_000_000.0)) / F.count(F.lit(1))).alias("_avg")
    )
    return (
        v.join(F.broadcast(avg), F.col("value") > F.lit(2.0) * F.col("_avg"))
        .select("l_partkey", "value")
    )


@query(
    "analytics_excess_inventory",
    f"""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               {sql_dsum("CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'"
                         "      AND l_shipdate <  TIMESTAMP '1997-01-01'"
                         "     THEN l_quantity ELSE CAST(0 AS DOUBLE) END")}
                   AS q96,
               {sql_dsum('l_quantity')} AS qt
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    hot AS (
        SELECT p.l_partkey, p.l_suppkey
        FROM ps p JOIN part ON p.l_partkey = p_partkey
        WHERE p_type = 'PROMO'
          AND p.q96 > CAST(0.5 AS DOUBLE) * p.qt
    )
    SELECT s_suppkey, s_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_hot_parts
    FROM hot
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY s_suppkey, s_name, n_name
    """,
)
def analytics_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog: EUROPE suppliers whose PROMO-part supply just
    surged — more than half their lifetime volume shipped in 1996.

    partsupp-free adaptation of Q20's nested-aggregate threshold
    (`ps_availqty > 0.5 * sum(l_quantity ...)`): both sides of the
    comparison come from the SAME per-(part, supplier) groupBy — a
    conditional sum (1996 window) against the unconditional sum — so
    the correlated inner aggregate costs zero extra passes. Suppliers
    are then qualified through the part-class filter and the
    nation/region chain, Q20's semi-join ladder, and counted.

    Determinism: both quantity sums are scaled-long dsums over the same
    rows; the 0.5 threshold multiplies a dsum-exact double by a binary-
    exact constant, and the oracle mirrors each piece (CASE casts its
    ELSE to DOUBLE, fraction literal cast to DOUBLE).

    Scale: ONE fact shuffle total (the pair groupBy, map-side partial);
    part/supplier joins operate on the |pairs|-sized aggregate, not the
    fact, and are AQE-planned (both dims grow with SF — no static
    broadcast); nation/region stay design-bounded broadcasts. Output is
    bounded by the region's supplier count — linear in SF.
    """
    prepare(spark)
    q96 = F.when(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")),
        F.col("l_quantity"),
    ).otherwise(F.lit(0.0))
    ps = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum(q96).alias("q96"), dsum("l_quantity").alias("qt"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    hot = (
        ps.filter(F.col("q96") > F.lit(0.5) * F.col("qt"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey")
    )
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        hot.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_hot_parts"))
    )
