"""Join operators — SURVEY.md §2.3 (mapreduce.lib.join parity + EXT).

Reference surface: the ``CompositeInputFormat`` map-side SMJ family —
``inner(a,b)`` (J1/J2), ``outer`` (J3), ``override`` newest-wins (J4),
``MultiFilterRecordReader`` semi-join composition (J5), the reduce-side
join idiom (J6), the DistributedCache broadcast-hash idiom (J7), cross
join (J10), plus EXT range (J8) and as-of (J9) joins.

Scale notes (100 TB posture):
- Equi-joins are declared; Catalyst picks SMJ for big-big (co-partitioned
  via the shuffle — the moral equivalent of CompositeInputFormat's
  pre-sorted inputs) and broadcast-hash when one side fits
  ``autoBroadcastJoinThreshold`` (AQE converts at runtime too). Only
  DESIGN-bounded dims (nation/region — fixed row counts at every SF) may
  carry a static ``broadcast()`` hint; supplier/part/customer GROW with
  SF, so their join strategy is always left to size-based planning.
- AQE skew-join splitting is on (session.py) for skewed fact keys.
- The as-of join is the union+window formulation — one shuffle on
  (user), no per-row probing, no cross product — the formulation that
  survives 100 TB (a naive inequality join would be O(n·m) BNLJ).
- The range join banding trick keeps the small side broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.exprs import fmt_ts, sql_dsum, dsum
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import EVENTS_SQL, load


@query(
    "join_inner",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000.0
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 inner equi-join (CompositeInputFormat ``inner(a,b)``)."""
    prepare(spark)
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000.0)
    cust = load(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_left",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 250000.0) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 family: left outer equi-join (null-extends unmatched left rows)."""
    prepare(spark)
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 5000.0) c
    RIGHT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > 200000.0
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 family: right outer equi-join."""
    prepare(spark)
    cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0)
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_outer",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 5000.0) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 250000.0) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 ``OuterJoinRecordReader``: full outer — nulls for absent sides."""
    prepare(spark)
    cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0)
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_override",
    """
    WITH latest AS (
        SELECT o_custkey, max(o_totalprice) AS new_bal
        FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey,
           COALESCE(l.new_bal, c.c_acctbal) AS effective_bal,
           (l.o_custkey IS NOT NULL) AS overridden
    FROM customer c LEFT JOIN latest l ON c.c_custkey = l.o_custkey
    """,
)
def join_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 ``OverrideRecordReader``: rightmost-source-wins (upsert join).

    Base relation = customer balances; overriding relation = per-customer
    max order price. ``coalesce(right, left)`` implements "newest wins".
    """
    prepare(spark)
    cust = load(spark, sf_dir, "customer")
    latest = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("new_bal"))
    )
    return cust.join(latest, cust.c_custkey == latest.o_custkey, "left").select(
        "c_custkey",
        F.coalesce("new_bal", "c_acctbal").alias("effective_bal"),
        F.col("o_custkey").isNotNull().alias("overridden"),
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 ``MultiFilterRecordReader`` composition: left semi (EXISTS)."""
    prepare(spark)
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 composition: left anti (NOT EXISTS)."""
    prepare(spark)
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_broadcast",
    f"""
    SELECT s.s_name, n.n_name,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY s.s_name, n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 DistributedCache map-side hash join → broadcast-hash plan.

    Fact (lineitem) joins two broadcast dims — zero shuffle for the
    joins; the only shuffle is the final aggregation. Only nation (25
    rows at EVERY TPC-H scale) carries the static hint. Supplier is NOT
    hinted: it GROWS with SF (10k×SF ⇒ ~1 B rows at 100 TB), so forcing
    a broadcast there is a latent OOM — size-based planning/AQE still
    broadcasts it at today's fixture sizes, which is exactly the point:
    a runtime decision tracks the data, a hand hint cannot be demoted.
    tests/test_plans.py asserts BroadcastHashJoin in the physical plan.
    """
    prepare(spark)
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "join_cross",
    """
    SELECT r.r_name, n.n_name, (n.n_regionkey = r.r_regionkey) AS same_region
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 cartesian product (MR no-key-reduce idiom)."""
    prepare(spark)
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    return region.crossJoin(nation).select(
        "r_name",
        "n_name",
        (F.col("n_regionkey") == F.col("r_regionkey")).alias("same_region"),
    )


#: Price bands for the range join — literal dimension, mirrored in SQL.
PRICE_BANDS = [
    ("band0", 0.0, 100000.0),
    ("band1", 100000.0, 200000.0),
    ("band2", 200000.0, 300000.0),
    ("band3", 300000.0, 400000.0),
    ("band4", 400000.0, 1000000.0),
]

_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{n}' AS band, {lo} AS lo, {hi} AS hi" for n, lo, hi in PRICE_BANDS
)


@query(
    "join_range",
    f"""
    WITH bands AS ({_BANDS_SQL})
    SELECT b.band, COUNT(*) AS n_orders, MIN(o.o_totalprice) AS min_price,
           MAX(o.o_totalprice) AS max_price
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 (EXT) range/interval join: fact value ∈ [lo, hi) band.

    Spark plans this as BroadcastNestedLoopJoin — correct here because the
    band table is tiny and broadcast. For a large interval table the scale
    path is banding both sides to an equi-join key; documented, not needed
    for a fixed literal dimension.
    """
    prepare(spark)
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    orders = load(spark, sf_dir, "orders")
    cond = (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi)
    return (
        orders.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "join_asof",
    f"""
    SELECT p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
    FROM (SELECT * FROM {{events}} WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM {{events}} WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """.format(events=EVENTS_SQL),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 (EXT) as-of join: latest click at-or-before each purchase, per user.

    Spark has no native ASOF; the scalable formulation is union the two
    event sets, single shuffle on user_id, and carry the last click ts
    with a running ``max(ts) FILTER (is_click)`` window — O(n log n) per
    key, no inequality cross product. DuckDB oracle uses its native
    ASOF JOIN (inclusive >=) — tie at equal ts matches because clicks
    sort before purchases at the same instant (tag 'c' < 'p').
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"), F.lit("c").alias("tag")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit("p").alias("tag")
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.max(F.when(F.col("tag") == "c", F.col("ts"))).over(w)
    return (
        merged.withColumn("last_click_ts", last_click)
        .filter(F.col("tag") == "p")
        .select(
            "event_id",
            fmt_ts("ts").alias("purchase_ts"),
            "user_id",
            fmt_ts("last_click_ts").alias("last_click_ts"),
        )
    )


@query(
    "join_salted",
    f"""
    SELECT s.s_name,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice')} AS sum_price
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_name
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 (EXT) manually salted equi-join — the skew fallback when AQE
    can't help (e.g. the skew is in a broadcast-ineligible mid-size dim,
    or the engine predates runtime splitting).

    Fact side gets a deterministic salt in [0, 8); the dim side is
    replicated once per salt value (|dim|×8 rows — fine for a mid-size
    dim, and each replica row is tiny). The join key becomes
    (suppkey, salt), so one hot supplier's rows spread over 8 reducers
    instead of one. The oracle is the PLAIN unsalted join — proving the
    rewrite is semantics-preserving, exactly like agg_salted.
    """
    prepare(spark)
    n_salts = 8
    li = load(spark, sf_dir, "lineitem").withColumn(
        "_salt", F.pmod(F.col("l_orderkey") * 31 + F.col("l_linenumber"), F.lit(n_salts))
    )
    supp = load(spark, sf_dir, "supplier").withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        li.join(supp, (li.l_suppkey == supp.s_suppkey) & (li._salt == supp._salt))
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )


@query(
    "join_asof_nearest",
    f"""
    WITH e AS (SELECT * FROM {EVENTS_SQL}),
    p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM e WHERE event_type = 'click'),
    b AS (
        SELECT p.event_id, p.user_id, p.ts, c.ts AS bts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    f AS (
        SELECT p.event_id, c.ts AS fts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts < c.ts
    ),
    j AS (
        SELECT b.event_id, b.user_id, b.ts, b.bts, f.fts,
               epoch_us(b.ts) - epoch_us(b.bts) AS bd,
               epoch_us(f.fts) - epoch_us(b.ts) AS fd
        FROM b JOIN f ON b.event_id = f.event_id
    )
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           user_id,
           strftime(CASE
               WHEN bts IS NULL THEN fts
               WHEN fts IS NULL THEN bts
               WHEN bd <= fd THEN bts ELSE fts END,
               '%Y-%m-%d %H:%M:%S') AS nearest_click_ts,
           CASE
               WHEN bts IS NULL AND fts IS NULL THEN NULL
               WHEN fts IS NULL OR (bts IS NOT NULL AND bd <= fd)
                   THEN 'backward' ELSE 'forward' END AS direction
    FROM j
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9-EXT as-of NEAREST join: closest click in either direction.

    pandas ``merge_asof(direction='nearest')`` parity, the variant the
    backward-only ``join_asof`` cannot express: per purchase, the
    nearest click by |Δt| — ties (equal distance) resolve backward, a
    click at the same instant counts as backward (distance 0). The
    oracle runs DuckDB's native ASOF twice (>= backward, < forward) and
    picks; Spark stays on the scalable union form — ONE shuffle on
    user_id carries BOTH directions: a running ``max(click ts)`` over
    the preceding frame and a running ``min(click ts)`` over the
    following frame of the same merged, (ts, tag)-ordered stream
    ('c' < 'p' keeps the same-instant click out of the following
    frame). Distances compare in epoch-µs BIGINTs — no interval or
    timezone surface.
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.lit("c").alias("tag"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit("p").alias("tag")
    )
    merged = clicks.unionByName(purchases)
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    is_click = F.col("tag") == "c"
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    j = (
        merged.withColumn("bts", F.max(F.when(is_click, F.col("ts"))).over(back))
        .withColumn("fts", F.min(F.when(is_click, F.col("ts"))).over(fwd))
        .filter(F.col("tag") == "p")
        .withColumn("bd", us("ts") - us("bts"))
        .withColumn("fd", us("fts") - us("ts"))
    )
    nearest = (
        F.when(F.col("bts").isNull(), F.col("fts"))
        .when(F.col("fts").isNull(), F.col("bts"))
        .when(F.col("bd") <= F.col("fd"), F.col("bts"))
        .otherwise(F.col("fts"))
    )
    direction = (
        F.when(F.col("bts").isNull() & F.col("fts").isNull(), F.lit(None).cast("string"))
        .when(
            F.col("fts").isNull()
            | (F.col("bts").isNotNull() & (F.col("bd") <= F.col("fd"))),
            F.lit("backward"),
        )
        .otherwise(F.lit("forward"))
    )
    return j.select(
        "event_id",
        fmt_ts("ts").alias("purchase_ts"),
        "user_id",
        fmt_ts(nearest).alias("nearest_click_ts"),
        direction.alias("direction"),
    )


#: Banded-range-join geometry: 64 CONTIGUOUS, NON-OVERLAPPING bands of
#: irregular width cover the unit-price domain [0, 4096). Boundaries are
#: exact integers (i·64 + md5-jitter(i) ∈ [0,32)) — authored, engine-
#: independent, and every point matches exactly ONE band, so the join
#: output is LINEAR in the probe side at any scale (the first cut of
#: this key used overlapping ±5% per-part tolerance intervals, whose
#: pair count is probe×interval-density — quadratic under corpus
#: replication; measured hanging at the 10× replica and redesigned).
import hashlib as _hashlib

BAND_W = 64.0
N_BANDS = 64


def _band_bounds() -> list[tuple[int, float, float]]:
    """(band_id, lo, hi) with deterministic md5 jitter, c0=0, c64=4096."""
    cuts = [0.0]
    for i in range(1, N_BANDS):
        j = int(_hashlib.md5(f"band:{i}".encode()).hexdigest()[:4], 16) % 32
        cuts.append(float(i * 64 + j))
    cuts.append(float(N_BANDS * 64))
    return [(i, cuts[i], cuts[i + 1]) for i in range(N_BANDS)]


_BANDED_SQL_ROWS = ", ".join(
    f"({i}, CAST({lo} AS DOUBLE), CAST({hi} AS DOUBLE))"
    for i, lo, hi in _band_bounds()
)


@query(
    "join_range_banded",
    f"""
    WITH bands(band_id, lo, hi) AS (VALUES {_BANDED_SQL_ROWS}),
    u AS (
        SELECT l_extendedprice / l_quantity AS up FROM lineitem
    )
    SELECT b.band_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           MIN(u.up) AS min_up, MAX(u.up) AS max_up
    FROM u JOIN bands b ON u.up >= b.lo AND u.up < b.hi
    GROUP BY b.band_id
    """,
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 at scale: interval×point range join as a BANDED EQUI-join.

    ``join_range`` broadcasts a literal 4-row band table (BNLJ is fine
    there); this key runs the rewrite that survives a LARGE interval
    table: each interval is exploded to the power-of-two coarse buckets
    it overlaps (``sequence(floor(lo/W), floor(hi/W))`` — a constant
    fan-out for design-bounded interval widths), each probe value maps
    to ``floor(up/W)``, the join is EQUI on the bucket, and exact
    containment is a residual filter. W is a power of two so value/W is
    exact double scaling — the bucket of a value is bit-identical on
    every engine. Bands here are contiguous and non-overlapping
    (irregular md5-jittered boundaries), so each point matches exactly
    one interval and the output is linear in the probe side — the
    histogram/bracket-assignment workload. The oracle runs the direct
    range join (DuckDB IEJoin); a hash match proves the banded rewrite
    loses and duplicates nothing.

    tests/test_plans.py asserts NO BroadcastNestedLoopJoin in this plan.
    """
    prepare(spark)
    bands = spark.createDataFrame(
        _band_bounds(), "band_id int, lo double, hi double"
    )
    iv = bands.select(
        "band_id",
        "lo",
        "hi",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / BAND_W), F.floor(F.col("hi") / BAND_W)
            )
        ).alias("bucket"),
    )
    u = load(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("up")
    ).withColumn("bucket", F.floor(F.col("up") / BAND_W))
    return (
        u.join(iv.hint("shuffle_hash"), "bucket")
        .filter((F.col("up") >= F.col("lo")) & (F.col("up") < F.col("hi")))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min("up").alias("min_up"),
            F.max("up").alias("max_up"),
        )
    )
