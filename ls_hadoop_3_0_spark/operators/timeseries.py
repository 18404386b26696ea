"""Time-series operators over the ``events`` stream table — SURVEY.md §2.9 EXT.

The reference has no time-series surface at all (Hadoop MR is batch-only,
SURVEY §1.1); these keys supply the hypertable-style operations a
time-series user of the engine needs, on top of the same event-time
semantics as the §2.9 streaming keys:

- ``timeseries_resample`` — regularize an irregular event stream onto a
  fixed 1-hour grid per series (event_type), emitting explicit gap rows
  and forward-filling the last observed value across gaps (the
  ``LOCF`` / TimescaleDB ``time_bucket_gapfill + locf`` operation).
- ``timeseries_rollup``  — multi-resolution continuous-aggregate parity:
  hour and day grains of the same measure in ONE pass via GROUPING SETS
  (a hypertable rollup ladder without re-scanning the fact per grain).

Scale notes: the spine (bucket grid) grows with the TIME SPAN, not the
data volume — cross-joining it with the ≤5-row series dim is a broadcast
of metadata-scale rows, never a fact shuffle. The forward-fill window
partitions by series (bounded state per series, exactly the streaming
watermark state shape); the islands trick (running count of non-nulls)
keeps it a single window pass with no self-join. All value sums ride the
exact scaled-long accumulation (exprs.dsum) so the filled values are
bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.exprs import dsum, fmt_ts, sql_dsum
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import EVENTS_SQL, load


@query(
    "timeseries_resample",
    f"""
    WITH e AS (SELECT * FROM {EVENTS_SQL}),
    hourly AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
               COUNT(*) AS n, {sql_dsum('value')} AS sum_value
        FROM e GROUP BY 1, 2
    ),
    bounds AS (
        SELECT time_bucket(INTERVAL 1 HOUR, MIN(ts)) AS lo,
               time_bucket(INTERVAL 1 HOUR, MAX(ts)) AS hi
        FROM e
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds
    ),
    grid AS (
        SELECT s.bucket, t.event_type
        FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM e) t
    ),
    joined AS (
        SELECT g.bucket, g.event_type, h.n, h.sum_value
        FROM grid g LEFT JOIN hourly h
          ON h.bucket = g.bucket AND h.event_type = g.event_type
    ),
    islands AS (
        SELECT *,
               COUNT(sum_value) OVER (PARTITION BY event_type ORDER BY bucket
                                      ROWS UNBOUNDED PRECEDING) AS grp
        FROM joined
    )
    SELECT strftime(bucket, '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           MAX(sum_value) OVER (PARTITION BY event_type, grp) AS filled_value,
           (n IS NULL) AS is_gap
    FROM islands
    """,
)
def timeseries_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + LOCF resample of events onto a 1-hour grid per series.

    Plan shape: one aggregation of the fact (hourly), one metadata-scale
    spine (sequence over the [min,max] hour bounds — a 1-row aggregate
    exploded, never a collect), a broadcast grid join, and ONE window
    pass for the forward fill. The islands trick (running COUNT of
    non-null observations = island id, then MAX within island — the
    island's only non-null is its first row) is portable SQL, identical
    in both engines, and avoids ``last_value IGNORE NULLS`` dialect
    drift.
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            "event_type",
        ).agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bucket")
    )
    types = ev.select("event_type").distinct()
    # types is genuinely bounded (event-type vocabulary) — broadcast stays.
    # hourly is grid-sized: time_buckets × types grows with the stream's
    # time span, so it must not be statically broadcast (un-demotable at
    # scale); merge keeps it shuffle-bound and AQE re-broadcasts at
    # runtime when it is actually small.
    grid = spine.crossJoin(F.broadcast(types))
    joined = grid.join(hourly.hint("merge"), ["bucket", "event_type"], "left")
    run = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_grp = joined.withColumn("grp", F.count("sum_value").over(run))
    island = Window.partitionBy("event_type", "grp")
    return with_grp.select(
        fmt_ts("bucket").alias("win_start"),
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.max("sum_value").over(island).alias("filled_value"),
        F.col("n").isNull().alias("is_gap"),
    )


@query(
    "timeseries_rollup",
    f"""
    SELECT event_type,
           strftime(time_bucket(INTERVAL 1 DAY, ts), '%Y-%m-%d %H:%M:%S')
               AS day_bucket,
           strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
               AS hour_bucket,
           CASE WHEN time_bucket(INTERVAL 1 HOUR, ts) IS NULL
                THEN 'day' ELSE 'hour' END AS grain,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM {EVENTS_SQL} e
    GROUP BY GROUPING SETS (
        (event_type, time_bucket(INTERVAL 1 DAY, ts)),
        (event_type, time_bucket(INTERVAL 1 DAY, ts),
         time_bucket(INTERVAL 1 HOUR, ts))
    )
    """,
)
def timeseries_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-grain rollup: hour + day in one pass.

    GROUPING SETS computes both resolutions from a single scan with
    partial aggregation before the shuffle (Expand feeds one
    HashAggregate) — the continuous-aggregate ladder without one job
    per grain (the MR user runs N jobs; a naive SQL user runs N scans).
    The hour grain's rows carry their day bucket too, so a reader can
    roll hour→day without re-scanning. ``ts`` is never NULL in the
    fixture, so ``hour_bucket IS NULL`` marks the day-grain rows
    unambiguously.
    """
    prepare(spark)
    load(spark, sf_dir, "events").createOrReplaceTempView("_ts_events")
    from ls_hadoop_3_0_spark.exprs import SCALE

    return spark.sql(
        f"""
        SELECT event_type,
               date_format(date_trunc('DAY', ts), 'yyyy-MM-dd HH:mm:ss')
                   AS day_bucket,
               date_format(date_trunc('HOUR', ts), 'yyyy-MM-dd HH:mm:ss')
                   AS hour_bucket,
               CASE WHEN date_trunc('HOUR', ts) IS NULL
                    THEN 'day' ELSE 'hour' END AS grain,
               COUNT(*) AS n_events,
               SUM(CAST(round(value * {SCALE}) AS LONG)) / CAST({SCALE} AS DOUBLE)
                   AS sum_value
        FROM _ts_events
        GROUP BY GROUPING SETS (
            (event_type, date_trunc('DAY', ts)),
            (event_type, date_trunc('DAY', ts), date_trunc('HOUR', ts))
        )
        """
    )


@query(
    "scd2_history",
    f"""
    WITH e AS (SELECT * FROM {EVENTS_SQL}),
    o AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM e
    ),
    r AS (
        SELECT *,
               SUM(CASE WHEN prev IS NULL OR prev <> event_type
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS run_id
        FROM o
    ),
    runs AS (
        SELECT user_id, run_id, MIN(event_type) AS event_type,
               MIN(ts) AS valid_from, COUNT(*) AS n_events
        FROM r GROUP BY user_id, run_id
    ),
    hist AS (
        SELECT *,
               lead(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY run_id) AS valid_to
        FROM runs
    )
    SELECT user_id, event_type,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to,
           CAST(n_events AS BIGINT) AS n_events,
           (valid_to IS NULL) AS is_current
    FROM hist
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event log (CDC).

    Collapses each user's event stream into [valid_from, valid_to)
    intervals per run of equal event_type — the dimension-history build
    every warehouse derives from change events. Classic gaps-and-islands:
    lag to mark run starts, running SUM to number runs, one aggregate per
    run, lead for the closing edge (open runs get the 9999 sentinel and
    ``is_current``). Ties on ts break by event_id so run numbering is
    total-ordered and deterministic.

    100 TB: three window passes + one aggregate all partition on
    user_id — ONE shuffle (Catalyst reuses the (user_id) hash partitioning
    across the window/agg chain; lead's re-sort is within partitions).
    State per user is bounded by that user's events, the same per-key
    locality a streaming CDC pipeline has.
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    by_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(by_time).alias("prev"),
    )
    r = o.withColumn(
        "run_id",
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("prev") != F.col("event_type")), 1
            ).otherwise(0)
        ).over(by_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    runs = r.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    by_run = Window.partitionBy("user_id").orderBy("run_id")
    hist = runs.withColumn("valid_to", F.lead("valid_from").over(by_run))
    return hist.select(
        "user_id",
        "event_type",
        fmt_ts("valid_from").alias("valid_from"),
        F.coalesce(fmt_ts("valid_to"), F.lit("9999-12-31 00:00:00")).alias(
            "valid_to"
        ),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("valid_to").isNull().alias("is_current"),
    )


#: Truncated-EWMA depth and the exact power-of-two weights 2^-(j+1).
#: α = 1/2 is deliberate: scaling a double by a power of two never
#: rounds, so each weighted term is bit-exact on both engines and the
#: fixed left-to-right sum order does the rest.
EWMA_W = 8
_EWMA_WEIGHTS = [2.0 ** -(j + 1) for j in range(EWMA_W)]


def _ewma_sql() -> str:
    terms = [
        f"COALESCE(lag(x, {j}) OVER w, CAST(0 AS DOUBLE))"
        f" * CAST({w!r} AS DOUBLE)"
        for j, w in enumerate(_EWMA_WEIGHTS)
    ]
    return " + ".join(terms)


@query(
    "timeseries_ewma",
    f"""
    WITH e AS (SELECT * FROM {EVENTS_SQL}),
    hourly AS (
        SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS h,
               {sql_dsum('value')} AS x
        FROM e GROUP BY 1, 2
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           x,
           ({_ewma_sql()}) AS ewma8
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY h)
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-EXT exponentially-weighted moving average (truncated, tick-based).

    The signal-smoothing pass monitoring pipelines run on every metric
    series: per event type, the hourly exact-sum series and its EWMA
    over the last 8 OBSERVED buckets (tick-based semantics — gaps in
    the hour grid advance the window by observation, not wall time;
    the spine-densified variant composes with timeseries_resample).

    Why this is oracle-exact where a classic recursive EWMA is not:
    α = 1/2 makes every weight a power of two, and multiplying a double
    by 2^-k never rounds — so each lagged term is bit-identical on both
    engines, and the sum is written as the same fixed left-to-right
    chain (Python reduce ↔ SQL left-associative +). The recursive form
    s_t = αx + (1−α)s_{t−1} would compound rounding differently per
    engine; the truncated FIR form caps the window instead (tail weight
    2^-8 ≈ 0.4 %).

    Plan: one keyed aggregation (map-combined) + one per-type ordered
    window — state is 8 lags per series, corpus-size-independent; at
    100 TB the hourly table is (types × hours), time-span-scale.
    """
    prepare(spark)
    from functools import reduce

    hourly = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.window("ts", "1 hour").alias("win"))
        .agg(dsum("value").alias("x"))
        .select("event_type", F.col("win.start").alias("h"), "x")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    terms = [
        F.coalesce(F.lag("x", j).over(w), F.lit(0.0)) * F.lit(wt)
        for j, wt in enumerate(_EWMA_WEIGHTS)
    ]
    ewma = reduce(lambda a, b: a + b, terms)
    return hourly.select(
        "event_type",
        fmt_ts("h").alias("hour"),
        "x",
        ewma.alias("ewma8"),
    )


@query(
    "timeseries_seasonality",
    f"""
    WITH e AS (
        SELECT epoch_us(ts) AS us, value FROM {EVENTS_SQL}
    )
    SELECT (us // 86400000000 + 4) % 7 AS dow,
           (us // 3600000000) % 24 AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum('value')} AS sum_value,
           ({sql_dsum('value')} / COUNT(*)) AS avg_value
    FROM e GROUP BY 1, 2
    """,
)
def timeseries_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-EXT seasonal profile: day-of-week × hour-of-day activity grid.

    The capacity-planning/seasonality view behind every "is this load
    normal for a Tuesday 3 pm" question. Calendar fields are derived by
    PURE INTEGER arithmetic on epoch-µs (day index + 4 mod 7 → Sunday
    0; 1970-01-01 was a Thursday) — Spark's dayofweek and DuckDB's dow
    disagree on numbering conventions, and integer arithmetic removes
    the whole calendar-function surface, timezone included (UTC
    session). Sums ride the scaled-long path, the average is the
    composed exact division.

    Plan: one scan + one map-combined aggregation to a ≤168-row grid —
    flat at any corpus size.
    """
    prepare(spark)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = load(spark, sf_dir, "events").select(us.alias("us"), "value")
    return (
        e.select(
            F.expr("(us div 86400000000 + 4) % 7").alias("dow"),
            F.expr("(us div 3600000000) % 24").alias("hour"),
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
            (dsum("value") / F.count(F.lit(1))).alias("avg_value"),
        )
    )


@query(
    "timeseries_ohlc",
    f"""
    WITH e AS (
        SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
               ts, event_id, value
        FROM {EVENTS_SQL} e
    ),
    rn AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts, event_id) AS r_open,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts DESC, event_id DESC) AS r_close
        FROM e
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(CASE WHEN r_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN r_close = 1 THEN value END) AS close,
           {sql_dsum('value')} AS volume
    FROM rn
    GROUP BY event_type, bucket
    """,
)
def timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable OHLC downsample: per series × hour candlesticks.

    The financial/telemetry rollup (open/high/low/close/volume) the
    reference's batch jobs would need N passes for: ONE window pass
    (two row_numbers over the same (series, bucket) partitioning — one
    physical sort) + the grouped aggregation that reuses the identical
    partitioning, so the whole key is one shuffle. Open/close are
    tie-broken on (ts, event_id) — deterministic under duplicate
    timestamps; high/low/min/max of doubles are exact (no summation);
    volume rides dsum. Partitions are (series × hour)-bounded: window
    state never exceeds one bucket's events regardless of corpus size.
    """
    prepare(spark)
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type", "bucket")
    rn = e.select(
        "*",
        F.row_number()
        .over(w.orderBy("ts", "event_id"))
        .alias("r_open"),
        F.row_number()
        .over(w.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("r_close"),
    )
    return rn.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("r_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("r_close") == 1, F.col("value"))).alias("close"),
        dsum("value").alias("volume"),
    ).select(
        "event_type",
        fmt_ts("bucket").alias("win_start"),
        "n_events",
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


@query(
    "attribution_last_touch",
    f"""
    WITH e AS (SELECT * FROM {EVENTS_SQL}),
    p AS (
        SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
        FROM e WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, event_id AS click_id, ts AS c_ts
        FROM e WHERE event_type = 'click'
    ),
    touched AS (
        SELECT p.purchase_id, p.value,
               MAX(CASE WHEN c.c_ts IS NOT NULL THEN 1 ELSE 0 END)
                   AS attributed,
               MAX(c.c_ts) AS last_click_ts
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.c_ts <= p.p_ts
         AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
        GROUP BY p.purchase_id, p.value
    )
    SELECT COALESCE(CAST(hour(last_click_ts) AS BIGINT), -1) AS touch_hour,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           {sql_dsum('value')} AS attributed_value
    FROM touched
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing last-touch attribution: purchase → latest click ≤1 h before.

    The as-of-join (J9) applied to the event stream: each purchase is
    attributed to its user's most recent click inside a 1-hour lookback
    (unattributed purchases land in the -1 bucket). The banded LEFT
    join is the streaming interval-join shape (both sides keyed on
    user_id, the band bounds per-user state); the MAX-per-purchase
    collapse replaces an ORDER BY...LIMIT 1 per row — one shuffle on
    user_id, one on purchase_id, aggregation output bounded by 25
    hour-buckets.
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    touched = (
        p.join(
            c,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ts") <= F.col("p_ts"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        .groupBy("purchase_id", "value")
        .agg(
            F.max(F.col("c_ts").isNotNull().cast("int")).alias("attributed"),
            F.max("c_ts").alias("last_click_ts"),
        )
    )
    return (
        touched.groupBy(
            F.coalesce(F.hour("last_click_ts").cast("long"), F.lit(-1)).alias(
                "touch_hour"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("value").alias("attributed_value"),
        )
    )


#: Point-in-time snapshot instant for scd2_asof_snapshot (mid-range of
#: the fixture's one-month event window; a drifted fixture simply moves
#: how many users have state by then — the key stays valid).
ASOF_T = "2024-01-15 00:00:00"


@query(
    "scd2_asof_snapshot",
    f"""
    WITH e AS (SELECT * FROM {EVENTS_SQL}),
    latest AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM e WHERE ts <= TIMESTAMP '{ASOF_T}'
    )
    SELECT event_type AS state,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS oldest_state_ts,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS newest_state_ts
    FROM latest WHERE rn = 1
    GROUP BY event_type
    """,
)
def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC point-in-time query: reconstruct per-user state AS OF an instant.

    The read side of ``scd2_history``: a user's state at T is their
    latest change event ≤ T (ties broken by event_id — same total order
    the history build uses), summarized per state. This is the query a
    warehouse answers from SCD2 intervals with ``valid_from ≤ T <
    valid_to``; deriving it straight from the event log proves the two
    formulations agree without materializing the interval table.

    Plan: pushed ts predicate → one (user_id)-keyed window (bounded per
    user) → state-vocabulary-sized aggregation. One shuffle.
    """
    prepare(spark)
    e = load(spark, sf_dir, "events").filter(
        F.col("ts") <= F.lit(ASOF_T).cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return latest.groupBy(F.col("event_type").alias("state")).agg(
        F.count(F.lit(1)).alias("n_users"),
        fmt_ts(F.min("ts")).alias("oldest_state_ts"),
        fmt_ts(F.max("ts")).alias("newest_state_ts"),
    )
