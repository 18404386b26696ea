"""Event-time windowed analytics — SURVEY.md §2.9 (EXT streaming surface).

The reference is batch-only (Hadoop Streaming = piping rows through
processes, not event-time processing); the driver assigns the streaming
role to Spark. Strategy per SURVEY §2.9: each capability is a
batch-equivalent DataFrame query (identical time-bucket semantics, DuckDB
oracle-checkable) — Structured Streaming incrementalizes the *same*
logical plan; streaming/demo.py runs the genuine ``readStream`` versions
with watermarks.

Scale notes: tumbling/sliding use Spark's native ``window()`` (generates
≤2 rows per event for the 2× slide — no cross join); sessionization is
``session_window`` (streaming-native state merge); the funnel is one
shuffle on user_id. All aggregation sums go through decimals
(registry.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.exprs import dsum, fmt_ts, sql_dsum
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import EVENTS_SQL, load


@query(
    "stream_tumbling",
    f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM {EVENTS_SQL} e
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 tumbling window: 1-hour buckets × event_type."""
    prepare(spark)
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            fmt_ts(F.col("w.start")).alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    f"""
    SELECT strftime(time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM {EVENTS_SQL} e CROSS JOIN (SELECT unnest([0, 1]) AS k)
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 sliding window: 1-hour length, 30-minute slide (2 windows/event).

    Oracle mirror: every ts belongs to exactly the two windows starting at
    trunc30(ts) and trunc30(ts)−30min.
    """
    prepare(spark)
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(fmt_ts(F.col("w.start")).alias("win_start"), "n_events", "sum_value")
    )


@query(
    "stream_session",
    f"""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM {EVENTS_SQL} e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    islands AS (
        -- Tie-stable ORDER BY (ts, event_id): with duplicate timestamps
        -- an arbitrary tie order here can place peers of the session's
        -- first event "before" it and leak them into the previous
        -- session (found on a corpus with duplicated ts).
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, session_no
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 session window: 30-minute gap sessionization per user.

    Spark uses the native ``session_window`` operator (same state-merge
    the streaming engine runs); the oracle is the classic gaps-and-islands
    rewrite. Spark's session end = last event + gap, mirrored in SQL.
    Boundary parity (verified empirically on a 1M-event corpus with 3
    exact-gap collisions): Spark MERGES a gap of exactly 30min — its
    merge condition is inclusive (next.start ≤ current.end) — so the
    island rule is strict: new session only when gap > 30min.
    """
    prepare(spark)
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            fmt_ts(F.col("w.start")).alias("session_start"),
            fmt_ts(F.col("w.end")).alias("session_end"),
            "n_events",
        )
    )


@query(
    "stream_dedup",
    f"""
    SELECT user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts,
           event_id AS first_event_id
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
        FROM {EVENTS_SQL} e)
    WHERE rn = 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 streaming dedup: deterministic keep-first per (user, event_type).

    The batch-deterministic form of ``dropDuplicatesWithinWatermark``
    (which keeps the first *arrival*; here first by event time, tie-broken
    by event_id). event_id itself is unique in the fixture, so the
    interesting key is the composite.
    """
    prepare(spark)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            fmt_ts("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
        )
    )


@query(
    "stream_interval_join",
    f"""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_sec
    FROM {EVENTS_SQL} p JOIN {EVENTS_SQL} c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-EXT stream-stream interval join: clicks within 1h before a purchase.

    Batch-equivalent of Structured Streaming's event-time interval join
    (two watermarked streams, time-band condition — the real ``readStream``
    twin runs in tests/test_streaming.py and must emit identical rows).
    The plan is an equi-join on ``user_id`` with the band as a post-join
    filter: one shuffle, no theta-join blowup — per-user click×purchase
    products are bounded by the band, and at 100 TB the watermark bounds
    streaming state to one hour of per-user clicks.

    ``lag_sec`` is the whole-second boundary count (Spark
    ``unix_timestamp`` floor-difference == DuckDB ``date_diff('second')``).
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            fmt_ts("p_ts").alias("purchase_ts"),
            fmt_ts("c_ts").alias("click_ts"),
            (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("lag_sec"),
        )
    )


@query(
    "stream_funnel",
    f"""
    WITH stages AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM {EVENTS_SQL} e GROUP BY user_id
    )
    SELECT user_id,
           (t_signup IS NOT NULL) AS did_signup,
           (t_signup IS NOT NULL AND t_click IS NOT NULL
            AND t_click >= t_signup) AS clicked_after_signup,
           (t_signup IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL
            AND t_click >= t_signup AND t_purchase >= t_click)
               AS purchased_after_click
    FROM stages
    """,
)
def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 funnel: signup → click → purchase stage flags per user timeline."""
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = ev.groupBy("user_id").agg(
        stage("signup").alias("t_signup"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    sgn, clk, pur = F.col("t_signup"), F.col("t_click"), F.col("t_purchase")
    return stages.select(
        "user_id",
        sgn.isNotNull().alias("did_signup"),
        (sgn.isNotNull() & clk.isNotNull() & (clk >= sgn)).alias("clicked_after_signup"),
        (
            sgn.isNotNull()
            & clk.isNotNull()
            & pur.isNotNull()
            & (clk >= sgn)
            & (pur >= clk)
        ).alias("purchased_after_click"),
    )


@query(
    "stream_changelog",
    f"""
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
           value AS last_value
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
        FROM {EVENTS_SQL}
    ) WHERE rn = 1
    """,
)
def stream_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-EXT changelog compaction: latest event per user (keyed state).

    The batch twin of a streaming materialized view: one shuffle on the
    key, per-partition ordered pick of the newest row (event_id breaks
    timestamp ties deterministically). The incremental version —
    ``foreachBatch`` merging each micro-batch's per-key maximum into a
    keyed store — is driven in tests/test_streaming.py and must land on
    this exact table. At 100 TB state is O(|keys|), not O(stream).
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "event_type",
            fmt_ts("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


@query(
    "stream_top_users",
    f"""
    WITH agg AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win, user_id,
               {sql_dsum('value')} AS sum_value, COUNT(*) AS n_events
        FROM {EVENTS_SQL} e GROUP BY 1, 2
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY win
                                     ORDER BY sum_value DESC, user_id) AS rn
        FROM agg
    )
    SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS win_start,
           user_id, sum_value, n_events
    FROM r WHERE rn <= 3
    """,
)
def stream_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-EXT windowed leaderboard: top-3 users by value per event-hour.

    Composite of the windowed-aggregation and top-n-per-group shapes:
    one shuffle for the (window, user) aggregate (map-side partial), one
    for the per-window rank — both keyed, both bounded. The ordering
    column is a deterministic dsum double with user_id as tie-break, so
    the leaderboard is stable across engines and partitionings. In
    Structured Streaming this materializes per closed window
    (watermark + append), same plan.
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "user_id")
        .agg(dsum("value").alias("sum_value"), F.count(F.lit(1)).alias("n_events"))
    )
    w = Window.partitionBy("win").orderBy(F.col("sum_value").desc(), "user_id")
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            fmt_ts(F.col("win.start")).alias("win_start"),
            "user_id",
            "sum_value",
            "n_events",
        )
    )


#: Watermark late-drop model (T4). Arrival jitter is a pure function of
#: event_id so both engines derive the identical arrival sequence: the
#: md5-prefix rule (sample_hash mechanics) sends 13/256 ≈ 5.1% of events
#: down the delayed path, each by a multiplicative-hash 60..7259 s; the
#: watermark allows 10 min of lateness. All time arithmetic runs in
#: epoch-microsecond BIGINTs — no interval/timezone surface anywhere.
LATE_HEX = "0d"
LATE_DELAY_US = "(((event_id % 9973) * 7919) % 7200 + 60) * 1000000"
LATE_WM_US = 600 * 1_000_000
_CHUNK_US = 3_600_000_000  # 1 h of arrival time per running-max chunk


@query(
    "stream_late_drop",
    f"""
    WITH a AS (
        SELECT event_id, ts, value, epoch_us(ts) AS ts_us,
               epoch_us(ts)
                   + CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 2)
                               < '{LATE_HEX}'
                          THEN {LATE_DELAY_US} ELSE 0 END AS arr_us
        FROM {EVENTS_SQL} e
    ),
    r AS (
        SELECT ts, ts_us, value,
               COALESCE(MAX(ts_us) OVER (
                   ORDER BY arr_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                   AS wm
        FROM a
    ),
    f AS (
        SELECT ts, value,
               (wm >= 0 AND ts_us < wm - {LATE_WM_US}) AS late
        FROM r
    )
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
               AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late_dropped,
           CAST(SUM(CASE WHEN NOT late THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           (CAST(SUM(CASE WHEN NOT late
                          THEN CAST(round(value * 1000000) AS BIGINT)
                          ELSE 0 END) AS DOUBLE) / 1000000.0)
               AS sum_value_kept
    FROM f GROUP BY 1
    """,
)
def stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 watermark/late data: deterministic batch twin of the drop rule.

    The genuine ``withWatermark`` demos (streaming/demo.py) exercise the
    runtime; this key pins the SEMANTICS with an oracle: an event is
    dropped iff its event time is older than (max event time seen over
    all earlier ARRIVALS) minus the allowed lateness — Structured
    Streaming's watermark in the per-row limit (the engine's actual
    per-microbatch watermark retains a superset of these rows, so this
    is the conservative contract a pipeline must tolerate). Arrival
    order is simulated with deterministic per-event jitter (constants
    above) since the fixture generates events already time-ordered.

    Plan shape — the running max over arrival order is NOT a global
    single-partition window: arrivals are chunked into hours, a
    metadata-scale chunk table (time-span rows: 8.8k/year at ANY corpus
    size) carries the cross-chunk prefix max, and the per-row max runs
    inside each chunk partition. The chunk join carries no static
    broadcast (time-span-scale side — AQE decides); one shuffle keyed
    on chunk, one for the final hour×agg. At 100 TB this is the same
    2-shuffle budget as stream_tumbling plus the chunk-prefix pass.
    """
    prepare(spark)
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "value")
    # µs-fixture ts arrives TIMESTAMP_NTZ; under prepare()'s UTC session
    # the TIMESTAMP cast is wall-clock-identity, and unix_micros needs it.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    delayed = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < LATE_HEX
    a = ev.select(
        "event_id",
        "ts",
        "value",
        us.alias("ts_us"),
        (us + F.when(delayed, F.expr(LATE_DELAY_US)).otherwise(F.lit(0))).alias(
            "arr_us"
        ),
    ).withColumn("chunk", F.expr(f"arr_us DIV {_CHUNK_US}"))
    cmax = a.groupBy("chunk").agg(F.max("ts_us").alias("cmax"))
    wprev = Window.orderBy("chunk").rowsBetween(Window.unboundedPreceding, -1)
    pre = cmax.select("chunk", F.max("cmax").over(wprev).alias("pmax"))
    win = (
        Window.partitionBy("chunk")
        .orderBy("arr_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = a.join(pre, "chunk", "left").withColumn(
        "wm",
        F.greatest(
            F.coalesce(F.max("ts_us").over(win), F.lit(-1).cast("long")),
            F.coalesce(F.col("pmax"), F.lit(-1).cast("long")),
        ),
    )
    late = (F.col("wm") >= 0) & (F.col("ts_us") < F.col("wm") - F.lit(LATE_WM_US))
    kept_q = F.when(~late, F.round(F.col("value") * 1_000_000).cast("long")).otherwise(
        F.lit(0)
    )
    return (
        r.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(late.cast("long")).alias("n_late_dropped"),
            F.sum((~late).cast("long")).alias("n_kept"),
            (F.sum(kept_q) / F.lit(1_000_000.0)).alias("sum_value_kept"),
        )
        .select(
            fmt_ts(F.col("w.start")).alias("win_start"),
            "n_events",
            "n_late_dropped",
            "n_kept",
            "sum_value_kept",
        )
    )
