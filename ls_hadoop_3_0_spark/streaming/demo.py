"""Genuine Structured Streaming demos — SURVEY.md §2.9 T4/T6.

Not registered as driver query keys (a running stream can't be DuckDB-
oracled; its *logic* is — the batch twins live in batch_equiv.py). These
run the same plans through ``readStream`` with watermarks to prove the
incremental path works; tests/test_streaming.py drives them to completion
synchronously with a file source + memory sink.

Scale notes: file source here stands in for Kafka; watermark bounds state
(late events beyond 1 hour are dropped), so state size is
O(active windows × keys), not O(stream length). ``availableNow`` triggers
batch-incremental catch-up — the pattern for backfilling 100 TB of
history through the same streaming query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.exprs import dsum
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

#: Schema for tests that synthesize their own int64-NANOS event files
#: (the watermark/changelog tests write raw nanos and truncate to µs
#: themselves). The real fixture reader below does NOT assume this —
#: current driver fixtures store ts as TIMESTAMP(µs) (FIXTURES.md).
EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture.

    The file source wants a *directory* (new files appearing = new
    micro-batches); the single fixture file is staged into a scratch dir.

    The stream schema is taken from a batch read of the staged file — the
    same arrival types ``tables.load`` sees — and ``ts`` is normalized
    exactly like the batch path: converted from int64 nanos only when it
    actually arrives as long (under ``nanosAsLong`` with a NANOS fixture),
    passed through untouched when the fixture already stores µs
    timestamps. Hardcoding either unit breaks when the driver regenerates
    fixtures with the other one.
    """
    prepare(spark)
    import os
    import shutil

    from pyspark.sql import types as T

    src = f"{sf_dir}/events.parquet"
    if os.path.isdir(src):
        # Spark-written fixture (test scratch dirs): already a directory
        # — the file source can read it in place, no staging needed.
        stage = src
    else:
        tag = os.path.basename(os.path.normpath(sf_dir))
        stage = f"/root/repo/.scratch/{tag}/stream_events_src"
        os.makedirs(stage, exist_ok=True)
        dst = f"{stage}/events.parquet"
        # Re-stage whenever the source fixture changed (driver
        # regenerations can swap size AND unit) — a stale staged copy
        # would silently feed the stream different data than the batch
        # twins read. copy2 preserves mtime so the freshness check is
        # stable across runs.
        st = os.stat(src)
        if (
            not os.path.exists(dst)
            or os.path.getsize(dst) != st.st_size
            or os.path.getmtime(dst) != st.st_mtime
        ):
            shutil.copy2(src, dst)
    arrival = spark.read.parquet(stage).schema
    raw = spark.readStream.schema(arrival).format("parquet").load(stage)
    if isinstance(arrival["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(arrival["ts"].dataType, T.TimestampNTZType):
        # Watermarks require TIMESTAMP (LTZ); the fixture is tz-naive.
        # Under the pinned UTC session timezone this cast is value-identity.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts_stream(events: DataFrame) -> DataFrame:
    """T1+T4: watermarked tumbling-window aggregation (append-able)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_stream(events: DataFrame) -> DataFrame:
    """T3+T6: watermarked session windows (native streaming state merge)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame) -> DataFrame:
    """T5: streaming dedup on the unique event_id within the watermark."""
    return events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def interval_join_stream(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """T-EXT: genuine stream-stream event-time interval join.

    Both sides watermarked (the engine derives per-side state retention
    from the watermark + band: clicks older than purchase-watermark − 1 h
    are evicted). Inner join ⇒ rows emit as soon as both sides arrive;
    the batch twin is ``batch_equiv.stream_interval_join``.
    """
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
        )
    )
    c = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    return p.join(
        c,
        F.expr(
            "user_id = c_user_id AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"
        ),
    ).select("user_id", "purchase_id", "click_id", "p_ts", "c_ts")


def interval_join_outer_stream(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """T-EXT: LEFT-OUTER watermarked stream-stream interval join (r14).

    The null-emission-on-expiry semantics (VERDICT r13 missing #5 — the
    CDC/attribution shape): a purchase with no qualifying click within
    its 1 h look-back emits (purchase, NULL click) once the CLICK-side
    watermark passes the join window, i.e. the engine has proven no
    matching click can still arrive. Same sides, same band and
    watermarks as interval_join_stream; only the join type differs.
    Unmatched rows need a post-drain watermark advance to flush — the
    caller must drive the stream with the zero-interval
    processing-time trigger + far-future sentinel pattern
    (availableNow snapshots strand them, the r10/r11 lesson).
    """
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
        )
    )
    c = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    return p.join(
        c,
        F.expr(
            "user_id = c_user_id AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts <= p_ts"
        ),
        "leftOuter",
    ).select("user_id", "purchase_id", "click_id", "p_ts", "c_ts")


def stateful_user_totals_stream(events: DataFrame) -> DataFrame:
    """T6 custom stateful operator via ``applyInPandasWithState``.

    Per-user running (count, value-sum) state carried across
    micro-batches — the arbitrary-state analog of an MR reducer that
    keeps per-key state, incrementalized. State is two numbers per user:
    O(|users|) memory, watermark-free because the state never expires in
    this demo (production would add a timeout conf).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, batches, state):
        import pandas as pd

        total_n, total_v = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            total_n += len(pdf)
            total_v += float(pdf["value"].sum())
        state.update((total_n, total_v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [total_n], "sum_value": [total_v]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n bigint, v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_totals_tws(
    events: DataFrame, time_mode: str = "None"
) -> DataFrame:
    """T6 twin on the Spark 4.x-preferred API: ``transformWithStateInPandas``.

    Same per-user running (count, value-sum) state as
    ``stateful_user_totals_stream``, expressed as a ``StatefulProcessor``
    — the API that adds typed state (value/list/map), timers, and state
    schema evolution over ``applyInPandasWithState``'s single tuple.
    Requires the RocksDB state store provider (set here, runtime-settable)
    and — at RUNTIME only — the ``protobuf`` package, which this container
    does not ship; plan construction and analysis need neither, and the
    executable path is covered by tests/test_streaming.py whenever
    ``google.protobuf`` is importable (importorskip otherwise).
    """
    import pandas as pd

    from ls_hadoop_3_0_spark import vendor

    # r8: the container-no-protobuf limitation is gone — the vendored
    # wire-compatible shim (vendor/pyshims) is activated for the driver
    # AND shipped to every python worker, so the micro-batch leg runs.
    vendor.ensure_protobuf(events.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, v DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, v = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                v += float(pdf["value"].sum())
            self._totals.update((n, v))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [v]}
            )

        def close(self) -> None:
            pass

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # The wrapper rides inside the pickled UDF payload, so the shim
    # reaches even the JVM-spawned driver-side streaming worker that a
    # foreign session's env can't (vendor.tws_protobuf_shim docstring).
    with vendor.tws_protobuf_shim():
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserTotals(),
            outputStructType="user_id long, n_events long, sum_value double",
            outputMode="Update",
            # "None" for the pure running-total demo; "ProcessingTime"
            # enables registerTimer for TTL-style state expiry — the
            # plan-level twin asserts BOTH configs analyze correctly.
            timeMode=time_mode,
        )


def stateful_user_totals_tws_exact(events: DataFrame) -> DataFrame:
    """T6 in the ORACLE-EXACT form backing ``stream_batch_equiv_stateful``.

    Same transformWithStateInPandas shape as stateful_user_totals_tws,
    but every number that crosses the state boundary is an INTEGER: the
    stream pre-quantizes value → round(value·1e6) as BIGINT (the dsum
    invariant, computed by Spark so both engines share its rounding),
    and the processor accumulates (n, scaled_sum) as int64 — no float
    ever enters python, so the totals are bit-identical to the batch
    twin and the DuckDB oracle regardless of batch split or row order.
    """
    import pandas as pd

    from ls_hadoop_3_0_spark import vendor
    from ls_hadoop_3_0_spark.exprs import SCALE

    vendor.ensure_protobuf(events.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ExactTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, sv BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, sv = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    sv += int(pdf["sv"].sum())  # int64 sum — exact
            self._totals.update((n, sv))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sv": [sv]}
            )

        def close(self) -> None:
            pass

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = events.select(
        "user_id",
        F.round(F.col("value") * F.lit(SCALE)).cast("long").alias("sv"),
    )
    with vendor.tws_protobuf_shim():
        return stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=ExactTotals(),
            outputStructType="user_id long, n_events long, sv long",
            outputMode="Update",
            timeMode="None",
        )


def stateful_user_listmap_tws(events: DataFrame) -> DataFrame:
    """T6 through ListState AND MapState, oracle-exact (integer-only).

    The streaming top-k-per-key + per-key-category-counts pattern: each
    user's top-3 scaled event values live in a ListState (appendValue on
    arrival, pruned back to 3 with the ListStatePut arm — bounded state
    regardless of stream length), per-event-type counts in a MapState
    (containsKey/getValue/updateValue/keys/values arms). This drives the
    state-server protocol surface the ValueState demos never touch —
    list iterators, AppendList/Put, MapStateCall — through the vendored
    shim, as a STAMPABLE query (stream_batch_equiv_stateful_listmap),
    not just the unit test.

    Integer-only state (pre-quantized sv longs, int counts) keeps every
    emission bit-equal to the batch recompute under ANY micro-batch
    split; n_events is strictly monotone per user, so the sink's final
    row per user is max(struct(n_events, ...)).
    """
    import pandas as pd

    from ls_hadoop_3_0_spark import vendor
    from ls_hadoop_3_0_spark.exprs import SCALE

    vendor.ensure_protobuf(events.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ListMap(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getListState("top_vals", "sv BIGINT")
            self._counts = handle.getMapState(
                "type_counts", "event_type STRING", "n BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            # State chatter is bounded per (key, batch) — O(event types),
            # never O(rows): only a batch's own top-3 can enter the
            # global top-3 (appendList once), and per-type counts are
            # pre-reduced with value_counts before the MapState calls.
            # (The per-row appendValue/updateValue arms are exercised by
            # tests/test_streaming.py's protocol test.)
            for pdf in rows:
                if len(pdf):
                    self._last.appendList(
                        [(int(v),) for v in pdf["sv"].nlargest(3)]
                    )
                    for et, c in pdf["event_type"].value_counts().items():
                        prev = (
                            self._counts.getValue((et,))[0]
                            if self._counts.containsKey((et,))
                            else 0
                        )
                        self._counts.updateValue((et,), (prev + int(c),))
            top3 = sorted(v[0] for v in self._last.get())[-3:]
            self._last.put([(v,) for v in top3])  # prune: bounded state
            n_types = sum(1 for _ in self._counts.keys())
            n_events = sum(n for (n,) in self._counts.values())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n_events],
                    "n_types": [n_types],
                    "top3_sum": [sum(top3)],
                }
            )

        def close(self) -> None:
            pass

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = events.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * F.lit(SCALE)).cast("long").alias("sv"),
    )
    with vendor.tws_protobuf_shim():
        return stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=ListMap(),
            outputStructType=(
                "user_id long, n_events long, n_types long, top3_sum long"
            ),
            outputMode="Update",
            timeMode="None",
        )


def stateful_user_totals_rows_tws(events: DataFrame) -> DataFrame:
    """T6 through the ROW-BASED ``transformWithState`` API (no pandas).

    Same integer-exact totals as stateful_user_totals_tws_exact, but
    the processor receives ``Iterator[Row]`` and yields ``Row``s —
    PythonEvalType SQL_TRANSFORM_WITH_STATE_PYTHON_ROW_UDF, the API rung
    Spark 4 offers when per-group logic is row-at-a-time anyway and the
    pandas batch layer is pure overhead. Exercises the same state-server
    protocol through the vendored protobuf shim (row mode instantiates
    the SAME TransformWithStateInPandasUdfUtils the shim wraps).
    """
    from pyspark.sql import Row

    from ls_hadoop_3_0_spark import vendor
    from ls_hadoop_3_0_spark.exprs import SCALE

    vendor.ensure_protobuf(events.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ExactTotalsRows(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, sv BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, sv = self._totals.get() if self._totals.exists() else (0, 0)
            for row in rows:
                n += 1
                sv += int(row.sv)  # pre-quantized long — exact
            self._totals.update((n, sv))
            yield Row(user_id=key[0], n_events=n, sv=sv)

        def close(self) -> None:
            pass

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = events.select(
        "user_id",
        F.round(F.col("value") * F.lit(SCALE)).cast("long").alias("sv"),
    )
    with vendor.tws_protobuf_shim():
        return stream.groupBy("user_id").transformWithState(
            statefulProcessor=ExactTotalsRows(),
            outputStructType="user_id long, n_events long, sv long",
            outputMode="Update",
            timeMode="None",
        )


def stateful_user_totals_ttl_tws(events: DataFrame) -> DataFrame:
    """T6 with EXECUTED timers: TTL-style flush-on-expiry (r9 verdict #3).

    The state-expiry pattern real sessionization needs at 100 TB to
    bound state: every batch the processor accumulates integer totals
    per user AND ``registerTimer``s an already-expired processing-time
    timer; when the timer fires (next micro-batch — ProcessingTime
    timeMode keeps batches coming even after the source drains),
    ``handleExpiredTimer`` FLUSHES the frozen totals as an output row
    and clears the state. Each event is therefore counted in exactly
    one flush — per-user SUMS over the flush rows are invariant to how
    the trigger splits batches, which is what keeps the key
    oracle-exact despite wall-clock timers being nondeterministic.

    Integer-only state (pre-quantized sv longs, the dsum invariant):
    no float crosses the python state boundary.
    """
    import pandas as pd

    from ls_hadoop_3_0_spark import vendor
    from ls_hadoop_3_0_spark.exprs import SCALE

    vendor.ensure_protobuf(events.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TtlFlush(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._totals = handle.getValueState("totals", "n BIGINT, sv BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, sv = self._totals.get() if self._totals.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    sv += int(pdf["sv"].sum())  # int64 sum — exact
            self._totals.update((n, sv))
            # Already-expired: fires at the next micro-batch boundary.
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() - 1
            )
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # Flush exactly the unflushed events; absent state (already
            # flushed, no new data) emits nothing — so late duplicate
            # timers are harmless and every event lands in ONE flush.
            if self._totals.exists():
                n, sv = self._totals.get()
                self._totals.clear()
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n": [n], "sv": [sv]}
                )

        def close(self) -> None:
            pass

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = events.select(
        "user_id",
        F.round(F.col("value") * F.lit(SCALE)).cast("long").alias("sv"),
    )
    with vendor.tws_protobuf_shim():
        return stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=TtlFlush(),
            outputStructType="user_id long, n BIGINT, sv BIGINT",
            outputMode="Append",
            timeMode="ProcessingTime",
        )


#: Event-time flush gap for the ET-timer demo (ms): a user's flush
#: timer sits at its max event ts + GAP and fires only when the
#: WATERMARK passes it — never on wall clock.
ET_TIMER_GAP_MS = 60_000


def stateful_user_totals_et_tws(stream: DataFrame, delay: str = "10 seconds") -> DataFrame:
    """T6 with EVENT-TIME timers: watermark-driven flush (r10 verdict #4).

    The last T6 rung after r10's executed ProcessingTime timers: real
    sessionization expires state on EVENT time so late data can still
    extend a session. The processor accumulates integer totals per user
    and ``registerTimer``s at (max event ts in this batch + GAP) — an
    EVENT-time stamp; ``timeMode="EventTime"`` makes expiry a function
    of the WATERMARK (derived from ``withWatermark(ts, delay)``), not
    wall clock. A timer fires only in a micro-batch whose watermark has
    passed it, which a drained source alone never provides — the caller
    advances the watermark with a far-future sentinel event whose own
    timer stays beyond the final watermark (so it never flushes itself).
    tests/test_streaming.py pins the semantics: zero flushes while wall
    clock passes with a stalled watermark, then exactly the users whose
    timers sit below each sentinel's watermark.

    Flush-on-expiry clears state, so each event lands in exactly ONE
    flush row and per-user SUMS over flushes are split-invariant —
    oracle-exact despite nondeterministic batch boundaries (the TTL-key
    rule). Integer-only state: pre-quantized ``sv`` longs and epoch-ms
    ``tsm`` longs; no float crosses the python state boundary.

    ``stream``: (user_id long, sv long, ts timestamp) — quantized by
    the caller.
    """
    import pandas as pd

    from ls_hadoop_3_0_spark import vendor

    vendor.ensure_protobuf(stream.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EtFlush(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._totals = handle.getValueState("totals", "n BIGINT, sv BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n, sv = self._totals.get() if self._totals.exists() else (0, 0)
            mx = None
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    sv += int(pdf["sv"].sum())  # int64 sum — exact
                    m = int(pdf["tsm"].max())
                    mx = m if mx is None else max(mx, m)
            self._totals.update((n, sv))
            if mx is not None:
                # EVENT-time stamp: fires when the watermark passes it.
                self._handle.registerTimer(mx + ET_TIMER_GAP_MS)
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # Flush exactly the unflushed events; absent state (already
            # flushed by an earlier timer of this key) emits nothing —
            # duplicate timers are harmless, every event lands in ONE
            # flush.
            if self._totals.exists():
                n, sv = self._totals.get()
                self._totals.clear()
                yield pd.DataFrame({"user_id": [key[0]], "n": [n], "sv": [sv]})

        def close(self) -> None:
            pass

    events = stream.sparkSession
    events.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    wm = stream.withWatermark("ts", delay).select(
        "user_id", "sv", "ts", F.unix_millis("ts").alias("tsm")
    )
    with vendor.tws_protobuf_shim():
        return wm.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=EtFlush(),
            outputStructType="user_id long, n BIGINT, sv BIGINT",
            outputMode="Append",
            timeMode="EventTime",
        )


#: Session gap for the event-time sessionization rung: 6 h of event
#: time — the sf0.01 fixture then yields ~5.7k sessions of which ~2.4k
#: are multi-event (measured), so the gap rule is genuinely exercised.
SESSION_ET_GAP_MS = 21_600_000


def stateful_sessions_et_tws(
    stream: DataFrame, gap_ms: int = SESSION_ET_GAP_MS, delay: str = "10 seconds"
) -> DataFrame:
    """T6 capstone: event-time SESSION-GAP windows in transformWithState.

    True sessionization — the workload event-time timers exist for:
    state per user is the list of NOT-YET-FLUSHED gap-ISLANDS
    (ListState of (s, l, n, sv) — r13: each micro-batch's events are
    pre-sessionized locally before entering state, so state-server
    writes scale with islands, not events; the extent-merge equivalence
    proof lives on the processor class). Sessionization is DEFERRED to
    flush time, which is what makes emission split-invariant: whenever
    a timer fires, the handler merges the retained islands (successor
    gap >= gap_ms starts a new session — exactly Spark's
    ``session_window`` rule), and emits ONLY the sessions whose end
    (last event + gap) the WATERMARK has passed. No later event can
    change an emitted session: extending it would need ts < end <= wm,
    which the watermark filter already dropped. Sessions that are still
    open stay in state; the user's LAST input-side timer (max batch ts
    + gap) is >= every session end, so the far-future sentinel's final
    watermark flushes everything real — no timer re-registration needed
    in the expiry handler.

    Integer-only state (epoch-ms + pre-quantized sv longs); every sink
    row is produced by the timer path; per-session rows each appear
    exactly once, so the digest over them is batch-split-invariant and
    oracle-exact (gaps-and-islands in DuckDB, ``session_window`` as the
    in-session batch twin).

    ``stream``: (user_id long, sv long, ts timestamp).
    """
    import pandas as pd

    from ls_hadoop_3_0_spark import vendor

    vendor.ensure_protobuf(stream.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EtSessions(StatefulProcessor):
        # r13 (VERDICT r12 item 5): state rows are PRE-SESSIONIZED
        # intra-batch ISLANDS (s, l, n, sv) = (first event ts, last
        # event ts, count, value sum), not raw events — the input path
        # closes each micro-batch's gap-islands locally and appendList's
        # only those, cutting state-server writes from n_events to
        # n_islands with NO reads added on the input path. Extent-merge
        # at flush is EXACTLY event-grain sessionization: islands are
        # internally valid (every adjacent gap < gap_ms), island minima/
        # maxima are real events, and for start-sorted islands A, B
        # either B.s − A.l < gap_ms (two real events < gap apart ⇒ the
        # union is one island — an event landing INSIDE an island splits
        # an adjacent pair ti, ti+1 whose gap t−ti, ti+1−t both stay
        # < gap_ms) or B.s − A.l ≥ gap_ms (no event lies between A.l
        # and B.s, so the gap is real). Split-invariance is unchanged:
        # emission stays timer-path-only under the watermark rule.
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._isl = handle.getListState(
                "isl", "s BIGINT, l BIGINT, n BIGINT, sv BIGINT"
            )

        @staticmethod
        def _merge(islands):
            """Start-sorted extent merge: B joins A iff B.s − A.l < gap."""
            islands.sort()
            merged = []
            for s, l, n, v in islands:
                if merged and s - merged[-1][1] < gap_ms:
                    ms, ml, mn, mv = merged[-1]
                    merged[-1] = (ms, max(ml, l), mn + n, mv + v)
                else:
                    merged.append((s, l, n, v))
            return merged

        def handleInputRows(self, key, rows, timerValues):
            evs = []
            for pdf in rows:
                for tsm, sv in zip(pdf["tsm"], pdf["sv"]):
                    evs.append((int(tsm), int(sv)))
            if evs:
                batch_isl = self._merge([(t, t, 1, v) for t, v in evs])
                self._isl.appendList(batch_isl)
                # EVENT-time stamp >= every current session's end for
                # this key; fires once the watermark passes it.
                self._handle.registerTimer(batch_isl[-1][1] + gap_ms)
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            wm = timerValues.getCurrentWatermarkInMs()
            islands = [
                (int(s), int(l), int(n), int(v))
                for (s, l, n, v) in self._isl.get()
            ]
            if not islands:
                return
            emit, retain = [], []
            for s, l, n, v in self._merge(islands):
                if l + gap_ms <= wm:
                    emit.append((key[0], s, l + gap_ms, n, v))
                else:
                    retain.append((s, l, n, v))
            self._isl.clear()
            if retain:
                self._isl.put(retain)
            if emit:
                yield pd.DataFrame(
                    {
                        "user_id": [e[0] for e in emit],
                        "start_ms": [e[1] for e in emit],
                        "end_ms": [e[2] for e in emit],
                        "n": [e[3] for e in emit],
                        "sv": [e[4] for e in emit],
                    }
                )

        def close(self) -> None:
            pass

    stream.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    wm = stream.withWatermark("ts", delay).select(
        "user_id", "sv", F.unix_millis("ts").alias("tsm"), "ts"
    )
    with vendor.tws_protobuf_shim():
        return wm.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=EtSessions(),
            outputStructType=(
                "user_id long, start_ms BIGINT, end_ms BIGINT,"
                " n BIGINT, sv BIGINT"
            ),
            outputMode="Append",
            timeMode="EventTime",
        )


def events_stream_partitions(spark: SparkSession, sf_dir: str) -> int:
    """``stream_shuffle_partitions`` for the staged events fixture (the
    staged copy is byte-identical to the source file). Window aggs /
    dedup / stream-stream joins over events are light per row — the
    default 250k-rows/partition quantum (measured: 100k rows wants 1
    partition, 10M rows wants the full parallelism)."""
    return stream_shuffle_partitions(spark, f"{sf_dir}/events.parquet")


def staged_rows(*paths: str) -> int:
    """Total rows under the staged stream-source path(s), read from
    parquet FOOTERS (no scan; compression-independent — a replicated
    corpus compresses ~100× and byte counts under-size it, the r17
    100× lesson). Non-parquet/metadata files are ignored."""
    import os

    import pyarrow.parquet as pq

    def _file_rows(p: str) -> int:
        try:
            return pq.read_metadata(p).num_rows
        except Exception:
            return 0

    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(
                    _file_rows(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet") and not f.startswith(("_", "."))
                )
        elif os.path.exists(p):
            total += _file_rows(p)
    return total


def stream_shuffle_partitions(
    spark: SparkSession, *paths: str, rows_per_partition: int = 250_000
) -> int:
    """Scale-adaptive shuffle-partition count for a STATEFUL streaming
    run over the staged input at ``paths`` (guide §2.2/§2.5 + VERDICT
    r16 #3: stateful operators pin the state-store partition count to
    ``spark.sql.shuffle.partitions`` at query start, every partition
    costs a per-micro-batch state-store commit/maintenance floor even
    when empty, and AQE cannot coalesce a streaming plan).

    ⌈footer rows / rows_per_partition⌉ clamped to
    [1, defaultParallelism]. Rows, not bytes: compressed size
    under-counts compute by the compression ratio (measured at the 100×
    replica: the byte rule picked 4 partitions for a 10M-row
    stream-stream join and lost 1.4–2.3× to the 32-partition run, while
    1 partition stays the measured winner at the 100k-row fixture).
    ``rows_per_partition`` is the per-family quantum — lower it for
    streams with heavy per-row work (band explodes, feature probes).
    ``SPARK_GRAFT_STREAM_SHUFFLE`` pins the count for cluster
    deployments where steady-state volume, not a staged backfill
    directory, should size the state stores."""
    import math
    import os

    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    if env:
        return max(1, int(env))
    par = max(1, int(spark.sparkContext.defaultParallelism))
    n = max(1, math.ceil(staged_rows(*paths) / max(1, rows_per_partition)))
    return min(n, par)


class shuffle_partitions:
    """Context manager: pin ``spark.sql.shuffle.partitions`` for the
    duration (a streaming query binds its state-store partition count
    from this conf at start), then restore the session value."""

    _KEY = "spark.sql.shuffle.partitions"

    def __init__(self, spark: SparkSession, n: int):
        self._spark, self._n = spark, int(n)

    def __enter__(self):
        self._old = self._spark.conf.get(self._KEY)
        self._spark.conf.set(self._KEY, str(self._n))
        return self

    def __exit__(self, *exc):
        self._spark.conf.set(self._KEY, self._old)
        return False


def run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "complete",
    stream_partitions: int | None = None,
):
    """Drive a streaming DataFrame to completion into a memory sink.

    Returns the StreamingQuery (stopped). Results: ``spark.table(name)``.
    ``stream_partitions`` (r17) pins the state-store partition count for
    this run — see ``stream_shuffle_partitions``.
    """

    def _run():
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return q

    if stream_partitions is None:
        return _run()
    with shuffle_partitions(df.sparkSession, stream_partitions):
        return _run()


def changelog_upsert_stream(events: DataFrame, state_path: str):
    """T-EXT incremental changelog materialization via ``foreachBatch``.

    Each micro-batch reduces to its per-user newest row, then MERGES
    into the keyed parquet store: newer (ts, event_id) wins, unseen keys
    insert. The merged result is localCheckpointed before the overwrite
    so the store is never read and rewritten in the same job. State is
    O(|users|). At 100 TB the store is key-bucketed
    (``partitionBy(pmod(hash(user_id), B))``) and each batch rewrites
    ONLY the buckets its keys hash into (the lakehouse MERGE shape —
    same full-outer join as ``sink_upsert``, scoped per bucket), not
    the whole store as this single-file demo does. The batch twin
    (``batch_equiv.stream_changelog``) must
    produce the identical table for any arrival order / batch split —
    asserted in tests/test_streaming.py with maxFilesPerTrigger=1.
    Returns the DataStreamWriter (caller starts/awaits it).
    """
    from pyspark.sql import Window

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
        try:
            base = spark.read.parquet(state_path)
        except Exception:
            base = None
        if base is not None:
            merged = (
                base.unionByName(latest)
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
            )
        else:
            merged = latest
        merged.localCheckpoint().write.mode("overwrite").parquet(state_path)

    return (
        events.select("user_id", "event_id", "event_type", "ts", "value")
        .writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
    )
