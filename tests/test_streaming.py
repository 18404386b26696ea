"""Genuine Structured Streaming runs (SURVEY.md §2.9 T1/T3/T4/T5).

The batch-equivalent queries carry oracle correctness; here the SAME
logic runs through readStream (file source → memory sink, availableNow)
and must agree with the batch results — proving the plans
incrementalize.
"""

from __future__ import annotations

import pytest

from ls_hadoop_3_0_spark.streaming import batch_equiv, demo

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def events_stream(spark):
    return demo.read_events_stream(spark, SF_DIR)


def test_streaming_tumbling_matches_batch(spark, events_stream):
    agg = demo.tumbling_counts_stream(events_stream)
    demo.run_to_memory(agg, "stream_tumbling_out", output_mode="complete")
    got = {
        (str(r["win_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("stream_tumbling_out").collect()
    }
    want = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch_equiv.stream_tumbling(spark, SF_DIR).collect()
    }
    # Batch formats win_start as string; normalize stream side the same way.
    got = {(k[0][:19].replace("T", " "), k[1]): v for k, v in got.items()}
    assert got == want


def test_streaming_session_count_matches_batch(spark, events_stream):
    sess = demo.sessionized_stream(events_stream)
    demo.run_to_memory(sess, "stream_session_out", output_mode="complete")
    n_stream = spark.table("stream_session_out").count()
    n_batch = batch_equiv.stream_session(spark, SF_DIR).count()
    assert n_stream == n_batch


def test_stateful_totals_match_batch_aggregation(spark, events_stream):
    """T6: arbitrary per-key state across micro-batches == batch groupBy."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.tables import load

    out = demo.stateful_user_totals_stream(events_stream)
    demo.run_to_memory(out, "stateful_out", output_mode="update")
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in spark.table("stateful_out").collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["v"], 6))
        for r in load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == want


def test_streaming_dedup_is_exact_on_unique_ids(spark, events_stream):
    dedup = demo.dedup_stream(events_stream)
    demo.run_to_memory(dedup, "stream_dedup_out", output_mode="append")
    from ls_hadoop_3_0_spark.tables import load

    n_events = load(spark, SF_DIR, "events").select("event_id").distinct().count()
    assert spark.table("stream_dedup_out").count() == n_events
