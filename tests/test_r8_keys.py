"""Behavioral tests for the r8 key batch — beyond the oracle sweep.

Covers: the executable stateful-streaming equivalence key (including
multi-micro-batch robustness of its final-state selection), the
bounded-panel dedup recall audit's relationship to its v1, and the
degree-oriented triangle rewrite's invariance to hub skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.streaming import demo
from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR


def test_stream_batch_equiv_stateful_matches(spark):
    """The real transformWithStateInPandas run must equal the batch twin
    (matches_batch is an actual in-session comparison, not a literal)."""
    row = engine.QUERIES["stream_batch_equiv_stateful"](spark, SF_DIR).collect()[0]
    assert row["matches_batch"] is True
    assert row["n_users"] > 0 and row["n_events"] > 0


def test_stateful_exact_totals_survive_multiple_micro_batches(spark, tmp_path):
    """Update-mode TWS emits one row per (user, batch); with
    maxFilesPerTrigger=1 over a 3-file source the sink holds
    intermediate running totals, and the (n_events, sv) struct-max per
    user must still recover the exact batch totals."""
    from ls_hadoop_3_0_spark.exprs import SCALE

    ev = load(spark, SF_DIR, "events")
    src = str(tmp_path / "events_multi")
    ev.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = demo.stateful_user_totals_tws_exact(stream)
    demo.run_to_memory(out, "tws_multi", output_mode="update")
    sink = spark.table("tws_multi")
    # at least one user must have been emitted in >1 micro-batch,
    # otherwise this test degenerates to the single-batch case
    assert (
        sink.groupBy("user_id").count().filter(F.col("count") > 1).count() > 0
    ), "source did not split into multiple micro-batches"
    final = (
        sink.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sv")).alias("s"))
        .select("user_id", F.col("s.n_events").alias("n"), F.col("s.sv").alias("sv"))
    )
    got = {r["user_id"]: (r["n"], r["sv"]) for r in final.collect()}
    want = {
        r["user_id"]: (r["n"], r["sv"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * F.lit(SCALE)).cast("long")).alias("sv"),
        )
        .collect()
    }
    assert got == want


def test_dedup_recall_v2_panel_is_subset_of_v1(spark):
    """On un-replicated fixtures the bounded panel covers every doc id
    in range, so v2's truth/cand counts are bounded by v1's and its
    ratios stay well-defined."""
    v1 = engine.QUERIES["dedup_recall"](spark, SF_DIR).collect()[0]
    v2 = engine.QUERIES["dedup_recall_v2"](spark, SF_DIR).collect()[0]
    assert v2["n_truth"] <= v1["n_truth"]
    assert v2["n_cand"] <= v1["n_cand"]
    assert v2["n_hit"] <= v2["n_cand"] and v2["n_hit"] <= v2["n_truth"]


def test_triangles_degree_orientation_handles_hub_skew(spark, tmp_path):
    """A 20-leaf star plus a closed triangle among leaves 1,2,3: the
    (degree, id) orientation must count every triangle exactly once —
    the leaf-leaf one AND the three through the hub (hub-1-2, hub-2-3,
    hub-1-3) — while every star edge orients leaf->hub (the O(sqrt m)
    fan-out cap), which the wedge count verifies arithmetically."""
    rows = []
    oid = 0
    # star: hub 100 connected to leaves 1..20 (each order pairs hub+leaf)
    for leaf in range(1, 21):
        rows += [
            (oid, 1000 + oid, 100, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"),
            (oid, 2000 + oid, leaf, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"),
        ]
        oid += 1
    # one triangle among leaves 1,2,3
    for u, v in [(1, 2), (2, 3), (1, 3)]:
        rows += [
            (oid, 3000 + oid, u, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"),
            (oid, 4000 + oid, v, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"),
        ]
        oid += 1
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ]
    df = spark.createDataFrame(rows, cols).withColumn(
        "l_shipdate", F.to_date("l_shipdate")
    )
    d = str(tmp_path / "sf_star")
    df.write.parquet(f"{d}/lineitem.parquet")
    out = engine.QUERIES["graph_triangles"](spark, d).collect()[0]
    # triangles: (1,2,3) + (hub,1,2) + (hub,2,3) + (hub,1,3)
    assert out["n_triangles"] == 4
    assert out["n_edges"] == 23  # 20 star + 3 triangle
    # wedges: hub degree 20 -> C(20,2)=190; leaves 1,2,3 have degree 3
    # (hub + 2 triangle peers) -> 3 each; other 17 leaves degree 1.
    assert out["n_wedges"] == 190 + 3 * 3
