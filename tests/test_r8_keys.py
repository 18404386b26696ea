"""Behavioral tests for the r8 key batch — beyond the oracle sweep.

Covers: the executable stateful-streaming equivalence key (including
multi-micro-batch robustness of its final-state selection), the
bounded-panel dedup recall audit's relationship to its v1, and the
degree-oriented triangle rewrite's invariance to hub skew.
"""

from __future__ import annotations

import pytest

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


@pytest.mark.extended  # heavy leg (VERDICT r16 #1): >8 s behavioral pin
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
    from ls_hadoop_3_0_spark.llm.dedup import dedup_recall

    # dedup_recall was retired from the registry in late r8 (pair-bound
    # quadratic audit arm — the knn_recall precedent); the release-audit
    # function remains directly callable.
    v1 = dedup_recall(spark, SF_DIR).collect()[0]
    v2 = engine.QUERIES["dedup_recall_v2"](spark, SF_DIR).collect()[0]
    assert v2["n_truth"] <= v1["n_truth"]
    assert v2["n_cand"] <= v1["n_cand"]
    assert v2["n_hit"] <= v2["n_cand"] and v2["n_hit"] <= v2["n_truth"]


def test_scan_sequencefile_roundtrips_real_container(spark):
    """The key must exercise the REAL SequenceFile container: the bytes
    on disk carry the SEQ magic + writable class names, and the read
    side recovers the exact filtered (key, value) multiset."""
    import glob
    import os

    from ls_hadoop_3_0_spark.sources.io import scratch

    out = engine.QUERIES["scan_sequencefile"](spark, SF_DIR).collect()[0]
    src = (
        load(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_orderkey").alias("sk"),
            F.sum(F.length("o_orderpriority")).alias("sp"),
        )
        .collect()[0]
    )
    assert (out["n_rows"], out["sum_keys"], out["sum_prio_chars"]) == (
        src["n"], src["sk"], src["sp"],
    )
    parts = [
        p
        for p in glob.glob(os.path.join(scratch(SF_DIR, "scan_sequencefile"), "part-*"))
        if not p.endswith(".crc")
    ]
    assert parts, "no SequenceFile parts written"
    with open(parts[0], "rb") as fh:
        header = fh.read(200)
    assert header[:3] == b"SEQ"
    # Pyrolite infers the writable from the key magnitude (Int at small
    # SF, Long once orderkeys exceed 2^31) — either is the real container
    assert b"IntWritable" in header or b"LongWritable" in header
    assert b"org.apache.hadoop.io.Text" in header


def test_supplier_diversity_excludes_blacklisted_suppliers(spark, tmp_path):
    """The anti-join must drop blacklisted (negative-balance) suppliers
    from the distinct counts. The live fixtures carry no negative
    balance at sf0.001, so this plants a synthetic corpus: part 1 is
    shipped by suppliers 1, 2, 3 where supplier 3 is blacklisted —
    the count must be 2, and a clean part keeps all its suppliers."""
    sup = spark.createDataFrame(
        [(1, 100.0), (2, 50.0), (3, -10.0), (4, 75.0)],
        "s_suppkey long, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#11", "TYPE A", 3), (2, "Brand#22", "TYPE B", 5),
         (3, "Brand#45", "TYPE C", 4), (4, "Brand#33", "TYPE D", 30)],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    # duplicate (part, supp) rows prove the DISTINCT; part 3 (Brand#45)
    # and part 4 (size 30) must be filtered out entirely
    li = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (1, 3), (2, 4), (2, 4), (3, 1), (4, 2)],
        "l_partkey long, l_suppkey long",
    )
    d = str(tmp_path / "sf_div")
    sup.write.parquet(f"{d}/supplier.parquet")
    part.write.parquet(f"{d}/part.parquet")
    li.write.parquet(f"{d}/lineitem.parquet")
    got = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in engine.QUERIES["analytics_supplier_diversity"](spark, d).collect()
    }
    assert got == {
        ("Brand#11", "TYPE A", 3): 2,  # suppliers 1,2 (3 blacklisted)
        ("Brand#22", "TYPE B", 5): 1,  # supplier 4, deduped
    }


def test_supplier_diversity_has_no_static_broadcast(spark):
    """Both join sides grow with SF — the plan must carry no hand-placed
    broadcast hint (AQE may still broadcast at runtime)."""
    from ls_hadoop_3_0_spark.plans.checks import has_static_broadcast_hint

    df = engine.QUERIES["analytics_supplier_diversity"](spark, SF_DIR)
    assert not has_static_broadcast_hint(df)


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


def test_revenue_forecast_matches_manual_reduction(spark):
    """Q6 analog: the one-row aggregate must equal a row-by-row Python
    reduction of the same filtered slice (exact scaled-long arithmetic)."""
    rows = (
        load(spark, SF_DIR, "lineitem")
        .select("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
        .collect()
    )
    import datetime

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    picked = [
        r
        for r in rows
        if lo <= r["l_shipdate"] < hi
        and 0.05 <= r["l_discount"] <= 0.07
        and r["l_quantity"] < 24.0
    ]
    want = sum(round(r["l_extendedprice"] * r["l_discount"] * 1e6) for r in picked)
    got = engine.QUERIES["analytics_revenue_forecast"](spark, SF_DIR).collect()[0]
    assert got["n_items"] == len(picked)
    assert round(got["revenue_delta"] * 1e6) == want


def test_min_cost_supplier_returns_groupwise_minima(spark):
    """Q2 analog: every returned (part, cost) must be the global minimum
    unit cost among EUROPE offers for that part, and every size-15 part
    with at least one EUROPE offer must appear."""
    out = engine.QUERIES["analytics_min_cost_supplier"](spark, SF_DIR).collect()
    li = load(spark, SF_DIR, "lineitem")
    sup = load(spark, SF_DIR, "supplier").collect()
    nat = {r["n_nationkey"]: r["n_regionkey"] for r in load(spark, SF_DIR, "nation").collect()}
    reg = {
        r["r_regionkey"]
        for r in load(spark, SF_DIR, "region").collect()
        if r["r_name"] == "EUROPE"
    }
    eu = {r["s_suppkey"] for r in sup if nat[r["s_nationkey"]] in reg}
    parts15 = {
        r["p_partkey"]
        for r in load(spark, SF_DIR, "part").collect()
        if r["p_size"] == 15
    }
    best: dict = {}
    for r in li.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity").collect():
        if r["l_partkey"] in parts15 and r["l_suppkey"] in eu:
            c = r["l_extendedprice"] / r["l_quantity"]
            k = r["l_partkey"]
            best[k] = min(best.get(k, c), c)
    assert {r["p_partkey"] for r in out} == set(best)
    for r in out:
        assert r["unit_cost"] == best[r["p_partkey"]]


def test_important_stock_threshold_is_global_share(spark):
    """Q11 analog: returned parts are exactly those above 2× the average
    per-part value for the nation (the self-scaling threshold), with
    values matching an exact scaled-long reduction."""
    out = engine.QUERIES["analytics_important_stock"](spark, SF_DIR).collect()
    li = load(spark, SF_DIR, "lineitem")
    nat3 = {
        r["n_nationkey"]
        for r in load(spark, SF_DIR, "nation").collect()
        if r["n_name"] == "NATION_3"
    }
    sups = {
        r["s_suppkey"]
        for r in load(spark, SF_DIR, "supplier").collect()
        if r["s_nationkey"] in nat3
    }
    per_part: dict = {}
    for r in li.select("l_partkey", "l_suppkey", "l_extendedprice").collect():
        if r["l_suppkey"] in sups:
            per_part[r["l_partkey"]] = per_part.get(r["l_partkey"], 0) + round(
                r["l_extendedprice"] * 1e6
            )
    avg = (sum(per_part.values()) / 1e6) / len(per_part)
    want = {k for k, v in per_part.items() if v / 1e6 > 2.0 * avg}
    assert {r["l_partkey"] for r in out} == want
    for r in out:
        assert round(r["value"] * 1e6) == per_part[r["l_partkey"]]


def test_excess_inventory_uses_conditional_share(spark, tmp_path):
    """Q20 analog on a planted corpus: supplier 1 ships part 1 (PROMO)
    mostly in 1996 (qualifies), supplier 2 ships the same part mostly
    outside (doesn't); non-PROMO and non-EUROPE rows must be excluded."""
    import datetime

    d96 = datetime.datetime(1996, 6, 1)
    d99 = datetime.datetime(1999, 6, 1)
    li = spark.createDataFrame(
        [
            (1, 1, d96, 30.0), (1, 1, d99, 10.0),   # supp 1: 75% in '96
            (1, 2, d96, 10.0), (1, 2, d99, 30.0),   # supp 2: 25% in '96
            (2, 1, d96, 50.0),                       # part 2: not PROMO
            (3, 3, d96, 50.0),                       # supp 3: not EUROPE
        ],
        "l_partkey long, l_suppkey long, l_shipdate timestamp, l_quantity double",
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD"), (3, "PROMO")],
        "p_partkey long, p_type string",
    )
    sup = spark.createDataFrame(
        [(1, "S1", 10), (2, "S2", 10), (3, "S3", 20)],
        "s_suppkey long, s_name string, s_nationkey int",
    )
    nat = spark.createDataFrame(
        [(10, "N10", 100), (20, "N20", 200)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    reg = spark.createDataFrame(
        [(100, "EUROPE"), (200, "ASIA")], "r_regionkey int, r_name string"
    )
    d = str(tmp_path / "sf_q20")
    li.write.parquet(f"{d}/lineitem.parquet")
    part.write.parquet(f"{d}/part.parquet")
    sup.write.parquet(f"{d}/supplier.parquet")
    nat.write.parquet(f"{d}/nation.parquet")
    reg.write.parquet(f"{d}/region.parquet")
    got = {
        (r["s_suppkey"], r["n_name"]): r["n_hot_parts"]
        for r in engine.QUERIES["analytics_excess_inventory"](spark, d).collect()
    }
    assert got == {(1, "N10"): 1}


def test_q_shape_keys_have_no_static_broadcast_on_growing_sides(spark):
    """The SF-growing joins (supplier, part, the fact aggregates) must be
    AQE-planned; only nation/region (design-bounded) may carry hints —
    checked by counting ResolvedHints against the expected dim joins."""
    from ls_hadoop_3_0_spark.plans.checks import count_static_broadcast_hints

    for key, allowed in [
        ("analytics_min_cost_supplier", 4),   # nation+region × 2 plan branches (offers is referenced by both the best-cost agg and the achiever join)
        ("analytics_excess_inventory", 2),    # nation, region
        ("analytics_important_stock", 3),     # nation × 2 branches (v feeds both the filter and the grand total) + the 1-row total
        ("analytics_revenue_forecast", 0),
    ]:
        df = engine.QUERIES[key](spark, SF_DIR)
        assert count_static_broadcast_hints(df) <= allowed, key
