"""Behavioral tests for the second r8 key batch — beyond the oracle sweep.

Covers: collocation lift/PMI arithmetic against a Python reduction, the
BPE pair table's word-frequency weighting, confusion-matrix identities
against the classifier's own assignment, and the ListState/MapState
streaming key's batch equivalence under multi-micro-batch splits.
"""

from __future__ import annotations

import pytest

from collections import Counter

import math

from pyspark.sql import functions as F

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR


def _tokens(spark):
    rows = load(spark, SF_DIR, "documents").select("text").collect()
    return [[t for t in r["text"].split(" ") if t] for r in rows]


def test_collocations_match_manual_reduction(spark):
    """Every returned (pair, counts, lift, pmi) must equal a row-by-row
    Python reduction, and the result must be the top-100 by
    (lift desc, w1, w2) with the count threshold applied."""
    docs = _tokens(spark)
    pc: Counter = Counter()
    for t in docs:
        for a, b in zip(t, t[1:]):
            pc[(a, b)] += 1
    n = sum(pc.values())
    m1: Counter = Counter()
    m2: Counter = Counter()
    for (a, b), c in pc.items():
        m1[a] += c
        m2[b] += c
    scored = []
    for (a, b), c in pc.items():
        if c >= 5:
            lift = float(c) * float(n) / float(m1[a]) / float(m2[b])
            scored.append((-lift, a, b, c, lift))
    scored.sort()
    want = scored[:100]
    out = engine.QUERIES["text_collocations"](spark, SF_DIR).collect()
    assert len(out) == len(want)
    for row, (_, a, b, c, lift) in zip(out, want):
        assert (row["w1"], row["w2"], row["n_pair"]) == (a, b, c)
        assert (row["n_w1"], row["n_w2"]) == (m1[a], m2[b])
        assert row["lift"] == lift
        assert row["pmi_e6"] == round(math.log(lift) * 1_000_000)


def test_bpe_pairs_weighted_by_word_frequency(spark):
    """Pair counts must be word-frequency-weighted (the BPE invariant):
    n_occurrences sums the token counts, n_positions counts vocabulary
    positions, n_types counts distinct word types."""
    docs = _tokens(spark)
    tc = Counter(t for doc in docs for t in doc)
    occ: Counter = Counter()
    pos: Counter = Counter()
    types: dict = {}
    for t, c in tc.items():
        for i in range(len(t) - 1):
            p = t[i : i + 2]
            occ[p] += c
            pos[p] += 1
            types.setdefault(p, set()).add(t)
    ranked = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    out = engine.QUERIES["token_bpe_pairs"](spark, SF_DIR).collect()
    assert [(r["pair"], r["n_occurrences"]) for r in out] == ranked
    for r in out:
        assert r["n_positions"] == pos[r["pair"]]
        assert r["n_types"] == len(types[r["pair"]])


def test_confusion_identities_hold_against_assignment(spark):
    """tp/n_true/n_pred must re-derive from knn_centroid_classify's own
    assignment, and precision/recall/f1 must satisfy their exact-int
    identities (f1 = 2tp/(n_true+n_pred))."""
    assign = engine.QUERIES["knn_centroid_classify"](spark, SF_DIR).collect()
    n_true: Counter = Counter()
    n_pred: Counter = Counter()
    tp: Counter = Counter()
    for r in assign:
        n_true[r["true_label"]] += 1
        n_pred[r["pred_label"]] += 1
        if r["true_label"] == r["pred_label"]:
            tp[r["true_label"]] += 1
    out = engine.QUERIES["eval_confusion"](spark, SF_DIR).collect()
    labels = set(n_true) | set(n_pred)
    assert {r["label"] for r in out} == labels
    for r in out:
        lbl = r["label"]
        assert (r["n_true"], r["n_pred"], r["tp"]) == (
            n_true[lbl], n_pred[lbl], tp[lbl],
        )
        assert r["precision"] == (
            tp[lbl] / n_pred[lbl] if n_pred[lbl] else None
        )
        assert r["recall"] == (tp[lbl] / n_true[lbl] if n_true[lbl] else None)
        assert r["f1"] == 2 * tp[lbl] / (n_true[lbl] + n_pred[lbl])
    # totals conserve: every vector appears once on each axis
    assert sum(r["n_true"] for r in out) == len(assign)
    assert sum(r["n_pred"] for r in out) == len(assign)


def test_stateful_listmap_matches_batch_twin(spark):
    """The ListState/MapState streaming run must equal the windowed batch
    recompute (matches_batch is the real in-session comparison)."""
    row = engine.QUERIES["stream_batch_equiv_stateful_listmap"](
        spark, SF_DIR
    ).collect()[0]
    assert row["matches_batch"] is True
    assert row["n_users"] > 0 and row["n_events"] > 0


@pytest.mark.extended  # heavy leg (VERDICT r16 #1): >8 s behavioral pin
def test_stateful_listmap_state_survives_micro_batch_splits(spark, tmp_path):
    """With maxFilesPerTrigger=1 over a 3-file copy of the panel events,
    the pruned ListState top-3 and MapState counts must carry across
    batches: the struct-max final rows equal the single-batch run's."""
    from ls_hadoop_3_0_spark.streaming import demo
    from ls_hadoop_3_0_spark.streaming.equiv import _session_sample_pred

    pred = _session_sample_pred()
    ev = load(spark, SF_DIR, "events").filter(F.expr(pred))
    src = str(tmp_path / "events_multi")
    ev.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    demo.run_to_memory(
        demo.stateful_user_listmap_tws(stream), "lm_multi", output_mode="update"
    )
    multi = spark.table("lm_multi")
    # intermediate rows exist (more rows than users) proves >1 batch
    n_users = multi.select("user_id").distinct().count()
    final = {
        r["user_id"]: (r["n_events"], r["n_types"], r["top3_sum"])
        for r in multi.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "n_types", "top3_sum")).alias("s"))
        .select("user_id", "s.n_events", "s.n_types", "s.top3_sum")
        .collect()
    }
    demo.run_to_memory(
        demo.stateful_user_listmap_tws(
            spark.readStream.schema(ev.schema).parquet(src)
        ),
        "lm_single",
        output_mode="update",
    )
    single = {
        r["user_id"]: (r["n_events"], r["n_types"], r["top3_sum"])
        for r in spark.table("lm_single")
        .groupBy("user_id")
        .agg(F.max(F.struct("n_events", "n_types", "top3_sum")).alias("s"))
        .select("user_id", "s.n_events", "s.n_types", "s.top3_sum")
        .collect()
    }
    assert len(final) == n_users and final == single


def test_jdbc_pushdown_filter_reaches_the_remote_scan(spark):
    """The acctbal predicate must appear as a PushedFilter on the JDBC
    relation (shipped to Derby as WHERE), and the result must equal a
    parquet-side recompute."""
    out = engine.QUERIES["jdbc_pushdown"](spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(s_acctbal,1000.0)" in plan
    row = out.collect()[0]
    want = (
        load(spark, SF_DIR, "supplier")
        .filter((F.col("s_nationkey") == 3) & (F.col("s_acctbal") > 1000.0))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("s_suppkey").alias("mn"),
            F.max("s_suppkey").alias("mx"),
        )
        .collect()[0]
    )
    assert (row["n_rows"], row["min_key"], row["max_key"]) == (
        want["n"], want["mn"], want["mx"],
    )


def test_cte_recursive_walks_the_implied_binary_tree(spark):
    """WITH RECURSIVE must reproduce an explicit BFS over parent(k) =
    floor(k/2) — per depth: exact headcount, key range, and scaled-long
    balance sums."""
    sup = {
        r["s_suppkey"]: r["s_acctbal"]
        for r in load(spark, SF_DIR, "supplier").collect()
    }
    levels: dict[int, list[int]] = {0: [1]}
    seen = {1}
    d = 0
    while True:
        nxt = [
            k for k in sup
            if k > 1 and k // 2 in set(levels[d]) and k not in seen
        ]
        if not nxt:
            break
        d += 1
        levels[d] = sorted(nxt)
        seen.update(nxt)
    out = {r["depth"]: r for r in engine.QUERIES["cte_recursive"](spark, SF_DIR).collect()}
    assert set(out) == set(levels)
    for d, keys in levels.items():
        r = out[d]
        assert r["n_suppliers"] == len(keys)
        assert (r["min_key"], r["max_key"]) == (min(keys), max(keys))
        want = sum(round(sup[k] * 1e6) for k in keys)
        assert round(r["sum_bal"] * 1e6) == want


def test_python_datasource_is_partition_parallel_and_exact(spark):
    """The custom connector must plan one task per declared partition and
    generate exactly the deterministic content (hashlib recompute)."""
    import hashlib

    from ls_hadoop_3_0_spark.sources.io import _PYDS_PARTS, _PYDS_ROWS

    # the raw scan: partition count is the connector's partitions() plan
    engine.QUERIES["scan_python_datasource"](spark, SF_DIR)  # registers
    raw = (
        spark.read.format("synthlog")
        .option("parts", str(_PYDS_PARTS))
        .load()
    )
    assert raw.rdd.getNumPartitions() == _PYDS_PARTS
    out = {
        r["part"]: r
        for r in engine.QUERIES["scan_python_datasource"](spark, SF_DIR).collect()
    }
    assert set(out) == set(range(_PYDS_PARTS))
    for p, r in out.items():
        ids = range(p * _PYDS_ROWS, (p + 1) * _PYDS_ROWS)
        assert r["n_rows"] == _PYDS_ROWS
        assert r["sum_ids"] == sum(ids)
        want = sum(
            int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) for i in ids
        )
        assert r["payload_u24"] == want


def test_python_datasink_commit_protocol(spark):
    """The custom sink must publish atomically: committed part files +
    a manifest whose per-file row counts sum to the read-back total, and
    no uncommitted .tmp residue."""
    import glob
    import json
    import os

    from ls_hadoop_3_0_spark.sources.io import scratch

    row = engine.QUERIES["sink_python_datasource"](spark, SF_DIR).collect()[0]
    assert row["matches_manifest"] is True
    path = scratch(SF_DIR, "sink_python_datasource")
    manifest = json.load(open(f"{path}/_MANIFEST.json"))
    assert manifest["rows"] == row["n_rows"]
    assert not glob.glob(f"{path}/*.tmp"), "uncommitted temp files leaked"
    parts = glob.glob(f"{path}/part-*.jsonl")
    assert sorted(parts) == manifest["files"]
    n_lines = sum(1 for p in parts for _ in open(p))
    assert n_lines == manifest["rows"]
    want = (
        load(spark, SF_DIR, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .count()
    )
    assert row["n_rows"] == want


def test_sql_declared_udf_is_inlined_not_python(spark):
    """The declared SQL functions must be inlined by Catalyst: the plan
    contains NO python evaluation node, and the tiers partition the
    orders exactly."""
    df = engine.QUERIES["udf_sql_declared"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, marker
    rows = {r["tier"]: r for r in df.collect()}
    orders = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    from collections import Counter
    want_n: Counter = Counter()
    want_ck: Counter = Counter()
    for o in orders:
        p = o["o_totalprice"]
        t = "S" if p < 50000.0 else "M" if p < 150000.0 else "L" if p < 300000.0 else "XL"
        want_n[t] += 1
        want_ck[t] += len(o["o_orderpriority"]) + (o["o_orderkey"] % 7)
    assert {t: r["n_orders"] for t, r in rows.items()} == dict(want_n)
    assert {t: r["checksum"] for t, r in rows.items()} == dict(want_ck)


def test_stream_python_datasource_consumes_every_offset(spark):
    """The finite custom stream must drain all chunks (exact closed-form
    digest) and agree with the in-session batch recompute."""
    import hashlib

    from ls_hadoop_3_0_spark.streaming.equiv import (
        _PYSTREAM_CHUNKS,
        _PYSTREAM_ROWS,
    )

    total = _PYSTREAM_CHUNKS * _PYSTREAM_ROWS
    row = engine.QUERIES["stream_python_datasource"](spark, SF_DIR).collect()[0]
    assert row["matches_batch"] is True
    assert row["n_rows"] == total
    assert row["sum_v"] == total * (total - 1) // 2
    want_u24 = sum(
        int(hashlib.md5(str(v).encode()).hexdigest()[:6], 16)
        for v in range(total)
    )
    assert row["rows_u24"] == want_u24


def test_map_arrow_matches_python_recompute(spark):
    """The Arrow-kernel outputs must equal a per-row Python recompute
    with the same split semantics (single space, empties counted)."""
    out = {r["doc_id"]: r for r in engine.QUERIES["udf_map_arrow"](spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    assert len(out) == len(docs)
    for d in docs:
        r = out[d["doc_id"]]
        assert r["n_tokens"] == len(d["text"].split(" "))
        assert r["n_chars"] == len(d["text"])
        assert r["n_bytes"] == len(d["text"].encode("utf-8"))
