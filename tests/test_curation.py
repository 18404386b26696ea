"""Invariants for the corpus-curation keys (llm/curation.py) and the
round-5 profiling/CDC additions — semantics the oracle hash can't state
directly (geometry, rule consistency, interval tiling)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ls_hadoop_3_0_spark.llm.curation import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    contamination_check,
    doc_chunk,
    text_quality,
)
from ls_hadoop_3_0_spark.operators.relational import profile_table
from ls_hadoop_3_0_spark.operators.timeseries import scd2_history
from ls_hadoop_3_0_spark.plans import checks
from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR


def test_chunk_geometry_covers_every_token_exactly(spark):
    """ceil(n_tokens/stride) chunks per doc; chunk i holds exactly
    min(size, n_tokens − i·stride) tokens; starts tile [0, n_tokens)."""
    chunks = doc_chunk(spark, SF_DIR)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    docs = (
        load(spark, SF_DIR, "documents")
        .select("doc_id", F.size(toks).alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    j = chunks.join(docs, "doc_id")
    bad = j.filter(
        F.col("n_chunk_tokens")
        != F.least(F.lit(CHUNK_SIZE), F.col("n_tokens") - F.col("chunk_start"))
    )
    assert bad.count() == 0, bad.limit(5).collect()
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"), F.max("chunk_start").alias("last_start")
    )
    bad2 = docs.join(per_doc, "doc_id", "left").filter(
        (F.col("n_chunks") != F.ceil(F.col("n_tokens") / F.lit(CHUNK_STRIDE)))
        | (F.col("last_start") >= F.col("n_tokens"))
    )
    assert bad2.count() == 0, bad2.limit(5).collect()
    assert chunks.filter(F.col("n_chunk_tokens") == 0).count() == 0


def test_doc_chunk_is_map_only(spark):
    assert checks.shuffle_count(doc_chunk(spark, SF_DIR)) == 0


def test_quality_keep_iff_no_reasons(spark):
    q = text_quality(spark, SF_DIR)
    assert q.filter(F.col("keep") & (F.col("reasons") != "")).count() == 0
    assert q.filter(~F.col("keep") & (F.col("reasons") == "")).count() == 0
    # The rules must discriminate on the fixture corpus: both verdicts occur.
    verdicts = {r["keep"] for r in q.select("keep").distinct().collect()}
    assert verdicts == {True, False}


def test_contamination_no_static_broadcast_and_nonempty(spark):
    df = contamination_check(spark, SF_DIR)
    # ADVICE r5: the bench side is a corpus slice (grows with the corpus),
    # so the plan must NOT pin a static broadcast — AQE decides at runtime
    # (initial plan shows the shuffle join; AQE may still broadcast small
    # sides dynamically, which is exactly the desired demotable behavior).
    assert "broadcast" not in df._jdf.queryExecution().analyzed().toString().lower(), (
        checks.formatted_plan(df)
    )
    rows = df.collect()
    assert len(rows) > 0, "contamination rules found no overlap — not discriminating"
    assert all(r["n_shared_grams"] >= 1 and r["n_bench_docs"] >= 1 for r in rows)
    # Benchmark docs must never flag themselves.
    assert all(r["doc_id"] % 100 != 0 for r in rows)


def test_scd2_intervals_tile_each_user_timeline(spark):
    """Per user: exactly one open (is_current) run; run row-counts sum to
    the user's event count; intervals are disjoint and ordered."""
    h = scd2_history(spark, SF_DIR).cache()
    try:
        assert h.filter(F.col("is_current")).groupBy("user_id").count().filter(
            F.col("count") != 1
        ).count() == 0
        ev = load(spark, SF_DIR, "events").groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_ev")
        )
        per_user = h.groupBy("user_id").agg(F.sum("n_events").alias("n_run"))
        assert (
            ev.join(per_user, "user_id")
            .filter(F.col("n_ev") != F.col("n_run"))
            .count()
            == 0
        )
        # valid_from < valid_to for every closed interval (string compare is
        # chronological for the fixed yyyy-MM-dd HH:mm:ss format).
        assert h.filter(
            ~F.col("is_current") & (F.col("valid_from") >= F.col("valid_to"))
        ).count() == 0
    finally:
        h.unpersist()


def test_scd2_single_shuffle(spark):
    """The window/agg/window chain must reuse the (user_id) partitioning."""
    assert checks.shuffle_count(scd2_history(spark, SF_DIR)) == 1


def test_profile_single_scan(spark):
    """One row per profiled column; ONE FileScan feeds all 25 statistics
    (the whole point vs six per-column scans). The multi-distinct
    aggregate legitimately plans a few extra exchanges, but they carry
    distinct values / 1-row partials — never a rescan of the fact."""
    df = profile_table(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 6
    by_col = {r["col_name"]: r for r in rows}
    li = load(spark, SF_DIR, "lineitem")
    n = li.count()
    assert all(r["n_rows"] == n for r in rows)
    assert by_col["l_returnflag"]["min_str"] is not None
    assert by_col["l_quantity"]["min_num"] is not None
    import re

    plan = checks.formatted_plan(df)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_centroid_classify_covers_all_vectors_and_beats_chance(spark):
    from ls_hadoop_3_0_spark.llm.embeddings import knn_centroid_classify

    df = knn_centroid_classify(spark, SF_DIR).cache()
    try:
        n_vec = load(spark, SF_DIR, "embeddings").count()
        assert df.count() == n_vec  # exactly one prediction per vector
        n_labels = df.select("pred_label").distinct().count()
        acc = df.select(
            F.avg((F.col("true_label") == F.col("pred_label")).cast("double"))
        ).collect()[0][0]
        assert acc > 2.0 / max(n_labels, 2), acc
    finally:
        df.unpersist()


def test_anomaly_zscore_flags_are_extreme_and_rare(spark):
    from ls_hadoop_3_0_spark.operators.analytics import anomaly_zscore

    df = anomaly_zscore(spark, SF_DIR).cache()
    try:
        rows = df.collect()
        assert len(rows) > 0
        assert all(abs(r["z"]) > 3.0 for r in rows)
        n_events = load(spark, SF_DIR, "events").count()
        assert len(rows) / n_events < 0.05  # outliers are rare by construction
    finally:
        df.unpersist()


def test_doc_pack_tiles_and_matches_serial_cumsum(spark):
    """Packing invariants: offsets tile exactly (each doc starts where
    the previous ends in doc_id order), the distributed prefix sum
    equals a serial cumsum, and window spans cover the token range."""
    import ls_hadoop_3_0_spark as engine
    from ls_hadoop_3_0_spark.llm.curation import PACK_WINDOW

    rows = sorted(
        engine.QUERIES["doc_pack"](spark, SF_DIR).collect(),
        key=lambda r: r["doc_id"],
    )
    acc = 0
    for r in rows:
        assert r["pack_start"] == acc, (r, acc)
        acc += r["n_tokens"]
        assert r["first_window"] == r["pack_start"] // PACK_WINDOW
        last_tok = r["pack_start"] + r["n_tokens"] - 1
        assert r["last_window"] == last_tok // PACK_WINDOW
        assert r["n_windows"] == r["last_window"] - r["first_window"] + 1


def test_global_prefix_sum_is_partitioning_invariant(spark):
    """The distributed scan must not depend on input partitioning."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.operators.sort import global_prefix_sum

    df = load(spark, SF_DIR, "orders").select("o_orderkey", F.lit(1).alias("one"))
    a = {
        r["o_orderkey"]: r["_psum"]
        for r in global_prefix_sum(df, "one", "o_orderkey").collect()
    }
    b = {
        r["o_orderkey"]: r["_psum"]
        for r in global_prefix_sum(df.repartition(7), "one", "o_orderkey").collect()
    }
    assert a == b
    # With unit weights the exclusive prefix sum is rank-1 in key order.
    for i, k in enumerate(sorted(a)):
        assert a[k] == i


def test_trend_matches_numpy_ols(spark):
    """analytics_trend's moment-composed OLS == numpy polyfit on the
    same (hour-index, value) points, within quantization tolerance."""
    import numpy as np

    import ls_hadoop_3_0_spark as engine
    from ls_hadoop_3_0_spark.tables import load

    got = {
        r["event_type"]: r
        for r in engine.QUERIES["analytics_trend"](spark, SF_DIR).collect()
    }
    rows = load(spark, SF_DIR, "events").selectExpr(
        "event_type", "unix_timestamp(ts) div 3600 AS hr", "value"
    ).collect()
    h0 = min(r["hr"] for r in rows)
    by = {}
    for r in rows:
        by.setdefault(r["event_type"], []).append((r["hr"] - h0, r["value"]))
    for et, pts in by.items():
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        slope = np.polyfit(x, y, 1)[0]
        assert got[et]["n"] == len(pts)
        assert abs(got[et]["slope"] - slope) < 5e-5, (et, got[et]["slope"], slope)
        r = np.corrcoef(x, y)[0, 1]
        assert abs(got[et]["r2"] - r * r) < 5e-5, (et, got[et]["r2"], r * r)


def test_crossdup_flags_every_exact_duplicate(spark):
    """A doc whose full text occurs in ≥2 documents shares EVERY 8-gram
    with its twin, so it must be flagged; and the fraction columns are
    internally consistent."""
    from pyspark.sql import Window

    from ls_hadoop_3_0_spark.llm.curation import CROSSDUP_N, quality_crossdup

    out = {r.doc_id: r for r in quality_crossdup(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    eligible = docs.select("doc_id", "text", F.size(toks).alias("n"))
    dup_ids = [
        r.doc_id
        for r in eligible.filter(F.col("n") >= CROSSDUP_N)
        .withColumn(
            "m", F.count(F.lit(1)).over(Window.partitionBy(F.md5("text")))
        )
        .filter(F.col("m") >= 2)
        .collect()
    ]
    # sf0.001 carries no exact duplicates; the invariant arm runs at the
    # scales that do (sf0.01+), the consistency arm always.
    for i in dup_ids:
        assert out[i].is_crossdup, i
        assert out[i].n_shared == out[i].n_grams
    for r in out.values():
        assert 0 <= r.n_shared <= r.n_grams
        assert r.is_crossdup == (r.shared_frac > 0.5)


def test_pipeline_v3_composes_its_stage_keys(spark):
    """The v3 manifest must equal the composition of its stage keys'
    own verdicts: not cross-duplicated, LM score within the band,
    weighted-sample kept, exact-dedup representative."""
    import hashlib
    from collections import defaultdict

    from ls_hadoop_3_0_spark.functions.text import lm_unigram_score
    from ls_hadoop_3_0_spark.llm.curation import quality_crossdup
    from ls_hadoop_3_0_spark.llm.pipeline import (
        LM_MAX_AVG_NLL,
        pipeline_curation_v3,
    )

    got = {r.doc_id for r in pipeline_curation_v3(spark, SF_DIR).collect()}
    flagged = {
        r.doc_id for r in quality_crossdup(spark, SF_DIR).collect() if r.is_crossdup
    }
    lm = {r.doc_id: r.avg_nll for r in lm_unigram_score(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", "text", "n_chars"
    ).collect()
    mx = max(r.n_chars for r in docs)
    pool = []
    for r in docs:
        if r.doc_id in flagged or r.doc_id not in lm:
            continue
        if lm[r.doc_id] > LM_MAX_AVG_NLL:
            continue
        u24 = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:6], 16)
        if u24 >= int((r.n_chars / mx) * 16777216.0):
            continue
        pool.append(r)
    by_hash = defaultdict(list)
    for r in pool:
        by_hash[hashlib.md5(r.text.encode()).hexdigest()].append(r.doc_id)
    want = {min(ids) for ids in by_hash.values()}
    assert got == want
