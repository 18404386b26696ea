"""Round-14 keys and pins.

Covers the r13 ADVICE items (DuckDB zero-norm oracle pin) and the r14
debut keys as they land.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from ls_hadoop_3_0_spark import ORACLES, QUERIES

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# ADVICE r13: the try_divide-NULL <-> DuckDB x/0.0 equivalence is a claim
# about the ORACLE engine, not just Spark — pin it in the oracle dialect so
# a DuckDB upgrade (>=1.1 flips ieee_floating_point_ops to true, making
# x/0.0 -> inf) fails loudly here instead of silently breaking parity on
# zero-norm vectors.


def test_zero_norm_null_pinned_in_duckdb():
    from ls_hadoop_3_0_spark.llm.dedup import NORM_EMB_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        "SELECT 1 AS vec_id, 0 AS label, "
        "       list_transform(generate_series(1, 64), i -> CAST(0.0 AS FLOAT))"
        "       AS embedding "
        "UNION ALL "
        "SELECT 2, 0, list_transform(generate_series(1, 64), "
        "                            i -> CAST(0.25 AS FLOAT))"
    )
    rows = {r[0]: r[2] for r in con.execute(NORM_EMB_SQL).fetchall()}
    con.close()
    # zero-norm vector: every element must be NULL (Spark try_divide form)
    assert rows[1] is not None and len(rows[1]) == 64
    assert all(x is None for x in rows[1]), rows[1][:4]
    # sanity: a regular vector still normalizes to finite non-NULL values
    assert all(x is not None and math.isfinite(x) for x in rows[2])


# ---------------------------------------------------------------------------
# dedup_incremental — NEW slice probed against a FROZEN prior-snapshot index


def test_dedup_incremental_constructed_duplicates(spark, tmp_path):
    """Pins the semantics the fixture can't show (it has no exact dups):
    exact-vs-prior, near-vs-prior, short-text exact-only, and the
    new-vs-new exclusion (duplicates WITHIN the increment are not
    flagged — only matches against the prior snapshot count)."""
    import pandas as pd

    from ls_hadoop_3_0_spark.llm.dedup import DEDUP_INCREMENTAL_SQL

    t0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t1 = "one two three four five six seven eight nine ten"
    prior = [
        (0, t0),
        (1, t1),
        (2, "hi there"),  # <3 tokens: exact-matchable, never a near cand
        (3, "completely different prior content words here now ok"),
        (10, t0),  # duplicate text WITHIN prior: ck index stays distinct
    ]
    new = [
        (8, t0),  # exact copy of prior -> exact_dup=1, n_near=2 (docs 0+10)
        (9, t1.rsplit(" ", 1)[0] + " eleven"),  # near copy: J=7/9
        (18, "unique new content nothing like anything prior at all"),
        (19, "hi there"),  # exact short text: exact_dup=1, n_near=0
        (28, "unique new content nothing like anything prior at all"),
        # ^ copies NEW doc 18, not any prior doc -> must stay unflagged
    ]
    rows = prior + new
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    got = {
        r["doc_id"]: (r["exact_dup"], r["n_near"], r["max_jaccard"])
        for r in QUERIES["dedup_incremental"](spark, str(tmp_path)).collect()
    }
    assert got[8] == (1, 2, 1.0)
    assert got[9][0] == 0 and got[9][1] == 1
    assert got[9][2] == pytest.approx(7 / 9, abs=1e-6)
    assert got[18] == (0, 0, None)
    assert got[19] == (1, 0, None)
    assert got[28] == (0, 0, None), "new-vs-new dup must not count"

    import duckdb

    from tests.compare import assert_equivalent

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    sdf = QUERIES["dedup_incremental"](spark, str(tmp_path)).toPandas()
    odf = con.execute(DEDUP_INCREMENTAL_SQL).fetchdf()
    con.close()
    assert_equivalent(sdf, odf, key="dedup_incremental")


def test_incremental_prior_side_probed_not_reshuffled(spark):
    """The scale contract: every prior-index scan must carry its bucket
    hash as output partitioning (Bucketed: true <=> no Exchange above
    it — Spark only credits bucketing when the scan's partitioning is
    consumed as-is), and no corpus-scale side may be statically
    broadcast."""
    from ls_hadoop_3_0_spark.plans.checks import formatted_plan

    df = QUERIES["dedup_incremental"](spark, SF_DIR)
    plan = formatted_plan(df)
    incr_scans = [
        block
        for block in plan.split("\n\n")
        if "Scan parquet" in block
        and ".incr_" in block
        and "Location:" in block  # detail section, not the tree header
    ]
    assert len(incr_scans) == 3, plan
    for block in incr_scans:
        assert "Bucketed: true" in block, block
    assert "BroadcastExchange" not in plan, plan


def test_incremental_exact_index_point_lookup_prunes(spark):
    """Audit access path: a single-ck lookup against the frozen exact
    index scans 1 of INCR_BUCKETS buckets (the sink_indexed_lookup
    MapFile-index shape on the dedup index)."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.dedup import incremental_prior_index
    from ls_hadoop_3_0_spark.plans.checks import formatted_plan

    t_exact, _, _ = incremental_prior_index(spark, SF_DIR)
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    try:
        look = spark.table(t_exact).filter(
            F.col("ck") == "d41d8cd98f00b204e9800998ecf8427e"
        )
        assert "SelectedBucketsCount: 1 out of 16" in formatted_plan(look)
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )


# ---------------------------------------------------------------------------
# dedup_substrings skew flip — probe-gated window -> semi-join (VERDICT r13
# wrong #2)


def _write_docs(tmp_path, rows):
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_substrings_skew_probe_selects_semi_join(spark, tmp_path):
    """Above the extrapolated hot-partition threshold the probe must
    flip to the agg+semi-join shape, and the UNCHANGED oracle must
    still hash-match (the flip is plan-only). A ≥5e7-occurrence gram
    is not constructible in a local fixture, so the threshold is
    test-scaled — the production value is justified by the measured
    100x A/B (window 7.4s vs semi-join 17.6s at 8M-row hot grams:
    below the single-task-sort wall the window wins even on skewed
    corpora; SCALE.md r14)."""
    import duckdb

    from ls_hadoop_3_0_spark.llm import dedup
    from ls_hadoop_3_0_spark.plans.checks import formatted_plan
    from ls_hadoop_3_0_spark.tables import load
    from tests.compare import assert_equivalent

    boiler = "this license header is identical in very many documents here"
    rows = []
    for i in range(400):
        filler = f"unique{i} filler{i} words{i} to vary the body {i} ok fine"
        text = (boiler + " " + filler) if i % 2 == 0 else filler
        rows.append((i, text))
    d = _write_docs(tmp_path, rows)
    docs = load(spark, d, "documents").select("doc_id", "text")

    # production threshold: this corpus's hottest gram extrapolates to
    # ~200 occurrences — far below the sort wall, window shape stays
    dedup._GRAM_SKEW_CACHE.clear()
    assert not dedup._gram_skew_material(docs)

    old = dedup.SUBSTR_SKEW_MIN_HOT
    dedup.SUBSTR_SKEW_MIN_HOT = 100  # test-scaled wall
    try:
        dedup._GRAM_SKEW_CACHE.clear()
        assert dedup._gram_skew_material(docs), "probe must fire scaled"
        df = QUERIES["dedup_substrings"](spark, d)
        plan = formatted_plan(df)
        assert "LeftSemi" in plan, plan  # the skew-safe dup-flag shape

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        odf = con.execute(ORACLES["dedup_substrings"]).fetchdf()
        assert_equivalent(df.toPandas(), odf, key="dedup_substrings")
        con.close()
    finally:
        dedup.SUBSTR_SKEW_MIN_HOT = old
        dedup._GRAM_SKEW_CACHE.clear()


def test_substrings_organic_corpus_keeps_window_shape(spark):
    """The fixture corpus has no hot gram: the probe must NOT fire (the
    window-sum shape stays the organic-corpus winner, SCALE.md r13)."""
    from ls_hadoop_3_0_spark.llm import dedup
    from ls_hadoop_3_0_spark.tables import load

    dedup._GRAM_SKEW_CACHE.clear()
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    assert not dedup._gram_skew_material(docs)


# ---------------------------------------------------------------------------
# knn_ivf_filtered — predicate ∧ top-k over the materialized cell index


def test_ivf_filtered_pushes_both_filters(spark):
    """The serving scan must carry BOTH prunings: cell IN (probed) as a
    PartitionFilter (planning-time directory pruning) and label >= 5 as
    a parquet PushedFilter (row-group stats pruning) — proven on the
    formatted plan and over executed rows."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.similarity import (
        IVF_FILTER_LABEL_MIN,
        ivf_index_path,
    )
    from ls_hadoop_3_0_spark.plans.checks import formatted_plan

    QUERIES["knn_ivf_filtered"](spark, SF_DIR).collect()  # builds the index
    path = ivf_index_path(SF_DIR)
    back = spark.read.schema(
        "vec_id long, label int, u array<double>, cell int"
    ).parquet(path)
    pruned = back.filter(
        F.col("cell").isin([0, 1, 2]) & (F.col("label") >= IVF_FILTER_LABEL_MIN)
    )
    plan = formatted_plan(pruned)
    pf = plan.split("PartitionFilters", 1)[1].splitlines()[0]
    assert "cell" in pf, plan
    assert "GreaterThanOrEqual(label,5)" in plan, plan
    # executed-row proof: only probed-cell files are touched, and no
    # row below the label floor survives the scan
    rows = pruned.select(
        F.input_file_name().alias("f"), "label"
    ).collect()
    assert rows and all(r["label"] >= IVF_FILTER_LABEL_MIN for r in rows)
    assert all(
        any(f"cell={c}/" in r["f"] for c in (0, 1, 2)) for r in rows
    )


def test_ivf_filtered_results_respect_predicate(spark):
    """Every served neighbor must satisfy the metadata predicate (join
    back to the embeddings table), and ranks must be dense per query."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.similarity import IVF_FILTER_LABEL_MIN
    from ls_hadoop_3_0_spark.tables import load

    res = QUERIES["knn_ivf_filtered"](spark, SF_DIR)
    emb = load(spark, SF_DIR, "embeddings").select(
        F.col("vec_id").alias("n_id"), "label"
    )
    joined = res.join(emb, "n_id").collect()
    assert joined and all(
        r["label"] >= IVF_FILTER_LABEL_MIN for r in joined
    )
    by_q = {}
    for r in joined:
        by_q.setdefault(r["q_id"], []).append(r["rnk"])
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), (q, rnks)


def test_recall_filtered_digest_sane(spark):
    """One digest row; recall in [0, 1]; the exact arm counts only
    label-filtered ground truth."""
    rows = QUERIES["knn_recall_filtered"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["method"] == "ivf_filtered"
    assert r["n_queries"] > 0 and r["n_exact"] > 0
    assert 0.0 <= r["recall"] <= 1.0
    assert r["n_hits"] <= r["n_exact"]


# ---------------------------------------------------------------------------
# quality_classifier — in-engine trained linear discriminant


def test_classifier_beats_majority(spark):
    """The learned model must actually separate the classes: accuracy
    strictly above the majority-class rate (the fixture's lang COLUMN
    is text-independent by construction, so the target is the lang_id
    rule's own verdict — the CCNet distillation shape)."""
    r = QUERIES["quality_classifier_eval"](spark, SF_DIR).collect()[0]
    pos = (r["tp"] + r["fn"]) / r["n"]
    majority = max(pos, 1.0 - pos)
    assert r["accuracy"] > majority + 0.05, dict(r.asDict())
    # a real confusion spread, not a degenerate all-one-class model
    assert r["tp"] > 0 and r["tn"] > 0


def test_classifier_single_class_degrade(spark, tmp_path):
    """All-one-class corpus: no discriminant exists — w=0, tau=0, every
    score exactly 0.5, pred=1; the oracle's CASE arms mirror it."""
    import duckdb

    from ls_hadoop_3_0_spark.llm.classifier import QUALITY_CLASSIFIER_SQL
    from tests.compare import assert_equivalent

    rows = [(i, "the and of to is words here") for i in range(20)]
    d = _write_docs(tmp_path, rows)
    sdf = QUERIES["quality_classifier"](spark, d).toPandas()
    assert len(sdf) == 20
    assert set(sdf.score) == {0.5} and set(sdf.pred) == {1}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    odf = con.execute(QUALITY_CLASSIFIER_SQL).fetchdf()
    con.close()
    assert_equivalent(sdf, odf, key="quality_classifier")


def test_classifier_scores_consistent_with_eval(spark):
    """The per-doc key and the eval digest must agree: confusion
    recomputed from quality_classifier's own rows equals the twin's."""
    sdf = QUERIES["quality_classifier"](spark, SF_DIR).toPandas()
    ev = QUERIES["quality_classifier_eval"](spark, SF_DIR).collect()[0]
    assert len(sdf) == ev["n"]
    assert int(((sdf.y == 1) & (sdf.pred == 1)).sum()) == ev["tp"]
    assert int(((sdf.y == 0) & (sdf.pred == 0)).sum()) == ev["tn"]


# ---------------------------------------------------------------------------
# tokenizer_encode / doc_pack_bpe — BPE-vocab token-ID grain


def test_tokenizer_encode_matches_python_reference(spark, tmp_path):
    """Per-doc id sequences pinned against an independent pure-python
    encoder (the r12 BPE reference extended to ids): OOV words (outside
    the [a-z0-9]+ alphabet) must encode as one UNK id 0, learned ids
    are 1-based over the sorted symbol set, and sequences concatenate
    in word order."""
    import hashlib

    import duckdb

    from ls_hadoop_3_0_spark.functions import text as T
    from tests.compare import assert_equivalent
    from tests.test_r12_keys import _ref_bpe

    texts = [
        "aaaa aaa baab aa",
        "aaaa Hello! zz zz",  # 'Hello!' is OOV (uppercase+punct)
        "abab baba aaaa a.b",  # 'a.b' is OOV
        "aaa zz baab abab",
    ]
    rows = list(enumerate(texts))
    d = _write_docs(tmp_path, rows)

    freq: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            if w and __import__("re").fullmatch("[a-z0-9]+", w):
                freq[w] = freq.get(w, 0) + 1
    _, vocab = _ref_bpe(freq, T.BPE_ROUNDS)
    syms = sorted({s for toks in vocab.values() for s in toks})
    sym_id = {s: i + 1 for i, s in enumerate(syms)}

    def enc(text):
        ids = []
        for w in text.split():
            if not w:
                continue
            if w in vocab:
                ids.extend(sym_id[s] for s in vocab[w])
            else:
                ids.append(T.BPE_UNK_ID)
        return ids

    expected = {
        i: (
            len(enc(t)),
            sum(1 for x in enc(t) if x == T.BPE_UNK_ID),
            hashlib.md5(" ".join(map(str, enc(t))).encode()).hexdigest(),
        )
        for i, t in rows
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_unk"], r["ids_md5"])
        for r in QUERIES["tokenizer_encode"](spark, d).collect()
    }
    assert got == expected
    assert sum(g[1] for g in got.values()) == 2  # both OOV words counted

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    for k in ("tokenizer_encode", "doc_pack_bpe"):
        assert_equivalent(
            QUERIES[k](spark, d).toPandas(),
            con.execute(ORACLES[k]).fetchdf(),
            key=k,
        )
    con.close()


def test_doc_pack_bpe_counts_match_encoder(spark):
    """The packing manifest's n_tokens must be EXACTLY the encoder's
    per-doc sequence length (the whole point of the rewire), and the
    pack offsets must chain: pack_start[i+1] = pack_start[i] + n."""
    enc = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["tokenizer_encode"](spark, SF_DIR).collect()
    }
    packed = sorted(
        (r["doc_id"], r["n_tokens"], r["pack_start"])
        for r in QUERIES["doc_pack_bpe"](spark, SF_DIR).collect()
    )
    assert {d: n for d, n, _ in packed} == {
        d: n for d, n in enc.items() if n > 0
    }
    run = 0
    for _, n, start in packed:
        assert start == run
        run += n


# ---------------------------------------------------------------------------
# stream_batch_equiv_interval_join_outer — null-emission-on-expiry


@pytest.mark.streaming
def test_interval_join_outer_emits_null_rows(spark):
    """The left-outer stream-stream interval join must (a) emit MORE
    rows than it matches (unmatched purchases flush as NULL-click rows
    once the watermark closes their window — the availableNow snapshot
    would strand them) and (b) equal the batch left-join twin."""
    r = QUERIES["stream_batch_equiv_interval_join_outer"](
        spark, SF_DIR
    ).collect()[0]
    assert r["matches_batch"] is True
    assert r["n_rows"] > r["n_matched"], dict(r.asDict())
    assert r["n_rows"] > 0


@pytest.mark.streaming
def test_stream_dedup_incremental_constructed(spark, tmp_path):
    """The streaming pass must flag the same constructed duplicates the
    batch operator sees: exact hits via the ck stream-static join, band
    hits via the map-side signature leg; matches_batch is the real
    in-session comparison."""
    t0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t1 = "one two three four five six seven eight nine ten"
    rows = [
        (0, t0),
        (1, t1),
        (2, "hi there"),
        (10, t0),
        (8, t0),  # new: exact + band hits
        (9, t1.rsplit(" ", 1)[0] + " eleven"),  # new: band hits only
        (18, "unique new content nothing like anything prior at all"),
        (19, "hi there"),  # new: exact only (no shingles)
    ]
    d = _write_docs(tmp_path, rows)
    r = QUERIES["stream_dedup_incremental"](spark, d).collect()[0]
    assert r["matches_batch"] is True
    assert r["n_new"] == 4
    assert r["n_exact"] == 2  # docs 8 and 19
    assert r["total_hits"] > 0  # docs 8/9 collide with prior bands


# ---------------------------------------------------------------------------
# pipeline_curation_v4 — the incremental-epoch composition


@pytest.mark.extended  # heavy leg (VERDICT r16 #1): >8 s behavioral pin
def test_v4_manifest_consistent_with_stages(spark):
    """The composed manifest must agree with its stage keys: survivors
    are new-slice docs the classifier passes AND dedup_incremental
    leaves unflagged; token counts equal doc_pack_bpe's; offsets chain
    in doc_id order."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.dedup import INCR_NEW_PRED
    from ls_hadoop_3_0_spark.tables import load

    v4 = {
        r["doc_id"]: r
        for r in QUERIES["pipeline_curation_v4"](spark, SF_DIR).collect()
    }
    assert v4, "fixture new slice must survive non-trivially"
    new_ids = {
        r["doc_id"]
        for r in load(spark, SF_DIR, "documents")
        .filter(F.expr(INCR_NEW_PRED))
        .select("doc_id")
        .collect()
    }
    assert set(v4) <= new_ids
    qc = {
        r["doc_id"]: (r["pred"], r["score"])
        for r in QUERIES["quality_classifier"](spark, SF_DIR).collect()
    }
    inc = {
        r["doc_id"]: (r["exact_dup"], r["n_near"])
        for r in QUERIES["dedup_incremental"](spark, SF_DIR).collect()
    }
    pack = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["doc_pack_bpe"](spark, SF_DIR).collect()
    }
    expected = {
        d
        for d in new_ids
        if qc.get(d, (0, 0.0))[0] == 1 and inc.get(d) == (0, 0)
    }
    assert set(v4) == {d for d in expected if pack.get(d, 0) > 0}
    run = 0
    for d in sorted(v4):
        r = v4[d]
        assert r["score"] == qc[d][1] and r["score"] >= 0.5
        assert r["n_tokens"] == pack[d]
        assert r["pack_start"] == run
        run += r["n_tokens"]


# ---------------------------------------------------------------------------
# dedup_index_compact — the epoch roll


def test_index_compact_never_rescans_prior_text(spark):
    """The merge's scale contract: each merged frame reads the PRIOR
    side from the bucketed index tables and scans documents exactly
    once (the new slice) — the prior corpus text is never re-read or
    re-hashed."""
    from ls_hadoop_3_0_spark.llm.dedup import _compact_frames
    from ls_hadoop_3_0_spark.plans.checks import formatted_plan

    for df, idx in zip(_compact_frames(spark, SF_DIR), ("incr_exact", "incr_bands", "incr_sh")):
        plan = formatted_plan(df)
        assert f".{idx}" in plan, plan
        n_doc_scans = sum(
            1
            for block in plan.split("\n\n")
            if "Location:" in block and "documents.parquet" in block
        )
        # the checkpointed band/shingle stages can mask the new
        # slice's scan behind an ExistingRDD — the contract is
        # "at most one", plus the .incr_ prior-side scan above
        assert n_doc_scans <= 1, plan


def test_index_compact_digest_equals_full_rebuild(spark, tmp_path):
    """On a constructed corpus the merged next-epoch index must equal a
    from-scratch index over the FULL corpus — same class count, same
    min representatives (the oracle proves this at the driver too;
    this pins it on a corpus with real cross-slice duplicates)."""
    t0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, t0),
        (1, "one two three four five six seven"),
        (10, t0),
        (8, t0),  # new slice: same class as prior 0/10
        (9, "brand new content for the next epoch here today"),
        (18, "more new content distinct from everything else now"),
    ]
    d = _write_docs(tmp_path, rows)
    r = QUERIES["dedup_index_compact"](spark, d).collect()[0]
    # classes over the FULL corpus: t0-class + 3 distinct others = 4
    assert r["n_classes"] == 4
    # shingle docs: every doc has >=3 tokens -> 6
    assert r["n_sh_docs"] == 6
    assert r["n_band_rows"] == 6 * 4  # N_BANDS per doc

    import duckdb

    from tests.compare import assert_equivalent

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    assert_equivalent(
        QUERIES["dedup_index_compact"](spark, d).toPandas(),
        con.execute(ORACLES["dedup_index_compact"]).fetchdf(),
        key="dedup_index_compact",
    )
    con.close()
