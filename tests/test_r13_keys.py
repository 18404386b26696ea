"""Round-13 pins.

Covers the ADVICE r12 findings:

- TRUNCATED-corpus PQ degrade (medium): with 0 < #(vec_id < PQ_K) <
  PQ_K init vectors, Spark's ``_pq_train`` returns None and the PQ
  family emits EMPTY results — the oracle chain must do the same (the
  cb0q count guard), never train a partial codebook.
- EXHAUSTED-merge BPE degrade (low): a corpus whose pair supply dries
  up in < BPE_ROUNDS rounds must keep the last real vocabulary on BOTH
  engines (the v{i} CASE guard), never NULL-propagate the oracle's seq.
- BPE symbol-alphabet enforcement (low): words outside ``[a-z0-9]+``
  are filtered identically on both engines, so quote/pipe/backslash
  content can never break the ``|l||r|`` anchoring invariant.
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ls_hadoop_3_0_spark.registry import ORACLES, QUERIES
from tests.compare import assert_equivalent

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


def _write_documents(out, texts, sources=None):
    pa_tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(sources or ["synthetic"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(pa_tbl, os.path.join(out, "documents.parquet"))


def _doc_con(d):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'documents.parquet')}')"
    )
    return con


# ---------------------------------------------------------------------------
# Truncated-corpus PQ degrade


@pytest.fixture(scope="module")
def truncated_pq_dir(tmp_path_factory):
    """Embeddings with only vec_ids 0..9 — fewer than PQ_K=16 init
    vectors, but a NON-empty corpus (the case ADVICE r12 flagged:
    pre-fix, Spark went empty while the oracle trained a partial
    codebook from 10 init vectors)."""
    from ls_hadoop_3_0_spark.llm.similarity import PQ_K

    base = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    import pyarrow.compute as pc

    trunc = base.filter(pc.less(base["vec_id"], PQ_K - 6))
    assert 0 < trunc.num_rows < PQ_K
    out = tmp_path_factory.mktemp("r13_pq_trunc")
    pq.write_table(trunc, os.path.join(out, "embeddings.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "key",
    [
        "embedding_pq_encode",
        "knn_pq",
        "knn_ivfadc",
        "knn_recall_pq",
        "knn_pq_rerank",
        "knn_ivfadc_rerank",
        "knn_recall_rerank",
    ],
)
def test_pq_truncated_corpus_empty_on_both_engines(spark, truncated_pq_dir, key):
    spdf = QUERIES[key](spark, truncated_pq_dir).toPandas()
    assert len(spdf) == 0, f"{key}: Spark must degrade to empty"
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(truncated_pq_dir, 'embeddings.parquet')}')"
    )
    odf = con.execute(ORACLES[key]).fetchdf()
    assert len(odf) == 0, f"{key}: oracle must mirror the empty degrade"


# ---------------------------------------------------------------------------
# Exhausted-merge BPE degrade


@pytest.fixture(scope="module")
def exhausted_bpe_dir(tmp_path_factory):
    """Vocabulary {ab, cd} exhausts after 2 merges (every word becomes a
    single symbol), so rounds 3..BPE_ROUNDS have no pairs — the case
    where the unguarded oracle NULL-propagated every later seq."""
    from ls_hadoop_3_0_spark.functions.text import BPE_ROUNDS

    assert BPE_ROUNDS > 2
    out = tmp_path_factory.mktemp("r13_bpe_exhaust")
    _write_documents(
        str(out),
        ["ab ab cd", "cd ab", "ab cd cd"],
        sources=["s1", "s2", "s1"],
    )
    return str(out)


def test_bpe_exhausted_merges_keep_last_vocabulary(spark, exhausted_bpe_dir):
    from ls_hadoop_3_0_spark.functions.text import bpe_learn

    merges = bpe_learn(spark, exhausted_bpe_dir).toPandas()
    assert len(merges) == 2  # the loop really did stop early
    con = _doc_con(exhausted_bpe_dir)
    for key in ("bpe_learn", "bpe_apply", "bpe_compression"):
        spdf = QUERIES[key](spark, exhausted_bpe_dir).toPandas()
        odf = con.execute(ORACLES[key]).fetchdf()
        assert_equivalent(spdf, odf, key)
    seg = (
        QUERIES["bpe_apply"](spark, exhausted_bpe_dir)
        .toPandas()
        .set_index("word")["seg"]
    )
    assert seg["ab"] == "ab" and seg["cd"] == "cd"


# ---------------------------------------------------------------------------
# BPE symbol-alphabet enforcement


@pytest.fixture(scope="module")
def hostile_words_dir(tmp_path_factory):
    """Corpus containing words with a quote, a pipe, a backslash and an
    uppercase letter — all outside the documented [a-z0-9]+ alphabet.
    Both engines must drop them from the vocabulary (and from the
    bpe_compression join) rather than let them near the serialized
    ``|l||r|`` replace."""
    out = tmp_path_factory.mktemp("r13_bpe_hostile")
    _write_documents(
        str(out),
        ["ab o'brien ab cd", "a|b ab cd back\\slash", "Upper ab cd cd ab"],
        sources=["s1", "s2", "s1"],
    )
    return str(out)


def test_bpe_alphabet_filter_parity(spark, hostile_words_dir):
    con = _doc_con(hostile_words_dir)
    for key in ("bpe_learn", "bpe_apply", "bpe_compression"):
        spdf = QUERIES[key](spark, hostile_words_dir).toPandas()
        odf = con.execute(ORACLES[key]).fetchdf()
        assert_equivalent(spdf, odf, key)
    vocab = set(
        QUERIES["bpe_apply"](spark, hostile_words_dir).toPandas()["word"]
    )
    assert vocab == {"ab", "cd"}


# ---------------------------------------------------------------------------
# knn_pq_rerank / knn_ivfadc_rerank — ADC shortlist + exact re-rank


def test_rerank_recall_floor(spark):
    """The whole point of the re-rank rungs: servable recall. Deterministic
    fixtures ⇒ recall is a constant — measured 0.96/0.96 at sf0.001 and
    0.92/0.92 at sf0.01 (r13); floor at the design target 0.9."""
    from ls_hadoop_3_0_spark.llm.similarity import knn_recall_rerank

    rows = {r["method"]: r for r in knn_recall_rerank(spark, SF_DIR).collect()}
    assert set(rows) == {"pq_rerank", "ivfadc_rerank"}
    for m, r in rows.items():
        assert r["recall"] >= 0.9, f"{m} recall below servable floor: {r['recall']}"


@pytest.mark.extended  # heavy leg (VERDICT r16 #1): >8 s behavioral pin
def test_rerank_batch_layout_invariance(spark):
    """The per-batch top-R superset + pairwise exact fold must make both
    re-rank keys independent of Arrow batch boundaries (batches smaller
    than R exercise the kth-clamp and the inf-pad filter)."""
    from ls_hadoop_3_0_spark.llm import similarity as S

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)

    def snap(fn):
        return {
            (r["q_id"], r["n_id"], r["cosine"], r["rnk"])
            for r in fn(spark, SF_DIR).collect()
        }

    base_pq = snap(S.knn_pq_rerank)
    base_ivf = snap(S.knn_ivfadc_rerank)
    try:
        spark.conf.set(key, "7")
        assert snap(S.knn_pq_rerank) == base_pq
        assert snap(S.knn_ivfadc_rerank) == base_ivf
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert len(base_pq) > 0 and len(base_ivf) > 0


def test_rerank_tops_are_exact_cosine_on_shortlist_members(spark):
    """Every re-ranked row must carry the EXACT rounded cosine knn_cosine
    computes for the same pair (the re-rank is a refinement, not a new
    score), and rnk must be dense 1..k per query."""
    from ls_hadoop_3_0_spark.llm.similarity import (
        BOUNDED_PANEL_SQL,
        knn_cosine,
        knn_pq_rerank,
    )

    exact = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in knn_cosine(spark, SF_DIR, panel=BOUNDED_PANEL_SQL).collect()
    }
    rr = knn_pq_rerank(spark, SF_DIR).toPandas()
    hits = 0
    for _, row in rr.iterrows():
        k = (row["q_id"], row["n_id"])
        if k in exact:  # pair also in exact top-k -> scores must agree
            assert exact[k] == row["cosine"]
            hits += 1
    assert hits > 0
    ranks = rr.groupby("q_id")["rnk"].apply(lambda s: sorted(s))
    assert all(list(v) == list(range(1, len(v) + 1)) for v in ranks)


# ---------------------------------------------------------------------------
# dedup_substrings — substring-grain dedup (Lee et al. span transform)


def _ref_substrings(texts: dict[int, str], k: int):
    """Independent pure-Python reference: corpus gram counts (within-doc
    repeats count), duplicated starts, islands (next ≤ prev + k),
    covered-position set, and the additive u24(md5(pos:tok)) digest over
    retained 1-based positions."""
    import hashlib
    from collections import Counter

    toks = {i: [w for w in t.split(" ") if w] for i, t in texts.items()}
    cnt: Counter = Counter()
    for ts in toks.values():
        for p in range(len(ts) - k + 1):
            cnt[" ".join(ts[p : p + k])] += 1

    def u24(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)

    out = {}
    for i, ts in toks.items():
        starts = [
            p
            for p in range(len(ts) - k + 1)
            if cnt[" ".join(ts[p : p + k])] >= 2
        ]
        spans, prev = 0, None
        covered: set = set()
        for p in starts:
            if prev is None or p - prev > k:
                spans += 1
            prev = p
            covered.update(range(p, p + k))
        retained_sig = sum(
            u24(f"{p + 1}:{tok}")
            for p, tok in enumerate(ts)
            if p not in covered
        )
        out[i] = (
            len(ts),
            spans,
            len(covered),
            len(ts) - len(covered),
            retained_sig,
        )
    return out


@pytest.fixture(scope="module")
def adversarial_span_dir(tmp_path_factory):
    """Overlap-adversarial substring corpus: a within-doc repeated span
    (doc 0 repeats its own 8-gram), a cross-doc copied block straddling
    different offsets, two ADJACENT duplicated spans that must merge
    into one island, a doc shorter than K, and a clean doc."""
    shared = "q w e r t y u i"  # an 8-token block copied across docs
    shared2 = "z x c v b n m k"
    texts = [
        # doc 0: the same 8-gram appears twice WITHIN the doc
        "a1 a2 " + shared + " mid " + shared + " tail1 tail2",
        # doc 1: carries the block at a different offset
        "b1 " + shared + " b2 b3",
        # doc 2: two duplicated blocks back-to-back -> one merged island
        shared + " " + shared2,
        # doc 3: the second block, elsewhere
        "c1 c2 c3 " + shared2 + " c4",
        # doc 4: shorter than K tokens
        "tiny doc",
        # doc 5: clean, nothing duplicated
        "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10",
    ]
    out = tmp_path_factory.mktemp("r13_spans")
    _write_documents(str(out), texts)
    return str(out), {i: t for i, t in enumerate(texts)}


def test_dedup_substrings_matches_reference(spark, adversarial_span_dir):
    from ls_hadoop_3_0_spark.llm.dedup import SUBSTR_K, dedup_substrings

    d, texts = adversarial_span_dir
    ref = _ref_substrings(texts, SUBSTR_K)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_spans"],
            r["dropped_tokens"],
            r["retained_tokens"],
            r["retained_sig"],
        )
        for r in dedup_substrings(spark, d).collect()
    }
    assert got == ref
    # the adversarial cases really fired:
    assert ref[0][1] >= 1 and ref[0][2] > 0  # within-doc repeat dropped
    assert ref[2][1] == 1  # adjacent blocks merged into ONE island
    assert ref[4] == (2, 0, 0, 2, ref[4][4])  # short doc untouched
    assert ref[5][2] == 0  # clean doc untouched


def test_dedup_substrings_oracle_parity_adversarial(spark, adversarial_span_dir):
    d, _ = adversarial_span_dir
    con = _doc_con(d)
    spdf = QUERIES["dedup_substrings"](spark, d).toPandas()
    odf = con.execute(ORACLES["dedup_substrings"]).fetchdf()
    assert_equivalent(spdf, odf, "dedup_substrings")


# ---------------------------------------------------------------------------
# normalized_embeddings_np — the full-corpus numpy normalization twin


def test_np_normalize_bit_identical_to_hof(spark):
    """normalized_embeddings_np must produce BIT-identical u to the
    HOF expression form — including NULL, ragged, empty, and all-zero
    vectors (the degrade surface) and adversarially small/large floats."""
    import math

    import pandas as pd

    from ls_hadoop_3_0_spark.llm.embeddings import (
        DIM,
        normalized_embeddings,
        normalized_embeddings_np,
    )

    import numpy as np

    rng = np.random.default_rng(13)
    rows = []
    for i in range(40):
        v = (rng.normal(0, 1, DIM) * 10.0 ** rng.integers(-20, 20)).astype(
            np.float32
        )
        rows.append((i, int(i % 5), [float(x) for x in v]))
    rows.append((100, 0, None))  # NULL vector
    rows.append((101, 1, [1.0, 2.0, 3.0]))  # ragged
    rows.append((102, 2, []))  # empty
    rows.append((103, 3, [0.0] * DIM))  # zero norm -> NaN elements
    emb = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [r[0] for r in rows],
                "label": pd.array([r[1] for r in rows], dtype="int32"),
                "embedding": [r[2] for r in rows],
            }
        )
    )
    hof = {r["vec_id"]: r["u"] for r in normalized_embeddings(emb).collect()}
    npv = {r["vec_id"]: r["u"] for r in normalized_embeddings_np(emb).collect()}
    assert set(hof) == set(npv)
    for k in hof:
        a, b = hof[k], npv[k]
        if a is None or b is None:
            assert a == b, k
            continue
        assert len(a) == len(b), k
        for x, y in zip(a, b):
            if x is None or y is None:
                assert x == y, k  # zero-norm NULL elements, both forms
            elif math.isnan(x) or math.isnan(y):
                assert math.isnan(x) and math.isnan(y), k
            else:
                assert x == y, (k, x, y)


def test_dedup_embedding_stats_consistent_with_pairs(spark):
    """On a duplicate-heavy corpus (collapse path fires) the class-stat
    summary must equal the aggregate of the EXPANDED pair stream —
    pair counts, touched-vector counts, and cosine mass per label."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm import dedup
    from ls_hadoop_3_0_spark.llm.embeddings import normalized_embeddings_np
    from ls_hadoop_3_0_spark.tables import load

    base = load(spark, SF_DIR, "embeddings")
    dup = base.unionAll(
        base.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"),
            *[c for c in base.columns if c != "vec_id"],
        )
    )
    pairs = dedup.embedding_pairs(normalized_embeddings_np(dup)).localCheckpoint()
    lv = dup.select("vec_id", "label")
    lab = pairs.join(
        lv.withColumnRenamed("vec_id", "vec_a"), "vec_a"
    ).select(
        "label",
        "vec_a",
        "vec_b",
        F.round(F.col("cosine") * F.lit(1000000.0)).cast("long").alias("cmu"),
    )
    from_pairs = {
        r["label"]: (r["np"], r["tv"], r["cs"])
        for r in lab.groupBy("label")
        .agg(F.count(F.lit(1)).alias("np"), F.sum("cmu").alias("cs"))
        .join(
            lab.select("label", F.explode(F.array("vec_a", "vec_b")).alias("v"))
            .distinct()
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("tv")),
            "label",
        )
        .collect()
    }
    # run the stats key's class-grain derivation on the same dup corpus
    e, parts = dedup._embedding_class_parts(
        normalized_embeddings_np(dup), dedup.EMB_COSINE_T
    )
    assert parts is not None, "collapse must fire on the dup corpus"
    # reuse the registered key's assembly by monkey-free direct call is
    # not possible (it loads from sf_dir), so recompute via the public
    # stats pipeline pieces:
    member, rep_pairs, reps_ok = parts
    cls = member.groupBy("rep").agg(F.count(F.lit(1)).alias("cnt"))
    rep_lab = lv.withColumnRenamed("vec_id", "rep")
    cmu = F.round(F.col("cosine") * F.lit(1000000.0)).cast("long")
    inter = (
        rep_pairs.join(
            cls.select(F.col("rep").alias("vec_a"), F.col("cnt").alias("ca")),
            "vec_a",
        )
        .join(
            cls.select(F.col("rep").alias("vec_b"), F.col("cnt").alias("cb")),
            "vec_b",
        )
        .join(rep_lab.withColumnRenamed("rep", "vec_a"), "vec_a")
        .select(
            "label",
            (F.col("ca") * F.col("cb")).cast("long").alias("np"),
            (cmu * F.col("ca") * F.col("cb")).cast("long").alias("cs"),
        )
    )
    intra = (
        reps_ok.join(cls, "rep")
        .filter(F.col("cnt") >= 2)
        .join(rep_lab, "rep")
        .select(
            "label",
            F.expr("cnt * (cnt - 1) div 2").cast("long").alias("np"),
            (cmu * F.expr("cnt * (cnt - 1) div 2")).cast("long").alias("cs"),
        )
    )
    npagg = (
        inter.unionAll(intra)
        .groupBy("label")
        .agg(F.sum("np").alias("np"), F.sum("cs").alias("cs"))
    )
    touched = (
        rep_pairs.select(F.col("vec_a").alias("rep"))
        .unionAll(rep_pairs.select(F.col("vec_b").alias("rep")))
        .unionAll(
            reps_ok.join(cls, "rep").filter(F.col("cnt") >= 2).select("rep")
        )
        .distinct()
    )
    tv = (
        touched.join(cls, "rep")
        .join(rep_lab, "rep")
        .groupBy("label")
        .agg(F.sum("cnt").alias("tv"))
    )
    from_classes = {
        r["label"]: (r["np"], r["tv"], r["cs"])
        for r in npagg.join(tv, "label").collect()
    }
    assert from_classes == from_pairs and len(from_pairs) > 0


# ---------------------------------------------------------------------------
# knn_ivf_indexed — materialized cell-partitioned index + pruned serving


def test_ivf_index_partition_pruning(spark):
    """The on-disk index must be laid out one directory per cell, and a
    probe-set read-back must prune unprobed partitions at PLANNING time
    (PartitionFilters on cell + a strictly smaller input-file set)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.similarity import ivf_index_path
    from ls_hadoop_3_0_spark.plans.checks import formatted_plan

    QUERIES["knn_ivf_indexed"](spark, SF_DIR).collect()  # builds the index
    path = ivf_index_path(SF_DIR)
    cells = sorted(glob.glob(os.path.join(path, "cell=*")))
    assert len(cells) >= 4, f"index not cell-partitioned: {cells}"
    back = spark.read.schema("vec_id long, u array<double>, cell int").parquet(
        path
    )
    pruned = back.filter(F.col("cell").isin([0, 1, 2]))
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1
    )[1].splitlines()[0], plan
    # the EXECUTED scan reads only probed-cell files (inputFiles() is
    # pre-pruning metadata, so the proof uses input_file_name over the
    # rows actually produced)
    pruned_files = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    all_files = {
        r[0] for r in back.select(F.input_file_name()).distinct().collect()
    }
    assert pruned_files and pruned_files < all_files
    assert all(
        any(f"cell={c}/" in f for c in (0, 1, 2)) for f in pruned_files
    ), sorted(pruned_files)[:3]


def test_ivf_indexed_equals_transient(spark):
    """The index is a LAYOUT, not a semantics: served results must equal
    knn_ivf's exactly (same oracle, same rows)."""
    a = {
        (r["q_id"], r["n_id"], r["cosine"], r["rnk"])
        for r in QUERIES["knn_ivf_indexed"](spark, SF_DIR).collect()
    }
    b = {
        (r["q_id"], r["n_id"], r["cosine"], r["rnk"])
        for r in QUERIES["knn_ivf"](spark, SF_DIR).collect()
    }
    assert a == b and len(a) > 0
