"""Round-12 pins.

Covers the ADVICE r11 finding on the vectorized nearest-centroid
assignment (ls_hadoop_3_0_spark/llm/embeddings.py): a ragged or NULL
embedding vector must degrade to a NULL pred_label/dist2 row — the row
the pre-r11 SQL zip_with/aggregate fold produced — never an np.stack
task failure inside mapInPandas.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ls_hadoop_3_0_spark.llm import embeddings as emb

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def malformed_dir(tmp_path_factory):
    """sf0.001 embeddings + one NULL vector + one 3-dim vector."""
    base = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    etype = base.schema.field("embedding").type
    extra = pa.table(
        {
            "vec_id": pa.array([1_000_001, 1_000_002], type=pa.int64()),
            "embedding": pa.array([None, [1.0, 2.0, 3.0]], type=etype),
            "label": pa.array([0, 1], type=pa.int32()),
        }
    )
    out = tmp_path_factory.mktemp("r12_malformed")
    pq.write_table(
        pa.concat_tables([base.select(extra.column_names), extra]),
        os.path.join(out, "embeddings.parquet"),
    )
    return str(out)


def test_malformed_embedding_degrades_to_null_row(spark, malformed_dir):
    pdf = emb.knn_centroid_classify(spark, malformed_dir).toPandas()
    assert len(pdf) == 502
    bad = pdf[pdf["vec_id"] >= 1_000_001].set_index("vec_id")
    assert len(bad) == 2
    # Both malformed rows survive with NULL pred/dist2 (not a task
    # failure, not a dropped row).
    assert bad["pred_label"].isna().all()
    assert bad["dist2"].isna().all()
    good = pdf[pdf["vec_id"] < 1_000_001]
    assert good["pred_label"].notna().all()
    assert good["dist2"].notna().all()


def test_wellformed_rows_unchanged_by_degrade_guard(spark, malformed_dir):
    """The guard must not perturb well-formed assignments.

    Centroids on the malformed dir differ slightly (the 3-dim row
    contributes to label 1's first three positions), so compare
    against the clean fixture only for labels the malformed rows never
    touch — their centroid inputs are bit-identical in both runs.
    """
    clean = emb.knn_centroid_classify(spark, SF_DIR).toPandas()
    dirty = emb.knn_centroid_classify(spark, malformed_dir).toPandas()
    c = clean.set_index("vec_id").sort_index()
    d = dirty[dirty["vec_id"] < 1_000_001].set_index("vec_id").sort_index()
    # dist2 to every centroid changes only via label-1's mean; rows
    # whose clean AND dirty prediction is not label 1 must agree on the
    # predicted label set at minimum.
    both_not1 = (c["pred_label"] != 1) & (d["pred_label"] != 1)
    assert both_not1.sum() > 0
    assert (c.loc[both_not1, "pred_label"] == d.loc[both_not1, "pred_label"]).all()


# ---------------------------------------------------------------------------
# bpe_learn / bpe_apply — iterative BPE merge learning


def _ref_bpe(word_freq: dict[str, int], rounds: int):
    """Independent pure-Python greedy BPE — the semantics both engines
    must reproduce: count adjacent pairs (overlapping) weighted by word
    frequency, merge the (count DESC, pair ASC) argmax greedily
    left-to-right (non-overlapping, scanning per word), repeat."""
    vocab = {w: [c for c in w] for w in word_freq}
    merges = []
    for rnd in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_freq[w]
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, left, right, left + right, cnt))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.fixture(scope="module")
def adversarial_bpe_dir(tmp_path_factory):
    """Corpus stressing greedy-merge overlap: runs of a repeated char
    ('aaaa' must merge to [aa, aa], 'aaa' to [aa, a]) and pairs that
    tie on count (tie-break = lexicographic pair)."""
    texts = [
        "aaaa aaa baab aa",
        "aaaa aaaa zz zz zz",
        "abab baba aaaa",
        "aaa zz baab abab",
    ]
    out = tmp_path_factory.mktemp("r12_bpe")
    pa_tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["synthetic"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(pa_tbl, os.path.join(out, "documents.parquet"))
    freq: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    return str(out), freq


def test_bpe_matches_reference_implementation(spark, adversarial_bpe_dir):
    from ls_hadoop_3_0_spark.functions import text as T

    d, freq = adversarial_bpe_dir
    ref_merges, ref_vocab = _ref_bpe(freq, T.BPE_ROUNDS)

    got = [
        (r["merge_round"], r["lft"], r["rgt"], r["merged"], r["pair_count"])
        for r in T.bpe_learn(spark, d).collect()
    ]
    assert got == ref_merges

    seg = {r["word"]: (r["seg"], r["n_tokens"]) for r in T.bpe_apply(spark, d).collect()}
    assert seg == {
        w: (" ".join(toks), len(toks)) for w, toks in ref_vocab.items()
    }
    # The overlap cases specifically: after ONE round, greedy
    # left-to-right (not replace-once, not exhaustive re-scan). The
    # engines are pinned to the reference above, and the reference's
    # greediness is pinned here — by round 6 'aaaa' legitimately becomes
    # a single token via a later (aa, aa) merge.
    _, vocab_r1 = _ref_bpe(freq, 1)
    assert vocab_r1["aaaa"] == ["aa", "aa"]
    assert vocab_r1["aaa"] == ["aa", "a"]


def test_bpe_oracle_parity_on_adversarial_corpus(spark, adversarial_bpe_dir):
    import duckdb

    from ls_hadoop_3_0_spark.registry import ORACLES, QUERIES
    from tests.compare import assert_equivalent

    d, _ = adversarial_bpe_dir
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'documents.parquet')}')"
    )
    for key in ("bpe_learn", "bpe_apply"):
        spdf = QUERIES[key](spark, d).toPandas()
        odf = con.execute(ORACLES[key]).fetchdf()
        assert_equivalent(spdf, odf, key)


# ---------------------------------------------------------------------------
# embedding_pq_encode / knn_pq — trained product quantization + ADC


def test_knn_pq_batch_layout_invariance(spark):
    """The per-batch top-k SUPERSET emission must make the result
    independent of Arrow batch boundaries (including batches smaller
    than TOP_K, which exercise the kth-clamp and the inf-pad filter)."""
    from ls_hadoop_3_0_spark.llm import similarity as S

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    base = {
        (r["q_id"], r["n_id"], r["adist"], r["rnk"])
        for r in S.knn_pq(spark, SF_DIR).collect()
    }
    try:
        spark.conf.set(key, "7")
        tiny = {
            (r["q_id"], r["n_id"], r["adist"], r["rnk"])
            for r in S.knn_pq(spark, SF_DIR).collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert base == tiny
    assert len(base) > 0


@pytest.fixture(scope="module")
def dup_vectors_dir(tmp_path_factory):
    """sf0.001 embeddings + exact copies of vec_ids 20..29 under new ids
    (not in the codebook range, not on the query panel) — every copy
    ties its original's adist EXACTLY, stressing the (adist, n_id)
    tie-break through both engines."""
    base = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    import pyarrow.compute as pc

    dup = base.filter(
        pc.and_(pc.greater_equal(base["vec_id"], 20), pc.less(base["vec_id"], 30))
    )
    dup = dup.set_column(
        0, "vec_id", pc.add(dup["vec_id"], pa.scalar(10_000, type=pa.int64()))
    )
    out = tmp_path_factory.mktemp("r12_pq_dup")
    pq.write_table(
        pa.concat_tables([base, dup]), os.path.join(out, "embeddings.parquet")
    )
    return str(out)


def test_knn_pq_tie_break_oracle_parity_on_duplicates(spark, dup_vectors_dir):
    import duckdb

    from ls_hadoop_3_0_spark.registry import ORACLES, QUERIES
    from tests.compare import assert_equivalent

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(dup_vectors_dir, 'embeddings.parquet')}')"
    )
    for key in ("embedding_pq_encode", "knn_pq"):
        spdf = QUERIES[key](spark, dup_vectors_dir).toPandas()
        odf = con.execute(ORACLES[key]).fetchdf()
        assert_equivalent(spdf, odf, key)
    # and the duplicates really did collide: every duplicated id carries
    # the same code_word as its original.
    enc = (
        QUERIES["embedding_pq_encode"](spark, dup_vectors_dir)
        .toPandas()
        .set_index("vec_id")["code_word"]
    )
    for vid in range(20, 30):
        assert enc[vid] == enc[vid + 10_000]


def test_knn_pq_recall_floor(spark):
    """ADC on unit vectors approximates cosine ranking: recall@10 vs the
    exact knn_cosine baseline must clear the LSH rung's historical floor."""
    from ls_hadoop_3_0_spark.llm import similarity as S

    pq_pairs = {
        (r["q_id"], r["n_id"]) for r in S.knn_pq(spark, SF_DIR).collect()
    }
    exact = {
        (r["q_id"], r["n_id"]) for r in S.knn_cosine(spark, SF_DIR).collect()
    }
    assert len(exact) > 0
    recall = len(pq_pairs & exact) / len(exact)
    assert recall >= 0.15, recall


def test_knn_ivfadc_batch_layout_invariance_and_pq_consistency(spark):
    """IVFADC must be batch-layout-invariant like knn_pq, and every
    (q, n) pair it shares with knn_pq must carry the IDENTICAL adist
    (same codes, same LUT — the cell filter only prunes candidates)."""
    from ls_hadoop_3_0_spark.llm import similarity as S

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    base = {
        (r["q_id"], r["n_id"]): (r["adist"], r["rnk"])
        for r in S.knn_ivfadc(spark, SF_DIR).collect()
    }
    try:
        spark.conf.set(key, "7")
        tiny = {
            (r["q_id"], r["n_id"]): (r["adist"], r["rnk"])
            for r in S.knn_ivfadc(spark, SF_DIR).collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert base == tiny
    assert len(base) > 0

    pq_res = {
        (r["q_id"], r["n_id"]): r["adist"]
        for r in S.knn_pq(spark, SF_DIR).collect()
    }
    shared = set(base) & set(pq_res)
    assert shared, "probed cells should retain some of the PQ top-k"
    for pair in shared:
        assert base[pair][0] == pq_res[pair]


def test_ivf_numpy_training_identical_to_hof_training(spark):
    """_ivf_train_np must return the EXACT centroids train_centroids
    returns (same sample, same engine-side scaled-long means, same
    post-processing) — the assignment fold identity end-to-end."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm import similarity as S
    from ls_hadoop_3_0_spark.llm.embeddings import normalized_embeddings
    from ls_hadoop_3_0_spark.session import prepare
    from ls_hadoop_3_0_spark.tables import load

    prepare(spark)
    e_u = normalized_embeddings(load(spark, SF_DIR, "embeddings")).select(
        "vec_id", "u"
    )
    hof = S.train_centroids(e_u)
    np_ = S._ivf_train_np(spark, SF_DIR)
    assert hof == np_


def test_knn_cosine_batch_layout_invariance_and_dup_ties(spark, dup_vectors_dir):
    """The numpy-fold knn_cosine must be batch-layout-invariant (the
    2e-6 superset margin keeps post-round ties across batch boundaries)
    and tie-break duplicated vectors identically to the DuckDB oracle."""
    import duckdb

    from ls_hadoop_3_0_spark.llm import similarity as S
    from ls_hadoop_3_0_spark.registry import ORACLES, QUERIES
    from tests.compare import assert_equivalent

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    base = {
        (r["q_id"], r["n_id"], r["cosine"], r["rnk"])
        for r in S.knn_cosine(spark, SF_DIR).collect()
    }
    try:
        spark.conf.set(key, "7")
        tiny = {
            (r["q_id"], r["n_id"], r["cosine"], r["rnk"])
            for r in S.knn_cosine(spark, SF_DIR).collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert base == tiny
    assert len(base) > 0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(dup_vectors_dir, 'embeddings.parquet')}')"
    )
    spdf = QUERIES["knn_cosine"](spark, dup_vectors_dir).toPandas()
    odf = con.execute(ORACLES["knn_cosine"]).fetchdf()
    assert_equivalent(spdf, odf, "knn_cosine")


# ---------------------------------------------------------------------------
# scan_python_pushdown_arrow — pushFilters + RecordBatch in one reader


def test_pushdown_arrow_reader_prunes_and_batches(spark):
    """2 of 8 partitions planned (filters consumed at plan time), and
    the ragged tail MOVES with the pushed row_id cap: part 6 generates
    only 1000 rows (12000..12999), so its final batch is 488 rows where
    the unpruned Arrow sibling's is 464 — evidence that batching ran
    over the filter-bounded range, not the full partition."""
    from ls_hadoop_3_0_spark.sources.io import (
        _pyds_pushdown_arrow_scan,
        scan_python_pushdown_arrow,
    )

    scan = _pyds_pushdown_arrow_scan(spark)
    assert scan.rdd.getNumPartitions() == 2

    rows = {
        r["part"]: r
        for r in scan_python_pushdown_arrow(spark, SF_DIR).collect()
    }
    assert set(rows) == {5, 6}
    assert rows[5]["min_batch_rows"] == 464  # full 2000-row range tail
    assert rows[6]["min_batch_rows"] == 488  # 1000-row BOUNDED range tail
    assert rows[5]["max_batch_rows"] == rows[6]["max_batch_rows"] == 512
    assert rows[5]["filters_pushed"] == rows[6]["filters_pushed"] == 2
