"""Dedup-operator semantics on CONSTRUCTED near-duplicates.

The oracle-parity gate proves Spark↔DuckDB agreement on fixture data;
these tests pin the *intended semantics* (near-dups found, unrelated
docs not) on documents we control, plus a pure-Python minhash reference
(SURVEY.md §7 risk 2).
"""

from __future__ import annotations

import hashlib

import pytest

from ls_hadoop_3_0_spark.llm import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles watch from a mossy stone bridge near the river"
)
NEAR = BASE.replace("mossy stone", "mossy old stone")  # one insertion
OTHER = (
    "completely different content about distributed query engines "
    "optimizing shuffle exchanges and broadcast joins at scale today"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE, "en", "srcA", len(BASE)),
        (2, NEAR, "en", "srcA", len(NEAR)),
        (3, OTHER, "en", "srcA", len(OTHER)),
        (4, BASE, "en", "srcB", len(BASE)),  # exact copy of 1
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_minhash_finds_near_and_exact_pairs(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_pairs(docs, threshold=0.4).collect()
    }
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # identical docs
    assert (1, 2) in pairs and 0.4 <= pairs[(1, 2)] < 1.0  # near-dup
    assert all(3 not in p for p in pairs)  # unrelated never pairs


def test_minhash_signature_matches_python_reference(docs):
    """Spark's per-doc min-hashes == a straightforward Python impl."""
    row = (
        dedup._shingled(docs)
        .filter("doc_id = 1")
        .selectExpr(
            "transform(sequence(0, 11), s -> array_min(transform(shingles,"
            " g -> md5(concat(cast(s as string), ':', g))))) AS mins",
            "shingles",
        )
        .collect()[0]
    )
    words = BASE.split()
    shingles = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
    expected = [
        min(hashlib.md5(f"{s}:{g}".encode()).hexdigest() for g in shingles)
        for s in range(12)
    ]
    assert row["mins"] == expected


def test_exact_dedup_groups_identical_docs(spark, docs):
    docs.createOrReplaceTempView("_docs_exact")
    out = spark.sql(
        "SELECT md5(lower(trim(text))) AS h, min(doc_id) AS keeper, count(*) AS n "
        "FROM _docs_exact GROUP BY 1"
    ).collect()
    by_keeper = {r["keeper"]: r["n"] for r in out}
    assert by_keeper[1] == 2  # docs 1 and 4 collapse
    assert by_keeper[2] == 1 and by_keeper[3] == 1


def _py_simhash64(text: str) -> str:
    """Independent reference: 64-bit majority-vote simhash, hex-encoded."""
    votes = [0] * 64
    for tok in {t for t in text.split(" ") if t}:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
        for i in range(64):
            votes[i] += 1 if (h >> (63 - i)) & 1 else -1
    bits = 0
    for i in range(64):
        bits = (bits << 1) | (1 if votes[i] > 0 else 0)
    return f"{bits:016x}"


def _ham_hex(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def test_simhash_identical_docs_share_signature(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[4]
    assert len(sigs[1]) == 16 and set(sigs[1]) <= set("0123456789abcdef")
    # Spark signature == the independent pure-Python derivation
    assert sigs[1] == _py_simhash64(BASE)
    assert sigs[3] == _py_simhash64(OTHER)
    # near-dup differs in few bits; unrelated differs in more
    assert _ham_hex(sigs[1], sigs[2]) <= _ham_hex(sigs[1], sigs[3])


def test_simhash_banded_probe_finds_near_dups(spark, docs):
    """Near-dups land in a probed band; unrelated docs never pair.

    A 120-token doc with ONE replaced token has hamming 1 (verified by
    the pure-Python reference) — the banded pigeonhole must surface it.
    BASE→NEAR is hamming 4 for these short docs: just past the ≤3
    radius, so it must NOT be reported — the exact-verify contract.
    """
    long_base = " ".join(f"tok{i}" for i in range(120))
    long_near = long_base.replace("tok3 ", "tokX3 ", 1)
    extra = spark.createDataFrame(
        [(5, long_base, "en", "srcA", 0), (6, long_near, "en", "srcA", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    all_docs = docs.unionByName(extra)
    assert (
        _ham_hex(_py_simhash64(long_base), _py_simhash64(long_near)) <= 3
        < _ham_hex(_py_simhash64(BASE), _py_simhash64(NEAR))
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_hamming_pairs(all_docs).collect()
    }
    assert pairs.get((1, 4)) == 0  # identical docs: hamming 0
    assert (5, 6) in pairs and pairs[(5, 6)] <= 3  # near-dup within radius
    assert (1, 2) not in pairs  # hamming 4: candidate at most, verified out
    assert all(3 not in p for p in pairs)  # unrelated: no shared band


def test_simhash_64bit_space_does_not_collapse(spark):
    """100 unrelated docs → 100 distinct signatures and ~0 band pairs.

    The 16-bit predecessor had 65,536 buckets — at scale every bucket
    held unrelated docs. With 64 bits the signature space (2^64) keeps
    chance collisions (even per 16-bit band) negligible.
    """
    rows = [
        (i, f"unrelated{i}x alpha{i} beta{i} gamma{i} delta{i} eps{i}", "en", "s", 0)
        for i in range(100)
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sigs = [r["simhash"] for r in dedup.simhash_signatures(d).collect()]
    assert len(set(sigs)) == 100
    assert dedup.simhash_hamming_pairs(d).count() == 0


def test_connected_components_on_known_graph(spark):
    """Chain 1-2-3, isolated pair 10-11 → two components with min labels."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    comps = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_logarithmic_on_path_graph(spark):
    """A 65-node path converges in O(log n) rounds, not O(diameter).

    Min-label propagation needs ~64 rounds here (labels travel one hop
    per round); the alternating large-star/small-star halves chain
    length per round, so 65 nodes must finish in ≲ 2·log2(65)+2 rounds.
    """
    n = 65
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "doc_a long, doc_b long"
    )
    labels, rounds = dedup._connected_components_impl(pairs)
    comps = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert comps == {i: 1 for i in range(1, n + 1)}
    assert rounds <= 14, f"took {rounds} rounds — not logarithmic"


def test_connected_components_reversed_and_shuffled_edges(spark):
    """Edge orientation must not matter; components stay exact."""
    pairs = spark.createDataFrame(
        [(9, 4), (4, 7), (2, 9), (30, 20), (20, 30), (5, 5)],
        "doc_a long, doc_b long",
    )
    comps = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert comps == {2: 2, 4: 2, 7: 2, 9: 2, 20: 20, 30: 20, 5: 5}


def test_ngram_df_cap_bounds_candidates_under_stopgram_skew(spark):
    """A stop-gram shared by 60 docs must NOT emit C(60,2) candidates.

    The adversarial corpus: one source where every doc starts with the
    same boilerplate trigram ("terms of service") followed by unique
    content, plus one genuine near-dup pair sharing rare grams. With the
    DF cap the candidate set collapses to the one real pair; without it
    the stop-gram alone manufactures the full quadratic blowup.
    """
    rows = [
        (i, f"terms of service unique{i}a unique{i}b unique{i}c", "en", "src", 0)
        for i in range(60)
    ]
    rows += [
        (1000, "alpha beta gamma delta epsilon zeta", "en", "src", 0),
        (1001, "alpha beta gamma delta epsilon eta", "en", "src", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sh = dedup._grammed(docs)
    uncapped = dedup.ngram_candidates(sh, max_df=10**9).count()
    capped = dedup.ngram_candidates(sh, max_df=50).count()
    assert uncapped >= 60 * 59 // 2  # quadratic without the cap
    assert capped == 1  # sub-quadratic: only the genuine near-dup pair
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_pairs(docs).collect()
    }
    # Verification scores FULL gram sets: 3 shared of 5 distinct grams.
    assert pairs == {(1000, 1001): 0.6}


def test_ngram_sparse_jaccard_matches_direct_computation(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_pairs(docs, threshold=0.2).collect()
    }
    w1, w2 = BASE.split(), NEAR.split()
    g1 = {" ".join(w1[i : i + 3]) for i in range(len(w1) - 2)}
    g2 = {" ".join(w2[i : i + 3]) for i in range(len(w2) - 2)}
    expected = round(len(g1 & g2) / len(g1 | g2), 6)
    assert pairs[(1, 2)] == expected
    assert (1, 4) not in pairs  # different source blocks pair (blocking!)
    assert all(3 not in p for p in pairs)


def test_dedup_recall_gate_consistency(spark):
    """The quality gate's counts must be mutually consistent and agree
    with the registered dedup_minhash surface: every VERIFIED minhash
    pair is a truth pair hit by the candidate stage, so n_hit >= the
    verified-pair count, and ratios live in [0, 1]."""
    import ls_hadoop_3_0_spark as engine

    from .conftest import SF_DIR

    from ls_hadoop_3_0_spark.llm.dedup import dedup_recall

    # retired from the registry in late r8 — still the ≤10× release audit
    row = dedup_recall(spark, SF_DIR).collect()[0]
    assert row["method"] == "minhash_lsh"
    assert row["n_hit"] <= min(row["n_truth"], row["n_cand"])
    assert 0.0 <= row["precision"] <= 1.0 and 0.0 <= row["recall"] <= 1.0
    n_verified = engine.QUERIES["dedup_minhash"](spark, SF_DIR).count()
    assert row["n_hit"] >= n_verified  # verified pairs = truth ∩ cand subset
    assert row["n_truth"] >= n_verified


def test_cross_source_matrix_accounts_every_pair(spark):
    """Matrix masses sum to the minhash pair count; the matrix is
    triangular (source_x <= source_y)."""
    from ls_hadoop_3_0_spark.llm.dedup import dedup_cross_source, minhash_pairs
    from ls_hadoop_3_0_spark.tables import load

    from .conftest import SF_DIR

    rows = dedup_cross_source(spark, SF_DIR).collect()
    n_pairs = minhash_pairs(load(spark, SF_DIR, "documents")).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.source_x <= r.source_y
        assert 0 < r.n_docs_touched <= 2 * r.n_pairs
