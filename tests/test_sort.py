"""Sort/sample semantics — SURVEY §2.5, incl. TeraValidate parity
(the reference's self-validating sort check) and InputSampler bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR


def test_sample_fraction_is_seeded_and_bounded(spark):
    df1 = engine.QUERIES["sample_fraction"](spark, SF_DIR)
    df2 = engine.QUERIES["sample_fraction"](spark, SF_DIR)
    rows1 = sorted(r["o_orderkey"] for r in df1.collect())
    rows2 = sorted(r["o_orderkey"] for r in df2.collect())
    assert rows1 == rows2, "seeded sample must be reproducible"
    n_total = load(spark, SF_DIR, "orders").count()
    frac = len(rows1) / n_total
    assert 0.05 < frac < 0.16, f"Bernoulli(0.1) sample wildly off: {frac}"
    all_keys = {r["o_orderkey"] for r in load(spark, SF_DIR, "orders").collect()}
    assert set(rows1) <= all_keys


def test_sample_stratified_is_seeded_and_per_stratum(spark):
    df1 = engine.QUERIES["sample_stratified"](spark, SF_DIR)
    df2 = engine.QUERIES["sample_stratified"](spark, SF_DIR)
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))
    # the 0.5-fraction stratum must be sampled much more densely than 0.05
    totals = {
        r["o_orderstatus"]: r["n"]
        for r in load(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r["o_orderstatus"]: r["n"]
        for r in df1.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if "P" in totals and "F" in totals and totals["F"] >= 100:
        assert got.get("P", 0) / totals["P"] > got.get("F", 0) / totals["F"]


def test_sample_hash_is_deterministic_and_partition_invariant(spark):
    """md5-threshold sampling: membership is a pure function of the key —
    identical row set under any repartitioning, fraction near 26/256."""
    df = engine.QUERIES["sample_hash"](spark, SF_DIR)
    keys1 = sorted(r["o_orderkey"] for r in df.collect())
    total = load(spark, SF_DIR, "orders").count()
    assert keys1, "sample must be non-empty"
    frac = len(keys1) / total
    assert 0.06 <= frac <= 0.15, frac  # 26/256 ≈ 0.102 ± sampling noise
    reshuffled = (
        load(spark, SF_DIR, "orders")
        .repartition(7)
        .filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a")
    )
    keys2 = sorted(r["o_orderkey"] for r in reshuffled.collect())
    assert keys1 == keys2, "sample membership changed under repartitioning"


def test_split_train_test_is_exhaustive_and_disjoint(spark):
    """Every document lands in exactly one split; ratios near 230/256."""
    rows = {r["split"]: r["n_docs"] for r in
            engine.QUERIES["split_train_test"](spark, SF_DIR).collect()}
    total = load(spark, SF_DIR, "documents").count()
    assert set(rows) == {"train", "test"}
    assert rows["train"] + rows["test"] == total
    assert 0.80 <= rows["train"] / total <= 0.97  # 230/256 ≈ 0.898


def test_teravalidate_global_order(spark):
    """TeraValidate parity: after orderBy, every partition is internally
    sorted AND partition boundaries are globally monotone (last of
    partition i ≤ first of partition i+1)."""
    df = (
        load(spark, SF_DIR, "orders")
        .select("o_totalprice", "o_orderkey")
        .orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    )
    parts = df.rdd.glom().collect()
    nonempty = [p for p in parts if p]
    keys = lambda r: (r["o_totalprice"], r["o_orderkey"])  # noqa: E731
    for p in nonempty:
        ks = [keys(r) for r in p]
        assert ks == sorted(ks), "partition not internally sorted"
    for a, b in zip(nonempty, nonempty[1:]):
        assert keys(a[-1]) <= keys(b[0]), "partition boundaries overlap"


def test_sort_global_rank_is_dense_permutation(spark):
    ranks = [r["rank"] for r in engine.QUERIES["sort_global"](spark, SF_DIR).collect()]
    assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_weighted_sample_matches_python_recompute(spark):
    """The kept set is a pure function of (doc_id, n_chars, max): an
    independent Python recompute of the md5-uniform and threshold must
    reproduce every per-source count exactly."""
    import hashlib
    from collections import defaultdict

    from ls_hadoop_3_0_spark.operators.sort import sample_weighted
    from ls_hadoop_3_0_spark.tables import load

    got = {r.source: r for r in sample_weighted(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    mx = max(r.n_chars for r in docs)
    want = defaultdict(lambda: [0, 0, 0, 0])  # n, kept, kept_chars, total
    for r in docs:
        u24 = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:6], 16)
        thr = int((r.n_chars / mx) * 16777216.0)  # floor of same double
        w = want[r.source]
        w[0] += 1
        w[3] += r.n_chars
        if u24 < thr:
            w[1] += 1
            w[2] += r.n_chars
    assert set(got) == set(want)
    for s, (n, k, kc, tc) in want.items():
        g = got[s]
        assert (g.n_docs, g.n_kept, g.kept_chars, g.total_chars) == (n, k, kc, tc)


def test_deterministic_shuffle_is_a_reproducible_permutation(spark):
    """Positions are exactly 1..n, identical across runs and input
    partitionings, and decorrelated from doc_id order (it is a shuffle,
    not a sort by id)."""
    from ls_hadoop_3_0_spark.operators.sort import shuffle_deterministic
    from ls_hadoop_3_0_spark.tables import load

    a = {r.doc_id: r.position for r in shuffle_deterministic(spark, SF_DIR).collect()}
    b = {r.doc_id: r.position for r in shuffle_deterministic(spark, SF_DIR).collect()}
    assert a == b
    n = load(spark, SF_DIR, "documents").count()
    assert sorted(a.values()) == list(range(1, n + 1))
    ids = sorted(a)
    agree = sum(
        1
        for x, y in zip(ids, ids[1:])
        if (a[x] < a[y]) == (x < y)
    )
    # A true permutation keeps ~half the adjacent id-order relations.
    assert 0.25 < agree / (len(ids) - 1) < 0.75
