"""Hypothesis property tests (SURVEY §5.2 item 3): algebraic invariants
that must hold for ANY data, on generated inputs.

Examples are deliberately few (Spark job per example); properties chosen
so each run covers the interesting edges (dups, nulls-free keys, skew).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# Heavy leg (VERDICT r16 #1): hypothesis property sweeps run many Spark
# jobs per test — outside the driver-budget core, run locally each
# round via `pytest -m extended`.
pytestmark = pytest.mark.extended

SMALL = settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)

kv_lists = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-100, 100)), min_size=0, max_size=40
)


@SMALL
@given(kv_lists)
def test_sort_is_a_permutation(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int") if rows else None
    if df is None:
        return
    srt = df.orderBy("k", "v").collect()
    assert sorted(map(tuple, srt)) == sorted(rows)


@SMALL
@given(kv_lists)
def test_distinct_is_idempotent_subset(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, v int")
    d1 = {tuple(r) for r in df.distinct().collect()}
    assert d1 == set(rows)
    assert df.distinct().distinct().count() == len(d1)


@SMALL
@given(kv_lists, kv_lists)
def test_join_containment_lattice(spark, left, right):
    if not left or not right:
        return
    a = spark.createDataFrame(left, "k int, v int")
    b = spark.createDataFrame(right, "k int, w int")
    inner = a.join(b, "k").count()
    leftj = a.join(b, "k", "left").count()
    full = a.join(b, "k", "full").count()
    assert inner <= leftj <= full
    semi = {r["k"] for r in a.join(b, "k", "left_semi").collect()}
    anti = {r["k"] for r in a.join(b, "k", "left_anti").collect()}
    assert semi & anti == set()
    assert semi | anti == {k for k, _ in left}


@SMALL
@given(kv_lists)
def test_window_invariants(spark, rows):
    """Running sum ends at the group total; row_number is dense per key."""
    if not rows:
        return
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(rows)], "k int, i int, v long"
    )
    w = Window.partitionBy("k").orderBy("i")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.select(
        "k",
        "i",
        F.sum("v").over(wf).alias("running"),
        F.row_number().over(w).alias("rn"),
    ).collect()
    import collections

    totals = collections.Counter()
    for k, v in rows:
        totals[k] += v
    last = {}
    rns = collections.defaultdict(list)
    for r in sorted(out, key=lambda r: (r["k"], r["i"])):
        last[r["k"]] = r["running"]
        rns[r["k"]].append(r["rn"])
    assert last == dict(totals)
    for k, seq in rns.items():
        assert sorted(seq) == list(range(1, len(seq) + 1))


@SMALL
@given(kv_lists, st.integers(1, 8))
def test_decimal_sum_invariant_under_repartitioning(spark, rows, nparts):
    if not rows:
        return
    df = spark.createDataFrame(
        [(k, v / 7.0) for k, v in rows], "k int, v double"
    )
    dsum = F.sum(F.col("v").cast("decimal(25,6)")).cast("double").alias("s")
    one = df.coalesce(1).groupBy("k").agg(dsum).collect()
    many = df.repartition(nparts, "k").groupBy("k").agg(dsum).collect()
    assert {(r["k"], r["s"]) for r in one} == {(r["k"], r["s"]) for r in many}


@SMALL
@given(kv_lists)
def test_salted_join_equals_plain_join(spark, rows):
    """join_salted's rewrite (salt fact, replicate dim) must be
    semantics-preserving for ANY fact multiset, including all-one-key
    skew (the case it exists for)."""
    if not rows:
        return
    fact = spark.createDataFrame(rows, "k int, v int")
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(6)], "k int, name string")
    plain = (
        fact.join(dim, "k").groupBy("name").agg(F.sum("v").alias("s")).collect()
    )
    n_salts = 4
    salted_fact = fact.withColumn("_salt", F.pmod(F.col("v") * 7 + F.col("k"), F.lit(n_salts)))
    rep_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    salted = (
        salted_fact.join(rep_dim, ["k", "_salt"])
        .groupBy("name")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    assert {(r["name"], r["s"]) for r in plain} == {(r["name"], r["s"]) for r in salted}


@SMALL
@given(kv_lists)
def test_changelog_upsert_order_independent(spark, rows):
    """Merging a changelog in ANY batch split must land on the same
    final state as one-shot row_number compaction (stream_changelog's
    incremental contract). (k=user, v=version; latest version wins.)"""
    if not rows:
        return
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k int, v int, uid int"
    )
    w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("uid").desc())
    oneshot = {
        (r["k"], r["v"], r["uid"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .collect()
    }
    # incremental: two arbitrary halves merged sequentially
    h1 = df.filter(F.col("uid") % 2 == 0)
    h2 = df.filter(F.col("uid") % 2 == 1)
    state = h1.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    state = (
        state.unionByName(
            h2.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    assert {(r["k"], r["v"], r["uid"]) for r in state.collect()} == oneshot


@SMALL
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3600)), min_size=1, max_size=30))
def test_interval_join_band_contract(spark, rows):
    """Every emitted (purchase, click) pair respects the 1h band; every
    in-band pair is emitted — checked against a python reference on
    random single-or-few-user event sets (worst-case per-user skew)."""
    events = [
        (i, u, "purchase" if i % 3 == 0 else "click", s) for i, (u, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(events, "eid int, u int, typ string, sec int")
    p = df.filter(F.col("typ") == "purchase").select(
        F.col("u").alias("pu"), F.col("eid").alias("pid"), F.col("sec").alias("psec")
    )
    c = df.filter(F.col("typ") == "click").select(
        F.col("u").alias("cu"), F.col("eid").alias("cid"), F.col("sec").alias("csec")
    )
    got = {
        (r["pid"], r["cid"])
        for r in p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("csec") >= F.col("psec") - 3600)
            & (F.col("csec") <= F.col("psec")),
        ).collect()
    }
    want = {
        (pi, ci)
        for pi, pu, pt, ps in events
        if pt == "purchase"
        for ci, cu, ct, cs in events
        if ct == "click" and cu == pu and ps - 3600 <= cs <= ps
    }
    assert got == want


@SMALL
@given(st.lists(st.text(alphabet="abcdefgh0123 _", min_size=0, max_size=12),
                min_size=1, max_size=25))
def test_u24_uniform_matches_python_for_any_string(spark, words):
    """The dialect-neutral md5 hex→int expression (_u24_expr) equals the
    Python reference for arbitrary strings — the primitive under
    sample_weighted, feature_hash and pipeline_curation_v3."""
    import hashlib

    from ls_hadoop_3_0_spark.operators.sort import _u24_expr

    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {
        r.s: r.u
        for r in df.select("s", F.expr(_u24_expr("s")).alias("u")).collect()
    }
    for w in set(words):
        assert got[w] == int(hashlib.md5(w.encode()).hexdigest()[:6], 16), w


@SMALL
@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=60),
       st.integers(2, 6))
def test_global_rank_is_partitioning_invariant(spark, vals, nparts):
    """global_rank assigns the identical total-order ranks regardless of
    input partitioning — the property quantile_bucketize, sort_global
    and analytics_lorenz all lean on."""
    from ls_hadoop_3_0_spark.operators.sort import global_rank

    rows = [(i, v) for i, v in enumerate(vals)]
    a = spark.createDataFrame(rows, "id long, v long")
    b = a.repartition(nparts)
    ra = {r.id: r.rank for r in global_rank(a, F.col("v"), F.col("id")).collect()}
    rb = {r.id: r.rank for r in global_rank(b, F.col("v"), F.col("id")).collect()}
    assert ra == rb
    want = {
        i: rank + 1
        for rank, (i, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert ra == want


vec_lists = st.lists(
    st.floats(
        min_value=-32.0,
        max_value=32.0,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    min_size=6,
    max_size=6,
)


@SMALL
@given(st.lists(vec_lists, min_size=1, max_size=4), st.lists(vec_lists, min_size=1, max_size=3))
def test_numpy_chunked_fold_matches_sql_fold_on_random_vectors(spark, us, qs):
    """The r12 exactness keystone, as a PROPERTY: the chunked numpy dot
    fold (_dot_fold_np) is bit-identical to Spark's aggregate(zip_with)
    left fold on arbitrary float64 vectors — including negative zeros,
    subnormal-ish magnitudes and sign mixes hypothesis generates. The
    chunk boundary (chunk=2 over 4 rows) must be invisible."""
    import numpy as np

    from ls_hadoop_3_0_spark.llm.similarity import _dot_fold_np

    dim = len(us[0])
    U = np.asarray(us, dtype=np.float64)
    QU = np.asarray(qs, dtype=np.float64)
    got = _dot_fold_np(QU, U, chunk=2)

    df = spark.createDataFrame(
        [(i, list(u)) for i, u in enumerate(us)], "i int, u array<double>"
    )
    for qi, q in enumerate(qs):
        arr = "array(" + ",".join(repr(float(x)) + "D" for x in q) + ")"
        want = {
            r["i"]: r["d"]
            for r in df.select(
                "i",
                F.expr(
                    f"aggregate(zip_with(u, {arr}, (x, y) -> x * y), 0D,"
                    " (acc, p) -> acc + p)"
                ).alias("d"),
            ).collect()
        }
        for i in range(len(us)):
            a, b = got[qi, i], want[i]
            assert (a == b) or (a != a and b != b), (qi, i, a, b)
