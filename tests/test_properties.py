"""Hypothesis property tests (SURVEY §5.2 item 3): algebraic invariants
that must hold for ANY data, on generated inputs.

Examples are deliberately few (Spark job per example); properties chosen
so each run covers the interesting edges (dups, nulls-free keys, skew).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

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
