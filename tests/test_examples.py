"""Example-workload keys: Halton QMC pi + TeraValidate + dedup apply."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import ls_hadoop_3_0_spark as engine

from .conftest import SF_DIR


def _halton_exact(i: int, base: int) -> "Fraction":
    """Textbook radical inverse in EXACT rational arithmetic. (The usual
    float-accumulating version is up to 1 ulp off for base 3 — our
    integer formulation is exact, so the reference must be too.)"""
    from fractions import Fraction

    f, r = Fraction(1), Fraction(0)
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def test_halton_radical_inverse_matches_reference(spark):
    """The SQL integer radical inverse must equal the exact rational
    Halton value (num / base^digits is exact for our digit budgets —
    every index below base^digits has an exact inverse)."""
    from fractions import Fraction

    from ls_hadoop_3_0_spark.operators.examples import (
        PI_B2_DIGITS,
        PI_B3_DIGITS,
        _radical_inverse,
    )

    rows = (
        spark.range(200)
        .select(
            "id",
            F.expr(_radical_inverse("id", 2, PI_B2_DIGITS)).alias("n2"),
            F.expr(_radical_inverse("id", 3, PI_B3_DIGITS)).alias("n3"),
        )
        .collect()
    )
    for r in rows:
        assert Fraction(r["n2"], 2**PI_B2_DIGITS) == _halton_exact(r["id"], 2)
        assert Fraction(r["n3"], 3**PI_B3_DIGITS) == _halton_exact(r["id"], 3)


def test_pi_estimate_converges(spark):
    row = engine.QUERIES["examples_pi"](spark, SF_DIR).collect()[0]
    assert row["n_points"] == 50_000
    assert abs(row["pi_estimate"] - math.pi) < 0.005  # QMC at 50k darts
    assert row["pi_estimate"] == 4.0 * row["n_inside"] / row["n_points"]


def test_sort_validate_verdict_and_checksum(spark):
    from ls_hadoop_3_0_spark.tables import load

    row = engine.QUERIES["sort_validate"](spark, SF_DIR).collect()[0]
    assert row["is_globally_sorted"]
    assert row["within_violations"] == 0 and row["boundary_violations"] == 0
    o = load(spark, SF_DIR, "orders").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s")
    ).collect()[0]
    assert row["n_rows"] == o["n"] and row["key_sum"] == o["s"]


def test_dedup_apply_consistent_with_clusters(spark):
    """Representative-keep arithmetic: kept = corpus − (cluster members
    that are not their cluster's min). Cross-check against the raw
    dedup_clusters labels."""
    labels = engine.QUERIES["dedup_clusters"](spark, SF_DIR)
    n_docs = engine.QUERIES["dedup_exact"](spark, SF_DIR).sparkSession.read.parquet(
        f"{SF_DIR}/documents.parquet"
    ).count()
    dropped_expected = labels.filter(F.col("doc_id") != F.col("cluster_id")).count()
    row = engine.QUERIES["dedup_apply"](spark, SF_DIR).collect()[0]
    assert row["n_dropped"] == dropped_expected
    assert row["n_kept"] == n_docs - dropped_expected
    assert row["kept_md5"] is not None and len(row["kept_md5"]) == 32


def test_pi_double_twin_agrees_at_key_dart_count(spark):
    """The double-circle scale twin must reproduce the exact-integer
    key's count at the registered dart count (no boundary flips)."""
    from ls_hadoop_3_0_spark.operators.examples import PI_N, pi_estimate_double

    exact = engine.QUERIES["examples_pi"](spark, SF_DIR).collect()[0]
    twin = pi_estimate_double(spark, PI_N).collect()[0]
    assert (twin["n_points"], twin["n_inside"]) == (
        exact["n_points"],
        exact["n_inside"],
    )


def test_teragen_certificate_is_partitioning_invariant(spark):
    """The generation certificate (count/distinct/min/max/digest) must not
    depend on how the range is split across tasks — TeraGen's whole
    contract is that mappers' disjoint row ranges compose to one dataset."""
    import hashlib

    from ls_hadoop_3_0_spark.operators.examples import TERAGEN_BUCKET, _teragen

    n = 5_000
    a = _teragen(spark, n).collect()[0].asDict()
    b_rows = (
        spark.range(n)
        .repartition(7)
        .select(
            F.col("id").alias("i"),
            F.substring(F.md5(F.col("id").cast("string")), 1, 10).alias("key"),
        )
    )
    # Local reference digest: serial two-level md5 over the same keys.
    keys = [
        hashlib.md5(str(i).encode()).hexdigest()[:10] for i in range(n)
    ]
    bmd5 = [
        hashlib.md5(",".join(keys[s : s + TERAGEN_BUCKET]).encode()).hexdigest()
        for s in range(0, n, TERAGEN_BUCKET)
    ]
    want_md5 = hashlib.md5(",".join(bmd5).encode()).hexdigest()
    assert a["n_rows"] == n
    assert a["data_md5"] == want_md5
    assert a["min_key"] == min(keys) and a["max_key"] == max(keys)
    assert a["n_distinct_keys"] == len(set(keys))
    assert b_rows.count() == n  # repartitioned source still generates all rows
