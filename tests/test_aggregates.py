"""Aggregate semantics the oracle can't see — sketch accuracy bounds and
native-vs-explicit-moment equivalence (SURVEY §2.4 A4/A8)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR


def test_approx_count_distinct_within_rsd(spark):
    """A4 UniqValueCount capped variant: HLL++ within its error bound."""
    li = load(spark, SF_DIR, "lineitem")
    per_key = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
        )
        .collect()
    )
    assert len(per_key) > 0
    for r in per_key:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.08, r


def test_native_stats_match_explicit_moments_per_group(spark):
    """A8: stddev_samp/var_samp/avg == the explicit decimal-moment
    formulas the oracle uses (within float tolerance)."""
    li = load(spark, SF_DIR, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.avg("l_quantity").alias("avg_native"),
            F.var_samp("l_quantity").alias("var_native"),
            F.stddev_samp("l_quantity").alias("std_native"),
            F.count("l_quantity").alias("n"),
            F.sum("l_quantity").alias("s"),
            F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("s2"),
        )
        .collect()
    )
    for r in rows:
        var = (r["s2"] - r["s"] * r["s"] / r["n"]) / (r["n"] - 1)
        assert math.isclose(r["avg_native"], r["s"] / r["n"], rel_tol=1e-9)
        assert math.isclose(r["var_native"], var, rel_tol=1e-9)
        assert math.isclose(r["std_native"], math.sqrt(var), rel_tol=1e-9)


def test_median_is_exact_not_sketch(spark):
    li = load(spark, SF_DIR, "lineitem")
    got = li.agg(F.median("l_quantity")).collect()[0][0]
    vals = sorted(r["l_quantity"] for r in li.select("l_quantity").collect())
    n = len(vals)
    exact = vals[n // 2] if n % 2 else (vals[n // 2 - 1] + vals[n // 2]) / 2
    assert got == exact


def test_approx_quantile_within_rank_bound(spark):
    """agg_approx_quantile: each GK quartile must sit within the 1%
    relative-rank window of the exact per-group distribution."""
    import ls_hadoop_3_0_spark as engine  # noqa: F401 (registers keys)
    from ls_hadoop_3_0_spark.registry import QUERIES

    got = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in QUERIES["agg_approx_quantile"](spark, SF_DIR).collect()
    }
    li = load(spark, SF_DIR, "lineitem")
    for flag, qs in got.items():
        vals = sorted(
            r["l_extendedprice"]
            for r in li.filter(F.col("l_returnflag") == flag)
            .select("l_extendedprice")
            .collect()
        )
        n = len(vals)
        for q, v in zip((0.25, 0.5, 0.75), qs):
            lo = vals[max(0, int(math.floor((q - 0.01) * n)) - 1)]
            hi = vals[min(n - 1, int(math.ceil((q + 0.01) * n)))]
            assert lo <= v <= hi, (flag, q, v, lo, hi)


def test_quantile_bucketize_partitions_orders(spark):
    """The 4 buckets partition the order set into near-equal frequency
    classes with monotone value ranges."""
    from ls_hadoop_3_0_spark.operators.aggregates import quantile_bucketize

    rows = {r.bucket: r for r in quantile_bucketize(spark, SF_DIR).collect()}
    n = load(spark, SF_DIR, "orders").count()
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r.n_orders for r in rows.values()) == n
    # near-equal frequency (ties can shift a handful of rows)
    for r in rows.values():
        assert abs(r.n_orders - n / 4) <= max(4, 0.02 * n), (r.bucket, r.n_orders)
    # monotone, non-overlapping value ranges
    for b in range(3):
        assert rows[b].max_price <= rows[b + 1].min_price


def test_agg_corr_is_bounded_and_total(spark):
    from ls_hadoop_3_0_spark.operators.aggregates import agg_corr

    rows = agg_corr(spark, SF_DIR).collect()
    n = load(spark, SF_DIR, "lineitem").count()
    assert sum(r.n_rows for r in rows) == n
    for r in rows:
        assert r.corr_qty_price is None or abs(r.corr_qty_price) <= 1 + 1e-9


def test_entropy_bounds(spark):
    """0 ≤ H ≤ ln(n_langs); normalized form in [0,1] or NULL for
    single-category groups."""
    import math

    from ls_hadoop_3_0_spark.operators.aggregates import agg_entropy

    rows = agg_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1e-6 <= r.entropy_nats <= math.log(r.n_langs) + 1e-6
        if r.n_langs == 1:
            assert r.norm_entropy is None
        else:
            assert -1e-6 <= r.norm_entropy <= 1 + 1e-6


def test_basket_pairs_deterministic_topk(spark):
    """Top-50 is fully deterministic (count desc, part ids) and PMI has
    the right sign: positive iff the pair co-occurs more often than
    independence predicts."""
    import math

    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.operators.analytics import basket_pairs

    a = basket_pairs(spark, SF_DIR).collect()
    b = basket_pairs(spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert 0 < len(a) <= 50
    li = load(spark, SF_DIR, "lineitem")
    bk = li.select("l_orderkey", "l_partkey").distinct()
    n = bk.select("l_orderkey").distinct().count()
    ic = {
        r.l_partkey: r.c
        for r in bk.groupBy("l_partkey").agg(F.count("*").alias("c")).collect()
    }
    for r in a[:10]:
        expect = math.log(r.n_co * n / (ic[r.part_a] * ic[r.part_b]))
        assert abs(r.pmi - expect) < 1e-5
        assert r.n_co >= 2


def test_listagg_order_is_pinned(spark):
    """The WITHIN GROUP order makes the concatenation deterministic:
    keys appear in descending-price order, and re-running yields the
    identical strings."""
    from ls_hadoop_3_0_spark.operators.aggregates import agg_listagg

    a = {r.o_orderpriority: r.top_keys for r in agg_listagg(spark, SF_DIR).collect()}
    b = {r.o_orderpriority: r.top_keys for r in agg_listagg(spark, SF_DIR).collect()}
    assert a == b and a
    orders = load(spark, SF_DIR, "orders")
    prices = {r.o_orderkey: r.o_totalprice for r in orders.collect()}
    for keys in a.values():
        ks = [int(k) for k in keys.split(",")]
        assert len(ks) == len(set(ks)) <= 3
        assert prices[ks[0]] >= prices[ks[-1]]


def test_lorenz_is_a_valid_concentration_curve(spark):
    """Deciles partition the customer set; shares sum to 1; cum_share is
    nondecreasing and reaches exactly the final share sum; top decile
    share ≥ 1/10."""
    from ls_hadoop_3_0_spark.operators.analytics import analytics_lorenz

    rows = sorted(analytics_lorenz(spark, SF_DIR).collect(), key=lambda r: r.decile)
    n = load(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    cums = [r.cum_share for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-9
    assert rows[0].share >= 0.1 - 1e-9  # ranked desc: top decile ≥ uniform


def test_backlog_sweep_line_invariants(spark):
    """Sweep-line sanity: the curve never goes negative, the final value
    equals the count of never-shipped orders, and +1/-1 masses balance
    with the interval counts."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.operators.analytics import analytics_backlog

    rows = sorted(analytics_backlog(spark, SF_DIR).collect(), key=lambda r: r.day)
    assert all(r.open_orders >= 0 for r in rows)
    orders = load(spark, SF_DIR, "orders")
    li = load(spark, SF_DIR, "lineitem")
    n_orders = orders.count()
    n_shipped = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert rows[-1].open_orders == n_orders - n_shipped
    assert sum(r.net_change for r in rows) == rows[-1].open_orders
