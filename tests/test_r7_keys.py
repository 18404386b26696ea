"""Behavioral tests for the r7 key batch — hand-computed expectations
beyond the registry-wide oracle/empty sweeps.

Covers: triangle counting on a known graph, exact moments vs a pure-
python reference, streaming-equivalence matches_batch flags, sketch-
audit booleans, tie-aware quantile rank logic, and the deterministic
stratified sample's per-stratum rates.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.operators.sort import STRAT_RATES

from .conftest import SF_DIR


def test_triangles_on_known_graph(spark, tmp_path):
    """K4 minus one edge: 4 nodes, 5 edges, 2 triangles, wedges 8."""
    # orders ↔ supplier co-occurrence: build lineitem rows whose orders
    # induce exactly the edges {12,13,14,23,24} (edge 34 absent).
    rows = []
    for oid, (u, v) in enumerate([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]):
        rows += [(oid, 100, u, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"),
                 (oid, 101, v, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01")]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz"))
    d = str(tmp_path / "g")
    df.write.parquet(f"{d}/lineitem.parquet")
    out = engine.QUERIES["graph_triangles"](spark, d).collect()[0]
    assert out["n_nodes"] == 4
    assert out["n_edges"] == 5
    # degrees: 1→3, 2→3, 3→2, 4→2 ⇒ wedges 3+3+1+1 = 8
    assert out["n_wedges"] == 8
    # triangles: (1,2,3) and (1,2,4); (1,3,4)/(2,3,4) need edge 34
    assert out["n_triangles"] == 2
    assert out["global_cc"] == pytest.approx(6 / 8)


def test_skewkurt_matches_python_reference(spark, duck):
    """Spark moments == pure-python quantized reference on the fixture."""
    import pyarrow.parquet as pq

    from .conftest import parquet_source

    out = {
        r["event_type"]: r
        for r in engine.QUERIES["agg_skewkurt"](spark, SF_DIR).collect()
    }
    tbl = pq.read_table(
        parquet_source(SF_DIR, "events").replace("/*.parquet", ""),
        columns=["event_type", "value"],
    ).to_pandas()
    for et, grp in tbl.groupby("event_type"):
        xq = [round(v * 1000) for v in grp["value"]]
        # python round is banker's; engines round half-away. The fixture
        # values are not .5-boundary at 1e-3 in practice; guard anyway.
        n = len(xq)
        s1, s2 = sum(xq), sum(x * x for x in xq)
        s3, s4 = sum(x**3 for x in xq), sum(x**4 for x in xq)
        m1 = s1 / 1e3 / n
        r2 = s2 / 1e6 / n
        m2 = r2 - m1 * m1
        r3 = s3 / 1e9 / n
        m3 = r3 - (3.0 * m1) * r2 + (2.0 * m1) * (m1 * m1)
        got = out[et]
        assert got["n"] == n
        assert got["mean"] == pytest.approx(m1, rel=1e-12)
        assert got["m2"] == pytest.approx(m2, rel=1e-9)
        assert got["skewness"] == pytest.approx(
            m3 / (math.sqrt(m2) * m2), rel=1e-6
        )


@pytest.mark.parametrize(
    "key,flag",
    [
        ("stream_batch_equiv", "matches_batch"),
        ("stream_batch_equiv_session", "matches_batch"),
        ("stream_batch_equiv_dedup", "matches_batch"),
    ],
)
def test_streaming_equivalence_flags_true(key, flag, spark):
    row = engine.QUERIES[key](spark, SF_DIR).collect()[0]
    assert row[flag] is True


def test_sketch_audits_pass_on_fixture(spark):
    for r in engine.QUERIES["agg_approx_distinct_audit"](spark, SF_DIR).collect():
        assert r["hll_within_5pct"] is True
    for r in engine.QUERIES["agg_approx_quantile_audit"](spark, SF_DIR).collect():
        assert r["p50_rank_ok"] is True and r["p90_rank_ok"] is True


def test_stratified_hash_rates_near_nominal(spark):
    out = engine.QUERIES["sample_stratified_hash"](spark, SF_DIR).toPandas()
    tot = (
        engine.QUERIES["project_filter"].__module__  # noqa: F841 (doc anchor)
    )
    full = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderstatus")
        .count()
        .collect()
    )
    totals = {r["o_orderstatus"]: r["count"] for r in full}
    kept = out.groupby("o_orderstatus").size().to_dict()
    for status, rate in STRAT_RATES.items():
        n = totals.get(status, 0)
        if n < 50:
            continue  # too small for a rate assertion at sf0.001
        got = kept.get(status, 0) / n
        # md5-uniform: binomial concentration; generous 4-sigma band
        sigma = (rate * (1 - rate) / n) ** 0.5
        assert abs(got - rate) < 4 * sigma + 0.01, (status, got, rate)


def test_mix_temperature_weights_sum_to_one(spark):
    out = engine.QUERIES["mix_temperature"](spark, SF_DIR).toPandas()
    assert out["weight_t2"].sum() == pytest.approx(1.0, abs=1e-9)
    # temperature flattens: every boost is finite and positive, and the
    # smallest share gets the largest boost
    assert (out["boost"] > 0).all()
    assert out.loc[out["share"].idxmin(), "boost"] >= out["boost"].min()


def test_ohlc_internal_consistency(spark):
    out = engine.QUERIES["timeseries_ohlc"](spark, SF_DIR).toPandas()
    assert (out["low"] <= out["high"]).all()
    assert ((out["open"] >= out["low"]) & (out["open"] <= out["high"])).all()
    assert ((out["close"] >= out["low"]) & (out["close"] <= out["high"])).all()
    one = out[out["n_events"] == 1]
    assert (one["open"] == one["close"]).all()
