"""Invariants for the iterative graph key (operators/graph.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ls_hadoop_3_0_spark.operators.graph import N_ITER, graph_pagerank

from .conftest import SF_DIR


def test_pagerank_mass_and_bounds(spark):
    """Rank mass stays ~1 (per-round quantization drifts ≤ nodes·5e-7);
    every rank is positive; bipartite node encoding keeps parities."""
    pr = graph_pagerank(spark, SF_DIR).cache()
    try:
        rows = pr.collect()
        n = len(rows)
        total = sum(r["pr"] for r in rows)
        assert abs(total - 1.0) < n * 1e-6 * N_ITER + 1e-4, total
        assert all(r["pr"] > 0 for r in rows)
        assert all(r["deg"] >= 1 for r in rows)
        # both partitions of the bipartite graph are present
        parities = {r["node"] % 2 for r in rows}
        assert parities == {0, 1}
    finally:
        pr.unpersist()


def test_pagerank_deterministic_across_runs(spark):
    """Quantized iterations ⇒ bit-identical ranks on re-execution
    (the property that makes the oracle parity possible at all)."""
    a = {r["node"]: r["pr"] for r in graph_pagerank(spark, SF_DIR).collect()}
    b = {r["node"]: r["pr"] for r in graph_pagerank(spark, SF_DIR).collect()}
    assert a == b


def test_degree_hist_accounts_every_node(spark):
    """Histogram masses sum to the node count of each side, and the
    degree-weighted sum equals the edge count in each direction."""
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.operators.graph import graph_degree_hist
    from ls_hadoop_3_0_spark.tables import load

    rows = graph_degree_hist(spark, SF_DIR).collect()
    pairs = (
        load(spark, SF_DIR, "orders")
        .join(
            load(spark, SF_DIR, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    n_cust = pairs.select("o_custkey").distinct().count()
    n_supp = pairs.select("l_suppkey").distinct().count()
    n_edges = pairs.count()
    by_side = {}
    wsum = {}
    for r in rows:
        by_side[r.side] = by_side.get(r.side, 0) + r.n_nodes
        wsum[r.side] = wsum.get(r.side, 0) + r.n_nodes * r.deg
    assert by_side == {"customer": n_cust, "supplier": n_supp}
    assert wsum["customer"] == n_edges and wsum["supplier"] == n_edges
