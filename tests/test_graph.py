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
