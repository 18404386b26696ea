"""ANN (knn_lsh) vs exact (knn_cosine): structural + recall checks."""

from __future__ import annotations

import ls_hadoop_3_0_spark as engine

from .conftest import SF_DIR


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["q_id"], {})[r["n_id"]] = (r["rnk"], r["cosine"])
    return out


def test_lsh_is_subset_consistent_with_brute_force(spark):
    exact = _topk(engine.QUERIES["knn_cosine"](spark, SF_DIR))
    approx = _topk(engine.QUERIES["knn_lsh"](spark, SF_DIR))
    assert set(approx) <= set(exact)  # same query set (bucket may drop none)
    # Any (q, n) the ANN returns must carry the same cosine the exact
    # path computed — the sketch only prunes candidates, never rescores.
    for q, nbrs in approx.items():
        for n, (_, cos) in nbrs.items():
            if n in exact[q]:
                assert exact[q][n][1] == cos


def test_lsh_recall_floor(spark):
    """Deterministic fixtures ⇒ recall is a constant; pin a floor so a
    regression in bucketing (e.g. hyperplane drift) is caught."""
    exact = _topk(engine.QUERIES["knn_cosine"](spark, SF_DIR))
    approx = _topk(engine.QUERIES["knn_lsh"](spark, SF_DIR))
    hits = sum(len(set(approx.get(q, {})) & set(ns)) for q, ns in exact.items())
    total = sum(len(ns) for ns in exact.values())
    recall = hits / total
    # Deterministic fixtures: measured 0.24 at sf0.001 with 7-probe LSH.
    assert recall >= 0.15, f"LSH recall collapsed: {recall}"


def test_lsh_ranks_are_dense_and_bounded(spark):
    approx = _topk(engine.QUERIES["knn_lsh"](spark, SF_DIR))
    for q, nbrs in approx.items():
        ranks = sorted(rnk for rnk, _ in nbrs.values())
        assert ranks == list(range(1, len(ranks) + 1))
        assert ranks[-1] <= 10
