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


def test_lsh_radius2_improves_recall(spark):
    """Radius-2 multi-probe (22 probes) must dominate radius-1 (7 probes):
    strictly more candidate buckets ⇒ recall can only go up, and on the
    fixture it measurably does (0.24 → 0.50 at sf0.001)."""
    from ls_hadoop_3_0_spark.llm.similarity import lsh_topk

    exact = _topk(engine.QUERIES["knn_cosine"](spark, SF_DIR))
    r1 = _topk(engine.QUERIES["knn_lsh"](spark, SF_DIR))
    r2 = _topk(lsh_topk(spark, SF_DIR, radius=2))

    def recall(approx):
        hits = sum(len(set(approx.get(q, {})) & set(ns)) for q, ns in exact.items())
        return hits / sum(len(ns) for ns in exact.values())

    rec1, rec2 = recall(r1), recall(r2)
    assert rec2 >= rec1, f"radius-2 recall {rec2} fell below radius-1 {rec1}"
    assert rec2 >= 0.3, f"radius-2 recall collapsed: {rec2}"
    # Radius-2 candidates are a superset: every radius-1 hit must persist.
    for q, nbrs in r1.items():
        r2_cos = {n: cos for n, (_, cos) in r2.get(q, {}).items()}
        for n, (_, cos) in nbrs.items():
            worst_r2 = min(c for c in r2_cos.values())
            assert n in r2_cos or cos <= worst_r2


def test_ivf_consistent_with_brute_force_and_recall_floor(spark):
    """IVF prunes candidates but never rescores: any returned (q, n) must
    carry the exact cosine, and recall over the nprobe=3/16 cells must
    hold a floor (data-adapted cells beat random hyperplanes here)."""
    exact = _topk(engine.QUERIES["knn_cosine"](spark, SF_DIR))
    approx = _topk(engine.QUERIES["knn_ivf"](spark, SF_DIR))
    assert set(approx) <= set(exact)
    for q, nbrs in approx.items():
        for n, (_, cos) in nbrs.items():
            if n in exact[q]:
                assert exact[q][n][1] == cos
    hits = sum(len(set(approx.get(q, {})) & set(ns)) for q, ns in exact.items())
    recall = hits / sum(len(ns) for ns in exact.values())
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"


def test_ivf_centroids_are_deterministic_and_cells_cover(spark):
    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.embeddings import normalized_embeddings
    from ls_hadoop_3_0_spark.llm.similarity import IVF_K, train_centroids
    from ls_hadoop_3_0_spark.tables import load

    e = normalized_embeddings(load(spark, SF_DIR, "embeddings")).select("vec_id", "u")
    c1 = train_centroids(e)
    c2 = train_centroids(e.repartition(7))  # partitioning must not matter
    assert c1 == c2
    assert len(c1) == IVF_K and all(len(row) == 64 for row in c1)
    for row in c1:  # unit-normalized
        assert abs(sum(x * x for x in row) - 1.0) < 1e-9


def test_lsh_ranks_are_dense_and_bounded(spark):
    approx = _topk(engine.QUERIES["knn_lsh"](spark, SF_DIR))
    for q, nbrs in approx.items():
        ranks = sorted(rnk for rnk, _ in nbrs.values())
        assert ranks == list(range(1, len(ranks) + 1))
        assert ranks[-1] <= 10


def test_ivf_degenerate_one_cell_still_correct(spark):
    """Adversarial quantizer input: 90% of vectors identical ⇒ they all
    land in ONE cell. Probing must still return exact-cosine top-k for
    queries in that cell, and training must not corrupt centroids
    (empty cells keep their seed)."""
    import pandas as pd

    from ls_hadoop_3_0_spark.llm.embeddings import DIM
    from ls_hadoop_3_0_spark.llm.similarity import IVF_K, train_centroids

    base = [1.0] + [0.0] * (DIM - 1)
    other = [0.0, 1.0] + [0.0] * (DIM - 2)
    rows = [(i, base) for i in range(90)] + [(90 + j, other) for j in range(10)]
    e = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows], "u": [r[1] for r in rows]})
    )
    cents = train_centroids(e)
    assert len(cents) == IVF_K
    for row in cents:
        assert abs(sum(x * x for x in row) - 1.0) < 1e-6  # unit (incl. seeds)

    from pyspark.sql import functions as F

    from ls_hadoop_3_0_spark.llm.similarity import _cell, _centroid_lit, _dots

    assigned = (
        e.withColumn("cents", _centroid_lit(cents))
        .withColumn("dots", _dots())
        .withColumn("cell", _cell())
        .select("vec_id", "cell")
        .collect()
    )
    cells = {r["vec_id"]: r["cell"] for r in assigned}
    dup_cells = {cells[i] for i in range(90)}
    assert len(dup_cells) == 1, "identical vectors split across cells"
    assert all(0 <= c < IVF_K for c in cells.values())


def test_knn_recall_key_consistent_with_raw_pipelines(spark):
    """The driver-visible knn_recall summary must equal the recall
    recomputed here from the raw exact/approx top-k sets, and its
    arithmetic must be internally consistent (n_exact = queries×k,
    n_hits ≤ n_exact, recall = n_hits/n_exact exactly)."""
    from ls_hadoop_3_0_spark.llm.similarity import knn_recall, lsh_topk

    # knn_recall was retired from the registry in r8 (quadratic audit
    # arm; knn_recall_v2 is the registered form) but stays callable as
    # the ≤10x-scale release audit — exercised directly here.
    rows = {r["method"]: r for r in knn_recall(spark, SF_DIR).collect()}
    assert set(rows) == {"lsh", "lsh_r2", "ivf"}
    # The 22-probe radius-2 arm must dominate the 7-probe radius-1 arm.
    assert rows["lsh_r2"]["recall"] >= rows["lsh"]["recall"]
    exact = _topk(engine.QUERIES["knn_cosine"](spark, SF_DIR))
    for method, fetch in (
        ("lsh", lambda: engine.QUERIES["knn_lsh"](spark, SF_DIR)),
        ("lsh_r2", lambda: lsh_topk(spark, SF_DIR, radius=2)),
        ("ivf", lambda: engine.QUERIES["knn_ivf"](spark, SF_DIR)),
    ):
        approx = _topk(fetch())
        hits = sum(len(set(approx.get(q, {})) & set(ns)) for q, ns in exact.items())
        r = rows[method]
        assert r["n_hits"] == hits
        assert r["n_exact"] == sum(len(ns) for ns in exact.values())
        assert r["n_queries"] == len(exact)
        assert r["recall"] == r["n_hits"] / r["n_exact"]
        assert r["recall"] >= 0.15, f"{method} recall collapsed: {r['recall']}"


def test_kmeans_lloyd_improves_and_assigns_nearest(spark):
    """Lloyd invariants the oracle hash can't state: (a) 3 refined
    rounds strictly reduce total inertia vs clustering with the raw
    seeds; (b) a numpy re-derivation of the final assignment agrees —
    every vector sits in its argmax-dot cell."""
    import numpy as np

    import ls_hadoop_3_0_spark as engine
    from ls_hadoop_3_0_spark.llm.embeddings import (
        KM_SCALE,
        _km_seed_ints,
        kmeans_lloyd,
    )
    from ls_hadoop_3_0_spark.tables import load

    from .conftest import SF_DIR

    rows = kmeans_lloyd(spark, SF_DIR).collect()
    assert len(rows) == 8
    total = sum(r["inertia"] for r in rows)
    vecs = np.array(
        [
            r["embedding"]
            for r in load(spark, SF_DIR, "embeddings").select("embedding").collect()
        ],
        dtype=np.float64,
    )
    assert sum(r["n_members"] for r in rows) == len(vecs)
    seeds = np.array(_km_seed_ints(), dtype=np.float64) / KM_SCALE
    cells = np.argmax(vecs @ seeds.T, axis=1)
    seed_inertia = sum(
        float(((v - seeds[c]) ** 2).sum()) for v, c in zip(vecs, cells)
    )
    assert total < seed_inertia, (total, seed_inertia)
    assert total > 0


def test_norm_outlier_audit_bounds(spark):
    """Participation ratio is bounded in [1, dim]; the audit's stats
    respect the bound and the outlier counts never exceed the label
    population."""
    from ls_hadoop_3_0_spark.llm.embeddings import DIM, embedding_norm_outliers

    rows = embedding_norm_outliers(spark, SF_DIR).collect()
    assert rows, "no labels audited"
    for r in rows:
        assert 1.0 <= r.mean_pr <= DIM + 1e-6
        assert r.std_pr >= 0.0
        assert 0 <= r.n_pr_low <= r.n_vecs
        assert 0 <= r.n_norm_outliers <= r.n_vecs
        assert r.mean_norm2 > 0.0


def test_pca_power_converges_toward_dominant_direction(spark):
    """The returned direction is unit-norm and its Rayleigh quotient
    (energy captured) strictly exceeds the seed direction's — power
    iteration made progress."""
    import numpy as np

    from ls_hadoop_3_0_spark.llm.embeddings import (
        _pca_seed,
        embedding_pca_power,
    )
    from ls_hadoop_3_0_spark.tables import load

    rows = sorted(embedding_pca_power(spark, SF_DIR).collect(), key=lambda r: r.dim)
    v = np.array([r.loading for r in rows])
    assert abs(float(v @ v) - 1.0) < 1e-9
    X = np.array(
        [r.embedding for r in load(spark, SF_DIR, "embeddings").collect()],
        dtype=np.float64,
    )
    seed = np.array(_pca_seed())
    rq = lambda u: float(u @ (X.T @ (X @ u)))  # noqa: E731
    assert rq(v) > rq(seed) * 1.05, (rq(v), rq(seed))
