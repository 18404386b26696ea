"""Similarity search over embeddings — SURVEY.md §2.12 X3/X5 (EXT).

- ``knn_cosine`` — brute-force top-k cosine (the exact baseline, DuckDB
  oracle-checked).
- ``knn_lsh``    — random-hyperplane LSH-bucketed ANN (the scale path;
  rows-only key, recall vs brute force asserted in tests).

Scale notes: vectors are L2-normalized once (llm/embeddings.py), so
scoring is a plain dot product. Brute-force is O(|Q|·|N|·d) — correct
answer, quadratic cost; fine for a bounded query set against a
broadcastable corpus partition, wrong as the default at 100 TB. The LSH
variant buckets both sides on sign-bit signatures (an equi-join) so each
query only scores its bucket — the IVF/LSH upgrade path SURVEY §7 risk 5
calls for. Hyperplanes derive from md5 (deterministic, seedless).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.exprs import dsum

from ls_hadoop_3_0_spark.llm.dedup import NORM_EMB_SQL
from ls_hadoop_3_0_spark.llm.embeddings import (
    DIM,
    DOT_SPARK,
    N_PLANES,
    hyperplanes,  # noqa: F401  (re-export: tests + external callers)
    lsh_bucketed,
    normalized_embeddings,
    probe_signatures,
)
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

TOP_K = 10

_DOT_SPARK = DOT_SPARK


@query(
    "knn_cosine",
    f"""
    WITH e AS ({NORM_EMB_SQL}),
    q AS (SELECT vec_id AS q_id, u AS qu FROM e WHERE vec_id % 100 = 0),
    scored AS (
        SELECT q.q_id, e.vec_id AS n_id,
               round(list_sum(list_transform(generate_series(1, {DIM}),
                              i -> q.qu[i] * e.u[i])), 6) AS cosine
        FROM q JOIN e ON e.vec_id <> q.q_id
    )
    SELECT q_id, n_id, cosine, rnk FROM (
        SELECT q_id, n_id, cosine,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, n_id) AS rnk
        FROM scored)
    WHERE rnk <= {TOP_K}
    """,
)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 brute-force cosine top-k (queries: vec_id ≡ 0 mod 100).

    The query side is tiny and broadcast; scoring is a broadcast nested
    loop over the corpus — embarrassingly parallel, no shuffle until the
    per-query top-k window (partitioned by q_id).
    """
    prepare(spark)
    e = normalized_embeddings(load(spark, sf_dir, "embeddings")).select("vec_id", "u")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("u").alias("qu")
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        F.col("vec_id").alias("n_id"),
        F.round(F.expr(_DOT_SPARK.format(a="qu", b="u")), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "cosine", "rnk")
    )


@query("knn_lsh", None)  # ANN: approximate by design → rows-only check
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: multi-probe random-hyperplane LSH + in-bucket top-k.

    Signature = sign bits of 6 hyperplane projections (64 buckets). The
    query side probes its own bucket plus every 1-bit flip (7 probes) —
    still a plain equi-join on the signature, so each query scores
    ~7/64 of the corpus instead of all of it, with much better recall
    than single-probe (vectors near a hyperplane land across the flip).
    ``radius=2`` widens to bit-pair flips (22 probes) when recall
    matters more than probe fan-out. Recall vs knn_cosine asserted in
    tests/test_knn.py (including radius-2 > radius-1).
    """
    return lsh_topk(spark, sf_dir, radius=1)


def lsh_topk(spark: SparkSession, sf_dir: str, radius: int = 1) -> DataFrame:
    """knn_lsh body with the probe-radius knob exposed."""
    prepare(spark)
    e = lsh_bucketed(
        normalized_embeddings(load(spark, sf_dir, "embeddings")).select("vec_id", "u")
    )
    # Probe signatures: the bucket itself + every ≤radius-bit flip.
    probes = probe_signatures("bucket", N_PLANES, radius=radius)
    q = (
        e.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("u").alias("qu"),
            F.explode(probes).alias("bucket"),
        )
    )
    scored = (
        e.join(F.broadcast(q), ["bucket"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(F.expr(_DOT_SPARK.format(a="qu", b="u")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "cosine", "rnk")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path (SURVEY §7 r5).

IVF_K = 16  #: coarse-quantizer cells
IVF_NPROBE = 3  #: cells scored per query
IVF_TRAIN_MOD = 2  #: train the quantizer on vec_id % MOD == 1 (bounded sample)


def _seed_centroids(k: int = IVF_K, dim: int = DIM) -> list[list[float]]:
    """Deterministic md5-seeded unit vectors (same scheme as hyperplanes)."""
    cents = []
    for c in range(k):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"ivf:{c}:{i}".encode()).hexdigest()[:8]
            row.append((int(h, 16) / 2**32) * 2.0 - 1.0)
        nrm = math.sqrt(sum(x * x for x in row))
        cents.append([x / nrm for x in row])
    return cents


def _centroid_lit(cents: list[list[float]]) -> F.Column:
    """One ``Literal(array<array<double>>)`` node — NOT a CreateArray
    tree of k·dim scalar literals, which bloats every optimizer pass and
    codegen unit it appears in (measured: the tree form made the whole
    key ~6× slower at sf0.1 on pure plan overhead)."""
    return F.lit(cents)


def _cell() -> F.Column:
    """Map-side cell assignment: argmax-dot over the literal centroid
    array (unit vectors ⇒ max dot == max cosine == nearest cell). Pure
    expression — no shuffle, no UDF; ties break to the first (lowest)
    cell. (Lazy: F.expr needs an active SparkContext.)"""
    return F.expr("cast(array_position(dots, array_max(dots)) as int) - 1")


def _dots() -> F.Column:
    return F.expr("transform(cents, c -> " + DOT_SPARK.format(a="c", b="u") + ")")


def train_centroids(e: DataFrame, k: int = IVF_K) -> list[list[float]]:
    """One Lloyd refinement of the seeded quantizer over a bounded sample.

    Classic IVF trains the coarse quantizer on a sample, not the corpus —
    here vec_id % IVF_TRAIN_MOD == 1 (at 100 TB the MOD grows so the
    training set stays fixed-size). Per-dimension means go through
    scaled-long sums (exprs.dsum) so the refined centroids are
    bit-identical under any partitioning; the k×dim collect is quantizer
    metadata (KB-scale), not a data-path collect. Empty cells keep their
    seed vector.
    """
    seeds = _seed_centroids(k)
    sample = e.filter((F.col("vec_id") % IVF_TRAIN_MOD) == 1)
    assigned = (
        sample.withColumn("cents", _centroid_lit(seeds))
        .withColumn("dots", _dots())
        .withColumn("cell", _cell())
        .select("cell", F.posexplode("u").alias("pos", "x"))
    )
    means = (
        assigned.groupBy("cell", "pos")
        .agg((dsum("x") / F.count("x")).alias("m"))
        .collect()
    )
    cents = [list(row) for row in seeds]
    by_cell: dict[int, dict[int, float]] = {}
    for r in means:
        by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
    for c, dims in by_cell.items():
        row = [dims[i] for i in sorted(dims)]
        nrm = math.sqrt(sum(x * x for x in row))
        if nrm > 1e-9:
            cents[c] = [x / nrm for x in row]
    return cents


@query("knn_ivf", None)  # ANN: approximate by design → rows-only check
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 IVF-style ANN: coarse quantizer cells + nprobe cell scoring
    (the inverted-file scheme of Sivic & Zisserman's Video Google and
    Jégou et al.'s IVFADC — public literature; cells here score exact
    dot products instead of PQ codes).

    Index side: every vector is assigned map-side to its nearest of
    IVF_K trained centroids (argmax-dot expression — no shuffle). Query
    side: each query probes its IVF_NPROBE nearest cells and scores only
    those vectors via an equi-join on ``cell`` — per-query work drops
    from O(N) to O(N·nprobe/k), the IVF trade SURVEY §7 risk 5 names.
    Complements knn_lsh: data-adapted Voronoi cells (better recall on
    clustered corpora) vs data-oblivious hyperplanes.

    The assigned index is materialized (``localCheckpoint``) before the
    join — that IS the IVF design (build the index once, probe it per
    query; at 100 TB the build step writes parquet partitioned by
    ``cell`` instead). It also matters locally: without the barrier,
    projection collapse inlines the argmax-dot expression into the
    join's key and null-filter, and higher-order functions don't
    codegen, so the interpreted assignment re-runs per reference
    (measured 19 s → 2.5 s at sf0.1).
    """
    prepare(spark)
    e = normalized_embeddings(load(spark, sf_dir, "embeddings")).select("vec_id", "u")
    cents = _centroid_lit(train_centroids(e))
    idx = (
        e.withColumn("cents", cents)
        .withColumn("dots", _dots())
        .withColumn("cell", _cell())
        .drop("cents", "dots")
        .localCheckpoint()
    )
    # named_struct('nd', −dot, 'i', cell): array_sort orders by nd asc ⇒
    # dot desc, ties to the lower cell id — deterministic probe order.
    probe_cells = F.expr(
        f"transform(slice(array_sort(zip_with(dots, sequence(0, {IVF_K} - 1),"
        f" (d, i) -> named_struct('nd', -d, 'i', i))), 1, {IVF_NPROBE}), s -> s.i)"
    )
    q = (
        e.filter(F.col("vec_id") % 100 == 0)
        .withColumn("cents", cents)
        .withColumn("dots", _dots())
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("u").alias("qu"),
            F.explode(probe_cells).alias("cell"),
        )
        .localCheckpoint()  # tiny query set; same interpreted-HOF barrier
    )
    scored = (
        idx.join(F.broadcast(q), ["cell"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(F.expr(_DOT_SPARK.format(a="qu", b="u")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "cosine", "rnk")
    )
