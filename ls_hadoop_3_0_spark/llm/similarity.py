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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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
    Recall vs knn_cosine asserted in tests/test_knn.py.
    """
    prepare(spark)
    e = lsh_bucketed(
        normalized_embeddings(load(spark, sf_dir, "embeddings")).select("vec_id", "u")
    )
    # Probe signatures: the bucket itself + each single-bit flip.
    probes = probe_signatures("bucket", N_PLANES)
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
