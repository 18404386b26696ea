"""Shared embedding-vector preparation (SURVEY.md §2.12 X3/X5).

L2-normalization is done ONCE per vector (O(n·d)) so every downstream
cosine is a plain dot product — instead of recomputing two norms per
candidate pair (O(pairs·d)). The arithmetic is mirrored exactly by
``dedup.NORM_EMB_SQL`` on the DuckDB side: float→double widening per
element, sequential left-to-right sums, per-element division by the norm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_embeddings(emb: DataFrame) -> DataFrame:
    """vec_id, label, u = embedding / ||embedding||₂ (as array<double>)."""
    v = emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    return v.withColumn(
        "nrm", F.sqrt(F.expr("aggregate(v, 0D, (acc, y) -> acc + y * y)"))
    ).select("vec_id", "label", F.expr("transform(v, x -> x / nrm)").alias("u"))
