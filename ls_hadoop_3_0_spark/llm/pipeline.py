"""End-to-end training-data curation pipeline — SURVEY.md §2.12 composed.

The operators exist individually (filters, text stats, exact dedup,
MinHash-LSH); this key chains them the way a 100 TB curation run would:

    normalize → language filter → quality filter (min tokens)
    → exact dedup (keep min doc_id per content hash)
    → MinHash-LSH near-dedup (drop the higher-id side of every pair)
    → emit curated docs + content hash

One lazy plan end-to-end (the reference would run this as a JobControl
DAG of 4-5 MR jobs with HDFS materialization between each). The DuckDB
oracle mirrors every stage as CTEs, reusing the parameterized minhash
SQL over the `kept` stage — two independently-written pipelines, one
hash-compared answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.llm.dedup import minhash_pairs, minhash_pairs_sql
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

KEEP_LANGS = ("en", "de", "es", "fr")
MIN_TOKENS = 10

_LANGS_SQL = ", ".join(f"'{lang}'" for lang in KEEP_LANGS)

PIPELINE_SQL = f"""
    WITH cleaned AS (
        SELECT doc_id, source, lang,
               lower(trim(text)) AS text,
               len(list_filter(string_split(lower(trim(text)), ' '),
                               t -> t <> '')) AS n_tokens
        FROM documents
        WHERE lang IN ({_LANGS_SQL})
    ),
    quality AS (
        SELECT * FROM cleaned WHERE n_tokens >= {MIN_TOKENS}
    ),
    kept AS (
        SELECT * FROM quality
        WHERE doc_id IN (SELECT MIN(doc_id) FROM quality GROUP BY md5(text))
    ),
    pairs AS (
        SELECT * FROM ({minhash_pairs_sql("kept")})
    )
    SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens,
           md5(text) AS content_hash
    FROM kept
    WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
    """


@query("pipeline_curation", PIPELINE_SQL)
def pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1-X4 composed: the curation run a reference user would schedule."""
    prepare(spark)
    docs = load(spark, sf_dir, "documents")
    norm = F.lower(F.trim("text"))
    toks = F.expr("filter(split(lower(trim(text)), ' '), t -> t <> '')")
    cleaned = (
        docs.filter(F.col("lang").isin(*KEEP_LANGS))
        .select(
            "doc_id",
            "source",
            "lang",
            norm.alias("text"),
            F.size(toks).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= MIN_TOKENS)
    )
    keepers = cleaned.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keeper")
    )
    kept = cleaned.join(
        keepers, cleaned.doc_id == keepers.keeper, "left_semi"
    )
    near_dropped = (
        minhash_pairs(kept.select("doc_id", "text"))
        .select(F.col("doc_b").alias("drop_id"))
        .distinct()
    )
    return kept.join(
        near_dropped, kept.doc_id == near_dropped.drop_id, "left_anti"
    ).select(
        "doc_id",
        "lang",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.md5("text").alias("content_hash"),
    )
