"""Deduplication operators — SURVEY.md §2.7 U5 / §2.12 X1-X2 (EXT).

The LLM-training-data dedup ladder over ``documents``:

- ``dedup_exact``     — normalize → hash → group (X1; the distributed
                        exact pass every pipeline runs first).
- ``dedup_minhash``   — MinHash-LSH over word-3-shingles (X2): banding
                        turns O(n²) similarity into an equi-join on
                        (band, signature) buckets — the 100 TB path.
- ``dedup_simhash``   — per-doc SimHash signature + bucket sizes.
- ``dedup_ngram``     — exact n-gram Jaccard within a blocking key.
- ``dedup_embedding`` — cosine near-dup pairs within a blocking key.

Determinism: hash family = md5 (identical hex in Spark & DuckDB); minhash
= *lexicographic min* of md5 hex strings (no engine-specific integer
hashing); Jaccard/cosine are ratios of exact set sizes / sequential
dot products, rounded to 6.

Scale notes: every pairwise step is blocked (LSH bucket, source, label) —
no unblocked self-join anywhere. The shuffles are: one per groupBy, one
equi-join per candidate generation. Candidate verification joins shingle
sets back by doc_id (hash join on PK).

On fixture data (random word soup) near-dup pairs may legitimately be
empty at some SFs; the operators' correctness is additionally pinned by
tests/test_dedup.py on constructed near-duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

N_HASHES = 12
N_BANDS = 4
ROWS_PER_BAND = 3
MINHASH_JACCARD_T = 0.4
NGRAM_JACCARD_T = 0.2
EMB_COSINE_T = 0.4


@query(
    "dedup_exact",
    """
    SELECT md5(lower(trim(text))) AS content_hash,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 exact dedup: normalized-content hash → keep min doc_id per group."""
    prepare(spark)
    return (
        load(spark, sf_dir, "documents")
        .groupBy(F.md5(F.lower(F.trim("text"))).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + distinct word-3-shingles (docs with ≥3 tokens)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.expr("filter(split(text, ' '), t -> t <> '')").alias("w")
        )
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(1, size(w) - 2),"
                " i -> concat_ws(' ', slice(w, i, 3))))"
            ).alias("shingles"),
        )
    )


_SH_SQL = """
    SELECT doc_id,
           list_distinct(list_transform(generate_series(1, len(w) - 2),
               i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS shingles
    FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
          FROM documents)
    WHERE len(w) >= 3
"""


@query(
    "dedup_minhash",
    f"""
    WITH sh AS ({_SH_SQL}),
    mh AS (
        SELECT doc_id, shingles,
               list_transform(generate_series(0, {N_HASHES - 1}),
                   s -> list_min(list_transform(shingles,
                        g -> md5(concat(CAST(s AS VARCHAR), ':', g))))) AS mins
        FROM sh
    ),
    bands AS (
        SELECT doc_id, b,
               mins[b*{ROWS_PER_BAND}+1] || mins[b*{ROWS_PER_BAND}+2]
                   || mins[b*{ROWS_PER_BAND}+3] AS sig
        FROM mh CROSS JOIN (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        FROM bands a JOIN bands c
          ON a.b = c.b AND a.sig = c.sig AND a.doc_id < c.doc_id
    )
    SELECT cand.doc_a, cand.doc_b,
           round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
               AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_a
    JOIN sh sb ON sb.doc_id = cand.doc_b
    WHERE jaccard >= {MINHASH_JACCARD_T}
    """,
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 MinHash-LSH near-dedup (shingle → minhash → band → bucket join).

    12 hashes in 4 bands × 3 rows (b=4,r=3 ⇒ s-curve threshold
    (1/4)^(1/3) ≈ 0.63 collision knee); candidates verified with exact
    shingle-set Jaccard ≥ 0.4. Lexicographic-min md5 hex = the permutation
    hash, portable across engines.
    """
    prepare(spark)
    sh = _shingled(spark, sf_dir)
    mh = sh.select(
        "doc_id",
        "shingles",
        F.expr(
            f"transform(sequence(0, {N_HASHES - 1}),"
            " s -> array_min(transform(shingles,"
            " g -> md5(concat(cast(s as string), ':', g)))))"
        ).alias("mins"),
    )
    bands = mh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("b"),
        F.col("mins"),
    ).select(
        "doc_id",
        "b",
        F.concat(
            *[
                F.element_at("mins", F.col("b") * ROWS_PER_BAND + i + 1)
                for i in range(ROWS_PER_BAND)
            ]
        ).alias("sig"),
    )
    a, c = bands.alias("a"), bands.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.b") == F.col("c.b"))
            & (F.col("a.sig") == F.col("c.sig"))
            & (F.col("a.doc_id") < F.col("c.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("c.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")),
        6,
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= MINHASH_JACCARD_T)
    )


_HI_HEX = "('8','9','a','b','c','d','e','f')"


@query(
    "dedup_simhash",
    f"""
    WITH sigs AS (
        SELECT doc_id,
               array_to_string(list_transform(generate_series(1, 16),
                   i -> CASE WHEN list_sum(list_transform(toks,
                            t -> CASE WHEN substring(md5(t), i, 1) IN {_HI_HEX}
                                      THEN 1 ELSE -1 END)) > 0
                        THEN '1' ELSE '0' END), '') AS simhash
        FROM (SELECT doc_id,
                     list_distinct(list_filter(string_split(text, ' '),
                                               t -> t <> '')) AS toks
              FROM documents)
        WHERE len(toks) > 0
    )
    SELECT doc_id, simhash,
           COUNT(*) OVER (PARTITION BY simhash) AS bucket_size
    FROM sigs
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 SimHash: 16-bit majority-vote signature over token hashes.

    Bit i = sign of Σ_tokens (±1 by the i-th md5 hex digit's high bit).
    Near-dup docs differ in few bits; identical signatures form dedup
    buckets (bucket_size > 1 ⇒ candidates). Hamming-neighbor bucketing is
    the multi-probe extension (tests cover the signature property).
    """
    prepare(spark)
    from pyspark.sql import Window

    d = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.expr(
                "array_distinct(filter(split(text, ' '), t -> t <> ''))"
            ).alias("toks"),
        )
        .filter(F.size("toks") > 0)
    )
    simhash = F.expr(
        "concat_ws('', transform(sequence(1, 16),"
        " i -> CASE WHEN aggregate(toks, 0,"
        f" (acc, t) -> acc + CASE WHEN substring(md5(t), i, 1) IN {_HI_HEX}"
        " THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END))"
    )
    return d.select("doc_id", simhash.alias("simhash")).withColumn(
        "bucket_size", F.count(F.lit(1)).over(Window.partitionBy("simhash"))
    )


@query(
    "dedup_ngram",
    """
    WITH sh AS (
        SELECT doc_id, source,
               list_distinct(list_transform(generate_series(1, len(w) - 1),
                   i -> concat(w[i], ' ', w[i+1]))) AS grams
        FROM (SELECT doc_id, source,
                     list_filter(string_split(text, ' '), t -> t <> '') AS w
              FROM documents)
        WHERE len(w) >= 2
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE jaccard >= 0.2
    """,
)
def dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 exact bigram-Jaccard near-dedup, blocked by ``source``.

    The exact (non-sketch) baseline for minhash: O(block²) pairs — viable
    only because blocking caps block size; at 100 TB the blocking key
    would be an LSH bucket (see dedup_minhash).
    """
    prepare(spark)
    sh = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.expr("filter(split(text, ' '), t -> t <> '')").alias("w"),
        )
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            "source",
            F.expr(
                "array_distinct(transform(sequence(1, size(w) - 1),"
                " i -> concat(element_at(w, i), ' ', element_at(w, i + 1))))"
            ).alias("grams"),
        )
    )
    a = sh.select(
        F.col("source"), F.col("doc_id").alias("doc_a"), F.col("grams").alias("g_a")
    )
    b = sh.select(
        F.col("source").alias("source_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("grams").alias("g_b"),
    )
    jac = F.round(
        F.size(F.array_intersect("g_a", "g_b")).cast("double")
        / F.size(F.array_union("g_a", "g_b")),
        6,
    )
    return (
        a.join(b, (F.col("source") == F.col("source_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= NGRAM_JACCARD_T)
    )


@query(
    "dedup_embedding",
    f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_sum(list_transform(generate_series(1, 64),
                        i -> a.v[i] * b.v[i])) AS dot,
               sqrt(list_sum(list_transform(a.v, x -> x * x))) AS na,
               sqrt(list_sum(list_transform(b.v, x -> x * x))) AS nb
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, round(dot / (na * nb), 6) AS cosine
    FROM pairs
    WHERE round(dot / (na * nb), 6) >= {EMB_COSINE_T}
    """,
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X5 embedding-cosine near-dup pairs, blocked by ``label``.

    Dot products are sequential left-to-right double sums in both engines
    (Spark ``aggregate`` HOF ≡ DuckDB ``list_sum∘list_transform``) —
    bit-stable, then rounded to 6.
    """
    prepare(spark)
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    a = e.select(
        F.col("label"), F.col("vec_id").alias("vec_a"), F.col("v").alias("va")
    )
    b = e.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
    )
    dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"
    )
    na = F.sqrt(F.expr("aggregate(va, 0D, (acc, x) -> acc + x * x)"))
    nb = F.sqrt(F.expr("aggregate(vb, 0D, (acc, x) -> acc + x * x)"))
    cos = F.round(dot / (na * nb), 6)
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= EMB_COSINE_T)
    )
