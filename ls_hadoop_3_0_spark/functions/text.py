"""Text analysis — SURVEY.md §2.8 idiom queries + §2.12 X4 (EXT).

MR-example parity: ``wordcount`` (TokenCounterMapper + IntSumReducer,
P4+A1 — *the* canonical MapReduce program), ``grep_count`` (RegexMapper +
LongSumReducer, P3+A2). EXT training-data-pipeline operators: per-doc
text stats, TF-IDF top terms, language ID heuristic, BPE-ish token
counting, document fingerprinting.

Scale notes: everything is explode/groupBy/join on built-ins — one
shuffle per aggregation, map-side partial aggregation automatic. TF-IDF
joins term→document-frequency; the DF side is vocabulary-sized (≪ corpus)
and broadcastable at any realistic vocab size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load


@query(
    "wordcount",
    """
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4+A1: THE MapReduce program — tokenize, emit (word,1), grouped sum."""
    prepare(spark)
    return (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "grep_count",
    """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_matching
    FROM documents
    WHERE regexp_matches(text, '(^| )[a-z]{8,}( |$)')
    GROUP BY source
    """,
)
def grep_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3+A2 RegexMapper grep: count docs matching a regex, per source.

    Pattern = "contains a word of ≥8 letters" — matches ~80% of the
    fixture corpus (a vocabulary of DB-themed words), so the per-source
    counts are non-trivial and discriminating.
    """
    prepare(spark)
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").rlike(r"(^| )[a-z]{8,}( |$)"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_matching"))
    )


@query(
    "ngram_counts",
    """
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS bigram
        FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
              FROM documents)
    )
    GROUP BY bigram
    """,
)
def ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 n-gram statistics: corpus bigram counts (wordcount's big sibling).

    The n-gram language-model table a text pipeline derives from a
    corpus. Same tokenization as ``wordcount`` (space split, empties
    dropped), then adjacent pairs via ``zip_with`` over two shifted
    slices — all inside codegen; the shuffle carries (bigram, partial
    count) after map-side combine, so shuffle volume is bounded by the
    distinct-bigram vocabulary, not corpus size. Total bigram rows are
    at most total tokens − docs, linear in corpus size at 100 TB.
    """
    prepare(spark)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    bigrams = F.expr(
        "CASE WHEN size(t) >= 2 THEN"
        "  zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
        "           (a, b) -> concat(a, ' ', b)) "
        "ELSE CAST(array() AS array<string>) END"
    )
    return (
        load(spark, sf_dir, "documents")
        .select(toks.alias("t"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


STOPWORDS = ("the", "of", "and", "a", "to", "in", "is", "it", "on", "for")
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@query(
    "text_stats",
    f"""
    SELECT doc_id, lang,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
               / len(toks) AS avg_token_len,
           CAST(len(list_filter(toks, t -> list_contains({_STOP_SQL}, t))) AS DOUBLE)
               / len(toks) AS stopword_ratio,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
    FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents)
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 quality scoring: per-doc length/stopword/type-token stats.

    Ratios are exact-integer divisions (len/len) → bit-stable doubles.
    """
    prepare(spark)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", F.split("text", " ").alias("toks")
    )
    t = F.col("toks")
    n_tok = F.size(t)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return d.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_distinct"),
        (
            F.aggregate(t, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long"))
            .cast("double")
            / n_tok
        ).alias("avg_token_len"),
        (
            F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x))).cast("double")
            / n_tok
        ).alias("stopword_ratio"),
        (F.size(F.array_distinct(t)).cast("double") / n_tok).alias("ttr"),
    )


@query(
    "tfidf_topterms",
    """
    WITH tf AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> '' GROUP BY doc_id, word
    ),
    df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.word,
               round(tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
        FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tfidf, rnk FROM (
        SELECT doc_id, word, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, word) AS rnk
        FROM scored)
    WHERE rnk <= 3
    """,
)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 TF-IDF: term frequency × inverse document frequency, top-3/doc.

    The df table is vocabulary-sized — Heaps' law says vocabulary keeps
    growing (sub-linearly) with the corpus, so it must NOT be broadcast:
    at 100 TB it is GBs, and a statically-planned broadcast can never be
    demoted by AQE. merge keeps the scoring join shuffle-bound (AQE
    converts it to broadcast at runtime when df is actually small). The
    doc count is a literal-ish 1-row stat. Ties broken by word asc.
    """
    prepare(spark)
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # scalar fixture stat, not a data-path collect
    scored = tf.join(df.hint("merge"), "word").select(
        "doc_id",
        "word",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "word", "tfidf", "rnk")
    )


#: Distinctive stopword lists per language for the n-gram/stopword
#: language-ID heuristic (tiny, deterministic, public-knowledge lists).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "shi", "le", "wo", "ni"),
}


def _hits_sql(lang: str) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"
    return f"len(list_filter(toks, t -> list_contains({arr}, t)))"


@query(
    "lang_id",
    f"""
    SELECT doc_id, lang,
           CASE
             WHEN {_hits_sql('en')} >= greatest({_hits_sql('de')}, {_hits_sql('es')},
                                                {_hits_sql('fr')}, {_hits_sql('zh')})
                  AND {_hits_sql('en')} > 0 THEN 'en'
             WHEN {_hits_sql('de')} >= greatest({_hits_sql('es')}, {_hits_sql('fr')},
                                                {_hits_sql('zh')})
                  AND {_hits_sql('de')} > 0 THEN 'de'
             WHEN {_hits_sql('es')} >= greatest({_hits_sql('fr')}, {_hits_sql('zh')})
                  AND {_hits_sql('es')} > 0 THEN 'es'
             WHEN {_hits_sql('fr')} >= {_hits_sql('zh')}
                  AND {_hits_sql('fr')} > 0 THEN 'fr'
             WHEN {_hits_sql('zh')} > 0 THEN 'zh'
             ELSE 'und'
           END AS predicted
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 language ID: stopword-marker argmax with fixed priority order.

    Deterministic tie-break: en > de > es > fr > zh; 'und' when no marker
    hits. (A real system would use char n-gram profiles — same shape:
    per-language score columns + argmax.)
    """
    prepare(spark)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )
    t = F.col("toks")
    def _hits(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(w) for w in markers])
        # Single-arg lambda (PySpark passes (element, index) to 2-arg fns).
        return F.size(F.filter(t, lambda x: F.array_contains(arr, x)))

    hits = {lang: _hits(markers) for lang, markers in LANG_MARKERS.items()}
    pred = (
        F.when(
            (hits["en"] >= F.greatest(hits["de"], hits["es"], hits["fr"], hits["zh"]))
            & (hits["en"] > 0),
            "en",
        )
        .when(
            (hits["de"] >= F.greatest(hits["es"], hits["fr"], hits["zh"])) & (hits["de"] > 0),
            "de",
        )
        .when((hits["es"] >= F.greatest(hits["fr"], hits["zh"])) & (hits["es"] > 0), "es")
        .when((hits["fr"] >= hits["zh"]) & (hits["fr"] > 0), "fr")
        .when(hits["zh"] > 0, "zh")
        .otherwise("und")
    )
    return d.select("doc_id", "lang", pred.alias("predicted"))


@query(
    "token_count",
    """
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
                AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 token counting: whitespace split + BPE-ish regex segmentation."""
    prepare(spark)
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("long").alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), 0)
        )
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


@query(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text, ' '), t -> t <> '')))[1:8], ' '))
               AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 document fingerprinting: hash of the 8 smallest distinct tokens.

    An order-insensitive, whitespace-robust content fingerprint (the
    min-k-tokens sketch — a 1-permutation cousin of minhash; the full
    minhash/LSH pipeline lives in llm/dedup.py).
    """
    prepare(spark)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.array_join(F.slice(F.sort_array(F.array_distinct(toks)), 1, 8), " ")).alias(
            "fingerprint"
        ),
    )


@query(
    "text_normalize",
    r"""
    SELECT doc_id,
           CAST(length(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
                AS BIGINT) AS norm_len,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS norm_md5
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 text normalization: the canonical pre-dedup cleanup pass.

    Lowercase + trim + collapse whitespace runs to single spaces — the
    normalization every exact-dedup/fingerprint stage should share so
    cosmetic variation doesn't defeat it (dedup_exact hashes raw text by
    declared contract; this op is the composable pre-pass). Output is
    the normalized text's length + md5 so the oracle certifies the
    exact transform without shipping whole documents through the
    comparator. Pure JVM-side expressions — one scan, no shuffle.
    """
    prepare(spark)
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.length(norm).cast("long").alias("norm_len"),
        F.md5(norm).alias("norm_md5"),
    )
