"""Training-data curation operators — SURVEY.md §2.12 X4 (EXT).

The three corpus-preparation passes every LLM data pipeline runs between
raw scrape and tokenizer, complementing the dedup families (llm/dedup.py)
and the per-doc stats (functions/text.py):

- ``doc_chunk``           — split documents into fixed-size overlapping
  token windows (the context-window packing pre-pass).
- ``text_quality``        — Gopher-style rule-based quality filter with
  per-document keep/reject verdicts and machine-readable reasons.
- ``contamination_check`` — benchmark decontamination: flag corpus
  documents sharing token n-grams with a held-out evaluation set
  (``contamination_check_v2``: the authored-eval-set production form).
- ``doc_pack``            — sequence packing: concat-then-split window
  assignment over a distributed prefix sum (sort.global_prefix_sum).

Scale notes: chunking and quality scoring are pure map-side higher-order
functions (zero shuffle, zero Python — one scan each at 100 TB). The
contamination join is an equi-join on gram hash; whether the benchmark
side may be statically broadcast depends on where it comes from:
``contamination_check``'s stand-in eval set is a CORPUS SLICE (grows
with the corpus → no static hint, AQE decides), while
``contamination_check_v2``'s eval set is AUTHORED module constants —
design-bounded, so its static broadcast is structurally safe (see
SCALE.md's no-corpus-broadcast invariant). The corpus side streams
through map-side distinct + one aggregation in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

#: Chunking geometry: 16-token windows advancing 12 tokens (4 overlap).
CHUNK_SIZE = 16
CHUNK_STRIDE = 12

#: Tokenizer shared with functions/text.py: space-split, empties dropped.
_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"


@query(
    "doc_chunk",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    s AS (SELECT doc_id, t,
                 unnest(range(0, len(t), {CHUNK_STRIDE})) AS s
          FROM t)
    SELECT doc_id,
           CAST(s // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(len(t[s + 1 : s + {CHUNK_SIZE}]) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(t[s + 1 : s + {CHUNK_SIZE}], ' ')) AS chunk_md5
    FROM s
    """,
)
def doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 chunking: overlapping 16-token windows advancing 12 tokens.

    Every start position 0, stride, 2·stride, … below the token count
    yields one chunk (the tail chunk may be short). Chunk content crosses
    the oracle as an md5 so whole documents never hit the comparator.
    Pure map-side: tokenize → sequence of starts → explode → slice, all
    inside codegen; output size is ~n_tokens/stride rows per doc, linear
    in corpus size. No shuffle at any scale.
    """
    prepare(spark)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("t"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(F.lit(0), F.size("t") - 1, F.lit(CHUNK_STRIDE))
            ).alias("s"),
        )
    )
    ck = F.slice("t", F.col("s") + 1, CHUNK_SIZE)
    return d.select(
        "doc_id",
        F.expr(f"CAST(s div {CHUNK_STRIDE} AS BIGINT)").alias("chunk_id"),
        F.col("s").cast("long").alias("chunk_start"),
        F.size(ck).cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join(ck, " ")).alias("chunk_md5"),
    )


#: Quality-rule constants (Gopher-ish, tuned to discriminate on the
#: fixture corpus: token counts 10-99, ttr 0.28-1.0, stopword 0-0.29).
QMIN_TOKENS = 20
QMAX_TOKENS = 2000
QMIN_AVG_WORD_LEN = 2.0
QMAX_AVG_WORD_LEN = 5.0
QMIN_STOPWORD_RATIO = 0.02
QMIN_TTR = 0.35

_STOP = ("the", "of", "and", "a", "to", "in", "is", "it", "on", "for")
_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in _STOP) + "]"


@query(
    "text_quality",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    m AS (
        SELECT doc_id,
               len(t) AS n_tokens,
               CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                   / NULLIF(len(t), 0) AS awl,
               CAST(len(list_filter(t, x -> list_contains({_STOP_SQL}, x)))
                    AS DOUBLE) / NULLIF(len(t), 0) AS stop_ratio,
               CAST(len(list_distinct(t)) AS DOUBLE) / NULLIF(len(t), 0)
                   AS ttr
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           awl, stop_ratio, ttr,
           (n_tokens >= {QMIN_TOKENS} AND n_tokens <= {QMAX_TOKENS}
            AND awl >= {QMIN_AVG_WORD_LEN} AND awl <= {QMAX_AVG_WORD_LEN}
            AND stop_ratio >= {QMIN_STOPWORD_RATIO}
            AND ttr >= {QMIN_TTR}) AS keep,
           concat_ws(';',
               CASE WHEN n_tokens < {QMIN_TOKENS} THEN 'short' END,
               CASE WHEN n_tokens > {QMAX_TOKENS} THEN 'long' END,
               CASE WHEN awl < {QMIN_AVG_WORD_LEN}
                      OR awl > {QMAX_AVG_WORD_LEN} THEN 'word_len' END,
               CASE WHEN stop_ratio < {QMIN_STOPWORD_RATIO}
                    THEN 'low_stopword' END,
               CASE WHEN ttr < {QMIN_TTR} THEN 'repetitive' END) AS reasons
    FROM m
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 quality filter: rule-based keep/reject with reason codes.

    The Gopher-style heuristic gate (length bounds, mean word length,
    stopword floor, type-token-ratio floor). Every ratio is an
    exact-integer division — bit-stable doubles, so the rule comparisons
    and the emitted metrics agree across engines and partitionings.
    Reasons are fixed-order ';'-joined codes (concat_ws skips the NULL
    branches identically in both engines). One scan, zero shuffle.

    Empty-document guard (matches doc_chunk's defensiveness): a
    whitespace-only doc has zero tokens, and under the session's ANSI
    mode a bare ``/ n`` would throw DIVIDE_BY_ZERO where the oracle
    emits NULL metrics. Dividing by NULLIF(n, 0) on BOTH sides makes
    the two engines agree on the same NULL-metrics row (keep stays
    FALSE via three-valued AND with the failing length bound).
    """
    prepare(spark)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    t = F.col("t")
    n = F.size(t)
    nz = F.nullif(n, F.lit(0))
    stop_arr = F.array(*[F.lit(w) for w in _STOP])
    m = (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            n.alias("n_tokens"),
            (
                F.aggregate(
                    t, F.lit(0).cast("long"), lambda a, x: a + F.length(x).cast("long")
                ).cast("double")
                / nz
            ).alias("awl"),
            (
                F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x))).cast(
                    "double"
                )
                / nz
            ).alias("stop_ratio"),
            (F.size(F.array_distinct(t)).cast("double") / nz).alias("ttr"),
        )
    )
    nt, awl, sr, ttr = (F.col(c) for c in ("n_tokens", "awl", "stop_ratio", "ttr"))
    keep = (
        (nt >= QMIN_TOKENS)
        & (nt <= QMAX_TOKENS)
        & (awl >= QMIN_AVG_WORD_LEN)
        & (awl <= QMAX_AVG_WORD_LEN)
        & (sr >= QMIN_STOPWORD_RATIO)
        & (ttr >= QMIN_TTR)
    )
    reasons = F.concat_ws(
        ";",
        F.when(nt < QMIN_TOKENS, "short"),
        F.when(nt > QMAX_TOKENS, "long"),
        F.when((awl < QMIN_AVG_WORD_LEN) | (awl > QMAX_AVG_WORD_LEN), "word_len"),
        F.when(sr < QMIN_STOPWORD_RATIO, "low_stopword"),
        F.when(ttr < QMIN_TTR, "repetitive"),
    )
    return m.select(
        "doc_id",
        nt.cast("long").alias("n_tokens"),
        "awl",
        "stop_ratio",
        "ttr",
        keep.alias("keep"),
        reasons.alias("reasons"),
    )


#: Contamination shingle width (tokens). 3-grams are the standard
#: decontamination unit for short benchmark strings; wider grams miss
#: paraphrase-level overlap entirely on small docs.
CONTAM_GRAM = 3


@query(
    "contamination_check",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    grams AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t) - {CONTAM_GRAM - 2}),
                      i -> md5(array_to_string(t[i : i + {CONTAM_GRAM - 1}], ' '))))
                   AS gram
        FROM t WHERE len(t) >= {CONTAM_GRAM}
    ),
    bench AS (SELECT DISTINCT doc_id AS bench_id, gram FROM grams
              WHERE doc_id % 100 = 0),
    corp AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 100 <> 0)
    SELECT corp.doc_id,
           CAST(COUNT(DISTINCT corp.gram) AS BIGINT) AS n_shared_grams,
           CAST(COUNT(DISTINCT bench.bench_id) AS BIGINT) AS n_bench_docs
    FROM corp JOIN bench ON corp.gram = bench.gram
    GROUP BY corp.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 decontamination: corpus docs sharing 3-grams with the eval set.

    Benchmark = docs with ``doc_id % 100 = 0`` (stand-in for a held-out
    eval suite). Both sides shingle with the same tokenizer, hash grams
    to md5 (fixed-width shuffle keys), distinct per doc, then equi-join
    corpus grams against benchmark grams and count distinct shared grams
    and distinct matched benchmark docs per corpus doc.

    100 TB: this key's "benchmark" is a CORPUS SLICE (doc_id % 100), so
    its gram side grows linearly with the corpus — a static broadcast
    here is exactly the un-demotable class the r5 audit removed from the
    dedup/tfidf keys (AQE can never demote a planned broadcast). No
    static hint: AQE broadcasts while the side is small and falls back
    to shuffle join as it grows. ``contamination_check_v2`` is the
    variant with a genuinely authored (design-bounded) eval set where a
    static broadcast IS structurally correct. The corpus side is one
    explode + map-side distinct + one aggregation either way.
    """
    prepare(spark)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    t = (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= CONTAM_GRAM)
    )
    grams = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {CONTAM_GRAM - 1}),"
                f" i -> md5(array_join(slice(t, i, {CONTAM_GRAM}), ' ')))"
            )
        ).alias("gram"),
    )
    bench = (
        grams.filter(F.col("doc_id") % 100 == 0)
        .select(F.col("doc_id").alias("bench_id"), "gram")
        .distinct()
    )
    # No corp-side distinct: the final COUNT(DISTINCT ...) aggregates
    # dedup anyway, and a pre-join distinct is a full corpus-gram
    # shuffle bought to save nothing (measured at 100×: the distinct
    # doubled the key's runtime). The bench side stays distinct — it is
    # the small side and join multiplicity would amplify output rows.
    corp = grams.filter(F.col("doc_id") % 100 != 0)
    return (
        corp.join(bench, "gram")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )


#: AUTHORED evaluation set (contamination_check_v2). This is the real
#: shape of a decontamination benchmark side: a human-curated, checked-in
#: list — bounded by CONSTRUCTION (it cannot grow with the corpus), which
#: is what makes the static broadcast below structurally legitimate where
#: v1's corpus-slice stand-in was not (ADVICE r5). Phrases are composed
#: from the fixture corpus's own vocabulary so the check discriminates on
#: any driver regeneration of the synthetic documents table.
EVAL_SET: tuple[tuple[int, str], ...] = (
    (0, "table scan fast filter pushdown on the sorted key column"),
    (1, "hash join small table against big table with broadcast"),
    (2, "window agg over the sorted stream of customer order data"),
    (3, "merge sort batch spill when the hash table grows big"),
    (4, "group by key then agg the value column per part"),
    (5, "query plan picks the merge join for sorted data"),
    (6, "slow scan of the big table without a filter"),
    (7, "stream the line data into a batch sink"),
    (8, "vector column stored as a big value blob"),
    (9, "customer query hits the small table first"),
    (10, "row group pruning cuts the scan fast"),
    (11, "spark window order by the sort key"),
    (12, "the part key hash spreads the data"),
    (13, "join order matters for the big query"),
    (14, "a small sort beats a big hash sometimes"),
)


def _eval_values_sql() -> str:
    """The eval set as a VALUES table constructor (DuckDB side)."""
    rows = ", ".join(
        "({}, '{}')".format(i, s.replace("'", "''")) for i, s in EVAL_SET
    )
    return f"(VALUES {rows}) AS bench_docs(bench_id, text)"


_GRAMS_EXPR_SQL = (
    f"unnest(list_transform(range(1, len(t) - {CONTAM_GRAM - 2}),"
    f" i -> md5(array_to_string(t[i : i + {CONTAM_GRAM - 1}], ' '))))"
)


@query(
    "contamination_check_v2",
    f"""
    WITH bt AS (SELECT bench_id, {_TOKS_SQL} AS t FROM {_eval_values_sql()}),
    bench AS (
        SELECT DISTINCT bench_id, {_GRAMS_EXPR_SQL} AS gram
        FROM bt WHERE len(t) >= {CONTAM_GRAM}
    ),
    t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents
          WHERE len({_TOKS_SQL}) >= {CONTAM_GRAM}),
    corp AS (SELECT DISTINCT doc_id, {_GRAMS_EXPR_SQL} AS gram FROM t)
    SELECT corp.doc_id,
           CAST(COUNT(DISTINCT corp.gram) AS BIGINT) AS n_shared_grams,
           CAST(COUNT(DISTINCT bench.bench_id) AS BIGINT) AS n_bench_docs
    FROM corp JOIN bench ON corp.gram = bench.gram
    GROUP BY corp.doc_id
    """,
)
def contamination_check_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 decontamination against the AUTHORED eval set (EVAL_SET).

    Same shingle/join/count shape as ``contamination_check``, but the
    benchmark side is the checked-in EVAL_SET constant instead of a
    corpus slice — so (a) every corpus document is screened (no %100
    carve-out), and (b) the ``F.broadcast`` is structurally justified:
    the eval side is bounded by authorship, not by a property of the
    data (the r5 broadcast-discipline rule's legitimate case). At
    100 TB the plan is: broadcast a few thousand eval grams, one
    map-side distinct + hash-join + aggregation over the corpus grams.
    """
    prepare(spark)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    gram_expr = (
        f"transform(sequence(1, size(t) - {CONTAM_GRAM - 1}),"
        f" i -> md5(array_join(slice(t, i, {CONTAM_GRAM}), ' ')))"
    )
    bench = (
        spark.createDataFrame(list(EVAL_SET), "bench_id long, text string")
        .select("bench_id", toks.alias("t"))
        .filter(F.size("t") >= CONTAM_GRAM)
        .select("bench_id", F.explode(F.expr(gram_expr)).alias("gram"))
        .distinct()
    )
    # No corp-side distinct (same rationale as contamination_check): the
    # broadcast bench filter cuts 26M exploded grams to the handful that
    # match BEFORE any shuffle, and COUNT(DISTINCT) dedups after — a
    # pre-join distinct would shuffle the whole gram stream for nothing
    # (measured 91 s → 46 s at the 100× corpus).
    corp = (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= CONTAM_GRAM)
        .select("doc_id", F.explode(F.expr(gram_expr)).alias("gram"))
    )
    return (
        corp.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )


#: Context-window size for sequence packing (tokens per training window).
PACK_WINDOW = 64


@query(
    "doc_pack",
    f"""
    WITH t AS (SELECT doc_id, len({_TOKS_SQL}) AS n_tokens FROM documents),
    c AS (
        SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS pack_start
        FROM t WHERE n_tokens > 0
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(pack_start AS BIGINT) AS pack_start,
           CAST(pack_start // {PACK_WINDOW} AS BIGINT) AS first_window,
           CAST((pack_start + n_tokens - 1) // {PACK_WINDOW} AS BIGINT)
               AS last_window,
           CAST((pack_start + n_tokens - 1) // {PACK_WINDOW}
                - pack_start // {PACK_WINDOW} + 1 AS BIGINT) AS n_windows
    FROM c
    """,
)
def doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4/X7 sequence packing: concat-then-split window assignment.

    The pre-tokenizer packing pass: documents are laid end-to-end in
    doc_id order and cut into fixed PACK_WINDOW-token training windows;
    each doc learns its global token offset and the window range it
    spans. Everything downstream (attention-mask boundaries, shard
    manifests) derives from these integers.

    The global running offset is the interesting part at 100 TB: a
    naive cumulative window is a single-partition scan. This uses
    ``sort.global_prefix_sum`` — range-partition on doc_id,
    per-partition running sum, partition-total offsets (metadata-sized
    collect) — the distributed scan, so the oracle's plain windowed
    SUM must agree exactly with a P-way parallel computation. Pure
    integer arithmetic: bit-exact on both engines by construction.
    """
    from ls_hadoop_3_0_spark.operators.sort import global_prefix_sum

    prepare(spark)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    t = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.size(toks).alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    c = global_prefix_sum(t, "n_tokens", "doc_id").withColumnRenamed(
        "_psum", "pack_start"
    )
    first_w = F.expr(f"pack_start div {PACK_WINDOW}")
    return c.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("pack_start").cast("long").alias("pack_start"),
        first_w.cast("long").alias("first_window"),
        F.expr(f"(pack_start + n_tokens - 1) div {PACK_WINDOW}")
        .cast("long")
        .alias("last_window"),
        (
            F.expr(f"(pack_start + n_tokens - 1) div {PACK_WINDOW}")
            - F.expr(f"pack_start div {PACK_WINDOW}")
            + 1
        )
        .cast("long")
        .alias("n_windows"),
    )
