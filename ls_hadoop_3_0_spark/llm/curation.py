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
from ls_hadoop_3_0_spark.tables import load, spread

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
        spread(load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet")
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
        spread(load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet")
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
        spread(load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet")
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


#: Token-ID n-gram size for contamination_tokens. The learned BPE vocab
#: here is near-character-grain (36 symbols + BPE_ROUNDS merges), so an
#: 8-id window spans ~2 words — long enough that a match means a shared
#: PHRASE fragment, short enough that every EVAL_SET phrase yields
#: multiple windows.
CONTAM_TOKEN_GRAM = 8


def _id_grams_duck(src_ids: str, g: int) -> str:
    """DuckDB: g-grams of a BIGINT-list column as space-joined id
    strings (unambiguous: ids are integers, ' ' never inside). RAW
    strings, not md5 — an 8-id gram is shorter than its 32-hex md5 and
    the bench side is a broadcast, so hashing was pure overhead
    (measured ~9% of the corpus gram stage at 100×)."""
    return (
        f"list_transform(range(1, len({src_ids}) - {g - 2}),"
        f" i -> array_to_string({src_ids}[i : i + {g - 1}], ' '))"
    )


def _contamination_tokens_sql() -> str:
    from ls_hadoop_3_0_spark.functions.text import (
        _BPE_WITH,
        _DOC_IDS_SQL,
        _SEG_IDS_SQL,
        BPE_UNK_ID,
    )

    g = CONTAM_TOKEN_GRAM
    return f"""
    {_BPE_WITH},
    {_SEG_IDS_SQL},
    {_DOC_IDS_SQL},
    bt AS (
        SELECT bench_id, word, pos FROM (
            SELECT bench_id, unnest(toks) AS word,
                   unnest(generate_series(1, len(toks))) AS pos
            FROM (SELECT bench_id, {_TOKS_SQL} AS toks
                  FROM {_eval_values_sql()}))),
    bwd AS (
        SELECT bt.bench_id, bt.pos,
               COALESCE(s.ids, [CAST({BPE_UNK_ID} AS BIGINT)]) AS ids
        FROM bt LEFT JOIN segids s USING (word)),
    bdd AS (
        SELECT bench_id, flatten(list(ids ORDER BY pos)) AS allids
        FROM bwd GROUP BY bench_id),
    bgrams AS (
        SELECT DISTINCT bench_id, unnest({_id_grams_duck('allids', g)}) AS gram
        FROM bdd WHERE len(allids) >= {g}),
    cgrams AS (
        SELECT doc_id, unnest({_id_grams_duck('allids', g)}) AS gram
        FROM dd WHERE len(allids) >= {g})
    SELECT cgrams.doc_id,
           CAST(COUNT(DISTINCT cgrams.gram) AS BIGINT) AS n_shared_grams,
           CAST(COUNT(DISTINCT bgrams.bench_id) AS BIGINT) AS n_bench_docs
    FROM cgrams JOIN bgrams ON cgrams.gram = bgrams.gram
    GROUP BY cgrams.doc_id
    """


def _contam_token_gate_ctes(sfx: str, doc_src: str) -> str:
    """Suffixed DuckDB CTE chain ending in ``contam{sfx}`` — the
    DISTINCT doc_ids of ``doc_src`` sharing at least one
    CONTAM_TOKEN_GRAM token-id gram with the authored eval set.

    The decontamination GATE form of _contamination_tokens_sql (same
    encode + gram shapes, reduced to an id set so a pipeline can
    anti-join it). Requires ``segids`` (_SEG_IDS_SQL) in scope;
    ``doc_src`` is a named CTE with (doc_id, text) — pass the NEW-slice
    CTE so the oracle's cost mirrors the increment-scale plan.
    """
    from ls_hadoop_3_0_spark.functions.text import BPE_UNK_ID

    g = CONTAM_TOKEN_GRAM
    return f"""
    bt{sfx} AS (
        SELECT bench_id, word, pos FROM (
            SELECT bench_id, unnest(toks) AS word,
                   unnest(generate_series(1, len(toks))) AS pos
            FROM (SELECT bench_id, {_TOKS_SQL} AS toks
                  FROM {_eval_values_sql()}))),
    bwd{sfx} AS (
        SELECT b.bench_id, b.pos,
               COALESCE(s.ids, [CAST({BPE_UNK_ID} AS BIGINT)]) AS ids
        FROM bt{sfx} b LEFT JOIN segids s USING (word)),
    bdd{sfx} AS (
        SELECT bench_id, flatten(list(ids ORDER BY pos)) AS allids
        FROM bwd{sfx} GROUP BY bench_id),
    bgrams{sfx} AS (
        SELECT DISTINCT unnest({_id_grams_duck('allids', g)}) AS gram
        FROM bdd{sfx} WHERE len(allids) >= {g}),
    dts{sfx} AS (
        SELECT doc_id, word, pos FROM (
            SELECT doc_id, unnest(toks) AS word,
                   unnest(generate_series(1, len(toks))) AS pos
            FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM {doc_src}))),
    dwd{sfx} AS (
        SELECT d.doc_id, d.pos,
               COALESCE(s.ids, [CAST({BPE_UNK_ID} AS BIGINT)]) AS ids
        FROM dts{sfx} d LEFT JOIN segids s USING (word)),
    ddd{sfx} AS (
        SELECT doc_id, flatten(list(ids ORDER BY pos)) AS allids
        FROM dwd{sfx} GROUP BY doc_id),
    contam{sfx} AS (
        SELECT DISTINCT doc_id
        FROM (SELECT doc_id, unnest({_id_grams_duck('allids', g)}) AS gram
              FROM ddd{sfx} WHERE len(allids) >= {g}) cg{sfx}
        JOIN bgrams{sfx} USING (gram))"""


@query("contamination_tokens", _contamination_tokens_sql())
def contamination_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 decontamination at TOKEN-ID grain (VERDICT r14 #2): eval
    leakage is conventionally measured on tokenized n-grams, not raw
    words — a contaminated doc that differs from the benchmark by
    whitespace/casing artifacts still collides at id grain, and the
    id stream is what the training pipeline actually consumes.

    Both the corpus and the AUTHORED eval set (EVAL_SET — the
    design-bounded side that makes the broadcast structurally correct,
    per contamination_check_v2) encode under the SAME learned BPE
    vocabulary (tokenizer_encode's encode shape: word stream joined to
    the vocabulary-grain id table, OOV → one UNK id, per-key ordered
    assembly). Grams are raw space-joined CONTAM_TOKEN_GRAM-id strings —
    NOT md5'd: hashing the gram key was measured as ~9% pure overhead
    against the broadcast bench side (r15 negative result, see
    _id_grams_duck). Output: per contaminated corpus doc,
    distinct shared grams and distinct matched benchmark docs — the
    contamination_check_v2 shape one representation level deeper.

    At 100 TB: one corpus encode (dictionary join), the gram stream as
    a LEAD window over the token-id stream — one doc-keyed sort, eight
    codegen'd leads, no per-position array slices: the first cut built
    each window with transform/slice/array_join and that interpreted
    HOF alone cost ~70 s at the 100× replica (the r13 tax at token
    grain) — filtered by a broadcast of a few hundred eval grams
    BEFORE any shuffle, one aggregation. The eval side is bounded by
    authorship, so the broadcast never grows with the corpus.
    """
    from ls_hadoop_3_0_spark.functions.text import _bpe_seg_ids

    prepare(spark)
    seg_ids = _bpe_seg_ids(spark, sf_dir).select("word", "ids")
    docs = spread(
        load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    )
    corp = _token_gram_stream(docs, seg_ids)
    bench = _bench_token_grams(spark, seg_ids)
    return (
        corp.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )


def _token_gram_stream(docs: DataFrame, seg_ids: DataFrame) -> DataFrame:
    """(doc_id, gram): every CONTAM_TOKEN_GRAM-id window of each doc's
    BPE id stream, as raw space-joined id strings.

    Built WITHOUT assembling per-doc id arrays: the (pos, idx) order of
    the exploded word/id stream IS the document's id sequence, so
    lead() over it yields every g-id window — one doc-keyed window
    sort, G-1 codegen'd leads, no per-position array slices (the r15
    fix for the r13 interpreted-HOF tax at token grain, 67 → 30 s at
    the 100× replica). Shared by contamination_tokens (full corpus)
    and pipeline_curation_v5 (new slice only — increment-scale cost).
    """
    from pyspark.sql import Window

    from ls_hadoop_3_0_spark.functions.text import BPE_UNK_ID

    g = CONTAM_TOKEN_GRAM
    ts = docs.select(
        "doc_id",
        F.posexplode(
            F.expr("filter(split(text, ' '), t -> t <> '')")
        ).alias("pos", "word"),
    )
    tokstream = (
        ts.join(seg_ids, "word", "left")
        .select(
            "doc_id",
            "pos",
            F.posexplode(
                F.coalesce(
                    F.col("ids"), F.array(F.lit(BPE_UNK_ID).cast("long"))
                )
            ).alias("idx", "id"),
        )
        .select("doc_id", "pos", "idx", F.col("id").cast("string").alias("s"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos", "idx")
    gram_cols = [F.col("s")] + [F.lead("s", k).over(w) for k in range(1, g)]
    return (
        tokstream.select(
            "doc_id",
            F.concat_ws(" ", *gram_cols).alias("gram"),
            F.lead("s", g - 1).over(w).alias("_last"),
        )
        .filter(F.col("_last").isNotNull())  # complete windows only
        .drop("_last")
    )


def _bench_token_grams(spark: SparkSession, seg_ids: DataFrame) -> DataFrame:
    """(bench_id, gram): distinct token-id grams of the AUTHORED eval
    set — the design-bounded side every token-grain decontamination
    broadcast hangs off."""
    from ls_hadoop_3_0_spark.functions.text import _bpe_encode_ids

    g = CONTAM_TOKEN_GRAM
    gram_expr = (
        f"transform(sequence(1, size(allids) - {g - 1}),"
        f" i -> array_join(slice(cast(allids as array<string>),"
        f" i, {g}), ' '))"
    )
    bench_df = spark.createDataFrame(
        list(EVAL_SET), "bench_id long, text string"
    )
    return (
        _bpe_encode_ids(bench_df, seg_ids, "bench_id")
        .filter(F.size("allids") >= g)
        .select("bench_id", F.explode(F.expr(gram_expr)).alias("gram"))
        .distinct()
    )


#: Repetition-filter gram sizes and flag thresholds (Gopher-style: top
#: n-gram fraction for short grams, duplicate n-gram fraction for long
#: ones — Rae et al. 2021 measure character fractions; we use token-
#: occurrence fractions, same signal, integer-exact across engines).
#: Thresholds tuned to flag the most-repetitive ~10% of the fixture
#: corpus (top2 p90 ≈ 0.069, top3 p90 ≈ 0.053).
REP_TOP2 = 0.07
REP_TOP3 = 0.05
REP_DUP5 = 0.10


def _grams_sql(n: int) -> str:
    """DuckDB: the n-gram list of token array ``t`` (empty when too short)."""
    return (
        f"list_transform(range(1, len(t) - {n} + 2),"
        f" i -> array_to_string(t[i : i + {n - 1}], ' '))"
    )


def _text_class_structure(
    docs: DataFrame,
) -> tuple[DataFrame | None, DataFrame]:
    """(member map, gate input) behind the text-gate class collapse (r11).

    The r10 dedup-probe recipe generalized to PURE-TEXT-FUNCTION gates
    (quality_repetition's metrics, quality_crossdup's class-grain
    derivation): when exact duplication is material, gates run on ONE
    representative per distinct text and members join back by content
    hash. Direct path: ``(None, docs)`` — no class/expansion shuffles on
    dup-free corpora (the probe only picks between value-identical
    plans; each caller's forced-path equivalence test pins that).

    Returns member map ``keyed`` = (doc_id, h) and class-grain
    ``rep_docs`` = (doc_id=rep, h, m=class size, text), the latter
    localCheckpointed (class-grain — the _minhash_structure rule; the
    probe runs BEFORE the checkpoint so its plan-hash cache stays warm).

    ``docs`` must carry (doc_id, text).
    """
    from ls_hadoop_3_0_spark.llm.dedup import _dup_ratio_material

    if not _dup_ratio_material(docs):
        return None, docs
    keyed = docs.select("doc_id", F.md5("text").alias("h"))
    reps = keyed.groupBy("h").agg(
        F.min("doc_id").alias("rep_id"), F.count(F.lit(1)).alias("m")
    )
    rep_docs = (
        docs.select("doc_id", "text")
        .join(
            reps.select(F.col("rep_id").alias("doc_id"), "h", "m").hint(
                "shuffle_hash"
            ),
            "doc_id",
        )
        .localCheckpoint(eager=False)
    )
    return keyed, rep_docs


@query(
    "quality_repetition",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    g AS (
        SELECT doc_id, 2 AS n, unnest({_grams_sql(2)}) AS g FROM t
        UNION ALL SELECT doc_id, 3, unnest({_grams_sql(3)}) FROM t
        UNION ALL SELECT doc_id, 4, unnest({_grams_sql(4)}) FROM t
        UNION ALL SELECT doc_id, 5, unnest({_grams_sql(5)}) FROM t
    ),
    per AS (SELECT doc_id, n, g, COUNT(*) AS c FROM g GROUP BY doc_id, n, g)
    SELECT doc_id,
           CAST(MAX(CASE WHEN n = 2 THEN c END) AS DOUBLE)
               / SUM(CASE WHEN n = 2 THEN c END) AS top2_frac,
           CAST(MAX(CASE WHEN n = 3 THEN c END) AS DOUBLE)
               / SUM(CASE WHEN n = 3 THEN c END) AS top3_frac,
           CAST(MAX(CASE WHEN n = 4 THEN c END) AS DOUBLE)
               / SUM(CASE WHEN n = 4 THEN c END) AS top4_frac,
           CAST(SUM(CASE WHEN n = 2 THEN
                    (CASE WHEN c > 1 THEN c ELSE 0 END) END) AS DOUBLE)
               / SUM(CASE WHEN n = 2 THEN c END) AS dup2_frac,
           CAST(SUM(CASE WHEN n = 5 THEN
                    (CASE WHEN c > 1 THEN c ELSE 0 END) END) AS DOUBLE)
               / SUM(CASE WHEN n = 5 THEN c END) AS dup5_frac,
           (CAST(MAX(CASE WHEN n = 2 THEN c END) AS DOUBLE)
                / SUM(CASE WHEN n = 2 THEN c END) > CAST({REP_TOP2} AS DOUBLE)
            OR CAST(MAX(CASE WHEN n = 3 THEN c END) AS DOUBLE)
                / SUM(CASE WHEN n = 3 THEN c END) > CAST({REP_TOP3} AS DOUBLE)
            OR CAST(SUM(CASE WHEN n = 5 THEN
                        (CASE WHEN c > 1 THEN c ELSE 0 END) END) AS DOUBLE)
                / SUM(CASE WHEN n = 5 THEN c END) > CAST({REP_DUP5} AS DOUBLE))
               AS is_repetitive
    FROM per GROUP BY doc_id
    """,
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 repetition filter: Gopher-style n-gram repetition signals.

    The quality dimension ``text_quality``'s length/stopword/TTR rules
    can't see: machine-generated or boilerplate text repeats PHRASES.
    Per document: fraction of n-gram occurrences claimed by the single
    most frequent n-gram (n=2,3,4) and fraction inside duplicated
    n-grams (n=2,5), plus the keep/flag verdict.

    Plan shape — ONE scan, not one per gram size: every gram size is
    materialized in a single tagged explode (array of (n, gram) structs
    flattened per doc), then one (doc_id, n, gram) count with map-side
    combine and one (doc_id) reduce that pivots all gram sizes to
    columns by conditional aggregation — no intermediate (doc_id, n)
    level. Two shuffles total, both keyed on doc_id —
    at 100 TB the gram stream is ~4× token count, linear. All fractions
    are exact-integer divisions → bit-stable; a doc too short for gram
    size n gets NULL metrics for that n on both engines (3-valued OR
    keeps the verdict identical).

    r11: every metric here is a pure function of the text, so the
    _text_class_structure collapse applies — when the dedup probe fires
    the gram pipeline runs per distinct-content class and members
    inherit their class metrics by hash (33.9 → 9.5 s at the 100×
    replica); dup-free corpora keep the direct plan. Oracle unchanged;
    forced-path equivalence pinned in tests/test_r11_keys.py.
    """
    prepare(spark)
    docs = spread(
        load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    ).select("doc_id", "text")
    keyed, gate_docs = _text_class_structure(docs)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    arms = ", ".join(
        f"CASE WHEN size(t) >= {n} THEN"
        f" transform(sequence(1, size(t) - {n} + 1),"
        f"  i -> named_struct('n', {n}, 'g', array_join(slice(t, i, {n}), ' ')))"
        f" ELSE CAST(array() AS array<struct<n:int,g:string>>) END"
        for n in (2, 3, 4, 5)
    )
    g = (
        gate_docs.select("doc_id", toks.alias("t"))
        .select("doc_id", F.explode(F.expr(f"flatten(array({arms}))")).alias("s"))
        .select("doc_id", F.col("s.n").alias("n"), F.col("s.g").alias("g"))
    )
    per = g.groupBy("doc_id", "n", "g").agg(F.count(F.lit(1)).alias("c"))
    n_, c = F.col("n"), F.col("c")

    def _top(n: int):
        return F.max(F.when(n_ == n, c)).cast("double") / F.sum(F.when(n_ == n, c))

    def _dup(n: int):
        # Inner otherwise(0) only fires when gram size n is present, so
        # a doc too short for n keeps NULL (matching the oracle's nested
        # CASE) while present-but-duplicate-free docs get exact 0.
        return F.sum(F.when(n_ == n, F.when(c > 1, c).otherwise(0))).cast(
            "double"
        ) / F.sum(F.when(n_ == n, c))

    top2, top3, dup5 = _top(2), _top(3), _dup(5)
    metrics = per.groupBy("doc_id").agg(
        top2.alias("top2_frac"),
        top3.alias("top3_frac"),
        _top(4).alias("top4_frac"),
        _dup(2).alias("dup2_frac"),
        dup5.alias("dup5_frac"),
        (
            (top2 > F.lit(REP_TOP2))
            | (top3 > F.lit(REP_TOP3))
            | (dup5 > F.lit(REP_DUP5))
        ).alias("is_repetitive"),
    )
    if keyed is None:
        return metrics
    # Members inherit their class rep's metrics by content hash; docs
    # whose class has no grams (<2 tokens) stay absent, as on the
    # direct path (identical text ⇒ identical gram stream).
    rep_h = gate_docs.select("doc_id", "h")
    return (
        metrics.join(rep_h, "doc_id")
        .drop("doc_id")
        .join(keyed.hint("shuffle_hash"), "h")
        .select(
            "doc_id",
            "top2_frac",
            "top3_frac",
            "top4_frac",
            "dup2_frac",
            "dup5_frac",
            "is_repetitive",
        )
    )


#: Domain-mixture sampling rates, keyed by source-number mod 4. Rates are
#: /256 md5-prefix thresholds (exact binary fractions → bit-stable
#: doubles): 26/256 ≈ 10.2%, 64/256 = 25%, 128/256 = 50%, keep-all.
MIX_THRESHOLDS = {0: ("1a", 26), 1: ("40", 64), 2: ("80", 128), 3: ("zz", 256)}


@query(
    "mix_domains",
    """
    WITH d AS (
        SELECT source, doc_id, n_chars,
               COALESCE(TRY_CAST(substr(source, 4) AS BIGINT) % 4, 3)
                   AS bucket,
               CASE COALESCE(TRY_CAST(substr(source, 4) AS BIGINT) % 4, 3)
                    WHEN 0 THEN '1a' WHEN 1 THEN '40'
                    WHEN 2 THEN '80' ELSE 'zz' END AS thr
        FROM documents
    )
    SELECT source,
           CASE bucket WHEN 0 THEN CAST(26 AS DOUBLE) / 256
                       WHEN 1 THEN CAST(64 AS DOUBLE) / 256
                       WHEN 2 THEN CAST(128 AS DOUBLE) / 256
                       ELSE CAST(1 AS DOUBLE) END AS rate,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < thr
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < thr
                         THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM d GROUP BY source, bucket, thr
    """,
)
def mix_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 domain-mixture sampling: per-source rates, hash-deterministic.

    The data-mixing pass that turns a raw crawl into a weighted training
    mix (downsample low-quality domains, keep curated ones whole). Rates
    are an AUTHORED rule (source-number mod 4 → md5-prefix threshold, the
    ``sample_hash`` mechanism), so membership is a pure function of
    (source, doc_id): same mix on every engine, rerun, and cluster size
    — no sampling state, no broadcast, no RNG. Map-side predicate + one
    source-keyed aggregation; at 100 TB the shuffle carries one partial
    row per (source × partition). Emitted rates are exact /256 binary
    fractions → bit-stable doubles.
    """
    prepare(spark)
    # try_cast + keep-all fallback: a regenerated fixture with a
    # different source naming scheme must degrade to rate 1.0, not throw
    # under ANSI mode (the anomaly_zscore fixture-drift rule).
    bucket = F.coalesce(F.expr("try_cast(substring(source, 4) AS BIGINT)") % 4, F.lit(3))
    thr = (
        F.when(bucket == 0, MIX_THRESHOLDS[0][0])
        .when(bucket == 1, MIX_THRESHOLDS[1][0])
        .when(bucket == 2, MIX_THRESHOLDS[2][0])
        .otherwise(MIX_THRESHOLDS[3][0])
    )
    rate = (
        F.when(bucket == 0, F.lit(MIX_THRESHOLDS[0][1] / 256.0))
        .when(bucket == 1, F.lit(MIX_THRESHOLDS[1][1] / 256.0))
        .when(bucket == 2, F.lit(MIX_THRESHOLDS[2][1] / 256.0))
        .otherwise(F.lit(1.0))
    )
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < thr
    return (
        load(spark, sf_dir, "documents")
        .select("source", "doc_id", "n_chars", rate.alias("rate"), keep.alias("keep"))
        .groupBy("source", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("kept_chars"),
        )
    )


#: PII redaction patterns (public C4-style scrub): plain-ASCII email and
#: a fixed-format phone. Both are Java-regex/RE2 common-subset syntax so
#: Spark and DuckDB compile them identically.
PII_EMAIL_RE = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
PII_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "text_redact_pii",
    """
    WITH raw AS (
        SELECT c_custkey,
               concat('contact ', c_name, ' at cust',
                      CAST(c_custkey AS VARCHAR), '@example.com or +1-555-',
                      lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')) AS s
        FROM customer
    ),
    red AS (
        SELECT c_custkey, s,
               regexp_replace(
                   regexp_replace(s, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+',
                                  '<EMAIL>', 'g'),
                   '\\+1-555-[0-9]{4}', '<PHONE>', 'g') AS r
        FROM raw
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(s, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(s, '\\+1-555-[0-9]{4}'))
                AS BIGINT) AS n_phones,
           CAST(length(r) AS BIGINT) AS red_len,
           md5(r) AS red_md5
    FROM red
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 PII scrubbing: regex redaction of emails/phones, C4-style.

    The scrub pass every public-crawl pipeline runs before training.
    The fixture corpus carries no PII, so the PII-laced text is
    SYNTHESIZED deterministically from the customer table (pure
    function of fixture columns — the scan_csv_badrecords staging
    idiom, minus the file): each row embeds one email and one
    fixed-format phone, then both are redacted and counted. The oracle
    rebuilds the identical string and redacts with the same patterns
    (Java-regex/RE2 common subset; DuckDB needs the 'g' flag for
    replace-all, Spark replaces all by default). Redacted text crosses
    the comparator as length+md5. Pure map-side expressions — one scan,
    zero shuffle at any corpus size.
    """
    prepare(spark)
    raw = F.concat(
        F.lit("contact "),
        F.col("c_name"),
        F.lit(" at cust"),
        F.col("c_custkey").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
    )
    red = F.regexp_replace(
        F.regexp_replace(raw, PII_EMAIL_RE, "<EMAIL>"),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.size(F.regexp_extract_all(raw, F.lit(PII_EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(PII_PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.length(red).cast("long").alias("red_len"),
        F.md5(red).alias("red_md5"),
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


#: Cross-document duplication gram size and flag threshold. n=8 sits
#: between the within-doc repetition grams (2-5) and exact-dedup — long
#: enough that sharing implies copied text, short enough to survive
#: small edits. Flag rule: MORE than half of a doc's gram occurrences
#: also appear in at least one other document.
CROSSDUP_N = 8
CROSSDUP_FLAG_FRAC = 0.5


@query(
    "quality_crossdup",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS t FROM documents),
    base AS (
        SELECT doc_id, CAST(len(t) - {CROSSDUP_N} + 1 AS BIGINT) AS n_grams
        FROM t WHERE len(t) >= {CROSSDUP_N}
    ),
    g AS (
        SELECT doc_id, unnest({_grams_sql(CROSSDUP_N)}) AS g
        FROM t WHERE len(t) >= {CROSSDUP_N}
    ),
    d AS (SELECT g, MIN(doc_id) AS mn, MAX(doc_id) AS mx,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM g GROUP BY g),
    excl AS (
        SELECT mn AS doc_id, CAST(SUM(c) AS BIGINT) AS n_excl
        FROM d WHERE mn = mx GROUP BY mn
    )
    SELECT base.doc_id, base.n_grams,
           base.n_grams - COALESCE(excl.n_excl, 0) AS n_shared,
           CAST(base.n_grams - COALESCE(excl.n_excl, 0) AS DOUBLE)
               / base.n_grams AS shared_frac,
           (CAST(base.n_grams - COALESCE(excl.n_excl, 0) AS DOUBLE)
               / base.n_grams > CAST({CROSSDUP_FLAG_FRAC} AS DOUBLE))
               AS is_crossdup
    FROM base LEFT JOIN excl ON base.doc_id = excl.doc_id
    """,
)
def quality_crossdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4/X7 cross-document duplicated n-gram fraction (Rae et al. 2021).

    The repetition key (quality_repetition) sees WITHIN-doc loops; this
    one sees text copied BETWEEN documents — boilerplate headers,
    licence blocks, templated articles — the signal the Gopher/Dolma
    curation stacks threshold before training. Per document: its 8-gram
    occurrences, how many of them also occur in ≥1 OTHER document, the
    exact-integer shared fraction, and the >50 % flag. Docs shorter
    than 8 tokens are excluded identically on both engines.

    Plan — the gram stream is shuffled ONCE, never joined back: a gram
    with ``min(doc_id) = max(doc_id)`` is EXCLUSIVE to that doc, and
    every one of its occurrences belongs to min(doc_id), so per-doc
    shared occurrences = (total grams, computed map-side from the token
    array) − (exclusive occurrences, summed over the vocabulary-scale
    exclusive-gram rows). First cut joined the full gram stream back to
    a per-gram shared flag — a second corpus-scale shuffle+sort of long
    gram strings: 62 s vs 43 s for this no-join-back form at the 100×
    replica (noop-sink protocol, min-of-2; an md5-keyed shuffle was
    tried and measured SLOWER — hash cost exceeds the byte savings).
    min/max/count is constant per-gram state, map-combined.
    Fractions are exact-int divisions, comparisons strict on identical
    doubles.

    r11 class collapse: unlike the repetition metrics, exclusivity is
    NOT a pure text function — but it IS a pure function of the class
    structure: a gram is exclusive to a doc iff it occurs in exactly
    ONE distinct-content class AND that class has ONE member (any
    multi-member class shares every one of its grams among its copies,
    and a gram spanning two classes is shared by construction). So when
    the probe fires, the gram stream runs at class grain with
    ``min(rep)=max(rep) AND m=1`` as the exclusivity test, and members
    inherit (n_grams, n_excl) by hash — multi-member classes get
    n_excl=0 without touching the gram stream. 43 → 11.6 s at the 100×
    replica; oracle unchanged, forced-path equivalence pinned in
    tests/test_r11_keys.py.
    """
    prepare(spark)
    n = CROSSDUP_N
    docs = spread(
        load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    ).select("doc_id", "text")
    keyed, gate_docs = _text_class_structure(docs)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    gram = (
        f"transform(sequence(1, size(t) - {n} + 1),"
        f" i -> array_join(slice(t, i, {n}), ' '))"
    )
    cols = ["doc_id"] if keyed is None else ["doc_id", "h", "m"]
    t = gate_docs.select(*cols, toks.alias("t")).filter(F.size("t") >= n)
    g = t.select("doc_id", F.explode(F.expr(gram)).alias("g"))
    d = g.groupBy("g").agg(
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
        F.count(F.lit(1)).alias("c"),
    )
    excl = (
        d.filter(F.col("mn") == F.col("mx"))
        .groupBy(F.col("mn").alias("doc_id"))
        .agg(F.sum("c").alias("n_excl"))
    )
    if keyed is None:
        base = t.select(
            "doc_id", (F.size("t") - n + 1).cast("long").alias("n_grams")
        )
        n_shared = F.col("n_grams") - F.coalesce(F.col("n_excl"), F.lit(0))
        frac = n_shared.cast("double") / F.col("n_grams")
        return base.join(excl.hint("merge"), "doc_id", "left").select(
            "doc_id",
            "n_grams",
            n_shared.alias("n_shared"),
            frac.alias("shared_frac"),
            (frac > F.lit(CROSSDUP_FLAG_FRAC)).alias("is_crossdup"),
        )
    base_rep = t.select(
        "doc_id", "h", "m", (F.size("t") - n + 1).cast("long").alias("n_grams")
    )
    rep_gate = base_rep.join(excl.hint("merge"), "doc_id", "left").select(
        "h",
        "n_grams",
        # A rep-exclusive gram is corpus-exclusive only for singleton
        # classes; every gram of an m≥2 class is shared by its copies.
        F.when(F.col("m") == 1, F.coalesce(F.col("n_excl"), F.lit(0)))
        .otherwise(F.lit(0))
        .alias("n_excl"),
    )
    n_shared = F.col("n_grams") - F.col("n_excl")
    frac = n_shared.cast("double") / F.col("n_grams")
    return keyed.join(rep_gate.hint("shuffle_hash"), "h").select(
        "doc_id",
        "n_grams",
        n_shared.alias("n_shared"),
        frac.alias("shared_frac"),
        (frac > F.lit(CROSSDUP_FLAG_FRAC)).alias("is_crossdup"),
    )


@query(
    "mix_temperature",
    """
    WITH c AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM c),
    w AS (
        SELECT source, n_docs, n_chars,
               CAST(n_docs AS DOUBLE) / t.total AS share,
               CAST(round(sqrt(CAST(n_docs AS DOUBLE) / t.total) * 1000000)
                    AS BIGINT) AS sq
        FROM c CROSS JOIN t
    )
    SELECT source, n_docs, n_chars, share,
           CAST(sq AS DOUBLE) / SUM(sq) OVER () AS weight_t2,
           (CAST(sq AS DOUBLE) / SUM(sq) OVER ()) / share AS boost
    FROM w
    """,
)
def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 temperature-based mixture reweighting (T=2) over sources.

    The multilingual/multi-domain rebalancing rule (sample source s
    with p_s ∝ share_s^(1/T)) that upweights tail domains without
    flattening the mix. T is fixed at 2 so the power is sqrt — a
    correctly-rounded IEEE op, bit-identical on both engines, where a
    general pow() would drift per-libm. Each sqrt is quantized to a
    scaled long BEFORE normalization, so the denominator is an exact
    integer sum (source-order-independent) and every emitted weight is
    a ratio of exact quantities.

    Plan: one source-keyed count (map-combined), a 1-row total stat, a
    window over the source-vocabulary-bounded summary (≤ domains, not
    corpus) — the whole key is one fact shuffle at any scale.
    """
    prepare(spark)
    from pyspark.sql import Window

    c = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    t = c.agg(F.sum("n_docs").alias("total"))
    share = F.col("n_docs").cast("double") / F.col("total")
    w = c.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_chars",
        share.alias("share"),
        F.round(F.sqrt(share) * 1_000_000).cast("long").alias("sq"),
    )
    denom = F.sum("sq").over(Window.partitionBy())
    wt = F.col("sq").cast("double") / denom
    return w.select(
        "source",
        "n_docs",
        "n_chars",
        "share",
        wt.alias("weight_t2"),
        (wt / F.col("share")).alias("boost"),
    )


# --------------------------------------------------------------------------
# r13 quality audits (VERDICT r12 item 7): the lang_id_confusion pattern
# applied to decontamination and domain mixing — cheap oracle-backed
# source-grain digests that make silent drift (eval-set edits, source
# renaming, threshold changes) a per-round driver-stamped measurement.


def _contamination_by_source_sql() -> str:
    """Wrap the contamination_check_v2 oracle as a CTE and reduce it to
    source grain (contaminated docs, shared-gram mass, exact-int rate)."""
    from ls_hadoop_3_0_spark.registry import ORACLES

    return f"""
    WITH hits AS ({ORACLES["contamination_check_v2"]}),
    ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source),
    hs AS (SELECT d.source,
                  CAST(COUNT(*) AS BIGINT) AS n_contaminated,
                  CAST(SUM(h.n_shared_grams) AS BIGINT) AS n_shared_grams
           FROM hits h JOIN documents d USING (doc_id)
           GROUP BY d.source)
    SELECT ns.source, ns.n_docs,
           CAST(COALESCE(hs.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           CAST(COALESCE(hs.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
           CAST(COALESCE(hs.n_contaminated, 0) AS DOUBLE) / ns.n_docs
               AS contamination_rate
    FROM ns LEFT JOIN hs USING (source)
    """


@query("contamination_by_source", _contamination_by_source_sql())
def contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4/X7 decontamination AUDIT at source grain: which domains leak
    the authored eval set, and how badly.

    A contaminated-doc list (contamination_check_v2) answers "which
    docs"; the number a curation run reports is per-SOURCE: docs
    screened, docs contaminated, total shared-gram mass, and the exact
    integer-ratio contamination rate — the drift gauge that catches an
    eval-set edit or a source pipeline regression the doc-grain key
    would bury in row noise.

    Scale: per-source doc counts are one map-combined source-grain
    aggregation (never a doc_id shuffle); the contaminated side is the
    v2 hit stream (bounded by actual contamination) joined to doc
    sources with AQE free to broadcast whichever side is small — no
    static hint (contaminated mass is data-dependent, not
    design-bounded). Rates are exact int→double divisions.
    """
    prepare(spark)
    hits = contamination_check_v2(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    ns = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    hs = (
        docs.join(hits, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_contaminated"),
            F.sum("n_shared_grams").alias("n_shared_grams"),
        )
    )
    return ns.join(hs, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce(F.col("n_contaminated"), F.lit(0))
        .cast("long")
        .alias("n_contaminated"),
        F.coalesce(F.col("n_shared_grams"), F.lit(0))
        .cast("long")
        .alias("n_shared_grams"),
        (
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("double")
            / F.col("n_docs")
        ).alias("contamination_rate"),
    )


def _mix_weights_audit_sql() -> str:
    """Wrap the mix_domains oracle as a CTE and audit realized keep
    fractions against the authored rates with a 3σ binomial band —
    the SAME arithmetic expression on both engines (constants cast to
    DOUBLE per the DuckDB-DECIMAL rule)."""
    from ls_hadoop_3_0_spark.registry import ORACLES

    return f"""
    WITH m AS ({ORACLES["mix_domains"]})
    SELECT source, rate, n_docs, n_kept,
           CAST(n_kept AS DOUBLE) / n_docs AS realized_rate,
           ABS(CAST(n_kept AS DOUBLE) / n_docs - rate) AS abs_dev,
           CAST(3 AS DOUBLE)
               * sqrt(rate * (CAST(1 AS DOUBLE) - rate) / n_docs) AS tol3,
           ABS(CAST(n_kept AS DOUBLE) / n_docs - rate)
               <= CAST(3 AS DOUBLE)
                  * sqrt(rate * (CAST(1 AS DOUBLE) - rate) / n_docs)
               AS within_tol
    FROM m
    """


@query("mix_weights_audit", _mix_weights_audit_sql())
def mix_weights_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4/X7 domain-mixture DRIFT AUDIT: realized keep fraction per
    source vs its authored rate, flagged against a 3σ binomial band.

    mix_domains' md5-prefix sampling is deterministic, so its realized
    fraction is a constant of the fixture — but a threshold edit, a
    source renaming (the try_cast degrade silently re-bucketing a
    domain to keep-all), or a fixture regeneration all move it. This
    audit makes that a per-round stamped number: |realized − rate| must
    sit inside 3·sqrt(rate·(1−rate)/n) — the tolerance an md5-uniform
    sample satisfies w.h.p., and a re-bucketed source violates
    immediately (its realized rate jumps to a different authored rate).

    Determinism: realized/rate are exact ratios; dev/tol are the SAME
    left-to-right expression on both engines (sqrt of identical doubles
    — bit-equal, so the boolean comparison can never straddle). Scale:
    source-grain post-processing of mix_domains' one map-combined
    aggregation; nothing beyond the source vocabulary after the scan.
    """
    prepare(spark)
    m = mix_domains(spark, sf_dir)
    realized = F.col("n_kept").cast("double") / F.col("n_docs")
    dev = F.abs(realized - F.col("rate"))
    tol = F.lit(3.0) * F.sqrt(
        F.col("rate") * (F.lit(1.0) - F.col("rate")) / F.col("n_docs")
    )
    return m.select(
        "source",
        "rate",
        "n_docs",
        "n_kept",
        realized.alias("realized_rate"),
        dev.alias("abs_dev"),
        tol.alias("tol3"),
        (dev <= tol).alias("within_tol"),
    )


@query(
    "text_scrub",
    """
    WITH n AS (
        SELECT doc_id, source, text,
               trim(regexp_replace(regexp_replace(lower(text),
                        '[^a-z0-9 ]', ' ', 'g'),
                        ' +', ' ', 'g')) AS norm
        FROM documents
    )
    SELECT doc_id, source,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(norm) AS BIGINT) AS n_chars_norm,
           CAST(CASE WHEN norm = '' THEN 0
                     ELSE length(norm) - length(replace(norm, ' ', '')) + 1
                     END AS BIGINT) AS n_tokens_norm,
           md5(norm) AS norm_md5
    FROM n
    """,
)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 full text SCRUB: the aggressive canonicalization rung ABOVE
    functions.text.text_normalize (which only lowercases and collapses
    whitespace): lowercase, map non-[a-z0-9 ] characters to spaces,
    collapse whitespace runs, trim — the C4/Dolma-style alphabet scrub.
    Emits per-doc before/after char counts, the normalized token count,
    and the md5 of the scrubbed text — the content key downstream
    exact-dedup/fingerprint stages consume.

    Determinism: both regexes are Java-regex/RE2 common-subset (the PII
    pattern rule), lower() is ASCII-identical on the fixture alphabet,
    md5 hex matches across engines. Scale: map-only — one scan, zero
    shuffles; at 100 TB this pass fuses into whatever scan feeds it
    (whole-stage codegen, no lambda HOFs anywhere).
    """
    prepare(spark)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    d = spread(
        load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    ).select("doc_id", "source", "text", norm.alias("norm"))
    return d.select(
        "doc_id",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.length("norm").cast("long").alias("n_chars_norm"),
        F.when(F.col("norm") == "", F.lit(0))
        .otherwise(
            F.length("norm")
            - F.length(F.replace(F.col("norm"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("n_tokens_norm"),
        F.md5("norm").alias("norm_md5"),
    )
