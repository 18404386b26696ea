"""Learned quality/label classifier — SURVEY.md §2.12 X-EXT (r14).

The fasttext/CCNet capability class (VERDICT r13 missing #3): a linear
classifier TRAINED IN-ENGINE over hashing-trick features and applied to
every document. The supervision target is the rule-based ``lang_id``
labeler's own verdict (is-English by marker argmax) — the CCNet
distillation shape: learn a cheap linear model that imitates an
expensive/rule-based labeler, then score the whole corpus with it. (The
fixture's ``lang`` COLUMN is independent of its text by construction —
31-word shared vocabulary, identical marker rates across langs, pinned
by a converged-logistic probe at accuracy 0.512 — so a text-derived
label is the only honest supervised signal here.)

Estimator: the Rocchio / nearest-centroid linear discriminant with a
margin-midpoint calibration pass —

- pass 1 (train): per-class means of the quantized sparse features,
  w_b = mean(qx_b | y=1) − mean(qx_b | y=0);
- pass 2 (calibrate): threshold τ = midpoint of the two class-mean
  margins;
- score: the algebraic fast sigmoid p = 1/2 + z/(2(1+|z|)) of z = m−τ
  (+,*,/,abs only — NO transcendental, no libm drift surface).

MEASURED NEGATIVES (r14, recorded so they are not re-tried):

- fast-sigmoid batch GD (the VERDICT-suggested 2-3 logistic GD rounds)
  was built first and swept (rounds 2-8 × lr 1-1024, raw/centered/
  centroid-init): the surrogate's fat-tailed residuals never stop
  moving correctly classified points, so accuracy OSCILLATES with
  round count (0.236/0.764 all-one-class flips; best calibrated point
  0.874 at ONE refinement round, degrading after) while the
  closed-form discriminant sits at 0.85 with zero hyperparameters.
- the first implementation built a DENSE 65-vector per doc
  (map_from_entries + a transform(sequence(0,63), ...) HOF): at the
  100× replica that map-only prefix alone cost 25.2 s of the key's
  33 s (stage-isolated noop profile — the r13 interpreted-HOF tax,
  found exactly where that lesson says to look). This version is
  SPARSE-FIRST: no dense arrays, no maps, no HOFs anywhere in the
  corpus path.

Cross-engine determinism (the pagerank/kmeans recipe, sparse form):

- Features are exact scaled longs: qx_b = round(c_b·DIM/n · 1e6)
  (integer multiply exact, one correctly-rounded division, one
  engine-side round) — plus one bias row qx=1e6 per doc.
- EVERY corpus-order-dependent sum is an INTEGER sum of quantized
  terms (class sums of qx; margins as Σ round(qw_b·qx_b / 1e6) —
  int×int products below 2^53, so the double cast is exact).
- Every division/rounding runs ENGINE-SIDE with identical expression
  structure both sides (never python round: banker's vs half-away);
  driver-side state (qw, qτ) is collected as EXACT longs and
  re-embedded as literals (the bm25/kmeans literal rule).

Scale: training is TWO passes over the sparse (doc, bucket) stream,
each a map-combined aggregation (65 rows / 1 row of exact longs —
model-sized, never corpus-sized). Scoring is one more pass. At 100 TB
this is the textbook data-parallel closed-form fit: communication
O(dim) per pass. 100× replica: 33 s dense → ~14 s sparse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.functions.text import _FH_U24, FEATURE_DIM, LANG_MARKERS
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load, spread

QC_D = FEATURE_DIM + 1  #: feature width: 64 hashed buckets + bias (b=65)

#: The algebraic squash (same structure both engines after constant
#: casts): fast sigmoid — monotone, (0,1), exactly 0.5 at z=0.
_SIG_SPARK = "0.5D + z / (2.0D * (1.0D + abs(z)))"
_SIG_DUCK = (
    "CAST(0.5 AS DOUBLE) + z / (CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) + abs(z)))"
)


def _is_en_rule_duck() -> str:
    """The lang_id marker rule's is-English verdict over ``toks`` —
    the distillation target (functions/text.py lang_id, en arm)."""

    def hits(lang: str) -> str:
        arr = "[" + ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]) + "]"
        return f"len(list_filter(toks, t -> list_contains({arr}, t)))"

    others = ", ".join(hits(lg) for lg in ("de", "es", "fr", "zh"))
    return (
        f"CASE WHEN {hits('en')} >= greatest({others})"
        f" AND {hits('en')} > 0 THEN 1 ELSE 0 END"
    )


def _is_en_rule_spark() -> F.Column:
    def hits(lang: str) -> F.Column:
        arr = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
        return F.size(F.filter(F.col("toks"), lambda x: F.array_contains(arr, x)))

    en = hits("en")
    others = F.greatest(*[hits(lg) for lg in ("de", "es", "fr", "zh")])
    return ((en >= others) & (en > 0)).cast("int")


def _qc_sparse_sql(doc_pred: str = "TRUE", p: str = "") -> str:
    """DuckDB CTEs ``{p}nd`` (doc_id, n, y) and ``{p}sx`` (doc_id, b,
    qx): the quantized sparse feature stream + one bias row per doc,
    over the ``doc_pred``-restricted corpus slice (r15: the streaming
    gate trains on the PRIOR slice and scores the NEW one — two
    prefixed instantiations of the same chain)."""
    return f"""
    {p}cnt AS (
        SELECT doc_id, {_FH_U24} % {FEATURE_DIM} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents WHERE {doc_pred})
        WHERE word <> ''
        GROUP BY doc_id, bucket
    ),
    {p}nd AS MATERIALIZED (
        SELECT t.doc_id, t.n, d.y
        FROM (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
              FROM {p}cnt GROUP BY doc_id) t
        JOIN (SELECT doc_id, {_is_en_rule_duck()} AS y
              FROM (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       t -> t <> '') AS toks
                    FROM documents WHERE {doc_pred})) d
          ON d.doc_id = t.doc_id
    ),
    {p}sx AS MATERIALIZED (
        SELECT {p}cnt.doc_id, {p}cnt.bucket + 1 AS b,
               CAST(round(CAST(c * {FEATURE_DIM} AS DOUBLE)
                          / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS qx
        FROM {p}cnt JOIN {p}nd USING (doc_id)
        UNION ALL
        SELECT doc_id, {QC_D} AS b, CAST(1000000 AS BIGINT) AS qx
        FROM {p}nd
    )"""


def _qc_train_sql(p: str = "", d: int = QC_D) -> str:
    """Training CTEs ``nn/gq/wq/mg/tq`` over the ``{p}nd``/``{p}sx``
    feature stream: class counts -> quantized class-mean-diff weights
    (pass 1) -> margin-midpoint threshold (pass 2)."""
    return f"""nn AS MATERIALIZED (
        SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
        FROM {p}nd),
    gq AS (
        SELECT b,
               SUM(CASE WHEN y = 1 THEN qx ELSE 0 END) AS s1,
               SUM(CASE WHEN y = 0 THEN qx ELSE 0 END) AS s0
        FROM {p}sx JOIN {p}nd USING (doc_id)
        GROUP BY b),
    wq AS MATERIALIZED (
        -- complete over ALL buckets 1..QC_D (r15): when the SCORED
        -- slice differs from the training slice, buckets unseen in
        -- training must carry weight 0 (the Spark literal array's
        -- semantics), not vanish from the margin join.
        SELECT t.b,
               CASE WHEN n1 > 0 AND n0 > 0
               THEN COALESCE(CAST(round(CAST(s1 AS DOUBLE) / n1
                                  - CAST(s0 AS DOUBLE) / n0) AS BIGINT),
                             CAST(0 AS BIGINT))
               ELSE CAST(0 AS BIGINT) END AS qw
        FROM generate_series(1, {d}) t(b) LEFT JOIN gq USING (b), nn),
    mg AS MATERIALIZED (
        SELECT doc_id,
               CAST(SUM(CAST(round(CAST(qw * qx AS DOUBLE) / 1e6)
                             AS BIGINT)) AS BIGINT) AS qm
        FROM {p}sx JOIN wq USING (b)
        GROUP BY doc_id),
    tq AS MATERIALIZED (
        SELECT CASE WHEN n1 > 0 AND n0 > 0
               THEN CAST(round((CAST(t1 AS DOUBLE) / n1
                                + CAST(t0 AS DOUBLE) / n0)
                               / CAST(2 AS DOUBLE)) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS qt
        FROM (SELECT SUM(CASE WHEN y = 1 THEN qm ELSE 0 END) AS t1,
                     SUM(CASE WHEN y = 0 THEN qm ELSE 0 END) AS t0
              FROM mg JOIN {p}nd USING (doc_id)), nn)"""


def _qc_chain_sql() -> str:
    """The unrolled two-pass chain: sparse features -> training passes
    -> scored docs CTE ``sc`` = (doc_id, y, qp)."""
    return f"""{_qc_sparse_sql()},
    {_qc_train_sql()},
    sc AS MATERIALIZED (
        SELECT doc_id, y,
               CAST(round(({_SIG_DUCK}) * 1e6) AS BIGINT) AS qp
        FROM (SELECT mg.doc_id, nd.y,
                     CAST(qm - qt AS DOUBLE) / 1e6 AS z
              FROM mg JOIN nd USING (doc_id), tq))"""


QUALITY_CLASSIFIER_SQL = f"""
    WITH {_qc_chain_sql()}
    SELECT doc_id, CAST(y AS INT) AS y,
           CAST(qp AS DOUBLE) / 1e6 AS score,
           CAST(CASE WHEN qp >= 500000 THEN 1 ELSE 0 END AS INT) AS pred
    FROM sc
"""

QUALITY_CLASSIFIER_EVAL_SQL = f"""
    WITH {_qc_chain_sql()}
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN y = 1 AND qp >= 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN y = 0 AND qp >= 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN y = 1 AND qp < 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN y = 0 AND qp < 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS tn,
           CAST(SUM(CASE WHEN (y = 1) = (qp >= 500000) THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS accuracy
    FROM sc
    GROUP BY ALL HAVING COUNT(*) > 0
"""


def _qc_sparse(
    spark: SparkSession, sf_dir: str, doc_pred: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(nd, sx): per-doc (n, y) and the quantized sparse feature stream
    (doc_id, b in 1..QC_D, qx) including the bias row. Both lazily
    checkpointed — the compute-once inputs of both passes + scoring.
    ``doc_pred`` (r15) restricts the corpus slice."""
    docs = spread(
        load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    )
    if doc_pred is not None:
        docs = docs.filter(F.expr(doc_pred))
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    cnt = (
        tok.select("doc_id", (F.expr(_FH_U24) % FEATURE_DIM).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        # Compute-once (r16): nd AND sx both derive from this stream;
        # without the checkpoint each one's materialization re-ran the
        # corpus tokenize + feature-hash + count pass (guide §2.4 —
        # one corpus pass saved per training run at any scale).
        .localCheckpoint(eager=False)
    )
    y = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t <> '')").alias("toks"),
    ).select("doc_id", _is_en_rule_spark().alias("y"))
    nd = (
        cnt.groupBy("doc_id")
        .agg(F.sum("c").alias("n"))
        .join(y, "doc_id")
        .localCheckpoint(eager=False)
    )
    qx = F.round(
        (F.col("c") * FEATURE_DIM).cast("double")
        / F.col("n").cast("double")
        * F.lit(1e6),
        0,
    ).cast("long")
    sx = (
        cnt.join(nd.select("doc_id", "n"), "doc_id")
        .select("doc_id", (F.col("bucket") + 1).alias("b"), qx.alias("qx"))
        .unionAll(
            nd.select(
                "doc_id",
                F.lit(QC_D).alias("b"),
                F.lit(1_000_000).cast("long").alias("qx"),
            )
        )
        .localCheckpoint(eager=False)
    )
    return nd, sx


def _qc_margins(sx: DataFrame, qw: list[int]) -> DataFrame:
    """(doc_id, qm): per-doc quantized margins under weight vector qw —
    per-term quantized sparse dot, an INTEGER sum (associative by
    construction)."""
    wlq = F.array(*[F.lit(q).cast("long") for q in qw])
    term = (
        F.round(
            (F.element_at(wlq, F.col("b")) * F.col("qx")).cast("double")
            / F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("t")
    )
    return (
        sx.select("doc_id", term)
        .groupBy("doc_id")
        .agg(F.sum("t").alias("qm"))
    )


def _qc_fit(
    nd: DataFrame, sx: DataFrame, d: int = QC_D
) -> tuple[list[int], int, DataFrame]:
    """(qw, qt, mg): the two exact training passes over (nd, sx) —
    class-mean-difference weights, margin-midpoint threshold, and the
    TRAINING docs' margins (reused by _qc_scored where train == score
    set). Factored out (r15) so the streaming gate can freeze a model
    fit on the PRIOR slice only."""
    # FUSED pass 1 (r17, guide §2.4 — VERDICT r16 #5): the class counts
    # (n1, n0) and the per-bucket class sums used to be TWO sequential
    # driver actions, forced apart only because the old rounding
    # expression folded n1/n0 in as literals. One aggregation now serves
    # both: the bias row (b == d, one per doc with qx = 1e6) carries the
    # class counts, so a single corpus-scale job materializes cnt/nd/sx
    # AND collects everything pass 1 needs (d rows of exact longs —
    # model-size). The class-mean rounding stays ENGINE-side (never
    # python round: banker's vs half-away) by re-running the IDENTICAL
    # round(s1/n1 − s0/n0) expression over a d-row LOCAL frame — same
    # Catalyst expression on the same exact longs, bit-identical qd.
    spark = nd.sparkSession
    stats = (
        sx.join(nd.select("doc_id", "y"), "doc_id")
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("y") == 1, F.col("qx")).otherwise(0)).alias("s1"),
            F.sum(F.when(F.col("y") == 0, F.col("qx")).otherwise(0)).alias("s0"),
            F.sum((F.col("y") == 1).cast("long")).alias("c1"),
            F.sum((F.col("y") == 0).cast("long")).alias("c0"),
        )
        .collect()  # d rows of exact longs (model-size)
    )
    bias = next((r for r in stats if int(r["b"]) == d), None)
    n1 = int(bias["c1"]) if bias is not None else 0
    n0 = int(bias["c0"]) if bias is not None else 0

    qw = [0] * d
    if n1 > 0 and n0 > 0:
        sums = (
            spark.createDataFrame(
                [(int(r["b"]), int(r["s1"]), int(r["s0"])) for r in stats],
                "b int, s1 long, s0 long",
            )
            .select(
                "b",
                F.round(
                    F.col("s1").cast("double") / F.lit(n1)
                    - F.col("s0").cast("double") / F.lit(n0),
                    0,
                )
                .cast("long")
                .alias("qd"),
            )
            .collect()
        )
        for row in sums:
            qw[row["b"] - 1] = int(row["qd"])

    mg = _qc_margins(sx, qw).localCheckpoint(eager=False)

    qt = 0
    if n1 > 0 and n0 > 0:
        # pass 2: margin-midpoint threshold, rounded ENGINE-side
        trow = (
            mg.join(nd.select("doc_id", "y"), "doc_id")
            .agg(
                F.sum(F.when(F.col("y") == 1, F.col("qm")).otherwise(0)).alias("t1"),
                F.sum(F.when(F.col("y") == 0, F.col("qm")).otherwise(0)).alias("t0"),
            )
            .select(
                F.round(
                    (
                        F.col("t1").cast("double") / F.lit(n1)
                        + F.col("t0").cast("double") / F.lit(n0)
                    )
                    / F.lit(2.0),
                    0,
                )
                .cast("long")
                .alias("qt")
            )
            .collect()[0]
        )
        qt = int(trow["qt"])
    return qw, qt, mg


def _qc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, qp): scores under the trained+calibrated model as
    exact scaled longs (empty corpus -> empty frame, both engines)."""
    nd, sx = _qc_sparse(spark, sf_dir)
    qw, qt, mg = _qc_fit(nd, sx)
    z = (F.col("qm") - F.lit(qt)).cast("double") / F.lit(1e6)
    return (
        mg.join(nd.select("doc_id", "y"), "doc_id")
        .withColumn("z", z)
        .select(
            "doc_id",
            F.col("y").cast("int").alias("y"),
            F.round(F.expr(_SIG_SPARK) * F.lit(1e6), 0).cast("long").alias("qp"),
        )
    )


@query("quality_classifier", QUALITY_CLASSIFIER_SQL)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-EXT learned classifier: per-doc scores from a linear model
    trained in-engine (hashed sparse features, closed-form
    class-centroid discriminant + margin-midpoint calibration — two
    exact passes). Target: distill the rule-based lang_id labeler
    (is-English); in a real curation stack the same operator distills
    wiki-vs-crawl quality (the CCNet recipe) — the training passes are
    target-agnostic."""
    prepare(spark)
    return _qc_scored(spark, sf_dir).select(
        "doc_id",
        "y",
        (F.col("qp").cast("double") / F.lit(1e6)).alias("score"),
        (F.col("qp") >= 500000).cast("int").alias("pred"),
    )


@query("quality_classifier_eval", QUALITY_CLASSIFIER_EVAL_SQL)
def quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-EXT confusion audit of quality_classifier vs its labels: one
    row (n, tp, fp, fn, tn, accuracy) — the per-round driver-stamped
    measurement that the learned model actually separates the classes
    (the knn_recall pattern applied to the classifier)."""
    prepare(spark)
    sc = _qc_scored(spark, sf_dir)
    pred = (F.col("qp") >= 500000).cast("int")
    out = sc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("y") == 1) & (pred == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("y") == 0) & (pred == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("y") == 1) & (pred == 0)).cast("long")).alias("fn"),
        F.sum(((F.col("y") == 0) & (pred == 0)).cast("long")).alias("tn"),
        (
            F.sum((F.col("y") == pred).cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("accuracy"),
    )
    return out.filter(F.col("n") > 0)


# --------------------------------------------------------------------------
# quality_classifier_v2 (r15, VERDICT r14 #5): richer features — three
# hashed families instead of one. fasttext-class quality gates hash word
# unigrams + word bigrams + char-ngrams; v2 adds the latter two as
# additional FEATURE_DIM-bucket blocks with per-family L1 normalization,
# and the training passes are UNCHANGED (the estimator is
# feature-agnostic — exactly the property the sparse scaled-long design
# bought).

QC2_D = 3 * FEATURE_DIM + 1  #: unigram | bigram | char-3-gram | bias

_QC2_GRAM_U24 = "(" + __import__(
    "ls_hadoop_3_0_spark.operators.sort", fromlist=["_u24_expr"]
)._u24_expr("gram") + ")"


def _qc2_sparse_sql() -> str:
    """DuckDB CTEs ``v2nd``/``v2sx``: the three-family quantized sparse
    stream. Char-3-grams are extracted at VOCABULARY grain (the r11
    class-collapse rule: grams are a function of the WORD) and joined
    back to the corpus word stream; bigrams explode map-side from
    adjacent-token zips."""
    return f"""
    tok2 AS (
        SELECT doc_id, word FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
        WHERE word <> ''
    ),
    cnta AS (
        SELECT doc_id, {_FH_U24} % {FEATURE_DIM} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM tok2 GROUP BY doc_id, bucket
    ),
    na AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
           FROM cnta GROUP BY doc_id),
    tarr AS (SELECT doc_id,
                    list_filter(string_split(text, ' '), x -> x <> '') AS t
             FROM documents),
    bg AS (
        SELECT doc_id, l || ' ' || r AS gram
        FROM (SELECT doc_id, unnest(t[1:len(t)-1]) AS l,
                     unnest(t[2:len(t)]) AS r
              FROM tarr WHERE len(t) >= 2)
    ),
    cntb AS (
        SELECT doc_id, {_QC2_GRAM_U24} % {FEATURE_DIM} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM bg GROUP BY doc_id, bucket
    ),
    nb AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
           FROM cntb GROUP BY doc_id),
    vw AS (SELECT DISTINCT word FROM tok2 WHERE length(word) >= 3),
    cg AS (
        SELECT word, substring(word, i, 3) AS gram
        FROM (SELECT word, unnest(generate_series(1, length(word) - 2)) AS i
              FROM vw)
    ),
    wgb AS (
        SELECT word, {_QC2_GRAM_U24} % {FEATURE_DIM} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS wc
        FROM cg GROUP BY word, bucket
    ),
    cntc AS (
        SELECT doc_id, bucket, CAST(SUM(wc) AS BIGINT) AS c
        FROM tok2 JOIN wgb USING (word)
        GROUP BY doc_id, bucket
    ),
    nc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
           FROM cntc GROUP BY doc_id),
    v2nd AS MATERIALIZED (
        SELECT na.doc_id, na.n, d.y
        FROM na
        JOIN (SELECT doc_id, {_is_en_rule_duck()} AS y
              FROM (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       t -> t <> '') AS toks
                    FROM documents)) d
          ON d.doc_id = na.doc_id
    ),
    v2sx AS MATERIALIZED (
        SELECT cnta.doc_id, cnta.bucket + 1 AS b,
               CAST(round(CAST(c * {FEATURE_DIM} AS DOUBLE)
                          / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS qx
        FROM cnta JOIN na USING (doc_id)
        UNION ALL
        SELECT cntb.doc_id, cntb.bucket + {FEATURE_DIM + 1} AS b,
               CAST(round(CAST(c * {FEATURE_DIM} AS DOUBLE)
                          / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS qx
        FROM cntb JOIN nb USING (doc_id)
        UNION ALL
        SELECT cntc.doc_id, cntc.bucket + {2 * FEATURE_DIM + 1} AS b,
               CAST(round(CAST(c * {FEATURE_DIM} AS DOUBLE)
                          / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS qx
        FROM cntc JOIN nc USING (doc_id)
        UNION ALL
        SELECT doc_id, {QC2_D} AS b, CAST(1000000 AS BIGINT) AS qx
        FROM v2nd
    )"""


def _qc2_chain_sql() -> str:
    return f"""{_qc2_sparse_sql()},
    {_qc_train_sql("v2", d=QC2_D)},
    sc AS MATERIALIZED (
        SELECT doc_id, y,
               CAST(round(({_SIG_DUCK}) * 1e6) AS BIGINT) AS qp
        FROM (SELECT mg.doc_id, v2nd.y,
                     CAST(qm - qt AS DOUBLE) / 1e6 AS z
              FROM mg JOIN v2nd USING (doc_id), tq))"""


QUALITY_CLASSIFIER_V2_SQL = f"""
    WITH {_qc2_chain_sql()}
    SELECT doc_id, CAST(y AS INT) AS y,
           CAST(qp AS DOUBLE) / 1e6 AS score,
           CAST(CASE WHEN qp >= 500000 THEN 1 ELSE 0 END AS INT) AS pred
    FROM sc
"""

QUALITY_CLASSIFIER_EVAL_V2_SQL = f"""
    WITH {_qc2_chain_sql()}
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN y = 1 AND qp >= 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN y = 0 AND qp >= 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN y = 1 AND qp < 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN y = 0 AND qp < 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS tn,
           CAST(SUM(CASE WHEN (y = 1) = (qp >= 500000) THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS accuracy
    FROM sc
    GROUP BY ALL HAVING COUNT(*) > 0
"""


def _qc2_sparse(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(nd, sx) for the three-family feature space (b in 1..QC2_D)."""
    docs = spread(
        load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    )
    gram_u24 = F.expr(_QC2_GRAM_U24)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")

    # MEASURED NEGATIVE (r16): lazy-checkpointing cnt_a/b/c here is a
    # wash-to-slight-loss (alternating single-JVM A/B, 4 reps: base
    # min 4.81/med 5.54 s vs checkpointed min 5.19/med 5.60 s at
    # sf0.1) — the in-plan duplicates are already ReusedExchange'd and
    # the materialization cost cancels the cross-action savings. Do not
    # re-try; the v1 chain's single `cnt` checkpoint (narrower stream,
    # more cross-action consumers) is the one that pays.
    #
    # MEASURED NEGATIVE (r17, VERDICT r16 #6 — do not re-try): deriving
    # every word-multiset family from ONE (doc_id, word, wc) frame
    # (unigram buckets as Σwc, char-gram vocabulary + join at word
    # grain, the marker label as Σwc over marker words). Values are
    # exact integer identities and parity stays green, but the rewrite
    # REPLACES cheap codegen'd map passes with a corpus-grain
    # (doc, word) SHUFFLE this plan never had: cnt_a/b/c all partial-
    # aggregate map-side straight into (doc, bucket) grain, and the
    # char-gram dictionary join is a BROADCAST (the vocabulary is
    # Heaps-bounded), so the "five tokenize subtrees" are pure map work
    # over a page-cached scan. Alternating fresh-JVM A/B at the 100×
    # replica (48g protocol): old 78.3/78.7 s vs word-grain 90.2/108.8 s
    # (and with wd additionally localCheckpointed the cache's
    # deserialized-object heap pressure made runs swing 49–176 s).
    # sf0.1 read as a wash (3.37 vs 3.85 min-of-reps). The r11 rule
    # cuts both ways: collapse to class grain only when it REMOVES a
    # corpus-scale explode/shuffle — never when it introduces one.
    cnt_a = (
        tok.select("doc_id", (F.expr(_FH_U24) % FEATURE_DIM).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_a = cnt_a.groupBy("doc_id").agg(F.sum("c").alias("n"))

    # family B: word bigrams — map-side slice/zip (no lambda HOF, no
    # shuffle before the (doc, bucket) combine)
    tarr = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), x -> x <> '')").alias("t"),
    ).filter(F.size("t") >= 2)
    bg = (
        tarr.withColumn("la", F.expr("slice(t, 1, size(t) - 1)"))
        .withColumn("ra", F.expr("slice(t, 2, size(t) - 1)"))
        .select("doc_id", F.explode(F.arrays_zip("la", "ra")).alias("p"))
        .select(
            "doc_id",
            F.concat(F.col("p.la"), F.lit(" "), F.col("p.ra")).alias("gram"),
        )
    )
    cnt_b = (
        bg.select("doc_id", (gram_u24 % FEATURE_DIM).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_b = cnt_b.groupBy("doc_id").agg(F.sum("c").alias("n"))

    # family C: char-3-grams, extracted at VOCABULARY grain (a gram is
    # a function of the WORD — the r11 class-collapse rule; the corpus
    # never pays the per-token substring explode) and joined back
    vw = tok.select("word").distinct().filter(F.length("word") >= 3)
    cg = vw.select(
        "word",
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 2),"
                " i -> substring(word, i, 3))"
            )
        ).alias("gram"),
    )
    wgb = (
        cg.select("word", (gram_u24 % FEATURE_DIM).alias("bucket"))
        .groupBy("word", "bucket")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    cnt_c = (
        tok.join(wgb, "word")
        .groupBy("doc_id", "bucket")
        .agg(F.sum("wc").alias("c"))
    )
    n_c = cnt_c.groupBy("doc_id").agg(F.sum("c").alias("n"))

    y = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t <> '')").alias("toks"),
    ).select("doc_id", _is_en_rule_spark().alias("y"))
    nd = n_a.join(y, "doc_id").localCheckpoint(eager=False)

    def fam(cnt: DataFrame, n: DataFrame, off: int) -> DataFrame:
        qx = F.round(
            (F.col("c") * FEATURE_DIM).cast("double")
            / F.col("n").cast("double")
            * F.lit(1e6),
            0,
        ).cast("long")
        return cnt.join(n, "doc_id").select(
            "doc_id", (F.col("bucket") + off).alias("b"), qx.alias("qx")
        )

    sx = (
        fam(cnt_a, n_a, 1)
        .unionAll(fam(cnt_b, n_b, FEATURE_DIM + 1))
        .unionAll(fam(cnt_c, n_c, 2 * FEATURE_DIM + 1))
        .unionAll(
            nd.select(
                "doc_id",
                F.lit(QC2_D).alias("b"),
                F.lit(1_000_000).cast("long").alias("qx"),
            )
        )
        .localCheckpoint(eager=False)
    )
    return nd, sx


def _qc2_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    nd, sx = _qc2_sparse(spark, sf_dir)
    qw, qt, mg = _qc_fit(nd, sx, d=QC2_D)
    z = (F.col("qm") - F.lit(qt)).cast("double") / F.lit(1e6)
    return (
        mg.join(nd.select("doc_id", "y"), "doc_id")
        .withColumn("z", z)
        .select(
            "doc_id",
            F.col("y").cast("int").alias("y"),
            F.round(F.expr(_SIG_SPARK) * F.lit(1e6), 0).cast("long").alias("qp"),
        )
    )


@query("quality_classifier_v2", QUALITY_CLASSIFIER_V2_SQL)
def quality_classifier_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-EXT learned classifier, richer features: hashed word unigrams
    + word bigrams + char-3-grams (three FEATURE_DIM blocks, per-family
    L1 normalization, bias) — the fasttext feature recipe. Training is
    the UNCHANGED closed-form discriminant (same two exact passes, just
    a wider sparse stream); char-grams are extracted at vocabulary
    grain and joined back, so the corpus pays one dictionary join, not
    a per-token substring explode. Measured accuracy delta vs v1 is
    stamped per-round by quality_classifier_eval_v2."""
    prepare(spark)
    return _qc2_scored(spark, sf_dir).select(
        "doc_id",
        "y",
        (F.col("qp").cast("double") / F.lit(1e6)).alias("score"),
        (F.col("qp") >= 500000).cast("int").alias("pred"),
    )


@query("quality_classifier_eval_v2", QUALITY_CLASSIFIER_EVAL_V2_SQL)
def quality_classifier_eval_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-EXT confusion audit of quality_classifier_v2 — the per-round
    stamp of what the added bigram/char-gram families buy over v1's
    0.85 (an honest no-improvement result is a result)."""
    prepare(spark)
    sc = _qc2_scored(spark, sf_dir)
    pred = (F.col("qp") >= 500000).cast("int")
    out = sc.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("y") == 1) & (pred == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("y") == 0) & (pred == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("y") == 1) & (pred == 0)).cast("long")).alias("fn"),
        F.sum(((F.col("y") == 0) & (pred == 0)).cast("long")).alias("tn"),
        (
            F.sum((F.col("y") == pred).cast("long")).cast("double")
            / F.count(F.lit(1))
        ).alias("accuracy"),
    )
    return out.filter(F.col("n") > 0)
