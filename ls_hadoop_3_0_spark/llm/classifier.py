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

- pass 1 (train): per-class feature means over hashed features,
  w = mean(x | y=1) − mean(x | y=0);
- pass 2 (calibrate): threshold τ = midpoint of the two class-mean
  margins w·x;
- score: the algebraic fast sigmoid p = 1/2 + z/(2(1+|z|)) of z = m−τ
  (+,*,/,abs only — NO transcendental, no libm drift surface).

MEASURED NEGATIVE (r14, recorded so it is not re-tried): fast-sigmoid
batch GD — the VERDICT-suggested 2-3 logistic GD rounds — was built
first and swept (rounds 2-8 × lr 1-1024, raw/centered/centroid-init):
the surrogate's fat-tailed residuals never stop moving correctly
classified points, so accuracy OSCILLATES with round count (0.236/0.764
all-one-class flips; best calibrated point 0.874 at 1 refinement round,
DEGRADING monotonically after) while the closed-form discriminant sits
at 0.85 with zero hyperparameters. Two exact chained passes keep the
iterative-recipe structure (state re-quantized through scaled longs
between passes, oracle unrolled as MATERIALIZED CTEs) without the
divergence surface.

Cross-engine determinism (the pagerank/kmeans recipe):

- Features are exact rationals: bucket count × DIM / doc token count.
- Per-feature contributions quantize to scaled longs BEFORE any
  corpus-order-dependent SUM (integer addition is associative).
- Every division/rounding runs ENGINE-SIDE with identical expression
  structure both sides (never python round: banker's vs half-away);
  driver-side state (w, τ) is collected as EXACT longs and re-embedded
  as literal/1e6 doubles (the bm25/kmeans literal rule).
- Margins are the PROVEN left-fold dot (DOT_SPARK <-> list_sum o
  list_transform) over a dense 65-vector (64 buckets + bias).

Scale: training is TWO passes over the corpus, each a map-side fold +
one bounded aggregation (65 rows / 1 row of exact longs — model-sized,
never corpus-sized, the driver-literal rule). Scoring is one map-only
pass. At 100 TB this is the textbook data-parallel closed-form fit:
communication O(dim) per pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.functions.text import _FH_U24, FEATURE_DIM, LANG_MARKERS
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load, spread

QC_D = FEATURE_DIM + 1  #: dense feature width: 64 hashed buckets + bias

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


def _qc_features_sql() -> str:
    """DuckDB CTE body producing ``fe`` = (doc_id, y, xs): xs the dense
    65-list [c_b * DIM / n_tokens for b in 0..63] ++ [1.0], y the
    marker-rule is-English label."""
    return f"""
        SELECT t.doc_id, d.y,
               list_append(list_transform(generate_series(0, {FEATURE_DIM - 1}),
                   b -> CAST(coalesce(mp[b][1], 0) * {FEATURE_DIM} AS DOUBLE)
                        / CAST(n AS DOUBLE)),
                   CAST(1 AS DOUBLE)) AS xs
        FROM (
            SELECT doc_id,
                   map_from_entries(list(struct_pack(k := bucket, v := c))) AS mp,
                   CAST(SUM(c) AS BIGINT) AS n
            FROM (
                SELECT doc_id, {_FH_U24} % {FEATURE_DIM} AS bucket,
                       CAST(COUNT(*) AS BIGINT) AS c
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                      FROM documents)
                WHERE word <> ''
                GROUP BY doc_id, bucket
            ) GROUP BY doc_id
        ) t
        JOIN (SELECT doc_id, {_is_en_rule_duck()} AS y
              FROM (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       t -> t <> '') AS toks
                    FROM documents)) d
          ON d.doc_id = t.doc_id
"""


def _qc_chain_sql() -> str:
    """The unrolled two-pass chain: fe -> class counts -> quantized
    class-mean-diff weights (pass 1) -> margin-midpoint threshold
    (pass 2) -> scored docs CTE ``sc`` = (doc_id, y, qp)."""
    dot = f"list_sum(list_transform(generate_series(1, {QC_D}), i -> w[i] * xs[i]))"
    return f"""fe AS MATERIALIZED ({_qc_features_sql()}),
    nn AS MATERIALIZED (
        SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
        FROM fe),
    gq AS (
        SELECT b,
               SUM(CASE WHEN y = 1 THEN qx ELSE 0 END) AS s1,
               SUM(CASE WHEN y = 0 THEN qx ELSE 0 END) AS s0
        FROM (SELECT y,
                     unnest(generate_series(1, {QC_D})) AS b,
                     unnest(list_transform(xs,
                         x -> CAST(round(x * 1e6) AS BIGINT))) AS qx
              FROM fe)
        GROUP BY b),
    wq AS MATERIALIZED (
        SELECT list(CASE WHEN n1 > 0 AND n0 > 0
                    THEN CAST(round(CAST(s1 AS DOUBLE) / n1
                                    - CAST(s0 AS DOUBLE) / n0) AS BIGINT)
                    ELSE CAST(0 AS BIGINT) END ORDER BY b) AS qw
        FROM gq, nn),
    mg AS (
        SELECT doc_id, y, xs, {dot} AS m
        FROM fe, (SELECT list_transform(qw,
                      q -> CAST(q AS DOUBLE) / 1e6) AS w FROM wq)),
    tq AS MATERIALIZED (
        SELECT CASE WHEN n1 > 0 AND n0 > 0
               THEN CAST(round((CAST(t1 AS DOUBLE) / n1
                                + CAST(t0 AS DOUBLE) / n0)
                               / CAST(2 AS DOUBLE)) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS qt
        FROM (SELECT SUM(CASE WHEN y = 1 THEN qm ELSE 0 END) AS t1,
                     SUM(CASE WHEN y = 0 THEN qm ELSE 0 END) AS t0
              FROM (SELECT y, CAST(round(m * 1e6) AS BIGINT) AS qm
                    FROM mg)), nn),
    sc AS MATERIALIZED (
        SELECT doc_id, y,
               CAST(round(({_SIG_DUCK}) * 1e6) AS BIGINT) AS qp
        FROM (SELECT doc_id, y, m - CAST(qt AS DOUBLE) / 1e6 AS z
              FROM mg, tq))"""


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


def _qc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, xs): dense 65-vector features + the rule label,
    lazily checkpointed — the compute-once input of both passes."""
    docs = spread(
        load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    )
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    cnt = (
        tok.select("doc_id", (F.expr(_FH_U24) % FEATURE_DIM).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = cnt.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "c"))).alias("mp"),
        F.sum("c").alias("n"),
    )
    # x_b = c_b * D / n (integer multiply exact, one rounded division):
    # unit-mean scaling — 1/D-scale features left the bias to dominate
    # (measured: degenerate all-negative model).
    xs = F.expr(
        f"concat(transform(sequence(0, {FEATURE_DIM - 1}),"
        f" b -> cast(coalesce(element_at(mp, b), 0L) * {FEATURE_DIM} as double)"
        f" / cast(n as double)), array(cast(1.0 as double)))"
    )
    y = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), t -> t <> '')").alias("toks"),
    ).select("doc_id", _is_en_rule_spark().alias("y"))
    return (
        per_doc.select("doc_id", xs.alias("xs"))
        .join(y, "doc_id")
        .localCheckpoint(eager=False)
    )


def _qc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, qp): scores under the trained+calibrated model as
    exact scaled longs (empty corpus -> empty frame, both engines)."""
    fe = _qc_features(spark, sf_dir)
    counts = fe.agg(
        F.sum((F.col("y") == 1).cast("long")).alias("n1"),
        F.sum((F.col("y") == 0).cast("long")).alias("n0"),
    ).collect()[0]
    n1, n0 = int(counts["n1"] or 0), int(counts["n0"] or 0)

    qw = [0] * QC_D
    if n1 > 0 and n0 > 0:
        # pass 1: class-mean difference, rounded ENGINE-side per bucket
        sums = (
            fe.select(
                "y",
                F.posexplode(
                    F.expr("transform(xs, x -> cast(round(x * 1e6) as bigint))")
                ).alias("i0", "qx"),
            )
            .groupBy("i0")
            .agg(
                F.sum(F.when(F.col("y") == 1, F.col("qx")).otherwise(0)).alias("s1"),
                F.sum(F.when(F.col("y") == 0, F.col("qx")).otherwise(0)).alias("s0"),
            )
            .select(
                "i0",
                F.round(
                    F.col("s1").cast("double") / F.lit(n1)
                    - F.col("s0").cast("double") / F.lit(n0),
                    0,
                )
                .cast("long")
                .alias("qd"),
            )
            .collect()  # QC_D rows of exact longs (model-size)
        )
        for row in sums:
            qw[row["i0"]] = int(row["qd"])

    wl = F.array(*[F.lit(q / 1e6) for q in qw])  # exact long / 1e6
    dot = "aggregate(zip_with(wl, xs, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"
    mg = fe.withColumn("wl", wl).withColumn("m", F.expr(dot))

    qt = 0
    if n1 > 0 and n0 > 0:
        # pass 2: margin-midpoint threshold, rounded ENGINE-side
        trow = (
            mg.select("y", F.round(F.col("m") * F.lit(1e6), 0).cast("long").alias("qm"))
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

    return mg.select(
        "doc_id",
        F.col("y").cast("int").alias("y"),
        F.round(
            F.expr(_SIG_SPARK.replace("z", f"(m - {qt}D / 1e6)")) * F.lit(1e6), 0
        )
        .cast("long")
        .alias("qp"),
    )


@query("quality_classifier", QUALITY_CLASSIFIER_SQL)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-EXT learned classifier: per-doc scores from a linear model
    trained in-engine (hashed features, closed-form class-centroid
    discriminant + margin-midpoint calibration — two exact passes).
    Target: distill the rule-based lang_id labeler (is-English); in a
    real curation stack the same operator distills wiki-vs-crawl
    quality (the CCNet recipe) — the training passes are
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
