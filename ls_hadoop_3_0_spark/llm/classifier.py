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


def _qc_sparse_sql() -> str:
    """DuckDB CTEs ``nd`` (doc_id, n, y) and ``sx`` (doc_id, b, qx):
    the quantized sparse feature stream + one bias row per doc."""
    return f"""
    cnt AS (
        SELECT doc_id, {_FH_U24} % {FEATURE_DIM} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents)
        WHERE word <> ''
        GROUP BY doc_id, bucket
    ),
    nd AS MATERIALIZED (
        SELECT t.doc_id, t.n, d.y
        FROM (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
              FROM cnt GROUP BY doc_id) t
        JOIN (SELECT doc_id, {_is_en_rule_duck()} AS y
              FROM (SELECT doc_id,
                           list_filter(string_split(text, ' '),
                                       t -> t <> '') AS toks
                    FROM documents)) d
          ON d.doc_id = t.doc_id
    ),
    sx AS MATERIALIZED (
        SELECT cnt.doc_id, cnt.bucket + 1 AS b,
               CAST(round(CAST(c * {FEATURE_DIM} AS DOUBLE)
                          / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS qx
        FROM cnt JOIN nd USING (doc_id)
        UNION ALL
        SELECT doc_id, {QC_D} AS b, CAST(1000000 AS BIGINT) AS qx FROM nd
    )"""


def _qc_chain_sql() -> str:
    """The unrolled two-pass chain: sparse features -> class counts ->
    quantized class-mean-diff weights (pass 1) -> margin-midpoint
    threshold (pass 2) -> scored docs CTE ``sc`` = (doc_id, y, qp)."""
    return f"""{_qc_sparse_sql()},
    nn AS MATERIALIZED (
        SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
        FROM nd),
    gq AS (
        SELECT b,
               SUM(CASE WHEN y = 1 THEN qx ELSE 0 END) AS s1,
               SUM(CASE WHEN y = 0 THEN qx ELSE 0 END) AS s0
        FROM sx JOIN nd USING (doc_id)
        GROUP BY b),
    wq AS MATERIALIZED (
        SELECT b,
               CASE WHEN n1 > 0 AND n0 > 0
               THEN CAST(round(CAST(s1 AS DOUBLE) / n1
                               - CAST(s0 AS DOUBLE) / n0) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS qw
        FROM gq, nn),
    mg AS MATERIALIZED (
        SELECT doc_id,
               CAST(SUM(CAST(round(CAST(qw * qx AS DOUBLE) / 1e6)
                             AS BIGINT)) AS BIGINT) AS qm
        FROM sx JOIN wq USING (b)
        GROUP BY doc_id),
    tq AS MATERIALIZED (
        SELECT CASE WHEN n1 > 0 AND n0 > 0
               THEN CAST(round((CAST(t1 AS DOUBLE) / n1
                                + CAST(t0 AS DOUBLE) / n0)
                               / CAST(2 AS DOUBLE)) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS qt
        FROM (SELECT SUM(CASE WHEN y = 1 THEN qm ELSE 0 END) AS t1,
                     SUM(CASE WHEN y = 0 THEN qm ELSE 0 END) AS t0
              FROM mg JOIN nd USING (doc_id)), nn),
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


def _qc_sparse(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(nd, sx): per-doc (n, y) and the quantized sparse feature stream
    (doc_id, b in 1..QC_D, qx) including the bias row. Both lazily
    checkpointed — the compute-once inputs of both passes + scoring."""
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


def _qc_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, qp): scores under the trained+calibrated model as
    exact scaled longs (empty corpus -> empty frame, both engines)."""
    nd, sx = _qc_sparse(spark, sf_dir)
    counts = nd.agg(
        F.sum((F.col("y") == 1).cast("long")).alias("n1"),
        F.sum((F.col("y") == 0).cast("long")).alias("n0"),
    ).collect()[0]
    n1, n0 = int(counts["n1"] or 0), int(counts["n0"] or 0)

    qw = [0] * QC_D
    if n1 > 0 and n0 > 0:
        # pass 1: class-mean difference, rounded ENGINE-side per bucket
        sums = (
            sx.join(nd.select("doc_id", "y"), "doc_id")
            .groupBy("b")
            .agg(
                F.sum(F.when(F.col("y") == 1, F.col("qx")).otherwise(0)).alias("s1"),
                F.sum(F.when(F.col("y") == 0, F.col("qx")).otherwise(0)).alias("s0"),
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
            .collect()  # QC_D rows of exact longs (model-size)
        )
        for row in sums:
            qw[row["b"] - 1] = int(row["qd"])

    # margins: per-term quantized sparse dot — an INTEGER sum, so the
    # corpus-order-dependent aggregation is associative by construction
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
    mg = (
        sx.select("doc_id", term)
        .groupBy("doc_id")
        .agg(F.sum("t").alias("qm"))
        .localCheckpoint(eager=False)
    )

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
