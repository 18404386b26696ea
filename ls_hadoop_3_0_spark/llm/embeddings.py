"""Shared embedding-vector preparation (SURVEY.md §2.12 X3/X5).

L2-normalization is done ONCE per vector (O(n·d)) so every downstream
cosine is a plain dot product — instead of recomputing two norms per
candidate pair (O(pairs·d)). The arithmetic is mirrored exactly by
``dedup.NORM_EMB_SQL`` on the DuckDB side: float→double widening per
element, sequential left-to-right sums, per-element division by the norm.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64
N_PLANES = 6

#: Sequential left-to-right dot-product fold — bit-identical to DuckDB's
#: ``list_sum(list_transform(...))`` (verified by the r1 oracle passes).
DOT_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"


def normalized_embeddings(emb: DataFrame) -> DataFrame:
    """vec_id, label, u = embedding / ||embedding||₂ (as array<double>).

    Pure-expression form: survives under later ``filter(...)`` with full
    predicate pushdown to the parquet scan — the right shape for PANEL /
    bounded-subset consumers (knn panels, codebook init). Full-corpus
    consumers use ``normalized_embeddings_np`` (r13): Catalyst evaluates
    these HOFs INTERPRETED, and at the 100× replica this map-only chain
    alone cost 25.6 s of dedup_embedding's 40 s (the r11 lesson measured
    one level earlier in the pipeline).
    """
    v = emb.select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    # try_divide: a zero-norm vector degrades to NULL elements — the
    # DuckDB oracle's x/0.0 semantics — instead of an ANSI
    # DIVIDE_BY_ZERO hard error (r13; absent from fixtures, pinned in
    # tests/test_r13_keys.py).
    return v.withColumn(
        "nrm", F.sqrt(F.expr("aggregate(v, 0D, (acc, y) -> acc + y * y)"))
    ).select(
        "vec_id",
        "label",
        F.expr("transform(v, x -> try_divide(x, nrm))").alias("u"),
    )


def normalized_embeddings_np(emb: DataFrame) -> DataFrame:
    """normalized_embeddings for FULL-CORPUS streams: the same bit-exact
    arithmetic vectorized across rows in numpy (r13).

    Per row the op sequence is IDENTICAL to the HOF form (and to
    ``dedup.NORM_EMB_SQL``): float→double widening is exact, the norm is
    the left-to-right fold acc = acc + yᵈ² starting from y₁² (0 + y₁²
    ≡ y₁² bitwise), u = x / √acc elementwise — so outputs are
    bit-identical (pinned in tests/test_r13_keys.py on adversarial
    doubles). Degrades match the HOF form exactly: NULL → NULL u,
    ragged/empty vectors go through a scalar python fold with the same
    op order. Do NOT use where a later filter must push down to the
    scan (mapInPandas is a pushdown barrier) — that is what the
    expression form is for.
    """

    def _norm(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            vs = pdf["embedding"]
            us: list = [None] * n
            ok = vs.map(lambda x: x is not None and len(x) == DIM).to_numpy()
            idx = np.nonzero(ok)[0]
            if len(idx):
                V = np.stack(
                    [np.asarray(vs.iloc[int(i)], dtype=np.float64) for i in idx]
                )
                acc = V[:, 0] * V[:, 0]
                for d in range(1, DIM):
                    acc = acc + V[:, d] * V[:, d]  # left-to-right per row
                with np.errstate(divide="ignore", invalid="ignore"):
                    U = V / np.sqrt(acc)[:, None]
                for j, i in enumerate(idx):
                    # zero norm -> NULL elements (try_divide / DuckDB)
                    us[int(i)] = [None] * DIM if acc[j] == 0.0 else U[j]
            for i in np.nonzero(~ok)[0]:
                x = vs.iloc[int(i)]
                if x is None:
                    continue  # NULL embedding -> NULL u (the HOF degrade)
                # scalar fold with the same op order (numpy scalars so
                # a nonzero/0 edge can never raise mid-batch)
                v = [np.float64(t) for t in x]
                a = np.float64(0.0)
                for y in v:
                    a = a + y * y  # the HOF fold incl. its 0D seed
                nrm = np.sqrt(a)
                if nrm == 0.0:  # zero norm -> NULL elements (try_divide)
                    us[int(i)] = [None] * len(v)
                else:
                    us[int(i)] = [float(t / nrm) for t in v]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "label": pdf["label"], "u": us}
            )

    return emb.select("vec_id", "label", "embedding").mapInPandas(
        _norm, "vec_id bigint, label int, u array<double>"
    )


def hyperplanes(n_planes: int = N_PLANES, dim: int = DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 (no RNG needed).

    Component (p, i) = md5(f"{p}:{i}") first 8 hex digits → uniform in
    [-1, 1). Good enough for sign-bucket LSH; replaceable by any seeded
    generator. Seedless determinism is what lets the DuckDB oracle
    recompute the identical buckets from literal plane constants.
    """
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8]
            row.append((int(h, 16) / 2**32) * 2.0 - 1.0)
        planes.append(row)
    return planes


def planes_sql(n_planes: int = N_PLANES) -> str:
    """The hyperplanes as a DuckDB list-of-lists literal.

    ``repr`` emits the shortest decimal that round-trips the IEEE double,
    and both engines' literal parsers are correctly rounded — so the
    oracle's planes are bit-identical to Spark's ``F.lit`` values.
    """
    return (
        "["
        + ",".join(
            "[" + ",".join(repr(x) for x in row) + "]" for row in hyperplanes(n_planes)
        )
        + "]"
    )


def lsh_bucket_sql(n_planes: int = N_PLANES, dim: int = DIM) -> str:
    """DuckDB expression: sign-bit LSH signature of column ``u``."""
    return (
        f"array_to_string(list_transform({planes_sql(n_planes)}, "
        f"p -> CASE WHEN list_sum(list_transform(generate_series(1, {dim}), "
        "i -> p[i] * u[i])) > 0 THEN '1' ELSE '0' END), '')"
    )


def lsh_bucketed(e: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Attach the sign-bit LSH ``bucket`` signature to normalized vectors.

    Column-preserving: every input column (vec_id, label, u, ...) passes
    through, plus the ``bucket`` string. The sign test is unrounded in
    both engines — safe because the dot is pure */+ in an identical
    sequential order (no libm), hence bit-identical.
    """
    plane_arr = F.array(
        *[F.array(*[F.lit(x) for x in row]) for row in hyperplanes(n_planes)]
    )
    bucket = F.expr(
        "concat_ws('', transform(planes, p -> CASE WHEN "
        + DOT_SPARK.format(a="p", b="u")
        + " > 0 THEN '1' ELSE '0' END))"
    )
    return (
        e.withColumn("planes", plane_arr).withColumn("bucket", bucket).drop("planes")
    )


def _flip_sql(s: str, i: str) -> str:
    """SQL snippet: string ``s`` with the bit at 1-based position ``i`` flipped."""
    return (
        f"concat(substring({s}, 1, {i} - 1),"
        f" CASE WHEN substring({s}, {i}, 1) = '1' THEN '0' ELSE '1' END,"
        f" substring({s}, {i} + 1))"
    )


def probe_signatures(
    bucket_col: str = "bucket", n_planes: int = N_PLANES, radius: int = 1
) -> F.Column:
    """Spark array expr: the bucket itself + every signature within
    Hamming distance ``radius`` (1 → single-bit flips, 2 → + bit-pair
    flips).

    Multi-probe LSH: a pair whose signatures differ in ≤``radius`` bits
    meets in some (probe, exact-bucket) match — recovering the pairs
    hyperplanes happen to split, at 1+n (+ n·(n−1)/2 for radius 2)
    probes per row instead of 2^n buckets scanned. Radius trades probe
    fan-out for recall; the knob is per-call so a pipeline can spend it
    only on the query side.
    """
    if radius not in (1, 2):
        raise ValueError(f"probe radius must be 1 or 2, got {radius}")
    singles = (
        f"transform(sequence(1, {n_planes}), i -> {_flip_sql(bucket_col, 'i')})"
    )
    expr = f"array_union(array({bucket_col}), {singles})"
    if radius == 2:
        # i < j always holds (i ≤ n−1, j starts at i+1) so the inner
        # sequence() never runs backwards.
        pair = _flip_sql(f"({_flip_sql(bucket_col, 'i')})", "j")
        pairs = (
            f"flatten(transform(sequence(1, {n_planes} - 1),"
            f" i -> transform(sequence(i + 1, {n_planes}), j -> {pair})))"
        )
        expr = f"array_union({expr}, {pairs})"
    return F.expr(expr)


def _flip_duck(s: str, i: str) -> str:
    """DuckDB snippet: string ``s`` with the bit at 1-based pos ``i`` flipped."""
    return (
        f"substring({s}, 1, {i} - 1) ||"
        f" (CASE WHEN substring({s}, {i}, 1) = '1' THEN '0' ELSE '1' END)"
        f" || substring({s}, {i} + 1)"
    )


def probe_signatures_sql(
    bucket_expr: str = "bucket", n_planes: int = N_PLANES, radius: int = 1
) -> str:
    """DuckDB list expr mirroring :func:`probe_signatures`.

    radius=1: bucket + single-bit flips; radius=2 appends the bit-pair
    flips (i < j, each exactly Hamming-2 from the bucket — disjoint from
    the radius-1 set and from each other, so plain list concatenation
    equals Spark's array_union'd set).
    """
    if radius not in (1, 2):
        raise ValueError(f"probe radius must be 1 or 2, got {radius}")
    r1 = (
        f"list_append(list_transform(generate_series(1, {n_planes}),"
        f" i -> {_flip_duck(bucket_expr, 'i')}), {bucket_expr})"
    )
    if radius == 1:
        return r1
    pair = _flip_duck(f"({_flip_duck(bucket_expr, 'i')})", "j")
    pairs = (
        f"flatten(list_transform(generate_series(1, {n_planes} - 1),"
        f" i -> list_transform(generate_series(i + 1, {n_planes}),"
        f" j -> {pair})))"
    )
    return f"list_concat({r1}, {pairs})"


# ---------------------------------------------------------------------------
# Registered keys (embedding storage transforms)

from ls_hadoop_3_0_spark.registry import query  # noqa: E402


@query(
    "embedding_quantize",
    """
    WITH s AS (
        SELECT vec_id, label, embedding,
               127.0 / greatest(list_max(list_transform(embedding,
                                    x -> abs(CAST(x AS DOUBLE)))), 1e-30)
                   AS scale
        FROM embeddings
    ), q AS (
        SELECT vec_id, label, scale,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * scale) AS INTEGER)) AS qv
        FROM s
    )
    SELECT vec_id, label,
           round(scale, 6) AS scale_r,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           list_min(qv) AS q_min,
           list_max(qv) AS q_max,
           CAST(len(list_filter(qv, v -> abs(v) = 127)) AS BIGINT)
               AS n_saturated
    FROM q
    """,
)
def embedding_quantize(spark, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization (max-abs scaling).

    The storage transform every 100 TB embedding corpus applies before
    ANN serving: 4× smaller vectors, dot products on integers. Pure
    map-side higher-order functions — zero shuffle, zero Python. The
    per-vector scale is 127/max|x| (the ``1e-30`` floor guards a
    hypothetical all-zero vector identically in both engines); outputs
    summarize the quantized vector with EXACT integer stats (sum, min,
    max, saturation count) — array columns themselves never cross the
    oracle comparator (registry.py rules).
    """
    from ls_hadoop_3_0_spark.session import prepare
    from ls_hadoop_3_0_spark.tables import load

    prepare(spark)
    e = load(spark, sf_dir, "embeddings")
    s = e.select(
        "vec_id",
        "label",
        "embedding",
        F.expr(
            "127.0 / greatest(array_max(transform(embedding,"
            " x -> abs(cast(x as double)))), 1e-30d)"
        ).alias("scale"),
    )
    q = s.select(
        "vec_id",
        "label",
        "scale",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * scale)"
            " as int))"
        ).alias("qv"),
    )
    return q.select(
        "vec_id",
        "label",
        F.round("scale", 6).alias("scale_r"),
        F.expr("aggregate(qv, 0L, (acc, v) -> acc + v)").alias("q_sum"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
        F.expr("cast(size(filter(qv, v -> abs(v) = 127)) as long)").alias(
            "n_saturated"
        ),
    )


from ls_hadoop_3_0_spark.exprs import sql_davg  # noqa: E402


@query(
    "embedding_centroids",
    f"""
    SELECT label, CAST(pos AS BIGINT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_davg('val')} AS centroid
    FROM (SELECT label,
                 unnest(range(1, len(embedding) + 1)) AS pos,
                 unnest(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                     AS val
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def embedding_centroids(spark, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (mean pooling by class).

    The class-centroid table behind nearest-centroid classification,
    coarse quantizer seeding (knn_ivf trains one from a sample), and
    cluster drift monitoring. posexplode flattens (label, position,
    component); one groupBy(label, pos) with the exact scaled-long mean
    (exprs.davg) makes the centroids bit-identical across engines and
    partitionings. Shuffle volume is labels × dim after map-side partial
    aggregation — independent of corpus row count, so the plan is flat
    at 100 TB.
    """
    from ls_hadoop_3_0_spark.exprs import davg
    from ls_hadoop_3_0_spark.session import prepare
    from ls_hadoop_3_0_spark.tables import load

    prepare(spark)
    e = load(spark, sf_dir, "embeddings").select(
        "label",
        F.posexplode(F.expr("transform(embedding, x -> cast(x as double))")).alias(
            "pos", "val"
        ),
    )
    return (
        e.groupBy("label", (F.col("pos") + 1).cast("long").alias("pos"))
        .agg(F.count(F.lit(1)).alias("n"), davg("val").alias("centroid"))
    )


#: Centroid CTE body for the classify oracle — mirrors the
#: ``embedding_centroids`` oracle above minus its ``n`` column (keep the
#: two in sync; both ride sql_davg so the floats are identical).
_CENTROIDS_SQL = f"""
    SELECT label, CAST(pos AS BIGINT) AS pos,
           {sql_davg('val')} AS centroid
    FROM (SELECT label,
                 unnest(range(1, len(embedding) + 1)) AS pos,
                 unnest(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                     AS val
          FROM embeddings)
    GROUP BY label, pos
"""


@query(
    "knn_centroid_classify",
    f"""
    WITH cent AS ({_CENTROIDS_SQL}),
    carr AS (SELECT label, list(centroid ORDER BY pos) AS c
             FROM cent GROUP BY label),
    v AS (SELECT vec_id, label AS true_label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    d AS (SELECT vec_id, true_label, carr.label AS cand,
                 list_sum(list_transform(generate_series(1, {DIM}),
                          i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist2
          FROM v CROSS JOIN carr)
    SELECT vec_id, true_label, cand AS pred_label, dist2
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY dist2, cand) AS rn
          FROM d)
    WHERE rn = 1
    """,
)
def knn_centroid_classify(spark, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification of every vector, oracle-exact.

    The serving-side twin of ``embedding_centroids``: build the
    per-label mean vectors (exact scaled-long means → identical floats
    both engines), then assign each vector to the centroid minimizing
    squared L2 distance. The distance is a sequential left-to-right
    fold over the 64 components — the same bit-identical pattern as
    knn_cosine's dot product — and the argmin tie-breaks on label, so
    the predicted classes hash-match across engines.

    100 TB: centroids are labels × dim (design-bounded — a label
    vocabulary, not a corpus; the K×DIM driver collect is the audited
    quantizer-metadata pattern). r11 rewrote the assignment twice,
    measured at the seeded label corpora (SCALE.md r11):

    1. The r10 shape (broadcast cross join → n×L rows → vec_id-windowed
       argmin) measured LINEAR in L (eval_confusion 6.3 s at L=10 →
       44.4 s at L=100, DNF at L=1000 within 590 s).
    2. A map-side array_min fold over a broadcast centroid array
       removed the n×L rows and the argmin shuffle — and measured a
       WASH (42.9 s at L=100): the bottleneck is the O(n·L·d) distance
       arithmetic running through Catalyst's INTERPRETED higher-order
       functions, not the shuffle.
    3. Final form: an Arrow-batched ``mapInPandas`` that computes the
       SAME left-to-right fold per dimension — ``acc = acc + (x_d −
       y_d)²`` as elementwise float64 ops, so every row's accumulation
       order (and therefore every bit) is identical to the SQL fold and
       the oracle's list_sum — but VECTORIZED across rows in numpy,
       with the argmin tracked via strict `<` over candidates iterated
       in ascending label order (ties keep the earlier label — the
       (dist2, cand) tie-break). Exactness is an IEEE argument, not an
       optimization guess: 0+t == t, per-row order unchanged,
       comparisons exact; the unchanged cross-join + row_number oracle
       proves it on every fixture and label corpus.
    """
    from ls_hadoop_3_0_spark.session import prepare
    from ls_hadoop_3_0_spark.tables import load

    prepare(spark)
    e = load(spark, sf_dir, "embeddings")
    cent = e.select(
        "label",
        F.posexplode(F.expr("transform(embedding, x -> cast(x as double))")).alias(
            "pos", "val"
        ),
    ).groupBy("label", (F.col("pos") + 1).alias("pos"))
    from ls_hadoop_3_0_spark.exprs import davg

    cent = cent.agg(davg("val").alias("centroid"))
    carr = cent.groupBy("label").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, centroid))),"
            " s -> s.centroid)"
        ).alias("c")
    )
    # Label-vocabulary × dim metadata, collected as EXACT doubles (the
    # davg scaled-long means — binary-identical through the closure) in
    # ascending label order so ties resolve to the smallest label.
    import numpy as np

    cents = sorted((int(r["label"]), list(r["c"])) for r in carr.collect())
    cand_ids = [cand for cand, _ in cents]
    cent_rows = [np.asarray(c, dtype=np.float64) for _, c in cents]

    dim = len(cent_rows[0]) if cent_rows else 0

    def _assign_batches(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0 or not cand_ids:
                continue
            # A ragged or NULL embedding must degrade to a NULL
            # pred/dist2 row — the same row the old SQL zip_with fold
            # produced — never an np.stack task failure (ADVICE r11).
            ok = pdf["v"].map(lambda x: x is not None and len(x) == dim)
            bad = pdf[~ok.to_numpy()]
            if len(bad):
                yield pd.DataFrame(
                    {
                        "vec_id": bad["vec_id"].to_numpy(),
                        "true_label": bad["true_label"].to_numpy(),
                        "pred_label": pd.array([None] * len(bad), dtype="Int32"),
                        "dist2": pd.array([None] * len(bad), dtype="Float64"),
                    }
                )
                pdf = pdf[ok.to_numpy()]
                if len(pdf) == 0:
                    continue
            V = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            best = None
            bestc = None
            for cand, c in zip(cand_ids, cent_rows):
                t = V[:, 0] - c[0]
                acc = t * t  # == 0D + t², exactly the fold's first step
                for d in range(1, V.shape[1]):
                    t = V[:, d] - c[d]
                    acc = acc + t * t  # same left-to-right order per row
                if best is None:
                    best = acc
                    bestc = np.full(len(acc), cand, dtype=np.int32)
                else:
                    m = acc < best  # strict: ties keep the smaller label
                    best = np.where(m, acc, best)
                    bestc = np.where(m, cand, bestc).astype(np.int32)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "true_label": pdf["true_label"].to_numpy(),
                    "pred_label": bestc,
                    "dist2": best,
                }
            )

    v = e.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    return v.mapInPandas(
        _assign_batches,
        "vec_id bigint, true_label int, pred_label int, dist2 double",
    )


# --------------------------------------------------------------------------
# Oracle-exact iterative k-means (Lloyd) — the graph_pagerank discipline
# (quantize state through scaled longs EVERY round) applied to the other
# classic iterative 100 TB workload (the Mahout/MLlib clustering class).

KM_K = 8  #: clusters
KM_ROUNDS = 3  #: unrolled Lloyd iterations
KM_SCALE = 1_000_000  #: 6-decimal scaled-long state quantization


def _km_seed_ints(k: int = KM_K, dim: int = DIM) -> list[list[int]]:
    """Deterministic md5-seeded centroids as SCALED-LONG ints.

    Quantization here is python-side (half-away-from-zero) but that is
    shared, not cross-engine: both the Spark literal and the oracle's
    VALUES table are generated from these exact ints — neither engine
    re-derives the seeds. State never leaves the 6-decimal lattice.
    """
    import math

    rows = []
    for c in range(k):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"km:{c}:{i}".encode()).hexdigest()[:8]
            x = (int(h, 16) / 2**32) * 2.0 - 1.0
            q = int(math.floor(abs(x) * KM_SCALE + 0.5))
            row.append(q if x >= 0 else -q)
        rows.append(row)
    return rows


_KM_DOT = DOT_SPARK.format(a="c", b="v")
_KM_DOT_SQL = (
    f"list_sum(list_transform(generate_series(1, {DIM}), i -> c[i] * v[i]))"
)


def _kmeans_sql() -> str:
    """Unrolled {KM_ROUNDS}-round Lloyd oracle: per-round re-quantized
    means (CAST(round(avg·1e6) AS BIGINT)) make the iterative state
    bit-identical to Spark's under any partitioning — same mechanics as
    graph_pagerank's unrolled-CTE mirror."""
    from ls_hadoop_3_0_spark.exprs import sql_davg

    seed_rows = ", ".join(
        f"({c}, {p}, {q})"
        for c, row in enumerate(_km_seed_ints())
        for p, q in enumerate(row)
    )
    parts = [
        "WITH e AS (SELECT vec_id,"
        " list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v"
        " FROM embeddings),",
        f"c0 AS (SELECT * FROM (VALUES {seed_rows}) t(cell, pos, q)),",
    ]
    for r in range(1, KM_ROUNDS + 1):
        prev = f"c{r - 1}"
        parts.append(
            f"""
    cv{r} AS (SELECT cell, list(CAST(q AS DOUBLE) / {KM_SCALE}.0 ORDER BY pos)
                  AS c FROM {prev} GROUP BY cell),
    ca{r} AS (SELECT list(c ORDER BY cell) AS cl FROM cv{r}),
    asg{r} AS (
        SELECT vec_id, v,
               CAST(list_position(dots, list_max(dots)) AS INT) - 1 AS cell
        FROM (SELECT vec_id, v,
                     list_transform(cl, c -> {_KM_DOT_SQL}) AS dots
              FROM e, ca{r})
    ),
    m{r} AS (
        SELECT cell, pos,
               CAST(round(({sql_davg('x')}) * {KM_SCALE}) AS BIGINT) AS q
        FROM (SELECT cell, unnest(range(0, {DIM})) AS pos, unnest(v) AS x
              FROM asg{r})
        GROUP BY cell, pos
    ),
    c{r} AS (
        SELECT cell, pos, q FROM m{r}
        UNION ALL
        SELECT p.cell, p.pos, p.q FROM {prev} p
        WHERE p.cell NOT IN (SELECT DISTINCT cell FROM m{r})
    ),"""
        )
    last = f"c{KM_ROUNDS}"
    parts.append(
        f"""
    cvF AS (SELECT cell, list(CAST(q AS DOUBLE) / {KM_SCALE}.0 ORDER BY pos)
                AS c FROM {last} GROUP BY cell),
    caF AS (SELECT list(c ORDER BY cell) AS cl FROM cvF),
    asgF AS (
        SELECT vec_id, v,
               CAST(list_position(dots, list_max(dots)) AS INT) - 1 AS cell
        FROM (SELECT vec_id, v,
                     list_transform(cl, c -> {_KM_DOT_SQL}) AS dots
              FROM e, caF)
    ),
    fin AS (
        SELECT a.cell, CAST(COUNT(*) AS BIGINT) AS n_members,
               SUM(CAST(round(list_sum(list_transform(
                       generate_series(1, {DIM}),
                       i -> (a.v[i] - cv.c[i]) * (a.v[i] - cv.c[i])))
                   * {KM_SCALE}) AS BIGINT)) AS sq
        FROM asgF a JOIN cvF cv ON cv.cell = a.cell
        GROUP BY a.cell
    ),
    dg AS (SELECT cell, md5(string_agg(CAST(q AS VARCHAR), ',' ORDER BY pos))
               AS centroid_md5
           FROM {last} GROUP BY cell)
    SELECT CAST(dg.cell AS BIGINT) AS cell,
           COALESCE(fin.n_members, 0) AS n_members,
           COALESCE(CAST(fin.sq AS DOUBLE) / {KM_SCALE}.0,
                    CAST(0 AS DOUBLE)) AS inertia,
           dg.centroid_md5
    FROM dg LEFT JOIN fin ON fin.cell = dg.cell"""
    )
    return "\n".join(parts)


@query("kmeans_lloyd", _kmeans_sql())
def kmeans_lloyd(spark, sf_dir: str):
    """X6/X8 iterative clustering: K-means with ORACLE-EXACT iterations.

    Lloyd's algorithm over the embeddings table — KM_ROUNDS assignment/
    re-estimation rounds from deterministic md5-seeded centroids, then a
    final certificate per cluster: member count, quantized inertia
    (within-cluster sum of squared distances), and a digest of the
    centroid's scaled-long state. Iterative floating-point numerics are
    where cross-engine parity usually dies; the graph_pagerank cure
    applies unchanged — per-dimension means are re-quantized through the
    scaled-long lattice every round, so both engines carry IDENTICAL
    state into each assignment and the driver hash-checks every digit.

    Scale shape: each round is one map-side argmax-dot assignment (the
    knn_ivf cell expression — centroid set is a K×DIM literal, no
    shuffle) plus ONE (cell, dim)-keyed map-combined aggregation; the
    K×DIM collect per round is quantizer metadata (KB), not a data-path
    collect. At 100 TB: rounds = Spark jobs over a cached/parquet
    assignment, exactly how MLlib's k-means iterates — with the added
    property that a re-run on a different cluster layout reproduces the
    centroids bit-for-bit.
    """
    from ls_hadoop_3_0_spark.exprs import dsum
    from ls_hadoop_3_0_spark.session import prepare
    from ls_hadoop_3_0_spark.tables import load

    import numpy as np

    prepare(spark)
    raw = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents_int = _km_seed_ints()

    # r13: the per-round argmax-dot assignment moved from the interpreted
    # transform/aggregate HOF pair to the numpy left-fold (the r11
    # eval_confusion recipe — Catalyst interprets lambda HOFs, and here
    # they ran KM_ROUNDS+1 corpus passes: 39.3 → 14.3 s at the 100×
    # replica, noop min-of-2). Arithmetic is bit-identical: float→double cast is exact,
    # dots accumulate c_d·v_d in ascending d per row, the cell is the
    # FIRST argmax (strict > scanning ascending — the
    # array_position(dots, array_max(dots)) tie-break), and the final
    # inertia fold accumulates (x−y)² in the same per-row order. NULL or
    # ragged vectors degrade to cell NULL exactly like the HOF
    # (zip_with/aggregate NULL-propagation); cell-NULL rows never enter
    # the K-cell certificate (left join on base cells).
    def _assign_np(cints: list[list[int]], with_sq: bool):
        cents = np.asarray(
            [[q / KM_SCALE for q in row] for row in cints], dtype=np.float64
        )

        def _a(it):
            import pandas as pd

            for pdf in it:
                n = len(pdf)
                if n == 0:
                    continue
                vs = pdf["embedding"]
                ok = vs.map(
                    lambda x: x is not None and len(x) == DIM
                ).to_numpy()
                cell_out = [None] * n
                sq_out = [None] * n
                v_out: list = [None] * n
                idx = np.nonzero(ok)[0]
                if len(idx):
                    V = np.stack(
                        [
                            np.asarray(vs.iloc[int(i)], dtype=np.float64)
                            for i in idx
                        ]
                    )
                    best = None
                    cell = np.zeros(len(V), dtype=np.int64)
                    for c in range(KM_K):
                        acc = cents[c, 0] * V[:, 0]
                        for d in range(1, DIM):
                            acc = acc + cents[c, d] * V[:, d]
                        if best is None:
                            best = acc
                        else:
                            gt = acc > best  # strict: first argmax wins
                            best = np.where(gt, acc, best)
                            cell = np.where(gt, c, cell)
                    if with_sq:
                        Crows = cents[cell]
                        t = V[:, 0] - Crows[:, 0]
                        sq = t * t
                        for d in range(1, DIM):
                            t = V[:, d] - Crows[:, d]
                            sq = sq + t * t  # same per-row fold order
                    for j, i in enumerate(idx):
                        cell_out[int(i)] = int(cell[j])
                        if with_sq:
                            sq_out[int(i)] = float(sq[j])
                        else:
                            v_out[int(i)] = V[j]
                if not with_sq:
                    for i in np.nonzero(~ok)[0]:
                        x = vs.iloc[int(i)]
                        if x is not None:
                            v_out[int(i)] = [float(t) for t in x]
                if with_sq:
                    yield pd.DataFrame({"cell": cell_out, "sq_raw": sq_out})
                else:
                    yield pd.DataFrame({"cell": cell_out, "v": v_out})

        schema = (
            "cell int, sq_raw double" if with_sq else "cell int, v array<double>"
        )
        return raw.mapInPandas(_a, schema)

    for _ in range(KM_ROUNDS):
        rows = (
            _assign_np(cents_int, with_sq=False)
            .select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.round((dsum("x") / F.count("x")) * KM_SCALE)
                .cast("long")
                .alias("q")
            )
            .collect()
        )  # K×DIM quantizer metadata, not a data-path collect
        by: dict[int, dict[int, int]] = {}
        for r in rows:
            by.setdefault(r["cell"], {})[r["pos"]] = r["q"]
        cents_int = [
            [by[c][p] for p in range(DIM)] if c in by else cents_int[c]
            for c in range(KM_K)
        ]

    per = (
        _assign_np(cents_int, with_sq=True)
        .select(
            "cell",
            F.round(F.col("sq_raw") * KM_SCALE).cast("long").alias("sq"),
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_members"), F.sum("sq").alias("ssq"))
    )
    base = spark.createDataFrame(
        [
            (c, hashlib.md5(",".join(str(q) for q in row).encode()).hexdigest())
            for c, row in enumerate(cents_int)
        ],
        "cell long, centroid_md5 string",
    )
    return base.join(per, "cell", "left").select(
        "cell",
        F.coalesce(F.col("n_members"), F.lit(0)).cast("long").alias("n_members"),
        F.coalesce(F.col("ssq").cast("double") / KM_SCALE, F.lit(0.0)).alias(
            "inertia"
        ),
        "centroid_md5",
    )


#: Norm-audit quantization scale: norm² is quantized to 1e-3 once and
#: every downstream stat is derived from those shared longs, so the
#: mean/std/threshold doubles are bit-identical across engines. The
#: squared term is summed as DECIMAL(38,0)/HUGEINT — exact at any corpus
#: size (long would overflow past ~9e18).
NORM_SCALE = 1000


@query(
    "embedding_norm_outliers",
    f"""
    WITH q AS (
        SELECT label,
               CAST(round(n2 * {NORM_SCALE}) AS BIGINT) AS n2m,
               CAST(round((n2 * n2 / nullif(s4, CAST(0 AS DOUBLE)))
                          * {NORM_SCALE}) AS BIGINT) AS prm
        FROM (
            SELECT label,
                   list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2,
                   list_sum(list_transform(embedding,
                       x -> (CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
                            * (CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                       AS s4
            FROM embeddings)
    ),
    g AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               SUM(n2m) AS s, SUM(CAST(n2m AS HUGEINT) * n2m) AS ss,
               SUM(prm) AS p, SUM(CAST(prm AS HUGEINT) * prm) AS pp
        FROM q GROUP BY label
    ),
    st AS (
        SELECT label, n_vecs,
               CAST(s AS DOUBLE) / CAST({NORM_SCALE} AS DOUBLE) / n_vecs
                   AS mean_norm2,
               sqrt(greatest(
                   CAST(ss AS DOUBLE)
                       / CAST({NORM_SCALE * NORM_SCALE} AS DOUBLE) / n_vecs
                   - (CAST(s AS DOUBLE) / CAST({NORM_SCALE} AS DOUBLE)
                      / n_vecs)
                     * (CAST(s AS DOUBLE) / CAST({NORM_SCALE} AS DOUBLE)
                        / n_vecs),
                   CAST(0 AS DOUBLE))) AS std_norm2,
               CAST(p AS DOUBLE) / CAST({NORM_SCALE} AS DOUBLE) / n_vecs
                   AS mean_pr,
               sqrt(greatest(
                   CAST(pp AS DOUBLE)
                       / CAST({NORM_SCALE * NORM_SCALE} AS DOUBLE) / n_vecs
                   - (CAST(p AS DOUBLE) / CAST({NORM_SCALE} AS DOUBLE)
                      / n_vecs)
                     * (CAST(p AS DOUBLE) / CAST({NORM_SCALE} AS DOUBLE)
                        / n_vecs),
                   CAST(0 AS DOUBLE))) AS std_pr
        FROM g
    )
    SELECT q.label, MAX(st.n_vecs) AS n_vecs,
           MAX(st.mean_norm2) AS mean_norm2,
           MAX(st.std_norm2) AS std_norm2,
           CAST(SUM(CASE WHEN q.n2m > CAST(round(
                    (st.mean_norm2 + CAST(3 AS DOUBLE) * st.std_norm2)
                    * {NORM_SCALE}) AS BIGINT)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_norm_outliers,
           MAX(st.mean_pr) AS mean_pr,
           MAX(st.std_pr) AS std_pr,
           CAST(SUM(CASE WHEN q.prm < CAST(round(
                    (st.mean_pr - CAST(2 AS DOUBLE) * st.std_pr)
                    * {NORM_SCALE}) AS BIGINT)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_pr_low
    FROM q JOIN st ON q.label = st.label
    GROUP BY q.label
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-EXT embedding hygiene: per-label norm² + participation-ratio audit.

    Before indexing or training on an embedding column, audit it. Two
    signals per label: the L2-norm² distribution (a label whose norms
    drift — collapsed encoder, mixed checkpoints, unnormalized batches —
    poisons cosine/IP search; flagged above mean + 3σ) and the
    participation ratio PR = (Σx²)² / Σx⁴, the effective dimensionality
    of each vector (near-one-hot vectors have PR ≈ 1, healthy dense
    embeddings PR ≈ O(dim); concentration is flagged below mean − 2σ —
    the arm that stays discriminative even on a unit-normalized corpus
    where the norm arm degenerates to "healthy").

    Cross-engine discipline: Σx² and Σx⁴ come from the proven left-fold
    dot (DOT_SPARK ↔ list_sum ∘ list_transform), each metric is
    quantized ONCE to scaled longs (NORM_SCALE), and mean/std/threshold
    are identical double expressions over those exact integer sums —
    thresholds re-quantize to longs before comparison, so the outlier
    counts can't 1-ulp-diverge.

    Plan: one scan + one (label)-keyed map-combined aggregation for the
    stats, then a second pass joining the label-vocabulary-bounded
    stats side back (static broadcast legitimate per the repo rule:
    labels are a DESIGN-bounded vocabulary, not corpus-scale) and one
    final keyed aggregation. Two shuffles, both on label, at any corpus
    size.
    """
    from ls_hadoop_3_0_spark.session import prepare
    from ls_hadoop_3_0_spark.tables import load

    prepare(spark)
    emb = load(spark, sf_dir, "embeddings")
    n2 = F.expr(
        "aggregate(transform(embedding, x -> cast(x as double)),"
        " 0D, (acc, y) -> acc + y * y)"
    )
    s4 = F.expr(
        "aggregate(transform(embedding, x -> cast(x as double)),"
        " 0D, (acc, y) -> acc + (y * y) * (y * y))"
    )
    q = emb.select(
        "label",
        F.round(n2 * NORM_SCALE).cast("long").alias("n2m"),
        # nullif guard: an all-zero vector gives 0/0 → NaN, and ANSI
        # round(NaN)::long is a hard CAST error — degenerate vectors
        # surface as NULL prm instead (skipped by the sums, never an
        # outlier), mirrored by nullif in the oracle.
        F.round((n2 * n2 / F.nullif(s4, F.lit(0.0))) * NORM_SCALE)
        .cast("long")
        .alias("prm"),
    )

    def _sq_dec(c: str):
        return F.sum((F.col(c) * F.col(c)).cast("decimal(38,0)"))

    g = q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("n2m").alias("s"),
        _sq_dec("n2m").alias("ss"),
        F.sum("prm").alias("p"),
        _sq_dec("prm").alias("pp"),
    )
    scale = F.lit(float(NORM_SCALE))
    sq_scale = F.lit(float(NORM_SCALE * NORM_SCALE))

    def _mean(tot: str):
        return F.col(tot).cast("double") / scale / F.col("n_vecs")

    def _std(tot: str, totsq: str):
        m = _mean(tot)
        msq = F.col(totsq).cast("double") / sq_scale / F.col("n_vecs")
        return F.sqrt(F.greatest(msq - m * m, F.lit(0.0)))

    st = g.select(
        "label",
        "n_vecs",
        _mean("s").alias("mean_norm2"),
        _std("s", "ss").alias("std_norm2"),
        _mean("p").alias("mean_pr"),
        _std("p", "pp").alias("std_pr"),
    )
    thr_hi = F.round(
        (F.col("mean_norm2") + F.lit(3.0) * F.col("std_norm2")) * NORM_SCALE
    ).cast("long")
    thr_lo = F.round(
        (F.col("mean_pr") - F.lit(2.0) * F.col("std_pr")) * NORM_SCALE
    ).cast("long")
    return (
        q.join(F.broadcast(st), "label")
        .groupBy("label")
        .agg(
            F.max("n_vecs").alias("n_vecs"),
            F.max("mean_norm2").alias("mean_norm2"),
            F.max("std_norm2").alias("std_norm2"),
            F.sum((F.col("n2m") > thr_hi).cast("long")).alias("n_norm_outliers"),
            F.max("mean_pr").alias("mean_pr"),
            F.max("std_pr").alias("std_pr"),
            # coalesce: if every prm in a label is NULL (all-degenerate),
            # Spark's SUM over NULLs is NULL while the oracle's
            # SUM(CASE...ELSE 0) is 0 — pin both to 0.
            F.coalesce(
                F.sum((F.col("prm") < thr_lo).cast("long")), F.lit(0)
            ).alias("n_pr_low"),
        )
    )


#: Power-iteration geometry: 3 rounds from a deterministic md5 seed.
PCA_ROUNDS = 3


def _pca_seed(dim: int = DIM) -> list[float]:
    """Deterministic unit-norm start vector (hyperplanes mechanics)."""
    raw = []
    for i in range(dim):
        h = hashlib.md5(f"pca:{i}".encode()).hexdigest()[:8]
        raw.append((int(h, 16) / 2**32) * 2.0 - 1.0)
    n2 = 0.0
    for x in raw:  # fixed left fold — mirrored by list_sum in the oracle
        n2 += x * x
    nrm = n2**0.5
    return [x / nrm for x in raw]


def _pca_oracle(rounds: int = PCA_ROUNDS, dim: int = DIM) -> str:
    """Unrolled CTE chain mirroring the quantized power iteration."""
    lit0 = "[" + ",".join(repr(x) for x in _pca_seed(dim)) + "]"
    parts = [
        "WITH e AS (SELECT list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS v FROM embeddings),",
        f"v0 AS (SELECT {lit0} AS vv),",
    ]
    for r in range(1, rounds + 1):
        p = f"v{r - 1}"
        parts.append(
            f"s{r} AS (SELECT e.v, list_sum(list_transform("
            f"generate_series(1, {dim}), i -> {p}.vv[i] * e.v[i])) AS sc"
            f" FROM e, {p}),"
        )
        parts.append(
            f"w{r} AS (SELECT j, SUM(CAST(round((sc * v[j]) * 1000000)"
            f" AS BIGINT)) AS wq"
            f" FROM s{r}, range(1, {dim + 1}) t(j) GROUP BY j),"
        )
        parts.append(f"l{r} AS (SELECT list(wq ORDER BY j) AS ws FROM w{r}),")
        parts.append(
            f"v{r} AS (SELECT list_transform(ws, w ->"
            f" (w / CAST(1000000 AS DOUBLE))"
            f" / sqrt(list_sum(list_transform(ws, u ->"
            f" (u / CAST(1000000 AS DOUBLE))"
            f" * (u / CAST(1000000 AS DOUBLE)))))) AS vv FROM l{r}),"
        )
    parts.append(
        f"out AS (SELECT unnest(generate_series(1, {dim})) AS j FROM (SELECT 1))"
    )
    parts.append(
        f"SELECT CAST(out.j - 1 AS BIGINT) AS dim,"
        f" v{rounds}.vv[out.j] AS loading"
        f" FROM out, v{rounds}"
    )
    return "\n".join(parts)


@query("embedding_pca_power", _pca_oracle())
def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6-EXT top principal direction via power iteration — oracle-exact.

    The third iterative-numeric operator (after graph_pagerank and
    kmeans_lloyd, same recipe): the dominant eigenvector of the
    corpus's uncentered second-moment matrix, the direction embedding
    pipelines use for anisotropy diagnosis and all-but-the-top
    post-processing. Three power-iteration rounds from a deterministic
    md5 seed; each round computes per-vector scores against the current
    direction (literal constants — the proven left-fold dot), reduces
    the d-dimensional update as EXACT scaled-long sums (one dim-keyed
    map-combined shuffle: ≤ dim × partitions partial rows), and
    re-normalizes through the identical double chain on both engines —
    the driver sees only the 64 exact longs per round (kmeans collected-
    scalar rule), the oracle unrolls the same rounds as a CTE chain.

    Scale: per round one scan + one 64-key aggregation; state is
    dim-sized, corpus-independent. 100 TB cost = rounds × one pass —
    the same budget class as kmeans_lloyd.
    """
    from ls_hadoop_3_0_spark.session import prepare
    from ls_hadoop_3_0_spark.tables import load

    import numpy as np

    prepare(spark)
    raw = load(spark, sf_dir, "embeddings").select("embedding")
    v = _pca_seed()
    for _ in range(PCA_ROUNDS):
        # r13: the per-row score fold moved to numpy (the kmeans_lloyd /
        # eval_confusion recipe — the interpreted zip_with/aggregate pair
        # was the round's dominant cost). The fold order is unchanged
        # (lv_d·v_d accumulated in ascending d), the explode and the
        # round(sc·x·1e6) quantization stay ENGINE-side (Spark round is
        # HALF_UP; python/numpy round is banker's — the CLAUDE.md rule),
        # and NULL/ragged vectors degrade to sc NULL exactly as the HOF.
        vnp = np.asarray(v, dtype=np.float64)

        def _sc(it, vnp=vnp):
            import pandas as pd

            for pdf in it:
                n = len(pdf)
                if n == 0:
                    continue
                vs = pdf["embedding"]
                ok = vs.map(
                    lambda x: x is not None and len(x) == DIM
                ).to_numpy()
                sc_out = [None] * n
                v_out: list = [None] * n
                idx = np.nonzero(ok)[0]
                if len(idx):
                    V = np.stack(
                        [
                            np.asarray(vs.iloc[int(i)], dtype=np.float64)
                            for i in idx
                        ]
                    )
                    acc = vnp[0] * V[:, 0]
                    for d in range(1, DIM):
                        acc = acc + vnp[d] * V[:, d]  # ascending-d fold
                    for j, i in enumerate(idx):
                        sc_out[int(i)] = float(acc[j])
                        v_out[int(i)] = V[j]
                for i in np.nonzero(~ok)[0]:
                    x = vs.iloc[int(i)]
                    if x is not None:  # ragged: sc NULL, v cast-through
                        v_out[int(i)] = [float(t) for t in x]
                yield pd.DataFrame({"sc": sc_out, "v": v_out})

        terms = (
            raw.mapInPandas(_sc, "sc double, v array<double>")
            .select("sc", F.posexplode("v").alias("pos", "x"))
            .select(
                (F.col("pos") + 1).alias("j"),
                F.round((F.col("sc") * F.col("x")) * 1_000_000)
                .cast("long")
                .alias("t"),
            )
        )
        wq = {
            r["j"]: r["wq"]
            for r in terms.groupBy("j").agg(F.sum("t").alias("wq")).collect()
        }
        if not wq:
            # Empty corpus: the oracle's list() over zero gram rows goes
            # NULL, surfacing 64 NULL loadings — mirror it exactly.
            return spark.createDataFrame(
                [(j, None) for j in range(DIM)], "dim long, loading double"
            )
        ws = [wq[j] for j in range(1, DIM + 1)]  # exact longs, dim-sized
        n2 = 0.0
        for w in ws:  # fixed left fold == oracle's list_sum
            c = w / 1_000_000.0
            n2 += c * c
        nrm = n2**0.5
        v = [(w / 1_000_000.0) / nrm for w in ws]
    return spark.createDataFrame(
        [(j, v[j]) for j in range(DIM)], "dim long, loading double"
    )


@query(
    "eval_confusion",
    f"""
    WITH cent AS ({_CENTROIDS_SQL}),
    carr AS (SELECT label, list(centroid ORDER BY pos) AS c
             FROM cent GROUP BY label),
    v AS (SELECT vec_id, label AS true_label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    d AS (SELECT vec_id, true_label, carr.label AS cand,
                 list_sum(list_transform(generate_series(1, {DIM}),
                          i -> (v[i] - c[i]) * (v[i] - c[i]))) AS dist2
          FROM v CROSS JOIN carr),
    assign AS (
        SELECT vec_id, true_label, cand AS pred_label
        FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY dist2, cand) AS rn
              FROM d)
        WHERE rn = 1
    ),
    per_true AS (
        SELECT true_label AS label,
               CAST(COUNT(*) AS BIGINT) AS n_true,
               CAST(SUM(CASE WHEN pred_label = true_label
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp
        FROM assign GROUP BY true_label
    ),
    per_pred AS (
        SELECT pred_label AS label, CAST(COUNT(*) AS BIGINT) AS n_pred
        FROM assign GROUP BY pred_label
    )
    SELECT COALESCE(t.label, p.label) AS label,
           COALESCE(n_true, 0) AS n_true,
           COALESCE(n_pred, 0) AS n_pred,
           COALESCE(tp, 0) AS tp,
           CAST(COALESCE(tp, 0) AS DOUBLE) / NULLIF(COALESCE(n_pred, 0), 0)
               AS precision,
           CAST(COALESCE(tp, 0) AS DOUBLE) / NULLIF(COALESCE(n_true, 0), 0)
               AS recall,
           CAST(2 * COALESCE(tp, 0) AS DOUBLE)
               / NULLIF(COALESCE(n_true, 0) + COALESCE(n_pred, 0), 0) AS f1
    FROM per_true t FULL JOIN per_pred p ON t.label = p.label
    """,
)
def eval_confusion(spark, sf_dir: str) -> DataFrame:
    """X-EXT model-evaluation rung: per-class confusion-matrix metrics.

    Every labeling / filtering model in a curation stack (quality
    classifier, language ID, toxicity filter) is gated on exactly this
    table: per class, support (n_true), predicted volume (n_pred), true
    positives, precision, recall, F1 — computed here for the in-repo
    nearest-centroid classifier (knn_centroid_classify), whose per-vector
    assignment is already oracle-exact via the proven left-fold distance
    parity.

    Determinism: counts are exact integers; precision/recall are
    exact-int divisions; F1 uses the algebraic identity
    2PR/(P+R) = 2·tp/(n_true+n_pred) — ONE division of exact int64s
    instead of a float composition, so no engine can diverge. Zero
    denominators go NULL via NULLIF on both engines.

    Scale: the assignment is knn_centroid_classify's plan (r11: a
    map-side array_min fold over the broadcast centroid array — no row
    amplification, no argmin shuffle; measured flat across the L=10 →
    1000 label corpora, SCALE.md r11); both confusion aggregations are
    map-combined corpus→label-vocabulary reductions, and the final FULL
    join runs on label-vocabulary rows — metadata-scale.
    """
    from ls_hadoop_3_0_spark.session import prepare

    prepare(spark)
    assign = knn_centroid_classify(spark, sf_dir).select(
        "true_label", "pred_label"
    )
    per_true = assign.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum(
            (F.col("pred_label") == F.col("true_label")).cast("long")
        ).alias("tp"),
    )
    per_pred = assign.groupBy(F.col("pred_label").alias("p_label")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    j = per_true.join(
        per_pred, F.col("label") == F.col("p_label"), "full_outer"
    )
    n_true = F.coalesce(F.col("n_true"), F.lit(0))
    n_pred = F.coalesce(F.col("n_pred"), F.lit(0))
    tp = F.coalesce(F.col("tp"), F.lit(0))
    return j.select(
        F.coalesce(F.col("label"), F.col("p_label")).alias("label"),
        n_true.alias("n_true"),
        n_pred.alias("n_pred"),
        tp.alias("tp"),
        (tp.cast("double") / F.nullif(n_pred, F.lit(0))).alias("precision"),
        (tp.cast("double") / F.nullif(n_true, F.lit(0))).alias("recall"),
        (
            (F.lit(2) * tp).cast("double")
            / F.nullif(n_true + n_pred, F.lit(0))
        ).alias("f1"),
    )
