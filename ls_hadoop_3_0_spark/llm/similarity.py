"""Similarity search over embeddings — SURVEY.md §2.12 X3/X5 (EXT).

- ``knn_cosine`` — brute-force top-k cosine (the exact baseline, DuckDB
  oracle-checked).
- ``knn_lsh``    — random-hyperplane LSH-bucketed ANN (the scale path;
  rows-only key, recall vs brute force asserted in tests).

Scale notes: vectors are L2-normalized once (llm/embeddings.py), so
scoring is a plain dot product. Brute-force is O(|Q|·|N|·d) — correct
answer, quadratic cost; fine for a bounded query set against a
broadcastable corpus partition, wrong as the default at 100 TB. The LSH
variant buckets both sides on sign-bit signatures (an equi-join) so each
query only scores its bucket — the IVF/LSH upgrade path SURVEY §7 risk 5
calls for. Hyperplanes derive from md5 (deterministic, seedless).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.exprs import dsum

from ls_hadoop_3_0_spark.llm.dedup import NORM_EMB_SQL
from ls_hadoop_3_0_spark.llm.embeddings import (
    DIM,
    DOT_SPARK,
    N_PLANES,
    hyperplanes,  # noqa: F401  (re-export: tests + external callers)
    lsh_bucketed,
    normalized_embeddings,
    probe_signatures,
)
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

TOP_K = 10

#: Query-panel predicates. PANEL is the original corpus-scaling rule
#: (1%% of vectors are queries — audit work grows quadratically with the
#: corpus). BOUNDED_PANEL pins the panel to a FIXED id range (the first
#: replica / an authored panel in production), so the exact audit arm
#: stays LINEAR in corpus size at any scale — the knn_recall_v2 rule.
PANEL_SQL = "vec_id % 100 = 0"
BOUNDED_PANEL_SQL = "vec_id % 100 = 0 AND vec_id < 10000000"

_DOT_SPARK = DOT_SPARK

#: Exact brute-force top-k as a reusable oracle CTE body (also the
#: ground-truth arm of the knn_recall oracle below). r13: the REGISTERED
#: key serves the BOUNDED panel (VERDICT r12 item 4) — the driver-side
#: panel collect is corpus-independent at any scale; the unbounded
#: corpus-proportional panel stays available via the ``panel`` kwarg for
#: ≤10× release audits (knn_recall v1). On the fixtures the two coincide
#: (every vec_id < 10M), so the flip changes no compared value.
KNN_COSINE_SQL = f"""
    WITH e AS ({NORM_EMB_SQL}),
    q AS (SELECT vec_id AS q_id, u AS qu FROM e WHERE {BOUNDED_PANEL_SQL}),
    scored AS (
        SELECT q.q_id, e.vec_id AS n_id,
               round(list_sum(list_transform(generate_series(1, {DIM}),
                              i -> q.qu[i] * e.u[i])), 6) AS cosine
        FROM q JOIN e ON e.vec_id <> q.q_id
    )
    SELECT q_id, n_id, cosine, rnk FROM (
        SELECT q_id, n_id, cosine,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, n_id) AS rnk
        FROM scored)
    WHERE rnk <= {TOP_K}
    """


def _dot_sql(a: str, b: str) -> str:
    """DuckDB sequential-fold dot product (bit-twin of DOT_SPARK)."""
    return (
        f"list_sum(list_transform(generate_series(1, {DIM}),"
        f" i -> {a}[i] * {b}[i]))"
    )


def _dot_fold_np(QU, U, chunk: int = 512):
    """(P, n) dot table via the exact left-to-right fold.

    Per element the op sequence is q1*u1, then += qd*ud in ascending d —
    bit-identical to aggregate(zip_with(...)) / list_sum. Columns are
    processed in cache-sized chunks with preallocated buffers: the naive
    whole-batch loop allocated two (P, n) float64 temporaries per
    dimension (~20 GB of memory traffic per 10k-row batch at P=2000),
    which dominated the 100× measurement; chunking is a layout change
    only, never an arithmetic one.
    """
    import numpy as np

    P, n = len(QU), len(U)
    dim = U.shape[1]
    A = np.empty((P, n), dtype=np.float64)
    tmp = np.empty((P, min(chunk, n)), dtype=np.float64)
    for j in range(0, n, chunk):
        uj = U[j : j + chunk]
        c = len(uj)
        Ab = A[:, j : j + c]
        np.multiply(QU[:, 0:1], uj[:, 0][None, :], out=Ab)
        t = tmp[:, :c]
        for d in range(1, dim):
            np.multiply(QU[:, d : d + 1], uj[:, d][None, :], out=t)
            Ab += t
    return A



@query("knn_cosine", KNN_COSINE_SQL)
def knn_cosine(
    spark: SparkSession,
    sf_dir: str,
    panel: str = BOUNDED_PANEL_SQL,
    cand_label_min: int | None = None,
) -> DataFrame:
    """X3 brute-force cosine top-k (queries: the BOUNDED fixed-id panel —
    the registered serving/audit form since r13; pass ``panel=PANEL_SQL``
    for the corpus-proportional ≤10× release-audit arm).

    The query side is panel-in-memory (the exact baseline's declared
    shape); scoring is a map-only numpy pass over the corpus — the same
    left-to-right dot fold as the SQL oracle, vectorized across rows
    (the r11 interpreted-HOF lesson: the broadcast-NL + HOF form DNF'd
    (>590 s) at the 100× replica; this form is seconds). Each batch
    emits a per-query top-k SUPERSET with a one-rounding-quantum margin
    (2e-6) so post-round(·,6) ties survive batching; rounding itself
    stays engine-side, and the only shuffle is the superset-small
    top-k window.
    """
    import numpy as np

    prepare(spark)
    panel_rows = sorted(
        (int(r["vec_id"]), r["u"])
        for r in normalized_embeddings(load(spark, sf_dir, "embeddings"))
        .filter(F.expr(panel))
        .select("vec_id", "u")
        .collect()  # the exact arm's declared panel-in-memory shape
    )
    qids = np.asarray([q for q, _ in panel_rows], dtype=np.int64)
    QU = np.asarray([u for _, u in panel_rows], dtype=np.float64)
    P = len(qids)

    def _score(it):
        import pandas as pd

        for pdf in it:
            pdf = pdf[
                pdf["v"].map(lambda x: x is not None and len(x) == DIM).to_numpy()
            ]
            n = len(pdf)
            if n == 0 or P == 0:
                continue
            U = _pq_unit(
                np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            )
            ids = pdf["vec_id"].to_numpy()
            A = _dot_fold_np(QU, U)  # (P, n), exact left-to-right fold
            A = np.where(ids[None, :] == qids[:, None], -np.inf, A)
            kth = n - TOP_K
            if kth > 0:
                th = np.partition(A, kth, axis=1)[:, kth]
            else:
                th = np.full(P, -np.inf)
            # Superset margin: the compared cosine is round(·, 6), so a
            # row up to one 1e-6 rounding quantum BELOW the batch's
            # TOP_K-th raw value can still TIE it after rounding and win
            # on n_id. Rounding is monotone, and two values > 2e-6 apart
            # can never share a rounding bucket — so th − 2e-6 keeps
            # every possible global winner (pinned by the batch-layout
            # and duplicate-tie tests).
            keep = A >= (th[:, None] - 2e-6)
            qi, ni = np.nonzero(keep)
            a = A[qi, ni]
            fin = np.isfinite(a)
            yield pd.DataFrame(
                {
                    "q_id": qids[qi[fin]],
                    "n_id": ids[ni[fin]],
                    "c_raw": a[fin],
                }
            )

    corpus = _pq_raw(spark, sf_dir)
    if cand_label_min is not None:
        # filtered exact arm (knn_recall_filtered's ground truth): the
        # candidate predicate sits on the scan, before the pandas pass
        corpus = corpus.filter(F.col("label") >= cand_label_min)
    local = corpus.select("vec_id", "v").mapInPandas(
        _score, "q_id bigint, n_id bigint, c_raw double"
    )
    # Rounding stays ENGINE-side (never replicate round(x, d) in python).
    scored = local.select(
        "q_id", "n_id", F.round(F.col("c_raw"), 6).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "cosine", "rnk")
    )


def _knn_lsh_sql() -> str:
    """Full DuckDB mirror of the LSH serving path (r13 graduation,
    VERDICT r12 item 3): md5-derived hyperplane sign-bit signatures,
    the 7-probe set (own bucket + every 1-bit flip), in-bucket exact
    cosine, (cosine DESC, n_id) top-k — the same CTEs the knn_recall_v2
    oracle has hash-verified since r7, now emitting the key's own
    (q_id, n_id, cosine, rnk) result."""
    from ls_hadoop_3_0_spark.llm.embeddings import (
        lsh_bucket_sql,
        probe_signatures_sql,
    )

    return f"""
    WITH e AS ({NORM_EMB_SQL}),
    bk AS (SELECT vec_id, u, {lsh_bucket_sql()} AS bucket FROM e),
    lpr AS (SELECT vec_id AS q_id, u AS qu,
                   unnest({probe_signatures_sql('bucket')}) AS sig
            FROM bk WHERE {BOUNDED_PANEL_SQL}),
    lsc AS (
        SELECT lpr.q_id, bk.vec_id AS n_id,
               round({_dot_sql('lpr.qu', 'bk.u')}, 6) AS cosine
        FROM lpr JOIN bk ON lpr.sig = bk.bucket AND bk.vec_id <> lpr.q_id
    )
    SELECT q_id, n_id, cosine, rnk FROM (
        SELECT q_id, n_id, cosine,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, n_id) AS rnk
        FROM lsc)
    WHERE rnk <= {TOP_K}
    """


@query("knn_lsh", _knn_lsh_sql())  # graduated to oracle-backed in r13
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: multi-probe random-hyperplane LSH + in-bucket top-k.

    Signature = sign bits of 6 hyperplane projections (64 buckets). The
    query side probes its own bucket plus every 1-bit flip (7 probes) —
    still a plain equi-join on the signature, so each query scores
    ~7/64 of the corpus instead of all of it, with much better recall
    than single-probe (vectors near a hyperplane land across the flip).
    ``radius=2`` widens to bit-pair flips (22 probes) when recall
    matters more than probe fan-out. Recall vs knn_cosine asserted in
    tests/test_knn.py (including radius-2 > radius-1).

    r13: GRADUATED from rows-only to fully oracle-backed — the
    hyperplanes are md5-derived constants and every dot rides the
    proven fold, so DuckDB re-derives buckets, probe sets and in-bucket
    top-k bit-for-bit (the knn_recall_v2 lsh arm, promoted to the key's
    own oracle). Panel = the BOUNDED fixed-id set (linear at any scale).
    """
    return lsh_topk(spark, sf_dir, radius=1, panel=BOUNDED_PANEL_SQL)


def lsh_topk(
    spark: SparkSession, sf_dir: str, radius: int = 1, panel: str = PANEL_SQL
) -> DataFrame:
    """knn_lsh body with the probe-radius and query-panel knobs exposed.

    Buckets/probes as integers (bijective with the '1'/'0' signature
    strings, same exact fold dots; flips = single-bit XOR, radius 2 adds
    bit-pair XORs) through the shared numpy grouped-top-k body — scoring
    touches only (probing query × bucket member) pairs."""
    import numpy as np

    planes = hyperplanes()

    def assign(U):
        return _lsh_bucket_ints(U, planes)

    def probes_of(QU, qids):
        own = _lsh_bucket_ints(QU, planes)
        probe = np.zeros((len(QU), 2**N_PLANES), dtype=bool)
        probe[np.arange(len(QU)), own] = True
        for i in range(N_PLANES):
            probe[np.arange(len(QU)), own ^ (1 << i)] = True
        if radius == 2:
            for i in range(N_PLANES - 1):
                for j in range(i + 1, N_PLANES):
                    probe[
                        np.arange(len(QU)), own ^ (1 << i) ^ (1 << j)
                    ] = True
        return probe

    return _grouped_cosine_topk(
        spark, sf_dir, panel, 2**N_PLANES, assign, probes_of
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path (SURVEY §7 r5).

IVF_K = 16  #: coarse-quantizer cells
IVF_NPROBE = 3  #: cells scored per query
IVF_TRAIN_MOD = 2  #: train the quantizer on vec_id % MOD == 1 (bounded sample)


def _seed_centroids(k: int = IVF_K, dim: int = DIM) -> list[list[float]]:
    """Deterministic md5-seeded unit vectors (same scheme as hyperplanes)."""
    cents = []
    for c in range(k):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"ivf:{c}:{i}".encode()).hexdigest()[:8]
            row.append((int(h, 16) / 2**32) * 2.0 - 1.0)
        nrm = math.sqrt(sum(x * x for x in row))
        cents.append([x / nrm for x in row])
    return cents


def ivf_seeds_sql() -> str:
    """The md5-seeded IVF quantizer seeds as a DuckDB list-of-lists literal.

    Same repr round-trip argument as embeddings.planes_sql: shortest
    round-tripping decimal + correctly-rounded literal parsers ⇒ the
    oracle's seed doubles are bit-identical to Spark's ``F.lit`` values.
    """
    return (
        "["
        + ",".join(
            "[" + ",".join(repr(x) for x in row) + "]"
            for row in _seed_centroids()
        )
        + "]"
    )


def _centroid_lit(cents: list[list[float]]) -> F.Column:
    """One ``Literal(array<array<double>>)`` node — NOT a CreateArray
    tree of k·dim scalar literals, which bloats every optimizer pass and
    codegen unit it appears in (measured: the tree form made the whole
    key ~6× slower at sf0.1 on pure plan overhead)."""
    return F.lit(cents)


def _cell() -> F.Column:
    """Map-side cell assignment: argmax-dot over the literal centroid
    array (unit vectors ⇒ max dot == max cosine == nearest cell). Pure
    expression — no shuffle, no UDF; ties break to the first (lowest)
    cell. (Lazy: F.expr needs an active SparkContext.)"""
    return F.expr("cast(array_position(dots, array_max(dots)) as int) - 1")


def _dots() -> F.Column:
    return F.expr("transform(cents, c -> " + DOT_SPARK.format(a="c", b="u") + ")")


def train_centroids(e: DataFrame, k: int = IVF_K) -> list[list[float]]:
    """One Lloyd refinement of the seeded quantizer over a bounded sample.

    Classic IVF trains the coarse quantizer on a sample, not the corpus —
    here vec_id % IVF_TRAIN_MOD == 1 (at 100 TB the MOD grows so the
    training set stays fixed-size). Per-dimension means go through
    scaled-long sums (exprs.dsum) so the refined centroids are
    bit-identical under any partitioning; the k×dim collect is quantizer
    metadata (KB-scale), not a data-path collect. Empty cells keep their
    seed vector.
    """
    seeds = _seed_centroids(k)
    sample = e.filter((F.col("vec_id") % IVF_TRAIN_MOD) == 1)
    assigned = (
        sample.withColumn("cents", _centroid_lit(seeds))
        .withColumn("dots", _dots())
        .withColumn("cell", _cell())
        .select("cell", F.posexplode("u").alias("pos", "x"))
    )
    means = (
        assigned.groupBy("cell", "pos")
        .agg((dsum("x") / F.count("x")).alias("m"))
        .collect()
    )
    return _refine_centroids(means, seeds)


def _refine_centroids(means, seeds: list[list[float]]) -> list[list[float]]:
    """Normalize the per-cell engine-exact means; empty cells keep their
    seed vector (shared by the HOF and numpy training paths)."""
    cents = [list(row) for row in seeds]
    by_cell: dict[int, dict[int, float]] = {}
    for r in means:
        by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
    for c, dims in by_cell.items():
        row = [dims[i] for i in sorted(dims)]
        nrm = math.sqrt(sum(x * x for x in row))
        if nrm > 1e-9:
            cents[c] = [x / nrm for x in row]
    return cents


def _ivf_idx_ctes(train_pred: str = "TRUE") -> str:
    """CTE chain ``e .. idxc`` (no leading WITH): seeded centroids + one
    scaled-long Lloyd step over the ``vec_id % IVF_TRAIN_MOD = 1`` sample
    (further restricted by ``train_pred`` — the r15 compact key freezes
    the quantizer on the PRIOR slice only), then map-side cell
    assignment of the full corpus."""
    from ls_hadoop_3_0_spark.exprs import sql_davg

    return f"""e AS ({NORM_EMB_SQL}),
    seedrows AS (
        SELECT i - 1 AS cell, s[i] AS c
        FROM (SELECT {ivf_seeds_sql()} AS s), generate_series(1, {IVF_K}) t(i)
    ),
    sampc AS (
        SELECT vec_id, u,
               CAST(list_position(dots, list_max(dots)) AS INT) - 1 AS cell
        FROM (SELECT vec_id, u,
                     list_transform({ivf_seeds_sql()},
                                    c -> {_dot_sql('c', 'u')}) AS dots
              FROM e WHERE vec_id % {IVF_TRAIN_MOD} = 1 AND ({train_pred}))
    ),
    means AS (
        SELECT cell, pos, {sql_davg('x')} AS m
        FROM (SELECT cell, unnest(range(1, len(u) + 1)) AS pos,
                     unnest(u) AS x
              FROM sampc)
        GROUP BY cell, pos
    ),
    refined AS (
        SELECT cell, mlist,
               sqrt(list_sum(list_transform(mlist, x -> x * x))) AS nrm
        FROM (SELECT cell, list(m ORDER BY pos) AS mlist
              FROM means GROUP BY cell)
    ),
    cents AS (
        SELECT s.cell,
               COALESCE(CASE WHEN r.nrm > 1e-9
                             THEN list_transform(r.mlist, x -> x / r.nrm)
                        END, s.c) AS c
        FROM seedrows s LEFT JOIN refined r ON r.cell = s.cell
    ),
    carr AS (SELECT list(c ORDER BY cell) AS cl FROM cents),
    idx AS (
        SELECT vec_id, label, u,
               list_transform(cl, c -> {_dot_sql('c', 'u')}) AS dots
        FROM e, carr
    ),
    idxc AS MATERIALIZED (
        SELECT vec_id, label, u,
               CAST(list_position(dots, list_max(dots)) AS INT) - 1 AS cell
        FROM idx
    )"""


def _ivf_serve_ctes(cand_pred: str = "TRUE", nprobe: int = IVF_NPROBE) -> str:
    """CTE chain ``qp, isc, srv`` continuing ``_ivf_idx_ctes`` (no
    leading comma): panel probe set, in-cell exact cosine, top-k."""
    return f"""qp AS (
        SELECT q_id, qu, cell FROM (
            SELECT vec_id AS q_id, u AS qu,
                   unnest(range(0, {IVF_K})) AS cell, unnest(dots) AS d
            FROM idx WHERE {BOUNDED_PANEL_SQL}
        ) qd
        QUALIFY row_number() OVER (PARTITION BY q_id
                                   ORDER BY d DESC, cell) <= {nprobe}
    ),
    isc AS (
        SELECT qp.q_id, idxc.vec_id AS n_id,
               round({_dot_sql('qp.qu', 'idxc.u')}, 6) AS cosine
        FROM qp JOIN idxc
          ON qp.cell = idxc.cell AND idxc.vec_id <> qp.q_id
        WHERE {cand_pred}
    ),
    srv AS (
        SELECT q_id, n_id, cosine, rnk FROM (
            SELECT q_id, n_id, cosine,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rnk
            FROM isc)
        WHERE rnk <= {TOP_K}
    )"""


def _knn_ivf_sql(
    cand_pred: str = "TRUE",
    nprobe: int = IVF_NPROBE,
    train_pred: str = "TRUE",
) -> str:
    """Full DuckDB mirror of the IVF serving path (r13 graduation):
    seeded centroids + one scaled-long Lloyd step, map-side cell
    assignment, nprobe-cell probe set, in-cell exact cosine top-k —
    the knn_recall_v2 ivf arm promoted to the key's own oracle.

    r14: parametrized for the filtered serving rung — ``cand_pred``
    restricts the CANDIDATE side (metadata ∧ top-k), ``nprobe`` widens
    the probe set (filtered serving probes more cells to compensate
    for selectivity). r15: ``train_pred`` restricts the quantizer
    training sample (the compact key's frozen prior-epoch quantizer).
    Defaults reproduce the unfiltered chain."""
    return f"""
    WITH {_ivf_idx_ctes(train_pred)},
    {_ivf_serve_ctes(cand_pred, nprobe)}
    SELECT q_id, n_id, cosine, rnk FROM srv
    """


@query("knn_ivf", _knn_ivf_sql())  # graduated to oracle-backed in r13
def knn_ivf(
    spark: SparkSession, sf_dir: str, panel: str = BOUNDED_PANEL_SQL
) -> DataFrame:
    """X3 IVF-style ANN: coarse quantizer cells + nprobe cell scoring
    (the inverted-file scheme of Sivic & Zisserman's Video Google and
    Jégou et al.'s IVFADC — public literature; cells here score exact
    dot products instead of PQ codes).

    Index side: every vector is assigned map-side to its nearest of
    IVF_K trained centroids (argmax-dot expression — no shuffle). Query
    side: each query probes its IVF_NPROBE nearest cells and scores only
    those vectors via an equi-join on ``cell`` — per-query work drops
    from O(N) to O(N·nprobe/k), the IVF trade SURVEY §7 risk 5 names.
    Complements knn_lsh: data-adapted Voronoi cells (better recall on
    clustered corpora) vs data-oblivious hyperplanes.

    r12: assignment + scoring moved to the shared numpy grouped-top-k
    body (the knn_cosine DNF lesson) — the interpreted-HOF assignment
    and its localCheckpoint barrier are gone; scoring still touches only
    probed-cell members. At 100 TB the index build writes parquet
    PARTITIONED BY cell so probing prunes IO as well as compute.

    r13: GRADUATED from rows-only to fully oracle-backed — seeds,
    the scaled-long Lloyd step, cells, probes and every dot are the
    proven deterministic arithmetic the knn_recall_v2 ivf arm has
    hash-verified since r7; the key now carries that chain as its own
    oracle. Panel = the BOUNDED fixed-id set.
    """
    import numpy as np

    cents = np.asarray(_ivf_train_np(spark, sf_dir), dtype=np.float64)

    def _cdots(U):
        out = np.empty((len(U), IVF_K), dtype=np.float64)
        for c in range(IVF_K):
            acc = cents[c, 0] * U[:, 0]
            for d in range(1, DIM):
                acc = acc + cents[c, d] * U[:, d]
            out[:, c] = acc
        return out

    def assign(U):
        # FIRST argmax (strict > scanning ascending) — the
        # array_position(dots, array_max(dots)) tie-break.
        dots = _cdots(U)
        cell = np.zeros(len(U), dtype=np.int64)
        best = dots[:, 0]
        for c in range(1, IVF_K):
            gt = dots[:, c] > best
            best = np.where(gt, dots[:, c], best)
            cell = np.where(gt, c, cell)
        return cell

    def probes_of(QU, qids):
        qdots = _cdots(QU)
        probe = np.zeros((len(QU), IVF_K), dtype=bool)
        for p in range(len(QU)):
            order = sorted(range(IVF_K), key=lambda c: (-qdots[p, c], c))
            probe[p, order[:IVF_NPROBE]] = True
        return probe

    return _grouped_cosine_topk(spark, sf_dir, panel, IVF_K, assign, probes_of)


# --------------------------------------------------------------------------
# Oracle-backed ANN recall gate (VERDICT r5 task 1): recall@k of the two
# approximate paths vs the exact baseline, recomputed end-to-end in SQL.




def _knn_recall_sql(panel: str = PANEL_SQL) -> str:
    """Full DuckDB mirror of exact + LSH + IVF top-k and their recall.

    Every arm re-derives its candidates from the embeddings table with
    the same deterministic constants Spark uses (hyperplanes, IVF seeds,
    one scaled-long-exact Lloyd step), so the approximate result sets —
    not just the summary counts — are independently recomputed.
    """
    from ls_hadoop_3_0_spark.exprs import sql_davg
    from ls_hadoop_3_0_spark.llm.embeddings import (
        lsh_bucket_sql,
        probe_signatures_sql,
    )

    return f"""
    WITH e AS ({NORM_EMB_SQL}),
    -- ---- exact arm (knn_cosine's CTE body) -------------------------
    q AS (SELECT vec_id AS q_id, u AS qu FROM e WHERE {panel}),
    exscored AS (
        SELECT q.q_id, e.vec_id AS n_id,
               round({_dot_sql('q.qu', 'e.u')}, 6) AS cosine
        FROM q JOIN e ON e.vec_id <> q.q_id
    ),
    ex AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rnk
            FROM exscored)
        WHERE rnk <= {TOP_K}
    ),
    -- ---- LSH arm ---------------------------------------------------
    bk AS (SELECT vec_id, u, {lsh_bucket_sql()} AS bucket FROM e),
    lpr AS (SELECT vec_id AS q_id, u AS qu,
                   unnest({probe_signatures_sql('bucket')}) AS sig
            FROM bk WHERE {panel}),
    lsc AS (
        SELECT lpr.q_id, bk.vec_id AS n_id,
               round({_dot_sql('lpr.qu', 'bk.u')}, 6) AS cosine
        FROM lpr JOIN bk ON lpr.sig = bk.bucket AND bk.vec_id <> lpr.q_id
    ),
    lshtop AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rnk
            FROM lsc)
        WHERE rnk <= {TOP_K}
    ),
    -- ---- LSH radius-2 arm (22-probe multi-probe) -------------------
    lpr2 AS (SELECT vec_id AS q_id, u AS qu,
                    unnest({probe_signatures_sql('bucket', radius=2)}) AS sig
             FROM bk WHERE {panel}),
    l2sc AS (
        SELECT lpr2.q_id, bk.vec_id AS n_id,
               round({_dot_sql('lpr2.qu', 'bk.u')}, 6) AS cosine
        FROM lpr2 JOIN bk ON lpr2.sig = bk.bucket AND bk.vec_id <> lpr2.q_id
    ),
    lsh2top AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rnk
            FROM l2sc)
        WHERE rnk <= {TOP_K}
    ),
    -- ---- IVF arm: seeded quantizer + one exact Lloyd step ----------
    seedrows AS (
        SELECT i - 1 AS cell, s[i] AS c
        FROM (SELECT {ivf_seeds_sql()} AS s), generate_series(1, {IVF_K}) t(i)
    ),
    sampc AS (
        SELECT vec_id, u,
               CAST(list_position(dots, list_max(dots)) AS INT) - 1 AS cell
        FROM (SELECT vec_id, u,
                     list_transform({ivf_seeds_sql()},
                                    c -> {_dot_sql('c', 'u')}) AS dots
              FROM e WHERE vec_id % {IVF_TRAIN_MOD} = 1)
    ),
    means AS (
        SELECT cell, pos, {sql_davg('x')} AS m
        FROM (SELECT cell, unnest(range(1, len(u) + 1)) AS pos,
                     unnest(u) AS x
              FROM sampc)
        GROUP BY cell, pos
    ),
    refined AS (
        SELECT cell, mlist,
               sqrt(list_sum(list_transform(mlist, x -> x * x))) AS nrm
        FROM (SELECT cell, list(m ORDER BY pos) AS mlist
              FROM means GROUP BY cell)
    ),
    cents AS (
        SELECT s.cell,
               COALESCE(CASE WHEN r.nrm > 1e-9
                             THEN list_transform(r.mlist, x -> x / r.nrm)
                        END, s.c) AS c
        FROM seedrows s LEFT JOIN refined r ON r.cell = s.cell
    ),
    carr AS (SELECT list(c ORDER BY cell) AS cl FROM cents),
    idx AS (
        SELECT vec_id, u,
               list_transform(cl, c -> {_dot_sql('c', 'u')}) AS dots
        FROM e, carr
    ),
    idxc AS (
        SELECT vec_id, u,
               CAST(list_position(dots, list_max(dots)) AS INT) - 1 AS cell
        FROM idx
    ),
    qp AS (
        SELECT q_id, qu, cell FROM (
            SELECT vec_id AS q_id, u AS qu,
                   unnest(range(0, {IVF_K})) AS cell, unnest(dots) AS d
            FROM idx WHERE {panel}
        ) qd
        QUALIFY row_number() OVER (PARTITION BY q_id
                                   ORDER BY d DESC, cell) <= {IVF_NPROBE}
    ),
    isc AS (
        SELECT qp.q_id, idxc.vec_id AS n_id,
               round({_dot_sql('qp.qu', 'idxc.u')}, 6) AS cosine
        FROM qp JOIN idxc
          ON qp.cell = idxc.cell AND idxc.vec_id <> qp.q_id
    ),
    ivftop AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rnk
            FROM isc)
        WHERE rnk <= {TOP_K}
    ),
    -- ---- recall summary -------------------------------------------
    exs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
                   CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries
            FROM ex),
    hits AS (
        SELECT 'lsh' AS method, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM lshtop JOIN ex USING (q_id, n_id)
        UNION ALL
        SELECT 'lsh_r2', CAST(COUNT(*) AS BIGINT)
        FROM lsh2top JOIN ex USING (q_id, n_id)
        UNION ALL
        SELECT 'ivf', CAST(COUNT(*) AS BIGINT)
        FROM ivftop JOIN ex USING (q_id, n_id)
    )
    SELECT method, n_queries, n_exact, n_hits,
           CAST(n_hits AS DOUBLE) / n_exact AS recall
    FROM hits, exs
    """


def _recall_summary(
    spark: SparkSession, sf_dir: str, panel: str = PANEL_SQL
) -> DataFrame:
    """Shared body of knn_recall / knn_recall_v2 (panel = query predicate)."""
    prepare(spark)
    ex = knn_cosine(spark, sf_dir, panel=panel).select(
        "q_id", "n_id"
    ).localCheckpoint()
    exs = ex.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count_distinct("q_id").alias("n_queries"),
    )

    def hits(approx: DataFrame, method: str) -> DataFrame:
        return (
            approx.select("q_id", "n_id")
            .join(ex, ["q_id", "n_id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(F.lit(method).alias("method"), "n_hits")
        )

    res = (
        hits(lsh_topk(spark, sf_dir, radius=1, panel=panel), "lsh")
        .unionByName(hits(lsh_topk(spark, sf_dir, radius=2, panel=panel), "lsh_r2"))
        .unionByName(hits(knn_ivf(spark, sf_dir, panel=panel), "ivf"))
    )
    return res.crossJoin(F.broadcast(exs)).select(
        "method",
        "n_queries",
        "n_exact",
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_exact")).alias("recall"),
    )


@query("knn_recall_v2", _knn_recall_sql(BOUNDED_PANEL_SQL))
def knn_recall_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 ANN quality gate with a BOUNDED query panel — the 100 TB form.

    knn_recall's panel is 1%% of the corpus, so its exact audit arm is
    quadratic in corpus size (measured: ~30× per 10× decade — fine as a
    per-release audit up to ~10×, prohibitive beyond). This twin pins
    the panel to a fixed id range (the first replica here; an authored
    panel in production — the contamination_check_v2 move applied to
    ANN auditing): same three arms, same oracle re-derivation, but the
    exact arm is panel×corpus ⇒ LINEAR at any scale. On the un-replicated
    fixtures the two keys coincide by construction; they diverge exactly
    when the corpus outgrows the panel — which is the point.
    """
    return _recall_summary(spark, sf_dir, panel=BOUNDED_PANEL_SQL)


#: Oracle SQL for the v1 release audit (kept for manual ≤10× runs; the
#: key itself was retired from the registry in r8 — see knn_recall).
KNN_RECALL_V1_SQL = _knn_recall_sql()


def knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X5 ANN quality gate: recall@{k} of knn_lsh and knn_ivf vs the
    exact knn_cosine baseline, computed inside Spark and hash-checked
    against a DuckDB oracle that re-derives ALL THREE result sets
    independently (deterministic hyperplanes/seeds + the scaled-long
    Lloyd step make the approximate candidates SQL-portable).

    RETIRED from the registry in r8 (was stamped green r6): its
    corpus-proportional panel (1% of vec_ids) makes the exact audit arm
    QUADRATIC in corpus size — measured 113 s at the 10× replica,
    killed at 100× (SCALE.md r7 audit table). It remains here as a
    documented ≤10×-scale RELEASE AUDIT, runnable manually against
    ``KNN_RECALL_V1_SQL``; the registered, bench-swept, driver-stamped
    form is ``knn_recall_v2`` (fixed-id panel ⇒ linear arm, 270 s at
    100×). Per the r7 verdict: the default sweep must carry only
    linear-or-better keys.

    This converts the ANN arms' quality from a test-pinned number
    (tests/test_knn.py's 0.15 floor) into a driver-visible, per-round
    stamped measurement — the missing piece VERDICT r5 ranked first.
    The rows-only `knn_lsh`/`knn_ivf` keys stay as the serving API.

    recall = |approx@k ∩ exact@k| / |exact@k| as an exact-integer
    double division — bit-stable on both engines. The exact arm is
    localCheckpointed: it is queries×k rows (KB) and feeds both the
    semi-joins and the denominator, so it must not recompute the
    brute-force scan three times.
    """
    return _recall_summary(spark, sf_dir, panel=PANEL_SQL)


# --------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) ANN — the third
# ANN rung beside knn_lsh (hyperplane buckets) and knn_ivf (coarse
# cells). Unlike those rows-only keys, EVERYTHING here is oracle-backed:
# codebooks are k-means-TRAINED per subspace with the kmeans_lloyd
# scaled-long re-quantization (state re-enters the 1e-6 lattice every
# round, so both engines carry identical doubles), vectors are
# NORMALIZED first (squared L2 on unit vectors is rank-equivalent to
# cosine: d² = 2 − 2cos), encoding is a deterministic argmin over the
# proven left-to-right fold, and ADC sums per-subspace lookups in fixed
# subspace order. The driver hash-checks the full top-k result.

PQ_M = 8  #: subspaces
PQ_SUB = DIM // PQ_M  #: dims per subspace (8)
PQ_K = 16  #: codes per subspace (4-bit) → code_word fits 32 bits
PQ_TRAIN_ROUNDS = 2  #: Lloyd rounds per subspace (init: first PQ_K vectors)
PQ_SCALE = 1_000_000  #: codebook state lattice (the kmeans_lloyd scale)


def _pq_fold8_sql(vec: str, cv: str, base: str) -> str:
    """8-dim squared-L2 fold: list_sum ∘ list_transform — the SQL twin
    of the numpy elementwise accumulation (bit-identical per row)."""
    return (
        f"list_sum(list_transform(generate_series(1, {PQ_SUB}),"
        f" i -> ({vec}[{base} + i] - {cv}[i])"
        f" * ({vec}[{base} + i] - {cv}[i])))"
    )


def _pq_sql_with(rounds: int = PQ_TRAIN_ROUNDS) -> str:
    """Shared DuckDB WITH-chain: normalize → quantized init codebook →
    ``rounds`` unrolled Lloyd rounds per subspace → encoded corpus ``w``
    (per (vec_id, m) the winning code + distance) + final codebook
    ``cbF``. Codebook state lives as scaled longs (``cb{t}q``) exactly
    like the Spark driver's collected ints; ``cv`` lists are derived
    per round as q/1e6 doubles. Empty cells keep the previous round's
    longs (the kmeans_lloyd fallback)."""
    from ls_hadoop_3_0_spark.exprs import sql_davg

    parts = [
        f"e AS MATERIALIZED (SELECT vec_id, label, u AS v FROM ({NORM_EMB_SQL}))",
        f"grid AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m)",
        f"sd AS (SELECT unnest(generate_series(1, {PQ_SUB})) AS i)",
        # The trailing scalar guard mirrors _pq_train's len(init) < PQ_K
        # degrade EXACTLY: with fewer than PQ_K init vectors present the
        # Spark side returns None (empty results), so cb0q must be empty
        # too — an empty cb0q propagates an empty chain (cv/s/a/m/cbF/w)
        # and every PQ-family oracle yields zero rows, never a partial
        # codebook (ADVICE r12, medium).
        f"cb0q AS MATERIALIZED (SELECT grid.m, e.vec_id AS code, sd.i,"
        f" CAST(round(e.v[grid.m * {PQ_SUB} + sd.i] * {PQ_SCALE}) AS BIGINT)"
        f" AS q FROM e CROSS JOIN grid CROSS JOIN sd"
        f" WHERE e.vec_id < {PQ_K}"
        f" AND (SELECT COUNT(*) FROM e WHERE vec_id < {PQ_K}) = {PQ_K})",
    ]
    fold = _pq_fold8_sql("e.v", "c.cv", f"c.m * {PQ_SUB}")
    for t in range(1, rounds + 1):
        prev = f"cb{t - 1}q"
        parts.append(
            f"cv{t - 1} AS (SELECT m, code,"
            f" list(CAST(q AS DOUBLE) / {PQ_SCALE}.0 ORDER BY i) AS cv"
            f" FROM {prev} GROUP BY m, code)"
        )
        parts.append(
            f"s{t} AS (SELECT e.vec_id, c.m, c.code, {fold} AS d2"
            f" FROM e CROSS JOIN cv{t - 1} c)"
        )
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT vec_id, m, code FROM"
            f" (SELECT vec_id, m, code, row_number() OVER"
            f" (PARTITION BY vec_id, m ORDER BY d2, code) AS rn FROM s{t})"
            f" WHERE rn = 1)"
        )
        parts.append(
            f"m{t} AS MATERIALIZED (SELECT m, code, i,"
            f" CAST(round(({sql_davg('x')}) * {PQ_SCALE}) AS BIGINT) AS q"
            f" FROM (SELECT a.m, a.code, sd.i,"
            f" e.v[a.m * {PQ_SUB} + sd.i] AS x"
            f" FROM a{t} a JOIN e USING (vec_id) CROSS JOIN sd) t{t}x"
            f" GROUP BY m, code, i)"
        )
        parts.append(
            f"cb{t}q AS MATERIALIZED (SELECT m, code, i, q FROM m{t}"
            f" UNION ALL SELECT p.m, p.code, p.i, p.q FROM {prev} p"
            f" WHERE NOT EXISTS (SELECT 1 FROM m{t} mm WHERE mm.m = p.m AND mm.code = p.code))"
        )
    parts.append(
        f"cbF AS MATERIALIZED (SELECT m, code,"
        f" list(CAST(q AS DOUBLE) / {PQ_SCALE}.0 ORDER BY i) AS cv"
        f" FROM cb{rounds}q GROUP BY m, code)"
    )
    parts.append(f"sub AS (SELECT e.vec_id, c.m, c.code, {fold} AS d2 FROM e CROSS JOIN cbF c)")
    parts.append(
        "w AS MATERIALIZED (SELECT vec_id, m, code, d2 FROM"
        " (SELECT vec_id, m, code, d2, row_number() OVER"
        " (PARTITION BY vec_id, m ORDER BY d2, code) AS rn FROM sub)"
        " WHERE rn = 1)"
    )
    return "WITH " + ",\n    ".join(parts)


_PQ_WITH = _pq_sql_with()


def _empty_topk(spark: SparkSession, sf_dir: str, dist_col: str) -> DataFrame:
    """Zero-row (q_id, n_id, <dist>, rnk) frame with the right schema."""
    return _pq_raw(spark, sf_dir).limit(0).selectExpr(
        "vec_id as q_id",
        "vec_id as n_id",
        f"cast(null as double) as {dist_col}",
        "cast(null as int) as rnk",
    )


def _pq_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit vectors via the SQL fold — used only for the BOUNDED panel
    and codebook-init collections (a handful of rows)."""
    prepare(spark)
    return normalized_embeddings(load(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("u").alias("v")
    )


def _pq_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stream for the pandas passes: RAW float32 arrays, zero
    interpreted HOFs. Normalization happens in numpy (_pq_unit) with
    the same left-to-right fold, so the unit vectors are bit-identical
    to the SQL path — measured at the 100x replica this cut both
    keys ~6.7x (82 -> 12 s; the r11 interpreted-HOF lesson applied here)."""
    prepare(spark)
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").alias("v")
    )


def _pq_unit(V32):
    """float32 batch -> float64 unit vectors, bit-identical to
    NORM_EMB_SQL: cast is exact, nrm = sqrt(left-fold of x*x), u = x/nrm
    elementwise."""
    import numpy as np

    V = V32.astype(np.float64) if V32.dtype != np.float64 else V32
    acc = V[:, 0] * V[:, 0]
    for d in range(1, V.shape[1]):
        acc = acc + V[:, d] * V[:, d]  # same left-to-right order per row
    return V / np.sqrt(acc)[:, None]


def _pq_subdists(V, cb, m: int, k: int):
    """Squared L2 of batch rows' m-th subvector to codeword (m, k) —
    the exact left-to-right fold, elementwise float64 across rows."""
    off = m * PQ_SUB
    t = V[:, off] - cb[m, k, 0]
    acc = t * t  # == 0D + t², the fold's first step
    for d in range(1, PQ_SUB):
        t = V[:, off + d] - cb[m, k, d]
        acc = acc + t * t  # same left-to-right order per row
    return acc


def _pq_assign(V, cb):
    """(codes, rec_err) for a batch: per-subspace argmin over ascending
    codes (strict <, ties keep the smaller code), rec_err accumulated
    in m-ascending order (matches the oracle's list(d2 ORDER BY m))."""
    import numpy as np

    n = len(V)
    codes = np.empty((n, PQ_M), dtype=np.int64)
    rec = None
    for m in range(PQ_M):
        best, bestc = None, None
        for k in range(PQ_K):
            acc = _pq_subdists(V, cb, m, k)
            if best is None:
                best, bestc = acc, np.zeros(n, dtype=np.int64)
            else:
                lt = acc < best
                best = np.where(lt, acc, best)
                bestc = np.where(lt, k, bestc)
        codes[:, m] = bestc
        rec = best if rec is None else rec + best
    return codes, rec


def _pq_train(spark: SparkSession, sf_dir: str, rounds: int = PQ_TRAIN_ROUNDS):
    """Train the PQ_M×PQ_K codebook: quantized sampled init (the first
    PQ_K normalized vectors) + ``rounds`` Lloyd rounds per subspace.

    State is collected as EXACT scaled longs every round (M×K×SUB ≤ 1 KB
    of quantizer metadata — the kmeans_lloyd collect discipline) and
    re-enters numpy as q/1e6, so the Spark codebook and the oracle's
    cb{t}q lattice are the same doubles at every round.
    """
    import numpy as np

    e = _pq_normalized(spark, sf_dir)
    raw = _pq_raw(spark, sf_dir)
    init = sorted(
        (int(r["vec_id"]), list(r["q"]))
        for r in e.filter(F.col("vec_id") < PQ_K)
        .select(
            "vec_id",
            F.expr(
                f"transform(v, x -> cast(round(x * {PQ_SCALE}) as long))"
            ).alias("q"),
        )
        .collect()
    )
    if len(init) < PQ_K:
        # No full sampled codebook (empty/truncated corpus): the PQ
        # family degrades to EMPTY results — the same rows the oracle
        # chain yields when cb0q is empty. Fixture contract: vec_id
        # 0..PQ_K-1 present.
        return None
    qcb = {
        (m, k): [init[k][1][m * PQ_SUB + d] for d in range(PQ_SUB)]
        for m in range(PQ_M)
        for k in range(PQ_K)
    }

    def _cb_np():
        cb = np.empty((PQ_M, PQ_K, PQ_SUB), dtype=np.float64)
        for (m, k), qs_ in qcb.items():
            for d, q in enumerate(qs_):
                cb[m, k, d] = q / PQ_SCALE
        return cb

    for _ in range(rounds):
        cb = _cb_np()

        def _emit(it, cb=cb):
            import pandas as pd

            for pdf in it:
                pdf = pdf[
                    pdf["v"].map(lambda x: x is not None and len(x) == DIM).to_numpy()
                ]
                if len(pdf) == 0:
                    continue
                V = _pq_unit(
                    np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
                )
                codes, _ = _pq_assign(V, cb)
                for m in range(PQ_M):
                    yield pd.DataFrame(
                        {
                            "m": np.full(len(V), m, dtype=np.int32),
                            "code": codes[:, m],
                            "sub": list(V[:, m * PQ_SUB : (m + 1) * PQ_SUB]),
                        }
                    )

        stats = (
            raw.mapInPandas(_emit, "m int, code bigint, sub array<double>")
            .select("m", "code", F.posexplode("sub").alias("i", "x"))
            .groupBy("m", "code", "i")
            .agg(
                F.round((dsum("x") / F.count("x")) * PQ_SCALE)
                .cast("long")
                .alias("q")
            )
            .collect()
        )  # ≤ M×K×SUB rows of quantizer metadata, not a data path
        for r in stats:
            qcb[(int(r["m"]), int(r["code"]))][int(r["i"])] = int(r["q"])
        # cells with no members keep their previous longs (the fallback)
    return _cb_np()


def _pq_encode_df(spark: SparkSession, sf_dir: str, cb=None) -> DataFrame:
    """Corpus → (vec_id, label, codes, code_word, rec_err), map-only.

    The argmin per subspace uses the eval_confusion numpy form: the SAME
    left-to-right per-dimension fold as the SQL oracle, vectorized
    across rows. Malformed (NULL/ragged) vectors degrade to NULL rows,
    never a task failure (the r12 degrade rule).
    """
    import numpy as np

    if cb is None:
        cb = _pq_train(spark, sf_dir)
    if cb is None:  # empty corpus -> empty result, oracle-consistent
        return _pq_raw(spark, sf_dir).limit(0).selectExpr(
            "vec_id",
            "cast(null as int) as label",
            "cast(null as array<bigint>) as codes",
            "cast(null as bigint) as code_word",
            "cast(null as double) as rec_err",
        )

    def _encode(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            ok = pdf["v"].map(lambda x: x is not None and len(x) == DIM)
            bad = pdf[~ok.to_numpy()]
            if len(bad):
                yield pd.DataFrame(
                    {
                        "vec_id": bad["vec_id"].to_numpy(),
                        "label": bad["label"].to_numpy(),
                        "codes": [None] * len(bad),
                        "code_word": pd.array([None] * len(bad), dtype="Int64"),
                        "rec_err": pd.array([None] * len(bad), dtype="Float64"),
                    }
                )
                pdf = pdf[ok.to_numpy()]
                if len(pdf) == 0:
                    continue
            V = _pq_unit(
                np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            )
            codes, rec = _pq_assign(V, cb)
            word = np.zeros(len(V), dtype=np.int64)
            for m in range(PQ_M):
                word += codes[:, m] * (PQ_K**m)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "codes": list(codes),
                    "code_word": word,
                    "rec_err": rec,
                }
            )

    return _pq_raw(spark, sf_dir).mapInPandas(
        _encode,
        "vec_id bigint, label int, codes array<bigint>, code_word bigint,"
        " rec_err double",
    )


@query(
    "embedding_pq_encode",
    f"""
    {_PQ_WITH},
    agg AS (SELECT vec_id,
                   CAST(SUM(code * CAST(power({PQ_K}, m) AS BIGINT))
                        AS BIGINT) AS code_word,
                   list_sum(list(d2 ORDER BY m)) AS rec_err
            FROM w GROUP BY vec_id)
    SELECT a.vec_id, e.label, a.code_word, a.rec_err
    FROM agg a JOIN e USING (vec_id)
    """,
)
def embedding_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 product quantization: encode every vector as PQ_M 4-bit codes.

    The compression rung between embedding_quantize (scalar) and a full
    ANN index (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", re-expressed Spark-first): normalize, split the 64-dim
    space into PQ_M=8 subspaces, k-means each subspace (PQ_TRAIN_ROUNDS
    Lloyd rounds, scaled-long state — the kmeans_lloyd recipe at
    subspace grain), assign each subvector to its nearest codeword,
    pack the 8 codes into one bigint word (256 B float32 → 4 B, 64×),
    and emit the exact squared reconstruction error.

    Scale: training is ROUNDS corpus passes with a (m, code, dim)-keyed
    map-combined agg (≤1 KB collected per round); encoding is map-only
    (scan → mapInPandas, no shuffle). The numpy/SQL fold identity keeps
    every distance bit-identical to the DuckDB oracle, so the key is
    fully hash-checked — approximation lives in the VALUES (quantized
    codes), not in any nondeterminism.
    """
    return _pq_encode_df(spark, sf_dir).select(
        "vec_id", "label", "code_word", "rec_err"
    )


@query(
    "knn_pq",
    f"""
    {_PQ_WITH},
    q AS (SELECT vec_id AS q_id, v AS qv FROM e
          WHERE {BOUNDED_PANEL_SQL}),
    lut AS MATERIALIZED (
        SELECT q.q_id, c.m, c.code,
               {_pq_fold8_sql("q.qv", "c.cv", f"c.m * {PQ_SUB}")} AS part
        FROM q CROSS JOIN cbF c),
    scored AS (
        SELECT l.q_id, w.vec_id AS n_id,
               list_sum(list(l.part ORDER BY l.m)) AS adist
        FROM w JOIN lut l ON l.m = w.m AND l.code = w.code
        WHERE w.vec_id <> l.q_id
        GROUP BY l.q_id, w.vec_id)
    SELECT q_id, n_id, adist, rnk FROM (
        SELECT q_id, n_id, adist,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adist, n_id) AS rnk
        FROM scored)
    WHERE rnk <= {TOP_K}
    """,
)
def knn_pq(spark: SparkSession, sf_dir: str, cb=None) -> DataFrame:
    """X3 ANN serving via PQ codes + asymmetric distance (ADC).

    For each panel query (the knn_recall_v2 BOUNDED fixed-id panel —
    linear in corpus size at any replica), build the 8×16 lookup table
    of subspace distances to every trained codeword, then score every
    encoded corpus vector as the m-ascending sum of table lookups (the
    ADC half of IVFADC) and emit the exact top-K per query. On unit
    vectors adist ≈ 2 − 2cos, so the ranking approximates knn_cosine's
    (recall floor pinned in tests/test_r12_keys.py).

    Scale shape: the corpus side is the map-only encode stream; scoring
    is a per-batch numpy gather (LUT[q, m, code]) — no row explosion,
    no corpus×panel join. Each Arrow batch emits only a per-query TOP-K
    SUPERSET (everything ≤ the batch's K-th smallest adist, so exact
    ties survive batching), and one panel-small window pass picks the
    global (adist, n_id)-ordered top-K — distributed top-k, exact by
    construction and batch-layout-invariant (pinned in tests). Every
    adist is bit-identical to the oracle: LUT entries ride the
    left-to-right subspace fold, the m-sum is fixed-order, and the
    codebook lattice is shared with the oracle's cb{t}q chain.
    """
    import numpy as np

    prepare(spark)
    if cb is None:
        cb = _pq_train(spark, sf_dir)
    if cb is None:  # no sampled codebook (empty corpus) -> empty result
        return _empty_topk(spark, sf_dir, "adist")
    e = _pq_normalized(spark, sf_dir)
    panel = sorted(
        (int(r["vec_id"]), r["v"])
        for r in e.filter(F.expr(BOUNDED_PANEL_SQL))
        .select("vec_id", "v")
        .collect()  # bounded eval set (fixed id range), never corpus-scale
    )
    qids = np.asarray([q for q, _ in panel], dtype=np.int64)
    QV = np.asarray([v for _, v in panel], dtype=np.float64)
    P = len(qids)
    lut = np.empty((P, PQ_M, PQ_K), dtype=np.float64)
    for m in range(PQ_M):
        for k in range(PQ_K):
            lut[:, m, k] = _pq_subdists(QV, cb, m, k)

    def _score(it):
        import pandas as pd

        for pdf in it:
            pdf = pdf[pdf["codes"].notna().to_numpy()]
            n = len(pdf)
            if n == 0 or P == 0:
                continue
            C = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            ids = pdf["vec_id"].to_numpy()
            A = lut[:, 0, C[:, 0]]  # (P, n)
            for m in range(1, PQ_M):
                A = A + lut[:, m, C[:, m]]  # m-ascending, matches oracle
            A = np.where(ids[None, :] == qids[:, None], np.inf, A)
            kth = min(TOP_K - 1, n - 1)
            th = np.partition(A, kth, axis=1)[:, kth]
            keep = A <= th[:, None]  # superset: ALL ties at the kth value
            qi, ni = np.nonzero(keep)
            a = A[qi, ni]
            fin = np.isfinite(a)  # drop self-pads when n < TOP_K
            yield pd.DataFrame(
                {
                    "q_id": qids[qi[fin]],
                    "n_id": ids[ni[fin]],
                    "adist": a[fin],
                }
            )

    local = (
        _pq_encode_df(spark, sf_dir, cb=cb)
        .select("vec_id", "codes")
        .mapInPandas(_score, "q_id bigint, n_id bigint, adist double")
    )
    wnd = Window.partitionBy("q_id").orderBy("adist", "n_id")
    return (
        local.withColumn("rnk", F.row_number().over(wnd))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "adist", "rnk")
    )


# --------------------------------------------------------------------------
# IVFADC — the full Jégou et al. pipeline: coarse IVF cells prune the
# candidate set (sublinear probe fraction), PQ codes + ADC score what
# survives. Composes the two trained quantizers above (train_centroids'
# coarse cells, _pq_train's subspace codebooks), and — unlike knn_ivf,
# which is rows-only — stays fully oracle-backed: every arm is the
# proven fold arithmetic, so DuckDB re-derives cells, codes, probes and
# ADC distances bit-for-bit.


def _ivf_cells_sql(panel: str, nprobe: int = IVF_NPROBE) -> str:
    """DuckDB CTEs re-deriving the coarse quantizer against the PQ
    chain's ``e(vec_id, label, v)`` naming: seeded centroids + one
    scaled-long Lloyd step (the knn_recall_v2 mirror, retargeted from
    ``u`` to ``v``), per-vector cell ``idxc`` and per-query probe set
    ``qp`` (top-``nprobe`` cells per query)."""
    from ls_hadoop_3_0_spark.exprs import sql_davg

    return f"""
    seedrows AS (
        SELECT i - 1 AS cell, s[i] AS c
        FROM (SELECT {ivf_seeds_sql()} AS s), generate_series(1, {IVF_K}) t(i)
    ),
    sampc AS (
        SELECT vec_id, v,
               CAST(list_position(dots, list_max(dots)) AS INT) - 1 AS cell
        FROM (SELECT vec_id, v,
                     list_transform({ivf_seeds_sql()},
                                    c -> {_dot_sql('c', 'v')}) AS dots
              FROM e WHERE vec_id % {IVF_TRAIN_MOD} = 1)
    ),
    cmeans AS (
        SELECT cell, pos, {sql_davg('x')} AS m
        FROM (SELECT cell, unnest(range(1, len(v) + 1)) AS pos,
                     unnest(v) AS x
              FROM sampc)
        GROUP BY cell, pos
    ),
    refined AS (
        SELECT cell, mlist,
               sqrt(list_sum(list_transform(mlist, x -> x * x))) AS nrm
        FROM (SELECT cell, list(m ORDER BY pos) AS mlist
              FROM cmeans GROUP BY cell)
    ),
    ccents AS (
        SELECT s.cell,
               COALESCE(CASE WHEN r.nrm > 1e-9
                             THEN list_transform(r.mlist, x -> x / r.nrm)
                        END, s.c) AS c
        FROM seedrows s LEFT JOIN refined r ON r.cell = s.cell
    ),
    carr AS (SELECT list(c ORDER BY cell) AS cl FROM ccents),
    cidx AS MATERIALIZED (
        SELECT vec_id, v,
               list_transform(cl, c -> {_dot_sql('c', 'v')}) AS dots
        FROM e, carr
    ),
    idxc AS MATERIALIZED (
        SELECT vec_id,
               CAST(list_position(dots, list_max(dots)) AS INT) - 1 AS cell
        FROM cidx
    ),
    qp AS (
        SELECT q_id, cell FROM (
            SELECT vec_id AS q_id,
                   unnest(range(0, {IVF_K})) AS cell, unnest(dots) AS d
            FROM cidx WHERE {panel}
        ) qd
        QUALIFY row_number() OVER (PARTITION BY q_id
                                   ORDER BY d DESC, cell) <= {nprobe}
    )"""


def _ivf_train_np(
    spark: SparkSession, sf_dir: str, pred: str | None = None
) -> list[list[float]]:
    """train_centroids with the sample ASSIGNMENT in numpy.

    ``pred`` (r15) further restricts the training sample — the compact
    key freezes the quantizer on the PRIOR slice only, mirrored by the
    oracle's ``_ivf_idx_ctes(train_pred=...)``.

    The HOF form pays Catalyst's interpreted fold for the 16×64 dot
    table over the half-corpus sample (the dominant cost of knn_ivfadc's
    first cut: 70.6 s at the 100× replica). The numpy fold is
    bit-identical (the proven identity), the (cell, pos) scaled-long
    mean agg stays ENGINE-side (no python rounding anywhere), and the
    post-processing is the shared _refine_centroids — so the returned
    centroids are IDENTICAL to train_centroids' (pinned in tests).
    """
    import numpy as np

    seeds = _seed_centroids()
    cs = np.asarray(seeds, dtype=np.float64)

    def _assign(it):
        import pandas as pd

        for pdf in it:
            pdf = pdf[
                pdf["v"].map(lambda x: x is not None and len(x) == DIM).to_numpy()
            ]
            if len(pdf) == 0:
                continue
            U = _pq_unit(
                np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            )
            cell = np.zeros(len(U), dtype=np.int64)
            best = None
            for c in range(IVF_K):
                acc = cs[c, 0] * U[:, 0]
                for d in range(1, DIM):
                    acc = acc + cs[c, d] * U[:, d]  # left-to-right fold
                if best is None:
                    best = acc
                else:
                    gt = acc > best  # strict: ties keep the earlier cell
                    best = np.where(gt, acc, best)
                    cell = np.where(gt, c, cell)
            yield pd.DataFrame({"cell": cell.astype(np.int32), "u": list(U)})

    sample = _pq_raw(spark, sf_dir).filter(
        (F.col("vec_id") % IVF_TRAIN_MOD) == 1
    )
    if pred is not None:
        sample = sample.filter(F.expr(pred))
    assigned = sample.mapInPandas(
        _assign, "cell int, u array<double>"
    ).select("cell", F.posexplode("u").alias("pos", "x"))
    means = (
        assigned.groupBy("cell", "pos")
        .agg((dsum("x") / F.count("x")).alias("m"))
        .collect()
    )
    return _refine_centroids(means, seeds)


@query(
    "knn_ivfadc",
    f"""
    {_PQ_WITH},
    {_ivf_cells_sql(BOUNDED_PANEL_SQL)},
    q AS (SELECT vec_id AS q_id, v AS qv FROM e
          WHERE {BOUNDED_PANEL_SQL}),
    lut AS MATERIALIZED (
        SELECT q.q_id, c.m, c.code,
               {_pq_fold8_sql("q.qv", "c.cv", f"c.m * {PQ_SUB}")} AS part
        FROM q CROSS JOIN cbF c),
    cand AS (
        SELECT qp.q_id, idxc.vec_id AS n_id
        FROM qp JOIN idxc ON qp.cell = idxc.cell
        WHERE idxc.vec_id <> qp.q_id),
    scored AS (
        SELECT c.q_id, c.n_id,
               list_sum(list(l.part ORDER BY l.m)) AS adist
        FROM cand c
        JOIN w ON w.vec_id = c.n_id
        JOIN lut l ON l.q_id = c.q_id AND l.m = w.m AND l.code = w.code
        GROUP BY c.q_id, c.n_id)
    SELECT q_id, n_id, adist, rnk FROM (
        SELECT q_id, n_id, adist,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adist, n_id) AS rnk
        FROM scored)
    WHERE rnk <= {TOP_K}
    """,
)
def knn_ivfadc(spark: SparkSession, sf_dir: str, cb=None) -> DataFrame:
    """X3 IVFADC: inverted-file cells + PQ/ADC scoring, oracle-backed.

    The complete Jégou et al. serving pipeline: each query probes its
    IVF_NPROBE nearest coarse cells and ADC-scores ONLY vectors living
    in those cells — per-query scoring work drops to ~nprobe/IVF_K of
    the corpus on top of PQ's 64× payload compression. knn_ivf scores
    exact dots in probed cells (rows-only); this key scores PQ codes
    and is fully hash-checked against a DuckDB oracle that re-derives
    coarse cells (seeded + one scaled-long Lloyd step), PQ codebooks
    (PQ_TRAIN_ROUNDS scaled-long rounds), codes, probe sets, and every
    ADC distance bit-for-bit.

    Scale shape: ONE corpus pass computes cell + codes together in the
    pandas worker (numpy folds — no interpreted-HOF assignment, no
    localCheckpoint barrier needed); scoring gathers LUT entries only
    for rows whose cell is probed by each query (a (panel × IVF_K)
    boolean table — non-candidates are masked to inf and never emitted),
    and each batch emits a per-query top-k SUPERSET exactly as knn_pq.
    At 100 TB the index build writes parquet PARTITIONED BY cell, so
    probing prunes IO, not just compute — the knn_ivf layout note
    applies unchanged.
    """
    import numpy as np

    prepare(spark)
    if cb is None:
        cb = _pq_train(spark, sf_dir)
    if cb is None:  # no sampled codebook (empty corpus) -> empty result
        return _empty_topk(spark, sf_dir, "adist")
    cents = np.asarray(_ivf_train_np(spark, sf_dir), dtype=np.float64)
    panel = sorted(
        (int(r["vec_id"]), r["v"])
        for r in _pq_normalized(spark, sf_dir)
        .filter(F.expr(BOUNDED_PANEL_SQL))
        .select("vec_id", "v")
        .collect()  # bounded eval set
    )
    qids = np.asarray([q for q, _ in panel], dtype=np.int64)
    QV = np.asarray([v for _, v in panel], dtype=np.float64)
    P = len(qids)
    lut = np.empty((P, PQ_M, PQ_K), dtype=np.float64)
    for m in range(PQ_M):
        for k in range(PQ_K):
            lut[:, m, k] = _pq_subdists(QV, cb, m, k)

    def _dots_np(U):
        """(n, IVF_K) dot table, same left-to-right fold as _dot_sql."""
        out = np.empty((len(U), IVF_K), dtype=np.float64)
        for c in range(IVF_K):
            acc = cents[c, 0] * U[:, 0]
            for d in range(1, DIM):
                acc = acc + cents[c, d] * U[:, d]
            out[:, c] = acc
        return out

    # Per-query probe sets: top-IVF_NPROBE cells by (dot DESC, cell ASC)
    # — the oracle's qp QUALIFY. Boolean table (P, IVF_K).
    qdots = _dots_np(QV)
    probe = np.zeros((P, IVF_K), dtype=bool)
    for p in range(P):
        order = sorted(range(IVF_K), key=lambda c: (-qdots[p, c], c))
        probe[p, order[:IVF_NPROBE]] = True

    def _local(it):
        import pandas as pd

        for pdf in it:
            pdf = pdf[
                pdf["v"].map(lambda x: x is not None and len(x) == DIM).to_numpy()
            ]
            n = len(pdf)
            if n == 0 or P == 0:
                continue
            U = _pq_unit(
                np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            )
            ids = pdf["vec_id"].to_numpy()
            # cell: FIRST argmax (strict > while scanning ascending) —
            # the oracle's list_position(dots, list_max(dots)).
            dots = _dots_np(U)
            cell = np.zeros(n, dtype=np.int64)
            best = dots[:, 0]
            for c in range(1, IVF_K):
                gt = dots[:, c] > best
                best = np.where(gt, dots[:, c], best)
                cell = np.where(gt, c, cell)
            codes, _ = _pq_assign(U, cb)
            A = lut[:, 0, codes[:, 0]]
            for m in range(1, PQ_M):
                A = A + lut[:, m, codes[:, m]]  # m-ascending, matches oracle
            keepable = probe[:, cell]  # (P, n): row's cell probed by query
            A = np.where(keepable, A, np.inf)
            A = np.where(ids[None, :] == qids[:, None], np.inf, A)
            kth = min(TOP_K - 1, n - 1)
            th = np.partition(A, kth, axis=1)[:, kth]
            keep = A <= th[:, None]
            qi, ni = np.nonzero(keep)
            a = A[qi, ni]
            fin = np.isfinite(a)
            yield pd.DataFrame(
                {
                    "q_id": qids[qi[fin]],
                    "n_id": ids[ni[fin]],
                    "adist": a[fin],
                }
            )

    local = _pq_raw(spark, sf_dir).mapInPandas(
        _local, "q_id bigint, n_id bigint, adist double"
    )
    wnd = Window.partitionBy("q_id").orderBy("adist", "n_id")
    return (
        local.withColumn("rnk", F.row_number().over(wnd))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "adist", "rnk")
    )


def _knn_recall_pq_sql() -> str:
    """Oracle for knn_recall_pq: re-derive the exact arm, the PQ arm and
    the IVFADC arm end-to-end (PQ chain + coarse-cell chain + ADC) and
    overlap-count them — the knn_recall_v2 audit shape extended to the
    r12 rungs. Bounded panel → every arm LINEAR in corpus size."""
    return f"""
    {_PQ_WITH},
    {_ivf_cells_sql(BOUNDED_PANEL_SQL)},
    q AS (SELECT vec_id AS q_id, v AS qv FROM e
          WHERE {BOUNDED_PANEL_SQL}),
    lut AS MATERIALIZED (
        SELECT q.q_id, c.m, c.code,
               {_pq_fold8_sql("q.qv", "c.cv", f"c.m * {PQ_SUB}")} AS part
        FROM q CROSS JOIN cbF c),
    pqsc AS (
        SELECT l.q_id, w.vec_id AS n_id,
               list_sum(list(l.part ORDER BY l.m)) AS adist
        FROM w JOIN lut l ON l.m = w.m AND l.code = w.code
        WHERE w.vec_id <> l.q_id
        GROUP BY l.q_id, w.vec_id),
    pqtop AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY adist, n_id) AS rnk
            FROM pqsc)
        WHERE rnk <= {TOP_K}),
    cand AS (
        SELECT qp.q_id, idxc.vec_id AS n_id
        FROM qp JOIN idxc ON qp.cell = idxc.cell
        WHERE idxc.vec_id <> qp.q_id),
    iadc AS (
        SELECT c.q_id, c.n_id,
               list_sum(list(l.part ORDER BY l.m)) AS adist
        FROM cand c
        JOIN w ON w.vec_id = c.n_id
        JOIN lut l ON l.q_id = c.q_id AND l.m = w.m AND l.code = w.code
        GROUP BY c.q_id, c.n_id),
    iadctop AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY adist, n_id) AS rnk
            FROM iadc)
        WHERE rnk <= {TOP_K}),
    exsc AS (
        SELECT q.q_id, e2.vec_id AS n_id,
               round({_dot_sql('q.qv', 'e2.v')}, 6) AS cosine
        FROM q JOIN e e2 ON e2.vec_id <> q.q_id),
    ex AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rnk
            FROM exsc)
        WHERE rnk <= {TOP_K}),
    exs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
                   CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries
            FROM ex),
    hits AS (
        SELECT 'pq' AS method, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM pqtop JOIN ex USING (q_id, n_id)
        UNION ALL
        SELECT 'ivfadc', CAST(COUNT(*) AS BIGINT)
        FROM iadctop JOIN ex USING (q_id, n_id)
    )
    SELECT method, n_queries, n_exact, n_hits,
           CAST(n_hits AS DOUBLE) / n_exact AS recall
    FROM hits, exs
    -- hits/exs are COUNT aggregates (always 1 row each), so the
    -- empty/truncated-corpus degrade needs an explicit gate: Spark
    -- returns an EMPTY frame when _pq_train yields no full codebook,
    -- and this WHERE makes the oracle do the same (ADVICE r12).
    WHERE (SELECT COUNT(*) FROM cbF) = {PQ_M * PQ_K}
    """


@query("knn_recall_pq", _knn_recall_pq_sql())
def knn_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 ANN quality gate for the r12 rungs: recall@k of knn_pq and
    knn_ivfadc vs the exact bounded-panel knn_cosine baseline — the
    knn_recall_v2 audit extended to the PQ family, so ADC quality is a
    driver-stamped per-round measurement, not just a test floor.

    Both compared arms are themselves oracle-backed, so unlike v2 this
    audit guards QUALITY DRIFT only (codebook/training changes moving
    recall), not correctness. Linear: the panel is the fixed-id-range
    BOUNDED set, the exact arm is panel×corpus (the knn_recall_v2
    lesson), and both approximate arms are the keys' own linear plans.
    """
    prepare(spark)
    ex = (
        knn_cosine(spark, sf_dir, panel=BOUNDED_PANEL_SQL)
        .select("q_id", "n_id")
        .localCheckpoint()
    )
    exs = ex.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count_distinct("q_id").alias("n_queries"),
    )

    def hits(approx: DataFrame, method: str) -> DataFrame:
        return (
            approx.select("q_id", "n_id")
            .join(ex, ["q_id", "n_id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(F.lit(method).alias("method"), "n_hits")
        )

    cb = _pq_train(spark, sf_dir)  # train once, share across both arms
    if cb is None:  # empty corpus -> no arms, no exact rows
        return _empty_topk(spark, sf_dir, "adist").selectExpr(
            "cast(null as string) as method",
            "cast(null as bigint) as n_queries",
            "cast(null as bigint) as n_exact",
            "cast(null as bigint) as n_hits",
            "cast(null as double) as recall",
        )
    res = hits(knn_pq(spark, sf_dir, cb=cb), "pq").unionByName(
        hits(knn_ivfadc(spark, sf_dir, cb=cb), "ivfadc")
    )
    return res.crossJoin(F.broadcast(exs)).select(
        "method",
        "n_queries",
        "n_exact",
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_exact")).alias("recall"),
    )


def _grouped_cosine_topk(
    spark: SparkSession,
    sf_dir: str,
    panel: str,
    n_groups: int,
    assign_groups,
    probe_builder,
) -> DataFrame:
    """Shared numpy body of knn_lsh / knn_ivf: bucket-pruned cosine top-k.

    One map-only corpus pass: ``assign_groups(U) -> (n,)`` gives each
    row its bucket/cell, ``probe_builder(QU, qids) -> bool (P, G)`` the
    per-query probe set. Scoring touches ONLY (probing query × group
    member) pairs — the pruned-compute contract these keys exist for —
    via the exact left-to-right dot fold (_dot_fold_np), grouped by
    sorting each batch on its group id. Each batch emits a per-query
    top-k SUPERSET with the knn_cosine 2e-6 rounding-quantum margin;
    round(·, 6) stays engine-side; one superset-small window closes it.
    Replaces the interpreted-HOF assignment + broadcast-join scoring
    (the knn_cosine DNF lesson applied to the pruned arms).
    """
    import numpy as np

    prepare(spark)
    panel_rows = sorted(
        (int(r["vec_id"]), r["u"])
        for r in normalized_embeddings(load(spark, sf_dir, "embeddings"))
        .filter(F.expr(panel))
        .select("vec_id", "u")
        .collect()
    )
    qids = np.asarray([q for q, _ in panel_rows], dtype=np.int64)
    QU = np.asarray([u for _, u in panel_rows], dtype=np.float64)
    P = len(qids)
    probe = probe_builder(QU, qids) if P else None  # (P, n_groups) bool

    def _score(it):
        import pandas as pd

        for pdf in it:
            pdf = pdf[
                pdf["v"].map(lambda x: x is not None and len(x) == DIM).to_numpy()
            ]
            n = len(pdf)
            if n == 0 or P == 0:
                continue
            U = _pq_unit(
                np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            )
            ids = pdf["vec_id"].to_numpy()
            g = assign_groups(U)
            order = np.argsort(g, kind="stable")
            gs = g[order]
            starts = np.searchsorted(gs, np.arange(n_groups))
            ends = np.searchsorted(gs, np.arange(n_groups), side="right")
            cq, ci, ca = [], [], []
            for grp in np.unique(gs):
                ridx = order[starts[grp] : ends[grp]]
                qidx = np.nonzero(probe[:, grp])[0]
                if len(qidx) == 0:
                    continue
                blk = _dot_fold_np(QU[qidx], U[ridx])
                blk = np.where(
                    ids[ridx][None, :] == qids[qidx][:, None], -np.inf, blk
                )
                cq.append(np.repeat(qidx, len(ridx)))
                ci.append(np.tile(ridx, len(qidx)))
                ca.append(blk.ravel())
            if not cq:
                continue
            q_all = np.concatenate(cq)
            i_all = np.concatenate(ci)
            a_all = np.concatenate(ca)
            srt = np.lexsort((-a_all, q_all))
            q_s, i_s, a_s = q_all[srt], i_all[srt], a_all[srt]
            bounds = np.searchsorted(q_s, np.arange(P + 1))
            keep = np.zeros(len(q_s), dtype=bool)
            for p in range(P):
                s, e = bounds[p], bounds[p + 1]
                if s == e:
                    continue
                th = a_s[s + TOP_K - 1] if e - s >= TOP_K else -np.inf
                keep[s:e] = a_s[s:e] >= th - 2e-6  # superset incl. ties
            fin = keep & np.isfinite(a_s)
            yield pd.DataFrame(
                {
                    "q_id": qids[q_s[fin]],
                    "n_id": ids[i_s[fin]],
                    "c_raw": a_s[fin],
                }
            )

    local = _pq_raw(spark, sf_dir).select("vec_id", "v").mapInPandas(
        _score, "q_id bigint, n_id bigint, c_raw double"
    )
    scored = local.select(
        "q_id", "n_id", F.round(F.col("c_raw"), 6).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "cosine", "rnk")
    )


def _lsh_bucket_ints(U, planes):
    """Integer form of the sign-bit signature: bit p (MSB-first, the
    string's first char) set iff dot(plane_p, u) > 0 — bijective with
    lsh_bucketed's '1'/'0' string, same exact fold dots."""
    import numpy as np

    n = len(U)
    out = np.zeros(n, dtype=np.int64)
    for p_i, plane in enumerate(planes):
        acc = plane[0] * U[:, 0]
        for d in range(1, DIM):
            acc = acc + plane[d] * U[:, d]
        out |= (acc > 0).astype(np.int64) << (len(planes) - 1 - p_i)
    return out


# --------------------------------------------------------------------------
# ADC shortlist + exact re-rank (r13, VERDICT r12 item 1) — the refinement
# step every production IVFADC deployment serves with: the ADC rungs stop
# at quantized distances (measured recall@10 at sf0.01: 0.28 pq / 0.16
# ivfadc — correct per contract, not servable retrieval), so these keys
# take a top-R ADC SHORTLIST as a candidate superset and re-rank it with
# EXACT dot products (the proven numpy left-fold), emitting cosine top-K.
# Measured candidate recall at sf0.01 (DuckDB, r13): ADC top-128 → 0.92;
# probed-cells(12/16) ∩ top-256 → 0.92 — and re-rank recall ≡ candidate
# recall (an exact-top-K member in the shortlist can only be outranked by
# other exact-top-K members).

RERANK_R = 128  #: ADC shortlist size per query (knn_pq_rerank)
RERANK_NPROBE = 12  #: coarse cells probed by knn_ivfadc_rerank
RERANK_R_IVF = 256  #: shortlist size within probed cells


def _rerank_sql(R: int, nprobe: int | None = None) -> str:
    """Oracle for the re-rank keys: the knn_pq/knn_ivfadc chain, cut at
    rnk_adc ≤ R, then re-scored with the exact unit-vector dot fold and
    re-ranked (cosine DESC, n_id) — every stage the proven arithmetic."""
    cells = "" if nprobe is None else (
        _ivf_cells_sql(BOUNDED_PANEL_SQL, nprobe=nprobe) + ","
    )
    cand = (
        "cand AS (SELECT l.q_id, w.vec_id AS n_id, w.m, w.code, l.part"
        " FROM w JOIN lut l ON l.m = w.m AND l.code = w.code"
        " WHERE w.vec_id <> l.q_id)"
        if nprobe is None
        else (
            "cand AS (SELECT l.q_id, w.vec_id AS n_id, w.m, w.code, l.part"
            " FROM w JOIN idxc ON idxc.vec_id = w.vec_id"
            " JOIN qp ON qp.cell = idxc.cell"
            " JOIN lut l ON l.q_id = qp.q_id AND l.m = w.m AND l.code = w.code"
            " WHERE w.vec_id <> l.q_id)"
        )
    )
    return f"""
    {_PQ_WITH},
    {cells}
    q AS (SELECT vec_id AS q_id, v AS qv FROM e
          WHERE {BOUNDED_PANEL_SQL}),
    lut AS MATERIALIZED (
        SELECT q.q_id, c.m, c.code,
               {_pq_fold8_sql("q.qv", "c.cv", f"c.m * {PQ_SUB}")} AS part
        FROM q CROSS JOIN cbF c),
    {cand},
    scored AS (
        SELECT q_id, n_id, list_sum(list(part ORDER BY m)) AS adist
        FROM cand GROUP BY q_id, n_id),
    short AS MATERIALIZED (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY adist, n_id) AS rnk_adc
            FROM scored)
        WHERE rnk_adc <= {R}),
    rr AS (
        SELECT s.q_id, s.n_id,
               round({_dot_sql('q.qv', 'e2.v')}, 6) AS cosine
        FROM short s
        JOIN q ON q.q_id = s.q_id
        JOIN e e2 ON e2.vec_id = s.n_id)
    SELECT q_id, n_id, cosine, rnk FROM (
        SELECT q_id, n_id, cosine,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, n_id) AS rnk
        FROM rr)
    WHERE rnk <= {TOP_K}
    """


def _adc_rerank(
    spark: SparkSession,
    sf_dir: str,
    cb,
    R: int,
    nprobe: int | None = None,
) -> DataFrame:
    """Shared Spark body of knn_pq_rerank / knn_ivfadc_rerank.

    ONE corpus pass (the knn_ivfadc shape): per Arrow batch compute PQ
    codes (+ coarse cell when ``nprobe``), ADC distances from the
    panel×M×K LUT, keep a per-query top-R SUPERSET by exact adist ties
    (batch-layout-invariant — the knn_pq discipline at R grain), and
    compute the EXACT unit-vector dot only for kept pairs (≤ P·R-ish
    per batch — the fold runs pairwise, never the (P, n) table, so the
    re-rank adds O(P·R·d) work per batch, not a second knn_cosine).
    Two panel-small windows close it: (adist, n_id) → shortlist ≤ R,
    then (cosine DESC, n_id) → top-K. Both folds are the bit-exact
    left-to-right arithmetic the oracle re-derives.
    """
    import numpy as np

    prepare(spark)
    if cb is None:
        cb = _pq_train(spark, sf_dir)
    if cb is None:  # no full sampled codebook -> empty, oracle-consistent
        return _empty_topk(spark, sf_dir, "cosine")
    panel = sorted(
        (int(r["vec_id"]), r["v"])
        for r in _pq_normalized(spark, sf_dir)
        .filter(F.expr(BOUNDED_PANEL_SQL))
        .select("vec_id", "v")
        .collect()  # bounded eval set (fixed id range), never corpus-scale
    )
    qids = np.asarray([q for q, _ in panel], dtype=np.int64)
    QV = np.asarray([v for _, v in panel], dtype=np.float64)
    P = len(qids)
    lut = np.empty((P, PQ_M, PQ_K), dtype=np.float64)
    for m in range(PQ_M):
        for k in range(PQ_K):
            lut[:, m, k] = _pq_subdists(QV, cb, m, k)

    probe = None
    cents = None
    if nprobe is not None:
        cents = np.asarray(_ivf_train_np(spark, sf_dir), dtype=np.float64)
        qdots = np.empty((P, IVF_K), dtype=np.float64)
        for c in range(IVF_K):
            acc = cents[c, 0] * QV[:, 0]
            for d in range(1, DIM):
                acc = acc + cents[c, d] * QV[:, d]
            qdots[:, c] = acc
        probe = np.zeros((P, IVF_K), dtype=bool)
        for p in range(P):
            order = sorted(range(IVF_K), key=lambda c: (-qdots[p, c], c))
            probe[p, order[:nprobe]] = True

    def _pass(it):
        import pandas as pd

        for pdf in it:
            pdf = pdf[
                pdf["v"].map(lambda x: x is not None and len(x) == DIM).to_numpy()
            ]
            n = len(pdf)
            if n == 0 or P == 0:
                continue
            U = _pq_unit(
                np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            )
            ids = pdf["vec_id"].to_numpy()
            codes, _ = _pq_assign(U, cb)
            A = lut[:, 0, codes[:, 0]]
            for m in range(1, PQ_M):
                A = A + lut[:, m, codes[:, m]]  # m-ascending, matches oracle
            if probe is not None:
                # FIRST argmax cell (strict > scanning ascending) — the
                # oracle's list_position(dots, list_max(dots)).
                dots = np.empty((n, IVF_K), dtype=np.float64)
                for c in range(IVF_K):
                    acc = cents[c, 0] * U[:, 0]
                    for d in range(1, DIM):
                        acc = acc + cents[c, d] * U[:, d]
                    dots[:, c] = acc
                cell = np.zeros(n, dtype=np.int64)
                best = dots[:, 0]
                for c in range(1, IVF_K):
                    gt = dots[:, c] > best
                    best = np.where(gt, dots[:, c], best)
                    cell = np.where(gt, c, cell)
                A = np.where(probe[:, cell], A, np.inf)
            A = np.where(ids[None, :] == qids[:, None], np.inf, A)
            kth = min(R - 1, n - 1)
            th = np.partition(A, kth, axis=1)[:, kth]
            keep = A <= th[:, None]  # superset: ALL ties at the kth adist
            qi, ni = np.nonzero(keep)
            a = A[qi, ni]
            fin = np.isfinite(a)
            qi, ni, a = qi[fin], ni[fin], a[fin]
            if len(qi) == 0:
                continue
            # Exact cosine ONLY for kept pairs — per-pair left-to-right
            # fold (bit-identical to _dot_sql), vectorized across pairs.
            Rq = QV[qi]
            Ru = U[ni]
            acc = Rq[:, 0] * Ru[:, 0]
            for d in range(1, DIM):
                acc = acc + Rq[:, d] * Ru[:, d]
            yield pd.DataFrame(
                {
                    "q_id": qids[qi],
                    "n_id": ids[ni],
                    "adist": a,
                    "c_raw": acc,
                }
            )

    local = _pq_raw(spark, sf_dir).mapInPandas(
        _pass, "q_id bigint, n_id bigint, adist double, c_raw double"
    )
    wa = Window.partitionBy("q_id").orderBy("adist", "n_id")
    short = (
        local.withColumn("rnk_adc", F.row_number().over(wa))
        .filter(F.col("rnk_adc") <= R)
        .select("q_id", "n_id", F.round(F.col("c_raw"), 6).alias("cosine"))
    )
    wc = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        short.withColumn("rnk", F.row_number().over(wc))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "cosine", "rnk")
    )


@query("knn_pq_rerank", _rerank_sql(RERANK_R))
def knn_pq_rerank(spark: SparkSession, sf_dir: str, cb=None) -> DataFrame:
    """X3 SERVABLE ANN: ADC top-R shortlist + exact re-rank (oracle-backed).

    knn_pq's ADC scores are quantized (recall@10 0.28 at sf0.01); this
    key re-ranks the ADC top-RERANK_R superset with exact unit-vector
    dots and emits cosine top-K — measured recall@10 at sf0.01: 0.92
    (pinned per-round by knn_recall_rerank). The production PQ serving
    recipe (shortlist-then-refine) with every stage hash-checked.

    Scale: one corpus pass (encode + ADC + pairwise exact fold on the
    kept superset only), two panel-small windows. The re-rank adds
    O(P·R·d) arithmetic per batch on top of knn_pq — corpus-linear,
    panel-bounded, no (P, n) table, no second corpus scan.
    """
    return _adc_rerank(spark, sf_dir, cb, RERANK_R)


@query("knn_ivfadc_rerank", _rerank_sql(RERANK_R_IVF, nprobe=RERANK_NPROBE))
def knn_ivfadc_rerank(spark: SparkSession, sf_dir: str, cb=None) -> DataFrame:
    """X3 SERVABLE ANN: IVF cell pruning + ADC shortlist + exact re-rank.

    The full production IVFADC serving path: probe the RERANK_NPROBE
    nearest coarse cells, ADC-score only their members, keep the top
    RERANK_R_IVF shortlist, re-rank with exact dots. Measured recall@10
    at sf0.01: 0.92 (vs 0.16 for raw knn_ivfadc) — the probe/recall
    trade is explicit: 12/16 cells probed; a production deployment
    raises IVF_K so the same recall costs a smaller probe fraction
    (nprobe/IVF_K is the knob, the plan shape is unchanged).
    """
    return _adc_rerank(
        spark, sf_dir, cb, RERANK_R_IVF, nprobe=RERANK_NPROBE
    )


def _knn_recall_rerank_sql() -> str:
    """Oracle for knn_recall_rerank: re-derive BOTH re-ranked arms and
    the exact arm end-to-end, overlap-count them (the knn_recall_pq
    audit shape at the re-rank rungs). Bounded panel → linear."""
    pq_arm = _rerank_sql(RERANK_R)
    ivf_arm = _rerank_sql(RERANK_R_IVF, nprobe=RERANK_NPROBE)
    return f"""
    WITH pqr AS MATERIALIZED ({pq_arm}),
    ivfr AS MATERIALIZED ({ivf_arm}),
    e AS ({NORM_EMB_SQL}),
    q AS (SELECT vec_id AS q_id, u AS qu FROM e
          WHERE {BOUNDED_PANEL_SQL}),
    exsc AS (
        SELECT q.q_id, e2.vec_id AS n_id,
               round({_dot_sql('q.qu', 'e2.u')}, 6) AS cosine
        FROM q JOIN e e2 ON e2.vec_id <> q.q_id),
    ex AS MATERIALIZED (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rnk
            FROM exsc)
        WHERE rnk <= {TOP_K}),
    exs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
                   CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries
            FROM ex),
    hits AS (
        SELECT 'pq_rerank' AS method, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM pqr JOIN ex USING (q_id, n_id)
        UNION ALL
        SELECT 'ivfadc_rerank', CAST(COUNT(*) AS BIGINT)
        FROM ivfr JOIN ex USING (q_id, n_id)
    )
    SELECT method, n_queries, n_exact, n_hits,
           CAST(n_hits AS DOUBLE) / n_exact AS recall
    FROM hits, exs
    -- empty/truncated-corpus degrade: Spark returns an EMPTY frame when
    -- no full codebook exists; mirror it (the knn_recall_pq gate).
    WHERE (SELECT COUNT(*) FROM pqr) + (SELECT COUNT(*) FROM ivfr) > 0
    """


@query("knn_recall_rerank", _knn_recall_rerank_sql())
def knn_recall_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 quality gate for the r13 re-rank rungs: recall@k of
    knn_pq_rerank / knn_ivfadc_rerank vs the exact bounded-panel
    baseline — the knn_recall_pq audit extended up the ladder, so the
    SERVABLE recall (≥0.9 by design) is a per-round driver-stamped
    measurement. Linear: bounded panel, both arms are the keys' own
    corpus-linear plans, exact arm is panel×corpus.
    """
    prepare(spark)
    ex = (
        knn_cosine(spark, sf_dir, panel=BOUNDED_PANEL_SQL)
        .select("q_id", "n_id")
        .localCheckpoint()
    )
    exs = ex.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count_distinct("q_id").alias("n_queries"),
    )

    def hits(approx: DataFrame, method: str) -> DataFrame:
        return (
            approx.select("q_id", "n_id")
            .join(ex, ["q_id", "n_id"], "left_semi")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(F.lit(method).alias("method"), "n_hits")
        )

    cb = _pq_train(spark, sf_dir)  # train once, share across both arms
    if cb is None:  # empty/truncated corpus -> no arms, empty frame
        return _empty_topk(spark, sf_dir, "adist").selectExpr(
            "cast(null as string) as method",
            "cast(null as bigint) as n_queries",
            "cast(null as bigint) as n_exact",
            "cast(null as bigint) as n_hits",
            "cast(null as double) as recall",
        )
    res = hits(knn_pq_rerank(spark, sf_dir, cb=cb), "pq_rerank").unionByName(
        hits(knn_ivfadc_rerank(spark, sf_dir, cb=cb), "ivfadc_rerank")
    )
    return res.crossJoin(F.broadcast(exs)).select(
        "method",
        "n_queries",
        "n_exact",
        "n_hits",
        (F.col("n_hits").cast("double") / F.col("n_exact")).alias("recall"),
    )


# --------------------------------------------------------------------------
# knn_ivf_indexed (r13) — the materialized form of the layout note every
# IVF docstring above makes: "at 100 TB the index build writes parquet
# PARTITIONED BY cell, so probing prunes IO as well as compute". This key
# actually builds that index and serves from it.

#: Per-PROCESS tag for the materialized index directory: two sessions on
#: the same fixture tag (pytest + bench — the r11 flaky-parity scenario)
#: must never race an overwrite against a read-back of the same path.
#: Within one process, reruns serialize on the same path (overwrite mode
#: is safe there), so tests that rebuild then inspect stay deterministic.
_IVF_INDEX_RUN = __import__("uuid").uuid4().hex[:12]


def ivf_index_path(sf_dir: str) -> str:
    """Run-unique scratch path for the materialized IVF index."""
    from ls_hadoop_3_0_spark.sources.io import scratch

    return scratch(sf_dir, f"ivf_index_{_IVF_INDEX_RUN}")


def _cdots_np(cents, U):
    """(n, IVF_K) centroid dot table — the exact left-to-right fold."""
    import numpy as np

    out = np.empty((len(U), IVF_K), dtype=np.float64)
    for c in range(IVF_K):
        acc = cents[c, 0] * U[:, 0]
        for d in range(1, DIM):
            acc = acc + cents[c, d] * U[:, d]
        out[:, c] = acc
    return out


def _ivf_index_build(
    spark: SparkSession,
    sf_dir: str,
    cents,
    *,
    pred: str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> str:
    """One pass over the (optionally ``pred``-sliced) corpus: assign
    each vector its coarse cell (the knn_ivf numpy fold — bit-identical
    to the oracle's argmax) and write (vec_id, label, u) parquet
    PARTITIONED BY cell at ``path`` (default: the per-process serving
    index dir). Returns the path. label rides along so filtered serving
    (knn_ivf_filtered) can push a metadata predicate into the same
    scan; unfiltered consumers prune the column away via their declared
    read schema. ``mode="append"`` is the r15 increment write: new
    files land only in the touched cell directories."""
    import numpy as np

    from ls_hadoop_3_0_spark.sources.io import run_scratch

    if path is None:
        # registers the uuid dir for atexit cleanup + prunes hard-killed
        # processes' stale siblings (ADVICE r14)
        path = run_scratch(
            sf_dir, f"ivf_index_{_IVF_INDEX_RUN}", stem="ivf_index_"
        )

    def _build(it):
        import pandas as pd

        for pdf in it:
            pdf = pdf[
                pdf["v"].map(lambda x: x is not None and len(x) == DIM).to_numpy()
            ]
            if len(pdf) == 0:
                continue
            U = _pq_unit(
                np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            )
            dots = _cdots_np(cents, U)
            # FIRST argmax (strict > scanning ascending) — the oracle's
            # list_position(dots, list_max(dots)).
            cell = np.zeros(len(U), dtype=np.int64)
            best = dots[:, 0]
            for c in range(1, IVF_K):
                gt = dots[:, c] > best
                best = np.where(gt, dots[:, c], best)
                cell = np.where(gt, c, cell)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "label": pdf["label"].to_numpy(),
                    "u": list(U),
                    "cell": cell.astype(np.int32),
                }
            )

    src = _pq_raw(spark, sf_dir).select("vec_id", "label", "v")
    if pred is not None:
        src = src.filter(F.expr(pred))
    index = src.mapInPandas(
        _build, "vec_id bigint, label int, u array<double>, cell int"
    )
    index.write.mode(mode).partitionBy("cell").parquet(path)
    return path


def _ivf_index_serve(
    spark: SparkSession,
    sf_dir: str,
    cents,
    nprobe: int = IVF_NPROBE,
    label_min: int | None = None,
    path: str | None = None,
) -> DataFrame:
    """Probe the materialized index: the bounded panel's nprobe-cell set
    becomes a PARTITION filter (unprobed directories are never listed
    into the scan) and ``label_min`` a parquet-PUSHED row-group filter —
    predicate ∧ top-k composes at the scan, before any python.
    ``path`` (r15) serves from an alternative index dir (the compact
    key's rolled epoch)."""
    import numpy as np

    if path is None:
        path = ivf_index_path(sf_dir)
    panel_rows = sorted(
        (int(r["vec_id"]), r["u"])
        for r in normalized_embeddings(load(spark, sf_dir, "embeddings"))
        .filter(F.expr(BOUNDED_PANEL_SQL))
        .select("vec_id", "u")
        .collect()  # bounded fixed-id eval set
    )
    qids = np.asarray([q for q, _ in panel_rows], dtype=np.int64)
    QU = np.asarray([u for _, u in panel_rows], dtype=np.float64)
    P = len(qids)
    probed: list[int] = []
    probe = np.zeros((P, IVF_K), dtype=bool)
    if P:
        qdots = _cdots_np(cents, QU)
        for p in range(P):
            order = sorted(range(IVF_K), key=lambda c: (-qdots[p, c], c))
            probe[p, order[:nprobe]] = True
        probed = sorted(int(c) for c in np.nonzero(probe.any(axis=0))[0])

    # Partition-pruned read-back: cell IN (probed) is a PartitionFilter —
    # unprobed directories are never listed into the scan. The label
    # predicate sits on the same scan (parquet row-group pushdown),
    # BEFORE the mapInPandas barrier.
    cols = "vec_id long, u array<double>, cell int"
    if label_min is not None:
        cols = "vec_id long, label int, u array<double>, cell int"
    back = spark.read.schema(cols).parquet(path)
    pruned = back.filter(F.col("cell").isin(probed) if probed else F.lit(False))
    if label_min is not None:
        pruned = pruned.filter(F.col("label") >= label_min).drop("label")

    def _score(it):
        import pandas as pd

        for pdf in it:
            n = len(pdf)
            if n == 0 or P == 0:
                continue
            U = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["u"]])
            ids = pdf["vec_id"].to_numpy()
            cell = pdf["cell"].to_numpy()
            A = _dot_fold_np(QU, U)
            A = np.where(probe[:, cell], A, -np.inf)
            A = np.where(ids[None, :] == qids[:, None], -np.inf, A)
            kth = n - TOP_K
            if kth > 0:
                th = np.partition(A, kth, axis=1)[:, kth]
            else:
                th = np.full(P, -np.inf)
            keep = A >= (th[:, None] - 2e-6)  # the rounding-quantum margin
            qi, ni = np.nonzero(keep)
            a = A[qi, ni]
            fin = np.isfinite(a)
            yield pd.DataFrame(
                {"q_id": qids[qi[fin]], "n_id": ids[ni[fin]], "c_raw": a[fin]}
            )

    local = pruned.mapInPandas(_score, "q_id bigint, n_id bigint, c_raw double")
    scored = local.select(
        "q_id", "n_id", F.round(F.col("c_raw"), 6).alias("cosine")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "n_id", "cosine", "rnk")
    )


@query("knn_ivf_indexed", _knn_ivf_sql())
def knn_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 IVF ANN served from a MATERIALIZED on-disk inverted index.

    Build: one corpus pass assigns every vector its coarse cell (the
    knn_ivf numpy fold — bit-identical to the oracle's argmax) and
    writes (vec_id, label, u) parquet PARTITIONED BY cell. Serve: the
    bounded query panel probes its IVF_NPROBE nearest cells and reads
    ONLY the probed partitions back — ``cell IN (...)`` is a partition
    filter, so Spark prunes the unprobed directories at PLANNING time:
    the scan does ~nprobe/IVF_K of the IO, not just of the compute
    (tests/test_r13_keys.py pins PartitionFilters + the pruned
    inputFiles set). Scoring is the exact knn_ivf arithmetic on the
    read-back unit vectors (parquet round-trips doubles exactly), so
    the key shares knn_ivf's oracle verbatim — the index is a layout,
    not a new semantics.

    This is the serving shape the transient keys cannot show: an index
    built once and probed many times, where per-query cost is bounded
    by partition pruning rather than a full corpus scan.
    """
    import numpy as np

    prepare(spark)
    cents = np.asarray(_ivf_train_np(spark, sf_dir), dtype=np.float64)
    _ivf_index_build(spark, sf_dir, cents)
    return _ivf_index_serve(spark, sf_dir, cents)


#: Filtered-serving constants (r14, VERDICT r13 missing #2): real
#: retrieval carries a metadata predicate (lang/source/date — here the
#: label column). Filtered serving probes 2x the cells: the predicate
#: thins every cell's candidate list, so widening the probe set restores
#: shortlist depth (the standard FAISS/vector-store selectivity
#: compensation). label >= 5 selects ~half the fixture corpus AND is a
#: range predicate parquet row-group stats can prune on (a modulo
#: predicate would compute, not push).
IVF_NPROBE_FILTERED = 2 * IVF_NPROBE
IVF_FILTER_LABEL_MIN = 5


@query(
    "knn_ivf_filtered",
    _knn_ivf_sql(
        cand_pred=f"idxc.label >= {IVF_FILTER_LABEL_MIN}",
        nprobe=IVF_NPROBE_FILTERED,
    ),
)
def knn_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 FILTERED ANN serving: metadata predicate ∧ top-k over the
    materialized cell index — the rung real retrieval runs (every
    production query carries a lang/source/date filter).

    Same index, same exact arithmetic as knn_ivf_indexed; the label
    predicate composes with the partition pruning AT THE SCAN
    (PartitionFilters on cell + PushedFilters GreaterThanOrEqual on
    label — proven over executed rows in tests/test_r14_keys.py), and
    the probe set is selectivity-compensated (IVF_NPROBE_FILTERED).
    Recall vs the exact FILTERED ground truth is stamped per-round by
    knn_recall_filtered.
    """
    import numpy as np

    prepare(spark)
    cents = np.asarray(_ivf_train_np(spark, sf_dir), dtype=np.float64)
    _ivf_index_build(spark, sf_dir, cents)
    return _ivf_index_serve(
        spark,
        sf_dir,
        cents,
        nprobe=IVF_NPROBE_FILTERED,
        label_min=IVF_FILTER_LABEL_MIN,
    )


def _knn_recall_filtered_sql() -> str:
    """Oracle for knn_recall_filtered: the filtered-IVF chain and the
    exact FILTERED ground truth (brute force over label-filtered
    candidates), overlap-counted — the knn_recall_rerank shape at the
    filtered rung. Bounded panel → linear."""
    ivf_arm = _knn_ivf_sql(
        cand_pred=f"idxc.label >= {IVF_FILTER_LABEL_MIN}",
        nprobe=IVF_NPROBE_FILTERED,
    )
    return f"""
    WITH ivfr AS MATERIALIZED ({ivf_arm}),
    e AS ({NORM_EMB_SQL}),
    q AS (SELECT vec_id AS q_id, u AS qu FROM e
          WHERE {BOUNDED_PANEL_SQL}),
    exsc AS (
        SELECT q.q_id, e2.vec_id AS n_id,
               round({_dot_sql('q.qu', 'e2.u')}, 6) AS cosine
        FROM q JOIN e e2
          ON e2.vec_id <> q.q_id AND e2.label >= {IVF_FILTER_LABEL_MIN}),
    ex AS MATERIALIZED (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, n_id) AS rnk
            FROM exsc)
        WHERE rnk <= {TOP_K}),
    exs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
                   CAST(COUNT(DISTINCT q_id) AS BIGINT) AS n_queries
            FROM ex),
    hits AS (
        SELECT 'ivf_filtered' AS method, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM ivfr JOIN ex USING (q_id, n_id)
    )
    SELECT method, n_queries, n_exact, n_hits,
           CAST(n_hits AS DOUBLE) / n_exact AS recall
    FROM hits, exs
    WHERE n_exact > 0
    """


@query("knn_recall_filtered", _knn_recall_filtered_sql())
def knn_recall_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 quality gate for filtered serving: recall@k of
    knn_ivf_filtered vs the exact FILTERED ground truth (brute-force
    cosine over label-filtered candidates — the knn_cosine body with
    the candidate predicate pushed into its corpus stream). Bounded
    panel, both arms corpus-linear."""
    prepare(spark)
    ex = (
        knn_cosine(
            spark,
            sf_dir,
            panel=BOUNDED_PANEL_SQL,
            cand_label_min=IVF_FILTER_LABEL_MIN,
        )
        .select("q_id", "n_id")
        .localCheckpoint()
    )
    exs = ex.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.count_distinct("q_id").alias("n_queries"),
    )
    hits = (
        knn_ivf_filtered(spark, sf_dir)
        .select("q_id", "n_id")
        .join(ex, ["q_id", "n_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.lit("ivf_filtered").alias("method"), "n_hits")
    )
    return (
        hits.crossJoin(F.broadcast(exs))
        .filter(F.col("n_exact") > 0)
        .select(
            "method",
            "n_queries",
            "n_exact",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_exact")).alias("recall"),
        )
    )


# --------------------------------------------------------------------------
# knn_index_compact (r15, VERDICT r14 #1): the ANN-index epoch roll — the
# vector twin of dedup_index_compact. A NEW id-slice of vectors merges
# into the materialized cell-partitioned IVF index WITHOUT a full
# rebuild: prior cell files are snapshotted by hardlink (a metadata-only
# manifest operation — exactly how table formats like Iceberg/Delta roll
# snapshots: the new epoch references the old files and adds the
# increment's), and only the new slice pays normalization + assignment +
# write. The quantizer is FROZEN from the prior epoch (trained on the
# prior slice only), as production IVF maintenance requires — re-training
# would re-assign the whole corpus and make "merge" meaningless.

#: Prior/new split for the vector-index lifecycle keys (the
#: dedup_incremental convention applied to vec_id).
IVF_INCR_PRIOR_PRED = "vec_id % 10 < 8"
IVF_INCR_NEW_PRED = "vec_id % 10 >= 8"

#: tag -> (prior index path, frozen prior-trained centroids). FROZEN by
#: contract: built once per process, merged against many times.
_IVF_COMPACT_PRIOR: dict[str, tuple[str, object]] = {}
#: tag -> the previous call's rolled-epoch dir (pruned on the next call
#: so repeated bench runs hold at most one live epoch besides the prior).
_IVF_COMPACT_LAST: dict[str, str] = {}


def _link_tree(src: str, dst: str) -> None:
    """Hardlink every data file of a partitioned parquet dir into dst,
    preserving the cell=N layout. Metadata-only (no bytes copied) — the
    snapshot-manifest operation of the epoch roll."""
    import os

    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        troot = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(troot, exist_ok=True)
        for f in files:
            if f.startswith(("_", ".")):
                continue  # _SUCCESS / checksum side files
            os.link(os.path.join(root, f), os.path.join(troot, f))


def _ivf_compact_prior(spark: SparkSession, sf_dir: str):
    """(prior index path, frozen centroids) — built once per process."""
    import os

    import numpy as np

    from ls_hadoop_3_0_spark.sources.io import run_scratch

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    if tag in _IVF_COMPACT_PRIOR:
        from ls_hadoop_3_0_spark.sources.io import touch_heartbeat

        touch_heartbeat(_IVF_COMPACT_PRIOR[tag][0])  # prune-safety
        return _IVF_COMPACT_PRIOR[tag]
    cents = np.asarray(
        _ivf_train_np(spark, sf_dir, pred=IVF_INCR_PRIOR_PRED),
        dtype=np.float64,
    )
    path = run_scratch(
        sf_dir, f"ivf_prior_{tag}_{_IVF_INDEX_RUN}", stem=f"ivf_prior_{tag}_"
    )
    _ivf_index_build(
        spark, sf_dir, cents, pred=IVF_INCR_PRIOR_PRED, path=path
    )
    _IVF_COMPACT_PRIOR[tag] = (path, cents)
    return path, cents


def _knn_index_compact_sql() -> str:
    """Oracle: the rolled epoch's contents derived INDEPENDENTLY — the
    FULL corpus (prior ∪ new = all embeddings) assigned under the
    prior-slice-trained quantizer, digested; plus the serving chain
    probed against that same full index (proving the written unit
    vectors end-to-end, not just the id/cell assignment)."""
    from ls_hadoop_3_0_spark.operators.sort import _u24_expr

    asg_row = "CAST(vec_id AS VARCHAR) || ':' || CAST(cell AS VARCHAR)"
    srv_row = (
        "CAST(q_id AS VARCHAR) || ':' || CAST(n_id AS VARCHAR) || ':' ||"
        " CAST(CAST(round(cosine * 1e6) AS BIGINT) AS VARCHAR) || ':' ||"
        " CAST(rnk AS VARCHAR)"
    )
    return f"""
    WITH {_ivf_idx_ctes(train_pred=IVF_INCR_PRIOR_PRED)},
    {_ivf_serve_ctes()},
    ia AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM({_u24_expr(asg_row)}) AS BIGINT) AS asg_u24
        FROM idxc
    ),
    sa AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM({_u24_expr(srv_row)}) AS BIGINT) AS serve_u24
        FROM srv
    )
    SELECT n_rows, asg_u24, n_pairs, serve_u24 FROM ia, sa
    """


@query("knn_index_compact", _knn_index_compact_sql())
def knn_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3-EXT ANN-index epoch roll: merge the NEW vector slice into the
    materialized cell-partitioned IVF index without a full rebuild —
    the maintenance operation that makes the serving index a lifecycle
    (the dedup_index_compact recipe applied to knn_ivf_indexed's
    layout).

    Mechanics: the prior index (vec_id % 10 < 8, quantizer FROZEN —
    trained on the prior slice only) is built once per process; each
    roll (a) snapshots the prior cell files into the next epoch dir by
    HARDLINK — a metadata-only manifest operation, no prior bytes are
    read or rewritten, the Iceberg/Delta snapshot shape — and (b)
    assigns + appends ONLY the new slice (vec_id % 10 >= 8), whose
    files land in exactly the touched cell directories. The prior
    corpus is never re-normalized, re-assigned, or re-scanned
    (tests/test_r15_keys.py pins: one embeddings scan in the merge
    plan, prior data files byte-identical across the roll).

    The digest is computed FROM THE WRITTEN epoch (read-back of the
    rolled dir), and the serving chain then probes that same epoch —
    partition-pruned, same exact arithmetic as knn_ivf_indexed — so the
    compared values prove both the on-disk artifact and its
    serveability. The oracle re-derives everything independently from
    the full corpus under the same frozen quantizer: a missed or
    duplicated vector, a wrong cell, or a corrupted unit vector all
    diverge the digests.

    At 100 TB the steady state pays increment-scale compute + IO plus
    O(#files) metadata; only the one-time prior build pays corpus
    scale (SCALE.md r15 rows).
    """
    import os
    import shutil
    import uuid as _uuid

    from ls_hadoop_3_0_spark.operators.sort import _u24_expr
    from ls_hadoop_3_0_spark.sources.io import run_scratch

    prepare(spark)
    prior_path, cents = _ivf_compact_prior(spark, sf_dir)

    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    prev = _IVF_COMPACT_LAST.pop(tag, None)
    if prev:
        shutil.rmtree(prev, ignore_errors=True)
    next_path = run_scratch(
        sf_dir,
        f"ivf_next_{tag}_{_uuid.uuid4().hex[:12]}",
        stem=f"ivf_next_{tag}_",
    )
    _link_tree(prior_path, next_path)
    _ivf_index_build(
        spark,
        sf_dir,
        cents,
        pred=IVF_INCR_NEW_PRED,
        path=next_path,
        mode="append",
    )
    _IVF_COMPACT_LAST[tag] = next_path

    back = spark.read.schema(
        "vec_id long, label int, u array<double>, cell int"
    ).parquet(next_path)
    asg_u24 = F.expr(
        _u24_expr("concat(cast(vec_id as string), ':', cast(cell as string))")
    )
    ia = back.agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum(asg_u24).alias("asg_u24")
    )
    srv = _ivf_index_serve(spark, sf_dir, cents, path=next_path)
    srv_u24 = F.expr(
        _u24_expr(
            "concat(cast(q_id as string), ':', cast(n_id as string), ':',"
            " cast(cast(round(cosine * 1e6) as bigint) as string), ':',"
            " cast(rnk as string))"
        )
    )
    sa = srv.agg(
        F.count(F.lit(1)).alias("n_pairs"), F.sum(srv_u24).alias("serve_u24")
    )
    return ia.crossJoin(sa)
