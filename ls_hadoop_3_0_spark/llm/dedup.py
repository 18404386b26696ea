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

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.llm.embeddings import (
    N_PLANES,
    lsh_bucket_sql,
    lsh_bucketed,
    normalized_embeddings,  # noqa: F401  (re-export: tests + callers)
    normalized_embeddings_np,
    probe_signatures,
    probe_signatures_sql,
)
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load, spread

N_HASHES = 12
N_BANDS = 4
ROWS_PER_BAND = 3
MINHASH_JACCARD_T = 0.4
NGRAM_JACCARD_T = 0.2
EMB_COSINE_T = 0.4

#: Integer-feasibility coefficients for the dedup_recall_v2 cap guard,
#: DERIVED from MINHASH_JACCARD_T (ADVICE r10): with T = p/q,
#: J ≥ T ⟺ ns/(np+nd-ns) ≥ p/q ⟺ (p+q)·ns ≥ p·(np+nd). At T = 2/5
#: that is the 7·ns ≥ 2·(np+nd) form; changing the threshold constant
#: now re-derives the guard instead of silently auditing against 0.4.
from fractions import Fraction as _Fraction  # noqa: E402

_JT_FRAC = _Fraction(MINHASH_JACCARD_T).limit_denominator(1000)
CAP_GUARD_NS_COEF = _JT_FRAC.numerator + _JT_FRAC.denominator  # 7 at T=2/5
CAP_GUARD_SZ_COEF = _JT_FRAC.numerator  # 2 at T=2/5


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
        spread(load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet", min_rows_per_split=2_000)
        .groupBy(F.md5(F.lower(F.trim("text"))).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingled(docs: DataFrame) -> DataFrame:
    """doc_id + distinct word-3-shingles (docs with ≥3 tokens).

    Parallelism guard: text compresses so well that a corpus can arrive
    as a handful of parquet splits (the 100× replica is 500 k docs in a
    4.5 MB file → a 2-task scan), and everything expensive in the dedup
    family — shingling, the 12-hash md5 partial-min aggregation — is
    MAP-SIDE work that inherits scan parallelism. Re-split to the
    cluster's parallelism ONLY when the source under-splits; on a real
    many-file 100 TB corpus the scan already has thousands of splits
    and this is a no-op (no gratuitous corpus shuffle at scale).
    """
    docs = spread(docs)
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


def sh_sql(src: str = "documents") -> str:
    """DuckDB shingling subquery over ``src`` (a view or CTE name)."""
    return f"""
    SELECT doc_id,
           list_distinct(list_transform(generate_series(1, len(w) - 2),
               i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS shingles
    FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
          FROM {src})
    WHERE len(w) >= 3
"""


_SH_SQL = sh_sql("documents")


def minhash_candidates_cte() -> str:
    """DuckDB CTE chain ``mh``/``bands``/``cand`` over an existing ``sh``
    CTE — the LSH candidate stage alone (shared by minhash_pairs_sql and
    the dedup_recall quality gate)."""
    return f"""
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
    )"""


def minhash_pairs_sql(src: str = "documents") -> str:
    """DuckDB mirror of minhash_pairs() over ``src``."""
    return f"""
    WITH sh AS ({sh_sql(src)}),
    {minhash_candidates_cte()}
    SELECT cand.doc_a, cand.doc_b,
           round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
               AS jaccard
    FROM cand
    JOIN sh sa ON sa.doc_id = cand.doc_a
    JOIN sh sb ON sb.doc_id = cand.doc_b
    WHERE jaccard >= {MINHASH_JACCARD_T}
    """


DEDUP_MINHASH_SQL = minhash_pairs_sql("documents")


@query(
    "dedup_class_stats",
    f"""
    WITH sh AS ({sh_sql('documents')}),
    c AS (
        SELECT list_sort(shingles) AS k, COUNT(*) AS c
        FROM sh GROUP BY 1
    )
    SELECT CAST(SUM(c) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MAX(c) AS BIGINT) AS max_class_size,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
           CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS intra_pairs
    FROM c
    """,
)
def dedup_class_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 exact-class census — the statistic the r10 adaptive class
    collapse (minhash_pairs docstring) keys on, driver-stamped.

    Groups docs by their canonical (sorted) shingle SET and reduces to
    one row: doc/class counts, the largest class, docs inside
    duplicate classes, and the C(class,2) intra pairs the collapse
    spares the verify stage. No cross-engine hash is needed — each
    engine canonicalizes its own sets (Spark sort_array / DuckDB
    list_sort) and only set-identity counts are compared. One
    corpus-scale shuffle keyed on the sorted array (map-side partial
    count first), class-grain from there — the collapse's own cost
    profile, so this key IS its scale audit.
    """
    prepare(spark)
    cls = (
        _shingled(load(spark, sf_dir, "documents"))
        .groupBy(F.sort_array("shingles").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    c = F.col("c")
    return cls.agg(
        F.sum(c).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.max(c).cast("long").alias("max_class_size"),
        F.sum(F.when(c > 1, c).otherwise(F.lit(0))).cast("long").alias("n_dup_docs"),
        # `div` keeps the C(c,2) arithmetic in integers end-to-end
        # (Spark `/` is always DOUBLE; the float-parity rule).
        F.sum(F.expr("c * (c - 1) div 2")).cast("long").alias("intra_pairs"),
    )


#: Adaptive class-collapse cut-over: collapse only when fewer than this
#: fraction of docs have a distinct shingle set (>5% exact duplication).
#: Below it the collapse's fixed extra shuffles cost more than the
#: C(copies,2) verify work they remove (measured both ways at sf0.1 and
#: the 100× replica — minhash_pairs docstring).
DEDUP_CLASS_COLLAPSE_RATIO = 0.95


#: analyzed-plan semanticHash -> duplication verdict. The probe decides
#: only WHICH physically-equivalent plan runs (results are identical on
#: both paths — parity-proven), so a cached verdict can never change an
#: answer; it just skips re-scanning for repeated pipelines (bench
#: min-of-2, dedup_apply after dedup_minhash, multi-stage curation).
_DUP_PROBE_CACHE: dict[int, bool] = {}


def _probe_material(df: DataFrame, distinct_agg: F.Column) -> bool:
    """True when exact duplication (count vs ``distinct_agg``'s HLL
    estimate) is worth a class collapse. Cached per analyzed-plan
    semanticHash — see _DUP_PROBE_CACHE; the cache-hit contract is
    pinned by tests/test_r11_keys.py::test_probe_cache_hits_on_repeated_plan
    so a PySpark private-API change fails a test instead of silently
    degrading every probe to a re-scan.

    NEGATIVE RESULT (r11, the r10-verdict sample-the-probe item): a
    ~1.6% content-keyed sample (filter on xxhash64 of the same content
    the HLL counts, with dead-band fallback to this exact scan) was
    built and measured STRICTLY worse at the 100× replica — 0.58 s vs
    0.43 s min-of-2. The sample predicate must still read and hash
    every content value (id- or file-keyed sampling splits duplicate
    classes and biases the ratio toward 1.0), so both paths are
    scan-bound and sampling only adds a second hash plus a filter; the
    exact probe is already ~2% of the 15-34 s jobs it gates. Reverted —
    do not re-try (SCALE.md r11).
    """
    try:
        key = df._jdf.queryExecution().analyzed().semanticHash()
        cached = _DUP_PROBE_CACHE.get(key)
        if cached is not None:
            return cached
    except Exception:  # noqa: BLE001 - private API drift: probe uncached
        key = None
    row = df.agg(
        F.count(F.lit(1)).alias("n"), distinct_agg.alias("d")
    ).collect()[0]
    verdict = row["d"] <= DEDUP_CLASS_COLLAPSE_RATIO * row["n"]
    if key is not None:
        _DUP_PROBE_CACHE[key] = verdict
    return verdict


def _dup_ratio_material(docs: DataFrame) -> bool:
    """True when exact duplication is worth a class collapse.

    One cheap corpus scan: count + HLL distinct over raw ``text``
    (no tokenize/shingle — the shingle pipeline is exactly what the
    probe gates; HLL merge is order-insensitive, so the estimate is
    deterministic under any partitioning — the r9 mergeability gate).
    Text equality implies shingle-set equality, so this under-detects
    set-level duplication — conservative: the miss costs speed on an
    exotic corpus, never correctness. Sampling this probe is a measured
    negative result — see _probe_material.
    """
    return _probe_material(docs, F.approx_count_distinct("text", 0.02))


def _verify_pairs(
    sh: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    """Exact array-Jaccard verify of candidate pairs against ``sh``."""
    sa = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    ).hint("shuffle_hash")
    sb = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    ).hint("shuffle_hash")
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")),
        6,
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_pairs(docs: DataFrame, threshold: float = MINHASH_JACCARD_T) -> DataFrame:
    """MinHash-LSH near-dup pairs over a documents-shaped DataFrame.

    Signatures are computed by exploding distinct shingles and taking
    ``min(md5(seed:shingle))`` per seed as 12 parallel aggregates — the
    min is combined map-side before the shuffle (the MR combiner shape),
    and every expression is codegen'd (no interpreted lambda per
    element, unlike the array-HOF formulation — ~2× faster, and at
    100 TB the partial-min keeps the shuffle at |docs|×12 hex strings
    regardless of document length).

    r10 ADAPTIVE EXACT-CLASS COLLAPSE (the dedup family's 100× tail
    cut): docs with identical shingle SETS are interchangeable for
    every stage — signatures, band collisions, and Jaccard are
    set-determined — so when exact duplication is material the LSH +
    verify pipeline runs on one REPRESENTATIVE per class (r11: min
    doc_id per md5(text) — text equality implies shingle-set equality,
    and the map-side key spares the corpus-scale shingle explode the
    r10 sorted-shingle key paid) and member pairs are EXPANDED
    afterward: intra-class pairs are J = 1.0 by identity (emitted by
    an output-bound member self-join, never verified per-pair),
    inter-class pairs inherit their class pair's verified jaccard
    through two member joins. This is the standard 100 TB pipeline
    shape (exact-dedup before fuzzy): candidate+verify work drops with
    the SQUARE of copy multiplicity. The choice is a measured, exact
    probe (count vs count-distinct class keys — integer scalars, the
    driver-side-literal rule), because on a dup-free corpus the
    collapse's extra member/expansion shuffles only ADD fixed latency
    (measured at sf0.1, 4992/5000 distinct: 2.93 s collapsed vs
    1.37 s direct) while on the 100× replica (1% distinct) the direct
    pipeline pays C(copies,2) per class. Semantics are EXACTLY the
    original's on both paths — a class pair collides on a band iff
    its members do (identical signatures) — and the unchanged
    full-formulation DuckDB oracle proves both.

    Verify stage stays ARRAY-grain: the r9-verdict gram-grain form
    (ns from a (pair)-keyed count over the gram stream) was built and
    measured strictly worse — |cand| × avg_shingles rows shuffled
    twice (>590 s vs 136 s at the 100× replica, 2.24 vs 1.37 s at
    sf0.1); arrays ship the same elements packed. Negative result
    recorded in SCALE.md r10.
    """
    member, rep_pairs, valid_reps = _minhash_structure(docs, threshold)
    if member is None:
        return rep_pairs

    # Intra-class expansion: members of one class share a NON-EMPTY
    # shingle set ⇒ identical signatures ⇒ band collision and J = 1.0
    # exactly (round(n/n, 6) — the value the original per-pair verify
    # produced). Empty-shingle docs have NULL signatures and were never
    # candidates; excluding their class preserves that.
    mx, my = member.alias("mx"), member.alias("my")
    intra = (
        mx.join(my, "rep")
        .filter(F.col("mx.doc_id") < F.col("my.doc_id"))
        .join(valid_reps, "rep", "semi")
        .select(
            F.col("mx.doc_id").alias("doc_a"),
            F.col("my.doc_id").alias("doc_b"),
            F.lit(1.0).alias("jaccard"),
        )
        .filter(F.lit(1.0) >= F.lit(threshold))
    )
    # Inter-class expansion: every (member of A) × (member of B) pair
    # inherits the verified class jaccard — output-bound joins.
    inter = (
        rep_pairs.join(
            member.select(
                F.col("rep").alias("doc_a"), F.col("doc_id").alias("ma")
            ).hint("shuffle_hash"),
            "doc_a",
        )
        .join(
            member.select(
                F.col("rep").alias("doc_b"), F.col("doc_id").alias("mb")
            ).hint("shuffle_hash"),
            "doc_b",
        )
        .select(
            F.least("ma", "mb").alias("doc_a"),
            F.greatest("ma", "mb").alias("doc_b"),
            "jaccard",
        )
    )
    return inter.unionAll(intra)


def minhash_components(
    docs: DataFrame, threshold: float = MINHASH_JACCARD_T
) -> DataFrame:
    """(doc_id, cluster_id) labels of the minhash pair graph — exactly
    ``connected_components(minhash_pairs(docs))``, but on the collapsed
    path the O(log n) star rounds run over REP-level edges only and
    member labels are one join: an expanded component is a union of
    classes, its min doc_id is the min rep (each rep is its class's min
    member), so rep-level cluster ids ARE the member-level ones.
    Classes in no rep pair but with ≥2 members (and a non-empty shingle
    set) are their own component via the intra clique. At the 100×
    replica this removes the C(copies,2)-expanded edge stream from the
    iterative CC entirely."""
    member, rep_pairs, valid_reps = _minhash_structure(docs, threshold)
    if member is None:
        return connected_components(rep_pairs)
    rep_comp = connected_components(rep_pairs)
    multi = (
        member.groupBy("rep")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("rep")
        .join(valid_reps, "rep", "semi")
    )
    own = multi.join(
        rep_comp.select(F.col("doc_id").alias("rep")), "rep", "anti"
    ).select(F.col("rep").alias("doc_id"), F.col("rep").alias("cluster_id"))
    rep_labels = rep_comp.unionAll(own).withColumnRenamed("doc_id", "rep")
    return member.join(rep_labels.hint("shuffle_hash"), "rep").select(
        "doc_id", "cluster_id"
    )


def _minhash_structure(
    docs: DataFrame, threshold: float
) -> tuple[DataFrame | None, DataFrame, DataFrame | None]:
    """(member, rep_pairs, valid_reps) behind the adaptive collapse.

    Direct path (duplication immaterial): ``(None, verified pairs,
    None)`` — the caller's answer IS rep_pairs. Collapsed path:
    ``member`` maps every doc to its class rep, ``rep_pairs`` are the
    verified rep-level pairs, ``valid_reps`` the non-empty-shingle
    class reps (the only classes whose intra pairs exist).
    """
    if not _dup_ratio_material(docs):
        # Duplication immaterial: run the direct per-doc pipeline (no
        # class/member/expansion shuffles at all).
        sh_, cand = minhash_candidates(docs)
        return None, _verify_pairs(sh_, cand, threshold), None

    # r11: classes key on md5(text) — EXACTLY the signal the probe
    # detects (text equality ⇒ shingle-set equality, so every collapse
    # invariant holds on the finer partition) — which makes the member
    # map MAP-SIDE and restricts the shingle explode to ONE REP PER
    # CLASS. The r10 form keyed on md5(sorted shingles) and therefore
    # shingled the WHOLE corpus just to build the class table — the
    # dominant corpus-scale work of the structure. Set-identical-but-
    # text-different docs no longer collapse; they were never what the
    # text-based probe fired on, and both paths stay value-identical
    # (unchanged oracle + forced-collapse equivalence test).
    keyed = docs.select("doc_id", F.md5("text").alias("ck"))
    # Class table: rep = min doc_id per distinct text. member is
    # corpus-scale (one row per doc) — never collected, never a
    # collect_list (a real corpus can hold million-member boilerplate
    # classes). All sides grow with the corpus → shuffle_hash hints
    # (the r6 static-broadcast rule).
    reps = keyed.groupBy("ck").agg(F.min("doc_id").alias("rep"))
    member = (
        keyed.join(reps.hint("shuffle_hash"), "ck")
        .select("rep", "doc_id")
        .localCheckpoint(eager=False)
    )
    sh_rep = _shingled(
        docs.join(
            member.filter(F.col("rep") == F.col("doc_id"))
            .select("doc_id")
            .hint("shuffle_hash"),
            "doc_id",
            "semi",
        )
    ).localCheckpoint(eager=False)

    _, cand = minhash_candidates(docs, sh=sh_rep)
    rep_pairs = _verify_pairs(sh_rep, cand, threshold)
    valid_reps = (
        sh_rep.filter(F.size("shingles") > 0)
        .select(F.col("doc_id").alias("rep"))
        .hint("shuffle_hash")
    )
    return member, rep_pairs, valid_reps


def minhash_bands(
    docs: DataFrame, sh: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """(shingled docs, per-doc LSH band signatures) — the signature
    stage alone, exposed so audits can restrict the collision join to a
    panel side instead of paying the full corpus×corpus self-join.
    Pass ``sh`` to run the band stage over an already-shingled
    (and possibly class-collapsed) frame."""
    # Shingling feeds the signature explode AND both verify sides; the
    # band table feeds both candidate join sides. Lazy localCheckpoints
    # make each a compute-once intermediate (the cluster analog: persist).
    if sh is None:
        sh = _shingled(docs).localCheckpoint(eager=False)
    exploded = sh.select("doc_id", F.explode("shingles").alias("g"))
    mh = exploded.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("g")))).alias(f"m{s}")
            for s in range(N_HASHES)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("b"),
                F.concat(
                    *[F.col(f"m{b * ROWS_PER_BAND + i}") for i in range(ROWS_PER_BAND)]
                ).alias("sig"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = (
        mh.select("doc_id", F.explode(band_structs).alias("bs"))
        .select("doc_id", F.col("bs.b").alias("b"), F.col("bs.sig").alias("sig"))
        .localCheckpoint(eager=False)
    )
    return sh, bands


def minhash_candidates(
    docs: DataFrame, sh: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """(shingled docs, LSH band-collision candidate pairs) — the
    candidate stage of minhash_pairs, exposed for the dedup_recall
    quality gate (which needs PRE-verification candidates)."""
    sh, bands = minhash_bands(docs, sh=sh)
    # Every join side below grows linearly with the corpus — the join
    # hints veto Catalyst's static broadcast (its size estimate for these
    # checkpointed intermediates is corpus-independent and wildly low; a
    # statically-planned broadcast CANNOT be demoted by AQE and became a
    # 512 MB driver allocation on the 100× corpus). shuffle_hash here
    # (no sort of the array-heavy sides; per-partition build stays small
    # under AQE partition sizing); the other dedup families use merge —
    # both stay shuffle-bound at any scale and AQE can still skew-split.
    a, c = bands.alias("a"), bands.alias("c").hint("shuffle_hash")
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
    return sh, cand


@query("dedup_minhash", DEDUP_MINHASH_SQL)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 MinHash-LSH near-dedup (shingle → minhash → band → bucket join).

    12 hashes in 4 bands × 3 rows (b=4,r=3 ⇒ s-curve threshold
    (1/4)^(1/3) ≈ 0.63 collision knee); candidates verified with exact
    shingle-set Jaccard ≥ 0.4. Lexicographic-min md5 hex = the permutation
    hash, portable across engines.
    """
    prepare(spark)
    return minhash_pairs(load(spark, sf_dir, "documents"))


#: Oracle SQL for the v1 release audit (kept for manual ≤10× runs; the
#: key itself was retired from the registry in late r8 — see
#: dedup_recall's docstring and the knn_recall precedent).
DEDUP_RECALL_V1_SQL = f"""
    WITH sh AS ({sh_sql('documents')}),
    {minhash_candidates_cte()},
    ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ns
        FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
    truth AS (
        SELECT doc_a, doc_b FROM shared
        JOIN sizes sa ON sa.doc_id = shared.doc_a
        JOIN sizes sb ON sb.doc_id = shared.doc_b
        WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns)
              >= CAST({MINHASH_JACCARD_T} AS DOUBLE)
    ),
    hit AS (SELECT * FROM cand JOIN truth USING (doc_a, doc_b)),
    s AS (
        SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
               (SELECT COUNT(*) FROM cand) AS n_cand,
               (SELECT COUNT(*) FROM hit) AS n_hit
    )
    SELECT 'minhash_lsh' AS method,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(n_hit AS DOUBLE) / NULLIF(n_cand, 0) AS precision,
           CAST(n_hit AS DOUBLE) / NULLIF(n_truth, 0) AS recall
    FROM s
    """


def dedup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 quality gate: MinHash-LSH candidate precision/recall vs exact
    Jaccard ground truth — driver-visible, like knn_recall for ANN.

    RETIRED from the registry in late r8 (was stamped green r6): its
    pair-bound ground-truth arm grows with C(duplicates, 2) — 49.8 s at
    the 10× replica (the slowest key in the whole 10× suite run), killed
    at 100× (SCALE.md r7 audit). It remains here as a documented
    ≤10×-scale RELEASE AUDIT, runnable manually against
    ``DEDUP_RECALL_V1_SQL``; the registered, bench-swept, driver-stamped
    form is ``dedup_recall_v2`` (fixed-id panel ⇒ linear arm, 194 s at
    100×). Per the r7 verdict: the default sweep carries only
    linear-or-better keys.

    Truth = ALL pairs with exact shingle Jaccard ≥ MINHASH_JACCARD_T,
    generated by a shared-shingle equi-join (EXACT: J ≥ 0.4 implies at
    least one shared shingle, so the equi-join misses nothing) — never
    an all-pairs cross join. Candidates = the band-collision pairs from
    minhash_candidates, PRE-verification (dedup_minhash's registered
    output is post-verification, so its precision is 1.0 by
    construction; the informative number is how selective and complete
    the LSH bucketing alone is). One summary row: counts + exact-ratio
    precision/recall (int/int divisions, NULL on empty via NULLIF on
    both engines).

    Scale posture: a QUALITY GATE run at eval scale, the knn_recall
    class — ground truth is inherently pairwise, and on the replicated
    audit corpus both truth and candidates grow with C(copies, 2)
    (SCALE.md's standing pairs-multiplicity note). The production path
    is dedup_minhash itself; this key is the measurement that justifies
    its b=4, r=3 S-curve choice.
    """
    prepare(spark)
    sh, cand = minhash_candidates(spread(load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet", min_rows_per_split=2_000))
    ex = sh.select("doc_id", F.explode("shingles").alias("g"))
    shared = (
        ex.select(F.col("doc_id").alias("doc_a"), "g")
        .join(
            ex.select(F.col("doc_id").alias("doc_b"), "g").hint("shuffle_hash"),
            "g",
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ns"))
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    truth = (
        shared.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")).hint(
                "shuffle_hash"
            ),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")).hint(
                "shuffle_hash"
            ),
            "doc_b",
        )
        .filter(
            F.col("ns").cast("double") / (F.col("na") + F.col("nb") - F.col("ns"))
            >= F.lit(MINHASH_JACCARD_T)
        )
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)  # feeds n_truth AND the hit join
    )
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    n_hit = cand.join(truth, ["doc_a", "doc_b"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        n_truth.crossJoin(n_cand)
        .crossJoin(n_hit)
        .select(
            F.lit("minhash_lsh").alias("method"),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_cand").cast("long").alias("n_cand"),
            F.col("n_hit").cast("long").alias("n_hit"),
            (
                F.col("n_hit").cast("double") / F.nullif(F.col("n_cand"), F.lit(0))
            ).alias("precision"),
            (
                F.col("n_hit").cast("double") / F.nullif(F.col("n_truth"), F.lit(0))
            ).alias("recall"),
        )
    )


#: Fixed-id-range audit panel for dedup_recall_v2 — the knn_recall_v2
#: move. ``doc_id < 10_000_000`` pins the panel to the first replica
#: (tools/replicate_corpus.py shifts doc_id by 10M per copy), so the
#: panel does NOT grow with the corpus; `% 10` keeps it a 10% sample of
#: that fixed range. In production this would be an authored audit set.
PANEL_DOC_SQL = "doc_id % 10 = 0 AND doc_id < 10000000"

#: Per-panel-doc match-list bound applied BEFORE the Jaccard verify
#: (r8 verdict item 4). A J ≥ 0.4 pair needs ns ≥ 0.4/1.4·(np+nd), so
#: true duplicates rank at the TOP of a panel doc's shared-count list;
#: the long tail is weak 1-2-shingle partials the Jaccard filter would
#: kill anyway — but only AFTER the sizes joins processed them. The cap
#: must exceed the max expected duplicate multiplicity per doc (the
#: adversarial 100× replica has 99 copies/doc; 128 > 99 keeps truth
#: EXACT there while cutting the verify-stage volume). Ties at the cut
#: break on d ASC — deterministic on both engines.
DEDUP_RECALL_TOPK = 128


@query(
    "dedup_recall_v2",
    f"""
    WITH sh AS ({sh_sql('documents')}),
    {minhash_candidates_cte()},
    pex AS (SELECT doc_id AS p, unnest(shingles) AS g FROM sh
            WHERE {PANEL_DOC_SQL}),
    ex AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    shared_all AS (
        SELECT p, ex.doc_id AS d, COUNT(*) AS ns
        FROM pex JOIN ex ON pex.g = ex.g AND ex.doc_id <> pex.p
        GROUP BY p, d
    ),
    shared_rk AS (
        SELECT p, d, ns,
               row_number() OVER (PARTITION BY p ORDER BY ns DESC, d ASC)
                   AS rk
        FROM shared_all
    ),
    shared AS (
        SELECT p, d, ns FROM shared_rk WHERE rk <= {DEDUP_RECALL_TOPK}
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
    viol AS (
        SELECT r.p FROM shared_rk r
        JOIN sizes sp ON sp.doc_id = r.p
        WHERE r.rk = {DEDUP_RECALL_TOPK}
          AND {CAP_GUARD_NS_COEF} * r.ns >= {CAP_GUARD_SZ_COEF} * (sp.n
              + GREATEST((SELECT MIN(len(shingles)) FROM sh), r.ns))
    ),
    truth AS (
        SELECT DISTINCT LEAST(p, d) AS doc_a, GREATEST(p, d) AS doc_b
        FROM shared
        JOIN sizes sa ON sa.doc_id = shared.p
        JOIN sizes sb ON sb.doc_id = shared.d
        WHERE CAST(ns AS DOUBLE) / (sa.n + sb.n - ns)
              >= CAST({MINHASH_JACCARD_T} AS DOUBLE)
    ),
    candp AS (
        SELECT doc_a, doc_b FROM cand
        WHERE (doc_a % 10 = 0 AND doc_a < 10000000)
           OR (doc_b % 10 = 0 AND doc_b < 10000000)
    ),
    hit AS (SELECT * FROM candp JOIN truth USING (doc_a, doc_b)),
    s AS (
        SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
               (SELECT COUNT(*) FROM candp) AS n_cand,
               (SELECT COUNT(*) FROM hit) AS n_hit,
               (SELECT COUNT(*) FROM viol) AS n_capviol
    )
    SELECT 'minhash_lsh_panel' AS method,
           CAST(n_truth AS BIGINT) AS n_truth,
           CAST(n_cand AS BIGINT) AS n_cand,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(n_hit AS DOUBLE) / NULLIF(n_cand, 0) AS precision,
           CAST(n_hit AS DOUBLE) / NULLIF(n_truth, 0) AS recall,
           n_capviol = 0 AS cap_ok
    FROM s
    """,
)
def dedup_recall_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 quality gate with a BOUNDED audit panel — the 100 TB form.

    dedup_recall's ground-truth arm is pair-bound: on duplicate-heavy
    corpora both truth and candidates grow with C(copies, 2) (the 100×
    replica run was killed after 30 min, SCALE.md r7). This twin pins
    the truth arm to a FIXED id-range panel (``PANEL_DOC_SQL`` — the
    knn_recall_v2 recipe applied to dedup): exact Jaccard is computed
    only for panel×corpus pairs via the panel-restricted shared-shingle
    equi-join (EXACT for J ≥ 0.4 — any qualifying pair shares a
    shingle), so the audit arm is LINEAR in the corpus at any scale
    while still measuring the SAME LSH candidate stage (restricted to
    pairs touching the panel). On the un-replicated fixtures panel
    pairs are a strict subset of v1's; they diverge exactly when the
    corpus outgrows the panel — which is the point.

    r9 cost trims (the 194 s → measured-in-SCALE.md 100× cut):

    1. The LSH candidate arm only ever KEEPS pairs touching the panel,
       and band collision is a pairwise equi-predicate — so the
       corpus×corpus band self-join is replaced by corpus×PANEL-bands
       (identical result set by construction; the oracle still filters
       the full self-join, so sf0.01/10× parity PROVES the rewrite).
       The per-doc signature stage is unchanged — computing every
       doc's signature is the honest audited cost of the LSH stage.
    2. Each panel doc's match list is capped at the
       ``DEDUP_RECALL_TOPK`` strongest shared-counts BEFORE the
       Jaccard verify (window over the already-aggregated (p, d)
       pairs — panel-bounded partitions). r10 adds the BINDING-CAP
       GUARD (ADVICE r9): ``cap_ok`` flips to false when any panel
       doc's rank-K shared count could still clear the Jaccard
       threshold (pure-integer feasibility 7·ns ≥ 2·(np +
       max(nd_min, ns)) — f increasing in ns, so the rank-K row bounds
       everything the cap hid), so a binding cap FAILS the audit
       instead of silently under-counting truth. On duplicate-heavy corpora
       the (p, d) list is dominated by weak 1-2-shingle partials that
       the Jaccard filter rejects anyway; the cap removes them before
       the sizes joins. Truth stays EXACT while K exceeds the per-doc
       strong-match count (ties break on d ASC — deterministic both
       engines).
    """
    prepare(spark)
    sh, bands = minhash_bands(load(spark, sf_dir, "documents"))
    panel = sh.filter(F.expr(PANEL_DOC_SQL))
    ex_panel = panel.select(F.col("doc_id").alias("p"), F.explode("shingles").alias("g"))
    ex_all = sh.select(F.col("doc_id").alias("d"), F.explode("shingles").alias("g"))
    # The panel gram stream is DESIGN-bounded (fixed id range — it does
    # not grow with the corpus), so the static broadcast is legitimate
    # per the repo rule and lets the corpus-scale gram stream flow
    # map-side: the only shuffle left is the (p, d) shared-count
    # aggregation over matched pairs.
    shared_all = (
        ex_all.join(F.broadcast(ex_panel), "g")
        .filter(F.col("d") != F.col("p"))
        .groupBy("p", "d")
        .agg(F.count(F.lit(1)).alias("ns"))
    )
    w = Window.partitionBy("p").orderBy(F.desc("ns"), F.asc("d"))
    shared_rk = shared_all.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= DEDUP_RECALL_TOPK
    )
    sizes = sh.select("doc_id", F.size("shingles").alias("n"))
    # Cap-binding guard scalar (ADVICE r9): the smallest shingle-set
    # size in the corpus, collected as an EXACT int (1-row scalar, the
    # driver-side-literal rule — counts never round). Collecting it
    # also materializes the lazy sh checkpoint the main job reuses.
    nd_min = int(sizes.agg(F.min("n")).collect()[0][0] or 0)
    # p-side sizes are panel rows (design-bounded → broadcast); d-side
    # sizes are corpus-scale → shuffle-bound by hint (the r6 rule: never
    # let Catalyst static-broadcast a checkpointed corpus intermediate).
    sizes_p = panel.select(
        F.col("doc_id").alias("p"), F.size("shingles").alias("np")
    )
    scored = shared_rk.join(F.broadcast(sizes_p), "p").join(
        sizes.select(F.col("doc_id").alias("d"), F.col("n").alias("nd")).hint(
            "shuffle_hash"
        ),
        "d",
    )
    truth = (
        scored.filter(
            F.col("ns").cast("double") / (F.col("np") + F.col("nd") - F.col("ns"))
            >= F.lit(MINHASH_JACCARD_T)
        )
        .select(
            F.least("p", "d").alias("doc_a"), F.greatest("p", "d").alias("doc_b")
        )
        .distinct()
    )
    # Cap-binding guard (ADVICE r9): a panel doc whose rank-K shared
    # count could still clear the Jaccard threshold means truth may be
    # under-counted — surface it instead of passing as a valid audit.
    # Feasibility is pure-integer with coefficients DERIVED from
    # MINHASH_JACCARD_T (J ≥ p/q ⟺ (p+q)·ns ≥ p·(np+nd); 7/2 at T=2/5),
    # with nd bounded below by max(corpus-min size, ns) — f(ns') is
    # increasing in ns', so checking the rank-K row bounds every pair
    # the cap hid. Accepted conservatism (ADVICE r10): a panel doc with
    # EXACTLY TOPK feasible partners and nothing hidden also trips the
    # guard — a false positive mirrored in the oracle (parity holds);
    # truth on such a corpus is still exact, the audit just declines to
    # certify it. Preferable to the alternative (counting shared_all
    # partners per p) which would re-aggregate the uncapped stream. Rides the tagged union as a third arm (doc_b = -1
    # cannot collide with real pairs) so the whole key stays ONE job
    # (trim #3: branch aggregates racing a lazy checkpoint recompute
    # full lineages).
    viol = scored.filter(
        (F.col("_rk") == DEDUP_RECALL_TOPK)
        & (
            F.lit(CAP_GUARD_NS_COEF) * F.col("ns")
            >= F.lit(CAP_GUARD_SZ_COEF)
            * (F.col("np") + F.greatest(F.lit(nd_min), F.col("ns")))
        )
    ).select(F.col("p").alias("doc_a"), F.lit(-1).alias("doc_b"))
    # Panel-restricted candidate arm (trim #1): probe the corpus band
    # stream against the panel's band signatures. The panel band table
    # is DESIGN-bounded (fixed id range × N_BANDS rows) → broadcast is
    # legitimate; the corpus band stream flows map-side, no self-join.
    panel_bands = bands.filter(F.expr(PANEL_DOC_SQL)).select(
        F.col("doc_id").alias("pd"), "b", "sig"
    )
    cand_panel = (
        bands.join(F.broadcast(panel_bands), ["b", "sig"])
        .filter(F.col("doc_id") != F.col("pd"))
        .select(
            F.least("doc_id", "pd").alias("doc_a"),
            F.greatest("doc_id", "pd").alias("doc_b"),
        )
        .distinct()
    )
    # Trim #3 (the one that actually moved the 100× number): the three
    # counts reduce ONE tagged union — never three aggregate branches
    # cross-joined. Branch aggregates each become their own broadcast
    # job, and concurrent jobs racing an unmaterialized lazy checkpoint
    # recompute the full truth/candidate lineages (measured: ~200 s for
    # a plan whose unique stage work sums to ~55 s at 100×). The union
    # form references each arm exactly once in one job.
    tagged = (
        truth.select(
            "doc_a",
            "doc_b",
            F.lit(1).alias("t"),
            F.lit(0).alias("c"),
            F.lit(0).alias("v"),
        )
        .unionAll(
            cand_panel.select(
                "doc_a",
                "doc_b",
                F.lit(0).alias("t"),
                F.lit(1).alias("c"),
                F.lit(0).alias("v"),
            )
        )
        .unionAll(
            viol.select(
                "doc_a",
                "doc_b",
                F.lit(0).alias("t"),
                F.lit(0).alias("c"),
                F.lit(1).alias("v"),
            )
        )
    )
    pairs = tagged.groupBy("doc_a", "doc_b").agg(
        F.max("t").alias("t"), F.max("c").alias("c"), F.max("v").alias("v")
    )
    counts = pairs.agg(
        F.coalesce(F.sum("t"), F.lit(0)).alias("n_truth"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("n_cand"),
        F.coalesce(F.sum(F.col("t") * F.col("c")), F.lit(0)).alias("n_hit"),
        F.coalesce(F.sum("v"), F.lit(0)).alias("n_capviol"),
    )
    return counts.select(
        F.lit("minhash_lsh_panel").alias("method"),
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_cand").cast("long").alias("n_cand"),
        F.col("n_hit").cast("long").alias("n_hit"),
        (
            F.col("n_hit").cast("double") / F.nullif(F.col("n_cand"), F.lit(0))
        ).alias("precision"),
        (
            F.col("n_hit").cast("double") / F.nullif(F.col("n_truth"), F.lit(0))
        ).alias("recall"),
        (F.col("n_capviol") == 0).alias("cap_ok"),
    )


SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4 × 16-bit bands: Hamming ≤ 3 ⇒ ≥1 exact band match
SIMHASH_HAMMING_T = 3

_HEX = "0123456789abcdef"

#: Per-bit vote: bit i (1..64) of a token's md5 = bit (3-((i-1)%4)) of
#: hex digit (i+3)/4. Pure integer arithmetic → bit-identical across
#: engines regardless of how each side evaluates it.
_BITS_SQL = (
    "list_transform(generate_series(1, 64), i -> CASE WHEN"
    " list_sum(list_transform(dvals, dv -> CASE WHEN"
    " ((dv[(i+3)//4] >> (3 - ((i-1)%4))) % 2) = 1 THEN 1 ELSE -1 END)) > 0"
    " THEN 1 ELSE 0 END)"
)

SIMHASH_SIGS_SQL = f"""
        SELECT doc_id,
               array_to_string(list_transform(generate_series(0, 15), j ->
                   substring('{_HEX}', b[j*4+1]*8 + b[j*4+2]*4
                                       + b[j*4+3]*2 + b[j*4+4] + 1, 1)),
                   '') AS simhash
        FROM (
            SELECT doc_id, {_BITS_SQL} AS b
            FROM (SELECT doc_id,
                         list_transform(hashes, h ->
                             list_transform(generate_series(1, 16), d ->
                                 strpos('{_HEX}', substring(h, d, 1)) - 1))
                             AS dvals
                  FROM (SELECT doc_id,
                               list_transform(list_distinct(list_filter(
                                   string_split(text, ' '), t -> t <> '')),
                                   t -> md5(t)) AS hashes
                        FROM documents)
                  WHERE len(hashes) > 0)
        )
"""

DEDUP_SIMHASH_SQL = f"""
    WITH sigs AS ({SIMHASH_SIGS_SQL}),
    bands AS (
        SELECT doc_id, t, substring(simhash, t*4 + 1, 4) AS band
        FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS t)
    ),
    bc AS (SELECT t, band, COUNT(*) AS c FROM bands GROUP BY t, band),
    per_doc AS (
        SELECT b.doc_id, CAST(SUM(c - 1) AS BIGINT) AS n_band_collisions
        FROM bands b JOIN bc ON b.t = bc.t AND b.band = bc.band
        GROUP BY b.doc_id
    )
    SELECT s.doc_id, s.simhash, p.n_band_collisions
    FROM sigs s JOIN per_doc p ON s.doc_id = p.doc_id
    """


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """Per-doc 64-bit SimHash as a 16-hex-char signature.

    Bit i = sign of Σ_distinct-tokens (±1 by bit i of the token's md5
    first 64 bits); the 64-bit width keeps the signature space (2^64)
    far above any corpus size, unlike a 16-bit toy signature whose
    65,536 buckets all collide at scale.

    Shape: explode distinct tokens → 64 codegen'd integer vote
    expressions → ONE groupBy with 64 map-side-combined SUMs (the MR
    combiner shape, like minhash's partial mins) — the shuffle carries
    64 longs per doc, and no interpreted per-element lambda touches the
    hot path.
    """
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("array_distinct(filter(split(text, ' '), t -> t <> ''))")
        ).alias("tok"),
    )
    # Two 32-bit halves (2 conv() string parses per token, not 16); the
    # 64 votes are then pure integer shift/mask — all codegen'd.
    halves = toks.select(
        "doc_id",
        F.expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint)").alias("hi"),
        F.expr("cast(conv(substring(md5(tok), 9, 8), 16, 10) as bigint)").alias("lo"),
    )

    def vote(i: int) -> F.Column:  # bit i of the 64-bit md5 prefix → ±1
        col, s = ("hi", 32 - i) if i <= 32 else ("lo", 64 - i)
        return (
            F.shiftright(F.col(col), s).bitwiseAND(F.lit(1)).cast("int") * 2 - 1
        )

    votes = halves.groupBy("doc_id").agg(
        *[F.sum(vote(i)).alias(f"v{i}") for i in range(1, 65)]
    )
    hex_chars = [
        F.expr(
            f"substring('{_HEX}', "
            + " + ".join(
                f"CASE WHEN v{4 * j + b + 1} > 0 THEN {8 >> b} ELSE 0 END"
                for b in range(4)
            )
            + " + 1, 1)"
        )
        for j in range(16)
    ]
    return votes.select("doc_id", F.concat(*hex_chars).alias("simhash"))


def simhash_bands(sigs: DataFrame) -> DataFrame:
    """Explode each signature into its 4 16-bit (4-hex-char) bands."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                F.substring("simhash", t * 4 + 1, 4).alias("band"),
            )
            for t in range(SIMHASH_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(band_structs).alias("bs")).select(
        "doc_id", F.col("bs.t").alias("t"), F.col("bs.band").alias("band")
    )


def simhash_hamming_pairs(
    docs: DataFrame, max_hamming: int = SIMHASH_HAMMING_T
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming(sig_a, sig_b) ≤ 3.

    Candidate generation is the banded pigeonhole (Manku et al., WWW'07
    "Detecting Near-Duplicates for Web Crawling"): two 64-bit signatures
    within Hamming distance 3 must agree exactly on ≥1 of 4 16-bit
    bands, so candidates come from an equi-join on (band_idx, band) —
    never an all-pairs scan. Verification is an exact popcount over the
    16 hex-digit XORs.
    """
    sigs = simhash_signatures(docs).localCheckpoint(eager=False)
    bands = simhash_bands(sigs)
    cand = (
        bands.alias("a")
        .join(
            # merge: band table is corpus-sized — see minhash_pairs note.
            bands.alias("b").hint("merge"),
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    digs = (
        f"transform(sequence(1, 16), d -> cast(conv(substring({{c}}, d, 1),"
        " 16, 10) as int))"
    )
    ham = F.expr(
        "aggregate(zip_with("
        + digs.format(c="sig_a")
        + ", "
        + digs.format(c="sig_b")
        + ", (x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a")).hint("merge")
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b")).hint("merge")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


@query("dedup_simhash", DEDUP_SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 SimHash: 64-bit majority-vote signature + banded probe cost.

    Output: (doc_id, 16-hex-char simhash, n_band_collisions) where
    n_band_collisions = Σ over the doc's 4 bands of (bucket size − 1) —
    the number of comparisons a Hamming-≤3 probe performs for that doc
    (simhash_hamming_pairs runs the actual verification; tests pin that
    constructed near-dups land in shared bands with hamming ≤ 3). This
    is bucket-size arithmetic — one groupBy + equi-join, never a pair
    self-join, so hot bands cost rows, not rows². Everything is integer
    arithmetic on md5 hex — bit-identical in both engines.
    """
    prepare(spark)
    sigs = simhash_signatures(spread(load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet", min_rows_per_split=2_000)).localCheckpoint(
        eager=False
    )
    bands = simhash_bands(sigs)
    bc = bands.groupBy("t", "band").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        bands.join(bc.hint("merge"), ["t", "band"])
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") - 1).cast("bigint").alias("n_band_collisions"))
    )
    return sigs.join(per_doc.hint("merge"), "doc_id").select(
        "doc_id", "simhash", "n_band_collisions"
    )


#: Document-frequency cap: a trigram shared by k docs in one source emits
#: C(k,2) pair rows in the gram equi-join; stop-grams (template
#: boilerplate, "terms of service" headers) make that k² — THE classic
#: near-dup hot-key blowup at 100 TB. Grams with per-source DF above the
#: cap carry ~zero Jaccard signal (they occur in everything), so the
#: operator's contract is Jaccard over the STOP-GRAM-FILTERED gram sets
#: (standard boilerplate removal), identically on both engines. The stop
#: set is tiny by construction (≤ |exploded|/cap grams), so Spark removes
#: it with a broadcast anti-join — no extra shuffle of the exploded table.
MAX_GRAM_DF = 50

DEDUP_NGRAM_SQL = f"""
    WITH ex AS (
        SELECT doc_id, source, unnest(grams) AS gram
        FROM (
            SELECT doc_id, source,
                   list_distinct(list_transform(generate_series(1, len(w) - 2),
                       i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))) AS grams
            FROM (SELECT doc_id, source,
                         list_filter(string_split(text, ' '), t -> t <> '') AS w
                  FROM documents)
            WHERE len(w) >= 3
        )
    ),
    stop AS (
        SELECT source, gram FROM ex
        GROUP BY source, gram HAVING COUNT(*) > {MAX_GRAM_DF}
    ),
    rare AS (
        SELECT ex.doc_id, ex.source, ex.gram FROM ex
        ANTI JOIN stop ON ex.source = stop.source AND ex.gram = stop.gram
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM rare GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM rare a JOIN rare b
          ON a.source = b.source AND a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE)
                 / (na.n_grams + nb.n_grams - n_inter), 6) AS jaccard
    FROM inter
    JOIN sizes na ON na.doc_id = inter.doc_a
    JOIN sizes nb ON nb.doc_id = inter.doc_b
    WHERE jaccard >= 0.2
    """


def _grammed(docs: DataFrame) -> DataFrame:
    """doc_id + source + distinct word-trigrams (docs with ≥3 tokens)."""
    return (
        docs.select(
            "doc_id",
            "source",
            F.expr("filter(split(text, ' '), t -> t <> '')").alias("w"),
        )
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            "source",
            F.expr(
                "array_distinct(transform(sequence(1, size(w) - 2),"
                " i -> concat_ws(' ', slice(w, i, 3))))"
            ).alias("grams"),
        )
    )


def rare_grams(sh: DataFrame, max_df: int = MAX_GRAM_DF) -> DataFrame:
    """Exploded (doc_id, source, gram) with stop-grams removed.

    The stop set (per-source DF > ``max_df``) is tiny by construction —
    at most |exploded|/max_df grams — so it broadcasts, and the removal
    is a broadcast anti-join: the big exploded table never shuffles for
    it. The DF groupBy itself combines map-side (partial counts), so its
    shuffle is distinct-gram-sized, not occurrence-sized.
    """
    # One explode pass, reused by the DF count and as the anti-join left
    # side (and by every downstream consumer) instead of re-shingling the
    # corpus per reference — the persisted intermediate a cluster job
    # would write once.
    exploded = sh.select(
        "doc_id", "source", F.explode("grams").alias("gram")
    ).localCheckpoint(eager=False)
    stop = (
        exploded.groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("source", "gram")
    )
    return exploded.join(F.broadcast(stop), ["source", "gram"], "left_anti")


def ngram_candidates(sh: DataFrame, max_df: int = MAX_GRAM_DF) -> DataFrame:
    """(doc_a, doc_b) candidate pairs sharing ≥1 rare gram in one source.

    Pair volume is Σ_rare-grams C(df,2) with every df ≤ max_df — linear
    in corpus size — instead of the uncapped Σ C(df,2) which one
    stop-gram turns quadratic. (Used by the skew tests; ngram_pairs
    fuses this join with the intersection count.)
    """
    rare = rare_grams(sh, max_df)
    a = rare.select("source", "gram", F.col("doc_id").alias("doc_a"))
    b = rare.select(
        F.col("source").alias("source_b"),
        F.col("gram").alias("gram_b"),
        F.col("doc_id").alias("doc_b"),
    ).hint("merge")  # exploded-gram table: corpus-sized, never broadcast
    return (
        a.join(
            b,
            (F.col("source") == F.col("source_b"))
            & (F.col("gram") == F.col("gram_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_pairs(
    docs: DataFrame,
    threshold: float = NGRAM_JACCARD_T,
    max_df: int = MAX_GRAM_DF,
) -> DataFrame:
    """Trigram-Jaccard near-dup pairs over stop-gram-filtered gram sets.

    Sparse one-pass formulation: explode grams, drop stop-grams
    (broadcast anti-join — see rare_grams), equi-join the survivors on
    (source, gram): |A∩B| = the pair's join-match count (map-side
    combined), |A∪B| = |A|+|B|−|A∩B|. Pairs with zero shared rare grams
    never materialize. The Jaccard domain is the filtered gram sets on
    BOTH engines — boilerplate carries no signal, and keeping it would
    reintroduce the k² hot key that the cap exists to kill.

    Join strategy (r9): shuffle_hash, not merge — the gram-match join
    keys are short strings whose sort buys nothing (measured at the 10×
    replica: 31.6 s SMJ → 28.4 s SHJ), the hint still vetoes a static
    broadcast of the corpus-sized sides, and when the DF cap empties
    the rare-gram table (the 100× exact-dup replica: every gram becomes
    ≥100-doc boilerplate — degenerate BY DESIGN) AQE propagates the
    empty build through SHJ and short-circuits the probe (215 s → 2.7 s
    there), where SMJ sorted the probe side before discovering it.
    """
    rare = rare_grams(_grammed(docs), max_df).localCheckpoint(eager=False)
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = rare.select("source", "gram", F.col("doc_id").alias("doc_a"))
    b = rare.select(
        F.col("source").alias("source_b"),
        F.col("gram").alias("gram_b"),
        F.col("doc_id").alias("doc_b"),
    ).hint("shuffle_hash")  # exploded-gram table: corpus-sized, never broadcast
    inter = (
        a.join(
            b,
            (F.col("source") == F.col("source_b"))
            & (F.col("gram") == F.col("gram_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("n_a")).hint("shuffle_hash")
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("n_b")).hint("shuffle_hash")
    jac = F.round(
        F.col("n_inter").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        6,
    )
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


@query("dedup_ngram", DEDUP_NGRAM_SQL)
def dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 exact trigram-Jaccard near-dedup, blocked by ``source``.

    The exact (non-sketch) baseline for minhash — see ngram_pairs for
    the DF-capped sparse formulation and its scale rationale.
    """
    prepare(spark)
    return ngram_pairs(spread(load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet", min_rows_per_split=2_000))


DEDUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ({DEDUP_MINHASH_SQL})
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, least(a, MIN(b)) AS cluster_id,
           COUNT(DISTINCT b) AS csize
    FROM reach GROUP BY a
    """


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round: connect each strictly-larger neighbor to the min.

    For every node u with m = min(Γ(u) ∪ {u}), emit (v, m) for each
    neighbor v > u. Edges stay (hi, lo)-directed; no self-loops possible
    (v > u ≥ m).
    """
    sym = edges.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
        edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv")).hint("merge")
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.least("u", "mv").alias("lo"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: link all smaller neighbors (and u) to the min."""
    mins = edges.groupBy("hi").agg(F.min("lo").alias("m")).hint("merge")
    to_min = (
        edges.join(mins, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    return to_min.unionByName(mins.select("hi", F.col("m").alias("lo"))).distinct()


def _connected_components_impl(
    pairs: DataFrame, max_rounds: int | None = None
) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star CC → ((doc_id, cluster_id), rounds).

    The two-phase algorithm of Kiveris et al., "Connected Components in
    MapReduce and Beyond" (SOCC'14): each round halves long chains, so
    the fixpoint — a star per component, rooted at the component min —
    arrives in O(log n) rounds instead of the O(diameter) a plain
    min-label propagation needs. Every round is two groupBy+join passes
    over the (hi, lo)-canonical edge set, localCheckpointed to truncate
    lineage. Convergence = the edge set reaches its fixpoint; exhausting
    the round budget without converging RAISES (silently returning
    partial labels would emit wrong cluster_ids downstream).
    """
    # One lazy checkpoint on the pair stream: edges AND nodes below each
    # trigger an action, and without this the whole upstream candidate
    # pipeline (minhash bands + verify join) would materialize twice.
    pairs = pairs.localCheckpoint(eager=False)
    edges = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("hi"),
            F.least("doc_a", "doc_b").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )
    # Nodes come from the RAW pairs: a node seen only in self-pairs
    # (dropped from edges) must still label itself as a singleton root.
    nodes = (
        pairs.select(F.col("doc_a").alias("node"))
        .unionByName(pairs.select(F.col("doc_b").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    if max_rounds is None:
        n = max(nodes.count(), 2)
        # 2·log2(n) + cushion: the paper's bound is O(log² n) worst-case
        # but O(log n) in practice; the raise below catches pathologies.
        max_rounds = 2 * n.bit_length() + 6
    rounds = 0
    converged = False
    for rounds in range(1, max_rounds + 1):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        # Fixpoint = star forest (the algorithm's unique stable state):
        # (a) every non-root points to exactly one root, and (b) no node
        # is both a child and a root (two-level, no chains). Testing the
        # invariant directly on the (tiny, AQE-coalesced) edge set costs
        # two metadata-scale probes — strictly cheaper than the
        # recompute-a-round-and-subtract test, which always burns one
        # full extra star round just to observe "nothing changed".
        # Both invariant probes in ONE action (r16: each driver action on
        # the loop's critical path is pure latency at metadata scale —
        # union the two limit-1 existence checks instead of chaining two
        # jobs; ~1 job/round saved, same truth table).
        violations = (
            edges.groupBy("hi")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .select(F.lit(1).alias("one"))
            .limit(1)
            .unionAll(
                edges.select("hi")
                .intersect(edges.select("lo"))
                .select(F.lit(1).alias("one"))
                .limit(1)
            )
            .count()
        )
        if violations == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "the edge set is still changing — refusing to emit partial labels"
        )
    non_root = edges.select(F.col("hi").alias("doc_id"), F.col("lo").alias("cluster_id"))
    roots = nodes.join(
        non_root.hint("merge"), nodes.node == non_root.doc_id, "left_anti"
    ).select(F.col("node").alias("doc_id"), F.col("node").alias("cluster_id"))
    return non_root.unionByName(roots), rounds


def connected_components(pairs: DataFrame, max_rounds: int | None = None) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id).

    This is the dedup *clustering* step — pairs alone don't say which
    docs to drop; components do (keep cluster_id, drop the rest). See
    _connected_components_impl for the algorithm and its guarantees.
    """
    labels, _ = _connected_components_impl(pairs, max_rounds)
    return labels


@query("dedup_clusters", DEDUP_CLUSTERS_SQL)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 dedup clustering: connected components of the minhash pair graph.

    Output: every doc in any near-dup pair, its component's min doc_id
    as cluster_id, and the component size. The DuckDB oracle derives the
    same components with a recursive-CTE transitive closure — an
    independent algorithm, same answer. (In an undirected component every
    node reaches itself through any neighbor, so the closure's distinct-
    reachable count equals component size.)
    """
    prepare(spark)
    comps = minhash_components(
        spread(
            load(spark, sf_dir, "documents"),
            f"{sf_dir}/documents.parquet",
            min_rows_per_split=2_000,
        )
    )
    sizes = comps.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("csize"))
    return comps.join(sizes.hint("merge"), "cluster_id").select(
        "doc_id", "cluster_id", "csize"
    )


#: Normalized-vector CTE shared by the embedding oracle queries: cosine of
#: pre-normalized vectors = plain dot product, computing each norm once
#: per vector instead of once per pair (O(n·d) instead of O(n²·d) norms).
NORM_EMB_SQL = """
        SELECT vec_id, label,
               list_transform(v, x -> x / nrm) AS u
        FROM (SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                     sqrt(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * x))) AS nrm
              FROM embeddings)
"""

_DOT_UV_SQL = "list_sum(list_transform(generate_series(1, 64), i -> a.u[i] * b.u[i]))"


DEDUP_EMBEDDING_SQL = f"""
    WITH e AS ({NORM_EMB_SQL}),
    bk AS (SELECT vec_id, label, {lsh_bucket_sql()} AS bucket FROM e),
    pr AS (
        SELECT vec_id, label,
               unnest({probe_signatures_sql("bucket")}) AS sig
        FROM bk
    ),
    cand AS (
        SELECT DISTINCT p.vec_id AS vec_a, c.vec_id AS vec_b
        FROM pr p JOIN bk c
          ON p.label = c.label AND p.sig = c.bucket AND p.vec_id < c.vec_id
    )
    SELECT cand.vec_a, cand.vec_b, round({_DOT_UV_SQL}, 6) AS cosine
    FROM cand
    JOIN e a ON a.vec_id = cand.vec_a
    JOIN e b ON b.vec_id = cand.vec_b
    WHERE round({_DOT_UV_SQL}, 6) >= {EMB_COSINE_T}
    """


def embedding_candidates(e: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_a, vec_b) candidates within (label, LSH bucket ∪ 1-bit probes).

    Both sides carry their sign-bit LSH signature; side a additionally
    explodes the 1+n_planes probe signatures and the pairing is a plain
    equi-join on (label, signature) — candidate volume is Σ_buckets
    O(bucket²·probes/2^planes), not O(block²). Pairs whose signatures
    differ in ≥2 bits are not candidates: that is the operator's
    documented LSH contract (mirrored exactly in the oracle), the price
    of staying sub-quadratic when one label holds half the corpus.
    """
    # The bucketed table feeds BOTH join sides; without materialization a
    # self-join re-runs the 6-plane projection HOF per side. On a cluster
    # this intermediate would be persisted/written once; localCheckpoint
    # (lazy) is the single-app analog.
    b = lsh_bucketed(e, n_planes).localCheckpoint(eager=False)
    a = b.select(
        "label",
        F.col("vec_id").alias("vec_a"),
        F.explode(probe_signatures("bucket", n_planes)).alias("sig"),
    )
    c = b.select(
        F.col("label").alias("label_b"),
        F.col("vec_id").alias("vec_b"),
        F.col("bucket").alias("sig_b"),
    ).hint("merge")  # bucketed corpus side: linear growth, never broadcast
    return (
        a.join(
            c,
            (F.col("label") == F.col("label_b"))
            & (F.col("sig") == F.col("sig_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b")
        .distinct()
    )


def _verify_cosine(e: DataFrame, cand: DataFrame, threshold: float) -> DataFrame:
    """Exact normalized-dot verify of candidate pairs against ``e``."""
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("u").alias("ua")).hint("merge")
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("u").alias("ub")).hint("merge")
    cos = F.round(
        F.expr("aggregate(zip_with(ua, ub, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"),
        6,
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _embedding_class_parts(e: DataFrame, threshold: float):
    """(checkpointed e, parts) behind embedding_pairs' class collapse.

    ``parts`` is None on the direct (dup-free) path; else the tuple
    (member, rep_pairs, reps_ok) — the class map, the verified
    rep-level pair set, and the self-cosine-valid classes — from which
    BOTH the expanded pair stream (embedding_pairs) and the class-level
    summary (dedup_embedding_stats, r13) are pure derivations.
    """
    material = _probe_material(
        e, F.approx_count_distinct(F.xxhash64("label", "u"), 0.02)
    )
    e = e.localCheckpoint(eager=False)
    if not material:
        return e, None
    return e, _embedding_class_build(e, threshold)


def embedding_pairs(e: DataFrame, threshold: float = EMB_COSINE_T) -> DataFrame:
    """Cosine-verified near-dup pairs from LSH-bucketed candidates.

    r10 ADAPTIVE EXACT-CLASS COLLAPSE, the minhash_pairs recipe applied
    to vectors: buckets, probe signatures, and the normalized dot are
    all functions of (label, u), so vectors with an identical
    (label, u) are interchangeable — the LSH + verify pipeline runs on
    one representative per class and member pairs expand afterward.
    Intra-class pairs score the class's SELF-dot computed with the SAME
    zip_with/aggregate fold the per-pair verify uses (bit-identical to
    what the direct path would emit for those pairs — ~0.999999-1.0
    after normalization rounding, never assumed to be 1.0); inter-class
    pairs inherit the verified rep-pair cosine. Without this the 100×
    replica (every vector copied 100×) makes the verify C(copies,2)-
    quadratic — dedup_embedding did not finish 400 s there; the probe
    (count + HLL over xxhash64(label, u) — engine-internal, decides
    only which identical-result plan runs) keeps the dup-free fixture
    path unchanged.
    """
    # Probe BEFORE the checkpoint (inside _embedding_class_parts): a
    # localCheckpoint mints a fresh plan id per call, which would defeat
    # the semanticHash probe cache.
    e, parts = _embedding_class_parts(e, threshold)
    if parts is None:
        return _verify_cosine(e, embedding_candidates(e), threshold)
    member, rep_pairs, reps_ok = parts
    mx, my = member.alias("mx"), member.alias("my")
    intra = (
        mx.join(my, "rep")
        .filter(F.col("mx.vec_id") < F.col("my.vec_id"))
        .join(reps_ok, "rep")
        .select(
            F.col("mx.vec_id").alias("vec_a"),
            F.col("my.vec_id").alias("vec_b"),
            "cosine",
        )
    )
    inter = (
        rep_pairs.join(
            member.select(
                F.col("rep").alias("vec_a"), F.col("vec_id").alias("ma")
            ).hint("shuffle_hash"),
            "vec_a",
        )
        .join(
            member.select(
                F.col("rep").alias("vec_b"), F.col("vec_id").alias("mb")
            ).hint("shuffle_hash"),
            "vec_b",
        )
        .select(
            F.least("ma", "mb").alias("vec_a"),
            F.greatest("ma", "mb").alias("vec_b"),
            "cosine",
        )
    )
    return inter.unionAll(intra)


def _embedding_class_build(e: DataFrame, threshold: float):
    """(member, rep_pairs, reps_ok) for an already-checkpointed ``e``."""
    # r11: the class table is built from a MAP-SIDE 128-bit key (md5 of
    # the exact shortest-roundtrip string serialization of (label, u) —
    # double→string is injective, so the key is exact up to md5
    # collision, the same budget as every other class key in this
    # repo). The r10 form used a Window over (label, u), which shuffled
    # and sorted EVERY full vector with a 64-double partition key and
    # cannot partial-aggregate; the groupBy/min over (ck, vec_id) pairs
    # map-combines copies before the shuffle and ships 16-byte rows.
    # Measured a WASH at the local 100× replica (37.4 vs 37.3 s, same
    # host) — the key is OUTPUT-bound there (the expanded pair stream
    # is ~25M rows; the class build is noise) — kept for the shape: on
    # a memory-pressured cluster an un-combinable full-vector window
    # sort is strictly heavier than a partial-aggregated pair shuffle.
    # NULL label serialized explicitly (ADVICE r11): concat_ws SKIPS
    # NULL args, so a bare cast would make (NULL, u) collide with a
    # label-less prefix — injectivity must live in the key construction,
    # not in the fixture's label happening to be a non-null int. The
    # sentinel contains "," + a NUL byte, unreachable from any cast of a
    # numeric/string label followed by the "," separator.
    ck = F.md5(
        F.concat_ws(
            ",",
            F.coalesce(F.col("label").cast("string"), F.lit(",\x00null")),
            F.array_join(F.expr("transform(u, x -> cast(x as string))"), ","),
        )
    )
    keyed = e.select("vec_id", ck.alias("ck"))
    reps = keyed.groupBy("ck").agg(F.min("vec_id").alias("rep"))
    member = (
        keyed.join(reps.hint("shuffle_hash"), "ck")
        .select("rep", "vec_id")
        .localCheckpoint(eager=False)
    )
    e_rep = e.join(
        member.filter(F.col("rep") == F.col("vec_id"))
        .select("vec_id")
        .hint("shuffle_hash"),
        "vec_id",
        "semi",
    ).localCheckpoint(eager=False)
    rep_pairs = _verify_cosine(e_rep, embedding_candidates(e_rep), threshold)

    self_cos = F.round(
        F.expr("aggregate(zip_with(u, u, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"),
        6,
    )
    reps_ok = (
        e_rep.select(F.col("vec_id").alias("rep"), self_cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .hint("shuffle_hash")
    )
    return member, rep_pairs, reps_ok


@query("dedup_embedding", DEDUP_EMBEDDING_SQL)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X5 embedding-cosine near-dup pairs, blocked by (label, LSH bucket).

    Candidate generation reuses the knn_lsh sign-bit hyperplane buckets
    with 1-bit multi-probe (embeddings.lsh_bucketed) instead of all-pairs
    within a label — one label holding 50% of the corpus no longer means
    O(corpus²/4) dot products. Verification: L2-normalized sequential
    dot (Spark ``aggregate`` HOF ≡ DuckDB ``list_sum ∘ list_transform``,
    bit-stable), rounded to 6. The oracle recomputes the identical
    buckets from literal plane constants — same candidates, same pairs.
    """
    prepare(spark)
    return embedding_pairs(
        normalized_embeddings_np(load(spark, sf_dir, "embeddings"))
    )


DEDUP_EMBEDDING_STATS_SQL = f"""
    WITH pairs AS ({DEDUP_EMBEDDING_SQL}),
    lv AS (SELECT vec_id, label FROM embeddings),
    lab AS (SELECT la.label, p.vec_a, p.vec_b,
                   CAST(round(p.cosine * CAST(1000000 AS DOUBLE)) AS BIGINT)
                       AS cmu
            FROM pairs p JOIN lv la ON la.vec_id = p.vec_a),
    np AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                  CAST(SUM(cmu) AS BIGINT) AS sum_cos_micro
           FROM lab GROUP BY label),
    tv AS (SELECT label, CAST(COUNT(DISTINCT vec) AS BIGINT)
                      AS n_vecs_touched
           FROM (SELECT label, vec_a AS vec FROM lab
                 UNION ALL SELECT label, vec_b FROM lab) u
           GROUP BY label)
    SELECT np.label, np.n_pairs, tv.n_vecs_touched, np.sum_cos_micro
    FROM np JOIN tv USING (label)
    """


@query("dedup_embedding_stats", DEDUP_EMBEDDING_STATS_SQL)
def dedup_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X5 label-grain near-dup SUMMARY — dedup_embedding without the
    output bound (VERDICT r12 item 6).

    dedup_embedding's contract is the pair stream itself; at the 100×
    replica that stream is ~25M expanded rows and the key is
    OUTPUT-bound (37 s — SCALE.md r11/r12). The number a curation run
    reports is per blocking label: pair count, distinct vectors
    involved, and the scaled-long cosine mass. On the collapsed path
    this key derives all three from CLASS statistics — inter-class
    pairs contribute cntA·cntB (cosine mass = rep cosine × the
    product), intra-class C(cnt,2) at the class self-cosine, touched
    vectors = Σ cnt over classes with a verified partner or a valid
    self-pair — so the expanded member-pair stream NEVER EXISTS (the
    dedup_cross_source move applied to the label matrix). Exact
    integer identities; the oracle recomputes from the naive expanded
    formulation.
    """
    prepare(spark)
    e, parts = _embedding_class_parts(
        normalized_embeddings_np(load(spark, sf_dir, "embeddings")), EMB_COSINE_T
    )
    lv = e.select("vec_id", "label")
    cmu = F.round(F.col("cosine") * F.lit(1000000.0)).cast("long")
    if parts is None:
        pairs = _verify_cosine(e, embedding_candidates(e), EMB_COSINE_T)
        lab = pairs.join(
            lv.withColumnRenamed("vec_id", "vec_a").hint("shuffle_hash"),
            "vec_a",
        ).select("label", "vec_a", "vec_b", cmu.alias("cmu"))
        np_ = lab.groupBy("label").agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("cmu").cast("long").alias("sum_cos_micro"),
        )
        tv = (
            lab.select("label", F.explode(F.array("vec_a", "vec_b")).alias("vec"))
            .distinct()
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs_touched"))
        )
        return np_.join(tv, "label").select(
            "label", "n_pairs", "n_vecs_touched", "sum_cos_micro"
        )
    member, rep_pairs, reps_ok = parts
    cls = member.groupBy("rep").agg(F.count(F.lit(1)).alias("cnt"))
    rep_lab = lv.withColumnRenamed("vec_id", "rep")
    inter = (
        rep_pairs.join(
            cls.select(F.col("rep").alias("vec_a"), F.col("cnt").alias("ca")).hint(
                "shuffle_hash"
            ),
            "vec_a",
        )
        .join(
            cls.select(F.col("rep").alias("vec_b"), F.col("cnt").alias("cb")).hint(
                "shuffle_hash"
            ),
            "vec_b",
        )
        .join(
            rep_lab.withColumnRenamed("rep", "vec_a").hint("shuffle_hash"),
            "vec_a",
        )
        .select(
            "label",
            (F.col("ca") * F.col("cb")).cast("long").alias("np"),
            (cmu * F.col("ca") * F.col("cb")).cast("long").alias("cs"),
        )
    )
    intra = (
        reps_ok.join(cls, "rep")
        .filter(F.col("cnt") >= 2)
        .join(rep_lab.hint("shuffle_hash"), "rep")
        .select(
            "label",
            F.expr("cnt * (cnt - 1) div 2").cast("long").alias("np"),
            (cmu * F.expr("cnt * (cnt - 1) div 2")).cast("long").alias("cs"),
        )
    )
    np_ = (
        inter.unionAll(intra)
        .groupBy("label")
        .agg(
            F.sum("np").cast("long").alias("n_pairs"),
            F.sum("cs").cast("long").alias("sum_cos_micro"),
        )
    )
    # touched classes: any side of a verified rep pair, or an intra-valid
    # class with >= 2 members — every member of such a class appears in
    # >= 1 expanded pair, members of other classes in none.
    touched = (
        rep_pairs.select(F.col("vec_a").alias("rep"))
        .unionAll(rep_pairs.select(F.col("vec_b").alias("rep")))
        .unionAll(
            reps_ok.join(cls, "rep").filter(F.col("cnt") >= 2).select("rep")
        )
        .distinct()
    )
    tv = (
        touched.join(cls.hint("shuffle_hash"), "rep")
        .join(rep_lab.hint("shuffle_hash"), "rep")
        .groupBy("label")
        .agg(F.sum("cnt").cast("long").alias("n_vecs_touched"))
    )
    return np_.join(tv, "label").select(
        "label", "n_pairs", "n_vecs_touched", "sum_cos_micro"
    )


DEDUP_APPLY_SQL = f"""
    WITH labels AS (SELECT doc_id, cluster_id FROM ({DEDUP_CLUSTERS_SQL}) t),
    k AS (
        SELECT d.doc_id, d.n_chars,
               (l.doc_id IS NULL OR l.doc_id = l.cluster_id) AS kept
        FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id
    ),
    b AS (
        SELECT doc_id // 1000 AS bkt,
               md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
                   AS bmd5
        FROM k WHERE kept GROUP BY bkt
    ),
    dg AS (SELECT md5(string_agg(bmd5, ',' ORDER BY bkt)) AS kept_md5 FROM b),
    s AS (
        SELECT CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(SUM(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               CAST(SUM(CASE WHEN kept THEN n_chars END) AS BIGINT)
                   AS kept_chars
        FROM k
    )
    SELECT s.n_kept, s.n_dropped, s.kept_chars, dg.kept_md5 FROM s, dg
    """


@query("dedup_apply", DEDUP_APPLY_SQL)
def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 end-to-end dedup APPLY: actually drop the duplicates.

    Pairs → components → keep rule (``doc_id == cluster_id``, i.e. each
    component survives through its min-id representative; docs in no
    pair keep themselves via the left join's NULL) → surviving-corpus
    stats. This is the pass every training pipeline runs after the
    cluster labels exist — VERDICT r5 task 5. The oracle re-derives the
    components with its independent recursive-CTE closure and applies
    the same keep rule.

    The kept-id digest is a TWO-LEVEL merkle-ish md5: per-1000-id
    bucket digests (ordered within bucket), then one digest over the
    bucket digests (ordered by bucket). Each aggregation buffer is
    bounded (≤1000 ids / ≤n/1000 bucket digests) instead of one
    corpus-sized sorted concat — the shape that survives 100 TB, where
    the outer level would recurse once more. md5 hex is identical on
    both engines (registry.py rules); ids sort NUMERICALLY both sides
    (sort_array on longs / ORDER BY doc_id), never as strings.
    """
    prepare(spark)
    docs = load(spark, sf_dir, "documents")
    labels = minhash_components(docs).select(
        "doc_id", "cluster_id"
    )
    k = (
        docs.select("doc_id", "n_chars")
        .join(labels.hint("merge"), "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            (
                F.col("cluster_id").isNull()
                | (F.col("doc_id") == F.col("cluster_id"))
            ).alias("kept"),
        )
        .localCheckpoint(eager=False)  # feeds both stats and the digest
    )
    b = (
        k.filter("kept")
        .groupBy(F.expr("doc_id div 1000").alias("bkt"))
        .agg(
            F.md5(
                F.array_join(
                    F.expr(
                        "transform(sort_array(collect_list(doc_id)),"
                        " x -> cast(x as string))"
                    ),
                    ",",
                )
            ).alias("bmd5")
        )
    )
    dg = b.agg(
        F.md5(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(bkt, bmd5))),"
                    " s -> s.bmd5)"
                ),
                ",",
            )
        ).alias("kept_md5")
    )
    s = k.agg(
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(~F.col("kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
        F.sum(F.when(F.col("kept"), F.col("n_chars")))
        .cast("long")
        .alias("kept_chars"),
    )
    return s.crossJoin(dg)


def _cross_source_flow_from_classes(
    member: DataFrame,
    rep_pairs: DataFrame,
    valid_reps: DataFrame,
    src: DataFrame,
) -> DataFrame:
    """Cross-source flow matrix from CLASS-level statistics (r11).

    On the collapsed path the expanded member-pair stream is a pure
    function of per-(class, source) statistics, so the matrix never
    needs it materialized:

    - ``n_pairs``: inter-class pairs contribute cntA(s)·cntB(t) per
      verified class pair, intra-class pairs cnt(s)·cnt(t) for s<t and
      C(cnt,2) for s=t — integer products grouped by the canonical
      source pair (`div` keeps C(n,2) integer, the float-parity rule).
    - ``n_docs_touched`` = COUNT(DISTINCT doc_a) + COUNT(DISTINCT
      doc_b): member x is a doc_a of group (s,t) iff SOME partner with
      source t has an id above x — an existence test against the MAX
      (resp. MIN for doc_b) partner id per (class, source), where
      "partner" classes are the class itself (intra, valid classes
      only) plus every class it shares a verified rep pair with.
      Member-grain flags, max-reduced per (group, member), then summed.

    Every frame here is class- or member-grain — the C(copies,2)
    member-pair stream never exists. All sides grow with the corpus →
    shuffle_hash hints (the r6 static-broadcast rule).
    """
    member_src = member.join(src.hint("shuffle_hash"), "doc_id").select(
        "rep", "doc_id", "source"
    )
    cs = (
        member_src.groupBy("rep", "source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("doc_id").alias("mn"),
            F.max("doc_id").alias("mx"),
        )
        .localCheckpoint(eager=False)
    )
    csv = cs.join(valid_reps, "rep", "semi")

    canon = [
        F.least("s", "t").alias("source_x"),
        F.greatest("s", "t").alias("source_y"),
    ]
    inter_np = (
        rep_pairs.join(
            cs.select(
                F.col("rep").alias("doc_a"),
                F.col("source").alias("s"),
                F.col("cnt").alias("ca"),
            ).hint("shuffle_hash"),
            "doc_a",
        )
        .join(
            cs.select(
                F.col("rep").alias("doc_b"),
                F.col("source").alias("t"),
                F.col("cnt").alias("cb"),
            ).hint("shuffle_hash"),
            "doc_b",
        )
        .select(*canon, (F.col("ca") * F.col("cb")).alias("np"))
    )
    ca, cb = csv.alias("ca"), csv.alias("cb")
    intra_np = (
        ca.join(cb, "rep")
        .filter(F.col("ca.source") <= F.col("cb.source"))
        .select(
            F.col("ca.source").alias("source_x"),
            F.col("cb.source").alias("source_y"),
            F.when(
                F.col("ca.source") == F.col("cb.source"),
                F.expr("`ca`.cnt * (`ca`.cnt - 1) div 2"),
            )
            .otherwise(F.col("ca.cnt") * F.col("cb.cnt"))
            .alias("np"),
        )
        .filter(F.col("np") > 0)
    )
    # Partner id envelope per (class, source): the class itself (valid
    # classes only — intra pairs need a non-empty shingle set) plus all
    # rep-paired classes, max/min-reduced so the member flag test is
    # one comparison per (member, partner source).
    rp_bi = rep_pairs.select(
        F.col("doc_a").alias("rep"), F.col("doc_b").alias("p")
    ).unionAll(
        rep_pairs.select(F.col("doc_b").alias("rep"), F.col("doc_a").alias("p"))
    )
    inter_stats = rp_bi.join(
        cs.select(F.col("rep").alias("p"), "source", "mn", "mx").hint(
            "shuffle_hash"
        ),
        "p",
    ).select("rep", "source", "mn", "mx")
    pstats = (
        inter_stats.unionAll(csv.select("rep", "source", "mn", "mx"))
        .groupBy("rep", F.col("source").alias("t"))
        .agg(F.max("mx").alias("pmax"), F.min("mn").alias("pmin"))
    )
    flags = (
        member_src.join(pstats.hint("shuffle_hash"), "rep")
        .select(
            F.least("source", "t").alias("source_x"),
            F.greatest("source", "t").alias("source_y"),
            "doc_id",
            (F.col("pmax") > F.col("doc_id")).cast("int").alias("fa"),
            (F.col("pmin") < F.col("doc_id")).cast("int").alias("fb"),
        )
        .groupBy("source_x", "source_y", "doc_id")
        .agg(F.max("fa").alias("fa"), F.max("fb").alias("fb"))
    )
    zero = F.lit(0).cast("long")
    tagged = (
        inter_np.select(
            "source_x", "source_y", F.col("np").cast("long"), zero.alias("fa"), zero.alias("fb")
        )
        .unionAll(
            intra_np.select(
                "source_x", "source_y", F.col("np").cast("long"), zero, zero
            )
        )
        .unionAll(
            flags.select(
                "source_x",
                "source_y",
                zero.alias("np"),
                F.col("fa").cast("long"),
                F.col("fb").cast("long"),
            )
        )
    )
    return (
        tagged.groupBy("source_x", "source_y")
        .agg(
            F.sum("np").cast("long").alias("n_pairs"),
            (F.sum("fa") + F.sum("fb")).cast("long").alias("n_docs_touched"),
        )
        .filter(F.col("n_pairs") > 0)
    )


@query(
    "dedup_cross_source",
    f"""
    WITH pairs AS ({minhash_pairs_sql("documents")}),
    lab AS (
        SELECT p.doc_a, p.doc_b,
               least(da.source, db.source) AS source_x,
               greatest(da.source, db.source) AS source_y
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
    )
    SELECT source_x, source_y,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT doc_a) + COUNT(DISTINCT doc_b) AS BIGINT)
               AS n_docs_touched
    FROM lab GROUP BY source_x, source_y
    """,
)
def dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5-EXT cross-source near-duplication matrix (contamination flow).

    The corpus-diagnosis view on top of the MinHash pair stream: for
    each unordered source pair, how many near-dup pairs (and docs) link
    them — which feeds copy from which, and how much of a source's
    content is mirrored elsewhere. Crawl curation uses exactly this to
    decide per-domain dedup priorities and licensing review.

    Plan: reuses the minhash structure (banded LSH candidates —
    bucketed, never all-pairs). Direct path: joins the pair endpoints
    to their sources — the pair stream is near-dup-sized (≪ corpus), so
    the endpoint joins are the cheap side; the source matrix is
    (sources × sources)-bounded. Collapsed path (r11 verdict item 3):
    the matrix is derived from class-level counts and id envelopes
    (_cross_source_flow_from_classes) WITHOUT materializing the
    C(copies,2) expanded pair stream this key aggregated through r10
    (34.3 s at the 100× replica). The source pair is canonicalized with
    least/greatest so the matrix is triangular and
    engine-order-independent; the full-formulation oracle is unchanged
    and proves both paths.
    """
    prepare(spark)
    docs = spread(load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet", min_rows_per_split=2_000)
    member, rep_pairs, valid_reps = _minhash_structure(docs, MINHASH_JACCARD_T)
    src = docs.select("doc_id", "source")
    if member is not None:
        # Collapsed path (r11, verdict item 3): the flow matrix is a
        # sum over CLASS pairs of member-count products — computable
        # from per-(class, source) statistics without materializing the
        # expanded member-pair stream this key used to aggregate
        # (C(copies,2)-sized at the 100× replica; 34.3 s there in r10).
        return _cross_source_flow_from_classes(
            member, rep_pairs, valid_reps, src
        )
    pairs = rep_pairs  # direct path: rep_pairs IS the verified pair set
    lab = (
        pairs.join(
            src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "source", "sa"
            ).hint("merge"),
            "doc_a",
        )
        .join(
            src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "source", "sb"
            ).hint("merge"),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.least("sa", "sb").alias("source_x"),
            F.greatest("sa", "sb").alias("source_y"),
        )
    )
    return lab.groupBy("source_x", "source_y").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.count_distinct("doc_a") + F.count_distinct("doc_b")).alias(
            "n_docs_touched"
        ),
    )


# --------------------------------------------------------------------------
# Substring-grain dedup (r13, VERDICT r12 item 2) — the Lee et al.
# "Deduplicating Training Data Makes Language Models Better" transform:
# the doc-grain family above DECIDES which documents are duplicates;
# this operator marks repeated ≥K-token SPANS inside every document
# (boilerplate headers, licence blocks, templated fragments) and emits
# the per-doc retained/dropped accounting a curation pipeline applies.

SUBSTR_K = 8  #: span grain in tokens (the quality_crossdup 8-gram grain)

#: Mega-hot-gram skew probe (r14, VERDICT r13 wrong #2). The window-sum
#: gram-total shape wins on organic corpora (SCALE.md r13 A/B: 14.9 vs
#: 17.7 s at 100×) but a boilerplate 8-gram at ~1e9 occurrences
#: single-partitions the window sort; the semi-join form is
#: value-identical and AQE-skew-splittable. MEASURED at the 100×
#: forced-skew replica (boilerplate appended to 1/3 of 500k docs →
#: nine ~8M-occurrence gram classes): the window STILL wins there —
#: 7.4 s vs the semi-join's 17.6 s — because two full gram-stream
#: shuffles (agg + join-back) cost more than one 8M-row in-task sort
#: (SCALE.md r14). The flip threshold is therefore an ABSOLUTE
#: extrapolated hot-partition size, set where a single sort task
#: becomes the wall (~5e7 rows ≈ GBs in one task, minutes of one-core
#: sort + spill), NOT a panel fraction: the probe extrapolates the
#: hottest gram's global occurrence count from the bounded
#: fixed-id-range panel (PANEL_DOC_SQL — corpus-independent cost, the
#: dedup_recall_v2 panel rule) as max_panel_count × n_docs / n_panel.
#: Choice is plan-only — both shapes are oracle-identical (flip
#: equivalence pinned in tests/test_r14_keys.py with a test-scaled
#: threshold, since 5e7-occurrence grams are not constructible in a
#: local fixture).
SUBSTR_SKEW_MIN_HOT = 50_000_000

_GRAM_SKEW_CACHE: dict[int, bool] = {}


def _gram_skew_material(docs: DataFrame) -> bool:
    """True when the panel probe extrapolates some SUBSTR_K-gram to a
    window partition ≥ SUBSTR_SKEW_MIN_HOT rows at corpus scale.
    Cached per analyzed-plan semanticHash (the _probe_material
    contract); probed on RAW docs — on dup-heavy corpora the class
    collapse shrinks hot partitions, so this over-detects there, which
    only costs the semi-join's extra shuffle, never correctness.

    RESIDUAL BLINDNESS (ADVICE r14, acknowledged): the probe samples a
    fixed doc_id residue (PANEL_DOC_SQL), so boilerplate whose presence
    is CORRELATED with that residue is invisible — the window form
    would then single-partition the hot gram's sort at extreme skew.
    This is a perf-DNF risk only (both shapes are oracle-identical);
    corpora with id-correlated boilerplate should flip to the semi-join
    form manually (the documented escape hatch in dedup_substrings).
    An EMPTY panel (degenerate/re-keyed corpus) falls back to probing
    the full corpus — affordable exactly when the panel can be empty.
    """
    try:
        key = docs._jdf.queryExecution().analyzed().semanticHash()
        cached = _GRAM_SKEW_CACHE.get(key)
        if cached is not None:
            return cached
    except Exception:  # noqa: BLE001 - private API drift: probe uncached
        key = None
    k = SUBSTR_K
    panel = docs.filter(F.expr(PANEL_DOC_SQL))
    n_panel = panel.count()
    if n_panel == 0:
        # empty-panel fallback (ADVICE r14): probe the whole corpus —
        # a corpus whose panel is empty is degenerate-small or re-keyed,
        # so the full probe costs what the panel probe would have.
        panel = docs
        n_panel = docs.count()
    g = (
        panel.select(
            F.expr("filter(split(text, ' '), x -> x <> '')").alias("t")
        )
        .filter(F.size("t") >= k)
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {k} + 1),"
                    f" p -> md5(array_join(slice(t, p, {k}), ' ')))"
                )
            ).alias("gh")
        )
    )
    mx_row = (
        g.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("mx"))
        .collect()[0]
    )
    mx = mx_row["mx"] or 0
    n_docs = docs.count()
    extrapolated = mx * (n_docs / n_panel) if n_panel else 0.0
    verdict = extrapolated >= SUBSTR_SKEW_MIN_HOT
    if key is not None:
        _GRAM_SKEW_CACHE[key] = verdict
    return verdict

#: Per-(pos, token) digest term — the dialect-neutral md5-uniform
#: (operators/sort._u24_expr); retained_sig sums it over RETAINED
#: positions as total − covered (u24 sums are additive integers, so no
#: anti-join or ordered string assembly is ever needed).
def _substr_u24(cast_type: str) -> str:
    from ls_hadoop_3_0_spark.operators.sort import _u24_expr

    return _u24_expr(f"concat(CAST(pos AS {cast_type}), ':', tok)")


def _dedup_substrings_sql(k: int = SUBSTR_K) -> str:
    """Naive doc-grain DuckDB mirror: gram totals (within-doc repeats
    count), duplicated starts, gaps-and-islands spans (merge when the
    next start is ≤ K after the previous — overlap or exact adjacency),
    DISTINCT covered positions, and the additive u24 signatures."""
    u24 = _substr_u24("VARCHAR")
    return f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents),
    gp AS (SELECT doc_id, t,
                  unnest(generate_series(1, len(t) - {k} + 1)) AS p
           FROM toks WHERE len(t) >= {k}),
    g AS (SELECT doc_id, p,
                 md5(array_to_string(t[p:p + {k} - 1], ' ')) AS gh
          FROM gp),
    tot AS (SELECT gh, CAST(COUNT(*) AS BIGINT) AS total FROM g GROUP BY gh),
    dup AS (SELECT g.doc_id, g.p FROM g JOIN tot USING (gh)
            WHERE total >= 2),
    brk AS (SELECT doc_id, p,
                   CASE WHEN p - lag(p) OVER (PARTITION BY doc_id
                                              ORDER BY p) <= {k}
                        THEN 0 ELSE 1 END AS b
            FROM dup),
    spans AS (SELECT doc_id, CAST(SUM(b) AS BIGINT) AS n_spans
              FROM brk GROUP BY doc_id),
    cov AS (SELECT DISTINCT doc_id, pos FROM
            (SELECT doc_id, unnest(generate_series(p, p + {k} - 1)) AS pos
             FROM dup) c0),
    tp AS (SELECT doc_id, unnest(t) AS tok,
                  unnest(generate_series(1, len(t))) AS pos
           FROM toks),
    tpu AS (SELECT doc_id, pos, {u24} AS u24 FROM tp),
    tsig AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                    CAST(SUM(u24) AS BIGINT) AS total_sig
             FROM tpu GROUP BY doc_id),
    csig AS (SELECT tpu.doc_id, CAST(COUNT(*) AS BIGINT) AS dropped_tokens,
                    CAST(SUM(u24) AS BIGINT) AS cov_sig
             FROM cov JOIN tpu USING (doc_id, pos) GROUP BY tpu.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(tsig.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(spans.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(csig.dropped_tokens, 0) AS BIGINT) AS dropped_tokens,
           CAST(COALESCE(tsig.n_tokens, 0)
                - COALESCE(csig.dropped_tokens, 0) AS BIGINT)
               AS retained_tokens,
           CAST(COALESCE(tsig.total_sig, 0)
                - COALESCE(csig.cov_sig, 0) AS BIGINT) AS retained_sig
    FROM documents d
    LEFT JOIN tsig USING (doc_id)
    LEFT JOIN spans USING (doc_id)
    LEFT JOIN csig USING (doc_id)
    """


@query("dedup_substrings", _dedup_substrings_sql())
def dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X7 substring-grain dedup (Lee et al. 2022, re-expressed
    Spark-first): mark every duplicated ≥SUBSTR_K-token span and emit
    per-doc retained/dropped accounting.

    Semantics: an 8-gram is DUPLICATED iff its corpus-wide occurrence
    count is ≥ 2 (cross-doc copies AND within-doc repeats — the Lee
    et al. rule). Duplicated gram starts merge into SPANS by
    gaps-and-islands (next start ≤ K after the previous ⇒ overlapping
    or touching coverage — the scd2_history island trick applied to
    token offsets); dropped = DISTINCT covered positions. The retained
    text rides an ADDITIVE digest: retained_sig = Σ u24(md5(pos:tok))
    over retained positions, computed as total − covered (u24 sums are
    integers, so subtraction replaces span assembly — the r7 associative
    digest rule; full-text equality is pinned against a pure-python
    reference in tests/test_r13_keys.py).

    Plan/scale: the gram stream shuffles ONCE (window-sum totals on the
    gram hash — the quality_crossdup lesson: never join a per-gram flag
    back) — UNLESS the bounded-panel skew probe (_gram_skew_material,
    r14) extrapolates a ≥SUBSTR_SKEW_MIN_HOT-row hot gram, in which
    case the value-identical agg+semi-join form runs instead (partial
    agg combines the hot gram map-side; AQE skew-splits the join — a
    boilerplate 8-gram at 1e9 occurrences would single-partition the
    window sort; below that wall the window wins even on skewed
    corpora — measured both ways, see the probe's docstring and
    SCALE.md r14); islands/coverage run on the DUPLICATED subset; the token
    stream shuffles once for the covered-signature join. Under the r11
    class collapse (probe-gated) every stream runs at content-class
    grain weighted by class size — gram totals are Σ class_size ×
    rep-occurrences, an exact integer identity — and members inherit by
    content hash (retained stats are pure text functions given the
    totals).
    """
    prepare(spark)
    from ls_hadoop_3_0_spark.llm.curation import _text_class_structure

    k = SUBSTR_K
    docs = spread(
        load(spark, sf_dir, "documents"), f"{sf_dir}/documents.parquet"
    ).select("doc_id", "text")
    skewed = _gram_skew_material(docs)  # before any checkpoint (r10 rule)
    keyed, gate_docs = _text_class_structure(docs)
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    cols = ["doc_id"] if keyed is None else ["doc_id", "h", "m"]
    wcol = (F.col("m") if keyed is not None else F.lit(1)).cast("long")
    t = gate_docs.select(*cols, toks.alias("t"))
    g = (
        t.filter(F.size("t") >= k)
        .select(
            "doc_id",
            wcol.alias("w"),
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {k} + 1),"
                    f" p -> named_struct('p', p,"
                    f" 'gh', md5(array_join(slice(t, p, {k}), ' '))))"
                )
            ).alias("s"),
        )
        .select("doc_id", "w", F.col("s.p").alias("p"), F.col("s.gh").alias("gh"))
    )
    if skewed:
        # Probe said some gram is corpus-fraction hot: the window form
        # would single-partition its sort. Value-identical semi-join
        # form — partial agg combines the hot gram map-side and AQE can
        # skew-split the join (SCALE.md r13 A/B escape hatch, now
        # self-selecting).
        tot = g.groupBy("gh").agg(F.sum("w").alias("total"))
        dup = g.join(
            tot.filter(F.col("total") >= 2).hint("shuffle_hash"),
            "gh",
            "semi",
        ).select("doc_id", "p")
    else:
        # ONE gram-stream shuffle: window-sum of class-weighted
        # occurrences — the organic-corpus winner.
        dup = (
            g.withColumn("total", F.sum("w").over(Window.partitionBy("gh")))
            .filter(F.col("total") >= 2)
            .select("doc_id", "p")
        )
    wd = Window.partitionBy("doc_id").orderBy("p")
    isl = dup.withColumn(
        "b",
        F.when(F.col("p") - F.lag("p").over(wd) <= k, F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    spans = isl.groupBy("doc_id").agg(F.sum("b").cast("long").alias("n_spans"))
    cov = dup.select(
        "doc_id", F.explode(F.expr(f"sequence(p, p + {k} - 1)")).alias("pos")
    ).distinct()
    tp = t.select("doc_id", F.posexplode("t").alias("pos0", "tok")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    tpu = tp.select(
        "doc_id", "pos", F.expr(_substr_u24("STRING")).alias("u24")
    )
    tsig = tpu.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("u24").alias("total_sig")
    )
    csig = (
        cov.join(tpu.hint("shuffle_hash"), ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dropped_tokens"),
            F.sum("u24").alias("cov_sig"),
        )
    )
    stats = (
        gate_docs.select(*cols)
        .join(tsig.hint("shuffle_hash"), "doc_id", "left")
        .join(spans.hint("shuffle_hash"), "doc_id", "left")
        .join(csig.hint("shuffle_hash"), "doc_id", "left")
    )
    n_tokens = F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
    dropped = F.coalesce(F.col("dropped_tokens"), F.lit(0)).cast("long")
    out = [
        n_tokens.alias("n_tokens"),
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        dropped.alias("dropped_tokens"),
        (n_tokens - dropped).alias("retained_tokens"),
        (
            F.coalesce(F.col("total_sig"), F.lit(0))
            - F.coalesce(F.col("cov_sig"), F.lit(0))
        ).cast("long").alias("retained_sig"),
    ]
    if keyed is None:
        return stats.select("doc_id", *out)
    # class expansion: retained stats are pure text functions given the
    # class-weighted totals — members inherit by content hash.
    return keyed.join(
        stats.select("h", *out).hint("shuffle_hash"), "h"
    ).select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "dropped_tokens",
        "retained_tokens",
        "retained_sig",
    )


# ---------------------------------------------------------------------------
# dedup_incremental (r14) — cross-snapshot dedup: a NEW crawl slice probed
# against a FROZEN prior-corpus index (VERDICT r13 missing #1). Every
# production crawl update dedups new documents against the previous
# snapshot WITHOUT re-shuffling the old side; this key composes the
# repo's existing parts (exact md5 classes, minhash band machinery, the
# sink_sorted_indexed bucketed layout) into that operator.

#: Corpus split: ~80% "prior" snapshot / ~20% "new" increment. Modulo on
#: doc_id (not a literal range) so the split stays proportional at every
#: SF and under tools/replicate_corpus.py's +10M-per-copy id shift
#: (10M % 10 == 0 preserves the residue class).
INCR_PRIOR_PRED = "doc_id % 10 < 8"
INCR_NEW_PRED = "doc_id % 10 >= 8"

#: Bucket count for the frozen index tables. A constant of the INDEX
#: (like N_BANDS), not of the corpus: at 100 TB you would provision
#: thousands; the layout and the probe plan shape are scale-free.
INCR_BUCKETS = 16

#: Per-PROCESS tag for index table names/paths — same rationale as
#: similarity._IVF_INDEX_RUN: concurrent sessions (pytest + bench) must
#: never race an overwrite against a read of the same table.
_INCR_RUN = __import__("uuid").uuid4().hex[:12]

#: (sf tag) -> (exact_tbl, bands_tbl, shingles_tbl). The index is FROZEN
#: by contract — build once per process, probe many times (the serving
#: economics the key models: the build amortizes across increments).
_INCR_TABLES: dict[str, tuple[str, str, str]] = {}


def _bands_sql(sh_cte: str) -> str:
    """DuckDB band-signature subquery over a named shingle CTE (the
    minhash_candidates_cte band stage, parametrized by source)."""
    return f"""
        SELECT doc_id, b,
               mins[b*{ROWS_PER_BAND}+1] || mins[b*{ROWS_PER_BAND}+2]
                   || mins[b*{ROWS_PER_BAND}+3] AS sig
        FROM (SELECT doc_id,
                     list_transform(generate_series(0, {N_HASHES - 1}),
                         s -> list_min(list_transform(shingles,
                              g -> md5(concat(CAST(s AS VARCHAR), ':', g))))) AS mins
              FROM {sh_cte})
        CROSS JOIN (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS b)
"""


DEDUP_INCREMENTAL_SQL = f"""
    WITH priord AS (SELECT * FROM documents WHERE {INCR_PRIOR_PRED}),
    newd AS (SELECT * FROM documents WHERE {INCR_NEW_PRED}),
    shp AS ({sh_sql("priord")}),
    shn AS ({sh_sql("newd")}),
    bp AS ({_bands_sql("shp")}),
    bn AS ({_bands_sql("shn")}),
    cand AS (
        SELECT DISTINCT n.doc_id AS nid, p.doc_id AS pid
        FROM bn n JOIN bp p ON n.b = p.b AND n.sig = p.sig
    ),
    ver AS (
        SELECT nid, CAST(COUNT(*) AS BIGINT) AS n_near, MAX(j) AS max_jaccard
        FROM (SELECT cand.nid,
                     round(CAST(len(list_intersect(a.shingles, b.shingles))
                                AS DOUBLE)
                           / len(list_distinct(list_concat(a.shingles,
                                                           b.shingles))),
                           6) AS j
              FROM cand
              JOIN shn a ON a.doc_id = cand.nid
              JOIN shp b ON b.doc_id = cand.pid)
        WHERE j >= {MINHASH_JACCARD_T}
        GROUP BY nid
    ),
    pck AS (SELECT DISTINCT md5(text) AS ck FROM priord)
    SELECT n.doc_id,
           CAST(CASE WHEN md5(n.text) IN (SELECT ck FROM pck)
                     THEN 1 ELSE 0 END AS INT) AS exact_dup,
           CAST(COALESCE(v.n_near, 0) AS BIGINT) AS n_near,
           v.max_jaccard AS max_jaccard
    FROM newd n LEFT JOIN ver v ON v.nid = n.doc_id
"""


def incremental_prior_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Materialize the FROZEN prior-snapshot dedup index (once/process).

    Three bucketed+sorted tables (the sink_sorted_indexed MapFile layout,
    sources/io.py:536):

    - ``exact``:  one row per distinct prior text class
      ``(ck = md5(text), first_doc)``, bucketed by ck — the exact-dup
      probe is a co-located join (and a 1-of-N bucket-pruned point
      lookup for audits, like sink_indexed_lookup).
    - ``bands``:  per-doc LSH band signatures ``(doc_id, bsig)`` with
      ``bsig = b || ':' || sig`` (injective: b is one digit, sig is
      fixed-width hex — the single-column form of the (b, sig) key,
      because co-partitioned joins need the bucket columns to BE the
      join keys: requireAllClusterKeysForCoPartition), bucketed by
      bsig — band collisions against the new slice are a merge join
      with ZERO exchange on this (corpus-scale) side.
    - ``shingles``: ``(doc_id, shingles)`` bucketed by doc_id — the
      Jaccard verify reads prior shingle sets co-located by key.

    At 100 TB the build is one pass over the snapshot, written once and
    probed by every subsequent crawl increment; only the (much smaller)
    new side ever shuffles.
    """
    tag = (
        os.path.basename(os.path.normpath(sf_dir))
        .replace(".", "_")
        .replace("-", "_")
    )
    if tag in _INCR_TABLES:
        from ls_hadoop_3_0_spark.sources.io import scratch, touch_heartbeat

        for name in _INCR_TABLES[tag]:  # keep frozen dirs prune-safe
            touch_heartbeat(scratch(sf_dir, f"{name}_data"))
        return _INCR_TABLES[tag]
    from ls_hadoop_3_0_spark.sources.io import run_scratch

    prior = load(spark, sf_dir, "documents").filter(F.expr(INCR_PRIOR_PRED))
    sh, bands = minhash_bands(prior)
    bands = bands.select(
        "doc_id",
        F.concat(F.col("b").cast("string"), F.lit(":"), F.col("sig")).alias("bsig"),
    )
    names = (
        f"incr_exact_{tag}_{_INCR_RUN}",
        f"incr_bands_{tag}_{_INCR_RUN}",
        f"incr_sh_{tag}_{_INCR_RUN}",
    )
    exact = (
        prior.select(F.md5("text").alias("ck"), "doc_id")
        .groupBy("ck")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    for name, df, key, kind in (
        (names[0], exact, "ck", "exact"),
        (names[1], bands, "bsig", "bands"),
        (names[2], sh, "doc_id", "sh"),
    ):
        path = run_scratch(
            sf_dir,
            f"{name}_data",
            stem=f"incr_{kind}_{tag}_",
            table=name,
        )
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(INCR_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(name)
        )
    _INCR_TABLES[tag] = names
    return names


@query("dedup_incremental", DEDUP_INCREMENTAL_SQL)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-EXT incremental cross-snapshot dedup: flag each NEW doc
    duplicated against the FROZEN prior snapshot.

    One row per new doc: ``exact_dup`` (md5-text class already present
    in the prior snapshot), ``n_near`` / ``max_jaccard`` (count / best
    of verified minhash-LSH matches against prior docs, same band
    family and J >= MINHASH_JACCARD_T semantics as dedup_minhash).

    Scale shape (the reason this is an operator, not a filter): the
    prior side is PROBED, never re-shuffled — all three prior-index
    joins (ck equality, (b, sig) band collision, shingle fetch by
    doc_id) are merge joins against bucketed tables whose scan carries
    the bucket hash as its output partitioning, so the plan has NO
    Exchange above any prior-side scan (asserted in
    tests/test_r14_keys.py); only the new increment shuffles into the
    index layout. Jaccard verify is restricted to band-collision
    candidates (never all-pairs), exactly dedup_minhash's posture.
    """
    prepare(spark)
    t_exact, t_bands, t_sh = incremental_prior_index(spark, sf_dir)
    new = load(spark, sf_dir, "documents").filter(F.expr(INCR_NEW_PRED))

    # exact arm: new ck probed against the prior class index
    marks = spark.table(t_exact).select("ck", F.lit(1).alias("hit"))
    ex = (
        new.select("doc_id", F.md5("text").alias("ck"))
        .join(marks.hint("merge"), "ck", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("hit"), F.lit(0)).cast("int").alias("exact_dup"),
        )
    )

    # near arm: new band signatures probed against the prior band index
    shn, bn = minhash_bands(new)
    bn = bn.select(
        "doc_id",
        F.concat(F.col("b").cast("string"), F.lit(":"), F.col("sig")).alias("bsig"),
    )
    pb = spark.table(t_bands)
    cand = (
        bn.alias("n")
        .join(pb.alias("p").hint("merge"), "bsig")
        .select(F.col("n.doc_id").alias("nid"), F.col("p.doc_id").alias("pid"))
        .distinct()
    )
    psh = spark.table(t_sh).select(
        F.col("doc_id").alias("pid"), F.col("shingles").alias("sh_p")
    )
    jac = F.round(
        F.size(F.array_intersect("sh_n", "sh_p")).cast("double")
        / F.size(F.array_union("sh_n", "sh_p")),
        6,
    )
    # the new-slice sides grow with the corpus — shuffle_hash vetoes
    # Catalyst's static broadcast of the checkpointed intermediates
    # (the r6/r8 rule: an increment is corpus-scale, not a dim)
    ver = (
        cand.join(
            shn.select(
                F.col("doc_id").alias("nid"), F.col("shingles").alias("sh_n")
            ).hint("shuffle_hash"),
            "nid",
        )
        .join(psh.hint("merge"), "pid")
        .select("nid", jac.alias("j"))
        .filter(F.col("j") >= MINHASH_JACCARD_T)
        .groupBy("nid")
        .agg(
            F.count(F.lit(1)).alias("n_near"),
            F.max("j").alias("max_jaccard"),
        )
    )
    return (
        ex.join(ver.withColumnRenamed("nid", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            "exact_dup",
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
            "max_jaccard",
        )
    )


# ---------------------------------------------------------------------------
# dedup_index_compact (r14): the EPOCH ROLL — mint the next snapshot's
# frozen index by merging the new slice INTO the prior index, never
# re-scanning or re-hashing the prior corpus text.


def _index_compact_sql() -> str:
    """Oracle: the next-epoch index contents derived INDEPENDENTLY from
    the full corpus (prior ∪ new = all documents) — exact classes with
    global min doc_id, band rows, shingle rows — reduced to associative
    u24 digests."""
    from ls_hadoop_3_0_spark.operators.sort import _u24_expr

    ck_row = "ck || ':' || CAST(fd AS VARCHAR)"
    band_row = (
        "CAST(b AS VARCHAR) || ':' || sig || '|' || CAST(doc_id AS VARCHAR)"
    )
    # list_distinct's element ORDER is engine-specific — canonicalize
    # through a sort before digesting the set as a string.
    sh_row = (
        "CAST(doc_id AS VARCHAR) || '|'"
        " || array_to_string(list_sort(shingles), ' ')"
    )
    return f"""
    WITH cks AS (
        SELECT md5(text) AS ck, MIN(doc_id) AS fd
        FROM documents GROUP BY md5(text)
    ),
    sh AS ({sh_sql("documents")}),
    bb AS ({_bands_sql("sh")}),
    ca AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM({_u24_expr(ck_row)}) AS BIGINT) AS ck_u24
        FROM cks
    ),
    ba AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_band_rows,
               CAST(SUM({_u24_expr(band_row)}) AS BIGINT) AS band_u24
        FROM bb
    ),
    sa AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sh_docs,
               CAST(SUM({_u24_expr(sh_row)}) AS BIGINT) AS sh_u24
        FROM sh
    )
    SELECT n_classes, ck_u24, n_band_rows, band_u24, n_sh_docs, sh_u24
    FROM ca, ba, sa
    """


def _compact_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(merged exact, bands, shingles) for the next-epoch index: prior
    rows come FROM THE INDEX TABLES (never a prior-text re-scan — each
    frame's plan contains exactly one documents scan, the new slice's,
    asserted in tests/test_r14_keys.py); only the new slice pays
    hashing/shingling/signatures."""
    t_exact, t_bands, t_sh = incremental_prior_index(spark, sf_dir)
    new = load(spark, sf_dir, "documents").filter(F.expr(INCR_NEW_PRED))
    merged_exact = (
        spark.table(t_exact)
        .select("ck", F.col("first_doc").alias("doc_id"))
        .unionAll(new.select(F.md5("text").alias("ck"), "doc_id"))
        .groupBy("ck")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    sh_new, bands_new = minhash_bands(new)
    bands_new = bands_new.select(
        "doc_id",
        F.concat(F.col("b").cast("string"), F.lit(":"), F.col("sig")).alias("bsig"),
    )
    merged_bands = spark.table(t_bands).unionAll(bands_new)
    merged_sh = spark.table(t_sh).unionAll(sh_new)
    return merged_exact, merged_bands, merged_sh


@query("dedup_index_compact", _index_compact_sql())
def dedup_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2-EXT snapshot-index epoch roll: merge the NEW slice into the
    FROZEN prior index, producing the next epoch's index — the
    maintenance operation that makes incremental dedup a lifecycle, not
    a one-shot.

    The prior side is read from the BUCKETED INDEX TABLES (precomputed
    ck / band / shingle rows — the corpus text is never re-scanned or
    re-hashed: the plan contains exactly ONE documents scan, the new
    slice's, asserted in tests/test_r14_keys.py); only the new slice
    pays shingling and signatures. Merged exact classes take the global
    min doc_id (prior first_doc is already the prior-side min, so one
    groupBy over index ∪ new-slice rows suffices); band and shingle
    rows union. The roll is DURABLE: the merged tables are written as
    the next epoch's bucketed index (same layout, "_next" suffix), then
    digested FROM THE WRITTEN TABLES — so the value compared against
    the oracle proves the on-disk artifact, not an in-plan intermediate.

    The oracle re-derives the same contents independently from the full
    corpus (prior ∪ new = all documents) — if the merge missed or
    duplicated anything, the digests diverge.
    """
    prepare(spark)
    from ls_hadoop_3_0_spark.operators.sort import _u24_expr
    from ls_hadoop_3_0_spark.sources.io import run_scratch

    merged_exact, merged_bands, merged_sh = _compact_frames(spark, sf_dir)

    tag = (
        os.path.basename(os.path.normpath(sf_dir))
        .replace(".", "_")
        .replace("-", "_")
    )
    # The three epoch tables are independent writes — submit them from a
    # small thread pool so each job's straggler tail back-fills with the
    # next one's tasks (guide §2.6 overlap; jobs are FIFO-scheduled in
    # one application). run_scratch registration stays on the caller
    # thread: it mutates process-global cleanup state and the scratch
    # namespace, and the pruning glob must not race itself.
    from concurrent.futures import ThreadPoolExecutor

    specs = []
    for kind, df, key in (
        ("exact", merged_exact, "ck"),
        ("bands", merged_bands, "bsig"),
        ("sh", merged_sh, "doc_id"),
    ):
        name = f"incr_next_{kind}_{tag}_{_INCR_RUN}"
        path = run_scratch(
            sf_dir,
            f"{name}_data",
            stem=f"incr_next_{kind}_{tag}_",
            table=name,
        )
        specs.append((name, path, df, key))

    def _write(spec):
        name, path, df, key = spec
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(INCR_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(name)
        )
        return name

    with ThreadPoolExecutor(max_workers=3) as pool:
        names = list(pool.map(_write, specs))

    ck_u24 = F.expr(
        _u24_expr("concat(ck, ':', cast(first_doc as string))")
    )
    band_u24 = F.expr(
        _u24_expr("concat(bsig, '|', cast(doc_id as string))")
    )
    sh_u24 = F.expr(
        _u24_expr(
            "concat(cast(doc_id as string), '|',"
            " array_join(array_sort(shingles), ' '))"
        )
    )
    ca = spark.table(names[0]).agg(
        F.count(F.lit(1)).alias("n_classes"), F.sum(ck_u24).alias("ck_u24")
    )
    ba = spark.table(names[1]).agg(
        F.count(F.lit(1)).alias("n_band_rows"), F.sum(band_u24).alias("band_u24")
    )
    sa = spark.table(names[2]).agg(
        F.count(F.lit(1)).alias("n_sh_docs"), F.sum(sh_u24).alias("sh_u24")
    )
    return ca.crossJoin(ba).crossJoin(sa)


# ---------------------------------------------------------------------------
# dedup_embedding_incremental (r15, VERDICT r14 #8): the dedup_incremental
# recipe applied to VECTORS — a new vec_id slice probed against a FROZEN
# prior embedding index (exact (label, u)-class keys + (label, LSH
# bucket) blocks + unit vectors), all three prior-side joins against
# bucketed tables.

EMB_INCR_PRIOR_PRED = "vec_id % 10 < 8"
EMB_INCR_NEW_PRED = "vec_id % 10 >= 8"

#: (sf tag) -> (exact_tbl, buckets_tbl, vecs_tbl). FROZEN by contract.
_EMB_INCR_TABLES: dict[str, tuple[str, str, str]] = {}

#: Engine-neutral exact-class key: md5 over (label, u quantized to the
#: 1e-9 lattice). Raw double→string is NOT cross-engine (scientific-
#: notation thresholds differ between Spark and DuckDB), so the exact
#: class is DEFINED at the integer lattice — round(x*1e9)→BIGINT is the
#: proven engine-identical quantization, and vectors 1e-9 apart are one
#: exact class by contract (their cosine is 1.0 - O(1e-18) anyway).
_EMB_CK_SPARK = (
    "md5(concat_ws(',', coalesce(cast(label as string), 'n'),"
    " array_join(transform(u, x -> cast(cast(round(x * 1e9) as bigint)"
    " as string)), ',')))"
)
_EMB_CK_DUCK = (
    "md5(COALESCE(CAST(label AS VARCHAR), 'n') || ',' ||"
    " array_to_string(list_transform(u,"
    " x -> CAST(CAST(round(x * 1e9) AS BIGINT) AS VARCHAR)), ','))"
)

#: Injective (label, bucket) block key — one column, because a
#: co-partitioned bucket join needs the join key to BE the bucket
#: column (the r14 bsig rule). ':' never occurs in a cast label
#: (digits/minus/'n') or a bucket ('0'/'1' string).
_EMB_LSIG_SPARK = "concat(coalesce(cast(label as string), 'n'), ':', {sig})"

#: Spark-INTERNAL exact class key (the r11 dedup_embedding key): md5 of
#: the exact shortest-roundtrip (label, u) serialization. Members of a
#: class have BIT-IDENTICAL u, so any class-grain cosine equals every
#: member-grain cosine exactly — the property the index collapse below
#: rides. Never oracle-compared (double→string is not cross-engine);
#: the oracle-visible exact_dup semantic uses the lattice key above.
_EMB_ECK_SPARK = (
    "md5(concat_ws(',', coalesce(cast(label as string), 'n'),"
    " array_join(transform(u, x -> cast(x as string)), ',')))"
)


def emb_incremental_prior_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Materialize the FROZEN prior-snapshot embedding index at CLASS
    grain (once/process).

    The r10 class-collapse lesson applied to the INDEX LAYOUT: under
    corpus replication every vector is copied R times, and a
    member-grain index makes the new-side probe verify O(R²) candidate
    pairs (measured: 166 s at the 100× replica before this collapse).
    Classes are keyed by the EXACT (label, u) serialization
    (bit-identical u within a class ⇒ class-grain cosine ≡ member-grain
    cosine bitwise), so probing classes and weighting by member count
    reproduces the member-grain oracle values exactly while candidate
    volume stays linear in replication. Three bucketed+sorted tables:

    - ``exact``:  distinct LATTICE class keys (the oracle-visible
      exact-dup semantic), bucketed by ck;
    - ``blocks``: one row per (prior class, LSH block) —
      ``(lsig, cid, cnt)``, bucketed by lsig;
    - ``cvecs``:  ``(cid, u)`` class-rep unit vectors, bucketed by cid
      for the verify fetch.
    """
    tag = (
        os.path.basename(os.path.normpath(sf_dir))
        .replace(".", "_")
        .replace("-", "_")
    )
    if tag in _EMB_INCR_TABLES:
        from ls_hadoop_3_0_spark.sources.io import scratch, touch_heartbeat

        for name in _EMB_INCR_TABLES[tag]:  # keep frozen dirs prune-safe
            touch_heartbeat(scratch(sf_dir, f"{name}_data"))
        return _EMB_INCR_TABLES[tag]
    from ls_hadoop_3_0_spark.llm.embeddings import lsh_bucketed, normalized_embeddings_np
    from ls_hadoop_3_0_spark.sources.io import run_scratch

    prior = normalized_embeddings_np(
        load(spark, sf_dir, "embeddings").filter(F.expr(EMB_INCR_PRIOR_PRED))
    )
    cls = (
        prior.select(F.expr(_EMB_ECK_SPARK).alias("cid"), "vec_id", "label", "u")
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            # one rep per class: min-vec_id member (label/u identical
            # across the class by key construction)
            F.min(F.struct("vec_id", "label", "u")).alias("s"),
        )
        .select(
            "cid",
            "cnt",
            F.col("s.label").alias("label"),
            F.col("s.u").alias("u"),
        )
        .localCheckpoint(eager=False)
    )
    exact = cls.select(F.expr(_EMB_CK_SPARK).alias("ck")).distinct()
    blocks = lsh_bucketed(cls).select(
        F.expr(_EMB_LSIG_SPARK.format(sig="bucket")).alias("lsig"),
        "cid",
        "cnt",
    )
    cvecs = cls.select("cid", "u")
    names = (
        f"embi_exact_{tag}_{_INCR_RUN}",
        f"embi_blocks_{tag}_{_INCR_RUN}",
        f"embi_cvecs_{tag}_{_INCR_RUN}",
    )
    for name, df, key, kind in (
        (names[0], exact, "ck", "exact"),
        (names[1], blocks, "lsig", "blocks"),
        (names[2], cvecs, "cid", "cvecs"),
    ):
        path = run_scratch(
            sf_dir,
            f"{name}_data",
            stem=f"embi_{kind}_{tag}_",
            table=name,
        )
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(INCR_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(name)
        )
    _EMB_INCR_TABLES[tag] = names
    return names


def _emb_incremental_sql() -> str:
    from ls_hadoop_3_0_spark.llm.embeddings import (
        lsh_bucket_sql,
        probe_signatures_sql,
    )

    lbl = "COALESCE(CAST({side}.label AS VARCHAR), 'n')"
    return f"""
    WITH e AS ({NORM_EMB_SQL}),
    ep AS (SELECT * FROM e WHERE {EMB_INCR_PRIOR_PRED}),
    en AS (SELECT * FROM e WHERE {EMB_INCR_NEW_PRED}),
    bkp AS (SELECT vec_id, label, {lsh_bucket_sql()} AS bucket FROM ep),
    bn AS (SELECT vec_id, label, {lsh_bucket_sql()} AS bucket FROM en),
    prn AS (SELECT vec_id, label,
                   unnest({probe_signatures_sql("bucket")}) AS sig
            FROM bn),
    cand AS (
        SELECT DISTINCT n.vec_id AS nid, p.vec_id AS pid
        FROM prn n JOIN bkp p
          ON {lbl.format(side="n")} = {lbl.format(side="p")}
         AND n.sig = p.bucket
    ),
    ver AS (
        SELECT nid, CAST(COUNT(*) AS BIGINT) AS n_near, MAX(c) AS max_cosine
        FROM (SELECT cand.nid, round({_DOT_UV_SQL}, 6) AS c
              FROM cand
              JOIN e a ON a.vec_id = cand.nid
              JOIN e b ON b.vec_id = cand.pid) v
        WHERE c >= {EMB_COSINE_T}
        GROUP BY nid
    ),
    pck AS (SELECT DISTINCT {_EMB_CK_DUCK} AS ck FROM ep)
    SELECT en.vec_id,
           CAST(CASE WHEN {_EMB_CK_DUCK} IN (SELECT ck FROM pck)
                     THEN 1 ELSE 0 END AS INT) AS exact_dup,
           CAST(COALESCE(v.n_near, 0) AS BIGINT) AS n_near,
           v.max_cosine AS max_cosine
    FROM en LEFT JOIN ver v ON v.nid = en.vec_id
    """


@query("dedup_embedding_incremental", _emb_incremental_sql())
def dedup_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X5-EXT incremental embedding dedup: flag each NEW vector
    (vec_id % 10 >= 8) against the FROZEN prior snapshot — exact_dup
    (its (label, u) class key, quantized to the engine-neutral 1e-9
    lattice, already present), n_near / max_cosine (count / best of
    cosine-verified (label, LSH-bucket ∪ 1-bit-probe) matches against
    prior vectors, dedup_embedding's candidate contract and verify
    fold).

    Scale shape (dedup_incremental's posture, vector-typed): the prior
    side is PROBED, never re-shuffled — the class-key lookup, the
    (label, bucket) block collision (single injective ``lsig`` column,
    the r14 bsig rule), and the unit-vector fetch by cid are merge
    joins against bucketed tables whose scans carry the bucket hash as
    output partitioning (no Exchange above any prior-side scan, pinned
    in tests/test_r15_keys.py); only the increment shuffles. Verify is
    restricted to block-collision candidates — never all-pairs — and
    runs at (new member × prior CLASS) grain with member counts as
    weights: the r10 exact-class identity (bit-identical u within a
    class ⇒ identical cosine) keeps the emitted values exactly the
    member-grain oracle's while candidate volume stays LINEAR under
    corpus replication (member-grain measured 166 s at the 100×
    replica; class-grain ~6 s).

    At 100 TB: new embeddings arrive with every crawl; this is the
    probe tier that decides near-dup membership against the standing
    corpus without touching it, steady state paying increment-scale
    compute (SCALE.md r15 rows).
    """
    prepare(spark)
    from ls_hadoop_3_0_spark.llm.embeddings import (
        lsh_bucketed,
        normalized_embeddings_np,
        probe_signatures,
    )

    t_exact, t_blocks, t_cvecs = emb_incremental_prior_index(spark, sf_dir)
    new = normalized_embeddings_np(
        load(spark, sf_dir, "embeddings").filter(F.expr(EMB_INCR_NEW_PRED))
    ).localCheckpoint(eager=False)

    # exact arm: new class keys probed against the prior class index
    marks = spark.table(t_exact).select("ck", F.lit(1).alias("hit"))
    ex = (
        new.select("vec_id", F.expr(_EMB_CK_SPARK).alias("ck"))
        .join(marks.hint("merge"), "ck", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("hit"), F.lit(0)).cast("int").alias("exact_dup"),
        )
    )

    # near arm: new probe signatures against the prior CLASS-block index.
    # No DISTINCT on candidates: a prior class owns exactly one bucket
    # and the 1+N_PLANES probe signatures are pairwise distinct, so a
    # (nid, cid) pair can match at most once — the dedup step the
    # member-grain form needed is structurally impossible here.
    probes = (
        lsh_bucketed(new)
        .select(
            F.col("vec_id").alias("nid"),
            "label",
            F.explode(probe_signatures("bucket")).alias("sig"),
        )
        .select("nid", F.expr(_EMB_LSIG_SPARK.format(sig="sig")).alias("lsig"))
    )
    cand = probes.join(spark.table(t_blocks).hint("merge"), "lsig").select(
        "nid", "cid", "cnt"
    )
    cos = F.round(
        F.expr(
            "aggregate(zip_with(un, up, (x, y) -> x * y), 0D,"
            " (acc, p) -> acc + p)"
        ),
        6,
    )
    # the new side grows with the corpus — shuffle_hash vetoes a static
    # broadcast of the checkpointed increment (the r6/r8 rule)
    ver = (
        cand.join(
            new.select(
                F.col("vec_id").alias("nid"), F.col("u").alias("un")
            ).hint("shuffle_hash"),
            "nid",
        )
        .join(
            spark.table(t_cvecs)
            .select("cid", F.col("u").alias("up"))
            .hint("merge"),
            "cid",
        )
        .select("nid", "cnt", cos.alias("c"))
        .filter(F.col("c") >= EMB_COSINE_T)
        .groupBy("nid")
        .agg(
            F.sum("cnt").alias("n_near"),
            F.max("c").alias("max_cosine"),
        )
    )
    return (
        ex.join(ver.withColumnRenamed("nid", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            "exact_dup",
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
            "max_cosine",
        )
    )
