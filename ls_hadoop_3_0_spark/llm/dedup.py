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

from ls_hadoop_3_0_spark.llm.embeddings import (
    N_PLANES,
    lsh_bucket_sql,
    lsh_bucketed,
    normalized_embeddings,
    probe_signatures,
    probe_signatures_sql,
)
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


def _shingled(docs: DataFrame) -> DataFrame:
    """doc_id + distinct word-3-shingles (docs with ≥3 tokens)."""
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


def minhash_pairs_sql(src: str = "documents") -> str:
    """DuckDB mirror of minhash_pairs() over ``src``."""
    return f"""
    WITH sh AS ({sh_sql(src)}),
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
    """


DEDUP_MINHASH_SQL = minhash_pairs_sql("documents")


def minhash_pairs(docs: DataFrame, threshold: float = MINHASH_JACCARD_T) -> DataFrame:
    """MinHash-LSH near-dup pairs over a documents-shaped DataFrame.

    Signatures are computed by exploding distinct shingles and taking
    ``min(md5(seed:shingle))`` per seed as 12 parallel aggregates — the
    min is combined map-side before the shuffle (the MR combiner shape),
    and every expression is codegen'd (no interpreted lambda per
    element, unlike the array-HOF formulation — ~2× faster, and at
    100 TB the partial-min keeps the shuffle at |docs|×12 hex strings
    regardless of document length).
    """
    # Shingling feeds the signature explode AND both verify sides; the
    # band table feeds both candidate join sides. Lazy localCheckpoints
    # make each a compute-once intermediate (the cluster analog: persist).
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
        .filter(F.col("jaccard") >= threshold)
    )


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


_HI_HEX = "('8','9','a','b','c','d','e','f')"


DEDUP_SIMHASH_SQL = f"""
    WITH sigs AS (
        SELECT doc_id,
               array_to_string(list_transform(generate_series(1, 16),
                   i -> CASE WHEN list_sum(list_transform(hashes,
                            h -> CASE WHEN substring(h, i, 1) IN {_HI_HEX}
                                      THEN 1 ELSE -1 END)) > 0
                        THEN '1' ELSE '0' END), '') AS simhash
        FROM (SELECT doc_id,
                     list_transform(list_distinct(list_filter(
                         string_split(text, ' '), t -> t <> '')),
                         t -> md5(t)) AS hashes
              FROM documents)
        WHERE len(hashes) > 0
    )
    SELECT doc_id, simhash,
           COUNT(*) OVER (PARTITION BY simhash) AS bucket_size
    FROM sigs
    """


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """Per-doc 16-bit SimHash signature + bucket size (see dedup_simhash)."""
    from pyspark.sql import Window

    d = (
        docs.select(
            "doc_id",
            # Hash each distinct token ONCE; the 16 bit-votes then read
            # hex digits of the precomputed hash (16× fewer md5 calls
            # than hashing inside the per-bit loop).
            F.expr(
                "transform(array_distinct(filter(split(text, ' '),"
                " t -> t <> '')), t -> md5(t))"
            ).alias("hashes"),
        )
        .filter(F.size("hashes") > 0)
    )
    simhash = F.expr(
        "concat_ws('', transform(sequence(1, 16),"
        " i -> CASE WHEN aggregate(hashes, 0,"
        f" (acc, h) -> acc + CASE WHEN substring(h, i, 1) IN {_HI_HEX}"
        " THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END))"
    )
    return d.select("doc_id", simhash.alias("simhash")).withColumn(
        "bucket_size", F.count(F.lit(1)).over(Window.partitionBy("simhash"))
    )


@query("dedup_simhash", DEDUP_SIMHASH_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 SimHash: 16-bit majority-vote signature over token hashes.

    Bit i = sign of Σ_tokens (±1 by the i-th md5 hex digit's high bit).
    Near-dup docs differ in few bits; identical signatures form dedup
    buckets (bucket_size > 1 ⇒ candidates). Hamming-neighbor bucketing is
    the multi-probe extension (tests cover the signature property).
    """
    prepare(spark)
    return simhash_signatures(load(spark, sf_dir, "documents"))


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
    )
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
    """
    rare = rare_grams(_grammed(docs), max_df).localCheckpoint(eager=False)
    sizes = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a = rare.select("source", "gram", F.col("doc_id").alias("doc_a"))
    b = rare.select(
        F.col("source").alias("source_b"),
        F.col("gram").alias("gram_b"),
        F.col("doc_id").alias("doc_b"),
    )
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
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("n_b"))
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
    return ngram_pairs(load(spark, sf_dir, "documents"))


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


def connected_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id).

    Iterative min-label propagation: label(v) ← min(label(v),
    min(label(neighbors))) until fixpoint. Each round is one equi-join +
    groupBy (the simplified large-star/small-star pattern); rounds ≤
    graph diameter, and the label table is cached between rounds. This
    is the dedup *clustering* step — pairs alone don't say which docs to
    drop; components do (keep cluster_id, drop the rest).
    """
    edges = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).unionByName(
        pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
    )
    # Materialize once and truncate lineage: every iteration re-reads
    # edges, and labels' lineage would otherwise double per round
    # (exponential re-evaluation of the upstream pair pipeline).
    edges = edges.localCheckpoint()
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iters):
        labels = labels.localCheckpoint()
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


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
    pairs = minhash_pairs(load(spark, sf_dir, "documents"))
    comps = connected_components(pairs)
    sizes = comps.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("csize"))
    return comps.join(sizes, "cluster_id").select("doc_id", "cluster_id", "csize")


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
    )
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


def embedding_pairs(e: DataFrame, threshold: float = EMB_COSINE_T) -> DataFrame:
    """Cosine-verified near-dup pairs from LSH-bucketed candidates."""
    # Normalization feeds candidate generation + both verify sides.
    e = e.localCheckpoint(eager=False)
    cand = embedding_candidates(e)
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("u").alias("ua"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("u").alias("ub"))
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
    return embedding_pairs(normalized_embeddings(load(spark, sf_dir, "embeddings")))
