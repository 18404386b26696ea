"""Iterative graph analytics — SURVEY.md §2.12 EXT (graph family).

Connected components (large-star/small-star) lives in llm/dedup.py as
``dedup_clusters``; this module adds the other canonical iterative graph
algorithm, PageRank, over the customer↔supplier trade graph derived from
orders⋈lineitem.

The interesting part is that the ITERATIVE key is fully oracle-backed:
each iteration quantizes ranks to 6 decimals via the exact scaled-long
sum (exprs.dsum) and an INTEGER-rounding re-quantization (``_q6`` — NOT
``round(x, 6)``, whose decimal-digits path differs by 1 ulp between
engines), so K unrolled iterations
produce bit-identical doubles in Spark and DuckDB (recursive numerics
are usually where cross-engine parity dies — quantize-per-round is the
fix, the same trick streaming systems use for replayable aggregates).

Scale notes: the edge list is one fact join + distinct (shuffle on
orderkey, then on the edge pair); each PageRank round is one
(src)-keyed join + one (dst)-keyed aggregation — 2 shuffles per round,
state is node-sized, never edge-squared. The edge list is materialized
ONCE (``localCheckpoint``) so five rounds re-read a cached local block,
not the fact join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ls_hadoop_3_0_spark.exprs import SCALE, dsum, sql_dsum
from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

#: Damping factor and unrolled iteration count (fixed so the oracle can
#: mirror the exact computation).
DAMPING = 0.85
N_ITER = 5

def _q6(x: str) -> str:
    """DuckDB: quantize a double to 6 decimals via INTEGER rounding.

    ``round(x, 6)`` is NOT cross-engine-stable (the decimal-digits code
    paths differ by 1 ulp on .5-boundary doubles — observed live on this
    key); ``round(x * 1e6)`` to an integer IS (the dsum-proven path).
    Spark twin below.
    """
    return f"(CAST(CAST(round(({x}) * {SCALE}) AS BIGINT) AS DOUBLE) / {SCALE}.0)"


def _q6_spark(c):
    return F.round(c * SCALE).cast("long") / F.lit(float(SCALE))


#: Node encoding: customers ↦ 2·custkey (even), suppliers ↦ 2·suppkey+1
#: (odd) — collision-free for any key range, including replicated
#: scale corpora with shifted key spaces.
_EDGES_SQL = """
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    UNION
    SELECT DISTINCT l_suppkey * 2 + 1 AS src, o_custkey * 2 AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
"""


def _pagerank_oracle() -> str:
    """Unrolled K-iteration PageRank as chained CTEs (DuckDB)."""
    cte = [
        f"WITH edges AS ({_EDGES_SQL}),",
        "deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),",
        "nn AS (SELECT COUNT(*) AS n FROM deg),",
        f"pr0 AS (SELECT node, deg, {_q6('CAST(1.0 AS DOUBLE) / nn.n')} AS pr"
        " FROM deg CROSS JOIN nn)",
    ]
    # Constants as explicit DOUBLEs: DuckDB parses bare numeric literals
    # as DECIMAL, and exact-decimal 0.15/n is a DIFFERENT double than
    # IEEE (1.0 - 0.85)/n — a 1-ulp base offset that flips .5-boundary
    # quantizations (observed live before this cast).
    step = (
        f"(CAST(1.0 AS DOUBLE) - CAST({DAMPING} AS DOUBLE)) / nn.n"
        f" + CAST({DAMPING} AS DOUBLE) * COALESCE(s.s, 0.0)"
    )
    for k in range(1, N_ITER + 1):
        prev = f"pr{k - 1}"
        cte.append(
            f", pr{k} AS ("
            f" SELECT d.node, d.deg,"
            f" {_q6(step)}"
            f" AS pr"
            f" FROM deg d CROSS JOIN nn"
            f" LEFT JOIN (SELECT e.dst AS node, {sql_dsum('p.pr / p.deg')} AS s"
            f"            FROM edges e JOIN {prev} p ON e.src = p.node"
            f"            GROUP BY e.dst) s ON s.node = d.node)"
        )
    cte.append(
        f"SELECT node, CAST(deg AS BIGINT) AS deg, pr FROM pr{N_ITER}"
    )
    return "\n".join(cte)


@query("graph_pagerank", _pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier trade graph, oracle-exact.

    Undirected bipartite edges (both directions materialized) mean every
    node has out-degree ≥ 1 — no dangling-mass correction needed. Ranks
    start uniform and run ``N_ITER`` rounds of
    ``pr'(v) = (1−d)/N + d·Σ_{u→v} pr(u)/deg(u)``; contributions are
    summed with the exact scaled-long accumulator and the result is
    re-quantized to 6 decimals each round, which is what lets DuckDB's
    unrolled-CTE mirror reproduce the floats bit-for-bit.

    100 TB: per round, the contribution join shuffles edges by src and
    the sum shuffles by dst — linear in edges, node-sized state,
    lineage truncated per round. N (node count) is a metadata-scale
    driver scalar, same as tfidf's doc count.
    """
    prepare(spark)
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    # No distinct after the union: forward edges are (even → odd) and
    # reversed ones (odd → even), so the two halves cannot collide and
    # pairs is already distinct — saves a full edge-list shuffle.
    # repartition("src") before the checkpoint balances the materialized
    # blocks for the per-round src-keyed join (measured: 15 s → 5.6 s
    # cold, 6.7 s → 4.8 s warm at sf0.1).
    # Both checkpoints are LAZY (r17, guide §2.4 — VERDICT r16 #8): the
    # setup used to be three sequential driver actions (eager edges
    # checkpoint, eager deg checkpoint, count). deg.count() below now
    # materializes edges AND deg inside ONE job and returns the scalar —
    # same cached blocks, two fewer driver round-trips on the critical
    # path.
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .union(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    # deg appears in every round's rank update AND the contribution join
    # (via pr); checkpoint the node-sized table once so the 5-round DAG
    # reads a local block instead of re-aggregating the edge list per
    # reference (2.6 s → 2.1 s warm at sf0.1).
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=False)
    )
    n_nodes = deg.count()  # metadata-scale scalar; materializes both
    if n_nodes == 0:
        # Empty graph (filtered-to-nothing input): return the empty
        # result with the production schema instead of dividing by zero.
        return deg.select(
            "node", F.col("deg").cast("long").alias("deg"), F.lit(0.0).alias("pr")
        )
    pr = deg.select("node", "deg", _q6_spark(F.lit(1.0) / n_nodes).alias("pr"))
    base = (1.0 - DAMPING) / n_nodes
    # No per-round localCheckpoint: at K=5 one pipelined DAG beats five
    # forced materializations (4.8 s vs 8.1 s warm at sf0.1). For a
    # long-running variant (K ≳ 15) reintroduce a checkpoint every few
    # rounds to cap plan depth — the connected-components loop in
    # llm/dedup.py shows that cadence.
    for _ in range(N_ITER):
        contrib = (
            edges.join(pr, edges.src == pr.node)
            .select(F.col("dst"), (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(dsum("c").alias("s"))
            .withColumnRenamed("dst", "node")
        )
        pr = deg.join(contrib, "node", "left").select(
            "node",
            "deg",
            _q6_spark(
                F.lit(base) + DAMPING * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("pr"),
        )
    return pr.select("node", F.col("deg").cast("long").alias("deg"), "pr")


@query(
    "graph_degree_hist",
    f"""
    WITH edges AS ({_EDGES_SQL}),
    deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY src)
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS side,
           deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1, 2
    """,
)
def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXT degree distribution of the customer–supplier graph.

    The first question asked of any graph before running iterative
    algorithms on it (pagerank rounds are budgeted by max degree and
    skew): per side of the bipartite graph, how many nodes have each
    degree. Shares graph_pagerank's edge definition (same node
    encoding: even = customer, odd = supplier) so the histogram
    directly audits that key's skew exposure.

    Plan: one fact join + distinct for the edge list (shuffle on
    orderkey then on the pair), one node-keyed count, one
    (side, degree)-keyed count — all map-combined, node-sized state,
    no iteration. Nothing broadcast.
    """
    prepare(spark)
    pairs = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src")).union(
        pairs.select(F.col("s").alias("src"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    side = F.when(F.col("src") % 2 == 0, "customer").otherwise("supplier")
    return (
        deg.select(side.alias("side"), "deg")
        .groupBy("side", "deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def _rank_pack_guard() -> F.Column:
    """NULL iff the (deg << 40 | id) rank packing is injective for this
    graph — i.e. ``_max_id`` < 2^40 and ``_max_deg`` < 2^23; raises the
    overflow message otherwise (VERDICT r16 #7). NULL maxima (empty
    graph) are vacuously in-bounds."""
    pack_ok = F.coalesce(
        (F.col("_max_id") < F.lit(1 << 40)) & (F.col("_max_deg") < F.lit(1 << 23)),
        F.lit(True),
    )
    return F.assert_true(
        pack_ok,
        F.lit(
            "graph_triangles: packed (deg,id) rank overflow — requires "
            "node ids < 2^40 and degrees < 2^23"
        ),
    )


@query(
    "graph_triangles",
    """
    WITH os AS (
        SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ),
    edges AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM os a JOIN os b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v AS node FROM edges)
        GROUP BY node
    ),
    summary AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
        FROM deg
    )
    SELECT s.n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
           s.n_wedges, t.n_triangles,
           CAST(3 * t.n_triangles AS DOUBLE) / CAST(s.n_wedges AS DOUBLE)
               AS global_cc
    FROM summary s CROSS JOIN tri t
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the co-supply graph.

    Nodes = suppliers, undirected edge (u,v) when two suppliers ship
    lines of the same order. Triangles via the ORIENTED edge list
    (u < v): each triangle a<b<c is counted exactly once by joining
    e(a,b)⋈e(b,c)⋈e(a,c) — three equi-joins, never an all-pairs probe.
    Global CC = 3·triangles / wedges, both exact BIGINTs before the one
    double division.

    Scale (r8 rewrite): edges are re-oriented by the DEGREE total order
    (deg, id) — the classic compact-forward / O(sqrt(m)) orientation:
    every node's ORIENTED out-degree is at most O(sqrt(m)) regardless of
    how hubby the undirected graph is, so the wedge stream is bounded by
    sum(outdeg^2) = O(m^1.5) with no hub blow-up. The triangle count is
    orientation-invariant, so the DuckDB oracle keeps the simpler id
    orientation and the outputs still hash-match. There is NO static
    ``F.broadcast`` anywhere: the edge legs grow with the corpus
    (supplier dim = 10k x SF, edges ~linear under corpus replication —
    the r7 verdict measured ~50M edge rows at the 100x replica), so the
    join strategy is left to AQE, which broadcasts only when the runtime
    size is actually small. Edge list + oriented list are each
    materialized once (``localCheckpoint``) and reused by all legs.
    """
    prepare(spark)
    os_ = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = os_.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("u"))
    b = os_.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("v"))
    edges = (
        a.join(b, "k")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()  # reused by orientation + degree + count passes
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # Orient each undirected edge from the (deg, id)-smaller endpoint to
    # the larger one; carry the destination's rank so the wedge pair can
    # be ordered without a third degree join.
    with_deg = (
        edges.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # Pack each endpoint's (deg, id) rank into ONE long (d << 40 | id,
    # injective while ids < 2^40 — suppkeys are dense ints, and d < n
    # fits 23 bits even at 100 TB) so the wedge ordering filter and the
    # wedge-pair group key are single-long comparisons instead of struct
    # allocations per wedge row: the 135M-row wedge stage is the key's
    # hot loop and the struct form measured ~35% slower (r16 A/B, both
    # arms noop-protocol min-of-3: 11.6 vs 8.4 s at sf0.1).
    directed = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        (
            F.shiftleft(F.when(u_first, F.col("du")).otherwise(F.col("dv")), 40)
            + F.when(u_first, F.col("u")).otherwise(F.col("v"))
        ).alias("rsrc"),
        (
            F.shiftleft(F.when(u_first, F.col("dv")).otherwise(F.col("du")), 40)
            + F.when(u_first, F.col("v")).otherwise(F.col("u"))
        ).alias("rdst"),
    ).localCheckpoint()  # reused by 2 wedge legs + the closure probe
    t1 = directed.select(F.col("src").alias("a"), F.col("rdst").alias("rb"))
    t2 = directed.select(F.col("src").alias("a"), F.col("rdst").alias("rc"))
    # Wedge at the lowest-rank apex a; order the two out-neighbours by
    # packed rank so each triangle is generated exactly once, then probe
    # the closing edge — which, being between b < c in the total order,
    # is oriented b -> c if it exists. Three equi-joins, never all-pairs.
    wedges = t1.join(t2, "a").filter(F.col("rb") < F.col("rc"))
    # Collapse the O(m^1.5) wedge stream with a map-side PARTIAL count
    # per (rb, rc) BEFORE any exchange: the generate-join pipelines
    # straight into the hash aggregate, so the shuffle carries at most
    # |distinct endpoint pairs| ≤ m rows per task instead of the raw
    # 135M-row wedge stream (the MR combiner shape — this is what made
    # dropping the static broadcast cost-neutral: 29.9 s → measured
    # post-fix numbers in SCALE.md).
    wedge_counts = wedges.groupBy("rb", "rc").agg(
        F.count(F.lit(1)).alias("nw")
    )
    closing = directed.select(
        F.col("rsrc").alias("rb"), F.col("rdst").alias("rc")
    )
    # SUM over an empty join (triangle-free graph) is NULL; the oracle's
    # COUNT-based form yields 0 — coalesce so the empty case agrees.
    tri = wedge_counts.join(closing, ["rb", "rc"]).agg(
        F.coalesce(F.sum("nw"), F.lit(0)).cast("long").alias("n_triangles")
    )
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
        # r17 (VERDICT r16 #7): the (deg << 40 | id) rank packing above is
        # injective only while ids < 2^40 and degrees < 2^23 — guard the
        # bounds in the SAME node-scale aggregation (zero extra pass) and
        # fail loudly instead of silently corrupting the wedge order.
        F.max("node").alias("_max_id"),
        F.max("d").alias("_max_deg"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    guard = _rank_pack_guard()
    return (
        summary.crossJoin(tri)
        .crossJoin(n_edges)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            # assert_true yields NULL iff the bounds hold; folding it in
            # here keeps the guard in the returned plan without changing
            # any output value.
            F.when(guard.isNull(), F.col("n_triangles")).alias("n_triangles"),
            (
                (F.lit(3) * F.col("n_triangles")).cast("double")
                / F.col("n_wedges").cast("double")
            ).alias("global_cc"),
        )
    )
