"""Subquery & CTE surface — SURVEY.md §3.4/§4.1 (SQL API parity).

MR has no subqueries (users chain jobs through HDFS); Catalyst rewrites
them for free: correlated scalar subqueries are decorrelated into joins
(RewriteCorrelatedScalarSubquery), IN becomes a semi-join. These keys run
the IDENTICAL SQL text on Spark and DuckDB — exercising the engine's SQL
entry point (every other key uses the DataFrame API; both produce the
same Catalyst plans).

Determinism: the correlated average uses the decimal-sum pattern inline
(SUM(decimal)/COUNT cast double) so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import load

SUBQUERY_SCALAR_SQL = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
        SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
"""

SUBQUERY_IN_SQL = """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 350000.0
    )
"""

CTE_SQL = """
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, total, n_orders,
               row_number() OVER (ORDER BY total DESC, o_custkey) AS rnk
        FROM spend
    )
    SELECT r.rnk, r.o_custkey, c.c_name, r.total, r.n_orders
    FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
    WHERE r.rnk <= 25
"""


def _run_sql(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    prepare(spark)
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@query("subquery_scalar_correlated", SUBQUERY_SCALAR_SQL)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders 1.5× above their customer's
    average — decorrelated by Catalyst into an aggregate + join."""
    return _run_sql(spark, sf_dir, SUBQUERY_SCALAR_SQL, ["orders"])


@query("subquery_in", SUBQUERY_IN_SQL)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated IN subquery → planned as a left-semi join."""
    return _run_sql(spark, sf_dir, SUBQUERY_IN_SQL, ["customer", "orders"])


@query("cte_query", CTE_SQL)
def cte_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE pipeline (agg → window → join) in one SQL statement —
    the JobControl DAG the reference runs as 3 jobs, as one lazy plan."""
    return _run_sql(spark, sf_dir, CTE_SQL, ["orders", "customer"])


SUBQUERY_EXISTS_SQL = """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0
    )
    GROUP BY o.o_orderpriority
"""

SUBQUERY_NOT_EXISTS_SQL = """
    SELECT o.o_orderstatus, COUNT(*) AS n_orders
    FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08
    )
    GROUP BY o.o_orderstatus
"""

SUBQUERY_SCALAR_UNCORRELATED_SQL = """
    SELECT l_returnflag, COUNT(*) AS n_items
    FROM lineitem
    WHERE l_extendedprice > (
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(*)
        FROM lineitem
    )
    GROUP BY l_returnflag
"""


@query("subquery_exists", SUBQUERY_EXISTS_SQL)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped correlated EXISTS → left-semi join after decorrelation
    (orders with any high-quantity line, counted by priority)."""
    return _run_sql(spark, sf_dir, SUBQUERY_EXISTS_SQL, ["orders", "lineitem"])


@query("subquery_not_exists", SUBQUERY_NOT_EXISTS_SQL)
def subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → left-anti join after decorrelation."""
    return _run_sql(spark, sf_dir, SUBQUERY_NOT_EXISTS_SQL, ["orders", "lineitem"])


@query("subquery_scalar_uncorrelated", SUBQUERY_SCALAR_UNCORRELATED_SQL)
def subquery_scalar_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-idiom uncorrelated scalar subquery: one global aggregate
    computed once (subquery broadcast as a literal at runtime), then a
    full-scan filter against it — no join at all in the final plan."""
    return _run_sql(
        spark, sf_dir, SUBQUERY_SCALAR_UNCORRELATED_SQL, ["lineitem"]
    )


LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
"""


@query("subquery_lateral", LATERAL_SQL)
def subquery_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table: per-customer top-2 orders.

    The SQL:2016 LATERAL join surface — the IDENTICAL text runs on both
    engines (the subqueries-module discipline). Catalyst decorrelates
    the LIMIT-ed correlated subquery into the same ranked-window plan
    `window_topn_per_group` builds by hand — this key pins that the SQL
    entry point reaches it (DomainJoin → window under the hood), so a
    user porting LATERAL-heavy warehouse SQL needs no rewrite. Ties are
    totally ordered (price desc, orderkey) ⇒ deterministic row set.
    """
    return _run_sql(spark, sf_dir, LATERAL_SQL, ["customer", "orders"])


from ls_hadoop_3_0_spark.exprs import sql_dsum as _sql_dsum  # noqa: E402

RECURSIVE_SQL = f"""
    WITH RECURSIVE tree AS (
        SELECT s_suppkey AS k, CAST(0 AS BIGINT) AS depth, s_acctbal
        FROM supplier WHERE s_suppkey = 1
        UNION ALL
        SELECT s.s_suppkey AS k, t.depth + 1 AS depth, s.s_acctbal
        FROM supplier s JOIN tree t
          ON CAST(floor(s.s_suppkey / 2.0) AS BIGINT) = t.k
        WHERE s.s_suppkey > 1
    )
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           {_sql_dsum('s_acctbal')} AS sum_bal,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key
    FROM tree GROUP BY depth
"""


@query("cte_recursive", RECURSIVE_SQL)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (SQL:1999 WITH RECURSIVE — new in Spark 4): BFS over
    an implied hierarchy, the IDENTICAL text on both engines.

    The iterative-query surface graph_pagerank/kmeans_lloyd hand-unroll
    is here expressed declaratively: suppliers form a binary org chart by
    construction (parent(k) = floor(k/2), root k=1 — derived, not stored,
    so the key needs no new fixture), and the recursion walks it level by
    level, rolling up per-depth headcount and exact-dsum balances.

    Scale: Catalyst executes WITH RECURSIVE as a level-synchronous loop
    (UnionLoop) — each round joins ONE frontier level against the base
    table, exactly the bounded-rounds shape of the large/small-star CC
    rounds; depth is log2(n) by construction, so the round count grows
    logarithmically, never linearly, with the supplier dim. The
    per-round join is AQE-planned. The recursion-depth conf guard is
    Spark's cteRecursionLevelLimit (default 100 ≫ log2 of any realistic
    dim).

    Determinism: integer keys and depths; balances ride the scaled-long
    dsum; MIN/MAX are order-invariant.
    """
    return _run_sql(spark, sf_dir, RECURSIVE_SQL, ["supplier"])
