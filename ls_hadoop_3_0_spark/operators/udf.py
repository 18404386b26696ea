"""UDF / UDAF surface — SURVEY.md §2.11 (Hadoop Streaming & user-code parity).

Reference surface: Hadoop Streaming ``PipeMapper/PipeReducer`` (F1 — run
arbitrary user code per record), arbitrary Java Mapper/Reducer scalar &
table functions (F2), ``UserDefinedValueAggregatorDescriptor`` UDAFs (F3).
Accumulator (F4) parity via ``df.observe`` is exercised in tests.

Scale notes: the preference ladder is built-ins ≫ pandas_udf ≫ row UDF.
These keys intentionally use each rung on *deterministic integer-exact*
arithmetic so the DuckDB oracle can mirror them:
- integer sums/products are exact in float64 → order-independent;
- the grouped UDAF emits ratios of exact integer sums (bit-stable).
Arrow batching (pandas_udf / applyInPandas) keeps the Python boundary
columnar — the vectorized analog of Streaming's stdin/stdout pipe.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ls_hadoop_3_0_spark.registry import query
from ls_hadoop_3_0_spark.session import prepare
from ls_hadoop_3_0_spark.tables import EVENTS_SQL, load


@query(
    "udf_scalar",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) % 97 AS bucket
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 row-at-a-time Python UDF (the PipeMapper analog — slow path).

    Deliberately the one row UDF in the repo; everything else is
    built-in or Arrow-vectorized. Kept deterministic + integer-valued.
    """
    prepare(spark)

    # No type hints on the row UDFs: PySpark would try (and warn) to
    # infer a pandas eval type from them; these are plain row UDFs.
    # Null-safe like the built-in paths: a NULL text yields NULL, not an
    # AttributeError that kills the whole Python worker task.
    @F.udf(T.IntegerType())
    def n_tokens(text):
        return None if text is None else len(text.split(" "))

    @F.udf(T.IntegerType())
    def bucket(text):
        return None if text is None else len(text) % 97

    return load(spark, sf_dir, "documents").select(
        "doc_id", n_tokens("text").alias("n_tokens"), bucket("text").alias("bucket")
    )


@query(
    "udf_pandas",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity * l_linenumber AS DOUBLE) AS qty_weighted,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod
    FROM lineitem
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 vectorized pandas_udf (Arrow batches — the fast Python path)."""
    prepare(spark)

    @F.pandas_udf(T.DoubleType())
    def weighted(q: pd.Series, ln: pd.Series) -> pd.Series:
        return q * ln

    @F.pandas_udf(T.LongType())
    def qty_mod(q: pd.Series) -> pd.Series:
        return q.astype("int64") % 7

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        weighted("l_quantity", F.col("l_linenumber").cast("double")).alias("qty_weighted"),
        qty_mod("l_quantity").alias("qty_mod"),
    )


@query(
    "udaf_pandas_agg",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity * l_linenumber) AS DOUBLE)
               / CAST(SUM(l_linenumber) AS DOUBLE) AS weighted_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3's second rung: pandas_udf GROUPED_AGG (series → scalar).

    Unlike applyInPandas (whole group → one task), a grouped-agg pandas
    UDF gets partial batches and composes with other aggregates in one
    ``agg()`` — the preferred UDAF shape at high key cardinality.
    Integer-exact arithmetic keeps it oracle-comparable.
    """
    prepare(spark)

    @F.pandas_udf("double")
    def weighted_qty(q: pd.Series, w: pd.Series) -> float:
        return float((q * w).sum() / w.sum())

    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            weighted_qty("l_quantity", F.col("l_linenumber").cast("double")).alias(
                "weighted_qty"
            )
        )
    )


@query(
    "udaf_grouped",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(l_quantity * l_linenumber) AS DOUBLE)
               / CAST(SUM(l_linenumber) AS DOUBLE) AS weighted_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 UDAF via grouped-map ``applyInPandas`` (one output row per group).

    Weighted mean of integer-exact products → pandas float64 sums are
    exact regardless of summation order, so the SQL mirror hash-matches.
    At 100 TB: applyInPandas shuffles each group to one task — fine for
    bounded group counts (3 here); for high-cardinality keys prefer
    pandas_udf GROUPED_AGG or built-ins (see aggregates.py).
    """
    prepare(spark)

    def weighted_mean(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["l_linenumber"].astype("float64")
        q = pdf["l_quantity"]
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "n_rows": [len(pdf)],
                "weighted_qty": [float((q * w).sum() / w.sum())],
            }
        )

    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_linenumber")
        .groupBy("l_returnflag")
        .applyInPandas(
            weighted_mean, "l_returnflag string, n_rows bigint, weighted_qty double"
        )
    )


@query(
    "udtf_parse_props",
    """
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(trunc(CAST(v AS DOUBLE)) AS BIGINT)) AS BIGINT)
               AS sum_v
    FROM (
        SELECT unnest(json_keys(props)) AS k,
               json_extract(props, '$.' || unnest(json_keys(props))) AS v
        FROM events
    )
    GROUP BY k
    """,
)
def udtf_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 UDTF rung: Spark 4 Python UDTF, lateral-joined then aggregated.

    A real ``@udtf`` table function (one input row → N output rows)
    parsing the events ``props`` JSON into (key, value) rows via
    ``LATERAL`` — the 1→N expansion MR users wrote as a flat-mapping
    Mapper. Like ``udf_scalar`` this is the documented SLOW rung kept
    for API parity: row-at-a-time Python with pickling per batch; the
    fast path for this exact job is ``scalar_json``'s JVM-side
    ``get_json_object``/``from_json`` (functions/scalars.py). Keys are
    yielded in sorted order so output is deterministic regardless of
    dict ordering.

    Truncation parity: Python ``int(v)`` truncates toward zero, so the
    oracle truncates EXPLICITLY (``trunc(CAST(v AS DOUBLE))``) instead
    of a bare BIGINT cast, which in DuckDB would round-to-nearest and
    silently diverge on any non-integer prop value (2.7 → 2 vs 3).
    """
    from pyspark.sql.functions import udtf

    prepare(spark)

    @udtf(returnType="k string, v long")
    class ParseProps:
        def eval(self, props: str):  # noqa: ANN001 - UDTF contract
            import json

            if props is None:
                return
            for k, v in sorted(json.loads(props).items()):
                yield k, int(v)

    spark.udtf.register("parse_props_udtf", ParseProps)
    load(spark, sf_dir, "events").createOrReplaceTempView("_udtf_events")
    return spark.sql(
        """
        SELECT p.k, COUNT(*) AS n, SUM(p.v) AS sum_v
        FROM _udtf_events e, LATERAL parse_props_udtf(e.props) p
        GROUP BY p.k
        """
    )


@query(
    "udf_arrow",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) % 97 AS bucket
    FROM documents
    """,
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 Arrow-optimized Python UDF (Spark 4 ``useArrow=True``).

    The third rung of the Python-UDF ladder this repo demonstrates:
    row-pickled UDF (udf_scalar, the PipeMapper analog) → Arrow-batched
    scalar UDF (this key: same per-row Python semantics, Arrow transfer
    instead of pickle — the drop-in speedup for existing row UDFs) →
    pandas UDF (udf_pandas, vectorized eval). Deliberately computes the
    IDENTICAL output as udf_scalar under the same oracle, so the three
    rungs are directly comparable in BENCH numbers.
    """
    prepare(spark)

    @F.udf(T.IntegerType(), useArrow=True)
    def n_tokens(text):
        return None if text is None else len(text.split(" "))

    @F.udf(T.IntegerType(), useArrow=True)
    def bucket(text):
        return None if text is None else len(text) % 97

    return load(spark, sf_dir, "documents").select(
        "doc_id", n_tokens("text").alias("n_tokens"), bucket("text").alias("bucket")
    )


@query(
    "udf_grouped_map",
    """
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_chars) AS BIGINT) AS s1,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
        FROM documents GROUP BY source
    ),
    st AS (
        SELECT source,
               CAST(s1 AS DOUBLE) / n AS mean,
               sqrt(greatest(
                   CAST(s2 AS DOUBLE) / n
                   - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n),
                   CAST(0 AS DOUBLE))) AS std
        FROM s
    )
    SELECT d.doc_id, d.source, d.n_chars,
           CASE WHEN st.std > 0
                THEN (d.n_chars - st.mean) / st.std END AS z
    FROM documents d JOIN st ON st.source = d.source
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 grouped-map ``applyInPandas`` as a TRANSFORM (N rows in → N out).

    ``udaf_grouped`` shows the one-row-per-group (aggregate) shape; this
    is the other grouped-map contract — a per-group normalization that
    keeps every row (z-score of doc length within its source), the
    groupwise feature-engineering pattern. Float discipline: the group
    stats come from EXACT integer sums computed inside the worker
    (python ints — no float accumulation), and mean/std/z are the same
    double expression tree the oracle spells, so per-row z values are
    bit-identical.

    At 100 TB: one shuffle keyed on source; each group must fit a
    worker's Arrow batch stream — fine for per-domain groups, and the
    built-in window formulation (see windows.py) is the escape hatch
    when groups outgrow workers.
    """
    prepare(spark)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        x = pdf["n_chars"]
        n = len(x)
        s1 = int(x.sum())
        s2 = int((x * x).sum())
        mean = s1 / n
        std = math.sqrt(max(s2 / n - (s1 / n) * (s1 / n), 0.0))
        z = (x - mean) / std if std > 0 else pd.Series([None] * n, index=x.index)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_chars": x,
                "z": z,
            }
        )

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", "n_chars")
        .groupBy("source")
        .applyInPandas(zscore, "doc_id long, source string, n_chars long, z double")
    )


@query(
    "udf_cogrouped",
    f"""
    WITH e AS (SELECT * FROM {EVENTS_SQL}),
    p AS (
        SELECT user_id, event_id AS purchase_id, ts AS p_ts
        FROM e WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS c_ts FROM e WHERE event_type = 'click'
    )
    SELECT p.purchase_id, p.user_id,
           CAST(COUNT(c.c_ts) AS BIGINT) AS n_clicks_1h
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id
     AND c.c_ts <= p.p_ts
     AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
    GROUP BY p.purchase_id, p.user_id
    """,
)
def udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 cogrouped-map ``applyInPandas``: the two-sided custom merge API.

    Per user, purchases and clicks arrive as TWO aligned pandas frames
    (``groupBy(...).cogroup(...)``) and the worker counts each
    purchase's clicks inside a 1-hour lookback via sorted
    ``searchsorted`` — the MR reduce-side-join-with-custom-logic shape
    (SURVEY §2.3 J6) when the merge really can't be a SQL join. Counts
    are integer comparisons on µs timestamps — nothing to drift. The
    oracle is the equivalent banded LEFT JOIN, which is also the
    documented FAST path (join+agg beats per-user python when the
    logic IS expressible) — this key exists for the API surface.

    At 100 TB: both sides shuffle once on user_id; per-user state is
    that user's events (the interval-join watermark state shape).
    """
    prepare(spark)
    import numpy as np

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )

    def merge(pp: pd.DataFrame, cc: pd.DataFrame) -> pd.DataFrame:
        if len(pp) == 0:
            return pd.DataFrame(
                {"purchase_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64"),
                 "n_clicks_1h": pd.Series([], dtype="int64")}
            )
        cts = np.sort(cc["c_ts"].to_numpy()) if len(cc) else np.array(
            [], dtype="datetime64[us]"
        )
        pts = pp["p_ts"].to_numpy()
        hi = np.searchsorted(cts, pts, side="right")
        lo = np.searchsorted(cts, pts - np.timedelta64(1, "h"), side="left")
        return pd.DataFrame(
            {
                "purchase_id": pp["purchase_id"].to_numpy(),
                "user_id": pp["user_id"].to_numpy(),
                "n_clicks_1h": (hi - lo).astype("int64"),
            }
        )

    return (
        p.groupBy("user_id")
        .cogroup(c.groupBy("user_id"))
        .applyInPandas(merge, "purchase_id long, user_id long, n_clicks_1h long")
    )


@query(
    "udf_sql_declared",
    """
    SELECT CASE WHEN o_totalprice < 50000.0 THEN 'S'
                WHEN o_totalprice < 150000.0 THEN 'M'
                WHEN o_totalprice < 300000.0 THEN 'L'
                ELSE 'XL' END AS tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(length(o_orderpriority) + (o_orderkey % 7))
                AS BIGINT) AS checksum
    FROM orders
    GROUP BY 1
    """,
)
def udf_sql_declared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-EXT the TOP rung of the UDF ladder: declarative SQL UDFs
    (``CREATE FUNCTION ... RETURN expr``, new in Spark 4).

    The repo's UDF ladder demonstrates every Python rung with its cost
    (udf_scalar pickled → udf_arrow Arrow-batched → udf_pandas
    vectorized); this key adds the rung ABOVE all of them: a function
    DECLARED in SQL is inlined by Catalyst into the calling plan — it
    runs inside WholeStageCodegen with ZERO python workers, serialization
    or per-row interpreter cost, yet gives users the same
    name-once/reuse-everywhere packaging as a UDF. At 100 TB this is the
    first thing to reach for before any Python rung.

    Two functions compose (`price_tier` calls nothing exotic,
    `row_checksum` is reused inside an aggregate), and the oracle simply
    inlines the same expressions — which is exactly what Catalyst does,
    making the equivalence the point of the test.
    """
    prepare(spark)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_tier(p DOUBLE)"
        " RETURNS STRING RETURN"
        " CASE WHEN p < 50000.0 THEN 'S'"
        "      WHEN p < 150000.0 THEN 'M'"
        "      WHEN p < 300000.0 THEN 'L'"
        "      ELSE 'XL' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION row_checksum(k BIGINT,"
        " prio STRING) RETURNS BIGINT RETURN"
        " CAST(length(prio) + (k % 7) AS BIGINT)"
    )
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT price_tier(o_totalprice) AS tier,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(row_checksum(o_orderkey, o_orderpriority))
                    AS BIGINT) AS checksum
        FROM orders GROUP BY 1
        """
    )


@query(
    "udf_map_arrow",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-EXT ``mapInArrow``: the RecordBatch-native rung of the ladder.

    Between udf_pandas (vectorized but pays the Arrow→pandas→Arrow
    conversion per batch) and the JVM built-ins sits mapInArrow: the UDF
    receives raw ``pyarrow.RecordBatch``es and answers with the same —
    all three derived columns are computed by Arrow's C++ compute
    kernels (utf8_length/split_pattern/list_value_length/binary_length),
    so NO pandas object materializes and nothing is copied row-wise.
    This is the right rung for byte/string-level batch transforms whose
    kernel exists in Arrow but not in Spark.

    Token semantics deliberately mirror the oracle's ``string_split``
    exactly (single-space split, empties counted) so the kernel output
    is definitionally comparable. Map-side only — no shuffle at any
    scale.
    """
    prepare(spark)

    def extract(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            text = b.column("text")
            n_tokens = pc.cast(
                pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
            )
            n_chars = pc.cast(pc.utf8_length(text), pa.int64())
            n_bytes = pc.cast(
                pc.binary_length(pc.cast(text, pa.binary())), pa.int64()
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), n_tokens, n_chars, n_bytes],
                ["doc_id", "n_tokens", "n_chars", "n_bytes"],
            )

    return load(spark, sf_dir, "documents").select("doc_id", "text").mapInArrow(
        extract, "doc_id long, n_tokens long, n_chars long, n_bytes long"
    )
