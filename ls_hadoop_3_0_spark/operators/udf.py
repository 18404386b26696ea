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
from ls_hadoop_3_0_spark.tables import load


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
