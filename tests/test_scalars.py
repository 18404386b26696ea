"""Engine-specific scalar surface that can't be DuckDB-oracled:
Spark-native hashes, seeded RNG, sketches, accumulators (SURVEY §2.11 F4),
plus native-vs-explicit stats equivalence."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql import Observation

from ls_hadoop_3_0_spark.tables import load

from .conftest import SF_DIR


def test_spark_native_hashes_are_deterministic(spark):
    c = load(spark, SF_DIR, "customer").select(
        "c_custkey",
        F.xxhash64("c_name").alias("xx"),
        F.crc32(F.encode("c_name", "UTF-8")).alias("crc"),
        F.hash("c_name").alias("murmur"),
    )
    a = {r["c_custkey"]: (r["xx"], r["crc"], r["murmur"]) for r in c.collect()}
    b = {r["c_custkey"]: (r["xx"], r["crc"], r["murmur"]) for r in c.collect()}
    assert a == b and len(a) > 0


def test_seeded_rand_is_reproducible(spark):
    df = load(spark, SF_DIR, "orders").select(
        "o_orderkey", F.rand(42).alias("u"), F.randn(42).alias("g")
    )
    assert df.collect() == df.collect()


def test_approx_count_distinct_bounds(spark):
    li = load(spark, SF_DIR, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).collect()[0][0]
    approx = li.select(F.approx_count_distinct("l_partkey", 0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_percentile_approx_near_exact_median(spark):
    li = load(spark, SF_DIR, "lineitem")
    row = li.select(
        F.median("l_quantity").alias("m"),
        F.percentile_approx("l_quantity", 0.5, 10000).alias("pa"),
    ).collect()[0]
    assert abs(row["pa"] - row["m"]) <= 1.0


def test_native_stddev_matches_explicit_moments(spark):
    li = load(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.stddev_samp("l_quantity").alias("native"),
        F.var_samp("l_quantity").alias("native_var"),
        F.count("l_quantity").alias("n"),
        F.sum("l_quantity").alias("s"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("s2"),
    ).collect()[0]
    var = (row["s2"] - row["s"] * row["s"] / row["n"]) / (row["n"] - 1)
    assert math.isclose(row["native_var"], var, rel_tol=1e-9)
    assert math.isclose(row["native"], math.sqrt(var), rel_tol=1e-9)


def test_initcap_capitalizes_words(spark):
    df = spark.createDataFrame([("hello spark world",)], "s string")
    assert df.select(F.initcap("s")).collect()[0][0] == "Hello Spark World"


def test_remaining_declared_scalar_surface(spark):
    """SURVEY §2.8 functions whose semantics don't mirror cleanly into
    DuckDB 1.0 (months_between 31-day convention, next_day, banker's
    bround, NaN handling, schema_of_json, json_tuple) — pinned against
    known values here instead of the oracle."""
    row = spark.sql(
        """
        SELECT months_between(DATE '1997-02-28', DATE '1996-10-30') AS mb,
               date_format(next_day(DATE '2015-01-14', 'TU'), 'yyyy-MM-dd') AS nd,
               bround(2.5, 0) AS br_even, round(2.5, 0) AS r_up,
               isnan(cast('NaN' AS DOUBLE)) AS is_nan,
               nanvl(cast('NaN' AS DOUBLE), 7.0) AS nan_repl,
               schema_of_json('{"k": 87}') AS sch
        """
    ).collect()[0]
    assert abs(row["mb"] - 3.93548387) < 1e-6
    assert row["nd"] == "2015-01-20"
    assert row["br_even"] == 2.0 and row["r_up"] == 3.0  # banker's vs half-up
    assert row["is_nan"] is True and row["nan_repl"] == 7.0
    assert "k" in row["sch"] and "BIGINT" in row["sch"].upper()
    jt = spark.sql(
        """SELECT json_tuple('{"a": 1, "b": "x"}', 'a', 'b') AS (a, b)"""
    ).collect()[0]
    assert (jt["a"], jt["b"]) == ("1", "x")


def test_explode_outer_keeps_null_rows(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, None)], "id int, arr array<string>"
    )
    out = sorted(
        (r["id"], r["col"]) for r in df.select("id", F.explode_outer("arr")).collect()
    )
    assert out == [(1, "a"), (1, "b"), (2, None)]


def test_observe_accumulates_metrics(spark):
    """F4 Counters parity: df.observe == MR user-defined counters."""
    obs = Observation("counters")
    df = load(spark, SF_DIR, "orders").observe(
        obs, F.count(F.lit(1)).alias("rows_seen"), F.sum("o_totalprice").alias("sum_price")
    )
    n = df.count()
    assert obs.get["rows_seen"] == n


def test_rdd_pipe_parity(spark):
    """F1 Hadoop Streaming raw-pipe parity: rdd.pipe through /bin/cat."""
    sc = spark.sparkContext
    out = sc.parallelize(["a\t1", "b\t2"], 2).pipe("cat").collect()
    assert sorted(out) == ["a\t1", "b\t2"]


def test_ngram_counts_mass_conservation(spark):
    """Σ bigram counts == Σ per-doc max(0, n_tokens - 1): every adjacent
    token pair is counted exactly once, none invented or dropped."""
    import ls_hadoop_3_0_spark as engine

    total_bigrams = (
        engine.QUERIES["ngram_counts"](spark, SF_DIR)
        .agg(F.sum("n").alias("s"))
        .collect()[0]["s"]
    )
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    expected = (
        load(spark, SF_DIR, "documents")
        .select(F.greatest(F.size(toks) - 1, F.lit(0)).alias("m"))
        .agg(F.sum("m").alias("s"))
        .collect()[0]["s"]
    )
    assert total_bigrams == expected and expected > 0


def test_variant_column_is_real_variant_type(spark):
    """scalar_variant must exercise the Spark 4 VARIANT type, not plain
    JSON strings: parse_json yields VariantType and typed access returns
    the declared types."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import VariantType

    from ls_hadoop_3_0_spark.tables import load

    p = load(spark, SF_DIR, "part").limit(5)
    v = p.select(
        F.parse_json(F.to_json(F.struct(F.col("p_brand").alias("b")))).alias("v")
    )
    assert isinstance(v.schema["v"].dataType, VariantType)
    row = v.select(F.expr("variant_get(v, '$.b', 'string')").alias("b")).collect()[0]
    assert isinstance(row["b"], str)


def test_udf_arrow_matches_row_udf(spark):
    """The Arrow-optimized UDF rung computes bit-identical output to the
    row-pickled rung — the whole point of useArrow=True being a drop-in."""
    from ls_hadoop_3_0_spark.operators.udf import udf_arrow, udf_scalar

    a = {r.doc_id: (r.n_tokens, r.bucket) for r in udf_arrow(spark, SF_DIR).collect()}
    b = {r.doc_id: (r.n_tokens, r.bucket) for r in udf_scalar(spark, SF_DIR).collect()}
    assert a == b and a
