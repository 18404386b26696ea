"""Physical-plan discipline (SURVEY.md §4): the scale rules as assertions.

These lock in the plans we want at 100 TB: pushdown+pruning at the scan,
broadcast for dims, map-side partial aggregation (the MR combiner
analog), heap-based top-k, and zero shuffles for map-only queries.
"""

from __future__ import annotations

from ls_hadoop_3_0_spark.operators.aggregates import agg_sum
from ls_hadoop_3_0_spark.operators.joins import join_broadcast
from ls_hadoop_3_0_spark.operators.relational import predicate_pushdown, project_filter
from ls_hadoop_3_0_spark.operators.sort import topk
from ls_hadoop_3_0_spark.functions.text import wordcount
from ls_hadoop_3_0_spark.plans import checks

from .conftest import SF_DIR


def test_filter_pushdown_and_column_pruning(spark):
    df = predicate_pushdown(spark, SF_DIR)
    assert checks.has_pushed_filters(df, "l_quantity"), checks.formatted_plan(df)
    cols = checks.read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"}, (
        f"scan reads more than the projection needs: {cols}"
    )


def test_map_only_query_has_no_shuffle(spark):
    df = project_filter(spark, SF_DIR)
    assert checks.shuffle_count(df) == 0, checks.formatted_plan(df)


def test_dim_joins_are_broadcast(spark):
    df = join_broadcast(spark, SF_DIR)
    plan = checks.formatted_plan(df)
    assert checks.has_broadcast_hash_join(df), plan
    assert "SortMergeJoin" not in plan, "dim join degraded to SMJ:\n" + plan


def test_aggregation_is_partial_then_final(spark):
    assert checks.has_partial_aggregation(agg_sum(spark, SF_DIR))
    assert checks.has_partial_aggregation(wordcount(spark, SF_DIR))


def test_topk_plans_as_take_ordered(spark):
    df = topk(spark, SF_DIR)
    assert checks.is_take_ordered(df), checks.formatted_plan(df)


def test_global_sort_uses_range_partitioning(spark):
    """O1: orderBy = sampled range partitioning (the TotalOrderPartitioner
    + InputSampler algorithm), not a single-partition sort."""
    from ls_hadoop_3_0_spark.tables import load
    from pyspark.sql import functions as F

    df = load(spark, SF_DIR, "orders").orderBy(F.col("o_totalprice"))
    assert "rangepartitioning" in checks.formatted_plan(df).lower()
