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


def test_sorted_indexed_sink_prunes_to_one_bucket(spark):
    """S10 MapFile parity: a key lookup scans 1 of 8 buckets, not all."""
    from ls_hadoop_3_0_spark.sources.io import sorted_indexed_lookup, sorted_indexed_table

    tbl = sorted_indexed_table(spark, SF_DIR)
    plan = checks.formatted_plan(sorted_indexed_lookup(spark, tbl, 17))
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_indexed_lookup_key_scans_one_bucket(spark):
    """The registered sink_indexed_lookup key itself must plan the pruned
    single-bucket scan — not just the helper it wraps."""
    from ls_hadoop_3_0_spark.sources.io import sink_indexed_lookup

    plan = checks.formatted_plan(sink_indexed_lookup(spark, SF_DIR))
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan


def test_dedup_joins_never_broadcast_corpus_sides(spark):
    """No statically-planned broadcast of a corpus-scale relation.

    Catalyst's estimates for the checkpointed dedup intermediates are
    corpus-independent; a static BroadcastHashJoin there cannot be
    demoted by AQE and turned into a 512 MB driver broadcast at 100×.
    The join hints must keep every corpus-side join shuffle-bound
    (SMJ/SHJ). The knn keys keep their broadcast by design (bounded
    query side), so they are not asserted here.
    """
    import ls_hadoop_3_0_spark as engine

    for key in ["dedup_minhash", "dedup_simhash", "dedup_embedding"]:
        df = engine.QUERIES[key](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, f"{key} broadcasts a corpus side"
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), key


def test_triangles_have_no_static_broadcast(spark):
    """graph_triangles' edge legs grow with the corpus (supplier dim =
    10k x SF; ~50M edge rows at the 100x replica), so the r8 rewrite must
    carry NO hand-placed broadcast hint anywhere in the plan — the join
    strategy is AQE's runtime call, never a static claim."""
    import ls_hadoop_3_0_spark as engine

    df = engine.QUERIES["graph_triangles"](spark, SF_DIR)
    assert not checks.has_static_broadcast_hint(df), (
        "graph_triangles statically broadcasts a corpus-growing side"
    )


def test_skewed_join_triggers_aqe_skew_split(spark):
    """A 95%-one-key fact-fact join must get AQE's skew-split at runtime.

    agg_salted covers the salted-aggregation path; this locks the join
    path: with skew thresholds sized to the fixture, the executed
    adaptive plan must carry ``skew=true`` on the sort-merge join (the
    runtime splitting of the hot partition into subpartitions).
    """
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # Sized to the fixture: the hot partition's COMPRESSED shuffle
        # bytes must exceed the threshold (hence the incompressible sha2
        # payload), and coalescing is off so the non-skewed partitions
        # keep their sizes for the median comparison.
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 400_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        agg = joined.agg(F.count(F.lit(1)).alias("n"))
        plan = checks.executed_plan(agg)
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_global_sort_uses_range_partitioning(spark):
    """O1: orderBy = sampled range partitioning (the TotalOrderPartitioner
    + InputSampler algorithm), not a single-partition sort."""
    from ls_hadoop_3_0_spark.tables import load
    from pyspark.sql import functions as F

    df = load(spark, SF_DIR, "orders").orderBy(F.col("o_totalprice"))
    assert "rangepartitioning" in checks.formatted_plan(df).lower()


def test_exists_subqueries_decorrelate_to_semi_and_anti(spark):
    """EXISTS/NOT EXISTS must plan as (Broadcast/SortMerge) semi/anti
    joins — Catalyst decorrelation, never a per-row subquery probe."""
    from ls_hadoop_3_0_spark.operators.subqueries import (
        subquery_exists,
        subquery_not_exists,
    )

    p_exists = checks.executed_plan(subquery_exists(spark, SF_DIR))
    assert "LeftSemi" in p_exists, p_exists
    p_not = checks.executed_plan(subquery_not_exists(spark, SF_DIR))
    assert "LeftAnti" in p_not, p_not


def test_large_orders_top20_is_take_ordered(spark):
    """Q18 shape: the final top-20 must be per-partition heaps
    (TakeOrderedAndProject), never a global sort of the joined set."""
    from ls_hadoop_3_0_spark.operators.analytics import analytics_large_orders

    df = analytics_large_orders(spark, SF_DIR)
    assert checks.is_take_ordered(df), checks.formatted_plan(df)


def test_small_qty_avg_joins_broadcast(spark):
    """Q17 shape: the per-part average (brand-pruned, tiny) and the part
    dim must both broadcast — the fact shuffles zero times for joins."""
    from ls_hadoop_3_0_spark.operators.analytics import analytics_small_qty

    df = analytics_small_qty(spark, SF_DIR)
    plan = checks.formatted_plan(df)
    assert checks.has_broadcast_hash_join(df), plan
    assert "SortMergeJoin" not in plan, plan


def test_idle_customers_plans_anti_join(spark):
    """Q22 shape: NOT-since-cutoff must be a LeftAnti join; the scalar
    average must ride a broadcast (1-row), not a shuffle."""
    from ls_hadoop_3_0_spark.operators.analytics import analytics_idle_customers

    plan = checks.formatted_plan(analytics_idle_customers(spark, SF_DIR))
    assert "LeftAnti" in plan, plan


def test_uncorrelated_scalar_subquery_is_not_a_join(spark):
    """The global-aggregate filter must execute the subquery once
    (Subquery/ReusedSubquery scalar) — no join of fact against fact."""
    from ls_hadoop_3_0_spark.operators.subqueries import (
        subquery_scalar_uncorrelated,
    )

    p = checks.executed_plan(subquery_scalar_uncorrelated(spark, SF_DIR))
    assert "Subquery" in p or "scalar-subquery" in p, p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p, p


def test_join_bucketed_key_joins_with_zero_exchanges(spark):
    """The registered bucketed-join key: SMJ over co-bucketed tables —
    the ONLY exchange in the plan is the final aggregation's."""
    from ls_hadoop_3_0_spark.sources.io import join_bucketed

    df = join_bucketed(spark, SF_DIR)
    plan = checks.formatted_plan(df)
    assert "SortMergeJoin" in plan, plan
    assert checks.shuffle_count(df) == 1, plan


def test_crossdup_shuffles_gram_stream_once(spark):
    """quality_crossdup's scale claim: the corpus-sized gram stream is
    shuffled exactly once (gram-keyed agg); the doc-keyed join adds one
    exchange per side at most — ≤3 total, and NO broadcast of the
    vocabulary-scale exclusive side may be planned statically."""
    from ls_hadoop_3_0_spark.llm.curation import quality_crossdup

    df = quality_crossdup(spark, SF_DIR)
    plan = checks.formatted_plan(df)
    assert checks.shuffle_count(df) <= 3, plan
    assert "explode" in plan.lower()
    # exactly one Generate (gram explode) node — the exploded stream is
    # never materialized a second time for a join-back
    n_generate = sum(
        1 for ln in plan.splitlines() if ln.strip().startswith("(") and "Generate" in ln
    )
    assert n_generate == 1, plan


def test_basket_pairs_topk_is_take_ordered(spark):
    """The top-50 must be a TakeOrderedAndProject, not a global sort."""
    from ls_hadoop_3_0_spark.operators.analytics import basket_pairs

    df = basket_pairs(spark, SF_DIR)
    assert checks.is_take_ordered(df), checks.formatted_plan(df)


def test_late_drop_has_no_static_broadcast_of_chunk_table(spark):
    """stream_late_drop's chunk-prefix side is time-span-scale: the
    LOGICAL plan must carry no static broadcast hint for it (AQE may
    still choose broadcast at runtime — that is the point)."""
    from ls_hadoop_3_0_spark.streaming.batch_equiv import stream_late_drop

    df = stream_late_drop(spark, SF_DIR)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in logical
    assert "broadcast" not in logical.lower(), logical


def test_partition_pruned_scan_lists_one_directory(spark):
    """The status predicate must be a PartitionFilter on the scan (planning-
    time directory elimination), not a post-scan row filter."""
    from ls_hadoop_3_0_spark.sources.io import scan_partition_pruned

    df = scan_partition_pruned(spark, SF_DIR)
    plan = checks.formatted_plan(df)
    assert "PartitionFilters" in plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("o_orderstatus" in ln and "[]" not in ln for ln in pf), plan


def test_range_banded_join_is_equi_not_bnlj(spark):
    """join_range_banded must plan an equi-join on the coarse bucket —
    never a BroadcastNestedLoopJoin (the rewrite that makes a large
    interval table joinable at 100 TB)."""
    from ls_hadoop_3_0_spark.operators.joins import join_range_banded

    plan = join_range_banded(spark, SF_DIR)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan, plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan
