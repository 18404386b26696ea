"""r9 keys: trigger-independence streaming twin + HLL mergeability gate."""

from __future__ import annotations

import pytest

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.plans import checks

from .conftest import SF_DIR


def test_hll_merge_partition_independent(spark):
    rows = {
        r["l_returnflag"]: r
        for r in engine.QUERIES["agg_approx_distinct_merge"](spark, SF_DIR).collect()
    }
    assert rows, "no groups"
    for flag, r in rows.items():
        assert r["merge_matches"] is True, (
            f"{flag}: two shardings unioned to different estimates"
        )
        assert r["hll_within_5pct"] is True, flag
        assert r["exact_distinct"] > 0


def test_hll_merge_is_partial_aggregated(spark):
    df = engine.QUERIES["agg_approx_distinct_merge"](spark, SF_DIR)
    assert checks.has_partial_aggregation(df)


def test_spread_thresholds(spark, tmp_path):
    """spread() re-splits only when the footer row count says the
    under-split forgoes real map work; below threshold the plan is
    untouched (no exchange added to small-fixture keys)."""
    from ls_hadoop_3_0_spark.tables import spread

    p = str(tmp_path / "docs.parquet")
    spark.range(0, 1000).write.parquet(p)
    one = spark.read.parquet(p).coalesce(1)
    par = one.sparkSession.sparkContext.defaultParallelism
    # 1000 rows / 1 split < 20k threshold -> untouched
    assert spread(one, p).rdd.getNumPartitions() == 1
    # same data, aggressive threshold -> re-split to defaultParallelism
    assert spread(one, p, min_rows_per_split=100).rdd.getNumPartitions() == par
    # already well-split -> no-op regardless of threshold
    wide = spark.read.parquet(p).repartition(par)
    assert spread(wide, p, min_rows_per_split=1).rdd.getNumPartitions() == par


@pytest.mark.streaming
def test_python_datasource_trigger_independence(spark):
    """The rate-limited processing-time run must produce the exact digest
    of the zero-interval run — micro-batch partitioning varies, the
    associative digest must not."""
    rt = engine.QUERIES["stream_python_datasource_rt"](spark, SF_DIR).collect()
    base = engine.QUERIES["stream_python_datasource"](spark, SF_DIR).collect()
    assert len(rt) == len(base) == 1
    assert rt[0].asDict() == base[0].asDict()
    assert rt[0]["matches_batch"] is True
