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
