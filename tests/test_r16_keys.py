"""Round-16 keys and fixes.

Covers the ADVICE r15 run_scratch hardening (heartbeat prune-safety,
metastore residue) and the r16 VERDICT keys as they land.
"""

import os
import shutil
import time

import pytest

from ls_hadoop_3_0_spark.sources import io as sio


@pytest.fixture()
def hb_parent():
    sf_dir = "/tmp/r16_hbtest_sf"
    parent = os.path.join(sio.SCRATCH_ROOT, "r16_hbtest_sf")
    shutil.rmtree(parent, ignore_errors=True)
    os.makedirs(parent, exist_ok=True)
    yield sf_dir, parent
    shutil.rmtree(parent, ignore_errors=True)


def _make_stale_dir(parent: str, name: str) -> str:
    p = os.path.join(parent, name)
    os.makedirs(p, exist_ok=True)
    old = time.time() - sio._STALE_SECONDS - 600
    os.utime(p, (old, old))
    return p


def test_stale_sibling_without_heartbeat_is_pruned(hb_parent):
    sf_dir, parent = hb_parent
    dead = _make_stale_dir(parent, "hbt_dead123")
    sio.run_scratch(sf_dir, "hbt_new456", stem="hbt_")
    assert not os.path.exists(dead)


def test_heartbeat_keeps_old_dir_alive(hb_parent):
    """A frozen index dir's mtime never advances while an in-process
    cache serves it — a recent heartbeat must veto the age prune
    (ADVICE r15: overnight session vs sibling started >6h in)."""
    sf_dir, parent = hb_parent
    live = _make_stale_dir(parent, "hbt_live789")
    sio.touch_heartbeat(live)
    # dir mtime is still ancient; only the heartbeat is fresh
    old = time.time() - sio._STALE_SECONDS - 600
    os.utime(live, (old, old))
    sio.run_scratch(sf_dir, "hbt_newabc", stem="hbt_")
    assert os.path.exists(live)


def test_stale_heartbeat_does_not_veto_prune(hb_parent):
    sf_dir, parent = hb_parent
    dead = _make_stale_dir(parent, "hbt_deadhb1")
    sio.touch_heartbeat(dead)
    old = time.time() - sio._STALE_SECONDS - 600
    hb = os.path.join(dead, sio._HEARTBEAT)
    os.utime(hb, (old, old))
    os.utime(dead, (old, old))
    sio.run_scratch(sf_dir, "hbt_newdef", stem="hbt_")
    assert not os.path.exists(dead)


def test_cache_hit_touches_heartbeats(spark):
    """The three frozen-index caches refresh their dirs' heartbeats on
    every cache hit, so long-lived sessions stay prune-safe."""
    from tests.conftest import SF_DIR

    from ls_hadoop_3_0_spark.llm.dedup import (
        incremental_prior_index,
    )

    names = incremental_prior_index(spark, SF_DIR)  # build (or cached)
    hbs = [
        os.path.join(sio.scratch(SF_DIR, f"{n}_data"), sio._HEARTBEAT)
        for n in names
    ]
    before = time.time()
    assert incremental_prior_index(spark, SF_DIR) == names  # cache hit
    for hb in hbs:
        assert os.path.exists(hb)
        assert os.path.getmtime(hb) >= before - 1


@pytest.mark.extended  # heavy leg (VERDICT r16 #1): >8 s behavioral pin
def test_pipeline_v5_is_v4_minus_contaminated(spark):
    """pipeline_curation_v5 = v4 with the token-grain decontamination
    gate: survivors are exactly v4's minus the new-slice docs sharing
    an eval token-gram, and pack offsets are recomputed on the reduced
    survivor set (a prefix over v5's own docs, not a filtered v4)."""
    from tests.conftest import SF_DIR

    from ls_hadoop_3_0_spark.functions.text import _bpe_seg_ids
    from ls_hadoop_3_0_spark.llm.curation import (
        _bench_token_grams,
        _token_gram_stream,
        contamination_tokens,
    )
    from ls_hadoop_3_0_spark.llm.dedup import INCR_NEW_PRED
    from ls_hadoop_3_0_spark.llm.pipeline import (
        pipeline_curation_v4,
        pipeline_curation_v5,
    )

    v4 = {r.doc_id: r for r in pipeline_curation_v4(spark, SF_DIR).collect()}
    v5 = {r.doc_id: r for r in pipeline_curation_v5(spark, SF_DIR).collect()}
    contam = {
        r.doc_id
        for r in contamination_tokens(spark, SF_DIR)
        .filter(INCR_NEW_PRED)
        .collect()
    }
    assert set(v5) == set(v4) - contam
    assert set(v4) & contam, "fixture has no leaked survivors — gate untested"
    # per-doc stats survive unchanged; pack offsets are recomputed
    for d, r in v5.items():
        assert r.n_tokens == v4[d].n_tokens
        assert r.score == v4[d].score
    starts = sorted((r.pack_start, r.n_tokens) for r in v5.values())
    pos = 0
    for s, n in starts:
        assert s == pos  # contiguous prefix over v5's own survivors
        pos += n


def test_token_gram_stream_matches_contamination_tokens(spark):
    """The factored helpers reproduce contamination_tokens' exact
    output (refactor guard)."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_DIR

    from ls_hadoop_3_0_spark.functions.text import _bpe_seg_ids
    from ls_hadoop_3_0_spark.llm.curation import (
        _bench_token_grams,
        _token_gram_stream,
        contamination_tokens,
    )
    from ls_hadoop_3_0_spark.tables import load

    seg = _bpe_seg_ids(spark, SF_DIR).select("word", "ids")
    docs = load(spark, SF_DIR, "documents")
    got = (
        _token_gram_stream(docs, seg)
        .join(F.broadcast(_bench_token_grams(spark, seg)), "gram")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("bench_id").alias("n_bench_docs"),
        )
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, contamination_tokens(spark, SF_DIR).collect()))
    assert a == b


def test_stale_saveastable_dir_drops_metastore_entry(hb_parent, spark):
    """Pruning a hard-killed sibling's saveAsTable dir also drops its
    catalog entry (ADVICE r15: the metastore half of the r14 garbage)."""
    sf_dir, parent = hb_parent
    tbl = "r16_hbt_residue"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    dead = os.path.join(parent, f"{tbl}_data")
    spark.range(3).write.mode("overwrite").format("parquet").option(
        "path", dead
    ).saveAsTable(tbl)
    old = time.time() - sio._STALE_SECONDS - 600
    os.utime(dead, (old, old))
    try:
        assert spark.catalog.tableExists(tbl)
        sio.run_scratch(sf_dir, f"{tbl}_other", stem=f"{tbl}_")
        assert not os.path.exists(dead)
        assert not spark.catalog.tableExists(tbl)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
