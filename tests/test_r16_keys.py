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
