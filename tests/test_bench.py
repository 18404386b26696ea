"""bench.py contract: one parseable JSON line with the driver's fields.

Runs a 3-key subset at sf0.001 in a subprocess (the exact invocation the
driver uses, just filtered) so a bench.py regression can't reach the
per-round BENCH artifact unnoticed."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_driver_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_KEYS="agg_sum,topk,wordcount",
        SPARK_GRAFT_CPUS="8",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # EXACTLY one stdout line (VERDICT r16 #10): the driver json.loads
    # the bench stdout wholesale — any stray print would break the
    # round-over-round table the way the r15 artifact did. Warnings
    # belong on stderr.
    lines = out.stdout.strip().splitlines()
    assert len(lines) == 1, f"bench.py stdout must be ONE JSON line, got {lines!r}"
    d = json.loads(lines[0])
    assert d["unit"] == "sec" and d["value"] >= 0
    assert set(d["queries"]) == {"agg_sum", "topk", "wordcount"}
    assert d["failed"] == []
    assert d["sf"] == 0.001
