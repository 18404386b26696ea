"""Mechanical 2×-gate check: diff a bench JSON against governing baselines.

Usage:
    python tools/check_bench.py [bench.json]   # default: newest BENCH_LOCAL_r*.json

Prints every key whose in-suite timing exceeds 1.5× of its governing
baseline (the documented shared-JVM inflation band tops out there — keys
above it deserve a focused min-of-2 re-measure before calling drift),
and exits 1 if any key exceeds the binding 2× gate (BASELINE.json B2)
or the run has failures. Sub-0.5 s baselines use an absolute floor
(+0.5 s) before ratio-flagging — a 0.2 s → 0.45 s wobble is host noise,
not a regression signal.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from dump_baselines import governing_table  # noqa: E402

ABS_FLOOR = 0.5  # absolute threshold floor, applied only when base < 0.5 s

#: Machine-readable steal/noise adjudications (VERDICT r13 "what's wrong"
#: #1): a committed closing artifact can retain one hypervisor-steal-
#: contaminated record whose focused min-of-2 re-measure is clean. Each
#: entry is scoped to ONE artifact basename so future runs still gate the
#: key — this records an adjudicated measurement, it never suppresses a
#: key forever. Value = (clean focused min-of-2 seconds, committed file
#: that records that measurement, verbatim quote from it — the quote is
#: VERIFIED against the file before the adjudication applies, so the
#: replacement number is machine-checkable, ADVICE r14).
ADJUDICATIONS: dict[tuple[str, str], tuple[float, str, str]] = {
    ("BENCH_LOCAL_r13.json", "agg_approx_distinct_merge"): (
        1.15,
        "BASELINE.md",
        "`agg_approx_distinct_merge` 2.57 in-suite — focused\n"
        "min-of-2 solo reads **1.15 s = 0.99× of its 1.16 baseline**",
    ),
    # VERDICT r16 #2: the six 1.5-2x WARN keys in the r16 DRIVER bench,
    # re-measured clean in r17 (OPTIMIZATION_r17.md §#2).
    ("BENCH_r16.json", "analytics_cohort_retention"): (
        0.75,
        "OPTIMIZATION_r17.md",
        "focused min-of-2\n  reads **0.75 s = 1.04× of its 0.72 baseline**",
    ),
    ("BENCH_r16.json", "analytics_idle_customers"): (
        0.38,
        "OPTIMIZATION_r17.md",
        "focused min-of-2 reads\n  **0.38 s = 0.98× of its 0.386 baseline**",
    ),
    ("BENCH_r16.json", "analytics_excess_inventory"): (
        1.22,
        "OPTIMIZATION_r17.md",
        "focused min-of-2\n  reads **1.22 s = 1.14× of its 1.07 baseline**",
    ),
    ("BENCH_r16.json", "analytics_large_orders"): (
        0.92,
        "OPTIMIZATION_r17.md",
        "focused min-of-2 reads\n  **0.92 s = 1.20× of its 0.77 baseline**",
    ),
    ("BENCH_r16.json", "agg_sum"): (
        0.55,
        "OPTIMIZATION_r17.md",
        "focused min-of-4 fresh-JVM reads\n  **0.55 s = 1.43× of its 0.38 baseline**",
    ),
    ("BENCH_r16.json", "agg_heavy_hitters"): (
        0.45,
        "OPTIMIZATION_r17.md",
        "focused min-of-4 fresh-JVM\n  reads **0.45 s = 1.39× of its 0.33 baseline**",
    ),
}


def _adjudicated(path_base: str, key: str) -> tuple[float, str] | None:
    """Return (clean seconds, note) if an adjudication exists for this
    (artifact, key) AND its verbatim quote is present in the committed
    source file — otherwise None (an unverifiable entry never applies)."""
    entry = ADJUDICATIONS.get((path_base, key))
    if entry is None:
        return None
    adj_sec, src_file, quote = entry
    try:
        with open(os.path.join(REPO, src_file)) as fh:
            if quote not in fh.read():
                print(
                    f"ADJUD-UNVERIFIED {key}: quote not found in "
                    f"{src_file}; adjudication ignored"
                )
                return None
    except OSError:
        return None
    return adj_sec, f"{src_file}: {quote.splitlines()[-1].strip()}"


def main() -> int:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        cands = sorted(glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json")))
        if not cands:
            print("no BENCH_LOCAL_r*.json found and no path given")
            return 2
        path = cands[-1]
    with open(path) as fh:
        raw = fh.read().strip()
    try:
        data = json.loads(raw)  # whole file (pretty-printed driver wrapper)
    except json.JSONDecodeError:
        data = json.loads(raw.splitlines()[-1])  # bench stdout capture
    if isinstance(data.get("parsed"), dict):
        # Driver-wrapper artifact (BENCH_r*.json): the bench stdout
        # lives under "parsed" — check the same gate against it.
        data = data["parsed"]
    timings = data.get("queries", {})
    baselines = governing_table()

    bad = False
    if data.get("failed"):
        print(f"FAILED KEYS in {os.path.basename(path)}: {data['failed']}")
        bad = True

    warned = 0
    for key in sorted(timings):
        sec = timings[key]
        if sec < 0 or key not in baselines:
            continue
        base, src = baselines[key]
        floor = ABS_FLOOR if base < ABS_FLOOR else 0.0
        adj = _adjudicated(os.path.basename(path), key)
        if adj is not None and sec > 1.5 * base + floor:
            # Applies to the WARN band too (VERDICT r16 #2): a verified
            # clean re-measure supersedes the contaminated in-suite
            # record for BOTH thresholds of this one artifact.
            adj_sec, note = adj
            if adj_sec <= 2.0 * base + floor:
                print(
                    f"ADJUD {key}: {sec:.2f}s in-artifact superseded by "
                    f"{adj_sec:.2f}s focused re-measure ({note})"
                )
                sec = adj_sec
        if sec > 2.0 * base + floor:
            print(f"GATE  {key}: {sec:.2f}s > 2x of {base:.2f}s ({src})")
            bad = True
            warned += 1
        elif sec > 1.5 * base + floor:
            print(f"WARN  {key}: {sec:.2f}s > 1.5x of {base:.2f}s ({src})")
            warned += 1
    nb = sum(1 for k in timings if k in baselines)
    print(
        f"checked {nb}/{len(timings)} keys of {os.path.basename(path)} "
        f"against governing baselines; {warned} above 1.5x "
        f"({'GATE VIOLATION' if bad else 'gate OK'})"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
