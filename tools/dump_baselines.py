"""Consolidate the governing per-key baselines into ONE generated table.

BASELINE.md grew by accretion (r1 suite notes + r2/r5/r6/r7/r8 addenda);
finding the governing number for a key took archaeology (r9 verdict item
7). This tool derives the single source of truth mechanically:

1. Parse BASELINE.md top-to-bottom for explicit per-key numbers —
   markdown tables whose first column is a key and second a seconds
   value, plus the prose pattern `` `key` X.XX s governing baseline ``.
   Later mentions override earlier ones (addenda are chronological, and
   re-baselines like graph_triangles 16.11 → 8.60 are deliberate).
2. For keys that never got an explicit row (r1-r2 era keys recorded only
   as suite prose, plus each round's debuts), the governing number is
   the key's value in the EARLIEST committed full-suite bench artifact
   (`BENCH_LOCAL_r*.json`, emitted by bench.py and committed per round
   since r10) — i.e. the key's debut measurement, never a later (maybe
   regressed) one.

Output: rewrites the generated section of BASELINE.md between the
BEGIN/END GENERATED BASELINES markers (appending it on first run) and
prints a one-line summary. Run after bench.py each round:

    python bench.py > /tmp/bench.json && \
    cp /tmp/bench.json BENCH_LOCAL_r{N}.json && \
    python tools/dump_baselines.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE_MD = os.path.join(REPO, "BASELINE.md")
BEGIN = "<!-- BEGIN GENERATED BASELINES (tools/dump_baselines.py) -->"
END = "<!-- END GENERATED BASELINES -->"

_TABLE_ROW = re.compile(
    r"^\|\s*`?([a-z][a-z0-9_]+)`?\s*\|\s*([0-9]+\.[0-9]+)\s*\|"
)
_PROSE = re.compile(
    r"`([a-z][a-z0-9_]+)`\s+(?:and\s+)?([0-9]+\.[0-9]+)\s*s\s+governing baseline"
)
_SECTION = re.compile(r"^##+\s+(.*)$")


def parse_explicit(md_text: str) -> dict[str, tuple[float, str]]:
    """key -> (seconds, source-section); later mentions win."""
    out: dict[str, tuple[float, str]] = {}
    section = "header"
    for line in md_text.splitlines():
        if BEGIN in line:
            break  # never re-parse our own generated output
        m = _SECTION.match(line)
        if m:
            section = m.group(1).strip()
            continue
        m = _TABLE_ROW.match(line)
        if m and m.group(1) not in ("key",):
            out[m.group(1)] = (float(m.group(2)), section)
            continue
        for key, sec in _PROSE.findall(line):
            out[key] = (float(sec), section)
    return out


def parse_bench_artifacts() -> dict[str, tuple[float, str]]:
    """key -> (seconds, artifact) from the EARLIEST artifact holding it."""
    out: dict[str, tuple[float, str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_LOCAL_r*.json"))):
        name = os.path.basename(path)
        try:
            with open(path) as fh:
                data = json.loads(fh.read().strip().splitlines()[-1])
        except (ValueError, OSError) as exc:
            print(f"WARN: skipping unreadable {name}: {exc}", file=sys.stderr)
            continue
        for key, sec in data.get("queries", {}).items():
            if sec >= 0 and key not in out:
                out[key] = (float(sec), name)
    return out


def registered_keys() -> list[str]:
    sys.path.insert(0, REPO)
    from ls_hadoop_3_0_spark import QUERIES  # noqa: PLC0415 (spark not started)

    return sorted(QUERIES)


def governing_table() -> dict[str, tuple[float, str]]:
    with open(BASELINE_MD) as fh:
        md = fh.read()
    explicit = parse_explicit(md)
    debut = parse_bench_artifacts()
    table: dict[str, tuple[float, str]] = {}
    for key in registered_keys():
        if key in explicit:
            table[key] = explicit[key]
        elif key in debut:
            sec, art = debut[key]
            table[key] = (sec, f"debut in {art} (in-suite)")
    return table


def main() -> None:
    table = governing_table()
    keys = registered_keys()
    missing = [k for k in keys if k not in table]

    lines = [
        BEGIN,
        "",
        "## Governing per-key baselines (generated — do not hand-edit)",
        "",
        "Regenerate with `python tools/dump_baselines.py`. Explicit",
        "BASELINE.md rows/prose win (latest mention governs — deliberate",
        "re-baselines included); keys never given an explicit row govern at",
        "their debut value in the earliest committed `BENCH_LOCAL_r*.json`",
        "(in-suite numbers — expect the documented 1.3-1.5× shared-JVM",
        "inflation vs focused min-of-2 when comparing). The 2× bench gate",
        "(BASELINE.json B2) is checked against this table by",
        "`tools/check_bench.py`.",
        "",
        "| key | governing s | source |",
        "| --- | --- | --- |",
    ]
    for key in keys:
        if key in table:
            sec, src = table[key]
            lines.append(f"| `{key}` | {sec:.2f} | {src} |")
    if missing:
        lines += [
            "",
            f"Keys with no governing number yet ({len(missing)}):",
            ", ".join(f"`{k}`" for k in missing),
            "(they gain one when the next BENCH_LOCAL artifact is committed).",
        ]
    lines += ["", END]
    block = "\n".join(lines)

    with open(BASELINE_MD) as fh:
        md = fh.read()
    if BEGIN in md:
        md = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END), block, md, flags=re.S
        )
    else:
        md = md.rstrip() + "\n\n" + block + "\n"
    with open(BASELINE_MD, "w") as fh:
        fh.write(md)
    print(
        f"governing baselines: {len(table)}/{len(keys)} keys "
        f"({len(missing)} awaiting a bench artifact)"
    )


if __name__ == "__main__":
    main()
