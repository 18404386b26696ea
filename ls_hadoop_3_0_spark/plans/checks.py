"""Physical-plan introspection — SURVEY.md §4 discipline, made checkable.

The task charter's scale rules ("filters pushed to the scan", "small dims
broadcast", "partial aggregation before the shuffle", "top-k must not
global-sort") are asserted here against ``explain('formatted')`` output so
they can't silently regress. Used by tests/test_plans.py.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan reports PushedFilters mentioning every fragment."""
    plan = formatted_plan(df)
    if "PushedFilters: [" not in plan:
        return False
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line and "[]" not in line
    ]
    blob = "\n".join(pushed)
    return all(frag in blob for frag in fragments)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (ReadSchema lines)."""
    cols: list[str] = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line:
            inside = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inside.split(",") if ":" in f)
    return cols


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_static_broadcast_hint(df: DataFrame) -> bool:
    """True if the LOGICAL plan carries an explicit broadcast hint.

    Distinguishes a hand-placed ``F.broadcast(...)`` (a static claim that
    a side is design-bounded — forbidden for corpus-scale sides by the
    repo rule) from an AQE/CBO-chosen BroadcastHashJoin (a runtime
    decision based on measured size, always allowed). The hint survives
    analysis as ``ResolvedHint (strategy=broadcast)`` in the analyzed
    plan. Matches the BROADCAST strategy specifically: a legitimate
    non-broadcast hint (``.hint("shuffle_hash")`` / ``.hint("merge")``,
    which the repo rules encourage on corpus-scale sides) must NOT count.
    """
    return count_static_broadcast_hints(df) > 0


def count_static_broadcast_hints(df: DataFrame) -> int:
    """Number of hand-placed broadcast hints in the analyzed plan.

    For keys that legitimately broadcast DESIGN-bounded dims (nation,
    region, 1-row scalars) next to AQE-planned growing joins: assert the
    hint count stays at exactly the audited dim joins, so a corpus-scale
    side can't silently acquire a static hint later. Only the broadcast
    STRATEGY is counted — shuffle_hash/merge hints are scale-safe (they
    pick among shuffle strategies, never force a corpus-wide replicate).
    """
    plan = df._jdf.queryExecution().analyzed().toString()
    return plan.count("ResolvedHint (strategy=broadcast") + plan.count(
        "UnresolvedHint BROADCAST"
    )


def has_partial_aggregation(df: DataFrame) -> bool:
    """Partial→final HashAggregate around the exchange (combiner analog)."""
    plan = formatted_plan(df)
    return plan.count("HashAggregate") >= 2 or "partial_" in plan


def is_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def executed_plan(df: DataFrame) -> str:
    """Final ADAPTIVE plan string — run the query, then read the plan.

    AQE re-plans at runtime (skew-split, coalesce, SMJ→BHJ), so runtime
    decisions like ``skew=true`` only exist on the executed plan, not on
    ``explain()`` before an action.
    """
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def shuffle_count(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges (broadcast exchanges excluded — a
    broadcast is exactly the technique that avoids the shuffle)."""
    import re

    return len(re.findall(r"\)\s+Exchange\b", formatted_plan(df)))
