"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual surface lives in the ``ls_hadoop_3_0_spark`` package; this
module only adapts its registry to the driver's shape. See SURVEY.md §2
for the key-by-key inventory and registry.py for the cross-engine
determinism rules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import ls_hadoop_3_0_spark as engine
from ls_hadoop_3_0_spark.operators.aggregates import pricing_summary
from ls_hadoop_3_0_spark.tables import DEFAULT_SF_DIR

def _stamped_from_artifacts() -> frozenset[str]:
    """Keys present in any driver-written CORRECTNESS_r*.json.

    The driver drops its per-round correctness artifact into the repo
    root; reading them at import time keeps the sweep order
    self-maintaining — newly stamped keys leave the fresh pool
    automatically next round, with no hand-edited list to go stale
    (which happened three rounds running with the static set below).
    """
    import glob
    import json
    import os

    keys: set[str] = set()
    here = os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(path) as fh:
                keys.update(json.load(fh))
        except Exception:
            continue  # a malformed artifact must not break the contract
    return frozenset(keys)


#: Keys already stamped by a driver sweep. Each sweep processes the
#: first 50 ``queries()`` keys and stops, so ``queries()`` yields
#: never-stamped keys first — each round's sweep reaches the keys with
#: the least driver-side evidence. Derived ENTIRELY from the on-disk
#: CORRECTNESS_r*.json artifacts (committed by the driver each round);
#: the hand-kept static floor that used to live here (the r01/r02 key
#: lists) was retired in r7 once every one of those keys existed in an
#: artifact — redundant state that could have masked a deleted
#: artifact. If no artifacts exist (fresh checkout), every key is
#: "fresh" and the sweep starts from the oracle-backed front — the
#: correct cold-start behavior.
_STAMPED_PRIOR = _stamped_from_artifacts()


def _sweep_order(keys: dict) -> list[str]:
    """Never-driver-stamped keys first (stable within each group).

    Within the fresh group: oracle-backed keys precede rows-only keys
    (a capped sweep should spend each early slot on a full
    rows+schema+hash stamp, not a weaker rows-only row), and the
    round-1 verdict's explicitly-unstamped families (llm/, streaming/,
    functions/) come before the rest.
    """

    def prio(k: str) -> tuple[int, int]:
        mod = getattr(engine.QUERIES[k], "__module__", "")
        flagged = (".llm." in mod) or (".streaming." in mod) or (".functions." in mod)
        return (k not in engine.ORACLES, not flagged)

    # Stamped keys whose CONTRACT changed since their stamp (rows-only →
    # oracle-backed) — their old artifact row is the weaker check, so
    # they re-enter right behind the fresh pool for a full
    # rows+schema+hash stamp. r14: knn_lsh/knn_ivf graduated to
    # oracle-backed in r13 but their last driver stamp (r5) predates the
    # oracles (multimodal_extract got its oracle stamp in r13 — done).
    refresh = {"knn_lsh", "knn_ivf"}

    fresh = [k for k in keys if k not in _STAMPED_PRIOR]
    fresh.sort(key=prio)  # stable within each (oracle, family) tier
    stamped = sorted(
        (k for k in keys if k in _STAMPED_PRIOR),
        key=lambda k: k not in refresh,
    )  # stable: refresh keys first, registry order otherwise
    return fresh + stamped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-style pricing summary: scan → pushed filter → partial/final
    hash aggregate → sort (SURVEY.md §7 Phase 0).
    """
    return pricing_summary(spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {k: engine.QUERIES[k] for k in _sweep_order(engine.QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per key (omissions ⇒ rows-only check)."""
    return {
        k: engine.ORACLES[k] for k in _sweep_order(engine.QUERIES) if k in engine.ORACLES
    }
