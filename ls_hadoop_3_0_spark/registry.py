"""Query-key registry: the driver-checked contract surface.

Every operator from SURVEY.md §2 that has a ``query key`` registers here a
callable ``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a
DuckDB oracle SQL string over the pre-registered views
``region nation customer supplier part orders lineitem events documents
embeddings``.

Determinism rules (SURVEY.md §5.2/§7 "oracle dialect drift"):

- **Sums of doubles** are order-dependent in IEEE754. Both sides therefore
  quantize to 6 decimals and aggregate EXACT scaled integers (see
  exprs.dsum / exprs.sql_dsum):
  Spark  ``SUM(CAST(round(x * 1e6) AS LONG)) / 1e6``
  DuckDB ``CAST(SUM(CAST(round(x * 1000000) AS BIGINT)) AS DOUBLE) / 1e6``.
  Integer addition is associative → bit-stable under any partitioning.
  (Identical quantization to a DECIMAL(25,6) cast, ~2.6× faster than
  decimal aggregation; a few literal SQL queries still use the decimal
  form — both are interchangeable, see exprs.py for the overflow bound.)
- **Averages / variances** are composed from those exact sums and counts
  with explicit double arithmetic (same formula both sides), never from
  the engines' streaming implementations.
- **Counts** are cast to BIGINT in DuckDB (its SUM(int) returns HUGEINT).
- **Timestamps** never appear raw in outputs — always formatted to strings
  (``date_format`` / ``strftime``) or cast to DATE, because Spark and
  DuckDB surface different logical timestamp types to the comparator.
- **Arrays/maps** never appear raw in outputs — joined to strings.
- No ``rand()`` without seed; no engine-specific hash (xxhash64) in
  oracle-compared columns (md5/sha2 are identical hex both sides).
- **Never ``round(x, d)`` on compared doubles** — the decimal-digits
  rounding paths differ by 1 ulp between engines on .5-boundary values
  (observed live on graph_pagerank). Quantize through the integer path
  instead: ``round(x * 1e6)`` → long/BIGINT → divide (dsum's mechanics;
  ``operators/graph._q6`` is the standalone helper).
- **Cast numeric constants to DOUBLE in oracle SQL** when the Spark side
  uses float literals: DuckDB parses ``0.85``/``1.0`` as DECIMAL, so
  ``(1.0 - 0.85)/n`` is exact-decimal 0.15/n — a different double than
  IEEE ``1.0 - 0.85``. ``CAST(0.85 AS DOUBLE)`` restores bit-parity.
- Iterative numerics CAN be oracle-exact: re-quantize state through the
  scaled-long path after every iteration and unroll the oracle as
  chained CTEs (graph_pagerank: 5 PageRank rounds, hash-identical).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Keys that EXECUTE a real StreamingQuery (micro-batch runtime latency
#: bound — availableNow drains, memory sinks, checkpoint IO). bench.py
#: measures these in an exclusive second pass (VERDICT r14 #6: they were
#: the only keys that WARNed every round and always exonerated under
#: focused re-measure — shared-JVM contention, not plan drift).
STREAMING_RUNTIME: set[str] = set()


def query(
    key: str, oracle: str | None = None, *, streaming_runtime: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``key``; ``oracle`` is DuckDB SQL or None.

    ``oracle=None`` ⇒ the driver records the weaker rows-only check
    (reserved for genuinely non-SQL-expressible ops: seeded sampling,
    approximate sketches, pandas-UDF internals).

    ``streaming_runtime=True`` marks keys that start a real
    StreamingQuery — bench.py gives them an exclusive second pass.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        if streaming_runtime:
            STREAMING_RUNTIME.add(key)
        return fn

    return deco
