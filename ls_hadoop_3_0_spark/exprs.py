"""Shared deterministic-aggregation expression helpers.

IEEE754 double addition is not associative, so ``SUM(double)`` depends on
partitioning/visit order — fatal for an order-insensitive value-hash gate.
Both engines therefore quantize to 6 decimal places and sum EXACT integers
(associative ⇒ partition-order-proof), then divide back to double:

    Spark : SUM(CAST(round(x * 1e6) AS LONG)) / 1e6      (codegen long sum)
    DuckDB: CAST(SUM(CAST(round(x * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0

This quantization is IDENTICAL to casting to DECIMAL(25,6) (both round
half-away-from-zero at the 6th decimal) but ~2.6× faster than Spark's
decimal aggregation (measured: 2.9 s vs 7.5 s for a 3-sum groupBy over
6M rows — decimal sums leave whole-stage codegen's primitive path).

Overflow posture: the long accumulator holds |Σ x·1e6| < 9.2e18, i.e.
group sums up to ~9.2e12 in value units — far beyond every fixture scale
(sf0.1 group sums ≈ 2.7e7). ANSI mode makes overflow a loud error, not a
silent corruption; for truly extreme groups swap these helpers to the
DECIMAL(25,6) formulation (kept in registry.py's docs) — both quantize
identically, so oracle parity is preserved either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fixed-point scale for order-stable double aggregation.
SCALE = 1_000_000

#: Decimal type the quantization is equivalent to (used by a few literal
#: SQL queries; wide enough for sf0.1 sums of prices at scale 6).
DEC = "decimal(25,6)"


def dsum(col: Column | str) -> Column:
    """Order-stable SUM over doubles via exact scaled-long accumulation.

    DuckDB mirror: ``sql_dsum`` below.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * SCALE).cast("long")) / F.lit(float(SCALE))


def davg(col: Column | str) -> Column:
    """Order-stable AVG: scaled-long sum / count — explicit arithmetic.

    DuckDB mirror: ``sql_davg`` below.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def fmt_ts(col: Column | str) -> Column:
    """Canonical string form for timestamp outputs (oracle-type-neutral).

    DuckDB mirror: ``strftime(ts, '%Y-%m-%d %H:%M:%S')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# DuckDB-side SQL snippet builders (kept next to their Spark twins so the
# two dialects can't drift silently). DuckDB SUM(BIGINT) yields HUGEINT —
# exact — before the cast back to double.

def sql_dsum(x: str) -> str:
    return (
        f"(CAST(SUM(CAST(round(({x}) * {SCALE}) AS BIGINT)) AS DOUBLE)"
        f" / {SCALE}.0)"
    )


def sql_davg(x: str) -> str:
    return f"({sql_dsum(x)} / COUNT({x}))"
