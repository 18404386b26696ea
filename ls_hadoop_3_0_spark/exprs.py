"""Shared deterministic-aggregation expression helpers.

IEEE754 double addition is not associative, so ``SUM(double)`` depends on
partitioning/visit order — fatal for an order-insensitive value-hash gate.
Both engines instead sum through exact decimals (associative), then cast
back to double. See registry.py docstring for the full rule set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for sf0.1 sums of prices (~6e8) at scale 6.
DEC = "decimal(25,6)"


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-stable SUM over doubles: sum exact decimals, emit double.

    DuckDB mirror: ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-stable AVG: decimal sum (double) / count — explicit arithmetic.

    DuckDB mirror:
    ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def fmt_ts(col: Column | str) -> Column:
    """Canonical string form for timestamp outputs (oracle-type-neutral).

    DuckDB mirror: ``strftime(ts, '%Y-%m-%d %H:%M:%S')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


# DuckDB-side SQL snippet builders (kept next to their Spark twins so the
# two dialects can't drift silently).

def sql_dsum(x: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({x} AS DECIMAL(25,{scale}))) AS DOUBLE)"


def sql_davg(x: str, scale: int = 6) -> str:
    return f"({sql_dsum(x, scale)} / COUNT({x}))"
