"""Cross-engine deterministic float rounding.

Spark's `round()` converts doubles through BigDecimal.valueOf (shortest
decimal representation, HALF_UP), DuckDB rounds the exact binary value —
so `round(0.57405..., 4)` legitimately differs between them whenever the
shortest repr lands on a decimal half. The correctness gate instead rounds
on a fixed grid:

    grid4(x) = floor(x * 10000 + 0.5) / 10000

which is pure double arithmetic: engines that computed bit-identical x
produce bit-identical grid4(x). Used by every float column the DuckDB
oracle compares, and for rank ordering so ties break on ids identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["grid", "grid4", "sql_grid4"]

_SCALE = 10000


def grid(col: Column, digits: int) -> Column:
    """floor(x*10^digits + 0.5)/10^digits as a double column."""
    scale = float(10**digits)
    return F.floor(col.cast("double") * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def grid4(col: Column) -> Column:
    """floor(x*1e4 + 0.5)/1e4 as a double column."""
    return grid(col, 4)


def sql_grid4(expr: str) -> str:
    """Same rounding as ANSI SQL text for the DuckDB oracles."""
    return f"(floor(CAST(({expr}) AS DOUBLE) * {_SCALE} + 0.5) / {_SCALE})"
