"""Determinism helpers shared by all graded queries.

The driver hashes query output values (order-insensitive) against a
DuckDB oracle (FIXTURES.md "Determinism traps"). Floating-point SUM /
AVG are order-dependent, and Spark (partitioned accumulation, window
running-sums) and DuckDB (vectorized / segment-tree windows) add in
different orders. Fix: route every graded double aggregation through
DECIMAL(18,6) — the double→decimal cast is deterministic and
identical in both engines for non-tie values, decimal addition is
associative, and the final decimal→double cast is exact-deterministic.
This costs nothing at scale (decimal sum is still a single partial+
final hash aggregate JVM-side, no Python involved).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str) -> Column:
    """Order-insensitive double sum (unaliased)."""
    return F.sum(_col(c).cast(DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-insensitive double avg: exact decimal sum, then one
    IEEE double division (identical in both engines)."""
    col = _col(c)
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return (f"CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
            f" / count({expr})")
