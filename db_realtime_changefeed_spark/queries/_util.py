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


def dround6_div(num: Column, den: Column) -> Column:
    """Tie-deterministic 6-dp round of a RATIONAL quotient.

    round(num/den, 6) is unsafe when num is an exact decimal (or
    integer) and den an integer: the quotient can land EXACTLY on a
    6-dp midpoint (observed: -0.088309/26 = -0.0033965), where
    Spark's HALF_UP and DuckDB's scaled-nearbyint disagree. Both
    engines computing floor(num*1e6/den + 0.5)/1e6 instead resolve
    the tie identically (floor of the same IEEE double), and agree
    with round() everywhere else. Pair with sql_dround6_div."""
    return (
        F.floor(num * F.lit(1000000.0) / den + F.lit(0.5)).cast("double")
        / F.lit(1000000.0)
    )


def sql_dround6_div(num: str, den: str) -> str:
    return (
        f"FLOOR(({num}) * 1000000.0 / ({den}) + 0.5) / 1000000.0"
    )
