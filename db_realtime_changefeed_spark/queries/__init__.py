"""Query registry — the graded surface of SURVEY.md §2.

Every operator registers itself here via the @query decorator with a
stable name (SURVEY.md §2 forbids renames across rounds) and, when
SQL-expressible, a DuckDB oracle string. `__spark_entry__.py` simply
re-exports these dicts.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a graded query. `oracle` is equivalent ANSI SQL for
    DuckDB over the pre-registered views; omit for non-SQL ops
    (driver then records the weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import (  # noqa: F401
        analytics,
        functions,
        llm,
        relational,
        scans,
        udfs,
        windows,
    )
    from ..streaming import queries as streaming_queries  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
