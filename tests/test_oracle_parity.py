"""Differential parity: every registered (query, oracle) pair must
match DuckDB exactly at the driver's correctness SF (0.01)."""

from __future__ import annotations

import pytest

from db_realtime_changefeed_spark.queries import all_oracles, all_queries

from .oracle_harness import assert_match, run_pair

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, sf_oracle, name):
    spark_pdf, duck_pdf = run_pair(spark, sf_oracle, QUERIES[name], ORACLES[name])
    assert_match(name, spark_pdf, duck_pdf)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_oracle, name):
    """Non-SQL-expressible ops: at least run and produce a stable schema."""
    df = QUERIES[name](spark, sf_oracle)
    assert df.columns
    assert df.count() >= 0


def test_smoke_entry(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
