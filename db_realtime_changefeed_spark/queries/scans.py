"""§2.A scans — parquet source with pushdown/pruning.

A1 `scan_parquet`, A2 `scan_pruned` (SURVEY.md §2.A). The streaming
sources A3-A5 live in `streaming/`.

Scale notes (100 TB): the scan path relies entirely on Spark's
vectorized parquet reader — predicate pushdown to row groups, column
pruning, and partition pruning (once the catalog points at a
partitioned layout) are Catalyst built-ins; tests assert PushedFilters
/ ReadSchema appear in the physical plan (tests/test_explain.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import dsum, sql_dsum


@query(
    "scan_parquet",
    oracle=f"""
    SELECT count(*) AS n_rows,
           {sql_dsum('l_extendedprice')} AS sum_price,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    """,
)
def scan_parquet(spark, sf_dir):
    """Full-table scan + checksum of the largest fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "scan_pruned",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity < 5
    """,
)
def scan_pruned(spark, sf_dir):
    """Column-pruned, predicate-pushed scan: only 4 of 11 columns
    reach the reader; both predicates land in PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("2000-01-01")))
            & (F.col("l_quantity") < 5)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
