"""§2.E window functions — ranking, analytic, row/range frames,
top-k per group.

All windows partition before ordering, so at scale each is one
hash-shuffle on the partition key + in-partition sort; no global
sort anywhere. Running double sums are decimal-stabilized because
DuckDB evaluates sliding frames with a segment tree (different float
addition order than Spark's running accumulation) — _util.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import DEC


@query(
    "win_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def win_rank(spark, sf_dir):
    """row_number/rank/dense_rank/ntile per nation (§2.E1); order key
    (acctbal, custkey) is unique → deterministic."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_analytic",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_value,
           first_value(value) OVER
             (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS first_value_seen
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def win_analytic(spark, sf_dir):
    """lag/lead/first over per-user event streams (§2.E2)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
        F.first("value").over(wf).alias("first_value_seen"),
    )


@query(
    "win_frame_rows",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER
             (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_sum,
           count(*) OVER
             (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_n
    FROM events
    """,
)
def win_frame_rows(spark, sf_dir):
    """Running sum, ROWS frame (§2.E3), decimal-stabilized."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double")
        .alias("running_sum"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "win_frame_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS hour_sum,
           count(*) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS hour_n
    FROM events
    """,
)
def win_frame_range(spark, sf_dir):
    """Sliding 1-hour RANGE frame on event time (§2.E4). Both engines
    order by integer epoch-microseconds so frame boundaries agree
    exactly despite the parquet ns→µs truncation (FIXTURES.md)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("hour_sum"),
        F.count(F.lit(1)).over(w).alias("hour_n"),
    )


@query(
    "win_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC)
               AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def win_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer (§2.E5). Spark's WindowGroupLimit
    rule pushes the rn<=3 limit into the shuffle (partial top-k
    map-side) — the scalable per-group top-k."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )
