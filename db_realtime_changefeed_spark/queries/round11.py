"""Round-11 graded queries — delta cursors on non-events table feeds
(the r10 verdict item-4 surface) and follow-on coverage.

Registered LAST in load_all (after round10c) so every name here sits
behind the certified tail (grading-rotation discipline,
queries/__init__.py). Reference citations are N/A — the reference
tree is empty (SURVEY.md §0); the binding spec is the driver
contract + SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import DEC, davg, dround6_div, dsum, sql_davg, sql_dsum

__all__ = ["load"]


def load() -> None:  # imported for side effects; keep a hook anyway
    pass


# -------------------------------------------- changefeed_table_cursor

#: The oracle reproduces multitable.build_table_chunks' deterministic
#: ts-GROUP-edge chunking in SQL: tentative bound i·per advances to
#: the end of the ts group straddling it (cum_end = running count in
#: ts order, deterministic even with duplicate order dates), and a
#: ts group's batch is the number of bounds at or below its start.
_TCUR_ORACLE = """
WITH env AS (
  SELECT o_custkey AS key, CAST(o_orderdate AS TIMESTAMP) AS ts,
         o_totalprice AS value
  FROM orders
),
p AS (
  SELECT count(*) AS n,
         CAST(ceil(count(*) / 4.0) AS BIGINT) AS per
  FROM env
),
grp AS (
  SELECT ts, count(*) AS c,
         CAST(sum(count(*)) OVER (ORDER BY ts) AS BIGINT) AS cum_end
  FROM env GROUP BY ts
),
bounds AS (
  SELECT i,
         (SELECT min(cum_end) FROM grp
          WHERE cum_end >= least(i * p.per, p.n)) AS bound
  FROM (SELECT unnest([1, 2, 3]) AS i), p
),
batched AS (
  SELECT g.ts,
         (SELECT count(*) FROM bounds b
          WHERE b.bound <= g.cum_end - g.c) AS batch_id
  FROM grp g
)
SELECT bt.batch_id, CAST(e.key AS VARCHAR) AS key,
       count(*) AS d_count,
       CAST(sum(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE) AS d_sum
FROM env e JOIN batched bt ON e.ts = bt.ts
GROUP BY 1, 2
"""


@query("changefeed_table_cursor", oracle=_TCUR_ORACLE)
def changefeed_table_cursor(spark, sf_dir):
    """DELTA-CURSOR resume on a NON-events table feed — the r10
    verdict item-4 gap (api.py refused initial_scan='no' off
    events): db.table('orders').changes() now maintains a committed
    per-batch keyed-delta log (multitable.py log_root, written from
    the merge's own persisted delta relation and gated to the
    committed pointer prefix), and TableFeed serves the full Cursor
    contract over it. The graded trajectory is the
    changefeed_cursor_resume shape on the new surface: a consumer
    that crashed after durably processing batches < mid restarts a
    BRAND-NEW cursor seeked to its persisted token; the pre-crash
    segment plus the resumed delivery must reassemble the COMPLETE
    per-batch delta log — no batch lost at the crash boundary, none
    replayed before it. The oracle independently reconstructs the
    ts-group-edge chunking (build_table_chunks) in SQL, so a wrong
    batch boundary, a phantom uncommitted segment, or a missing
    delta all break the hash.

    Scale: the log write is one small parquet dir per micro-batch of
    the batch's ALREADY-persisted delta relation — no extra
    aggregation, no driver-side state; cursor delivery is bounded by
    delivered-delta size, not state size."""
    from ..api import Database

    feed = Database(spark, sf_dir).table("orders").changes()
    log = feed.log()
    mid = 2  # default_chunks() // 2 — the persisted crash token
    consumed = log.where(F.col("batch_id") < mid)
    c = feed.cursor()
    c.seek(mid)
    rows = c.poll()
    n_batches = 4
    if c.position != n_batches:
        raise AssertionError(
            f"cursor resumed to {c.position}, expected {n_batches}")
    resumed = (
        spark.createDataFrame(rows, log.schema) if rows
        else spark.createDataFrame([], log.schema)
    )
    return consumed.unionByName(resumed)


_LI_VIEW_ORACLE = """
WITH numbered AS (
  SELECT l_orderkey, l_linenumber, l_shipdate, l_partkey,
         l_returnflag, l_extendedprice,
         row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                            l_shipdate, l_partkey) - 1 AS rn,
         count(*) OVER () AS n
  FROM lineitem
), chunked AS (
  SELECT *, CAST(floor(rn / ceil(n / 4.0)) AS BIGINT) AS chunk
  FROM numbered
), batches AS (SELECT DISTINCT chunk AS batch_id FROM chunked),
latest AS (
  SELECT b.batch_id, c.l_returnflag, c.l_extendedprice,
         row_number() OVER (
           PARTITION BY b.batch_id, c.l_orderkey, c.l_linenumber
           ORDER BY c.l_shipdate DESC, c.l_partkey DESC) AS rrn
  FROM batches b JOIN chunked c ON c.chunk <= b.batch_id
)
SELECT batch_id, l_returnflag,
       count(*) AS cnt,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
         AS sum_value
FROM latest WHERE rrn = 1
GROUP BY batch_id, l_returnflag
"""


@query("changefeed_agg_view_lineitem", oracle=_LI_VIEW_ORACLE)
def changefeed_agg_view_lineitem(spark, sf_dir):
    """COMPOSITE-KEY standing view (r10 verdict item 5 — the third
    GenericAggViewRunner table, closing the generality claim):
    lineitem's document key (l_orderkey, l_linenumber) rides the
    doc_feeds packing codec (orderkey << 3 | linenumber, per-row
    assert_true budget guard) as a DERIVED key column — the runner's
    r11 `derive` hook materializes it onto every arriving batch, and
    the LWW/retraction fold algebra downstream is untouched. The
    graded frame is the per-micro-batch agg-view trajectory
    (count/sum of l_extendedprice per l_returnflag); the oracle
    recomputes every batch prefix's LWW winners (latest l_shipdate,
    l_partkey tie-break) from the deterministic unique-tuple
    chunking. The fixture repeats (l_orderkey, l_linenumber) pairs,
    so the RETRACTION path fires on the composite key too: a
    re-arriving document retracts its old l_returnflag contribution
    and applies the new one.

    Scale: identical posture to the orders runner — touched-bucket
    partial rewrites, base-manifest-last commits; the packing adds
    one projection, no shuffle."""
    from ..streaming.generic_views import lineitem_runner

    return lineitem_runner(spark, sf_dir).agg_trajectory()


@query(
    "changefeed_table_noscan",
    oracle="""
    SELECT CAST(o_custkey AS VARCHAR) AS key,
           count(*) AS cnt,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_value
    FROM orders GROUP BY o_custkey
    """,
)
def changefeed_table_noscan(spark, sf_dir):
    """initial_scan='no' on a non-events feed: state is still
    maintained from the FULL history, but a new cursor starts at the
    registration-time log end — in replay mode the history is the
    replay, so the fresh cursor is born drained (position == log
    end + 1, poll() empty; both asserted loudly — a cursor that
    replays opted-out history is data delivered against the
    consumer's contract). The graded frame is the materialized
    state, which must equal the batch aggregate regardless of the
    cursor position — initial_scan shapes DELIVERY, never state."""
    from ..api import Database

    feed = (Database(spark, sf_dir).table("orders")
            .changes(initial_scan="no"))
    c = feed.cursor()
    end = feed.log().agg(F.max("batch_id")).collect()[0][0]
    expect = (end + 1) if end is not None else 0
    if c.position != expect:
        raise AssertionError(
            f"no-scan cursor born at {c.position}, expected {expect}")
    if c.poll():
        raise AssertionError(
            "no-scan cursor delivered opted-out history")
    return feed.state()
