"""Round-10 graded queries.

Registered LAST in load_all (after round9b) so every name here sits
behind the certified-pending rotation tail (grading-rotation
discipline, queries/__init__.py). Reference citations are N/A — the
reference tree is empty (SURVEY.md §0); the binding spec is the
driver contract + SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import dsum, sql_dsum

__all__ = ["load"]


def load() -> None:  # imported for side effects; keep a hook anyway
    pass


# ---------------------------------------------- changefeed_topk_orders

def _topk_orders_oracle() -> str:
    from ..streaming.replay import default_chunks

    nb = default_chunks()
    return f"""
    WITH numbered AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
             count(*) OVER () AS n
      FROM orders
    ), chunked AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
             CAST(floor(rn / ceil(n / {nb}.0)) AS BIGINT) AS chunk
      FROM numbered
    ), batches AS (
      SELECT DISTINCT chunk AS batch_id FROM chunked
    ), latest AS (
      SELECT b.batch_id, c.o_custkey, c.o_totalprice, c.o_orderkey,
             row_number() OVER (
               PARTITION BY b.batch_id, c.o_custkey
               ORDER BY c.o_orderdate DESC, c.o_orderkey DESC) AS rrn
      FROM batches b JOIN chunked c ON c.chunk <= b.batch_id
    ), vis AS (
      SELECT batch_id, o_custkey, o_totalprice, o_orderkey
      FROM latest WHERE rrn = 1
    ), ranked AS (
      SELECT batch_id, o_custkey, o_totalprice, o_orderkey,
             row_number() OVER (PARTITION BY batch_id
                                ORDER BY o_totalprice DESC,
                                         o_orderkey ASC) AS rk
      FROM vis
    ), topk AS (
      SELECT batch_id, o_custkey, o_totalprice, o_orderkey
      FROM ranked WHERE rk <= 5
    ), cur AS (
      SELECT batch_id AS bb, o_custkey, o_totalprice, o_orderkey
      FROM topk
    ), prev AS (
      SELECT batch_id + 1 AS bb, o_custkey, o_totalprice, o_orderkey
      FROM topk
      WHERE batch_id + 1 <= (SELECT max(chunk) FROM chunked)
    )
    SELECT bb AS batch_id, o_custkey,
           CASE WHEN prev.o_orderkey IS NULL THEN 'enter'
                WHEN cur.o_orderkey IS NULL THEN 'leave'
                ELSE 'update' END AS change,
           prev.o_totalprice AS old_value,
           cur.o_totalprice AS new_value
    FROM cur FULL JOIN prev USING (bb, o_custkey)
    WHERE cur.o_orderkey IS NULL OR prev.o_orderkey IS NULL
       OR cur.o_orderkey <> prev.o_orderkey
    """


@query("changefeed_topk_orders", oracle=_topk_orders_oracle())
def changefeed_topk_orders(spark, sf_dir):
    """`db.table('orders').views().top_k().changes()` — the top-k
    enter/leave/update DELTA FEED on the GENERIC runner (the round-9
    verdict's #1 surface gap: the events family had it,
    streaming/views.py _refresh_topk, but "top 5 customers by latest
    order value" on a generic table could not emit deltas). The
    shared orders runner now writes the same durable per-batch
    enter/leave/update log off its range index
    (generic_views.GenericAggViewRunner._refresh_topk): previous
    membership from the warm cache or recomputed from the durable
    index at batch-1, offsets carried on emitted rows only (a
    member whose position shifts purely because another member moved
    emits nothing — the events contract, changefeed_topk_view).

    The oracle reconstructs every batch's true visible LWW state,
    ranks it (value DESC, seq ASC), and diffs consecutive top-5
    lists — a stale or phantom member in ANY batch breaks the hash.

    Scale: each per-batch refresh is the O(k + band) widening index
    read (descending value bands, every unread band strictly worse),
    never a scan of the whole state; driver holds O(k) rows per
    batch; the log write is O(deltas)."""
    from ..streaming.generic_views import orders_runner

    return orders_runner(spark, sf_dir).topk_log().select(
        "batch_id", "o_custkey", "change", "old_value", "new_value")
