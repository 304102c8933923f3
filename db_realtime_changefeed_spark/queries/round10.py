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


# ---------------------------------------- changefeed_lineitem_watchlist

_LI_CACHE: dict = {}


def _li_watch_oracle() -> str:
    from ..streaming.replay import default_chunks

    nb = default_chunks()
    return f"""
    WITH pk AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             l_orderkey * 8 + l_linenumber AS k
      FROM lineitem
    ), uniq AS (
      SELECT k FROM pk GROUP BY k HAVING count(*) = 1
    ), uo AS (
      SELECT k, row_number() OVER (ORDER BY k) - 1 AS urn,
             count(*) OVER () AS un
      FROM uniq
    ), watch AS (
      SELECT k FROM uo WHERE urn = 0 OR urn = un // 2 OR urn = un - 1
    )
    SELECT p.l_orderkey, p.l_linenumber,
           CAST(NULL AS DOUBLE) AS old_value,
           p.l_extendedprice AS new_value,
           CAST(NULL AS BIGINT) AS old_seq,
           p.k AS new_seq,
           CAST((SELECT count(*) FROM pk q WHERE q.k < p.k)
                // CAST(ceil((SELECT count(*) FROM pk) / {nb}.0)
                        AS BIGINT)
             AS BIGINT) AS batch_id
    FROM pk p JOIN watch w ON w.k = p.k
    """


@query("changefeed_lineitem_watchlist", oracle=_li_watch_oracle())
def changefeed_lineitem_watchlist(spark, sf_dir):
    """COMPOSITE-KEY document feed (round-10: the last loud
    get()/get_all() refusal lifted): `db.table('lineitem')
    .get_all((ok1,ln1), (ok2,ln2), (ok3,ln3)).changes()`. The
    (l_orderkey, l_linenumber) primary key packs into the envelope's
    single bigint key slot via the declared 3-bit codec (l_linenumber
    in 1..7 — per-row assert_true guard, doc_feeds.COMPOSITE_DOC_MAP)
    and the LWW/MVCC machinery runs UNCHANGED; the read surface
    unpacks back to the table's own two columns. Graded output is
    the full delta-log TRAJECTORY: each watched document's insert
    lands in exactly the micro-batch its arrival chunk replays in
    (arrival = (l_orderkey, l_linenumber) order, the _keyed_chunks
    composite slicing contract).

    Watched keys are the first / middle / last among keys that occur
    EXACTLY ONCE: the synthetic fixture duplicates ~23% of lineitem
    PKs, and a duplicated key's LWW winner on an exact (ts, seq) tie
    depends on which batch boundary separates the duplicates — a
    correct feed behavior, but not a batch-count-invariant graded
    target. Key picks are Spark-side order statistics
    (_util.kth_smallest + min/max aggregates — no O(|table|) driver
    transfer, the r9-verdict discipline).

    Scale: the envelope IN-set predicate prunes every micro-batch
    BEFORE the merge — state holds at most |watchlist| rows on any
    table size."""
    from ..api import Database
    from ._util import kth_smallest

    key = (id(spark), sf_dir, "li-watch")
    if key not in _LI_CACHE:
        li = load_table(spark, sf_dir, "lineitem")
        packed = (F.col("l_orderkey").cast("long") * 8
                  + F.col("l_linenumber"))
        uniq = (
            li.groupBy(packed.alias("k")).count()
            .where("count = 1").select("k"))
        lo, hi = uniq.agg(F.min("k"), F.max("k")).first()
        ks = [int(lo), kth_smallest(uniq, "k"), int(hi)]
        watch = [(k >> 3, k & 7) for k in ks]
        _LI_CACHE[key] = (
            Database(spark, sf_dir).table("lineitem")
            .get_all(*watch).changes()
        )
    return _LI_CACHE[key].log().select(
        "l_orderkey", "l_linenumber", "old_value", "new_value",
        "old_seq", "new_seq", "batch_id",
    )


# -------------------------------------------- changefeed_keyby_customer

@query(
    "changefeed_keyby_customer",
    oracle="""
    SELECT CAST(c_nationkey AS VARCHAR) AS key,
           count(*) AS cnt,
           CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
             AS sum_value
    FROM customer
    GROUP BY c_nationkey
    """,
)
def changefeed_keyby_customer(spark, sf_dir):
    """CUSTOM-KEY feed on a non-events table (round-10 close of the
    api.py KEY-BY refusal): `CREATE CHANGEFEED FOR customer KEY BY
    c_nationkey` — the standing per-key count/sum aggregate keyed by
    a CHOSEN integer column instead of the table's document key.
    envelope_spec (streaming/multitable.py) validates the override
    against the table schema (non-integral keys raise loudly),
    normalizes customer into the shared change envelope with its
    synthetic snapshot-epoch event time, and the key-agnostic
    merge/MVCC/resolved machinery runs unchanged. Graded output is
    the feed's final materialized state: one row per nation with the
    exact decimal-stabilized balance sum — any mis-keyed or dropped
    change breaks the hash.

    Scale: per-batch partial aggregates combine map-side; only
    (key, cnt, sum) rows cross the shuffle; state rewrites touch
    only the buckets the batch's keys hash into."""
    from ..api import Database

    feed = Database(spark, sf_dir).sql(
        "CREATE CHANGEFEED FOR customer KEY BY c_nationkey")
    return feed.state()
