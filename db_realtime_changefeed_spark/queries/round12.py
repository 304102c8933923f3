"""Round-12 graded queries — the r11 verdict items: the standing
COUNT(DISTINCT) view, payload-column feed filters, string-keyed
feeds, and the remaining SQL:2016 frame-exclusion modes.

Registered LAST in load_all (after round11) so every name here sits
behind the certified tail (grading-rotation discipline,
queries/__init__.py). Reference citations are N/A — the reference
tree is empty (SURVEY.md §0); the binding spec is the driver
contract + SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.replay import default_chunks
from . import query
from ._util import DEC, dround6_div

__all__ = ["load"]

_NB = default_chunks()


def load() -> None:  # imported for side effects; keep a hook anyway
    pass


_CACHE: dict = {}


# ------------------------------------ changefeed_distinct_users_view

@query(
    "changefeed_distinct_users_view",
    oracle=f"""
    WITH numbered AS (
      SELECT user_id, event_id, event_type,
             row_number() OVER (ORDER BY event_id) - 1 AS rn,
             count(*) OVER () AS n
      FROM events
    ), chunked AS (
      SELECT user_id, event_id, event_type,
             CAST(floor(rn / ceil(n / {_NB}.0)) AS BIGINT) AS chunk
      FROM numbered
    ), batches AS (SELECT DISTINCT chunk AS batch_id FROM chunked),
    le AS (
      SELECT b.batch_id, c.user_id, max(c.event_id) AS err_id
      FROM batches b JOIN chunked c ON c.chunk <= b.batch_id
      WHERE c.event_type = 'error'
      GROUP BY 1, 2
    ), m AS (
      SELECT DISTINCT b.batch_id, c.event_type, c.user_id
      FROM batches b
      JOIN chunked c ON c.chunk <= b.batch_id
      LEFT JOIN le ON le.batch_id = b.batch_id
                  AND le.user_id = c.user_id
      WHERE c.event_type <> 'error'
        AND c.event_id > coalesce(le.err_id, -1)
    )
    SELECT batch_id, event_type, count(*) AS nd_users
    FROM m GROUP BY batch_id, event_type
    """,
)
def changefeed_distinct_users_view(spark, sf_dir):
    """Standing COUNT(DISTINCT user_id) per event_type — the one
    aggregate family the maintained-view runners could not fold (r11
    verdict item 2): distinct counts need PER-MEMBER reference state
    with retraction, which no distributive fold or (group, value)
    support relation carries. The DistinctCountViewRunner
    (streaming/distinct_view.py) maintains (event_type, user_id) ->
    supporting-event counts bucketed by member, folds the per-batch
    enter/leave membership deltas into an O(groups) nd store, and
    interprets the fixture's 'error' events as the CDC DELETE: a
    member's delete retracts it from EVERY group it supported, and
    later events re-enroll it — the genuinely non-monotone path a
    naive distinct-count delta cannot express. Trajectory-graded per
    micro-batch against the batch COUNT(DISTINCT) reconstruction of
    every replay prefix (membership = any event of the type since
    the member's last delete, in event_id replay order).

    Scale: per batch the fold shuffles the batch's own
    (group, member) aggregate plus touched member buckets; the VIEW
    read is O(groups) off the maintained nd store, never a support
    scan — see docs/SCALE.md Round 12."""
    from ..streaming.distinct_view import DistinctCountViewRunner

    key = (id(spark), sf_dir, "__ndview__")
    if key not in _CACHE:
        r = DistinctCountViewRunner(spark, sf_dir)
        r.run()
        _CACHE[key] = r
    return _CACHE[key].distinct_trajectory()


# ------------------------------- changefeed_table_filtered_payload

_TFP_CHUNK_CTE = f"""
p AS (
  SELECT count(*) AS n,
         CAST(ceil(count(*) / {_NB}.0) AS BIGINT) AS per
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
  FROM (SELECT unnest(range(1, {_NB})) AS i), p
),
batched AS (
  SELECT g.ts,
         (SELECT count(*) FROM bounds b
          WHERE b.bound <= g.cum_end - g.c) AS batch_id
  FROM grp g
)
"""


@query(
    "changefeed_table_filtered_payload",
    oracle=f"""
    WITH env AS (
      SELECT o_custkey AS key, CAST(o_orderdate AS TIMESTAMP) AS ts,
             o_totalprice AS value, o_orderstatus AS st
      FROM orders
    ),
    {_TFP_CHUNK_CTE.lstrip()}
    SELECT bt.batch_id, CAST(e.key AS VARCHAR) AS key,
           count(*) AS d_count,
           CAST(sum(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE)
             AS d_sum
    FROM env e JOIN batched bt ON e.ts = bt.ts
    WHERE e.st = 'F'
    GROUP BY 1, 2
    """,
)
def changefeed_table_filtered_payload(spark, sf_dir):
    """Feed filter on a PAYLOAD column (r11 verdict item 3 —
    multitable.rewrite_filter used to refuse any predicate touching
    a column outside the key/ts/value envelope, losing the
    delivery-time filtering every RethinkDB/CockroachDB changefeed
    supports): ``o_orderstatus = 'F'`` rewrites against the
    envelope's Debezium-style `after` JSON image (carried only when
    a filter needs it — rewrite_filter returns needs_after and the
    runner ships the payload image just for those feeds), typed back
    with CAST, and runs BEFORE the keyed delta each micro-batch — so
    non-matching changes never enter state, the delta log, cursor
    delivery, or push delivery.

    The graded frame is the DELIVERY surface, not state: a cursor
    drains the feed and the received rows are reassembled and hashed
    against the oracle's chunking reconstruction with the payload
    predicate applied to the raw rows — an unfiltered (or
    state-only-filtered) delivery breaks the hash. A push subscriber
    is asserted to deliver the identical multiset (cursor and push
    read the same committed log).

    Scale: the JSON image rides only feeds that filter on payload
    columns; the predicate is executor-side per micro-batch (what a
    CDC source would push into the changefeed scan); high-water
    marks still advance on filtered-out rows so resolved timestamps
    keep their completeness meaning."""
    from ..api import Database

    key = (id(spark), sf_dir, "__tfp__")
    if key not in _CACHE:
        _CACHE[key] = (
            Database(spark, sf_dir)
            .table("orders")
            .filter("o_orderstatus = 'F'")
            .changes()
        )
    feed = _CACHE[key]
    if not feed._runner.with_after:
        raise AssertionError(
            "payload filter did not engage the after image")
    c = feed.cursor()
    rows = c.poll()
    pushed: list = []
    # fresh subscriber name per invocation: the durable ack file is
    # per-name, so a re-run with a cached feed would otherwise see
    # the history already acked and push nothing
    _CACHE["__tfp_sub_seq__"] = _CACHE.get("__tfp_sub_seq__", 0) + 1
    feed.subscribe(
        lambda b, rs: pushed.extend(
            (b, str(r["key"]), r["d_count"]) for r in rs),
        name=f"grade-tfp-{_CACHE['__tfp_sub_seq__']}")
    if sorted(pushed) != sorted(
            (r["batch_id"], str(r["key"]), r["d_count"])
            for r in rows):
        raise AssertionError(
            "push delivery diverged from cursor delivery")
    log = feed.log()
    return (
        spark.createDataFrame(rows, log.schema) if rows
        else spark.createDataFrame([], log.schema)
    )


# ----------------------------------- changefeed_table_string_key

@query(
    "changefeed_table_string_key",
    oracle=f"""
    WITH env AS (
      SELECT c_mktsegment AS key, c_acctbal AS value,
             row_number() OVER (ORDER BY c_custkey) - 1 AS rn,
             count(*) OVER () AS n
      FROM customer
    )
    SELECT CAST(floor(rn / ceil(n / {_NB}.0)) AS BIGINT) AS batch_id,
           key, count(*) AS d_count,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS d_sum
    FROM env GROUP BY 1, 2
    """,
)
def changefeed_table_string_key(spark, sf_dir):
    """STRING-keyed feed (r11 verdict item 4 — the envelope key slot
    was bigint-only and KEY BY on a string column raised; hashing
    into the bigint slot was rejected because collisions corrupt the
    keyed merge): the envelope/state/log key slot now follows the
    keyed column's own type, so
    ``CREATE CHANGEFEED FOR customer KEY BY c_mktsegment`` runs the
    real column values end to end. Integer-keyed feeds keep the
    historical bigint slot byte-for-byte (their layouts and oracles
    are untouched). Graded on the full per-batch keyed-delta log —
    the customer replay orders by the synthetic snapshot timestamp
    (epoch + c_custkey, unique), so the oracle's equal-slice
    chunking is exact; a mis-keyed or re-hashed feed breaks the
    hash. The in-query asserts pin the cursor contract on the
    string path: a fresh cursor drains exactly the committed batch
    set.

    Scale: identical posture to integer keys — the merge keys on
    (tbl, key) through the same bucketed MVCC store; string keys
    hash-partition like any other."""
    from ..api import Database

    key = (id(spark), sf_dir, "__tsk__")
    if key not in _CACHE:
        _CACHE[key] = Database(spark, sf_dir).sql(
            "CREATE CHANGEFEED FOR customer KEY BY c_mktsegment")
    feed = _CACHE[key]
    c = feed.cursor()
    rows = c.poll()
    batches = sorted({r["batch_id"] for r in rows})
    if batches != list(range(_NB)):
        raise AssertionError(
            f"string-keyed cursor drained {batches}, "
            f"expected {list(range(_NB))}")
    log = feed.log()
    return (
        spark.createDataFrame(rows, log.schema) if rows
        else spark.createDataFrame([], log.schema)
    )
