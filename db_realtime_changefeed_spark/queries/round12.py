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
