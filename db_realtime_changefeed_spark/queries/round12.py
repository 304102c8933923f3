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

from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.replay import default_chunks
from . import query
from ._util import DEC, dround6_div, dsum, ts_group_chunk_cte

__all__ = ["load"]

# Replay micro-batch count: oracles resolve default_chunks() LAZILY
# (r13, ADVICE r12) — zero-arg callable templates interpolate a local
# _NB when the driver reads the surface, never at import.


def load() -> None:  # imported for side effects; keep a hook anyway
    pass


_CACHE: dict = {}


# ------------------------------------ changefeed_distinct_users_view

def _ndv_oracle() -> str:
    _NB = default_chunks()
    return f"""
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
    """


@query("changefeed_distinct_users_view", oracle=_ndv_oracle)
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
    naive distinct-count delta cannot express. NOT a twin of
    changefeed_distinct_view / _orders: those count distinct VALUES
    off the LWW runners' existing (group, value) support relation
    (zero new state); this one counts distinct MEMBERS over the raw
    delete-bearing stream, which no existing store carries — the
    member-refcount relation and its delete-driven full-member
    retraction are the new machinery. Trajectory-graded per
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

def _tfp_oracle() -> str:
    return f"""
    WITH env AS (
      SELECT o_custkey AS key, CAST(o_orderdate AS TIMESTAMP) AS ts,
             o_totalprice AS value, o_orderstatus AS st
      FROM orders
    ),
    {ts_group_chunk_cte(default_chunks()).lstrip()}
    SELECT bt.batch_id, CAST(e.key AS VARCHAR) AS key,
           count(*) AS d_count,
           CAST(sum(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE)
             AS d_sum
    FROM env e JOIN batched bt ON e.ts = bt.ts
    WHERE e.st = 'F'
    GROUP BY 1, 2
    """


@query("changefeed_table_filtered_payload", oracle=_tfp_oracle)
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

def _tsk_oracle() -> str:
    _NB = default_chunks()
    return f"""
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
    """


@query("changefeed_table_string_key", oracle=_tsk_oracle)
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
    _nb = default_chunks()
    batches = sorted({r["batch_id"] for r in rows})
    if batches != list(range(_nb)):
        raise AssertionError(
            f"string-keyed cursor drained {batches}, "
            f"expected {list(range(_nb))}")
    log = feed.log()
    return (
        spark.createDataFrame(rows, log.schema) if rows
        else spark.createDataFrame([], log.schema)
    )


# ------------------- win_frame_exclude_group / win_frame_exclude_ties

#: hour index of an event: integer epoch division — tz-free in both
#: engines (timestamp->epoch-seconds, never a calendar trunc)
_WFX_H_SQL = "CAST(floor(epoch(ts) / 3600) AS BIGINT)"
_WFX_FRAME = 3  #: RANGE +/- 3 hour-indexes


def _wfx_spark(spark, sf_dir, mode):
    """Shared emulation: SQL:2016 EXCLUDE GROUP / EXCLUDE TIES over
    a RANGE frame, as frame-minus-peer-group algebra in exact
    decimal. RANGE frames always contain the current row's full
    peer group, so subtracting the peer partition's sum/count
    yields EXCLUDE GROUP exactly; adding the current row back gives
    EXCLUDE TIES."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").withColumn(
        "h", F.floor(F.col("ts").cast("long") / F.lit(3600))
        .cast("long"))
    wr = (W.partitionBy("event_type").orderBy("h")
          .rangeBetween(-_WFX_FRAME, _WFX_FRAME))
    wp = W.partitionBy("event_type", "h")
    vdec = F.col("value").cast(DEC)
    frame_sum = F.sum(vdec).over(wr)
    frame_cnt = F.count(F.lit(1)).over(wr)
    peer_sum = F.sum(vdec).over(wp)
    peer_cnt = F.count(F.lit(1)).over(wp)
    if mode == "group":
        ex_sum = (frame_sum - peer_sum).cast("double")
        ex_cnt = frame_cnt - peer_cnt
    else:  # ties: peers out, current row stays
        ex_sum = (frame_sum - peer_sum + vdec).cast("double")
        ex_cnt = frame_cnt - peer_cnt + F.lit(1)
    return ev.select(
        "event_id", "event_type",
        ex_cnt.cast("long").alias("n_excl"),
        F.when(ex_cnt > 0,
               dround6_div(ex_sum, ex_cnt)).alias("mean_excl6"),
    )


def _wfx_oracle(exclude):
    return f"""
    SELECT event_id, event_type,
           CAST(count(*) OVER wx AS BIGINT) AS n_excl,
           CASE WHEN count(*) OVER wx = 0 THEN NULL
                ELSE FLOOR(
                  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER wx
                       AS DOUBLE)
                  * 1000000.0 / (count(*) OVER wx) + 0.5)
                  / 1000000.0
           END AS mean_excl6
    FROM events
    WINDOW wx AS (PARTITION BY event_type ORDER BY {_WFX_H_SQL}
                  RANGE BETWEEN {_WFX_FRAME} PRECEDING
                            AND {_WFX_FRAME} FOLLOWING
                  EXCLUDE {exclude})
    """


@query("win_frame_exclude_group", oracle=_wfx_oracle("GROUP"))
def win_frame_exclude_group(spark, sf_dir):
    """SQL:2016 frame EXCLUDE GROUP (r11 verdict item 5, completing
    the exclusion family next to win_frame_exclude's EXCLUDE CURRENT
    ROW): the frame drops the current row AND all its ORDER-BY peers
    — "this hour's events vs the surrounding hours, my own hour
    excluded", the leave-one-group-out baseline every seasonality
    monitor wants. Spark has no frame exclusion; the emulation is
    algebraic — a RANGE frame always contains the current row's full
    peer group, so the peer partition's decimal sum/count subtract
    exactly. The DuckDB oracle uses its NATIVE EXCLUDE GROUP, so the
    hash certifies the emulation against real SQL:2016 semantics.
    Ordering rides an integer epoch-hour index (tz-free in both
    engines); an empty exclusion frame yields NULL on both sides.

    Scale: two windows over the same (event_type | h) shuffle key —
    Catalyst plans ONE exchange + sort serving both; O(1) state per
    row at any RANGE width."""
    return _wfx_spark(spark, sf_dir, "group")


@query("win_frame_exclude_ties", oracle=_wfx_oracle("TIES"))
def win_frame_exclude_ties(spark, sf_dir):
    """SQL:2016 frame EXCLUDE TIES: peers drop, the current row
    itself stays — "me against the neighborhood, ignoring my
    same-hour cohort". Same frame-minus-peer-group decimal algebra
    as the GROUP twin plus the current row's own value added back
    (exact: all three terms are DECIMAL(18,6) before the one double
    cast); n_excl >= 1 always, so the NULL guard never fires but
    stays for shape parity. DuckDB's native EXCLUDE TIES is the
    oracle."""
    return _wfx_spark(spark, sf_dir, "ties")


# --------------------------------------------------- sql_qualify

#: ONE SQL text serves both engines: our Database.sql() rewrites the
#: QUALIFY clause into the project-window-filter subquery Spark
#: lacks; DuckDB runs it natively as the oracle.
_QUALIFY_SQL = """
SELECT o_orderstatus, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice DESC,
                                    o_orderkey) <= 3
"""


@query("sql_qualify", oracle=_QUALIFY_SQL)
def sql_qualify(spark, sf_dir):
    """The QUALIFY clause (DuckDB/Snowflake/BigQuery's window
    filter, absent from Spark SQL) on the engine's SQL-text surface:
    Database.sql() rewrites `... QUALIFY <pred>` into the standard
    project-the-window-predicate / filter / drop subquery — the
    exact relational algebra the clause sugars — so the IDENTICAL
    query text runs on our engine and on DuckDB (the oracle runs it
    natively), certifying the rewrite against the real semantics
    rather than against itself. Deterministic: the rank order is
    total ((o_totalprice DESC, o_orderkey)).

    Scale: the rewrite adds one projection; the plan is the same
    single window + filter Catalyst produces for the hand-written
    subquery — rank predicates push into WindowGroupLimit, so the
    per-partition top-k never materializes full partitions."""
    from ..api import Database

    return Database(spark, sf_dir).sql(_QUALIFY_SQL)


# ------------------------- win_frame_groups (+ EXCLUDE composition)

_WFG_N = 2  #: GROUPS frame half-width (peer groups, not rows)


def _wfg_frames(spark, sf_dir):
    """(event row, hour index h, group index g) plus the two framed
    aggregates: GROUPS-mode frame sum/count via dense_rank + RANGE
    (a GROUPS frame counts DISTINCT order values, and dense_rank IS
    the distinct-value index), and the peer partition's sum/count
    for the EXCLUDE composition."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").withColumn(
        "h", F.floor(F.col("ts").cast("long") / F.lit(3600))
        .cast("long"))
    wd = W.partitionBy("event_type").orderBy("h")
    ev = ev.withColumn("g", F.dense_rank().over(wd).cast("long"))
    wg = (W.partitionBy("event_type").orderBy("g")
          .rangeBetween(-_WFG_N, _WFG_N))
    wp = W.partitionBy("event_type", "h")
    vdec = F.col("value").cast(DEC)
    return (ev,
            F.sum(vdec).over(wg), F.count(F.lit(1)).over(wg),
            F.sum(vdec).over(wp), F.count(F.lit(1)).over(wp))


#: DuckDB has NOT implemented GROUPS frame mode (parser error,
#: probed r12), so the oracle is an independent SET-BASED
#: reconstruction of the SQL:2016 definition instead of a native
#: clause: the frame of a row at hour h is every row whose hour is
#: among the {_WFG_N} nearest DISTINCT hours on each side —
#: materialized as a join through the distinct-hour rank relation,
#: a different algorithm from the emulation's dense-rank RANGE
#: frame (a drifted group index breaks the hash from either side).
_WFG_ORACLE_CTE = f"""
    e AS (
      SELECT event_id, event_type, value, {_WFX_H_SQL} AS h
      FROM events),
    hs AS (
      SELECT event_type, h,
             dense_rank() OVER (PARTITION BY event_type ORDER BY h)
               AS g
      FROM (SELECT DISTINCT event_type, h FROM e)),
    fr AS (
      SELECT a.event_type, a.h AS h0, b.h AS h2
      FROM hs a JOIN hs b
        ON b.event_type = a.event_type
       AND abs(b.g - a.g) <= {_WFG_N})
"""


@query(
    "win_frame_groups",
    oracle=f"""
    WITH {_WFG_ORACLE_CTE.lstrip()}
    SELECT r.event_id, r.event_type,
           CAST(count(*) AS BIGINT) AS n_frame,
           FLOOR(CAST(sum(CAST(x.value AS DECIMAL(18,6)))
                      AS DOUBLE)
                 * 1000000.0 / count(*) + 0.5)
             / 1000000.0 AS mean_frame6
    FROM e r
    JOIN fr ON fr.event_type = r.event_type AND fr.h0 = r.h
    JOIN e x ON x.event_type = r.event_type AND x.h = fr.h2
    GROUP BY r.event_id, r.event_type
    """,
)
def win_frame_groups(spark, sf_dir):
    """SQL:2016 GROUPS frame mode — the third frame unit next to
    ROWS and RANGE, and one Spark's window frames don't have: the
    frame spans the {_WFG_N} nearest DISTINCT order values (peer
    groups) on each side, regardless of how many rows share a value
    or how large the gaps between values are ("this hour's events
    plus the two nearest active hours each way" — a RANGE frame
    would silently shrink across quiet gaps, a ROWS frame would cut
    peer groups in half). The emulation is exact algebra: dense_rank
    IS the distinct-value index, so a RANGE frame over dense_rank is
    a GROUPS frame over the original order. DuckDB has NOT
    implemented GROUPS mode (probed r12), so the oracle is an
    independent SET-BASED reconstruction of the SQL:2016 definition
    — the frame materialized as a join through the distinct-hour
    rank relation — rather than the emulation's own shape. Sums
    ride the decimal pipeline; the mean divides through the house
    6-dp floor.

    Scale: both windows partition on event_type — one exchange; the
    dense_rank pass sorts once and the RANGE pass reuses the order
    (g is monotone in h)."""
    ev, fsum, fcnt, _ps, _pc = _wfg_frames(spark, sf_dir)
    return ev.select(
        "event_id", "event_type",
        fcnt.cast("long").alias("n_frame"),
        dround6_div(fsum.cast("double"), fcnt).alias("mean_frame6"),
    )


@query(
    "win_frame_groups_exclude",
    oracle=f"""
    WITH {_WFG_ORACLE_CTE.lstrip()}
    SELECT r.event_id, r.event_type,
           CAST(count(x.event_id) AS BIGINT) AS n_excl,
           CASE WHEN count(x.event_id) = 0 THEN NULL
                ELSE FLOOR(
                  CAST(sum(CAST(x.value AS DECIMAL(18,6)))
                       AS DOUBLE)
                  * 1000000.0 / count(x.event_id) + 0.5)
                  / 1000000.0
           END AS mean_excl6
    FROM e r
    JOIN fr ON fr.event_type = r.event_type AND fr.h0 = r.h
    LEFT JOIN e x ON x.event_type = r.event_type
                 AND x.h = fr.h2 AND x.h <> r.h
    GROUP BY r.event_id, r.event_type
    """,
)
def win_frame_groups_exclude(spark, sf_dir):
    """GROUPS frame x EXCLUDE GROUP — the two emulations COMPOSE:
    the dense-rank RANGE frame supplies the GROUPS semantics, the
    peer partition's decimal sum/count subtracts the exclusion
    ("the two nearest active hours each way, my own hour out") —
    verified against the set-based oracle with the own-hour rows
    dropped from the materialized frame.
    n_excl can be 0 only for a partition with a single distinct
    hour; the NULL guard mirrors the oracle's."""
    ev, fsum, fcnt, psum, pcnt = _wfg_frames(spark, sf_dir)
    ex_sum = (fsum - psum).cast("double")
    ex_cnt = fcnt - pcnt
    return ev.select(
        "event_id", "event_type",
        ex_cnt.cast("long").alias("n_excl"),
        F.when(ex_cnt > 0,
               dround6_div(ex_sum, ex_cnt)).alias("mean_excl6"),
    )


# --------------------------------------- graph_resource_allocation

@query(
    "graph_resource_allocation",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 4 = 0),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    und AS (SELECT u AS node, v AS other FROM pairs
            UNION ALL SELECT v, u FROM pairs),
    deg AS (SELECT node, count(*) AS d FROM und GROUP BY node),
    w AS (
      SELECT x.other AS u, y.other AS v,
             CAST(count(*) AS BIGINT) AS common,
             CAST(sum(CAST(1.0 / dz.d AS DECIMAL(18,6)))
               AS DOUBLE) AS ra
      FROM und x
      JOIN und y ON x.node = y.node AND x.other < y.other
      JOIN deg dz ON dz.node = x.node
      GROUP BY x.other, y.other
    )
    SELECT w.u, w.v, w.common AS common_neighbors, w.ra
      AS resource_alloc
    FROM w
    WHERE NOT EXISTS (SELECT 1 FROM pairs p
                      WHERE p.u = w.u AND p.v = w.v)
    ORDER BY w.ra DESC, w.u, w.v LIMIT 20
    """,
)
def graph_resource_allocation(spark, sf_dir):
    """RESOURCE-ALLOCATION link prediction (Zhou, Lu & Zhang 2009 —
    the strongest local index on dense co-purchase graphs, punishing
    hub intermediaries harder than Adamic-Adar's 1/ln): for every
    non-edge, sum 1/deg(z) over common neighbors z. Same bounded
    wedge enumeration as the AA/Jaccard family (only pairs with a
    real common neighbor materialize; existing edges anti-joined
    away; degree join broadcast), but the per-wedge weight is the
    EXACT reciprocal 1/d — one IEEE division on an integer degree,
    bit-identical cross-engine, quantized once into the decimal
    pipeline (no ln, so none of Adamic-Adar's 9-dp machinery).
    The (score DESC, u, v) top-20 cut is total.

    Scale: wedge volume is the documented sum of C(deg, 2) with the
    same super-hub cap note as the Jaccard/AA twins."""
    from ._util import dsum
    from .analytics_ext import _copurchase_pairs

    pairs = _copurchase_pairs(spark, sf_dir)
    und = pairs.select(F.col("u").alias("node"),
                       F.col("v").alias("other")).unionAll(
        pairs.select(F.col("v").alias("node"),
                     F.col("u").alias("other")))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    x, y = und.alias("x"), und.alias("y")
    wedges = (
        x.join(y, (F.col("x.node") == F.col("y.node"))
               & (F.col("x.other") < F.col("y.other")))
        .join(F.broadcast(deg.select(F.col("node").alias("znode"),
                                     F.col("d"))),
              F.col("x.node") == F.col("znode"))
        .groupBy(F.col("x.other").alias("u"),
                 F.col("y.other").alias("v"))
        .agg(F.count(F.lit(1)).alias("common_neighbors"),
             dsum(F.lit(1.0) / F.col("d")).cast("double")
             .alias("resource_alloc"))
    )
    return (
        wedges.join(pairs, ["u", "v"], "anti")
        .orderBy(F.col("resource_alloc").desc(), "u", "v")
        .limit(20)
    )


# ------------------------------------------------ ts_cointegration

_EG_CRIT_5 = -3.34  #: Engle-Granger 5% critical value, 2 vars + const


@query(
    "ts_cointegration",
    oracle=f"""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
               AS day,
             {{DS}} AS y
      FROM events GROUP BY event_type, date_trunc('day', ts)),
    pairs AS (
      SELECT a.event_type AS et_a, b.event_type AS et_b,
             a.day, a.y AS x, b.y AS y
      FROM d a JOIN d b
        ON b.day = a.day AND a.event_type < b.event_type),
    m1 AS (
      SELECT et_a, et_b, count(*) AS n,
             {{SX}} AS sx, {{SY}} AS sy,
             {{SXX}} AS sxx, {{SXY}} AS sxy
      FROM pairs GROUP BY et_a, et_b),
    fit AS (
      SELECT et_a, et_b, n,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS beta,
             (sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx)
               / n AS alpha
      FROM m1 WHERE n > 3 AND sxx - sx * sx / n > 0),
    resid AS (
      SELECT p.et_a, p.et_b, p.day,
             p.y - f.alpha - f.beta * p.x AS r
      FROM pairs p
      JOIN fit f ON f.et_a = p.et_a AND f.et_b = p.et_b),
    lagd AS (
      SELECT et_a, et_b, r,
             lag(r) OVER (PARTITION BY et_a, et_b ORDER BY day)
               AS rl
      FROM resid),
    reg AS (
      SELECT et_a, et_b, rl AS x, r - rl AS dy
      FROM lagd WHERE rl IS NOT NULL),
    m2 AS (
      SELECT et_a, et_b, count(*) AS n,
             {{SX2}} AS sx, {{SY2}} AS sy,
             {{SXX2}} AS sxx, {{SXY2}} AS sxy,
             {{SYY2}} AS syy
      FROM reg GROUP BY et_a, et_b)
    SELECT m2.et_a, m2.et_b, CAST(m2.n AS BIGINT) AS n,
           f.beta AS coint_beta,
           (m2.sxy - m2.sx * m2.sy / m2.n)
             / (m2.sxx - m2.sx * m2.sx / m2.n) AS gamma,
           ((m2.sxy - m2.sx * m2.sy / m2.n)
             / (m2.sxx - m2.sx * m2.sx / m2.n))
           / sqrt((((m2.syy - m2.sy * m2.sy / m2.n)
                    - ((m2.sxy - m2.sx * m2.sy / m2.n)
                       / (m2.sxx - m2.sx * m2.sx / m2.n))
                      * (m2.sxy - m2.sx * m2.sy / m2.n))
                   / (m2.n - 2))
                  / (m2.sxx - m2.sx * m2.sx / m2.n)) AS eg_stat,
           ((m2.sxy - m2.sx * m2.sy / m2.n)
             / (m2.sxx - m2.sx * m2.sx / m2.n))
           / sqrt((((m2.syy - m2.sy * m2.sy / m2.n)
                    - ((m2.sxy - m2.sx * m2.sy / m2.n)
                       / (m2.sxx - m2.sx * m2.sx / m2.n))
                      * (m2.sxy - m2.sx * m2.sy / m2.n))
                   / (m2.n - 2))
                  / (m2.sxx - m2.sx * m2.sx / m2.n))
             < {_EG_CRIT_5} AS cointegrated_5pct
    FROM m2
    JOIN fit f ON f.et_a = m2.et_a AND f.et_b = m2.et_b
    WHERE m2.n > 2 AND m2.sxx - m2.sx * m2.sx / m2.n > 0
    """.format(
        DS="CAST(sum(CAST((value) AS DECIMAL(18,6))) AS DOUBLE)",
        SX="CAST(sum(CAST((x) AS DECIMAL(18,6))) AS DOUBLE)", SY="CAST(sum(CAST((y) AS DECIMAL(18,6))) AS DOUBLE)", SXX="CAST(sum(CAST((x * x) AS DECIMAL(18,6))) AS DOUBLE)", SXY="CAST(sum(CAST((x * y) AS DECIMAL(18,6))) AS DOUBLE)",
        SX2="CAST(sum(CAST((x) AS DECIMAL(18,6))) AS DOUBLE)", SY2="CAST(sum(CAST((dy) AS DECIMAL(18,6))) AS DOUBLE)", SXX2="CAST(sum(CAST((x * x) AS DECIMAL(18,6))) AS DOUBLE)", SXY2="CAST(sum(CAST((x * dy) AS DECIMAL(18,6))) AS DOUBLE)",
        SYY2="CAST(sum(CAST((dy * dy) AS DECIMAL(18,6))) AS DOUBLE)",
    ),
)
def ts_cointegration(spark, sf_dir):
    """ENGLE-GRANGER COINTEGRATION (Engle & Granger 1987) for every
    event-type pair's daily value series — the two-step test behind
    pairs monitoring: OLS-fit y = alpha + beta*x on the shared-day
    relation, then a Dickey-Fuller unit-root regression on the
    RESIDUAL series; a residual t-ratio below the MacKinnon 5%
    critical value ({_EG_CRIT_5}, 2 variables + constant) rejects a
    unit root in the spread, i.e. the pair co-moves. Composes the
    established moment pipelines end to end: every sum rides the
    exact-decimal dsum recipe, alpha/beta/gamma and the t-ratio are
    closed-form IEEE trees on bit-identical moment doubles, the
    residual is one shared expression tree, and the RSS uses the
    OLS identity (no residual second pass).

    Scale: the day-join fans each series to P-1 partners (P = event
    types, tiny); all moments are map-side-combinable aggregates
    over O(series-pairs x 30) rows; millions of pairs would
    parallelize on the (et_a, et_b) key."""
    from pyspark.sql import Window as W

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(dsum("value").cast("double").alias("y"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(b, (F.col("b.day") == F.col("a.day"))
               & (F.col("a.event_type") < F.col("b.event_type")))
        .select(F.col("a.event_type").alias("et_a"),
                F.col("b.event_type").alias("et_b"),
                F.col("a.day").alias("day"),
                F.col("a.y").alias("x"), F.col("b.y").alias("y"))
    ).persist()
    m1 = pairs.groupBy("et_a", "et_b").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sx"), dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    beta = ((F.col("sxy") - F.col("sx") * F.col("sy") / n)
            / (F.col("sxx") - F.col("sx") * F.col("sx") / n))
    alpha = (F.col("sy") - beta * F.col("sx")) / n
    fit = (m1.where((n > 3)
                    & (F.col("sxx") - F.col("sx") * F.col("sx") / n
                       > 0))
           .select("et_a", "et_b", beta.alias("beta"),
                   alpha.alias("alpha")))
    resid = (
        pairs.join(fit, ["et_a", "et_b"])
        .select("et_a", "et_b", "day",
                (F.col("y") - F.col("alpha")
                 - F.col("beta") * F.col("x")).alias("r"),
                "beta")
    )
    w = W.partitionBy("et_a", "et_b").orderBy("day")
    reg = (
        resid.select("et_a", "et_b", "beta", "r",
                     F.lag("r").over(w).alias("rl"))
        .where(F.col("rl").isNotNull())
        .select("et_a", "et_b", "beta",
                F.col("rl").alias("x"),
                (F.col("r") - F.col("rl")).alias("dy"))
    )
    m2 = reg.groupBy("et_a", "et_b").agg(
        F.any_value("beta").alias("coint_beta"),
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sx"), dsum("dy").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("dy")).alias("sxy"),
        dsum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / n
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / n
    syy_c = F.col("syy") - F.col("sy") * F.col("sy") / n
    gamma = sxy_c / sxx_c
    rss = syy_c - gamma * sxy_c
    eg = gamma / F.sqrt((rss / (n - 2)) / sxx_c)
    out = (
        m2.where((n > 2) & (sxx_c > 0))
        .select("et_a", "et_b", "n", "coint_beta",
                gamma.alias("gamma"), eg.alias("eg_stat"),
                (eg < _EG_CRIT_5).alias("cointegrated_5pct"))
    )
    pairs.unpersist()
    return out


# ---------------------------------------------------------- graph_hits

_HITS_TOP = 10  #: reported rows per side (authority / hub)


def _hits_oracle() -> str:
    """Two full HITS rounds unrolled as CTE stages with the exact
    decimal-sum + shared-IEEE-division recipe the Spark side uses."""
    ds = "CAST(sum(CAST(({x}) AS DECIMAL(18,6))) AS DOUBLE)"
    return f"""
    WITH e AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem WHERE l_orderkey % 4 = 0),
    h1 AS (
      SELECT o, CAST(count(*) AS DOUBLE) AS s FROM e GROUP BY o),
    h1n AS (
      SELECT o, s / (SELECT {ds.format(x='s')} FROM h1) AS s
      FROM h1),
    a1 AS (
      SELECT e.p, {ds.format(x='h.s')} AS s
      FROM e JOIN h1n h ON h.o = e.o GROUP BY e.p),
    a1n AS (
      SELECT p, s / (SELECT {ds.format(x='s')} FROM a1) AS s
      FROM a1),
    h2 AS (
      SELECT e.o, {ds.format(x='a.s')} AS s
      FROM e JOIN a1n a ON a.p = e.p GROUP BY e.o),
    h2n AS (
      SELECT o, s / (SELECT {ds.format(x='s')} FROM h2) AS s
      FROM h2),
    a2 AS (
      SELECT e.p, {ds.format(x='h.s')} AS s
      FROM e JOIN h2n h ON h.o = e.o GROUP BY e.p),
    a2n AS (
      SELECT p, s / (SELECT {ds.format(x='s')} FROM a2) AS s
      FROM a2),
    tops AS (
      SELECT 'authority' AS kind, p AS id, s,
             row_number() OVER (ORDER BY s DESC, p) AS rk
      FROM a2n
      UNION ALL
      SELECT 'hub' AS kind, o AS id, s,
             row_number() OVER (ORDER BY s DESC, o) AS rk
      FROM h2n)
    SELECT kind, id, s AS score, CAST(rk AS INT) AS rk
    FROM tops WHERE rk <= {_HITS_TOP}
    """


@query("graph_hits", oracle=_hits_oracle())
def graph_hits(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg 1999) on the BIPARTITE
    order->part purchase graph — the second classic eigenvector
    fixpoint next to graph_pagerank, and a different object: HITS
    scores the two sides of a directed/bipartite relation against
    each other (an order is a good HUB if it buys authoritative
    parts; a part is a good AUTHORITY if good hubs buy it), where
    pagerank collapses everything to one score on a single node set.
    Two full mutual-reinforcement rounds from the uniform authority
    start, L1-normalized each half-step.

    Determinism: every aggregation is an exact decimal sum; each
    normalization divides two bit-identical doubles (one shared IEEE
    division); the next round's sums re-quantize through the decimal
    cast — so both engines walk identical score vectors, and the
    (score DESC, id) top-{_HITS_TOP} cut per side is total.

    Scale: each half-step is one edge-keyed shuffle (join on the
    score side, aggregate on the other); the L1 norm is a scalar
    broadcast. Iterations localCheckpoint (house iterative-loop
    rule). Edge volume is the filtered purchase relation — never a
    pairs product."""
    e = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 4 == 0)
        .select(F.col("l_orderkey").alias("o"),
                F.col("l_partkey").alias("p"))
        .distinct()
        .persist()
    )

    def _l1(df, col):
        tot = df.agg(dsum(col).alias("t"))
        return (df.crossJoin(F.broadcast(tot))
                .select(*[c for c in df.columns if c != col],
                        (F.col(col) / F.col("t")).alias(col)))

    # authority starts uniform: h(o) = degree, exactly as the oracle
    h = e.groupBy("o").agg(
        F.count(F.lit(1)).cast("double").alias("s"))
    h = _l1(h, "s").localCheckpoint(eager=True)
    # the walk is h1 -> a1 -> h2 -> a2 (alternating half-steps);
    # report the LAST computed state of each side: hub = h2,
    # authority = a2 — exactly where the unrolled oracle stops
    a = None
    for i in range(2):
        a = (e.join(h, "o")
             .groupBy("p").agg(dsum("s").alias("s")))
        a = _l1(a, "s").localCheckpoint(eager=True)
        if i < 1:
            h = (e.join(a, "p")
                 .groupBy("o").agg(dsum("s").alias("s")))
            h = _l1(h, "s").localCheckpoint(eager=True)
    from pyspark.sql import Window as W

    auth = a.select(F.lit("authority").alias("kind"),
                    F.col("p").alias("id"), F.col("s").alias("score"))
    hub = h.select(F.lit("hub").alias("kind"),
                   F.col("o").alias("id"), F.col("s").alias("score"))
    wk = W.partitionBy("kind").orderBy(F.col("score").desc(), "id")
    out = (auth.unionByName(hub)
           .withColumn("rk", F.row_number().over(wk))
           .where(F.col("rk") <= _HITS_TOP)
           .select("kind", "id", "score",
                   F.col("rk").cast("int").alias("rk")))
    e.unpersist()
    return out
