"""Round-13 graded queries — composite / multi-column KEY BY feeds
(the r12 verdict's top item), GROUPS-frame navigation functions, and
the hardened quote-aware QUALIFY surface.

Registered LAST in load_all (after round12) so every name here sits
behind the certified tail (grading-rotation discipline,
queries/__init__.py). Reference citations are N/A — the reference
tree is empty (SURVEY.md §0); the binding spec is the driver
contract + SURVEY §2.

Oracles that interpolate the replay chunk count are registered as
CALLABLES (lazy templates, ADVICE r12): the text re-derives
default_chunks() every time the driver reads the surface, so an env
change between import and run can never leave the oracle pinned to a
stale batch count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..streaming.multitable import composite_key_sql
from ..streaming.replay import default_chunks
from . import query
from ._util import ts_group_chunk_cte

__all__ = ["load"]


def load() -> None:  # imported for side effects; keep a hook anyway
    pass


_CACHE: dict = {}


# ------------------------------------ changefeed_table_composite_key

def _ctck_oracle() -> str:
    nb = default_chunks()
    key_sql = composite_key_sql(("l_orderkey", "l_linenumber"))
    return f"""
    WITH env AS (
      SELECT {key_sql} AS key,
             CAST(l_shipdate AS TIMESTAMP) AS ts,
             l_extendedprice AS value
      FROM lineitem),
    {ts_group_chunk_cte(nb).lstrip()}
    SELECT bt.batch_id, e.key, count(*) AS d_count,
           CAST(sum(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE)
             AS d_sum
    FROM env e JOIN batched bt ON e.ts = bt.ts
    GROUP BY 1, 2
    """


@query("changefeed_table_composite_key", oracle=_ctck_oracle)
def changefeed_table_composite_key(spark, sf_dir):
    """COMPOSITE-key feed (r12 verdict item 1 — the highest-leverage
    real-user surface left): ``CREATE CHANGEFEED FOR lineitem KEY BY
    (l_orderkey, l_linenumber)`` keys the envelope on the table's
    real composite PK through the canonical escaped-concat string
    encoding (multitable.composite_key_sql: per part, 'n' for NULL
    else 'v' + the value with backslashes doubled and '|' escaped,
    parts joined on '|' — injective by the standard escape argument,
    so distinct key tuples can never collide the keyed merge the way
    a hash or a naive concat could). The previous composite route —
    the lineitem 3-bit integer pack codec (round-10 watchlist) —
    could not express (string, int) or wide composites; it stays as
    the historical point-feed twin. Graded on the FULL per-batch
    keyed-delta log: the oracle re-derives the key with the SAME
    encoding recipe and reconstructs build_table_chunks' ts-group
    chunking over l_shipdate, so a drifted encoding, a collapsed
    key, or a mis-chunked replay all break the hash.

    Scale: identical posture to scalar keys — the merge keys on
    (tbl, key) through the same bucketed MVCC store; the encoded
    string hash-partitions like any other key, and encoding cost is
    two replaces + a concat per row, Catalyst-native."""
    from ..api import Database

    key = (id(spark), sf_dir, "__ctck__")
    if key not in _CACHE:
        _CACHE[key] = Database(spark, sf_dir).sql(
            "CREATE CHANGEFEED FOR lineitem "
            "KEY BY (l_orderkey, l_linenumber)")
    feed = _CACHE[key]
    log = feed.log()
    nb = default_chunks()
    batches = sorted(
        r["batch_id"]
        for r in log.select("batch_id").distinct().collect())
    if batches != list(range(nb)):
        raise AssertionError(
            f"composite-keyed feed committed batches {batches}, "
            f"expected {list(range(nb))}")
    return log


# ------------------------- changefeed_table_composite_mixed_key

def _ctmk_oracle() -> str:
    nb = default_chunks()
    key_sql = composite_key_sql(("o_orderstatus", "o_custkey"))
    return f"""
    WITH env AS (
      SELECT {key_sql} AS key,
             CAST(o_orderdate AS TIMESTAMP) AS ts,
             o_totalprice AS value
      FROM orders),
    {ts_group_chunk_cte(nb).lstrip()}
    SELECT bt.batch_id, e.key, count(*) AS d_count,
           CAST(sum(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE)
             AS d_sum
    FROM env e JOIN batched bt ON e.ts = bt.ts
    GROUP BY 1, 2
    """


@query("changefeed_table_composite_mixed_key", oracle=_ctmk_oracle)
def changefeed_table_composite_mixed_key(spark, sf_dir):
    """Composite KEY BY MIXING a string and an integer column —
    ``.changes(key=("o_orderstatus", "o_custkey"))`` on orders, the
    fluent-API twin of the DDL form and exactly the shape the old
    integer bit-pack codec could not express. Unlike the lineitem PK
    (unique rows), this key has real multiplicity (a customer holds
    several orders per status), so the graded trajectory exercises
    the keyed MERGE on the encoded key: per batch, d_count > 1 rows
    fold multiple orders into one composite key, and the same key
    recurs across batches. Delivery contract asserted in-query: a
    fresh cursor drains exactly the committed batch set, and the
    drained rows ARE the graded frame (so an unfiltered or
    re-keyed delivery breaks the hash, not just the assert).

    Scale: the string key is bounded (status char + customer id);
    state cardinality is |status x customer| — the merge stays the
    bucketed (tbl, key) shuffle with no new machinery."""
    from ..api import Database

    key = (id(spark), sf_dir, "__ctmk__")
    if key not in _CACHE:
        _CACHE[key] = (
            Database(spark, sf_dir).table("orders")
            .changes(key=("o_orderstatus", "o_custkey")))
    feed = _CACHE[key]
    c = feed.cursor()
    rows = c.poll()
    nb = default_chunks()
    batches = sorted({r["batch_id"] for r in rows})
    if batches != list(range(nb)):
        raise AssertionError(
            f"mixed-composite cursor drained {batches}, "
            f"expected {list(range(nb))}")
    log = feed.log()
    return (
        spark.createDataFrame(rows, log.schema) if rows
        else spark.createDataFrame([], log.schema)
    )


# ------------------------------------------- win_frame_groups_nav

_WFGN_N = 2  #: GROUPS frame half-width (peer groups, not rows)

#: hour index of an event — integer epoch division, tz-free in both
#: engines (the round-12 GROUPS/EXCLUDE recipe)
_WFGN_H_SQL = "CAST(floor(epoch(ts) / 3600) AS BIGINT)"

_WFGN_ORACLE = f"""
WITH e AS (
  SELECT event_id, event_type, value, {_WFGN_H_SQL} AS h
  FROM events),
hs AS (
  SELECT event_type, h,
         dense_rank() OVER (PARTITION BY event_type ORDER BY h) AS g
  FROM (SELECT DISTINCT event_type, h FROM e)),
rep AS (
  SELECT e.event_type, hs.g, arg_min(e.value, e.event_id) AS rv
  FROM e JOIN hs ON hs.event_type = e.event_type AND hs.h = e.h
  GROUP BY 1, 2),
gm AS (SELECT event_type, max(g) AS gmax FROM hs GROUP BY 1),
base AS (
  SELECT e.event_id, e.event_type,
         greatest(hs.g - {_WFGN_N}, 1) AS lo,
         least(hs.g + {_WFGN_N}, gm.gmax) AS hi
  FROM e
  JOIN hs ON hs.event_type = e.event_type AND hs.h = e.h
  JOIN gm ON gm.event_type = e.event_type)
SELECT b.event_id, b.event_type,
       rf.rv AS first_grp_val,
       rn.rv AS nth2_grp_val,
       rl.rv AS last_grp_val
FROM base b
JOIN rep rf ON rf.event_type = b.event_type AND rf.g = b.lo
LEFT JOIN rep rn ON rn.event_type = b.event_type
                AND rn.g = b.lo + 1 AND b.lo + 1 <= b.hi
JOIN rep rl ON rl.event_type = b.event_type AND rl.g = b.hi
"""


@query("win_frame_groups_nav", oracle=_WFGN_ORACLE)
def win_frame_groups_nav(spark, sf_dir):
    """Navigation functions over a GROUPS frame — first_value /
    nth_value(2) / last_value, the other half of SQL:2016 frame
    semantics next to round-12's GROUPS aggregates (r12 verdict item
    3): for each event, the representative value of the FIRST,
    SECOND, and LAST distinct hour inside the +/-{_WFGN_N}-peer-group
    frame. Navigation over a frame with ties is only well-defined
    under a TOTAL order, so the semantics pin the representative of
    a peer group to its earliest event (min event_id) — the exact
    determinism rule, stated rather than left to engine tie-luck.
    The emulation is the dense-rank GROUPS index (g) composed with a
    bounded group-relation join: lo = greatest(g-{_WFGN_N}, 1) and
    hi = least(g+{_WFGN_N}, gmax) address the frame's edge groups
    directly, and nth_value(2) is lo+1 when the frame holds a second
    group, else NULL (the SQL:2016 out-of-frame answer). DuckDB
    still has no native GROUPS mode (probed r12), so the oracle is
    the independent set-based reconstruction through its own
    distinct-hour rank relation + arg_min.

    Scale: the fact table is never windowed or shuffled whole — the
    per-hour representative folds FIRST through one map-side-
    combinable aggregate, dense_rank then runs over the tiny
    |event_type x distinct hour| relation, and everything joins back
    by BROADCAST (gmax included), so fact rows cross no exchange at
    any width. Values pass through untouched (no float arithmetic
    anywhere)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").withColumn(
        "h", F.floor(F.col("ts").cast("long") / F.lit(3600))
        .cast("long"))
    # per-(type, hour) representative: ONE partial-aggregated
    # shuffle of hour-level rows; the GROUPS index g is a window
    # over this tiny relation, never over the facts
    hrep = (ev.groupBy("event_type", "h")
            .agg(F.min_by("value", "event_id").alias("rv")))
    wd = W.partitionBy("event_type").orderBy("h")
    rep = (hrep.withColumn("g", F.dense_rank().over(wd)
                           .cast("long"))
           .localCheckpoint(eager=False))
    gm = rep.groupBy("event_type").agg(F.max("g").alias("gmax"))
    base = (
        ev.join(F.broadcast(rep.select("event_type", "h", "g")),
                ["event_type", "h"])
        .join(F.broadcast(gm), "event_type")
        .select(
            "event_id", "event_type",
            F.greatest(F.col("g") - F.lit(_WFGN_N), F.lit(1))
            .alias("lo"),
            F.least(F.col("g") + F.lit(_WFGN_N), F.col("gmax"))
            .alias("hi"))
    )
    rf = rep.select(F.col("event_type").alias("et1"),
                    F.col("g").alias("g1"),
                    F.col("rv").alias("first_grp_val"))
    rn = rep.select(F.col("event_type").alias("et2"),
                    F.col("g").alias("g2"),
                    F.col("rv").alias("nth2_grp_val"))
    rl = rep.select(F.col("event_type").alias("et3"),
                    F.col("g").alias("g3"),
                    F.col("rv").alias("last_grp_val"))
    return (
        base
        .join(F.broadcast(rf),
              (F.col("event_type") == F.col("et1"))
              & (F.col("lo") == F.col("g1")))
        .join(F.broadcast(rn),
              (F.col("event_type") == F.col("et2"))
              & (F.col("lo") + 1 == F.col("g2"))
              & (F.col("lo") + 1 <= F.col("hi")), "left")
        .join(F.broadcast(rl),
              (F.col("event_type") == F.col("et3"))
              & (F.col("hi") == F.col("g3")))
        .select("event_id", "event_type",
                "first_grp_val", "nth2_grp_val", "last_grp_val")
    )


# ------------------------------------------------ sql_qualify_quoted

#: ONE SQL text serves both engines (the sql_qualify pattern), now
#: with the clause keyword embedded in a string literal: the r13
#: quote-aware detector must treat '%QUALIFY%' as data while still
#: rewriting the real trailing clause. DuckDB runs the text natively
#: as the oracle, certifying the hardened scan against real parser
#: semantics rather than against itself.
_QUALIFY_QUOTED_SQL = """
SELECT o_orderstatus, o_orderkey, o_totalprice
FROM orders
WHERE o_orderpriority NOT LIKE '%QUALIFY%'
QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice DESC,
                                    o_orderkey) <= 2
"""


@query("sql_qualify_quoted", oracle=_QUALIFY_QUOTED_SQL)
def sql_qualify_quoted(spark, sf_dir):
    """The hardened QUALIFY rewrite (r12 verdict item 4 + ADVICE):
    the detector is now a quote- and paren-aware top-level scan, so
    the word QUALIFY inside a string literal ('%QUALIFY%' LIKE
    patterns) is data, a QUALIFY inside a parenthesized subquery
    raises with the rewrite route instead of mangling the statement
    into an opaque parse error, and a SELECT DISTINCT body is
    refused with the semantic reason (native QUALIFY filters BEFORE
    DISTINCT; the subquery rewrite would filter after). This query
    grades the literal path end to end: the identical text runs
    through our rewriter on Spark and natively on DuckDB — a
    detector that fired on the literal would mangle the WHERE clause
    and break rows/hash on the Spark side only. Deterministic: the
    rank order is total; the LIKE filter matches nothing by fixture
    construction (priorities are '1-URGENT'..'5-LOW'), which is the
    point — the literal must pass through untouched.

    Scale: same plan as sql_qualify — one window + filter, rank
    predicate pushed into WindowGroupLimit map-side."""
    from ..api import Database

    return Database(spark, sf_dir).sql(_QUALIFY_QUOTED_SQL)


# ------------------------------------ changefeed_composite_filtered

def _ccf_oracle() -> str:
    nb = default_chunks()
    key_sql = composite_key_sql(("l_orderkey", "l_linenumber"))
    return f"""
    WITH env AS (
      SELECT {key_sql} AS key,
             CAST(l_shipdate AS TIMESTAMP) AS ts,
             l_extendedprice AS value, l_returnflag AS rf
      FROM lineitem),
    {ts_group_chunk_cte(nb).lstrip()}
    SELECT bt.batch_id, e.key, count(*) AS d_count,
           CAST(sum(CAST(e.value AS DECIMAL(28,6))) AS DOUBLE)
             AS d_sum
    FROM env e JOIN batched bt ON e.ts = bt.ts
    WHERE e.rf = 'R'
    GROUP BY 1, 2
    """


@query("changefeed_composite_filtered", oracle=_ccf_oracle)
def changefeed_composite_filtered(spark, sf_dir):
    """Composite KEY BY x payload filter x pruned after image — the
    INTERACTION of the two round-13 surfaces, which no existing feed
    exercises together: lineitem's default key is its composite PK
    (no single envelope key slot holds the parts), so the filter
    column l_returnflag must ride the Debezium-style `after` JSON
    image, which the r13 projection pruning cuts to exactly that one
    column on this 11-column table (asserted in-query off the
    runner's recorded column set). Chunk boundaries come from the
    FULL table (high-water marks advance on filtered-out rows — the
    resolved-timestamp completeness contract), while only matching
    rows enter state/log/delivery; the oracle reproduces both
    choices independently (chunking over all rows, aggregation over
    the predicate's rows) keyed by the same composite encoding.

    Scale: the pruned image is the difference between shipping 11
    columns' JSON per change and one flag character
    (tools/payload_audit.py: 1.6% of the full-row image on this very
    table); the predicate runs executor-side per micro-batch before
    any state is touched."""
    from ..api import Database

    key = (id(spark), sf_dir, "__ccf__")
    if key not in _CACHE:
        _CACHE[key] = (
            Database(spark, sf_dir).table("lineitem")
            .filter("l_returnflag = 'R'").changes())
    feed = _CACHE[key]
    r = feed._runner
    if not r.with_after:
        raise AssertionError(
            "composite filtered feed did not engage the after image")
    if r._after_cols != {"lineitem": ("l_returnflag",)}:
        raise AssertionError(
            f"after image not pruned to the filter column: "
            f"{r._after_cols}")
    return feed.log()


# ------------------------------------------- ts_granger_causality

_GC_F_CRIT_5 = 4.20  #: F(1, ~27) 5% critical value — the fixture's
#: shared-day series length is ~30 days, so df2 = n-3 ~ 27 for every
#: pair; with a varying-length corpus derive the critical value from
#: n instead of a constant (documented knob, same spirit as the
#: cointegration threshold)


def _gc_moment_sql(x: str) -> str:
    return f"CAST(sum(CAST(({x}) AS DECIMAL(18,6))) AS DOUBLE)"


def _gc_oracle() -> str:
    ds = _gc_moment_sql
    return f"""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP)
               AS day,
             {ds('value')} AS y
      FROM events GROUP BY event_type, date_trunc('day', ts)),
    pairs AS (
      SELECT a.event_type AS et_x, b.event_type AS et_y,
             a.day, a.y AS x, b.y AS yv
      FROM d a JOIN d b
        ON b.day = a.day AND a.event_type <> b.event_type),
    lagd AS (
      SELECT et_x, et_y, x,
             lag(x)  OVER (PARTITION BY et_x, et_y ORDER BY day)
               AS xl,
             lag(yv) OVER (PARTITION BY et_x, et_y ORDER BY day)
               AS yl
      FROM pairs),
    reg AS (SELECT * FROM lagd WHERE xl IS NOT NULL),
    m AS (
      SELECT et_x, et_y, count(*) AS n,
             {ds('x')} AS sy, {ds('xl')} AS s1, {ds('yl')} AS s2,
             {ds('xl * xl')} AS s11, {ds('yl * yl')} AS s22,
             {ds('xl * yl')} AS s12,
             {ds('xl * x')} AS s1y, {ds('yl * x')} AS s2y,
             {ds('x * x')} AS syy
      FROM reg GROUP BY et_x, et_y)
    SELECT et_x, et_y, CAST(n AS BIGINT) AS n,
           (((s1y - s1 * sy / n) * (s22 - s2 * s2 / n))
            - ((s2y - s2 * sy / n) * (s12 - s1 * s2 / n)))
           / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
              - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n)))
             AS beta_x,
           (((s2y - s2 * sy / n) * (s11 - s1 * s1 / n))
            - ((s1y - s1 * sy / n) * (s12 - s1 * s2 / n)))
           / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
              - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n)))
             AS beta_y,
           ((((syy - sy * sy / n) - (s1y - s1 * sy / n)
              * (s1y - s1 * sy / n) / (s11 - s1 * s1 / n))
             - ((syy - sy * sy / n)
                - ((((s1y - s1 * sy / n) * (s22 - s2 * s2 / n))
                    - ((s2y - s2 * sy / n) * (s12 - s1 * s2 / n)))
                   / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
                      - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))))
                  * (s1y - s1 * sy / n)
                - ((((s2y - s2 * sy / n) * (s11 - s1 * s1 / n))
                    - ((s1y - s1 * sy / n) * (s12 - s1 * s2 / n)))
                   / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
                      - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))))
                  * (s2y - s2 * sy / n)))
            / (((syy - sy * sy / n)
                - ((((s1y - s1 * sy / n) * (s22 - s2 * s2 / n))
                    - ((s2y - s2 * sy / n) * (s12 - s1 * s2 / n)))
                   / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
                      - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))))
                  * (s1y - s1 * sy / n)
                - ((((s2y - s2 * sy / n) * (s11 - s1 * s1 / n))
                    - ((s1y - s1 * sy / n) * (s12 - s1 * s2 / n)))
                   / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
                      - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))))
                  * (s2y - s2 * sy / n)) / (n - 3))) AS f_stat,
           ((((syy - sy * sy / n) - (s1y - s1 * sy / n)
              * (s1y - s1 * sy / n) / (s11 - s1 * s1 / n))
             - ((syy - sy * sy / n)
                - ((((s1y - s1 * sy / n) * (s22 - s2 * s2 / n))
                    - ((s2y - s2 * sy / n) * (s12 - s1 * s2 / n)))
                   / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
                      - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))))
                  * (s1y - s1 * sy / n)
                - ((((s2y - s2 * sy / n) * (s11 - s1 * s1 / n))
                    - ((s1y - s1 * sy / n) * (s12 - s1 * s2 / n)))
                   / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
                      - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))))
                  * (s2y - s2 * sy / n)))
            / (((syy - sy * sy / n)
                - ((((s1y - s1 * sy / n) * (s22 - s2 * s2 / n))
                    - ((s2y - s2 * sy / n) * (s12 - s1 * s2 / n)))
                   / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
                      - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))))
                  * (s1y - s1 * sy / n)
                - ((((s2y - s2 * sy / n) * (s11 - s1 * s1 / n))
                    - ((s1y - s1 * sy / n) * (s12 - s1 * s2 / n)))
                   / (((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
                      - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n))))
                  * (s2y - s2 * sy / n)) / (n - 3)))
             > {_GC_F_CRIT_5} AS granger_5pct
    FROM m
    WHERE n > 3
      AND ((s11 - s1 * s1 / n) * (s22 - s2 * s2 / n))
          - ((s12 - s1 * s2 / n) * (s12 - s1 * s2 / n)) > 0
    """


@query("ts_granger_causality", oracle=_gc_oracle())
def ts_granger_causality(spark, sf_dir):
    """GRANGER CAUSALITY (Granger 1969) for every ORDERED event-type
    pair's daily series — the directional complement of round-12's
    Engle-Granger cointegration (co-movement says nothing about
    which side leads): does yesterday's series y improve the
    prediction of today's x beyond yesterday's x alone? One-lag
    form: unrestricted OLS x_t = a + b*x_(t-1) + c*y_(t-1) via the
    closed-form 2x2 normal equations on centered moments, restricted
    x_t = a + b*x_(t-1), and the F statistic
    (SSR_r - SSR_u) / (SSR_u / (n-3)) with 1 numerator df. The flag
    compares against the F(1, n-3~27) 5% critical value
    ({_GC_F_CRIT_5}; the fixture's shared-day length makes df2
    uniform across pairs — with varying-length series derive it
    from n).

    Determinism (the cointegration recipe end to end): daily sums
    and ALL moment sums ride the exact-decimal dsum cast; beta_x /
    beta_y / f_stat are closed-form IEEE trees over bit-identical
    moment doubles — Spark and DuckDB build the SAME expression
    shape (the SQL above is the Spark tree transliterated), so every
    division and subtraction matches bit for bit, and the 5% flag
    agrees exactly.

    Scale: the day self-join fans each series to P-1 partners (P =
    event types); all moments are map-side-combinable aggregates on
    the (et_x, et_y) key — a million series pairs would parallelize
    with no driver involvement."""
    from pyspark.sql import Window as W

    from ._util import dsum

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(dsum("value").cast("double").alias("y"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (
        a.join(b, (F.col("b.day") == F.col("a.day"))
               & (F.col("a.event_type") != F.col("b.event_type")))
        .select(F.col("a.event_type").alias("et_x"),
                F.col("b.event_type").alias("et_y"),
                F.col("a.day").alias("day"),
                F.col("a.y").alias("x"), F.col("b.y").alias("yv"))
    )
    w = W.partitionBy("et_x", "et_y").orderBy("day")
    reg = (
        pairs.select("et_x", "et_y", "x",
                     F.lag("x").over(w).alias("xl"),
                     F.lag("yv").over(w).alias("yl"))
        .where(F.col("xl").isNotNull())
    )
    m = reg.groupBy("et_x", "et_y").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sy"),
        dsum("xl").alias("s1"), dsum("yl").alias("s2"),
        dsum(F.col("xl") * F.col("xl")).alias("s11"),
        dsum(F.col("yl") * F.col("yl")).alias("s22"),
        dsum(F.col("xl") * F.col("yl")).alias("s12"),
        dsum(F.col("xl") * F.col("x")).alias("s1y"),
        dsum(F.col("yl") * F.col("x")).alias("s2y"),
        dsum(F.col("x") * F.col("x")).alias("syy"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = c11 * c22 - c12 * c12
    beta_x = (c1y * c22 - c2y * c12) / det
    beta_y = (c2y * c11 - c1y * c12) / det
    ssr_u = cyy - beta_x * c1y - beta_y * c2y
    ssr_r = cyy - c1y * c1y / c11
    f_stat = (ssr_r - ssr_u) / (ssr_u / (n - 3))
    return (
        m.where((n > 3) & (det > 0))
        .select("et_x", "et_y", "n",
                beta_x.alias("beta_x"), beta_y.alias("beta_y"),
                f_stat.alias("f_stat"),
                (f_stat > _GC_F_CRIT_5).alias("granger_5pct"))
    )


# -------------------------------------- win_frame_groups_nav_exclude

_WFGNX_ORACLE = f"""
WITH e AS (
  SELECT event_id, event_type, value, {_WFGN_H_SQL} AS h
  FROM events),
hs AS (
  SELECT event_type, h,
         dense_rank() OVER (PARTITION BY event_type ORDER BY h) AS g
  FROM (SELECT DISTINCT event_type, h FROM e)),
rep AS (
  SELECT e.event_type, e.h, arg_min(e.value, e.event_id) AS rv
  FROM e GROUP BY 1, 2),
fr AS (
  SELECT a.event_type, a.h AS h0, b.h AS h2
  FROM hs a JOIN hs b
    ON b.event_type = a.event_type
   AND abs(b.g - a.g) <= {_WFGN_N} AND b.h <> a.h),
rk AS (
  SELECT event_type, h0, h2,
         row_number() OVER (PARTITION BY event_type, h0
                            ORDER BY h2) AS rk,
         count(*) OVER (PARTITION BY event_type, h0) AS cnt
  FROM fr)
SELECT e.event_id, e.event_type,
       v1.rv AS first_ex_val,
       v2.rv AS nth2_ex_val,
       vl.rv AS last_ex_val
FROM e
LEFT JOIN rk r1 ON r1.event_type = e.event_type AND r1.h0 = e.h
               AND r1.rk = 1
LEFT JOIN rep v1 ON v1.event_type = e.event_type AND v1.h = r1.h2
LEFT JOIN rk r2 ON r2.event_type = e.event_type AND r2.h0 = e.h
               AND r2.rk = 2
LEFT JOIN rep v2 ON v2.event_type = e.event_type AND v2.h = r2.h2
LEFT JOIN rk rl ON rl.event_type = e.event_type AND rl.h0 = e.h
               AND rl.rk = rl.cnt
LEFT JOIN rep vl ON vl.event_type = e.event_type AND vl.h = rl.h2
"""


@query("win_frame_groups_nav_exclude", oracle=_WFGNX_ORACLE)
def win_frame_groups_nav_exclude(spark, sf_dir):
    """GROUPS-frame navigation COMPOSED with EXCLUDE GROUP — the
    last cell of the r12 verdict's frame matrix (GROUPS aggregates,
    GROUPS+EXCLUDE aggregates, GROUPS navigation, and now GROUPS
    navigation over the exclusion frame): first / second / last
    distinct-hour representative among the +/-{_WFGN_N} nearest
    peer groups with the row's OWN group removed — "the nearest
    other active hours, mine excluded". Where the aggregate
    composition was subtraction algebra, navigation composes by
    INDEX arithmetic on the dense-rank group axis: the exclusion
    frame is [lo..hi] minus g, so its first element is lo unless
    lo = g (then lo+1), its second skips over g when g is adjacent,
    and its last is hi unless hi = g (then hi-1) — every case a
    CASE expression, NULL when the index leaves [lo..hi] (a
    single-hour partition has an EMPTY exclusion frame, the
    SQL:2016 out-of-frame answer). The oracle is the independent
    set-based reconstruction: materialize the exclusion frame as a
    join, rank it by hour, read ranks 1 / 2 / cnt — a drifted index
    case-split breaks the hash from either side.

    Scale: identical posture to win_frame_groups_nav — per-hour
    fold first, rank the tiny hour relation, broadcast back; fact
    rows cross no exchange."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").withColumn(
        "h", F.floor(F.col("ts").cast("long") / F.lit(3600))
        .cast("long"))
    hrep = (ev.groupBy("event_type", "h")
            .agg(F.min_by("value", "event_id").alias("rv")))
    wd = W.partitionBy("event_type").orderBy("h")
    rep = (hrep.withColumn("g", F.dense_rank().over(wd)
                           .cast("long"))
           .localCheckpoint(eager=False))
    gm = rep.groupBy("event_type").agg(F.max("g").alias("gmax"))
    g = F.col("g")
    lo = F.greatest(g - F.lit(_WFGN_N), F.lit(1))
    hi = F.least(g + F.lit(_WFGN_N), F.col("gmax"))
    f1 = F.when(lo != g, lo).otherwise(lo + 1)
    f1 = F.when(f1 <= hi, f1)
    n2 = F.when(lo < g,
                F.when(lo + 1 != g, lo + 1).otherwise(lo + 2)
                ).otherwise(lo + 2)
    n2 = F.when(n2 <= hi, n2)
    l1 = F.when(hi != g, hi).otherwise(hi - 1)
    l1 = F.when(l1 >= lo, l1)
    base = (
        ev.join(F.broadcast(rep.select("event_type", "h", "g")),
                ["event_type", "h"])
        .join(F.broadcast(gm), "event_type")
        .select("event_id", "event_type",
                f1.alias("f1"), n2.alias("n2"), l1.alias("l1"))
    )
    r1 = rep.select(F.col("event_type").alias("et1"),
                    F.col("g").alias("g1"),
                    F.col("rv").alias("first_ex_val"))
    r2 = rep.select(F.col("event_type").alias("et2"),
                    F.col("g").alias("g2"),
                    F.col("rv").alias("nth2_ex_val"))
    rl = rep.select(F.col("event_type").alias("et3"),
                    F.col("g").alias("g3"),
                    F.col("rv").alias("last_ex_val"))
    return (
        base
        .join(F.broadcast(r1),
              (F.col("event_type") == F.col("et1"))
              & (F.col("f1") == F.col("g1")), "left")
        .join(F.broadcast(r2),
              (F.col("event_type") == F.col("et2"))
              & (F.col("n2") == F.col("g2")), "left")
        .join(F.broadcast(rl),
              (F.col("event_type") == F.col("et3"))
              & (F.col("l1") == F.col("g3")), "left")
        .select("event_id", "event_type",
                "first_ex_val", "nth2_ex_val", "last_ex_val")
    )


# ------------------------------------------- sql_qualify_hidden_col

#: the predicate PARTITIONS BY a column the query never projects —
#: legal in every QUALIFY dialect (the clause sees the FROM scope,
#: not the select list); the r13 splice rewrite reproduces that
#: visibility, where the old wrap-in-subquery form failed analysis.
_QUALIFY_HIDDEN_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                           ORDER BY o_totalprice DESC,
                                    o_orderkey) <= 1
"""


@query("sql_qualify_hidden_col", oracle=_QUALIFY_HIDDEN_SQL)
def sql_qualify_hidden_col(spark, sf_dir):
    """QUALIFY referencing a NON-PROJECTED column — the dialect-legal
    form the r12 rewrite refused with an analysis error (documented
    limitation #6 of the r12 verdict's QUALIFY note): native QUALIFY
    evaluates in the FROM scope, so ``PARTITION BY o_orderstatus``
    is legal even though the query projects only (o_orderkey,
    o_totalprice). The r13 rewrite SPLICES the predicate into the
    body's own select list (before the top-level FROM, found by the
    same quote/paren-aware scan as the clause detector) instead of
    wrapping the body in a subquery — the predicate then sees every
    FROM-scope column, and the helper column drops after the filter.
    DuckDB runs the identical text natively as the oracle, so the
    hash certifies scope parity, not just row counts. Deterministic:
    one row per (hidden) status, total rank order.

    Scale: same single window + filter plan; the splice adds one
    projected column that never survives the rewrite."""
    from ..api import Database

    return Database(spark, sf_dir).sql(_QUALIFY_HIDDEN_SQL)


# -------------------------------------- changefeed_composite_decode

@query(
    "changefeed_composite_decode",
    oracle="""
    SELECT l_orderkey, l_linenumber, count(*) AS cnt,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6)))
                AS DOUBLE) AS sum_value
    FROM lineitem GROUP BY 1, 2
    """,
)
def changefeed_composite_decode(spark, sf_dir):
    """ENCODE -> MERGE -> DECODE round trip graded end to end: the
    composite-keyed lineitem feed's materialized state is read back
    through multitable.composite_key_decode (split on unescaped
    separators, unescape, NULL markers back to NULL) and the decoded
    part columns cast to their original types — and the oracle is
    the PLAIN raw-column aggregate, which never sees the encoding at
    all. The hash therefore certifies that the encoding is lossless
    through the entire feed machinery (envelope, bucketed MVCC
    merge, state read): any drift in encode OR decode — a collision,
    a mis-split, a mangled escape — surfaces as a wrong key, count,
    or sum against ground truth. Complements the adversarial
    round-trip unit pin (tests/test_round13_ops.py) with the real
    end-to-end data path.

    Scale: decode is three Catalyst-native string ops per state row
    on the READ surface only — the merge never decodes."""
    from ..api import Database
    from ..streaming.multitable import composite_key_decode

    key = (id(spark), sf_dir, "__ctck__")
    if key not in _CACHE:
        _CACHE[key] = Database(spark, sf_dir).sql(
            "CREATE CHANGEFEED FOR lineitem "
            "KEY BY (l_orderkey, l_linenumber)")
    feed = _CACHE[key]
    st = feed.state()
    parts = composite_key_decode(
        F.col("key"), ("ok_s", "ln_s"))
    return st.select(*parts, "cnt", "sum_value").select(
        F.col("ok_s").cast("bigint").alias("l_orderkey"),
        F.col("ln_s").cast("int").alias("l_linenumber"),
        "cnt", "sum_value")
