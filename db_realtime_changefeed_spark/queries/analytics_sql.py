"""Spark-4 SQL surface (variant, pipe syntax, recursive CTE,
IDENTIFIER, modern GROUP BY ALL / pivot ergonomics) plus the round-4
relational widening that shipped alongside it: dynamic-gap sessions,
the SCD2 dimension build, z-order layout keys, filtered/quantile/
bitmap aggregates, tolerance as-of joins, running distinct. Split out
of analytics.py in round 6 (VERDICT r5 housekeeping) purely
mechanically - registration names, bodies, and declaration order are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..tmputil import scratch_dir
from . import query
from ._util import davg, dsum, sql_dsum

# ------------------------------------------- Spark-4 SQL surface (r4)

@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod
    FROM events
    """,
)
def fn_variant(spark, sf_dir):
    """The VARIANT type (Spark 4): parse the JSON props column once
    into the binary variant encoding, then extract typed fields with
    variant_get — the open-schema path a changefeed uses for
    free-form payloads. Unlike string json_extract per field, the
    parse cost is paid once per row and extraction is a binary walk
    (the same design as the variant/BSON columns in modern
    warehouses). Scan-local, no shuffle."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.parse_json("props").alias("v")
    )
    k = F.expr("variant_get(v, '$.k', 'int')")
    return ev.select(
        "event_id", k.alias("k"), (k % 10).alias("k_mod")
    )


_PIPE_SQL_SPARK = """
FROM lineitem
|> WHERE l_quantity > 10.0
|> AGGREGATE CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_qty, count(*) AS n
   GROUP BY l_returnflag, l_linestatus
"""

@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_qty, count(*) AS n
    FROM lineitem
    WHERE l_quantity > 10.0
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (Spark 4's |> operator chain): the same
    filter→aggregate expressed as a linear pipeline. Catalyst lowers
    it to the identical plan as the ANSI form — the oracle IS that
    ANSI form, so the grade proves the equivalence."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL_SPARK)


_RECURSIVE_SQL = """
WITH RECURSIVE months(m) AS (
  SELECT CAST('1995-01-01' AS DATE)
  UNION ALL
  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
  WHERE m < CAST('2001-06-01' AS DATE)
)
SELECT CAST(months.m AS TIMESTAMP) AS month_start,
       count(o.o_orderkey) AS n_orders
FROM months
LEFT JOIN orders o
  ON o.o_orderdate >= CAST(months.m AS TIMESTAMP)
 AND o.o_orderdate < CAST(CAST(m + INTERVAL 1 MONTH AS DATE)
                          AS TIMESTAMP)
GROUP BY months.m
"""

@query("sql_recursive_cte", oracle=_RECURSIVE_SQL)
def sql_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4): generate the month ladder spanning
    the orders table, then count orders per month INCLUDING empty
    months — the gap-free calendar spine reports need, produced by
    iteration instead of a pre-materialized dimension. The exact
    same WITH RECURSIVE text runs on both engines."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


_LATERAL_SQL = """
SELECT r.r_name, t.n_name, t.total_bal
FROM region r,
LATERAL (
  SELECT n.n_name,
         CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,6))) AS DOUBLE)
           AS total_bal
  FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY total_bal DESC, n.n_name
  LIMIT 2
) t
"""

@query("join_lateral_correlated", oracle=_LATERAL_SQL)
def join_lateral_correlated(spark, sf_dir):
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT:
    top-2 nations by supplier balance FOR EACH region — the
    top-k-per-outer-row shape that decorrelates into a ranked
    window join (same family as win_topk_per_group, but written as
    the SQL a user would bring from Postgres). Identical text on
    both engines."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "win_session_dynamic_gap",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'error' THEN INTERVAL 60 MINUTE
                  ELSE INTERVAL 30 MINUTE END AS gap
      FROM events),
    p AS (
      SELECT user_id, ts, value, gap,
             max(ts + gap) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prev_end
      FROM g),
    s AS (
      SELECT user_id, ts, value, gap,
             sum(CASE WHEN prev_end IS NULL OR ts > prev_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM p)
    SELECT user_id, min(ts) AS session_start,
           max(ts + gap) AS session_end,
           count(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM s GROUP BY user_id, sess_id
    """,
)
def win_session_dynamic_gap(spark, sf_dir):
    """Session windows with a DATA-DEPENDENT gap: error events hold
    the session open for 60 minutes, everything else 30 — the
    per-event-type inactivity policy real sessionization needs.
    Spark-first: `session_window(ts, CASE ...)` is a native dynamic
    gap (one shuffle on user_id, sessions merged inside the
    aggregate); the oracle reconstructs the merge with a running
    max(ts + gap) — an event opens a new session iff it starts after
    every earlier event's reach."""
    ev = load_table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "error", F.lit("60 minutes"))
        .otherwise(F.lit("30 minutes"))
    )
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )


@query(
    "scd2_build",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events),
    changes AS (
        SELECT user_id, event_type, ts FROM ordered
        WHERE prev IS NULL OR event_type <> prev),
    versions AS (
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   AS valid_to,
               row_number() OVER (PARTITION BY user_id ORDER BY ts)
                   AS version
        FROM changes)
    SELECT user_id, version, event_type AS attr, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM versions
    """,
)
def scd2_build(spark, sf_dir):
    """Type-2 slowly-changing dimension build from an append-only
    event log — the warehouse pattern that turns a change stream
    into validity-interval history (the batch complement of the
    changefeed family's MVCC state). Per user: collapse consecutive
    events with an unchanged attribute (lag pass), then stamp each
    surviving change with [valid_from, valid_to) via lead, a version
    number, and an is_current flag on the open interval. Both window
    passes share the user_id partitioning → ONE shuffle; at 100 TB
    this is the standard one-pass history rebuild, and incremental
    maintenance rides the changefeed instead. (ts, event_id)
    tie-break keeps both engines deterministic on same-timestamp
    events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(
            F.col("prev").isNull()
            | (F.col("event_type") != F.col("prev"))
        )
        .select("user_id", "event_type", "ts")
    )
    wv = Window.partitionBy("user_id").orderBy("ts")
    return changes.select(
        "user_id",
        F.row_number().over(wv).alias("version"),
        F.col("event_type").alias("attr"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wv).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def _zorder_expr(a: str, b: str, nbits: int = 16) -> str:
    """Bit-interleave SQL shared VERBATIM by the Spark query and the
    DuckDB oracle — integer shifts/masks parse and evaluate
    identically in both dialects, so the engines cannot drift."""
    terms = " | ".join(
        f"((({a} >> {i}) & 1) << {2 * i}) | "
        f"((({b} >> {i}) & 1) << {2 * i + 1})"
        for i in range(nbits)
    )
    return f"({terms})"


_Z_A = "(user_id % 65536)"
_Z_B = "(CAST(floor(value) AS BIGINT) % 65536)"
_Z_EXPR = _zorder_expr(_Z_A, _Z_B)


@query(
    "layout_zorder",
    oracle=f"""
    WITH z AS (
        SELECT user_id, CAST(floor(value) AS BIGINT) AS v,
               {_Z_EXPR} AS zkey
        FROM events)
    SELECT zkey >> 14 AS block_id, count(*) AS n_rows,
           min(user_id) AS min_user, max(user_id) AS max_user,
           min(v) AS min_v, max(v) AS max_v
    FROM z GROUP BY 1
    """,
)
def layout_zorder(spark, sf_dir):
    """Z-order (Morton) clustering key — the multi-dimensional data
    layout trick behind Delta/Iceberg OPTIMIZE ZORDER: interleaving
    the bits of two columns gives a single sort/partition key under
    which ranges of EITHER column map to few key ranges, so min/max
    file statistics prune on both. Here each event gets a 32-bit
    Morton key over (user_id, floor(value)); rows are binned by the
    key's high bits (a pure map-side shift — no global sort needed to
    demonstrate locality) and each bin reports its bounding box: the
    tight per-block min/max on BOTH dimensions is exactly the
    statistic a scan would prune with. At 100 TB the same key feeds
    repartitionByRange(zkey) + sortWithinPartitions at write time;
    the interleave expression itself is shared verbatim with the
    oracle so the engines cannot diverge."""
    ev = load_table(spark, sf_dir, "events")
    z = ev.selectExpr(
        "user_id",
        "CAST(floor(value) AS BIGINT) AS v",
        f"{_Z_EXPR} AS zkey",
    )
    return z.selectExpr("zkey >> 14 AS block_id", "user_id", "v").groupBy(
        "block_id"
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(*) FILTER (WHERE value > 100) AS n_big,
           count(DISTINCT user_id) FILTER (WHERE value > 100)
               AS users_big,
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                FILTER (WHERE ts >= TIMESTAMP '2024-01-15')
                AS DOUBLE) AS late_value
    FROM events GROUP BY event_type
    """,
)
def agg_filtered(spark, sf_dir):
    """Filtered aggregates — the ANSI FILTER clause (one scan, many
    conditional aggregates) instead of N self-joins or CASE
    pyramids. All four aggregates ride the same single hash
    aggregate; the filtered decimal sum uses the exact-sum path.
    Identical SQL runs on both engines; the Spark side uses the SQL
    form deliberately to grade the parser surface too."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_agg_filtered")
    return spark.sql("""
        SELECT event_type,
               count(*) AS n,
               count(*) FILTER (WHERE value > 100) AS n_big,
               count(DISTINCT user_id) FILTER (WHERE value > 100)
                   AS users_big,
               CAST(sum(CAST(value AS DECIMAL(18,6)))
                    FILTER (WHERE ts >= TIMESTAMP '2024-01-15')
                    AS DOUBLE) AS late_value
        FROM events_agg_filtered GROUP BY event_type
    """)


@query(
    "agg_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS q25,
           round(quantile_cont(value, 0.50), 6) AS q50,
           round(quantile_cont(value, 0.75), 6) AS q75,
           round(quantile_cont(value, 0.95), 6) AS q95
    FROM events GROUP BY event_type
    """,
)
def agg_quantiles(spark, sf_dir):
    """Exact multi-quantile profile per group — percentile() with
    linear interpolation, the same formula DuckDB's quantile_cont
    uses (verified to 6 dp). Honesty note for 100 TB: exact
    percentiles buffer each group's values (ObjectHashAggregate),
    so the scale path is agg_approx's approx_percentile sketch —
    this query grades the exact-sort semantics on groups that fit,
    the profile DBAs run on samples."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(value, 0.50)"), 6).alias("q50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("q75"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("q95"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """Bitmap-based exact COUNT DISTINCT (the Kylin/Doris trick,
    Spark 3.5+ bitmap functions): keys map to (bucket, bit) pairs,
    each (group, bucket) builds a fixed 4 KB bitmap via
    bitmap_construct_agg, and distinct = sum of bitmap popcounts.
    Two-stage like agg_distinct_twostage but the inner state is a
    CONSTANT-SIZE bitmap instead of the key set — at 100 TB the
    shuffle carries (group, bucket, 4KB) rows bounded by the key
    domain/32768, not by row count, and bitmaps OR-merge
    associatively. Result is exactly count(DISTINCT), which is the
    oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        )
        .agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(user_id))"
            ).alias("bm")
        )
        .groupBy("event_type")
        .agg(F.expr("sum(bitmap_count(bm))").alias("n_users"))
    )


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT p.user_id, p.event_id, p.value,
           CASE WHEN c.event_id IS NOT NULL
                 AND p.ts - c.ts <= INTERVAL 5 MINUTE
                THEN c.event_id END AS click_id,
           CASE WHEN c.event_id IS NOT NULL
                 AND p.ts - c.ts <= INTERVAL 5 MINUTE
                THEN c.value END AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.event_id >= c.event_id
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a staleness TOLERANCE (§2.C6 + the
    feature-store contract): match the latest preceding click only
    if it is at most 5 minutes old, else null — exactly pandas
    merge_asof(tolerance=...). Same scalable union-merge plan as
    join_asof (one user_id shuffle + one sort, no range join); the
    carried click timestamp is compared against the purchase time
    and stale matches null out in projection. DuckDB's ASOF JOIN
    has no tolerance argument, so the oracle applies the same
    post-filter to the unbounded match — semantically identical
    because tolerance only ever REMOVES the single latest match."""
    ev = load_table(spark, sf_dir, "events")
    is_click = F.col("event_type") == "click"
    tagged = ev.where(
        is_click | (F.col("event_type") == "purchase")
    ).select("user_id", "event_id", "ts", "value", is_click.alias("is_click"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        tagged.withColumn(
            "c_id",
            F.last(
                F.when(F.col("is_click"), F.col("event_id")),
                ignorenulls=True,
            ).over(w),
        )
        .withColumn(
            "c_val",
            F.last(
                F.when(F.col("is_click"), F.col("value")),
                ignorenulls=True,
            ).over(w),
        )
        .withColumn(
            "c_ts",
            F.last(
                F.when(F.col("is_click"), F.col("ts")), ignorenulls=True
            ).over(w),
        )
        .where(~F.col("is_click"))
    )
    fresh = F.col("c_id").isNotNull() & (
        F.col("ts").cast("long") - F.col("c_ts").cast("long") <= 300
    )
    return carried.select(
        "user_id",
        "event_id",
        "value",
        F.when(fresh, F.col("c_id")).alias("click_id"),
        F.when(fresh, F.col("c_val")).alias("click_value"),
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_of_type
        FROM events)
    SELECT user_id, event_id,
           CAST(sum(first_of_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_types_so_far
    FROM flagged
    """,
)
def win_running_distinct(spark, sf_dir):
    """Running DISTINCT count per user — how many distinct event
    types has this user produced up to each event (the engagement-
    breadth signal). A naive distinct-in-window is quadratic;
    the scalable form flags each (user, type)'s FIRST occurrence
    (one window) and running-sums the flags (second window). An
    explicit repartition on user_id makes BOTH windows accept the
    same exchange — HashPartitioning(user_id) satisfies the
    (user_id, event_type) clustering requirement too (subset rule),
    where the default plan would shuffle twice; plan-asserted to
    exactly one exchange. Pure integer math, (ts, event_id)
    tie-break."""
    ev = load_table(spark, sf_dir, "events").repartition("user_id")
    wf = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn(
            "first_of_type",
            F.when(F.row_number().over(wf) == 1, 1).otherwise(0),
        )
        .select(
            "user_id",
            "event_id",
            F.sum("first_of_type").over(wr).alias("n_types_so_far"),
        )
    )


_MODERN_SQL = """
    SELECT o_orderstatus, n, total,
           total / n AS avg_price,
           avg_price * 2 AS double_avg
    FROM (
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                 AS total
      FROM orders
      GROUP BY ALL
    ) t
"""


@query("sql_modern_syntax", oracle=_MODERN_SQL)
def sql_modern_syntax(spark, sf_dir):
    """Modern-SQL ergonomics, one text on both engines: GROUP BY ALL
    (grouping keys inferred from the non-aggregate select list) and
    LATERAL COLUMN ALIASES (avg_price referenced by the very next
    select item, no repeated expression / no extra subquery). Both
    features parse and evaluate identically in Spark 4 and DuckDB,
    so the oracle IS the query — the strongest portability
    statement, same as sql_interface. (Spark does not yet allow a
    lateral alias to feed GROUP BY ALL itself, which is why the
    aggregate sits in the derived table.)"""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_MODERN_SQL)


@query(
    "sql_identifier",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_identifier(spark, sf_dir):
    """The IDENTIFIER() clause: table names as bind parameters —
    the injection-safe form of dynamic-table dashboards (string
    concatenation into FROM is the classic SQL-injection hole this
    kills). The template stays constant; `args` binds the table
    name at execution. Complements sql_params (value binding)."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM IDENTIFIER(:tbl) GROUP BY o_orderpriority
        """,
        args={"tbl": "orders"},
    )


@query(
    "pivot_transpose",
    oracle="""
    SELECT 'n' AS key,
           CAST(count(*) FILTER (WHERE event_type = 'click')
                AS DOUBLE) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error')
                AS DOUBLE) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase')
                AS DOUBLE) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup')
                AS DOUBLE) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view')
                AS DOUBLE) AS view
    FROM events
    UNION ALL
    SELECT 'sum_value',
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                FILTER (WHERE event_type = 'click') AS DOUBLE),
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                FILTER (WHERE event_type = 'error') AS DOUBLE),
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                FILTER (WHERE event_type = 'purchase') AS DOUBLE),
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                FILTER (WHERE event_type = 'signup') AS DOUBLE),
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                FILTER (WHERE event_type = 'view') AS DOUBLE)
    FROM events
    """,
)
def pivot_transpose(spark, sf_dir):
    """DataFrame.transpose() (Spark 4): rows become columns keyed by
    the index column — the metric-matrix flip every reporting layer
    does (metrics down, dimensions across). The input is a 5-row
    grouped aggregate (decimal-stabilized sum), so transpose runs on
    broadcast-sized data after the one real aggregation; the oracle
    states the transposed result as conditional aggregates. Both
    measures cast to double (transpose requires a uniform value
    type)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum("value").alias("sum_value"),
    )
    return agg.transpose("event_type")


@query(
    "agg_grouping_id",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
               AS gid,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark, sf_dir):
    """GROUPING()/grouping_id disambiguation (§2.D5 completion):
    in a rollup, a NULL key value is ambiguous — was the row
    aggregated over that column, or is the data value NULL? The
    GROUPING() flag answers it authoritatively; every BI layer on
    top of rollup output depends on this. Identical semantics both
    engines (gid composed from per-column flags, which DuckDB and
    Spark both expose, rather than engine-specific grouping_id
    bit orders)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (
                F.grouping("o_orderstatus") * 2
                + F.grouping("o_orderpriority")
            ).cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias(
                "priority"
            ),
            "gid",
            "n",
        )
    )


@query(
    "win_streak",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    islands AS (
        SELECT user_id, d,
               CAST(d AS DATE) - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d) AS INTEGER)
                   AS grp
        FROM days),
    streaks AS (
        SELECT user_id, grp, count(*) AS len,
               min(d) AS streak_start
        FROM islands GROUP BY user_id, grp)
    SELECT user_id,
           CAST(max(len) AS BIGINT) AS max_streak,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           min(streak_start) AS first_active
    FROM streaks GROUP BY user_id
    """,
)
def win_streak(spark, sf_dir):
    """Gaps-and-islands by CALENDAR DAY — the consecutive-active-days
    streak (engagement analytics' other island pattern; win_sessionize
    covers the time-gap variant). The island key is the classic
    date-minus-rank trick: consecutive days share (d - row_number)
    exactly, any gap shifts it. Distinct days, the ranking window,
    and both aggregates all share the user_id partitioning — the
    subset rule keeps this at ONE data shuffle after the explicit
    repartition. Pure integer/date arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    days = (
        ev.repartition("user_id")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "grp", F.date_sub("d", F.row_number().over(w))
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("d").alias("streak_start"),
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("max_streak"),
        F.sum("len").alias("n_active_days"),
        F.min("streak_start").alias("first_active"),
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(value) AS DOUBLE) AS lo,
           CAST(max(value) AS DOUBLE) AS hi
    FROM events
    GROUP BY event_type, CAST(floor(value / 50.0) AS BIGINT)
    """,
)
def agg_histogram(spark, sf_dir):
    """Equi-width histogram per group — the profiling primitive
    behind every column-statistics page. Fixed width-50 buckets
    (floor(value/50): data-independent bounds, so two engines — or
    two partitions — can never disagree on bucket edges; min/max
    per bucket come free in the same single hash aggregate).
    Scale note: fixed-width bucketing is a pure map-side
    expression; the data-DEPENDENT variant (equi-depth) is
    agg_approx's percentile sketch."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / F.lit(50.0)).cast("long")
    return ev.groupBy("event_type", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )




@query(
    "sql_scripting",
    oracle="""
    WITH RECURSIVE probe(t) AS (
      SELECT CAST(1.0 AS DOUBLE)
      UNION ALL
      SELECT t * 2 FROM probe
      WHERE (SELECT count(*) FROM events WHERE value > t) >= 100
    ), final AS (SELECT max(t) AS threshold FROM probe)
    SELECT threshold,
           (SELECT count(*) FROM events
            WHERE value > (SELECT threshold FROM final)) AS cnt
    FROM final
    """,
)
def sql_scripting(spark, sf_dir):
    """Spark 4 SQL SCRIPTING (BEGIN ... END with DECLARE / WHILE /
    SET — SPARK-48338): procedural control flow in pure SQL text,
    here an exponential probe that doubles a threshold until fewer
    than 100 events exceed it, then returns (threshold, count).
    Each loop iteration is a full declarative query (the scan is
    Catalyst-planned; only the scalar loop variable lives in the
    script frame), so the script is driver-side CONTROL FLOW over
    distributed queries — the same division of labor as the
    changefeed runners.  The oracle reproduces the loop with a
    recursive CTE whose recursion condition mirrors the WHILE
    guard; both engines converge on the identical doubling
    sequence because the per-step counts are exact integers."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
    BEGIN
      DECLARE t DOUBLE DEFAULT 1.0;
      WHILE (SELECT count(*) FROM events WHERE value > t) >= 100 DO
        SET t = t * 2;
      END WHILE;
      SELECT t AS threshold,
             (SELECT count(*) FROM events WHERE value > t) AS cnt;
    END
    """)
