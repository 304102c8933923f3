"""Round-5/6 analytics continuation, part 2: sequence/CEP matching,
data-quality monitors (drift PSI, profiles, table diff, freshness),
conversion funnels, weighted medians, connected components, series
interpolation/drawdown, exact mode, layout compaction, and the geo
radius join. Split out of analytics_ext.py in round 7 (VERDICT r6
housekeeping item 9) purely mechanically - registration names,
bodies, and declaration order are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..tmputil import scratch_dir
from . import query
from .analytics_ext import (_GEO_LAT, _GEO_LON, _copurchase_pairs,
                            _sql_haversine)
from ._util import dsum, fan_out

@query(
    "seq_match_recognize",
    oracle="""
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id)
    SELECT user_id,
           length(seq) AS n_events,
           len(regexp_extract_all(seq, 'vc*p')) AS n_matches,
           regexp_extract(seq, 'vc*p') AS first_match
    FROM s
    WHERE len(regexp_extract_all(seq, 'vc*p')) >= 1
    """,
)
def seq_match_recognize(spark, sf_dir):
    """SQL:2016 MATCH_RECOGNIZE analog (Flink/Trino CEP): detect the
    row pattern VIEW CLICK* PURCHASE — contiguous in event order —
    per user timeline. Spark lacks the clause, so the pattern engine
    is regex over a symbolized timeline: one char per event (the
    fixture's five types have distinct initials), string-assembled
    in deterministic (ts, event_id) order via array_sort over
    structs, then regexp_count/extract find non-overlapping
    leftmost matches — the same matching semantics MATCH_RECOGNIZE
    AFTER MATCH SKIP PAST LAST ROW uses. One shuffle (groupBy
    user_id); per-key state is the user's timeline string, the same
    bound every sessionizer here carries. At 100 TB the symbolize+
    aggregate stays map-side partial; regexes evaluate codegen-side
    on the grouped strings — no Python, no window re-shuffle."""
    ev = load_table(spark, sf_dir, "events")
    sym = ev.select(
        "user_id", "ts", "event_id",
        F.substring("event_type", 1, 1).alias("sym"),
    )
    seq = (
        sym.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "sym"))
                    ),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("seq")
        )
    )
    return (
        seq.select(
            "user_id",
            F.length("seq").cast("long").alias("n_events"),
            F.regexp_count(F.col("seq"), F.lit("vc*p"))
            .cast("long").alias("n_matches"),
            F.regexp_extract("seq", "vc*p", 0).alias("first_match"),
        )
        .where(F.col("n_matches") >= 1)
    )


@query(
    "seq_transition_matrix",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    t AS (
      SELECT prev, event_type AS curr, count(*) AS n
      FROM o WHERE prev IS NOT NULL
      GROUP BY prev, event_type),
    tot AS (SELECT prev, sum(n) AS row_n FROM t GROUP BY prev)
    SELECT t.prev, t.curr, t.n,
           FLOOR(CAST(t.n AS DOUBLE) * 1000000.0
                 / CAST(tot.row_n AS DOUBLE) + 0.5) / 1000000.0 AS p
    FROM t JOIN tot ON t.prev = tot.prev
    """,
)
def seq_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    paths (clickstream path analysis): P(next = curr | prev), from
    lag() pairs in deterministic (ts, event_id) order. One window
    shuffle on user_id builds the pairs; the 5x5 count matrix
    crosses a second tiny shuffle; row-normalization is a window
    SUM over the 25-row matrix itself — NOT a groupBy+join back to
    the pair pipeline, which would re-execute the fact scan and
    the user_id window a second time (plan-audited: the join form
    showed 6 exchanges, this one 3, with the fact side scanned
    once). Probabilities quantize via the rational floor-round
    (_util.dround6_div semantics) because n/row_n can land exactly
    on a 6-dp midpoint where the engines' round kernels disagree."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", "event_type",
                  F.lag("event_type").over(w).alias("prev"))
        .where(F.col("prev").isNotNull())
    )
    t = (
        pairs.groupBy(F.col("prev"), F.col("event_type").alias("curr"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_n = F.sum("n").over(Window.partitionBy("prev"))
    return t.select(
        "prev", "curr", "n",
        (F.floor(F.col("n").cast("double") * F.lit(1000000.0)
                 / row_n.cast("double") + F.lit(0.5))
         .cast("double") / F.lit(1000000.0)).alias("p"),
    )


# ----------------------------------------------- distribution drift

@query(
    "dq_drift_psi",
    oracle="""
    WITH longf AS (
      SELECT (ts < TIMESTAMP '2024-01-16') AS is_base,
             'event_type' AS feature, event_type AS bucket
      FROM events
      UNION ALL
      SELECT (ts < TIMESTAMP '2024-01-16') AS is_base,
             'value' AS feature,
             CASE WHEN value IS NULL THEN 'null'
                  ELSE 'b' || CAST(CAST(
                         least(greatest(floor(value / 50.0), 0), 9)
                         AS INTEGER) AS VARCHAR)
             END AS bucket
      FROM events),
    g AS (
      SELECT feature, bucket,
             count(*) FILTER (WHERE is_base) AS n_base,
             count(*) FILTER (WHERE NOT is_base) AS n_cur
      FROM longf GROUP BY feature, bucket),
    p AS (
      SELECT feature, bucket, n_base, n_cur,
             (CAST(n_base AS DOUBLE) + 0.5)
               / (sum(CAST(n_base AS DOUBLE))
                    OVER (PARTITION BY feature)
                  + 0.5 * count(*) OVER (PARTITION BY feature))
               AS p_base,
             (CAST(n_cur AS DOUBLE) + 0.5)
               / (sum(CAST(n_cur AS DOUBLE))
                    OVER (PARTITION BY feature)
                  + 0.5 * count(*) OVER (PARTITION BY feature))
               AS p_cur
      FROM g)
    SELECT feature, bucket, n_base, n_cur,
           FLOOR(p_base * 1000000.0 + 0.5) / 1000000.0 AS p_base6,
           FLOOR(p_cur * 1000000.0 + 0.5) / 1000000.0 AS p_cur6,
           FLOOR((p_cur - p_base) * ln(p_cur / p_base) * 1000000.0
                 + 0.5) / 1000000.0 AS psi_term6
    FROM p
    """,
)
def dq_drift_psi(spark, sf_dir):
    """Population Stability Index drift monitor (the train/serve and
    week-over-week distribution-shift check every production data
    pipeline runs): per-bucket PSI terms of event_type (categorical)
    and value (10 fixed-width bins, both tails capped, NULLs in an
    explicit 'null' bucket) between the first
    15 days (baseline) and the rest (current). ONE fact scan feeds
    both features — each row explodes into its two (feature, bucket)
    assignments map-side, so adding features widens the explode
    array, never re-reads the fact table; one shuffle groups the
    long form; per-feature marginals are window sums over the tiny
    bucket matrix (same no-rejoin shape as seq_transition_matrix).
    Probabilities are Laplace-smoothed (+0.5 per bucket) so a bucket
    empty in one period contributes a finite term instead of ln(0).
    All inputs to ln() are bit-identical rationals in both engines
    (integral counts sum exactly in doubles); each term quantizes
    via the 6-dp floor-round, and (p_cur - p_base) * ln(p_cur /
    p_base) >= 0 termwise, so quantization preserves sign. At 100 TB
    the grouped matrix is |features| x |buckets| rows — driver-tiny
    regardless of fact size."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    # Both tails capped and NULL routed to its own bucket (ADVICE r5):
    # least/greatest skip NULLs in both engines, so an uncapped form
    # would silently count NULL values in the top bucket, and negative
    # values would mint unbounded 'b-1', 'b-2', ... buckets.
    val_bucket = F.when(
        F.col("value").isNull(), F.lit("null")
    ).otherwise(F.concat(
        F.lit("b"),
        F.least(
            F.greatest(F.floor(F.col("value") / F.lit(50.0)), F.lit(0)),
            F.lit(9),
        ).cast("int").cast("string"),
    ))
    long_form = ev.select(
        (F.col("ts") < cut).alias("is_base"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("event_type").alias("feature"),
                    F.col("event_type").alias("bucket"),
                ),
                F.struct(
                    F.lit("value").alias("feature"),
                    val_bucket.alias("bucket"),
                ),
            )
        ).alias("fb"),
    ).select("is_base", "fb.feature", "fb.bucket")
    g = long_form.groupBy("feature", "bucket").agg(
        F.count(F.when(F.col("is_base"), 1)).alias("n_base"),
        F.count(F.when(~F.col("is_base"), 1)).alias("n_cur"),
    )
    wf = Window.partitionBy("feature")
    nb = F.count(F.lit(1)).over(wf)
    p_base = (F.col("n_base").cast("double") + F.lit(0.5)) / (
        F.sum(F.col("n_base").cast("double")).over(wf) + F.lit(0.5) * nb
    )
    p_cur = (F.col("n_cur").cast("double") + F.lit(0.5)) / (
        F.sum(F.col("n_cur").cast("double")).over(wf) + F.lit(0.5) * nb
    )

    def r6(c):
        return (F.floor(c * F.lit(1000000.0) + F.lit(0.5))
                .cast("double") / F.lit(1000000.0))

    return g.select(
        "feature", "bucket", "n_base", "n_cur",
        r6(p_base).alias("p_base6"),
        r6(p_cur).alias("p_cur6"),
        r6((p_cur - p_base) * F.log(p_cur / p_base)).alias("psi_term6"),
    )


@query(
    "dq_profile_columns",
    oracle="""
    WITH a AS (
      SELECT count(*) AS n,
             count(l_orderkey) AS nn_ok,
             count(DISTINCT l_orderkey) AS nd_ok,
             CAST(min(l_orderkey) AS VARCHAR) AS mn_ok,
             CAST(max(l_orderkey) AS VARCHAR) AS mx_ok,
             count(l_quantity) AS nn_qty,
             count(DISTINCT l_quantity) AS nd_qty,
             CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
               AS mn_qty,
             CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
               AS mx_qty,
             count(l_returnflag) AS nn_rf,
             count(DISTINCT l_returnflag) AS nd_rf,
             CAST(min(l_returnflag) AS VARCHAR) AS mn_rf,
             CAST(max(l_returnflag) AS VARCHAR) AS mx_rf,
             count(l_shipdate) AS nn_sd,
             count(DISTINCT l_shipdate) AS nd_sd,
             strftime(min(l_shipdate), '%Y-%m-%d') AS mn_sd,
             strftime(max(l_shipdate), '%Y-%m-%d') AS mx_sd
      FROM lineitem)
    SELECT 'l_orderkey' AS col_name, n,
           n - nn_ok AS n_null, nd_ok AS n_distinct,
           mn_ok AS min_val, mx_ok AS max_val FROM a
    UNION ALL
    SELECT 'l_quantity', n, n - nn_qty, nd_qty, mn_qty, mx_qty FROM a
    UNION ALL
    SELECT 'l_returnflag', n, n - nn_rf, nd_rf, mn_rf, mx_rf FROM a
    UNION ALL
    SELECT 'l_shipdate', n, n - nn_sd, nd_sd, mn_sd, mx_sd FROM a
    """,
)
def dq_profile_columns(spark, sf_dir):
    """ANALYZE-TABLE-style column statistics profile (the catalog
    stats a cost-based optimizer feeds on, and the first screen of
    every data-catalog UI): per column — row count, null count,
    exact distinct count, min, max — for a key, a measure, a
    category, and a date column of the fact table, long-formed as
    one row per column. ONE aggregate pass over ONE scan: the four
    count(DISTINCT)s share a single Expand-based aggregate (each
    distinct column multiplies the expand factor — the documented
    trade for exact profiling; approx_count_distinct drops the
    expand entirely and is the 100 TB default, kept off here so the
    oracle grades exact values). Min/max render as strings so mixed
    column types share one long schema; doubles print through a
    DECIMAL(18,2) cast because the fixture's measures carry 2-dp
    values (FIXTURES.md) — both engines then format identically.
    The stack() long-forming of the single wide row is driver-free
    and scan count stays 1 no matter how many columns join the
    profile."""
    # the count_distincts expand the scan stage 5x before the partial
    # aggregate — fan out when the layout under-splits it (r13): the
    # exchange moves the raw 4 profiled columns, the x5 EXPAND and
    # the dedup hash tables then build on every core
    li = fan_out(load_table(spark, sf_dir, "lineitem"),
                 "l_orderkey", "l_linenumber")
    wide = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_orderkey").alias("nn_ok"),
        F.count_distinct(F.col("l_orderkey")).alias("nd_ok"),
        F.min("l_orderkey").cast("string").alias("mn_ok"),
        F.max("l_orderkey").cast("string").alias("mx_ok"),
        F.count("l_quantity").alias("nn_qty"),
        F.count_distinct(F.col("l_quantity")).alias("nd_qty"),
        F.min("l_quantity").cast("decimal(18,2)").cast("string")
        .alias("mn_qty"),
        F.max("l_quantity").cast("decimal(18,2)").cast("string")
        .alias("mx_qty"),
        F.count("l_returnflag").alias("nn_rf"),
        F.count_distinct(F.col("l_returnflag")).alias("nd_rf"),
        F.min("l_returnflag").cast("string").alias("mn_rf"),
        F.max("l_returnflag").cast("string").alias("mx_rf"),
        F.count("l_shipdate").alias("nn_sd"),
        F.count_distinct(F.col("l_shipdate")).alias("nd_sd"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("mn_sd"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("mx_sd"),
    )
    stack = ", ".join(
        f"'{col}', n - nn_{s}, nd_{s}, mn_{s}, mx_{s}"
        for col, s in [
            ("l_orderkey", "ok"), ("l_quantity", "qty"),
            ("l_returnflag", "rf"), ("l_shipdate", "sd"),
        ]
    )
    return wide.selectExpr(
        "n",
        f"stack(4, {stack})"
        " AS (col_name, n_null, n_distinct, min_val, max_val)",
    ).select("col_name", "n", "n_null", "n_distinct",
             "min_val", "max_val")


@query(
    "dq_table_diff",
    oracle="""
    WITH v AS (
      SELECT user_id,
             count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-16')
               AS cnt_v1,
             count(*) AS cnt_v2,
             CAST(sum(CAST(value AS DECIMAL(18,6)))
                  FILTER (WHERE ts < TIMESTAMP '2024-01-16')
                  AS DOUBLE) AS sum_v1,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_v2
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id)
    SELECT user_id,
           CASE WHEN cnt_v1 = 0 THEN 'added'
                ELSE 'modified' END AS change_type,
           cnt_v1, cnt_v2,
           coalesce(sum_v1, 0.0) AS sum_v1, sum_v2
    FROM v
    WHERE cnt_v1 <> cnt_v2
    """,
)
def dq_table_diff(spark, sf_dir):
    """Keyed table diff between two versions of a materialized state
    (the data-reconciliation op behind migration validation and
    backfill audits): per-user purchase count/revenue as of day 15
    (v1) vs the full window (v2), emitting only keys that changed,
    classified added (absent from v1) or modified. The general form
    is a full outer join of two snapshots on key comparing row
    hashes; here both versions derive from ONE source, so the diff
    fuses into a single scan with FILTERed conditional aggregates —
    half the I/O and no join at all, the shape to prefer whenever
    the old version is reconstructible by predicate (time travel,
    as-of filters). Sums route through exact DECIMAL (FIXTURES.md
    determinism rule); 'removed' cannot occur under a append-only
    source and the CASE documents that contract."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase")
    cut = F.lit("2024-01-16").cast("timestamp")
    in_v1 = F.col("ts") < cut
    v = ev.groupBy("user_id").agg(
        F.count(F.when(in_v1, 1)).alias("cnt_v1"),
        F.count(F.lit(1)).alias("cnt_v2"),
        F.sum(F.when(in_v1, F.col("value")).cast(
            "decimal(18,6)")).cast("double").alias("sum_v1"),
        dsum("value").alias("sum_v2"),
    )
    return (
        v.where(F.col("cnt_v1") != F.col("cnt_v2"))
        .select(
            "user_id",
            F.when(F.col("cnt_v1") == 0, "added")
            .otherwise("modified").alias("change_type"),
            "cnt_v1", "cnt_v2",
            F.coalesce("sum_v1", F.lit(0.0)).alias("sum_v1"),
            "sum_v2",
        )
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT e.user_id,
             epoch_us(min(e.ts)) - epoch_us(any_value(v.v_ts))
               AS latency_us
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
      GROUP BY e.user_id)
    SELECT CASE WHEN latency_us < 3600000000 THEN 'lt_1h'
                WHEN latency_us < 21600000000 THEN 'lt_6h'
                WHEN latency_us < 86400000000 THEN 'lt_24h'
                ELSE 'ge_24h' END AS bucket,
           count(*) AS n_users,
           FLOOR(CAST(sum(latency_us) AS DOUBLE) * 1000000.0
                 / (CAST(count(*) AS DOUBLE) * 1000000.0) + 0.5)
             / 1000000.0 AS avg_latency_s
    FROM p
    GROUP BY 1
    """,
)
def funnel_time_to_convert(spark, sf_dir):
    """Conversion-latency distribution (the time-to-convert report
    every product-analytics stack pairs with its funnel): seconds
    from a user's FIRST view to their first purchase at-or-after
    it, bucketed into latency bands with per-band mean. One window
    shuffle on user_id computes the first-view timestamp alongside
    each event; the purchase-side min then groups on the SAME key,
    so Catalyst reuses the partitioning instead of exchanging again
    (the join-back form the oracle uses would rescan the fact
    table). Latencies live as exact microsecond integers until the
    single display division, which floor-rounds (the mean of exact
    integers over a count is the rational-midpoint class —
    _util.dround6_div semantics). Funnel_conversion grades WHO
    converts; this grades HOW FAST — the pairing dashboards need.
    """
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id")
    v_ts = F.min(F.when(F.col("event_type") == "view",
                        F.col("ts"))).over(w_all)
    lat = (
        ev.select("user_id", "ts", "event_type", v_ts.alias("v_ts"))
        .where((F.col("event_type") == "purchase")
               & F.col("v_ts").isNotNull()
               & (F.col("ts") >= F.col("v_ts")))
        .groupBy("user_id")
        .agg((F.unix_micros(F.min("ts"))
              - F.unix_micros(F.any_value("v_ts"))).alias("latency_us"))
    )
    bucket = (
        F.when(F.col("latency_us") < 3600000000, "lt_1h")
        .when(F.col("latency_us") < 21600000000, "lt_6h")
        .when(F.col("latency_us") < 86400000000, "lt_24h")
        .otherwise("ge_24h")
    )
    return (
        lat.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            (F.floor(F.sum("latency_us").cast("double") * F.lit(1000000.0)
                     / (F.count(F.lit(1)).cast("double")
                        * F.lit(1000000.0)) + F.lit(0.5))
             .cast("double") / F.lit(1000000.0)).alias("avg_latency_s"),
        )
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             l_extendedprice AS price,
             sum(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                     ROWS UNBOUNDED PRECEDING) AS cumw,
             sum(CAST(l_quantity AS BIGINT))
               OVER (PARTITION BY l_returnflag) AS w
      FROM lineitem)
    SELECT l_returnflag,
           CAST(any_value(w) AS BIGINT) AS total_qty,
           min(CASE WHEN 2 * cumw >= w THEN price END)
             AS wmedian_price
    FROM c GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark, sf_dir):
    """Exact weighted median (ClickHouse quantileExactWeighted /
    Postgres percentile ordered-set with weights): the smallest
    l_extendedprice whose cumulative l_quantity weight reaches half
    the group total — the price at which half the shipped QUANTITY
    is cheaper, which an unweighted median cannot express. One
    window shuffle builds the cumulative weights (weights stay
    exact BIGINTs — the fixture's quantities are integral,
    FIXTURES.md); the extraction aggregate groups on the SAME key
    so the partitioning is reused. Price ties are safe: whichever
    tied row crosses the half-total first, the crossing PRICE is
    identical, so the result does not depend on intra-tie order.
    At 100 TB the exact form sorts each group once (the window
    sort); the sketch path is approx_percentile over
    weight-expanded values or a t-digest with weighted inserts —
    same extraction rule."""
    li = load_table(spark, sf_dir, "lineitem")
    wq = F.col("l_quantity").cast("long")
    wcum = (
        Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("l_returnflag")
    c = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.sum(wq).over(wcum).alias("cumw"),
        F.sum(wq).over(wall).alias("w"),
    )
    return c.groupBy("l_returnflag").agg(
        F.any_value("w").alias("total_qty"),
        F.min(F.when(2 * F.col("cumw") >= F.col("w"),
                     F.col("price"))).alias("wmedian_price"),
    )


# ------------------------------------------------ round-6 additions


@query(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE li AS (SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 4 = 0),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    edges AS (
      SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    walk AS (
      SELECT node, node AS label FROM nodes
      UNION
      SELECT e.v AS node, w.label
      FROM walk w JOIN edges e ON e.u = w.node
      WHERE w.label < e.v)
    SELECT node, min(label) AS component FROM walk GROUP BY node
    """,
)
def graph_connected_components(spark, sf_dir):
    """Connected components by HASH-MIN label propagation over the
    co-purchase graph (the dedup-cluster primitive at graph scale —
    llm_semantic_dedup_cluster's transitive closure is this same
    algorithm on LSH candidate edges): every node starts labelled
    with itself; each round a node adopts the minimum label among
    itself and its neighbours; at fixpoint the label is the
    component's minimum node id. Each round is ONE shuffle (edges
    join labels on the source endpoint, groupBy the destination
    takes the min) — the Pregel message pattern expressed as
    DataFrame ops; rounds = graph diameter (co-purchase graphs are
    shallow: hubs collapse distances). Labels persist per round and
    unpersist after the next round materializes; the driver holds
    ONE boolean per round (did any label shrink — an aggregate, not
    rows). The DuckDB oracle reconstructs components via a recursive
    reachability CTE and takes min(reachable label) — a different
    algorithm agreeing on the same fixpoint, which is the strongest
    cross-check the differential harness can express (its
    `w.label < e.v` prune is sound: the component minimum is smaller
    than every other member, so it passes every hop and still
    reaches all of them). At 100 TB,
    hash-min converges in O(diameter) shuffles; the alternating
    large-star/small-star variant (Kiveris et al.) halves rounds on
    skewed graphs — same plan shape, noted not needed at this
    diameter."""
    from pyspark import StorageLevel

    pairs = _copurchase_pairs(spark, sf_dir)
    edges = (
        pairs.select("u", "v")
        .unionAll(pairs.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    while True:
        neighbor_min = (
            edges.join(labels, edges.u == labels.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # change detection rides the SAME join that updates labels —
        # one shuffle round-trip per iteration, not two
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce("nbr_label", F.col("label")),
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label"))
                 < F.col("label")).alias("changed"),
            )
        )
        # localCheckpoint materializes the round AND truncates the
        # lineage: without it each round's plan references the
        # previous round twice (labels feeds both the neighbor join
        # and the update join), so the analyzed plan doubles per
        # iteration — ~25k exchange nodes in the final plan TEXT by
        # convergence (plan_audit round 6), a planning-time bomb even
        # though execution reuses the cache. With the checkpoint the
        # returned DataFrame's plan is one scan of the final labels.
        new_labels = new_labels.localCheckpoint()
        # one aggregated boolean crosses the driver per round
        shrank = new_labels.where("changed").limit(1).count()
        labels.unpersist()
        labels = new_labels
        if not shrank:
            break
    # final labels are checkpointed (the last shrink count ran on
    # them), so the edge cache can be released for repeat gradings
    edges.unpersist()
    return labels.select("node", F.col("label").alias("component"))


@query(
    "ts_interpolate",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1),
    holes AS (
      SELECT d,
             CASE WHEN day(d) % 7 = 2 THEN NULL ELSE v END AS v,
             v AS v_true
      FROM daily),
    anch AS (
      SELECT d, v, v_true,
             last_value(v IGNORE NULLS) OVER
               (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS v_prev,
             last_value(CASE WHEN v IS NOT NULL THEN d END
                        IGNORE NULLS) OVER
               (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS d_prev,
             first_value(v IGNORE NULLS) OVER
               (ORDER BY d ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS v_next,
             first_value(CASE WHEN v IS NOT NULL THEN d END
                         IGNORE NULLS) OVER
               (ORDER BY d ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS d_next
      FROM holes)
    SELECT strftime(d, '%Y-%m-%d') AS day, v_true,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN v_prev IS NULL THEN v_next
             WHEN v_next IS NULL THEN v_prev
             ELSE v_prev + (v_next - v_prev)
                  * (CAST(date_diff('day', d_prev, d) AS DOUBLE)
                     / CAST(date_diff('day', d_prev, d_next) AS DOUBLE))
           END AS v_filled,
           (v IS NULL) AS was_missing
    FROM anch
    """,
)
def ts_interpolate(spark, sf_dir):
    """Linear interpolation of gaps in a daily series — the
    time-series repair step between gapfill (which inserts the
    missing ROWS) and modeling (which needs values on every row):
    a deterministic hole pattern (day-of-month % 7 == 2 — engine-
    neutral, unlike dayofweek whose Sunday index differs between
    Spark and DuckDB) is repaired by anchoring each hole
    to its nearest non-null neighbours on both sides (IGNORE NULLS
    frame navigation, ONE sort within the window — no self-join
    per hole) and lerping by calendar distance. Interior math is
    pure IEEE doubles of exact decimal day-sums and integer day
    distances written identically in both engines, so the hash
    matches without quantization. Edge holes degrade to the only
    available anchor. At 100 TB the window is per-series
    (partitionBy the series key at real scale — the fixture has
    one series, the degenerate single-partition case the WARN
    flags and docs/SCALE.md covers)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        dsum(F.col("value")).alias("v_true"))
    holes = daily.select(
        "d", "v_true",
        F.when(F.dayofmonth("d") % 7 == 2, F.lit(None).cast("double"))
        .otherwise(F.col("v_true")).alias("v"),
    )
    w_prev = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    w_next = Window.orderBy("d").rowsBetween(
        Window.currentRow, Window.unboundedFollowing)
    d_if = F.when(F.col("v").isNotNull(), F.col("d"))
    anch = holes.select(
        "d", "v", "v_true",
        F.last("v", ignorenulls=True).over(w_prev).alias("v_prev"),
        F.last(d_if, ignorenulls=True).over(w_prev).alias("d_prev"),
        F.first("v", ignorenulls=True).over(w_next).alias("v_next"),
        F.first(d_if, ignorenulls=True).over(w_next).alias("d_next"),
    )
    frac = (F.datediff(F.col("d"), F.col("d_prev")).cast("double")
            / F.datediff(F.col("d_next"), F.col("d_prev"))
            .cast("double"))
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("v_prev").isNull(), F.col("v_next"))
        .when(F.col("v_next").isNull(), F.col("v_prev"))
        .otherwise(F.col("v_prev")
                   + (F.col("v_next") - F.col("v_prev")) * frac)
    )
    return anch.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "v_true",
        filled.alias("v_filled"),
        F.col("v").isNull().alias("was_missing"),
    )


@query(
    "ts_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
      FROM events GROUP BY 1),
    cum AS (
      SELECT d, v,
             CAST(sum(CAST(v AS DECIMAL(18,6))) OVER
               (ORDER BY d ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               AS equity
      FROM daily),
    peaks AS (
      SELECT d, v, equity,
             max(equity) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               AS peak
      FROM cum)
    SELECT strftime(d, '%Y-%m-%d') AS day, equity, peak,
           FLOOR((peak - equity) / peak * 1000000.0 + 0.5)
             / 1000000.0 AS drawdown6
    FROM peaks
    """,
)
def ts_drawdown(spark, sf_dir):
    """Running-peak drawdown of the cumulative daily series — the
    underwater curve (max drawdown, time-under-water) every
    risk/monitoring stack computes, and the canonical prefix-max
    window shape: cumulative sum in exact DECIMAL (floating prefix
    sums would drift between engines after hundreds of adds), a
    running max over it, and one relative-loss division per row,
    floor-quantized to 6 dp (the rational-midpoint class). TWO
    stacked unbounded-preceding windows over one sort — Catalyst
    fuses both into a single WindowExec, no second exchange
    (single-series fixture; partitionBy the instrument key at real
    scale)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        dsum(F.col("value")).alias("v"))
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = daily.select(
        "d", "v",
        F.sum(F.col("v").cast("decimal(18,6)")).over(w)
        .cast("double").alias("equity"),
    )
    peaks = cum.select(
        "d", "equity",
        F.max("equity").over(w).alias("peak"),
    )
    dd6 = (F.floor((F.col("peak") - F.col("equity")) / F.col("peak")
                   * F.lit(1000000.0) + F.lit(0.5))
           .cast("double") / F.lit(1000000.0))
    return peaks.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "equity", "peak", dd6.alias("drawdown6"),
    )


@query(
    "dq_freshness",
    oracle="""
    WITH per AS (
      SELECT event_type,
             max(ts) AS last_seen,
             count(*) AS n_events
      FROM events GROUP BY event_type),
    g AS (SELECT max(ts) AS global_max FROM events)
    SELECT event_type, last_seen, n_events,
           epoch_us(g.global_max) - epoch_us(last_seen) AS lag_us,
           (epoch_us(g.global_max) - epoch_us(last_seen)
              > 3600000000) AS is_stale
    FROM per, g
    """,
)
def dq_freshness(spark, sf_dir):
    """Per-source freshness monitor — the first data-quality page a
    pipeline on-call opens (is any feed lagging the high-water
    mark?): per event_type last-seen timestamp and its lag behind
    the global maximum, flagged stale past a 1-hour SLO. Lags are
    exact microsecond integers (unix_micros / epoch_us — the proven
    cross-engine pair), never floats. ONE scan serves both the
    per-type aggregates and the global max (the global high-water
    mark re-aggregates the 5-row per-type table rather than
    rescanning the fact); the broadcast of the one-row global is
    free. At 100 TB this is the aggregate-of-aggregate shape:
    per-partition maxes combine map-side, the monitor table stays
    |sources| rows."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_events"),
    )
    g = per.agg(F.max("last_seen").alias("global_max"))
    lag = (F.unix_micros(F.col("global_max"))
           - F.unix_micros(F.col("last_seen")))
    return per.join(F.broadcast(g)).select(
        "event_type", "last_seen", "n_events",
        lag.alias("lag_us"),
        (lag > 3600000000).alias("is_stale"),
    )


@query(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity, count(*) AS n
      FROM lineitem GROUP BY 1, 2),
    r AS (
      SELECT l_returnflag, l_quantity, n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, l_quantity) AS rk
      FROM c)
    SELECT l_returnflag,
           CAST(l_quantity AS DOUBLE) AS mode_qty,
           n AS mode_n
    FROM r WHERE rk = 1
    """,
)
def agg_mode(spark, sf_dir):
    """Exact MODE per group with a DETERMINISTIC tie-break — Spark 3.4
    grew a mode() aggregate, but its tie behavior is arbitrary
    (whichever value the hash map yields first), which a differential
    harness cannot grade and a reproducible pipeline should not ship.
    This is the canonical determinized form: count per (group, value)
    — ONE hash aggregate with map-side combine, the count table is
    |groups| x |distinct values| — then a row_number window ordered
    (count DESC, value ASC) takes the winner. WindowGroupLimit pushes
    the rk=1 cut into the shuffle (the win_topk_per_group machinery),
    so the window never materializes full per-group rankings. At
    100 TB the only full-data pass is the first aggregate; the window
    runs on the tiny count table."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("double").alias("mode_qty"),
            F.col("n").alias("mode_n"),
        )
    )


_COMPACT_SMALL = 64
_COMPACT_TARGET = 4


@query(
    "layout_compaction",
    oracle=f"""
    WITH agg AS (
      SELECT count(*) AS n_rows,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS sum_value
      FROM events)
    SELECT 'small' AS phase, {_COMPACT_SMALL} AS n_files,
           n_rows, sum_value FROM agg
    UNION ALL
    SELECT 'compacted', {_COMPACT_TARGET}, n_rows, sum_value FROM agg
    """,
)
def layout_compaction(spark, sf_dir):
    """SMALL-FILE COMPACTION — the maintenance job every streaming
    lake needs (the partitioned streaming sink's docstring names the
    problem: files multiply by tasks x partitions x batches; a
    100 TB table of 4 MB files destroys scan throughput via open/
    footer overhead and makes NameNode/listing the bottleneck). The
    run materializes the pathological layout (64 shards), compacts
    by rewriting through repartition({_COMPACT_TARGET}) — at real
    scale the target count comes from bytes/target_file_size and
    the rewrite goes partition-by-partition so compaction never
    holds the whole table — and grades BOTH layouts' file counts
    and full-table checksums: compaction must change file topology
    and nothing else. The shard constants are shared verbatim with
    the oracle SQL (the minhash-constant pattern)."""
    import os

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "value")
    small = scratch_dir(prefix="dbrcf-compact-small-")
    packed = scratch_dir(prefix="dbrcf-compact-packed-")
    ev.repartition(_COMPACT_SMALL).write.mode("overwrite").parquet(
        small)
    (
        spark.read.parquet(small)
        .repartition(_COMPACT_TARGET)
        .write.mode("overwrite").parquet(packed)
    )

    def profile(d, phase):
        n_files = sum(
            1 for f in os.listdir(d) if f.endswith(".parquet"))
        return (
            spark.read.parquet(d)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 dsum(F.col("value")).alias("sum_value"))
            .select(F.lit(phase).alias("phase"),
                    F.lit(n_files).alias("n_files"),
                    "n_rows", "sum_value")
        )
    return profile(small, "small").unionByName(
        profile(packed, "compacted"))


_GEO_HLAT = "(CAST((n_nationkey * 61) % 160 AS DOUBLE) - 80.0 + 0.5)"
_GEO_HLON = "(CAST((n_nationkey * 131) % 360 AS DOUBLE) - 180.0 + 0.5)"
_GEO_RADIUS_KM = 1500.0


@query(
    "geo_join_radius",
    oracle=f"""
    WITH pts AS (
      SELECT DISTINCT user_id,
             {_GEO_LAT} AS lat, {_GEO_LON} AS lon
      FROM events),
    hubs AS (
      SELECT n_nationkey AS hub_id,
             {_GEO_HLAT} AS hlat, {_GEO_HLON} AS hlon
      FROM nation),
    d AS (
      SELECT user_id, hub_id,
             {_sql_haversine('lat', 'lon', 'hlat', 'hlon')} AS dist_km
      FROM pts, hubs)
    SELECT user_id, hub_id, round(dist_km, 6) AS dist_km
    FROM d WHERE dist_km <= {_GEO_RADIUS_KM}
    """,
)
def geo_join_radius(spark, sf_dir):
    """GRID-BUCKETED RADIUS JOIN — geo_nearest's docstring names the
    scale path ("a geohash/S2 cell grid turns the all-points scan
    into a ring search"); this operator IS that path, graded against
    the brute-force cross-join oracle so the pruning is PROVEN
    lossless: every (user, hub) pair within R km. Users land in one
    grid cell (cell height R/111 deg latitude; width widened by
    1/cos(80 deg) — the worst meridian convergence the fixture's
    |lat| < 80 allows — so adjacency never under-reaches); hubs
    EXPLODE to their 3x3 neighbor cells plus ANTIMERIDIAN GHOSTS
    (lon +/- 360 replicas near the seam — haversine is periodic in
    longitude, so ghost distances are exact); candidates meet on a
    cell equi-join and the exact haversine keeps only true hits.
    At 100 TB the candidate volume is |pairs within ~3 cells|, not
    |users| x |hubs| — the same bucket-then-verify shape as
    llm_knn_lsh, with geometry supplying the correctness proof the
    test asserts against brute force."""
    import math

    ev = load_table(spark, sf_dir, "events")
    nat = load_table(spark, sf_dir, "nation")
    pts = ev.selectExpr(
        "user_id", f"{_GEO_LAT} AS lat", f"{_GEO_LON} AS lon"
    ).distinct()
    hubs = nat.selectExpr(
        "n_nationkey AS hub_id",
        f"{_GEO_HLAT} AS hlat", f"{_GEO_HLON} AS hlon",
    )
    cell_lat = _GEO_RADIUS_KM / 111.0
    cell_lon = cell_lat / math.cos(math.radians(80.0))
    p = pts.select(
        "user_id", "lat", "lon",
        F.floor(F.col("lat") / cell_lat).alias("clat"),
        F.floor(F.col("lon") / cell_lon).alias("clon"),
    )
    # ghost replicas so pairs straddling the +/-180 seam share cells
    h = hubs.select(
        "hub_id", "hlat",
        F.explode(F.array(
            F.col("hlon"),
            F.col("hlon") + 360.0,
            F.col("hlon") - 360.0,
        )).alias("hlon"),
    ).where((F.col("hlon") > -180.0 - 2 * cell_lon)
            & (F.col("hlon") < 180.0 + 2 * cell_lon))
    h = h.select(
        "hub_id", "hlat", "hlon",
        F.explode(F.sequence(
            F.floor(F.col("hlat") / cell_lat) - 1,
            F.floor(F.col("hlat") / cell_lat) + 1,
        )).alias("clat"),
    ).select(
        "hub_id", "hlat", "hlon", "clat",
        F.explode(F.sequence(
            F.floor(F.col("hlon") / cell_lon) - 1,
            F.floor(F.col("hlon") / cell_lon) + 1,
        )).alias("clon"),
    )
    cand = p.join(h, ["clat", "clon"])
    dist = F.expr(_sql_haversine("lat", "lon", "hlat", "hlon"))
    return (
        cand.select("user_id", "hub_id",
                    F.round(dist, 6).alias("dist_km"))
        .where(F.col("dist_km") <= _GEO_RADIUS_KM)
        .distinct()
    )
