"""Round-7 third wave: the last missing TPC-H shape (Q1), a
Benford-law data-quality audit, the Gopher repetition/composition
quality gate, and two RethinkDB changefeed API surfaces that were
still uncovered — changes(include_states=True) and
orderBy.limit.changes(include_offsets=True).

Registered AFTER every earlier module (grading-rotation discipline:
new names slot behind the 72 still-certifying round-7 names so they
never displace pending queries from the official grading budget).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import davg, dsum, fan_out, sql_davg, sql_dsum

# ------------------------------------------------------------ tpch_q1


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')}
             AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) '
                     '* (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """TPC-H Q1 (pricing summary report) — THE canonical scan-heavy
    aggregate, completing the adapted q1–q22 family (q2–q22 landed
    rounds 2–5). One wide scan, the date predicate pushed to the
    parquet reader, then a 4-group hash aggregate: partial (map-side)
    aggregation does virtually all the work, the shuffle moves only
    |groups| x |partials| rows, and every arithmetic expression stays
    inside whole-stage codegen. The eight fp aggregates route through
    DECIMAL(18,6) (queries/_util.py rationale) so the hash is
    order-insensitive in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # eight decimal partial-aggregates fuse into the scan stage; fan
    # out when the layout under-splits it (r13, agg_groupby rationale)
    li = fan_out(
        li.where(F.col("l_shipdate")
                 <= F.lit("1998-09-02").cast("timestamp")),
        "l_orderkey", "l_linenumber")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------- dq_benford

#: exact first-significant-digit extraction for o_totalprice's known
#: [1e3, 5e5) range: a comparison ladder on IEEE doubles (no log10 —
#: its ulp behavior at power-of-ten boundaries is libm-specific).
_DIGIT_LADDER = """
    CASE WHEN {v} >= 100000 THEN CAST(floor({v} / 100000) AS BIGINT)
         WHEN {v} >= 10000  THEN CAST(floor({v} / 10000) AS BIGINT)
         ELSE                    CAST(floor({v} / 1000) AS BIGINT)
    END
"""


@query(
    "dq_benford",
    oracle=f"""
    WITH d AS (
      SELECT {_DIGIT_LADDER.format(v='o_totalprice')} AS digit
      FROM orders
    ), c AS (
      SELECT digit, count(*) AS n FROM d GROUP BY digit
    ), t AS (SELECT sum(n) AS total FROM c)
    SELECT digit, n,
           CAST(n AS DOUBLE) / (SELECT total FROM t) AS observed,
           log10(1.0 + 1.0 / digit) AS expected,
           abs(CAST(n AS DOUBLE) / (SELECT total FROM t)
               - log10(1.0 + 1.0 / digit)) AS abs_dev
    FROM c
    """,
)
def dq_benford(spark, sf_dir):
    """Benford's-law first-digit audit on order totals — the classic
    fraud/anomaly screen a warehouse DQ suite runs on monetary
    columns: observed first-significant-digit frequency vs the
    Benford expectation log10(1+1/d), with the absolute deviation per
    digit (the inputs to a chi-square or MAD test). Digit extraction
    is an exact comparison ladder over the column's known magnitude
    range — no log10 on data values, whose libm ulp at power-of-ten
    boundaries differs across engines. One scan, a 9-group partial
    aggregate, and a broadcast of the single total row: O(1) driver
    state at any corpus size."""
    o = load_table(spark, sf_dir, "orders")
    v = F.col("o_totalprice")
    digit = (
        F.when(v >= 100000, F.floor(v / 100000))
        .when(v >= 10000, F.floor(v / 10000))
        .otherwise(F.floor(v / 1000))
    ).cast("long")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n"))
    total = c.agg(F.sum("n").alias("total"))
    observed = F.col("n").cast("double") / F.col("total")
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(total))
        .select(
            "digit", "n",
            observed.alias("observed"),
            expected.alias("expected"),
            F.abs(observed - expected).alias("abs_dev"),
        )
    )


# -------------------------------------------------- llm_quality_gopher

_STOPWORDS = ["the", "a", "and", "of", "to", "in", "that", "with"]


@query(
    "llm_quality_gopher",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, n_chars, string_split(text, ' ') AS w
      FROM documents
    ), b AS (
      SELECT doc_id, n_chars,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(len(list_intersect(list_distinct(w),
                  [{', '.join("'" + s + "'" for s in _STOPWORDS)}]))
               AS BIGINT) AS n_stop,
             list_transform(range(1, len(w)),
                            i -> w[i] || ' ' || w[i + 1]) AS bg
      FROM t
    ), e AS (
      SELECT doc_id, unnest(bg) AS g FROM b
    ), c AS (
      SELECT doc_id, g, count(*) AS cnt FROM e GROUP BY doc_id, g
    ), r AS (
      SELECT doc_id, g, cnt,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, g ASC) AS rn
      FROM c
    )
    SELECT b.doc_id, b.n_words,
           CAST(b.n_chars - (b.n_words - 1) AS DOUBLE) / b.n_words
             AS mean_word_len,
           b.n_stop,
           r.g AS top_bigram,
           CAST(r.cnt AS DOUBLE) / (b.n_words - 1) AS top_bigram_frac,
           CAST(CASE WHEN b.n_words >= 10
                      AND CAST(b.n_chars - (b.n_words - 1) AS DOUBLE)
                          / b.n_words BETWEEN 3 AND 10
                      AND b.n_stop >= 1
                      AND CAST(r.cnt AS DOUBLE) / (b.n_words - 1)
                          <= 0.2
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM b JOIN r ON b.doc_id = r.doc_id AND r.rn = 1
    """,
)
def llm_quality_gopher(spark, sf_dir):
    """The Gopher quality-rule gate (Rae et al. 2021, public) adapted
    to the rules that BIND on this corpus: word-count floor, mean
    word length in [3,10], stopword presence, and the REPETITION
    rule — the fraction of the document covered by its most frequent
    2-gram (Gopher's 'fraction of characters in most common n-gram',
    here as a bigram fraction since the fixture is single-space
    tokenized). The bigram mode is explode -> per-(doc, gram) count
    -> per-doc window cut (partitioned BY DOC — thousands of
    independent partitions, never a global sort), with (count DESC,
    gram ASC) making the tie-break deterministic in both engines.
    mean_word_len = (n_chars - (n_words-1)) / n_words is exact:
    single IEEE division of integers. At 100 TB this is one corpus
    scan, one shuffle on (doc_id, gram), one on doc_id — all keys
    high-cardinality and skew-free."""
    # split/intersect/bigram-transform run per-row in the scan stage;
    # fan out when the layout under-splits it (r13, llm._rebalanced
    # rationale — same corpus, same hot spot)
    d = fan_out(load_table(spark, sf_dir, "documents"), "doc_id")
    w = F.split("text", " ")
    base = d.select(
        "doc_id", "n_chars", w.alias("w"),
        F.size(w).alias("n_words"),
        F.size(F.array_intersect(
            F.array_distinct(w),
            F.array(*[F.lit(s) for s in _STOPWORDS]),
        )).cast("long").alias("n_stop"),
    )
    bigrams = base.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, size(w) - 1),"
            " i -> concat(element_at(w, i), ' ',"
            " element_at(w, i + 1)))")).alias("g"),
    )
    counts = bigrams.groupBy("doc_id", "g").agg(
        F.count(F.lit(1)).alias("cnt"))
    win = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("g").asc())
    top = (
        counts.withColumn("rn", F.row_number().over(win))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("g").alias("top_bigram"), "cnt")
    )
    mean_len = (
        (F.col("n_chars") - (F.col("n_words") - 1)).cast("double")
        / F.col("n_words")
    )
    frac = F.col("cnt").cast("double") / (F.col("n_words") - 1)
    keep = (
        (F.col("n_words") >= 10)
        & mean_len.between(3, 10)
        & (F.col("n_stop") >= 1)
        & (frac <= 0.2)
    ).cast("long")
    return (
        base.drop("w")
        .join(top, "doc_id")
        .select(
            "doc_id", F.col("n_words").cast("long").alias("n_words"),
            mean_len.alias("mean_word_len"),
            "n_stop", "top_bigram",
            frac.alias("top_bigram_frac"),
            keep.alias("keep"),
        )
    )

# ----------------------------------- changefeed_include_states / offsets

from ..streaming.replay import default_chunks as _default_chunks  # noqa: E402

_NB7C = _default_chunks()
_BOOT_K = _NB7C // 2


def _include_states_oracle() -> str:
    return f"""
    WITH numbered AS (
      SELECT event_type, value,
             row_number() OVER (ORDER BY event_id) - 1 AS rn,
             count(*) OVER () AS n
      FROM events
    ), chunked AS (
      SELECT event_type, value,
             CAST(floor(rn / ceil(n / {_NB7C}.0)) AS BIGINT)
               AS batch_id
      FROM numbered
    ), per AS (
      SELECT event_type, batch_id,
             count(*) AS d_cnt,
             sum(CAST(value AS DECIMAL(18,6))) AS d_sum
      FROM chunked GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, batch_id,
             CAST(sum(d_cnt) OVER w AS BIGINT) AS new_count,
             CAST(sum(d_sum) OVER w AS DOUBLE) AS new_sum
      FROM per
      WINDOW w AS (PARTITION BY event_type ORDER BY batch_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(0 AS BIGINT) AS seq, 'state' AS kind,
           'initializing' AS event_type,
           CAST(NULL AS BIGINT) AS batch_id,
           CAST(NULL AS BIGINT) AS cnt,
           CAST(NULL AS DOUBLE) AS sum_value
    UNION ALL
    SELECT 1, 'initial', event_type, NULL,
           count(*),
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
    FROM chunked WHERE batch_id <= {_BOOT_K} GROUP BY event_type
    UNION ALL
    SELECT 2, 'state', 'ready', NULL, NULL, NULL
    UNION ALL
    SELECT 3, 'change', event_type, batch_id, new_count, new_sum
    FROM cum WHERE batch_id > {_BOOT_K}
    """


@query("changefeed_include_states", oracle=_include_states_oracle())
def changefeed_include_states(spark, sf_dir):
    """RethinkDB changes(include_initial=True, include_states=True):
    the feed wire protocol a resuming client actually consumes — a
    {state: 'initializing'} doc, then the INITIAL results (the MVCC
    snapshot at the subscription batch, served without blocking
    writers), then {state: 'ready'}, then the live deltas past the
    snapshot point. The whole sequence is graded: seq encodes the
    protocol phase, so a state doc out of order, an initial row
    leaking from past the snapshot, or a delta replayed from before
    it (the bootstrap double-count seam) each breaks the hash.
    Initial rows come from the keyed MVCC store's version-k read
    (O(|groups|)); the tail is the delta log PAST k — the engine
    never re-scans history to serve the phases."""
    from ..streaming.queries import _changefeed

    runner = _changefeed(spark, sf_dir)
    out_ddl = ("seq long, kind string, event_type string, "
               "batch_id long, cnt long, sum_value double")
    states = spark.createDataFrame(
        [(0, "state", "initializing", None, None, None),
         (2, "state", "ready", None, None, None)], out_ddl)
    initial = runner.state_at(_BOOT_K).select(
        F.lit(1).cast("long").alias("seq"),
        F.lit("initial").alias("kind"),
        "event_type",
        F.lit(None).cast("long").alias("batch_id"),
        F.col("cnt").cast("long").alias("cnt"),
        F.col("sum_value"),
    )
    changes = runner.log().where(F.col("batch_id") > _BOOT_K).select(
        F.lit(3).cast("long").alias("seq"),
        F.lit("change").alias("kind"),
        "event_type",
        "batch_id",
        F.col("new_count").cast("long").alias("cnt"),
        F.col("new_sum").alias("sum_value"),
    )
    return states.unionByName(initial).unionByName(changes)


def _topk_offsets_oracle() -> str:
    from ..streaming.view_queries import _VIS_CTE

    return _VIS_CTE + """
    , ranked AS (
      SELECT batch_id, user_id, value, event_id,
             row_number() OVER (PARTITION BY batch_id
                                ORDER BY value DESC NULLS LAST,
                                         event_id ASC) AS rk
      FROM vis
    ), topk AS (
      SELECT batch_id, user_id, value, event_id, rk
      FROM ranked WHERE rk <= 10
    ), cur AS (
      SELECT batch_id AS bb, user_id, value, event_id, rk FROM topk
    ), prev AS (
      SELECT batch_id + 1 AS bb, user_id, value, event_id, rk
      FROM topk
      WHERE batch_id + 1 <= (SELECT max(chunk) FROM chunked)
    )
    SELECT bb AS batch_id, user_id,
           CASE WHEN prev.event_id IS NULL THEN 'enter'
                WHEN cur.event_id IS NULL THEN 'leave'
                ELSE 'update' END AS change,
           prev.rk - 1 AS old_offset,
           cur.rk - 1 AS new_offset,
           prev.value AS old_value,
           cur.value AS new_value
    FROM cur FULL JOIN prev USING (bb, user_id)
    WHERE cur.event_id IS NULL OR prev.event_id IS NULL
       OR cur.event_id <> prev.event_id
    """


@query("changefeed_topk_offsets", oracle=_topk_offsets_oracle())
def changefeed_topk_offsets(spark, sf_dir):
    """RethinkDB orderBy.limit(k).changes(include_offsets=True): each
    enter/leave/update delta additionally carries the document's
    0-based POSITION in the ordered top-k before (old_offset) and
    after (new_offset) the change — what a client needs to maintain
    a mirrored ordered list with in-place splices instead of
    re-sorting. Positions are the indices of the already-ordered
    O(k) membership lists the index-backed refresh produces anyway
    (views.py _refresh_topk), so the feature costs nothing beyond
    the 5-column feed; the oracle re-ranks every batch's true top-k
    and diffs consecutive batches, so one off-by-one splice position
    in any batch breaks the hash."""
    from ..streaming.view_queries import _runner

    r = _runner(spark, sf_dir)
    return r.topk_log().select(
        "batch_id", "user_id", "change",
        "old_offset", "new_offset", "old_value", "new_value")

# ------------------------------------------- changefeed_point_changes


def _point_changes_oracle() -> str:
    return f"""
    WITH numbered AS (
      SELECT user_id, ts, event_id, value,
             row_number() OVER (ORDER BY event_id) - 1 AS rn,
             count(*) OVER () AS n
      FROM events
    ), chunked AS (
      SELECT user_id, ts, event_id, value,
             CAST(floor(rn / ceil(n / {_NB7C}.0)) AS BIGINT) AS chunk
      FROM numbered
    ), k AS (
      SELECT user_id AS u FROM events ORDER BY event_id LIMIT 1
    ), mine AS (
      SELECT * FROM chunked WHERE user_id = (SELECT u FROM k)
    ), batches AS (
      SELECT DISTINCT chunk AS b FROM chunked
    ), vis AS (
      SELECT b.b AS batch_id, m.value, m.event_id,
             row_number() OVER (PARTITION BY b.b
                                ORDER BY m.ts DESC, m.event_id DESC)
               AS rrn
      FROM batches b JOIN mine m ON m.chunk <= b.b
    ), v AS (
      SELECT batch_id, value, event_id FROM vis WHERE rrn = 1
    ), prev AS (
      SELECT batch_id + 1 AS batch_id, value, event_id FROM v
    )
    SELECT v.batch_id,
           (SELECT u FROM k) AS user_id,
           prev.value AS old_value,
           v.value AS new_value,
           prev.event_id AS old_event_id,
           v.event_id AS new_event_id
    FROM v LEFT JOIN prev USING (batch_id)
    WHERE prev.event_id IS NULL OR v.event_id <> prev.event_id
    """


#: replay once per (session, sf_dir) — the feed is re-read, not re-run
_POINT_FEED_CACHE: dict = {}


@query("changefeed_point_changes", oracle=_point_changes_oracle())
def changefeed_point_changes(spark, sf_dir):
    """RethinkDB r.table(...).get(k).changes() — the PER-DOCUMENT
    feed: a standing LWW upsert query filtered to ONE key (api.py
    RowRef.changes()), graded on its full per-batch {old,new} delta
    log. The envelope predicate runs BEFORE the keyed merge, so the
    feed's state is one row and other keys' changes never touch it —
    the engine-side point-subscription shape (at 100 TB: the filter
    prunes each micro-batch to the subscribed key's rows; state
    reads hit exactly one bucket of the MVCC store). The key is
    chosen deterministically (the user of the minimum event_id —
    guaranteed to exist in batch 0 at every SF); the oracle
    reconstructs the key's visible LWW row at every batch prefix and
    diffs consecutive batches, so a missed win, a phantom emission,
    or a wrong old-image in any batch breaks the hash."""
    from ..api import Database

    key = (id(spark), sf_dir)
    if key not in _POINT_FEED_CACHE:
        first = (
            load_table(spark, sf_dir, "events")
            .orderBy("event_id")
            .limit(1)
            .collect()[0]
        )
        feed = (
            Database(spark, sf_dir)
            .table("events")
            .get(int(first["user_id"]))
            .changes()
        )
        _POINT_FEED_CACHE[key] = (int(first["user_id"]), feed)
    uid, feed = _POINT_FEED_CACHE[key]
    return feed.log().select(
        "batch_id",
        F.lit(uid).alias("user_id"),
        "old_value", "new_value", "old_event_id", "new_event_id",
    )


# -------------------------------------------------------- agg_gini

_DEC30 = "decimal(30,6)"


@query(
    "agg_gini",
    oracle="""
    WITH e AS (
      SELECT event_type, value, event_id
      FROM events WHERE value IS NOT NULL AND value >= 0
    ), r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value ASC, event_id ASC)
               AS rk
      FROM e
    ), s AS (
      SELECT event_type,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(30,6))) AS s0,
             sum(rk * CAST(value AS DECIMAL(30,6))) AS s1
      FROM r GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(s0 AS DOUBLE) AS sum_value,
           CAST(2 * s1 - (n + 1) * s0 AS DOUBLE)
             / CAST(n * s0 AS DOUBLE) AS gini
    FROM s
    """,
)
def agg_gini(spark, sf_dir):
    """Exact per-group GINI COEFFICIENT (inequality of the value
    distribution per event_type) via the rank formula
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)), x ascending.
    The rank is built at the 100 TB shape: a plain row_number()
    OVER (PARTITION BY event_type) would serialize each group
    through ONE task, so the rank is two-level — a per-(group,
    floor(value)) band histogram whose running sum (a window over
    the TINY histogram) gives each band its starting offset, plus a
    row_number partitioned by (group, band): hundreds of fine
    partitions per group, no group-sized sort anywhere. Equal
    values contribute identically to sum(i*x_i) under any
    permutation of their ranks, so the banded rank reproduces the
    serial window's Gini exactly (the oracle USES the serial
    window). Moments ride DECIMAL(30,6) — rank*value sums overflow
    18-digit decimals at bench scale — and the final division is
    one IEEE op."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & (F.col("value") >= 0))
        .select("event_type", "value", "event_id",
                F.floor("value").cast("long").alias("band"))
    )
    hist = e.groupBy("event_type", "band").agg(
        F.count(F.lit(1)).alias("bn"))
    wh = (Window.partitionBy("event_type").orderBy("band")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = hist.select(
        "event_type", "band",
        F.coalesce(F.sum("bn").over(wh), F.lit(0)).alias("off"))
    in_band = F.row_number().over(
        Window.partitionBy("event_type", "band")
        .orderBy(F.col("value").asc(), F.col("event_id").asc()))
    ranked = (
        e.join(F.broadcast(offsets), ["event_type", "band"])
        .select("event_type", "value",
                (F.col("off") + in_band).cast("long").alias("rk"))
    )
    dec = F.col("value").cast(_DEC30)
    s = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("s0"),
        F.sum(F.col("rk") * dec).alias("s1"),
    )
    return s.select(
        "event_type", "n",
        F.col("s0").cast("double").alias("sum_value"),
        ((2 * F.col("s1") - (F.col("n") + 1) * F.col("s0"))
         .cast("double")
         / (F.col("n") * F.col("s0")).cast("double")).alias("gini"),
    )


# ----------------------------------------------- funnel_attribution


@query(
    "funnel_attribution",
    oracle=f"""
    WITH w AS (
      SELECT user_id, ts, event_id, event_type, value,
             max(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS last_view
      FROM events
    ), p AS (
      SELECT value,
             CASE
               WHEN last_view IS NULL THEN 'no_touch'
               WHEN epoch_us(ts) - epoch_us(last_view)
                    <= 3600000000 THEN 'lt_1h'
               WHEN epoch_us(ts) - epoch_us(last_view)
                    <= 86400000000 THEN 'lt_24h'
               WHEN epoch_us(ts) - epoch_us(last_view)
                    <= 604800000000 THEN 'lt_7d'
               ELSE 'expired'
             END AS touch_band
      FROM w WHERE event_type = 'purchase'
    )
    SELECT touch_band,
           count(*) AS n_purchases,
           {sql_dsum('value')} AS revenue
    FROM p GROUP BY touch_band
    """,
)
def funnel_attribution(spark, sf_dir):
    """LAST-TOUCH attribution — the marketing-analytics workhorse:
    every purchase is attributed to the user's most recent PRECEDING
    'view' (strictly earlier by (ts, event_id) — the self-excluding
    ROWS ... 1 PRECEDING frame), banded by touch age (<1h, <24h,
    <7d, expired, no-touch) with exact integer-microsecond
    arithmetic. One shuffle on user_id serves the whole query: the
    last-view anchor is a running conditional MAX over the per-user
    timeline (the IGNORE-NULLS navigation shape), then the purchase
    rows band and aggregate — no self-join of purchases against
    views (the naive formulation is a per-user range join that
    explodes quadratically on heavy users)."""
    e = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").asc(), F.col("event_id").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    age_us = (F.unix_micros(F.col("ts"))
              - F.unix_micros(F.col("last_view")))
    band = (
        F.when(F.col("last_view").isNull(), "no_touch")
        .when(age_us <= 3_600_000_000, "lt_1h")
        .when(age_us <= 86_400_000_000, "lt_24h")
        .when(age_us <= 604_800_000_000, "lt_7d")
        .otherwise("expired")
    )
    return (
        e.withColumn("last_view", last_view)
        .where(F.col("event_type") == "purchase")
        .select(band.alias("touch_band"), "value")
        .groupBy("touch_band")
        .agg(F.count(F.lit(1)).alias("n_purchases"),
             dsum("value").alias("revenue"))
    )

# ----------------------------------------------- rolling-window pair


@query(
    "win_median_sliding",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, value,
             median(value) OVER fr AS med7,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id, value, med7
    FROM w WHERE rn >= 7
    """,
)
def win_median_sliding(spark, sf_dir):
    """Sliding-window MEDIAN (7-row moving median per user timeline)
    — the robust-smoothing primitive rolling averages can't give.
    Emitted ONLY where the frame is full: a 7-row frame has an ODD
    count, so the median is an exact element selection in both
    engines — no midpoint interpolation, whose a+g*(b-a) vs
    (a+b)/2 formulations differ at the ulp and poison cross-engine
    hashes (partial head-frames have even counts, which is exactly
    why they're cut). Partitioned by user — millions of independent
    partitions, each task holds one frame of 7 values; no global
    sort anywhere."""
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    fr = (Window.partitionBy("user_id").orderBy(*order)
          .rowsBetween(-6, 0))
    seq = Window.partitionBy("user_id").orderBy(*order)
    return (
        e.select(
            "user_id", "ts", "event_id", "value",
            F.expr("percentile(value, 0.5)").over(fr).alias("med7"),
            F.row_number().over(seq).alias("rn"),
        )
        .where(F.col("rn") >= 7)
        .drop("rn")
    )


@query(
    "ts_zscore_rolling",
    oracle="""
    WITH w AS (
      SELECT user_id, ts, event_id, value,
             sum(CAST(value AS DECIMAL(18,6))) OVER fr AS s,
             sum(CAST(value AS DECIMAL(18,6))
                 * CAST(value AS DECIMAL(18,6))) OVER fr AS s2,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id, value,
           CAST(s AS DOUBLE) / 7 AS mean7,
           CASE WHEN 7 * s2 - s * s > 0
                THEN sqrt(CAST(7 * s2 - s * s AS DOUBLE)) / 7
           END AS std7,
           CASE WHEN 7 * s2 - s * s > 0
                THEN CAST(7 * CAST(value AS DECIMAL(18,6)) - s
                          AS DOUBLE)
                     / sqrt(CAST(7 * s2 - s * s AS DOUBLE))
           END AS zscore
    FROM w WHERE rn >= 7
    """,
)
def ts_zscore_rolling(spark, sf_dir):
    """Rolling z-score anomaly signal (7-row frame per user): the
    online-monitoring normalization behind threshold alerting. All
    moments are EXACT decimal window sums — z is algebraically
    rearranged to (7x - S) / sqrt(7*S2 - S^2) so the only IEEE ops
    are one decimal->double cast each, one sqrt (correctly rounded
    by spec), and one division — deterministic across engines, no
    order-dependent float accumulation in the frame. Constant
    frames (zero variance) yield NULL rather than an engine-specific
    inf. Same full-frame cut and per-user partitioning as
    win_median_sliding; ts_ewma / ts_anomaly_mad are the siblings."""
    e = load_table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    fr = (Window.partitionBy("user_id").orderBy(*order)
          .rowsBetween(-6, 0))
    seq = Window.partitionBy("user_id").orderBy(*order)
    dec = F.col("value").cast("decimal(18,6)")
    base = (
        e.select(
            "user_id", "ts", "event_id", "value",
            F.sum(dec).over(fr).alias("s"),
            F.sum(dec * dec).over(fr).alias("s2"),
            F.row_number().over(seq).alias("rn"),
        )
        .where(F.col("rn") >= 7)
    )
    den2 = 7 * F.col("s2") - F.col("s") * F.col("s")
    num = 7 * dec - F.col("s")
    return base.select(
        "user_id", "ts", "event_id", "value",
        (F.col("s").cast("double") / 7).alias("mean7"),
        F.when(den2 > 0, F.sqrt(den2.cast("double")) / 7)
        .alias("std7"),
        F.when(den2 > 0,
               num.cast("double") / F.sqrt(den2.cast("double")))
        .alias("zscore"),
    )

# ------------------------------------------ changefeed_include_types


def _include_types_oracle() -> str:
    from ..streaming.view_queries import _VIS_CTE

    return _VIS_CTE + """
    , cur AS (
      SELECT batch_id AS bb, user_id, event_id FROM vis
    ), prevv AS (
      SELECT batch_id + 1 AS bb, user_id, event_id FROM vis
      WHERE batch_id + 1 <= (SELECT max(chunk) FROM chunked)
    ), d AS (
      SELECT bb,
             CASE WHEN prevv.event_id IS NULL THEN 'add'
                  WHEN cur.event_id IS NULL THEN 'remove'
                  ELSE 'change' END AS change_type
      FROM cur FULL JOIN prevv USING (bb, user_id)
      WHERE cur.event_id IS DISTINCT FROM prevv.event_id
    )
    SELECT bb AS batch_id, change_type, count(*) AS n
    FROM d GROUP BY bb, change_type
    """


@query("changefeed_include_types", oracle=_include_types_oracle())
def changefeed_include_types(spark, sf_dir):
    """RethinkDB changes(include_types=True): every delta carries its
    CHANGE TYPE — 'add' (no old image: a key became visible),
    'remove' (no new image: the CDC delete tombstoned it), 'change'
    (both images present). The classification is a pure projection
    of the {old,new} envelope the upsert feed already emits, graded
    as per-(batch, type) counts over the FULL log trajectory — the
    first trajectory grade of the entity-keyed upsert runner (its
    state query grades only the final answer): a tombstone refresh
    that wrongly emits, a re-insert typed 'change', or a dropped
    remove in any batch shifts a count and breaks the hash. The
    oracle rebuilds every batch's visible LWW table and classifies
    the consecutive diffs."""
    from ..streaming.queries import _CF_CACHE
    from ..streaming.changefeed import UpsertChangefeedRunner

    key = (id(spark), sf_dir, "__upsert_del__")
    if key not in _CF_CACHE:
        runner = UpsertChangefeedRunner(spark, sf_dir,
                                        delete_on="error")
        runner.run()
        _CF_CACHE[key] = runner
    log = _CF_CACHE[key].log()
    # classification is on the IMAGES (old_val/new_val), exactly the
    # RethinkDB rule: the log's new_event_id stays non-null on a
    # delete (it is the tombstone's LWW high-water mark), so the
    # event-id columns cannot distinguish remove from change. The
    # fixture's no-null-values assumption is already pinned by the
    # view-fold tests, so a NULL image always means absence.
    change_type = (
        F.when(F.col("old_value").isNull(), "add")
        .when(F.col("new_value").isNull(), "remove")
        .otherwise("change")
    )
    return (
        log.select(F.col("batch_id").cast("long").alias("batch_id"),
                   change_type.alias("change_type"))
        .groupBy("batch_id", "change_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )

# --------------------------- generic view library: more support reads

_ORDERS_VIS = None


def _orders_vis_cte() -> str:
    from ..streaming.generic_views import _NB as _GNB

    return f"""
    WITH numbered AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_orderstatus,
             o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
             count(*) OVER () AS n
      FROM orders
    ), chunked AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_orderstatus,
             o_totalprice,
             CAST(floor(rn / ceil(n / {_GNB}.0)) AS BIGINT) AS chunk
      FROM numbered
    ), batches AS (
      SELECT DISTINCT chunk AS batch_id FROM chunked
    ), latest AS (
      SELECT b.batch_id, c.o_custkey, c.o_orderstatus,
             c.o_totalprice,
             row_number() OVER (
               PARTITION BY b.batch_id, c.o_custkey
               ORDER BY c.o_orderdate DESC, c.o_orderkey DESC)
               AS rrn
      FROM batches b JOIN chunked c ON c.chunk <= b.batch_id
    ), vis AS (
      SELECT batch_id, o_orderstatus, o_totalprice
      FROM latest WHERE rrn = 1
    )
    """


def _orders_runner(spark, sf_dir):
    from ..streaming.generic_views import orders_runner

    return orders_runner(spark, sf_dir)


@query(
    "changefeed_distinct_view_orders",
    oracle=_orders_vis_cte() + """
    SELECT batch_id, o_orderstatus,
           count(*) AS n,
           count(DISTINCT o_totalprice) AS nd_value
    FROM vis GROUP BY batch_id, o_orderstatus
    """,
)
def changefeed_distinct_view_orders(spark, sf_dir):
    """Exact COUNT(DISTINCT) on the SECOND table's maintained view —
    the generic library's support relation (group, value) ->
    multiplicity IS the distinct-value set with reference counts
    (a value leaves exactly when its multiplicity hits zero, the
    part a naive distinct-count delta cannot know). Zero new
    maintenance state: min/max, distinct counts and variance all
    read off the ONE support relation the orders CDC scan already
    folds; this and the two sibling orders views share a single
    cached runner. Trajectory-graded per micro-batch."""
    from pyspark.sql import functions as FX

    r = _orders_runner(spark, sf_dir)
    parts = [
        r._support.df_at(b).groupBy("o_orderstatus")
        .agg(FX.sum("cnt").alias("n"),
             FX.count(FX.lit(1)).alias("nd_value"))
        .select(FX.lit(b).cast("long").alias("batch_id"),
                "o_orderstatus", "n", "nd_value")
        for b in r._batches
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "changefeed_variance_view_orders",
    oracle=_orders_vis_cte() + """
    , kilo AS (
      SELECT batch_id, o_orderstatus,
             CAST(o_totalprice / 1000.0 AS DECIMAL(18,6)) AS vk
      FROM vis
    )
    SELECT batch_id, o_orderstatus,
           count(*) AS n,
           FLOOR((CAST(sum(vk * vk) AS DOUBLE) / count(*)
                  - (CAST(sum(vk) AS DOUBLE) / count(*))
                    * (CAST(sum(vk) AS DOUBLE) / count(*)))
                 * 1000000.0 + 0.5) / 1000000.0
             AS vark_pop6
    FROM kilo GROUP BY batch_id, o_orderstatus
    """,
)
def changefeed_variance_view_orders(spark, sf_dir):
    """Exact population variance on the second table's maintained
    view, read off the SAME support relation — in KILODOLLAR units
    by design: o_totalprice^2 sums reach ~2e10 where the engines'
    decimal->double conversions stop agreeing (DuckDB's int128
    scaled divide double-rounds once value*10^scale > 2^53; Spark's
    BigDecimal cast is correctly rounded), so the value is rescaled
    v/1000 BEFORE the decimal quantization — one identical IEEE
    division — putting every moment back in the exactly-convertible
    range the events variance view lives in. n, sum(vk), sum(vk^2)
    fold in exact decimal; only the final E[v^2]-E[v]^2 runs in
    doubles on bit-identical inputs, floor-quantized to 6 dp.
    Trajectory-graded; shares the cached orders runner with the
    agg/minmax/distinct siblings."""
    from pyspark.sql import functions as FX

    r = _orders_runner(spark, sf_dir)
    vdec = (FX.col("o_totalprice") / FX.lit(1000.0)).cast("decimal(18,6)")
    parts = []
    for b in r._batches:
        g = r._support.df_at(b).groupBy("o_orderstatus").agg(
            FX.sum("cnt").alias("n"),
            FX.sum(vdec * FX.col("cnt")).alias("s"),
            FX.sum(vdec * vdec * FX.col("cnt")).alias("sq"),
        )
        var = (
            FX.col("sq").cast("double") / FX.col("n")
            - (FX.col("s").cast("double") / FX.col("n"))
            * (FX.col("s").cast("double") / FX.col("n"))
        )
        parts.append(
            g.select(
                FX.lit(b).cast("long").alias("batch_id"),
                "o_orderstatus", "n",
                (FX.floor(var * FX.lit(1000000.0) + FX.lit(0.5))
                 .cast("double") / FX.lit(1000000.0))
                .alias("vark_pop6"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _orders_topk_oracle() -> str:
    from ..streaming.generic_views import _NB as _GNB

    return f"""
    WITH numbered AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
             count(*) OVER () AS n
      FROM orders
    ), chunked AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
             CAST(floor(rn / ceil(n / {_GNB}.0)) AS BIGINT) AS chunk
      FROM numbered
    ), batches AS (
      SELECT DISTINCT chunk AS batch_id FROM chunked
    ), latest AS (
      SELECT b.batch_id, c.o_custkey, c.o_orderkey, c.o_totalprice,
             row_number() OVER (
               PARTITION BY b.batch_id, c.o_custkey
               ORDER BY c.o_orderdate DESC, c.o_orderkey DESC)
               AS rrn
      FROM batches b JOIN chunked c ON c.chunk <= b.batch_id
    ), vis AS (
      SELECT batch_id, o_custkey, o_orderkey, o_totalprice
      FROM latest WHERE rrn = 1
    ), ranked AS (
      SELECT batch_id, o_custkey, o_totalprice AS value, o_orderkey,
             row_number() OVER (PARTITION BY batch_id
                                ORDER BY o_totalprice DESC,
                                         o_orderkey ASC) AS rk
      FROM vis
    )
    SELECT batch_id, o_custkey, value, o_orderkey, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    """


@query("changefeed_topk_view_orders", oracle=_orders_topk_oracle())
def changefeed_topk_view_orders(spark, sf_dir):
    """Maintained TOP-K on the second table — the generic library's
    range-index store (views.py RangeBucketedIndex ported to
    parameterized columns): each micro-batch folds the delta into
    value-banded index buckets alongside the agg/support folds (now
    FIVE families off the one cached orders CDC scan), and every
    batch's top-5 customers by latest-order price are read by
    descending-band widening — O(k + band) rows touched, never the
    state. Trajectory-graded with ranks: a stale member, a phantom,
    or an off-by-one rank in any batch breaks the hash against the
    oracle's full re-rank of that batch prefix."""
    r = _orders_runner(spark, sf_dir)
    return r.topk_trajectory().select(
        "batch_id", "o_custkey", "value", "o_orderkey", "rk")


@query(
    "changefeed_quantile_view_orders",
    oracle=_orders_vis_cte() + """
    , c AS (
      SELECT batch_id, o_orderstatus, o_totalprice AS value,
             count(*) OVER (PARTITION BY batch_id, o_orderstatus
                            ORDER BY o_totalprice
                            ROWS UNBOUNDED PRECEDING) AS cumw,
             count(*) OVER (PARTITION BY batch_id, o_orderstatus)
               AS w
      FROM vis)
    SELECT batch_id, o_orderstatus,
           CAST(any_value(w) AS BIGINT) AS n,
           min(CASE WHEN 2 * cumw >= w THEN value END)
             AS median_value,
           min(CASE WHEN 10 * cumw >= 9 * w THEN value END)
             AS p90_value
    FROM c GROUP BY batch_id, o_orderstatus
    """,
)
def changefeed_quantile_view_orders(spark, sf_dir):
    """Exact MEDIAN/P90 as a maintained view on the second table —
    the generic library's banded two-level extraction (the events
    runner's scale-grade quantile read ported to parameterized
    columns): per-(batch, group, band) histogram, prefix sum over
    the bounded band domain locates each quantile's crossing band,
    and only crossed-band rows enter the fine cumulative window
    (band-partitioned, offset-corrected — identical crossing value
    to the whole-group window, O(crossed-band rows) input). SIX
    view families now serve off the one cached orders CDC scan.
    Trajectory-graded: median and p90 per o_orderstatus at every
    batch prefix."""
    r = _orders_runner(spark, sf_dir)
    return r.quantile_trajectory()
