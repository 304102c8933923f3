"""Round-9 wave, part 3: inequality indices from aggregate-only
identities, the Zipf head fit, and grid-cell hotspot detection.
Imports directly after round9 in load_all (rotation discipline:
behind every pending name; round9.py sits at its size ceiling).

Same determinism posture as round9 (see its module docstring).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import dsum, sql_dsum

# -------------------------------------------------------- agg_theil_index

@query(
    "agg_theil_index",
    oracle=f"""
    WITH s AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             {sql_dsum('o_totalprice')} AS sx,
             {sql_dsum('o_totalprice * ln(o_totalprice)')} AS sxlnx,
             {sql_dsum('sqrt(o_totalprice)')} AS ssqrt
      FROM orders GROUP BY o_orderpriority)
    SELECT o_orderpriority, n,
           sx / n AS mean_price,
           FLOOR((sxlnx / (n * (sx / n)) - ln(sx / n))
                 * 1000000.0 + 0.5) / 1000000.0 AS theil_t6,
           1.0 - (ssqrt / n) * (ssqrt / n) / (sx / n)
             AS atkinson_05
    FROM s
    """,
)
def agg_theil_index(spark, sf_dir):
    """Theil T and Atkinson(0.5) INEQUALITY INDICES of order value
    per priority class — the concentration numbers an ops review
    reads next to agg_gini, and (unlike Gini's pairwise/rank forms)
    both reduce to AGGREGATE-ONLY identities:
    T = sum(x ln x)/(n mu) - ln(mu) and
    A(0.5) = 1 - mean(sqrt x)^2 / mu — so the whole statistic is
    ONE map-side-combinable pass (n, sum x, sum x ln x, sum sqrt x;
    four numbers per group cross the shuffle), no sort, no window,
    no pair join. Requires positive x (o_totalprice is).

    Determinism: the three sums are DECIMAL(18,6)-stabilized (x ln x
    peaks ~1.7e6/row — the decimal headroom holds to ~1e12 total,
    i.e. past sf10 here; bigger corpora move to decimal(28,6));
    the closing expressions are the identical double op sequence in
    both engines, with mu always written as (sx / n), never a
    precomputed alias. Theil is additionally 6-dp floor-quantized
    (the var_pop6 rule): ln() is not correctly-rounded, so over 15k
    rows a few x*ln(x) products land on DECIMAL(18,6) rounding
    boundaries and the stabilized sums differ by ~1e-6 between
    engines (caught by strict parity; the Atkinson term is immune —
    sqrt IS correctly rounded, so its products quantize
    identically)."""
    s = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("sx"),
            dsum(F.col("o_totalprice")
                 * F.log(F.col("o_totalprice"))).alias("sxlnx"),
            dsum(F.sqrt(F.col("o_totalprice"))).alias("ssqrt"),
        )
    )
    mu = F.col("sx") / F.col("n")
    theil = F.col("sxlnx") / (F.col("n") * mu) - F.log(mu)
    return s.select(
        "o_orderpriority", "n",
        mu.alias("mean_price"),
        (F.floor(theil * F.lit(1000000.0) + F.lit(0.5))
         .cast("double") / F.lit(1000000.0)).alias("theil_t6"),
        (F.lit(1.0) - (F.col("ssqrt") / F.col("n"))
         * (F.col("ssqrt") / F.col("n")) / mu).alias("atkinson_05"),
    )


# ------------------------------------------------------------ llm_zipf_fit

_ZIPF_HEAD = 256


@query(
    "llm_zipf_fit",
    oracle=f"""
    WITH wc AS (
      SELECT w, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY w),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, w) AS rnk
      FROM wc),
    pts AS (
      SELECT ln(CAST(rnk AS DOUBLE)) AS x,
             ln(CAST(freq AS DOUBLE)) AS y
      FROM ranked WHERE rnk <= {_ZIPF_HEAD}),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             {sql_dsum('x')} AS sx, {sql_dsum('y')} AS sy,
             {sql_dsum('x * y')} AS sxy,
             {sql_dsum('x * x')} AS sxx,
             {sql_dsum('y * y')} AS syy
      FROM pts)
    SELECT n AS n_ranks,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept,
           ((n * sxy - sx * sy) * (n * sxy - sx * sy))
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM s
    """,
)
def llm_zipf_fit(spark, sf_dir):
    """Zipf's-law fit of the corpus vocabulary HEAD: OLS of
    ln(frequency) on ln(rank) over the top {_ZIPF_HEAD} ranks —
    slope near -1 is the natural-language signature, and departures
    are a cheap corpus-health tell (template spam flattens the head;
    boilerplate steepens it). Reports slope, intercept, and R^2.
    The head cut is the standard practice (Zipf holds in the head;
    the tail bends) and also what bounds the regression input.

    Scale shape: one explode + ONE word-count aggregate (map-side
    combined, |vocab| rows cross the shuffle); the rank is a window
    over the bounded vocabulary relation cut to {_ZIPF_HEAD} rows,
    and the regression is one tiny aggregate of five
    DECIMAL-stabilized sums with the closed-form OLS expressions
    written identically in both engines (slope re-expanded inside
    the intercept, never aliased)."""
    wc = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("w"))
    pts = (
        wc.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _ZIPF_HEAD)
        .select(F.log(F.col("rnk").cast("double")).alias("x"),
                F.log(F.col("freq").cast("double")).alias("y"))
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sx"), dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx")
                - F.col("sx") * F.col("sx")))
    return s.select(
        F.col("n").alias("n_ranks"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n"))
        .alias("intercept"),
        (((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
          * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")))
         / ((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * (F.col("n") * F.col("syy")
               - F.col("sy") * F.col("sy")))).alias("r2"),
    )


# -------------------------------------------------------- geo_grid_hotspot

_HOT_CELL = 10.0   #: grid cell size in degrees
_HOT_Z = 2.0


@query(
    "geo_grid_hotspot",
    oracle=f"""
    WITH pts AS (
      SELECT DISTINCT user_id,
             (CAST((user_id * 37) % 160 AS DOUBLE) - 80.0 + 0.25)
               AS lat,
             (CAST((user_id * 73) % 360 AS DOUBLE) - 180.0 + 0.25)
               AS lon
      FROM events),
    cells AS (
      SELECT CAST(floor(lat / {_HOT_CELL}) AS BIGINT) AS cell_lat,
             CAST(floor(lon / {_HOT_CELL}) AS BIGINT) AS cell_lon,
             CAST(count(*) AS BIGINT) AS cnt
      FROM pts GROUP BY 1, 2),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(cnt) AS BIGINT) AS total,
             CAST(sum(cnt * cnt) AS BIGINT) AS sq
      FROM cells)
    SELECT c.cell_lat, c.cell_lon, c.cnt,
           CASE WHEN s.k > 1 AND s.sq * s.k > s.total * s.total THEN
             (CAST(c.cnt AS DOUBLE) - CAST(s.total AS DOUBLE) / s.k)
             / sqrt((CAST(s.sq AS DOUBLE) * s.k
                     - CAST(s.total AS DOUBLE)
                       * CAST(s.total AS DOUBLE))
                    / (CAST(s.k AS DOUBLE) * (s.k - 1))) END
             AS zscore,
           coalesce(
             CASE WHEN s.k > 1 AND s.sq * s.k > s.total * s.total
               THEN
               (CAST(c.cnt AS DOUBLE)
                - CAST(s.total AS DOUBLE) / s.k)
               / sqrt((CAST(s.sq AS DOUBLE) * s.k
                       - CAST(s.total AS DOUBLE)
                         * CAST(s.total AS DOUBLE))
                      / (CAST(s.k AS DOUBLE) * (s.k - 1)))
               > {_HOT_Z} END, FALSE) AS hotspot
    FROM cells c, s
    """,
)
def geo_grid_hotspot(spark, sf_dir):
    """Grid-cell HOTSPOT detection over the user point cloud: count
    distinct users per {_HOT_CELL}-degree cell, z-score each cell
    against the cell-population mean/std (exact integer moment
    sums), flag z > {_HOT_Z} — the density-anomaly sweep a
    geo-monitoring job runs before anything fancier (the cell grid
    is the same discretization geo_nearest/geo_join_radius name as
    their scale path, here used as the statistic's support).

    Scale shape: one distinct-user pass -> cell counts (the grid is
    a BOUNDED domain: at most 16 x 36 cells at any corpus size), a
    three-integer moment aggregate over the cells, and a 1-row
    broadcast back onto them. The z expression is the identical
    double op sequence in both engines."""
    pts = (
        load_table(spark, sf_dir, "events")
        .select("user_id").distinct()
        .select(
            ((F.col("user_id") * 37 % 160).cast("double")
             - 80.0 + 0.25).alias("lat"),
            ((F.col("user_id") * 73 % 360).cast("double")
             - 180.0 + 0.25).alias("lon"),
        )
    )
    cells = (
        pts.groupBy(
            F.floor(F.col("lat") / _HOT_CELL).cast("long")
            .alias("cell_lat"),
            F.floor(F.col("lon") / _HOT_CELL).cast("long")
            .alias("cell_lon"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = cells.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("cnt").cast("long").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sq"),
    )
    # degenerate grids (k = 1 cell, or every cell equal — e.g. the
    # smallest fixture where each user is alone in its cell) have
    # no dispersion: z is NULL and nothing is a hotspot, in BOTH
    # engines, instead of an ANSI divide-by-zero
    ok = (F.col("k") > 1) & (
        F.col("sq") * F.col("k") > F.col("total") * F.col("total"))
    z = F.when(
        ok,
        (F.col("cnt").cast("double")
         - F.col("total").cast("double") / F.col("k"))
        / F.sqrt((F.col("sq").cast("double") * F.col("k")
                  - F.col("total").cast("double")
                  * F.col("total").cast("double"))
                 / (F.col("k").cast("double") * (F.col("k") - 1))))
    return cells.join(F.broadcast(s)).select(
        "cell_lat", "cell_lon", "cnt",
        z.alias("zscore"),
        F.coalesce(z > _HOT_Z, F.lit(False)).alias("hotspot"),
    )


# ---------------------------------------------------------------- ts_pacf

_PACF_LAGS = 5
_PACF_DDL = "event_type string, lag int, acf double, pacf double"


def _pacf_fit(pdf):
    """ACF + Durbin-Levinson PACF per series in plain float64 —
    every sum a sequential left-to-right fold over the day-ordered
    series, the SAME order as the oracle's list_aggregate folds, so
    every coefficient is bit-identical."""
    import pandas as _pd

    pdf = pdf.sort_values("day").reset_index(drop=True)
    ys = [float(v) for v in pdf["y"]]
    n = len(ys)
    if n < _PACF_LAGS + 2:
        return _pd.DataFrame(
            columns=["event_type", "lag", "acf", "pacf"])
    mean = 0.0
    for y in ys:
        mean += y
    mean = mean / n
    cs = [y - mean for y in ys]
    denom = 0.0
    for c in cs:
        denom += c * c
    racf = [None]  # 1-indexed
    for k in range(1, _PACF_LAGS + 1):
        s = 0.0
        for i in range(n - k):
            s += cs[i] * cs[i + k]
        racf.append(s / denom)
    phi = [racf[1]]
    out = [(pdf["event_type"][0], 1, racf[1], racf[1])]
    for k2 in range(2, _PACF_LAGS + 1):
        num_s = 0.0
        for j in range(1, k2):
            num_s += phi[j - 1] * racf[k2 - j]
        den_s = 0.0
        for j in range(1, k2):
            den_s += phi[j - 1] * racf[j]
        a = (racf[k2] - num_s) / (1.0 - den_s)
        phi = [phi[j - 1] - a * phi[k2 - 1 - j]
               for j in range(1, k2)] + [a]
        out.append((pdf["event_type"][0], k2, racf[k2], a))
    return _pd.DataFrame(
        out, columns=["event_type", "lag", "acf", "pacf"])


@query(
    "ts_pacf",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS y,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('day', ts)) AS i
      FROM events GROUP BY event_type, date_trunc('day', ts)),
    ser AS (
      SELECT event_type, list(y ORDER BY i) AS ys,
             CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY event_type
      HAVING count(*) >= {_PACF_LAGS + 2}),
    cen AS (
      SELECT event_type, n,
             list_transform(
               ys, y -> y - list_aggregate(ys, 'sum') / n) AS cs
      FROM ser),
    ac AS (
      SELECT event_type,
             list_transform(range(1, {_PACF_LAGS + 1}), k ->
               list_aggregate(
                 list_transform(range(1, CAST(n - k + 1 AS BIGINT)),
                                i -> cs[i] * cs[i + k]), 'sum')
               / list_aggregate(
                   list_transform(cs, c -> c * c), 'sum')) AS racf
      FROM cen),
    r AS (
      SELECT event_type, 1 AS k, [racf[1]] AS phi,
             racf[1] AS pacf, racf
      FROM ac
      UNION ALL
      SELECT event_type, k + 1,
             list_concat(
               list_transform(range(1, k + 1),
                 j -> phi[j]
                      - (racf[k + 1]
                         - list_aggregate(
                             list_transform(range(1, k + 1),
                               j2 -> phi[j2] * racf[k + 1 - j2]),
                             'sum'))
                        / (1.0 - list_aggregate(
                             list_transform(range(1, k + 1),
                               j2 -> phi[j2] * racf[j2]), 'sum'))
                        * phi[k + 1 - j]),
               [(racf[k + 1]
                 - list_aggregate(
                     list_transform(range(1, k + 1),
                       j2 -> phi[j2] * racf[k + 1 - j2]), 'sum'))
                / (1.0 - list_aggregate(
                     list_transform(range(1, k + 1),
                       j2 -> phi[j2] * racf[j2]), 'sum'))]) AS phi,
             (racf[k + 1]
              - list_aggregate(
                  list_transform(range(1, k + 1),
                    j2 -> phi[j2] * racf[k + 1 - j2]), 'sum'))
             / (1.0 - list_aggregate(
                  list_transform(range(1, k + 1),
                    j2 -> phi[j2] * racf[j2]), 'sum')) AS pacf,
             racf
      FROM r WHERE k < {_PACF_LAGS})
    SELECT event_type, CAST(k AS INT) AS lag, racf[k] AS acf, pacf
    FROM r
    """,
)
def ts_pacf(spark, sf_dir):
    """ACF and PARTIAL autocorrelation (Durbin-Levinson recursion)
    of each event type's daily count series, lags 1..{_PACF_LAGS} —
    the pair of plots every ARIMA order selection starts from
    (ACF tails/PACF cuts => AR order, and vice versa for MA).
    The DL recursion updates a coefficient VECTOR per lag — like
    ts_holt_winters a genuinely sequential operator, run as
    applyInPandas per series while the oracle carries phi as a LIST
    through DuckDB's recursive CTE.

    Determinism: EVERY sum on both sides is a sequential
    left-to-right fold over the day-ordered series (python
    accumulator loops vs list_aggregate over list(... ORDER BY i) —
    the same trick the vector dot products use), so means, centered
    products, ACFs and every DL coefficient are bit-identical with
    no decimal quantization anywhere.

    Scale shape: scan -> bounded (series, day) relation -> ONE
    shuffle by series; each series' O(lags^2 + n*lags) recursion
    runs inside its own Arrow batch — parallel across millions of
    series, never across time."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    return daily.groupBy("event_type").applyInPandas(
        _pacf_fit, schema=_PACF_DDL)


# --------------------------------------------------- changefeed_log_orders

def _log_orders_oracle() -> str:
    from ..streaming.replay import default_chunks

    nb = default_chunks()
    return f"""
    WITH numbered AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_orderstatus,
             o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
             count(*) OVER () AS n
      FROM orders),
    chunked AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_orderstatus,
             o_totalprice,
             CAST(floor(rn / ceil(n / {nb}.0)) AS BIGINT) AS chunk
      FROM numbered),
    batches AS (SELECT DISTINCT chunk AS batch_id FROM chunked),
    latest AS (
      SELECT b.batch_id, c.o_custkey, c.o_orderkey, c.o_orderstatus,
             c.o_totalprice,
             row_number() OVER (
               PARTITION BY b.batch_id, c.o_custkey
               ORDER BY c.o_orderdate DESC, c.o_orderkey DESC)
               AS rrn
      FROM batches b JOIN chunked c ON c.chunk <= b.batch_id),
    v AS (
      SELECT batch_id, o_custkey, o_orderkey, o_orderstatus,
             o_totalprice
      FROM latest WHERE rrn = 1),
    prev AS (
      SELECT batch_id + 1 AS batch_id, o_custkey, o_orderkey,
             o_orderstatus, o_totalprice
      FROM v)
    SELECT v.batch_id, v.o_custkey,
           prev.o_totalprice AS old_value,
           v.o_totalprice AS new_value,
           prev.o_orderkey AS old_seq,
           v.o_orderkey AS new_seq,
           prev.o_orderstatus AS old_group,
           v.o_orderstatus AS new_group
    FROM v LEFT JOIN prev USING (batch_id, o_custkey)
    WHERE prev.o_orderkey IS NULL
       OR v.o_orderkey <> prev.o_orderkey
    """


@query("changefeed_log_orders", oracle=_log_orders_oracle())
def changefeed_log_orders(spark, sf_dir):
    """The generic view runner's PER-ROW DELTA LOG, graded on orders
    — the piece that makes the table-agnostic family a CHANGEFEED
    rather than just a view store (this round's generic_views
    addition): every micro-batch, each customer's LWW win (newest
    order by (o_orderdate, o_orderkey)) emits one {{old, new}} row
    with value, sequence and group images (old_* NULL on first
    appearance), written as ONE parquet job off the same cached
    delta relation every fold already consumes — zero extra
    shuffles, idempotent per-batch-dir overwrite. The oracle
    reconstructs every batch prefix's visible winner per key and
    diffs consecutive prefixes, so a missed win, a phantom emission,
    or a wrong old-image anywhere in the trajectory breaks the
    hash (the changefeed_getall_changes contract, on the GENERIC
    runner).

    Scale: the log write is O(|delta|) per batch with no
    key-cardinality driver state; reads are a recursive parquet
    listing."""
    from ..streaming.generic_views import orders_runner

    r = orders_runner(spark, sf_dir)
    return r.delta_log().select(
        "batch_id", "o_custkey", "old_value", "new_value",
        "old_seq", "new_seq", "old_group", "new_group",
    )


# --------------------------------------------------- dq_expectation_suite

#: the declared expectations over the events stream — named, typed,
#: thresholds shared verbatim with the oracle (the
#: great-expectations/dbt-test shape: the CONTRACT is data, the
#: engine just evaluates it)
_EXPECTATIONS_SQL = """
    SELECT 'row_count_min' AS expectation,
           CAST(count(*) AS DOUBLE) AS observed,
           1.0 AS threshold,
           count(*) >= 1 AS passed
    FROM events
    UNION ALL
    SELECT 'event_id_unique',
           CAST(count(*) - count(DISTINCT event_id) AS DOUBLE),
           0.0, count(*) = count(DISTINCT event_id)
    FROM events
    UNION ALL
    SELECT 'value_in_range',
           CAST(count(CASE WHEN value < 0 OR value > 1000
                           THEN 1 END) AS DOUBLE),
           0.0,
           count(CASE WHEN value < 0 OR value > 1000 THEN 1 END) = 0
    FROM events
    UNION ALL
    SELECT 'ts_in_window',
           CAST(count(CASE WHEN ts < TIMESTAMP '2024-01-01'
                             OR ts >= TIMESTAMP '2024-02-01'
                           THEN 1 END) AS DOUBLE),
           0.0,
           count(CASE WHEN ts < TIMESTAMP '2024-01-01'
                        OR ts >= TIMESTAMP '2024-02-01'
                      THEN 1 END) = 0
    FROM events
    UNION ALL
    SELECT 'user_id_not_null',
           CAST(count(CASE WHEN user_id IS NULL THEN 1 END)
                AS DOUBLE),
           0.0, count(CASE WHEN user_id IS NULL THEN 1 END) = 0
    FROM events
    UNION ALL
    SELECT 'event_type_in_set',
           CAST(count(CASE WHEN event_type NOT IN
                    ('click','error','purchase','signup','view')
                           THEN 1 END) AS DOUBLE),
           0.0,
           count(CASE WHEN event_type NOT IN
                    ('click','error','purchase','signup','view')
                      THEN 1 END) = 0
    FROM events
"""


@query("dq_expectation_suite", oracle=_EXPECTATIONS_SQL)
def dq_expectation_suite(spark, sf_dir):
    """A declared EXPECTATION SUITE over the events stream — the
    great-expectations / dbt-test contract shape: each named
    expectation (row volume, key uniqueness, value range, event-time
    window, null policy, categorical domain) evaluates to one
    (observed, threshold, passed) row, and the suite IS the data
    contract a pipeline gates deploys on. Evaluated by executing the
    SAME SQL text in both engines — the contract is literal,
    shared, and engine-portable, which is the point of writing
    expectations as SQL in the first place.

    Scale: six conditional aggregates over one table — Catalyst
    collapses each UNION ALL arm to a scan + partial/final
    aggregate; at 100 TB you fuse the arms into one pass with
    observe() (scan_observed_metrics shows that form) or run them
    off the profile table; the per-expectation report stays
    |expectations| rows either way."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EXPECTATIONS_SQL)


# ---------------------------------------------------------- dq_anomaly_esd

_ESD_K = 5
_ESD_R = 3.0   #: fixed flag threshold on the studentized deviate
_ESD_DDL = ("event_type string, iter int, day timestamp, y double, "
            "r_stat double, flagged boolean")


def _esd_fit(pdf):
    """Iterative extreme-studentized-deviate removal in plain
    float64/exact-int arithmetic — the same op order as the
    oracle's recursive CTE (integer moment sums are order-free and
    exact; the z and R expressions are single fixed double
    sequences), so every statistic is bit-identical."""
    import math as _m

    import pandas as _pd

    pdf = pdf.sort_values("day").reset_index(drop=True)
    rem = [(pdf["day"][i], int(pdf["y"][i])) for i in range(len(pdf))]
    out = []
    for it in range(1, _ESD_K + 1):
        n = len(rem)
        if n < 3:
            break
        s = sum(y for _, y in rem)
        sq = sum(y * y for _, y in rem)
        mean = s / n
        std = _m.sqrt((sq * n - s * s) / (n * (n - 1)))
        if std == 0.0:
            break
        best_i, best_r = 0, -1.0
        for i, (_, y) in enumerate(rem):
            r = abs(y - mean) / std
            if r > best_r:
                best_i, best_r = i, r
        d, y = rem.pop(best_i)
        out.append((pdf["event_type"][0], it, d, float(y), best_r,
                    best_r > _ESD_R))
    return _pd.DataFrame(
        out, columns=["event_type", "iter", "day", "y", "r_stat",
                      "flagged"])


def _esd_oracle() -> str:
    # sequential-fold sums over the day-ordered remaining list; the
    # first index attaining the max |z| IS the smallest-day tie
    # rule. Lambda parameters are all DISTINCT single letters and
    # the recursive CTE is named `rec`: a lambda parameter named
    # like a CTE alias silently resolves wrong in DuckDB (the
    # original `r -> r.y` against CTE `r` produced zero recursion
    # rows, no error).
    mean = ("(list_aggregate(list_transform(rem, m -> m.y), 'sum')"
            " / len(rem))")
    sq = "list_aggregate(list_transform(rem, q -> q.y * q.y), 'sum')"
    s = "list_aggregate(list_transform(rem, t -> t.y), 'sum')"
    std = (f"sqrt(({sq} * len(rem) - {s} * {s})"
           f" / (CAST(len(rem) AS DOUBLE) * (len(rem) - 1)))")
    zs = f"list_transform(rem, e -> abs(e.y - {mean}) / {std})"
    rmax = f"list_aggregate({zs}, 'max')"
    idx = f"list_position({zs}, {rmax})"
    return f"""
    WITH RECURSIVE d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS DOUBLE) AS y
      FROM events GROUP BY 1, 2),
    ser AS (
      SELECT event_type,
             list({{'d': day, 'y': y}} ORDER BY day) AS rem
      FROM d GROUP BY event_type HAVING count(*) >= 3),
    rec AS (
      SELECT event_type, 0 AS iter,
             CAST(NULL AS TIMESTAMP) AS day,
             CAST(NULL AS DOUBLE) AS y,
             CAST(NULL AS DOUBLE) AS r_stat,
             rem
      FROM ser
      UNION ALL
      SELECT event_type, iter + 1,
             rem[{idx}].d AS day,
             rem[{idx}].y AS y,
             {rmax} AS r_stat,
             list_concat(rem[1:{idx} - 1],
                         rem[{idx} + 1:len(rem)]) AS rem
      FROM rec
      WHERE iter < {_ESD_K} AND len(rem) >= 3 AND {std} > 0)
    SELECT event_type, CAST(iter AS INT) AS iter, day, y, r_stat,
           r_stat > {_ESD_R} AS flagged
    FROM rec WHERE iter >= 1
    """


@query("dq_anomaly_esd", oracle=_esd_oracle())
def dq_anomaly_esd(spark, sf_dir):
    """Iterative EXTREME-STUDENTIZED-DEVIATE anomaly sweep per daily
    series (the Rosner/Generalized-ESD shape, the masking-resistant
    upgrade over one-shot z-scores: after each removal the mean/std
    RECOMPUTE, so a second outlier hiding behind the first becomes
    visible) — {_ESD_K} iterations, each emitting the removed
    point's R statistic, flagged at the fixed R > {_ESD_R} monitor
    threshold (production swaps the constant for Rosner's
    t-quantile critical-value table; the iteration structure — the
    hard part — is identical). Completes the anomaly family beside
    ts_anomaly_mad / ts_zscore_rolling / ts_cusum /
    ts_changepoint.

    Determinism: daily counts are INTEGERS, so every per-iteration
    moment sum is exact in any order; z/R are single fixed double
    expressions; the argmax tie rule is first-in-day-order on both
    sides (python scan vs list_position on the day-ordered list).
    Scale: one shuffle by series, each series' O(K·n) sweep runs
    inside its own Arrow batch — parallel across series."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    return daily.groupBy("event_type").applyInPandas(
        _esd_fit, schema=_ESD_DDL)
