"""Round-10 wave-3 graded queries — spectral / DP / state-space time
series, graph clustering, FD + gaps-islands data-quality audits, and
two text-eval pipeline ops.

Registered LAST in load_all (after round10) so every name here sits
behind the certified tail (grading-rotation discipline,
queries/__init__.py). Reference citations are N/A — the reference
tree is empty (SURVEY.md §0); the binding spec is the driver
contract + SURVEY §2.

Determinism notes specific to this module (verified empirically,
2026-08-16, all three engines on this container):
  * cos/sin are BIT-IDENTICAL across Spark (JVM Math), DuckDB (libm)
    and CPython for the periodogram's argument range — so DFT weights
    need no quantization; only the SUM of products is order-sensitive
    and routes through the decimal pipeline (_util.dsum).
  * ln is NOT bit-identical (9/141 probe values differ by 1 ulp), so
    every graded expression that feeds ln results into further
    arithmetic quantizes the ln OUTPUT at 9 dp with the floor tie
    rule first (ts_hurst) — downstream ops then run on identical
    doubles in both engines.
  * sqrt is IEEE-correctly-rounded (required by the standard) and
    needs no handling.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import DEC, davg, dround6_div, dsum, sql_davg, sql_dround6_div, sql_dsum

__all__ = ["load"]


def load() -> None:  # imported for side effects; keep a hook anyway
    pass


def _daily(spark, sf_dir, agg_col):
    """(event_type, day, y) daily series over events — 30 points per
    series at every SF (the fixture's fixed one-month window), with y
    one of count / dsum(value) / davg(value). One hash-aggregate
    shuffle; everything downstream works on the O(series × days)
    compressed relation, never the raw events again."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type",
                   F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(agg_col.alias("y"))
    )


# ------------------------------------------------------- ts_periodogram

_PGRAM_K = 10

_PGRAM_ORACLE = f"""
WITH d AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('day', ts)) - 1 AS t
  FROM events GROUP BY event_type, date_trunc('day', ts)),
s AS (SELECT d.*, count(*) OVER (PARTITION BY event_type) AS n FROM d),
ks AS (SELECT unnest(range(1, {_PGRAM_K + 1})) AS k),
terms AS (
  SELECT event_type, k, y, 2 * pi() * k * t / n AS theta
  FROM s CROSS JOIN ks),
comps AS (
  SELECT event_type, k,
         {sql_dsum('y * cos(theta)')} AS a,
         {sql_dsum('y * sin(theta)')} AS b
  FROM terms GROUP BY event_type, k),
pw AS (SELECT event_type, k, a * a + b * b AS power FROM comps),
tot AS (
  SELECT event_type, CAST(k AS INT) AS k, power,
         CAST(sum(CAST(power AS DECIMAL(18,6)))
              OVER (PARTITION BY event_type) AS DOUBLE) AS total
  FROM pw)
SELECT event_type, k, power, power / total AS share,
       CAST(row_number() OVER (PARTITION BY event_type
                               ORDER BY power DESC, k) AS INT) AS rnk
FROM tot
"""


@query("ts_periodogram", oracle=_PGRAM_ORACLE)
def ts_periodogram(spark, sf_dir):
    """DFT PERIODOGRAM of each event type's daily count series:
    P(k) = (Σ y_t cos(2πkt/n))² + (Σ y_t sin(2πkt/n))² for harmonics
    k = 1..10 — the classical spectral seasonality detector (the
    fixture's weekly cadence surfaces as a dominant k ≈ n/7). Both
    engines build the identical double angle ((2·π())·k·t)/n and
    their cos/sin agree bitwise (module header probe), so the only
    order-sensitive step — the two product sums — routes through the
    exact decimal pipeline; power, share and rank are then pure IEEE
    ops on bit-identical inputs. No quantization anywhere.

    Scale: the scan collapses to the O(series × days) daily relation
    in one partial+final hash aggregate; the k-range (10 rows) is a
    broadcast cross join, so spectra for millions of series cost one
    further hash aggregate on (series, k) — no window over raw data,
    no Python."""
    daily = _daily(spark, sf_dir, F.count(F.lit(1)).cast("double"))
    w = Window.partitionBy("event_type").orderBy("day")
    ser = daily.select(
        "event_type", "y",
        (F.row_number().over(w) - 1).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    ks = spark.range(1, _PGRAM_K + 1).select(
        F.col("id").cast("int").alias("k"))
    terms = ser.crossJoin(F.broadcast(ks)).withColumn(
        "theta", F.expr("2 * pi() * k * t / n"))
    comps = terms.groupBy("event_type", "k").agg(
        dsum(F.col("y") * F.cos("theta")).alias("a"),
        dsum(F.col("y") * F.sin("theta")).alias("b"),
    )
    pw = comps.select(
        "event_type", "k",
        (F.col("a") * F.col("a") + F.col("b") * F.col("b"))
        .alias("power"),
    )
    wk = Window.partitionBy("event_type")
    wr = Window.partitionBy("event_type").orderBy(
        F.desc("power"), F.asc("k"))
    return pw.select(
        "event_type", "k", "power",
        (F.col("power")
         / F.sum(F.col("power").cast(DEC)).over(wk).cast("double"))
        .alias("share"),
        F.row_number().over(wr).alias("rnk"),
    )


# -------------------------------------------------------------- ts_dtw

_DTW_DDL = "ta string, tb string, n_a long, n_b long, dtw double"


def _dtw_fit(pdf):
    """Full-matrix DTW DP in plain float64 — cell op order is
    EXACTLY the oracle's: cost = |xa_i − xb_j| + min(up, left, diag)
    with 1e308 boundary sentinels, so every cell is bit-identical to
    the recursive CTE's anti-diagonal wave evaluation."""
    import pandas as _pd

    a = pdf[pdf["side"] == "a"].sort_values("idx")
    b = pdf[pdf["side"] == "b"].sort_values("idx")
    xa = [float(v) for v in a["y"]]
    xb = [float(v) for v in b["y"]]
    n, m = len(xa), len(xb)
    if not n or not m:
        return _pd.DataFrame(
            columns=["ta", "tb", "n_a", "n_b", "dtw"])
    D = [[0.0] * m for _ in range(n)]
    for i in range(n):
        for j in range(m):
            d = abs(xa[i] - xb[j])
            if i == 0 and j == 0:
                D[i][j] = d
            else:
                up = D[i - 1][j] if i > 0 else 1e308
                lf = D[i][j - 1] if j > 0 else 1e308
                dg = D[i - 1][j - 1] if i > 0 and j > 0 else 1e308
                D[i][j] = d + min(up, lf, dg)
    return _pd.DataFrame(
        [(pdf["ta"].iloc[0], pdf["tb"].iloc[0], n, m, D[n - 1][m - 1])],
        columns=["ta", "tb", "n_a", "n_b", "dtw"])


_DTW_ORACLE = f"""
WITH RECURSIVE
d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {sql_dsum('value')} AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)),
s AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
           AS idx,
         y
  FROM d),
p AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM (SELECT DISTINCT event_type FROM s) a
  JOIN (SELECT DISTINCT event_type FROM s) b
    ON a.event_type < b.event_type),
cells AS (
  SELECT p.ta, p.tb, sa.idx AS i, sb.idx AS j, abs(sa.y - sb.y) AS d
  FROM p JOIN s sa ON sa.event_type = p.ta
         JOIN s sb ON sb.event_type = p.tb),
bounds AS (
  SELECT ta, tb, max(i) + max(j) AS maxw, max(i) AS mi, max(j) AS mj
  FROM cells GROUP BY ta, tb),
r AS (
  SELECT ta, tb, i, j, d AS cost, 'c' AS tag
  FROM cells WHERE i = 0 AND j = 0
  UNION ALL
  SELECT * FROM (
    SELECT c.ta, c.tb, c.i, c.j,
           c.d + least(coalesce(up.cost, 1e308),
                       coalesce(lf.cost, 1e308),
                       coalesce(dg.cost, 1e308)) AS cost,
           'c' AS tag
    FROM cells c
    LEFT JOIN r up ON up.tag = 'c' AND up.ta = c.ta AND up.tb = c.tb
                   AND up.i = c.i - 1 AND up.j = c.j
    LEFT JOIN r lf ON lf.tag = 'c' AND lf.ta = c.ta AND lf.tb = c.tb
                   AND lf.i = c.i AND lf.j = c.j - 1
    LEFT JOIN r dg ON dg.tag = 'p' AND dg.ta = c.ta AND dg.tb = c.tb
                   AND dg.i = c.i - 1 AND dg.j = c.j - 1
    WHERE up.i IS NOT NULL OR lf.i IS NOT NULL
    UNION ALL
    SELECT r.ta, r.tb, r.i, r.j, r.cost, 'p'
    FROM r JOIN bounds ON bounds.ta = r.ta AND bounds.tb = r.tb
    WHERE r.tag = 'c' AND r.i + r.j < bounds.maxw
  )
)
SELECT r.ta AS ta, r.tb AS tb,
       CAST(mx.mi + 1 AS BIGINT) AS n_a,
       CAST(mx.mj + 1 AS BIGINT) AS n_b,
       r.cost AS dtw
FROM r JOIN bounds mx ON mx.ta = r.ta AND mx.tb = r.tb
WHERE r.tag = 'c' AND r.i = mx.mi AND r.j = mx.mj
"""


@query("ts_dtw", oracle=_DTW_ORACLE)
def ts_dtw(spark, sf_dir):
    """DYNAMIC TIME WARPING distance between every pair of event
    types' daily value-sum series — the classical O(n·m) DP with the
    unconstrained min(up, left, diag) step. A genuinely 2-D
    recurrence Catalyst cannot express: each series pair's DP runs
    sequentially inside its own Arrow batch (applyInPandas over the
    pair key), while the oracle evaluates the SAME DP as anti-diagonal
    WAVES through DuckDB's recursive CTE — the working set carries
    waves d and d−1 (tags 'c'/'p'; cell (i,j) of wave d+1 reads its
    up/left neighbours from 'c' and its diagonal from 'p'), new cells
    are exactly those adjacent to a 'c' cell, and 'c' rows re-emit as
    'p' until the pair's final wave. Series values come off the exact
    decimal pipeline, so |xa−xb|, min and + operate on bit-identical
    doubles in both engines — the DTW distance matches bitwise with
    no quantization.

    Scale: the events scan collapses to the O(series × 30) daily
    relation; pair fan-out is a broadcast join of the bounded type
    list; ONE shuffle lands each pair's ≤60 tagged rows in one group.
    Cost is O(pairs · n·m) spread across executors — parallel across
    pairs, never across a single DP. For long series the same
    operator would take a Sakoe-Chiba band bound; at 30 points the
    full matrix is the honest baseline."""
    daily = _daily(spark, sf_dir, dsum("value"))
    w = Window.partitionBy("event_type").orderBy("day")
    ser = daily.select(
        "event_type", (F.row_number().over(w) - 1).alias("idx"), "y")
    types = ser.select("event_type").distinct()
    pairs = (
        types.alias("x")
        .join(types.alias("z"),
              F.col("x.event_type") < F.col("z.event_type"))
        .select(F.col("x.event_type").alias("ta"),
                F.col("z.event_type").alias("tb"))
    )
    left = (
        F.broadcast(pairs).join(ser, F.col("ta") == F.col("event_type"))
        .select("ta", "tb", F.lit("a").alias("side"), "idx", "y")
    )
    right = (
        F.broadcast(pairs).join(ser, F.col("tb") == F.col("event_type"))
        .select("ta", "tb", F.lit("b").alias("side"), "idx", "y")
    )
    return (
        left.unionAll(right)
        .groupBy("ta", "tb")
        .applyInPandas(_dtw_fit, schema=_DTW_DDL)
    )


# ----------------------------------------------------- ts_kalman_level

_KL_Q, _KL_R = 0.04, 0.25
_KL_DDL = ("event_type string, day timestamp, y double, "
           "level double, p_var double, gain double")


def _kalman_fit(pdf):
    """Local-level (random-walk + noise) Kalman filter in plain
    float64 — SAME op order and literal constants as the oracle's
    recursive CTE, so every level/variance/gain is bit-identical.
    Init: level = y_0, P = 1.0, gain undefined (NULL)."""
    import pandas as _pd

    pdf = pdf.sort_values("day").reset_index(drop=True)
    ys = [float(v) for v in pdf["y"]]
    if not ys:
        return _pd.DataFrame(
            columns=["event_type", "day", "y", "level", "p_var",
                     "gain"])
    level, p = ys[0], 1.0
    rows = [(pdf["event_type"][0], pdf["day"][0], ys[0], level, p,
             None)]
    for t in range(1, len(ys)):
        p_pred = p + _KL_Q
        k = p_pred / (p_pred + _KL_R)
        level = level + k * (ys[t] - level)
        p = (1.0 - k) * p_pred
        rows.append((pdf["event_type"][t], pdf["day"][t], ys[t],
                     level, p, k))
    return _pd.DataFrame(
        rows, columns=["event_type", "day", "y", "level", "p_var",
                       "gain"])


_KALMAN_ORACLE = f"""
WITH RECURSIVE d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {sql_davg('value')} AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('day', ts)) - 1 AS idx
  FROM events GROUP BY event_type, date_trunc('day', ts)),
r AS (
  SELECT event_type, idx, day, y, y AS level,
         CAST(1.0 AS DOUBLE) AS p_var, CAST(NULL AS DOUBLE) AS gain
  FROM d WHERE idx = 0
  UNION ALL
  SELECT d.event_type, d.idx, d.day, d.y,
         r.level + ((r.p_var + {_KL_Q}) / ((r.p_var + {_KL_Q})
                    + {_KL_R})) * (d.y - r.level) AS level,
         (1.0 - ((r.p_var + {_KL_Q}) / ((r.p_var + {_KL_Q})
                 + {_KL_R}))) * (r.p_var + {_KL_Q}) AS p_var,
         ((r.p_var + {_KL_Q}) / ((r.p_var + {_KL_Q}) + {_KL_R}))
           AS gain
  FROM r JOIN d ON d.event_type = r.event_type AND d.idx = r.idx + 1)
SELECT event_type, day, y, level, p_var, gain FROM r
"""


@query("ts_kalman_level", oracle=_KALMAN_ORACLE)
def ts_kalman_level(spark, sf_dir):
    """1-D LOCAL-LEVEL KALMAN FILTER over each event type's daily
    mean value (state x_t = x_{t-1} + w, observation y_t = x_t + v;
    Q = {_KL_Q}, R = {_KL_R}, P_0 = 1.0, x_0 = y_0): per step
    P⁻ = P + Q, K = P⁻/(P⁻ + R), x += K(y − x), P = (1 − K)P⁻ — the
    canonical state-space smoother with a TIME-VARYING gain, which
    distinguishes it from the fixed-alpha exponential family
    (ts_ewma / ts_holt_*). The recurrence is sequential, so it is
    the documented applyInPandas escape hatch; the oracle carries
    (level, P) through DuckDB's recursive CTE with the SAME literal
    constants and op order, making every emitted level/variance/gain
    bit-identical with no quantization.

    Scale shape: identical to ts_holt_winters — the scan collapses
    to the bounded (series, day) relation, ONE shuffle partitions by
    series, recurrences run sequentially only inside each series'
    Arrow batch: parallel across millions of series, never across
    time."""
    daily = _daily(spark, sf_dir, davg("value"))
    return daily.groupBy("event_type").applyInPandas(
        _kalman_fit, schema=_KL_DDL)


# ------------------------------------------------------------ ts_hurst

_HURST_MS = (5, 10, 15)
# 9-dp floor-rule quantizer applied to ln() OUTPUTS (ln is the one
# probe-confirmed cross-engine 1-ulp divergence in this module): the
# regression then runs on bit-identical doubles in both engines.
_Q9 = "floor(ln({x}) * 1000000000.0 + 0.5) / 1000000000.0"

_HURST_ORACLE = f"""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {sql_dsum('value')} AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)),
s AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
           AS idx,
         y, count(*) OVER (PARTITION BY event_type) AS n
  FROM d),
ms AS (SELECT unnest([{', '.join(str(m) for m in _HURST_MS)}]) AS m),
ch AS (
  SELECT event_type, m, idx // m AS c, idx, y
  FROM s CROSS JOIN ms WHERE idx < m * (n // m)),
st AS (
  SELECT event_type, m, c,
         {sql_davg('y')} AS mu,
         {sql_dsum('y')} AS sy,
         {sql_dsum('y * y')} AS syy,
         count(*) AS cnt
  FROM ch GROUP BY event_type, m, c),
z AS (
  SELECT ch.event_type, ch.m, ch.c,
         CAST(sum(CAST(ch.y - st.mu AS DECIMAL(18,6)))
              OVER (PARTITION BY ch.event_type, ch.m, ch.c
                    ORDER BY ch.idx) AS DOUBLE) AS zc,
         st.sy, st.syy, st.cnt
  FROM ch JOIN st ON st.event_type = ch.event_type
                 AND st.m = ch.m AND st.c = ch.c),
rs AS (
  SELECT event_type, m, c,
         (max(zc) - min(zc))
           / sqrt((any_value(syy) - any_value(sy) * any_value(sy)
                   / any_value(cnt)) / any_value(cnt)) AS rs
  FROM z GROUP BY event_type, m, c
  HAVING (any_value(syy) - any_value(sy) * any_value(sy)
          / any_value(cnt)) / any_value(cnt) > 0),
ars AS (
  SELECT event_type, m, {sql_davg('rs')} AS avg_rs
  FROM rs GROUP BY event_type, m),
pts AS (
  SELECT event_type, m, avg_rs,
         {_Q9.format(x='m')} AS lm,
         {_Q9.format(x='avg_rs')} AS lrs
  FROM ars),
fit AS (
  SELECT event_type,
         count(*) AS np,
         {sql_dsum('lm')} AS sx, {sql_dsum('lrs')} AS sy,
         {sql_dsum('lm * lrs')} AS sxy, {sql_dsum('lm * lm')} AS sxx
  FROM pts GROUP BY event_type)
SELECT f.event_type,
       max(CASE WHEN p.m = 5 THEN p.avg_rs END) AS rs_m5,
       max(CASE WHEN p.m = 10 THEN p.avg_rs END) AS rs_m10,
       max(CASE WHEN p.m = 15 THEN p.avg_rs END) AS rs_m15,
       any_value((f.np * f.sxy - f.sx * f.sy)
                 / (f.np * f.sxx - f.sx * f.sx)) AS hurst
FROM fit f JOIN pts p ON p.event_type = f.event_type
GROUP BY f.event_type
"""


@query("ts_hurst", oracle=_HURST_ORACLE)
def ts_hurst(spark, sf_dir):
    """HURST EXPONENT by rescaled-range (R/S) analysis of each event
    type's daily value-sum series: split into chunks of m ∈ {5, 10,
    15} days, per chunk R = range of the mean-adjusted cumulative
    deviations and S = population stddev, average R/S per m, then
    H = OLS slope of ln(avg R/S) on ln(m) — H ≈ 0.5 is a random
    walk, > 0.5 long-range persistence. All moments run on the exact
    decimal pipeline (cumulative deviations included — a window SUM
    is order-sensitive in BOTH engines' execution, segment tree vs
    running fold, so the cumsum casts to decimal too); sqrt is
    IEEE-exact; ln outputs are 9-dp floor-quantized (module header:
    ln is the one probe-confirmed cross-engine ulp divergence) so
    the closed-form slope runs on bit-identical doubles.

    Scale: two hash aggregates and one bounded window over the
    O(series × days) daily relation — the window partitions by
    (series, m, chunk), never global. The m-list is a 3-row
    broadcast; millions of series parallelize freely."""
    daily = _daily(spark, sf_dir, dsum("value"))
    w = Window.partitionBy("event_type").orderBy("day")
    ser = daily.select(
        "event_type", (F.row_number().over(w) - 1).alias("idx"), "y",
        F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    ms = spark.createDataFrame([(m,) for m in _HURST_MS], "m int")
    ch = (
        ser.crossJoin(F.broadcast(ms))
        .where(F.expr("idx < m * (n div m)"))
        .select("event_type", "m", F.expr("idx div m").alias("c"),
                "idx", "y")
    )
    st = ch.groupBy("event_type", "m", "c").agg(
        davg("y").alias("mu"), dsum("y").alias("sy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        F.count(F.lit(1)).alias("cnt"),
    )
    wz = Window.partitionBy("event_type", "m", "c").orderBy("idx")
    z = (
        ch.join(st, ["event_type", "m", "c"])
        .select(
            "event_type", "m", "c", "sy", "syy", "cnt",
            F.sum((F.col("y") - F.col("mu")).cast(DEC)).over(wz)
            .cast("double").alias("zc"),
        )
    )
    var = (F.first("syy") - F.first("sy") * F.first("sy")
           / F.first("cnt")) / F.first("cnt")
    rs = (
        z.groupBy("event_type", "m", "c")
        .agg(((F.max("zc") - F.min("zc")) / F.sqrt(var)).alias("rs"),
             var.alias("v"))
        .where(F.col("v") > 0)
    )
    pts = rs.groupBy("event_type", "m").agg(davg("rs").alias("avg_rs"))
    pts = pts.select(
        "event_type", "m", "avg_rs",
        F.expr(_Q9.format(x="m")).alias("lm"),
        F.expr(_Q9.format(x="avg_rs")).alias("lrs"),
    )
    fit = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("np"),
        dsum("lm").alias("sx"), dsum("lrs").alias("sy"),
        dsum(F.col("lm") * F.col("lrs")).alias("sxy"),
        dsum(F.col("lm") * F.col("lm")).alias("sxx"),
    )
    return (
        pts.join(fit, "event_type")
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("m") == 5, F.col("avg_rs")))
            .alias("rs_m5"),
            F.max(F.when(F.col("m") == 10, F.col("avg_rs")))
            .alias("rs_m10"),
            F.max(F.when(F.col("m") == 15, F.col("avg_rs")))
            .alias("rs_m15"),
            F.first((F.col("np") * F.col("sxy")
                     - F.col("sx") * F.col("sy"))
                    / (F.col("np") * F.col("sxx")
                       - F.col("sx") * F.col("sx"))).alias("hurst"),
        )
    )


# -------------------------------------------- graph_clustering_coeff

_GCC_ORACLE = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 4 = 0),
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, count(*) AS d FROM (
    SELECT u AS node FROM pairs
    UNION ALL SELECT v FROM pairs) t
  GROUP BY node),
oriented AS (
  SELECT CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.u ELSE p.v END
           AS s,
         CASE WHEN (du.d, p.u) < (dv.d, p.v) THEN p.v ELSE p.u END
           AS t
  FROM pairs p
  JOIN deg du ON du.node = p.u
  JOIN deg dv ON dv.node = p.v),
tri AS (
  SELECT e1.s AS x, least(e1.t, e2.t) AS a, greatest(e1.t, e2.t) AS b
  FROM oriented e1 JOIN oriented e2
    ON e1.s = e2.s AND e1.t < e2.t),
closed AS (
  SELECT x, a, b FROM tri JOIN pairs p ON p.u = tri.a AND p.v = tri.b),
pernode AS (
  SELECT node, count(*) AS tri_cnt FROM (
    SELECT x AS node FROM closed
    UNION ALL SELECT a FROM closed
    UNION ALL SELECT b FROM closed) t
  GROUP BY node)
SELECT deg.node, deg.d, coalesce(pernode.tri_cnt, 0) AS tri_cnt,
       {coeff} AS coeff6
FROM deg LEFT JOIN pernode ON pernode.node = deg.node
WHERE deg.d >= 2
ORDER BY coeff6 DESC, deg.node
LIMIT 25
""".format(coeff=sql_dround6_div("2 * coalesce(pernode.tri_cnt, 0)",
                                 "deg.d * (deg.d - 1)"))


@query("graph_clustering_coeff", oracle=_GCC_ORACLE)
def graph_clustering_coeff(spark, sf_dir):
    """LOCAL CLUSTERING COEFFICIENT per node of the part co-purchase
    graph — c(v) = 2·tri(v) / (d(v)·(d(v)−1)), top 25 by (coeff,
    node). Rides graph_triangles' shared persisted edge relation
    (analytics_ext._copurchase_pairs) and its degree-oriented wedge
    closure (Suri & Vassilvitskii): each closed wedge is one triangle
    credited to ALL THREE corners via an explode — so per-node counts
    come from the same O(m^1.5) enumeration, never a per-node
    neighborhood intersection. The coefficient is a rational of
    exact integers quantized with the floor tie rule; the top-25 cut
    is the distributed TakeOrderedAndProject on the unique (coeff6,
    node) total order — no global window.

    Scale: the edge relation is persisted once per fixture and
    shared with graph_triangles / graph_kcore in the same session;
    degrees broadcast; the only O(m^1.5) step is the wedge closure
    equi-join, which shuffles on the edge key and must not be
    force-broadcast (VERDICT r5)."""
    from .analytics_ext import _copurchase_pairs

    pairs = _copurchase_pairs(spark, sf_dir)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    )
    du = F.broadcast(deg).alias("du")
    dv = F.broadcast(deg).alias("dv")
    lower_first = (
        F.struct(F.col("du.d"), F.col("u"))
        < F.struct(F.col("dv.d"), F.col("v"))
    )
    oriented = (
        pairs.join(du, F.col("du.node") == F.col("u"))
        .join(dv, F.col("dv.node") == F.col("v"))
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v"))
            .alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u"))
            .alias("t"),
        )
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = (
        e1.join(e2, (F.col("e1.s") == F.col("e2.s"))
                & (F.col("e1.t") < F.col("e2.t")))
        .select(F.col("e1.s").alias("x"),
                F.least("e1.t", "e2.t").alias("a"),
                F.greatest("e1.t", "e2.t").alias("b"))
    )
    closed = wedges.join(
        pairs, (F.col("u") == F.col("a")) & (F.col("v") == F.col("b")))
    pernode = (
        closed.select(F.explode(F.array("x", "a", "b")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).alias("tri_cnt"))
    )
    out = (
        deg.where(F.col("d") >= 2)
        .join(pernode, "node", "left")
        .select(
            "node", "d",
            F.coalesce("tri_cnt", F.lit(0)).alias("tri_cnt"),
            dround6_div(
                F.coalesce("tri_cnt", F.lit(0)) * 2,
                F.col("d") * (F.col("d") - 1)).alias("coeff6"),
        )
    )
    return out.orderBy(F.desc("coeff6"), F.asc("node")).limit(25)


# ----------------------------------------------------------- dq_fd_audit

_FDS = [
    ("orders.o_orderkey->o_custkey", "orders", "o_orderkey",
     "o_custkey"),
    ("lineitem.l_orderkey->l_shipdate", "lineitem", "l_orderkey",
     "l_shipdate"),
    ("lineitem.l_partkey->l_suppkey", "lineitem", "l_partkey",
     "l_suppkey"),
    ("events.user_id->event_type", "events", "user_id", "event_type"),
    ("part.p_brand->p_type", "part", "p_brand", "p_type"),
]


def _fd_oracle() -> str:
    parts = []
    for name, table, lhs, rhs in _FDS:
        parts.append(f"""
        SELECT '{name}' AS fd,
               count(*) AS n_groups,
               CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS violated_groups,
               CAST(sum(CASE WHEN nd > 1 THEN cnt ELSE 0 END)
                    AS BIGINT) AS violation_rows,
               max(nd) <= 1 AS holds
        FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS nd,
                     count(*) AS cnt
              FROM {table} GROUP BY {lhs})""")
    return " UNION ALL ".join(parts)


@query("dq_fd_audit", oracle=_fd_oracle())
def dq_fd_audit(spark, sf_dir):
    """FUNCTIONAL-DEPENDENCY audit — the dbt-test / FD-discovery
    contract shape: for each declared candidate FD lhs → rhs, count
    determinant groups, groups violating the dependency (more than
    one distinct rhs), rows inside violating groups, and a holds
    verdict. The five audited FDs span a true key dependency
    (orders PK), three expected violations with different group
    cardinalities, and a categorical pair. Pure integer counts and
    booleans — no float anywhere.

    Scale: each FD is one partial+final hash aggregate on its lhs
    (count-distinct expands to a two-stage aggregate); the five
    1-row summaries union on the driver side of the plan. Adding an
    FD is O(one aggregate), never a join."""
    outs = []
    for name, table, lhs, rhs in _FDS:
        g = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("nd"),
                 F.count(F.lit(1)).alias("cnt"))
        )
        outs.append(
            g.agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .alias("violated_groups"),
                F.sum(F.when(F.col("nd") > 1, F.col("cnt"))
                      .otherwise(0)).alias("violation_rows"),
                (F.max("nd") <= 1).alias("holds"),
            ).select(F.lit(name).alias("fd"), "n_groups",
                     "violated_groups", "violation_rows", "holds")
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionAll(o)
    return res


# ------------------------------------------------------ dq_gaps_islands

_GI_ORACLE = """
WITH f AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
  FROM orders),
tagged AS (
  SELECT k, hit,
         k - row_number() OVER (PARTITION BY hit ORDER BY k) AS grp
  FROM f),
segs AS (
  SELECT hit, min(k) AS seg_start, max(k) AS seg_end,
         count(*) AS seg_len
  FROM tagged GROUP BY hit, grp),
ranked AS (
  SELECT CASE WHEN hit = 1 THEN 'island' ELSE 'gap' END AS kind,
         seg_start, seg_end, seg_len,
         row_number() OVER (PARTITION BY hit
                            ORDER BY seg_len DESC, seg_start) AS rk
  FROM segs)
SELECT kind, seg_start, seg_end, seg_len
FROM ranked WHERE rk <= 10
"""


@query("dq_gaps_islands", oracle=_GI_ORACLE)
def dq_gaps_islands(spark, sf_dir):
    """GAPS-AND-ISLANDS over the dense o_orderkey domain, segmented
    by the fulfilled flag (o_orderstatus = 'F'): maximal runs of
    fulfilled keys are ISLANDS, maximal runs of anything else are the
    GAPS between them — the top 10 longest of each, the classic
    completeness question ("which id ranges are fully processed /
    missing?"). Both segment kinds fall out of ONE pass by running
    the k − row_number() trick partitioned on the hit flag: within a
    flag value, consecutive keys share the difference, so the group
    key identifies the maximal run. Pure integers.

    Scale: the window partitions by the 2-value hit flag — at 100 TB
    that is the known two-partition skew shape, and the honest fix is
    range-repartitioning by key first so each task sees a contiguous
    slab (row_number within slab + slab offset); at the graded scale
    the single window is the clearer plan and the output is the
    O(#segments) compressed relation either way."""
    f = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        .alias("hit"),
    )
    w = Window.partitionBy("hit").orderBy("k")
    segs = (
        f.select("k", "hit",
                 (F.col("k") - F.row_number().over(w)).alias("grp"))
        .groupBy("hit", "grp")
        .agg(F.min("k").alias("seg_start"), F.max("k").alias("seg_end"),
             F.count(F.lit(1)).alias("seg_len"))
    )
    wr = Window.partitionBy("hit").orderBy(
        F.desc("seg_len"), F.asc("seg_start"))
    return (
        segs.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") <= 10)
        .select(
            F.when(F.col("hit") == 1, "island").otherwise("gap")
            .alias("kind"),
            "seg_start", "seg_end", "seg_len")
    )


# ------------------------------------------------------- llm_rouge_ngram

_ROUGE_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
prs AS (
  SELECT lang, lag(doc_id) OVER (PARTITION BY lang ORDER BY doc_id)
           AS doc_a,
         doc_id AS doc_b
  FROM docs),
pairs AS (SELECT * FROM prs WHERE doc_a IS NOT NULL),
uni AS (
  SELECT doc_id, w AS g, count(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS w FROM docs)
  GROUP BY doc_id, w),
big AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                                     i -> ws[i] || ' ' || ws[i + 1]))
                 AS g
        FROM docs)
  GROUP BY doc_id, g),
sizes AS (
  SELECT doc_id, len(ws) AS n1,
         CASE WHEN len(ws) >= 2 THEN len(ws) - 1 ELSE 0 END AS n2
  FROM docs),
ov1 AS (
  SELECT p.doc_a, p.doc_b,
         CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
  FROM pairs p
  JOIN uni a ON a.doc_id = p.doc_a
  JOIN uni b ON b.doc_id = p.doc_b AND b.g = a.g
  GROUP BY p.doc_a, p.doc_b),
ov2 AS (
  SELECT p.doc_a, p.doc_b,
         CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
  FROM pairs p
  JOIN big a ON a.doc_id = p.doc_a
  JOIN big b ON b.doc_id = p.doc_b AND b.g = a.g
  GROUP BY p.doc_a, p.doc_b)
SELECT p.doc_a, p.doc_b, p.lang,
       coalesce(ov1.ov, 0) AS ov1,
       coalesce(ov2.ov, 0) AS ov2,
       {sql_dround6_div('2 * coalesce(ov1.ov, 0)', 'sa.n1 + sb.n1')}
         AS rouge1_f6,
       {sql_dround6_div('2 * coalesce(ov2.ov, 0)', 'sa.n2 + sb.n2')}
         AS rouge2_f6
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
LEFT JOIN ov1 ON ov1.doc_a = p.doc_a AND ov1.doc_b = p.doc_b
LEFT JOIN ov2 ON ov2.doc_a = p.doc_a AND ov2.doc_b = p.doc_b
WHERE sa.n2 + sb.n2 > 0
"""


@query("llm_rouge_ngram", oracle=_ROUGE_ORACLE)
def llm_rouge_ngram(spark, sf_dir):
    """ROUGE-1 / ROUGE-2 F1 between consecutive same-language
    document pairs — the standard n-gram-overlap summary/quality
    metric, computed as MULTISET overlap (Σ min(count_a, count_b)
    over shared grams, the official ROUGE clipping rule) rather than
    set Jaccard (llm_dedup_ngram_jaccard's axis). F1 reduces to
    2·overlap/(|a| + |b|), a rational of exact integers under the
    floor-6dp tie rule. Pairing = lag over doc_id within lang — a
    deterministic stand-in for any candidate generator (the LSH
    families feed the same shape).

    Scale: gram counts are one explode + hash aggregate per n; the
    pair overlap is an equi-join keyed on (doc, gram) — for
    candidate pairs from LSH the join fans out only over actual
    candidates, never all pairs; clipped sums are partial-aggregable
    map-side."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("ws"))
    wl = Window.partitionBy("lang").orderBy("doc_id")
    pairs = (
        docs.select(
            "lang",
            F.lag("doc_id").over(wl).alias("doc_a"),
            F.col("doc_id").alias("doc_b"))
        .where(F.col("doc_a").isNotNull())
    )
    uni = (
        docs.select("doc_id", F.explode("ws").alias("g"))
        .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        docs.select(
            "doc_id",
            F.explode(F.when(
                F.size("ws") >= 2,
                F.expr("transform(sequence(0, size(ws) - 2),"
                       " i -> concat(ws[i], ' ', ws[i + 1]))"))
                .otherwise(F.array())).alias("g"))
        .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    )
    sizes = docs.select(
        "doc_id", F.size("ws").alias("n1"),
        F.when(F.size("ws") >= 2, F.size("ws") - 1).otherwise(0)
        .alias("n2"))

    def overlap(grams, name):
        a = grams.alias("a")
        b = grams.alias("b")
        return (
            pairs.join(a, F.col("a.doc_id") == F.col("doc_a"))
            .join(b, (F.col("b.doc_id") == F.col("doc_b"))
                  & (F.col("b.g") == F.col("a.g")))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.least("a.c", "b.c")).alias(name))
        )

    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pairs
        .join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .join(overlap(uni, "o1"), ["doc_a", "doc_b"], "left")
        .join(overlap(big, "o2"), ["doc_a", "doc_b"], "left")
        .where(F.col("sa.n2") + F.col("sb.n2") > 0)
        .select(
            "doc_a", "doc_b", "lang",
            F.coalesce("o1", F.lit(0)).alias("ov1"),
            F.coalesce("o2", F.lit(0)).alias("ov2"),
            dround6_div(F.coalesce("o1", F.lit(0)) * 2,
                        F.col("sa.n1") + F.col("sb.n1"))
            .alias("rouge1_f6"),
            dround6_div(F.coalesce("o2", F.lit(0)) * 2,
                        F.col("sa.n2") + F.col("sb.n2"))
            .alias("rouge2_f6"),
        )
    )


# -------------------------------------------------- llm_taxonomy_classify

_TAXONOMY = {
    "joins": ["join", "merge", "hash", "key"],
    "scans": ["scan", "filter", "column", "row"],
    "streaming": ["stream", "window", "batch", "group"],
    "sorting": ["sort", "order", "big", "small"],
}


def _taxonomy_oracle() -> str:
    vals = ", ".join(
        f"('{t}', '{k}')" for t, kws in sorted(_TAXONOMY.items())
        for k in kws)
    return f"""
    WITH dic(topic, kw) AS (VALUES {vals}),
    words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents),
    scores AS (
      SELECT w.doc_id, d.topic, count(*) AS score
      FROM words w JOIN dic d ON d.kw = w.w
      GROUP BY w.doc_id, d.topic),
    ranked AS (
      SELECT doc_id, topic, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, topic) AS rk,
             lead(score) OVER (PARTITION BY doc_id
                               ORDER BY score DESC, topic) AS second
      FROM scores)
    SELECT topic, count(*) AS n_docs,
           {sql_davg('score')} AS avg_score,
           {sql_davg('score - coalesce(second, 0)')} AS avg_margin
    FROM ranked WHERE rk = 1
    GROUP BY topic
    """


@query("llm_taxonomy_classify", oracle=_taxonomy_oracle())
def llm_taxonomy_classify(spark, sf_dir):
    """Keyword-dictionary TAXONOMY CLASSIFICATION — the rule-based
    domain tagger every corpus-curation pipeline runs before mixing
    (tag docs by topic, then weight topics): score each document per
    topic as the term frequency of the topic's keyword list, assign
    argmax (score DESC, topic ASC tiebreak), and report per-topic
    document counts, mean winning score, and mean argmax MARGIN
    (winner minus runner-up — the classifier-confidence signal that
    feeds downstream quality gates). Counts are exact integers; the
    means ride the decimal pipeline.

    Scale: the dictionary is a broadcast join against the exploded
    token stream (tokens × keywords never materializes — the join
    filters to keyword hits only); per-doc ranking windows on doc_id,
    which is the natural parallel key. Swapping the dictionary for a
    learned classifier's vocabulary changes nothing structurally."""
    dic = spark.createDataFrame(
        [(t, k) for t, kws in sorted(_TAXONOMY.items()) for k in kws],
        "topic string, kw string")
    words = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    )
    scores = (
        words.join(F.broadcast(dic), F.col("kw") == F.col("w"))
        .groupBy("doc_id", "topic")
        .agg(F.count(F.lit(1)).alias("score"))
    )
    wd = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("topic"))
    ranked = scores.select(
        "doc_id", "topic", "score",
        F.row_number().over(wd).alias("rk"),
        F.lead("score").over(wd).alias("second"),
    )
    return (
        ranked.where(F.col("rk") == 1)
        .groupBy("topic")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("score").alias("avg_score"),
            davg(F.col("score") - F.coalesce("second", F.lit(0)))
            .alias("avg_margin"),
        )
    )
