"""Round-10 wave-4 graded queries — matrix profile, cross-correlation,
CEP absence detection, grid DBSCAN, and asymmetric containment dedup.

Registered LAST in load_all (after round10b) so every name here sits
behind the certified tail (grading-rotation discipline,
queries/__init__.py). Reference citations are N/A — the reference
tree is empty (SURVEY.md §0); the binding spec is the driver
contract + SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import DEC, davg, dround6_div, dsum, sql_davg, sql_dsum

__all__ = ["load"]


def load() -> None:  # imported for side effects; keep a hook anyway
    pass


# --------------------------------------------------- ts_matrix_profile

_MP_M = 7       #: subsequence window (days)
_MP_EXCL = 3    #: trivial-match exclusion zone (m // 2)

_MP_ORACLE = f"""
WITH d AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('day', ts)) - 1 AS t
  FROM events GROUP BY event_type, date_trunc('day', ts)),
s AS (SELECT d.*, count(*) OVER (PARTITION BY event_type) AS n FROM d),
ks AS (SELECT unnest(range(0, {_MP_M})) AS k),
subs AS (
  SELECT event_type, t - k AS i, k, y
  FROM s CROSS JOIN ks
  WHERE t - k >= 0 AND t - k <= n - {_MP_M}),
st AS (
  SELECT event_type, i,
         {sql_davg('y')} AS mu,
         sqrt(({sql_dsum('y * y')} - {sql_dsum('y')} * {sql_dsum('y')}
               / {_MP_M}) / {_MP_M}) AS sig
  FROM subs GROUP BY event_type, i),
z AS (
  SELECT subs.event_type, subs.i, subs.k,
         (subs.y - st.mu) / st.sig AS z
  FROM subs JOIN st ON st.event_type = subs.event_type
                   AND st.i = subs.i
  WHERE st.sig > 0),
d2 AS (
  SELECT a.event_type, a.i, b.i AS j,
         {sql_dsum('(a.z - b.z) * (a.z - b.z)')} AS d2
  FROM z a JOIN z b
    ON b.event_type = a.event_type AND b.k = a.k
   AND abs(a.i - b.i) > {_MP_EXCL}
  GROUP BY a.event_type, a.i, b.i),
ranked AS (
  SELECT event_type, i, j, d2,
         row_number() OVER (PARTITION BY event_type, i
                            ORDER BY d2, j) AS rk
  FROM d2)
SELECT event_type, i, j AS nn_j, sqrt(d2) AS mp_dist
FROM ranked WHERE rk = 1
"""


@query("ts_matrix_profile", oracle=_MP_ORACLE)
def ts_matrix_profile(spark, sf_dir):
    """MATRIX PROFILE (UCR/Keogh) of each event type's daily count
    series: for every length-{_MP_M} subsequence, the z-normalized
    Euclidean distance to its NEAREST non-trivial neighbour (the
    |i−j| > {_MP_EXCL} exclusion zone discards self-overlap) plus
    that neighbour's index — low profile values mark motifs,
    spikes mark discords (anomalies), making this the modern
    all-purpose time-series primitive. Subsequences materialize by
    fanning each point to its ≤{_MP_M} covering windows via a
    broadcast offset range (never a per-row slice UDF); per-window
    moments and the pairwise distance sums all ride the exact
    decimal pipeline; μ/σ normalization and sqrt are identical IEEE
    ops on identical inputs, so no quantization is needed.

    Scale: O(w²) pair fan-out is PER SERIES (w = n − m + 1 windows,
    bounded by the day count), keyed by (series, offset) — millions
    of series parallelize; a long-series variant would swap the
    quadratic join for the STOMP rolling-dot-product recurrence,
    same output contract. Flat counts make σ = 0 subsequences
    possible; they are excluded, as in the reference algorithm."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ser = daily.select(
        "event_type", "y",
        (F.row_number().over(w) - 1).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    ks = spark.range(0, _MP_M).select(F.col("id").cast("int").alias("k"))
    subs = (
        ser.crossJoin(F.broadcast(ks))
        .where((F.col("t") - F.col("k") >= 0)
               & (F.col("t") - F.col("k") <= F.col("n") - _MP_M))
        .select("event_type", (F.col("t") - F.col("k")).alias("i"),
                "k", "y")
    )
    st = subs.groupBy("event_type", "i").agg(
        davg("y").alias("mu"),
        F.sqrt((dsum(F.col("y") * F.col("y"))
                - dsum("y") * dsum("y") / _MP_M) / _MP_M).alias("sig"),
    )
    z = (
        subs.join(st, ["event_type", "i"])
        .where(F.col("sig") > 0)
        .select("event_type", "i", "k",
                ((F.col("y") - F.col("mu")) / F.col("sig")).alias("z"))
    )
    a, b = z.alias("a"), z.alias("b")
    d2 = (
        a.join(b, (F.col("b.event_type") == F.col("a.event_type"))
               & (F.col("b.k") == F.col("a.k"))
               & (F.abs(F.col("a.i") - F.col("b.i")) > _MP_EXCL))
        .groupBy(F.col("a.event_type").alias("event_type"),
                 F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(dsum((F.col("a.z") - F.col("b.z"))
                  * (F.col("a.z") - F.col("b.z"))).alias("d2"))
    )
    wr = Window.partitionBy("event_type", "i").orderBy("d2", "j")
    return (
        d2.withColumn("rk", F.row_number().over(wr))
        .where(F.col("rk") == 1)
        .select("event_type", "i", F.col("j").alias("nn_j"),
                F.sqrt("d2").alias("mp_dist"))
    )


# ------------------------------------------------------- ts_crosscorr

_CCF_MAXLAG = 5

_CCF_ORACLE = f"""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {sql_dsum('value')} AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)),
s AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
           AS idx,
         y
  FROM d),
lags AS (SELECT unnest(range(-{_CCF_MAXLAG}, {_CCF_MAXLAG + 1}))
           AS lag),
j AS (
  SELECT a.event_type AS ta, b.event_type AS tb, l.lag,
         a.y AS x, b.y AS y
  FROM s a CROSS JOIN lags l
  JOIN s b ON b.idx = a.idx + l.lag AND a.event_type < b.event_type),
mom AS (
  SELECT ta, tb, lag, count(*) AS n,
         {sql_dsum('x')} AS sx, {sql_dsum('y')} AS sy,
         {sql_dsum('x * y')} AS sxy,
         {sql_dsum('x * x')} AS sx2, {sql_dsum('y * y')} AS sy2
  FROM j GROUP BY ta, tb, lag)
SELECT ta, tb, CAST(lag AS INT) AS lag, n,
       FLOOR(((sxy - sx * sy / n)
              / sqrt((sx2 - sx * sx / n) * (sy2 - sy * sy / n)))
             * 1000000.0 + 0.5) / 1000000.0 AS ccf6
FROM mom
WHERE n > 1 AND (sx2 - sx * sx / n) * (sy2 - sy * sy / n) > 0
"""


@query("ts_crosscorr", oracle=_CCF_ORACLE)
def ts_crosscorr(spark, sf_dir):
    """CROSS-CORRELATION FUNCTION between every event-type pair's
    daily value series at lags −{_CCF_MAXLAG}..{_CCF_MAXLAG}:
    CCF(ℓ) = Pearson(x_t, y_{{t+ℓ}}) over the overlap — the
    lead/lag detector (does type A's volume foreshadow type B's?)
    completing ts_autocorr (own past) and changefeed_corr_view
    (same-row bivariate). The five Pearson moments accumulate in
    exact decimal over the lag-shifted equi-join; the normalized
    quotient runs in IEEE doubles on bit-identical rational inputs,
    quantized at 6 dp with the variance-view floor tie rule.
    Degenerate overlaps (n ≤ 1 or zero variance on either side) are
    excluded in both engines rather than ANSI-dividing by zero.

    Scale: the join keys on the shifted day index of the bounded
    daily relation — each (pair, lag) cell is an independent
    aggregate; the lag range is an 11-row broadcast. At a million
    series the pair enumeration, not this plan, is the budget — the
    candidate set would come from an LSH/correlation sketch, same
    downstream shape."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(dsum("value").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    ser = daily.select(
        "event_type", (F.row_number().over(w) - 1).alias("idx"), "y")
    lags = spark.range(-_CCF_MAXLAG, _CCF_MAXLAG + 1).select(
        F.col("id").cast("int").alias("lag"))
    a, b = ser.alias("a"), ser.alias("b")
    j = (
        a.crossJoin(F.broadcast(lags))
        .join(b, (F.col("b.idx") == F.col("a.idx") + F.col("lag"))
              & (F.col("a.event_type") < F.col("b.event_type")))
        .select(F.col("a.event_type").alias("ta"),
                F.col("b.event_type").alias("tb"), "lag",
                F.col("a.y").alias("x"), F.col("b.y").alias("y"))
    )
    mom = j.groupBy("ta", "tb", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("x").alias("sx"), dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sx2"),
        dsum(F.col("y") * F.col("y")).alias("sy2"),
    )
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    vx = F.col("sx2") - F.col("sx") * F.col("sx") / F.col("n")
    vy = F.col("sy2") - F.col("sy") * F.col("sy") / F.col("n")
    return (
        mom.where((F.col("n") > 1) & (vx * vy > 0))
        .select(
            "ta", "tb", "lag", "n",
            (F.floor((cov / F.sqrt(vx * vy)) * F.lit(1000000.0)
                     + F.lit(0.5)).cast("double") / F.lit(1000000.0))
            .alias("ccf6"),
        )
    )


# --------------------------------------------------- seq_absence_detect

_ABS_WINDOW_MIN = 10

_ABS_ORACLE = f"""
WITH v AS (
  SELECT user_id, event_id, ts FROM events
  WHERE event_type = 'view'),
p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
flagged AS (
  SELECT v.user_id, v.event_id,
         CASE WHEN count(p.ts) > 0 THEN 1 ELSE 0 END AS converted
  FROM v LEFT JOIN p
    ON p.user_id = v.user_id
   AND p.ts > v.ts
   AND p.ts <= v.ts + INTERVAL {_ABS_WINDOW_MIN} MINUTE
  GROUP BY v.user_id, v.event_id)
SELECT user_id,
       count(*) AS n_views,
       CAST(sum(1 - converted) AS BIGINT) AS n_absent,
       FLOOR((sum(1 - converted)) * 1000000.0 / count(*) + 0.5)
         / 1000000.0 AS absent_rate6
FROM flagged GROUP BY user_id
"""


@query("seq_absence_detect", oracle=_ABS_ORACLE)
def seq_absence_detect(spark, sf_dir):
    """CEP ABSENCE detection — the pattern complement of
    seq_match_recognize/stream_match_recognize (which find sequences
    that DID happen): for every 'view' event, did NO 'purchase' by
    the same user follow within {_ABS_WINDOW_MIN} minutes? Reported
    per user as view count, unanswered-view count, and the
    abandonment rate (floor-6dp of an exact integer rational).
    Absence is a LEFT range-join with a zero-match test — the only
    way to observe a non-event in either engine — grouped first per
    view (any purchase in window?) then per user.

    Scale: the join keys on user_id and prunes by the time window;
    at 100 TB the same plan runs with both sides bucketed by
    user_id, or as the streaming twin via
    applyInPandasWithState with a {_ABS_WINDOW_MIN}-minute timer
    per view (timeout fires → absence emitted) — the batch form
    here is the oracle-checkable ground truth for that operator."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    flagged = (
        v.join(p, (F.col("p_user") == F.col("user_id"))
               & (F.col("p_ts") > F.col("ts"))
               & (F.col("p_ts") <= F.col("ts")
                  + F.expr(f"INTERVAL {_ABS_WINDOW_MIN} MINUTE")),
               "left")
        .groupBy("user_id", "event_id")
        .agg(F.when(F.count("p_ts") > 0, 1).otherwise(0)
             .alias("converted"))
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum(1 - F.col("converted")).alias("n_absent"),
        dround6_div(F.sum(1 - F.col("converted")),
                    F.count(F.lit(1))).alias("absent_rate6"),
    )


# ----------------------------------------------------- geo_dbscan_grid

_DB_CELL = 10.0  #: degrees; lat cells -8..7 (16), lon -18..17 (36)
# deterministic warped point cloud: a multiplicative hash spreads
# event ids uniformly, squaring warps density toward the low corner —
# the gradient gives the grid genuine dense regions at every SF
_DB_LAT = ("-80.0 + 160.0 * (CAST((event_id * 2654435761) % 4096"
           " AS DOUBLE) / 4096.0) * (CAST((event_id * 2654435761)"
           " % 4096 AS DOUBLE) / 4096.0)")
_DB_LON = ("-180.0 + 360.0 * (CAST((event_id * 40503) % 4093"
           " AS DOUBLE) / 4093.0) * (CAST((event_id * 40503) % 4093"
           " AS DOUBLE) / 4093.0)")

_DB_ORACLE = f"""
WITH RECURSIVE pts AS (
  SELECT {_DB_LAT} AS lat, {_DB_LON} AS lon FROM events),
cells AS (
  SELECT CAST(floor(lat / {_DB_CELL}) AS BIGINT) AS cl,
         CAST(floor(lon / {_DB_CELL}) AS BIGINT) AS cn,
         count(*) AS cnt
  FROM pts GROUP BY 1, 2),
s AS (SELECT count(*) AS k, sum(cnt) AS t FROM cells),
dense AS (
  SELECT cl, cn, cnt, (cl + 8) * 36 + (cn + 18) AS node
  FROM cells, s WHERE cnt * s.k >= 2 * s.t),
edges AS (
  SELECT a.node AS u, b.node AS v
  FROM dense a JOIN dense b
    ON abs(a.cl - b.cl) <= 1 AND abs(a.cn - b.cn) <= 1
   AND a.node <> b.node),
walk AS (
  SELECT node, node AS label FROM dense
  UNION
  SELECT e.v AS node, w.label
  FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.label < e.v),
comp AS (SELECT node, min(label) AS cluster FROM walk GROUP BY node)
SELECT d.cl AS cell_lat, d.cn AS cell_lon, d.cnt, comp.cluster
FROM dense d JOIN comp ON comp.node = d.node
"""


@query("geo_dbscan_grid", oracle=_DB_ORACLE)
def geo_dbscan_grid(spark, sf_dir):
    """Grid-cell DBSCAN over the deterministic warped point cloud:
    a cell is DENSE when its count is at least twice the mean
    occupied-cell count (the integer cross-multiplied comparison
    cnt·k ≥ 2·t — exact, no float threshold), and clusters are the
    connected components of dense cells under 8-neighbour adjacency
    — the standard grid reformulation of DBSCAN (dense cell ≈ core
    point, adjacency ≈ ε-reachability) that makes density
    clustering a BOUNDED-domain problem: the grid has at most
    16 × 36 cells at any corpus size, so everything after the one
    counting pass over the raw points is O(grid). Components run
    the same hash-min label propagation as
    graph_connected_components (one tiny shuffle per round,
    localCheckpoint lineage cut per the measured round-10 lesson);
    the oracle agrees on the fixpoint via a recursive reachability
    walk — a different algorithm, strongest available cross-check.
    Labels are the cell's row-major grid index, so cluster ids are
    integers identical in both engines."""
    pts = load_table(spark, sf_dir, "events").select(
        F.expr(_DB_LAT).alias("lat"), F.expr(_DB_LON).alias("lon"))
    cells = (
        pts.groupBy(
            F.floor(F.col("lat") / _DB_CELL).cast("long").alias("cl"),
            F.floor(F.col("lon") / _DB_CELL).cast("long").alias("cn"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = cells.agg(F.count(F.lit(1)).alias("k"),
                  F.sum("cnt").alias("t"))
    dense = (
        cells.join(F.broadcast(s))
        .where(F.col("cnt") * F.col("k") >= 2 * F.col("t"))
        .select("cl", "cn", "cnt",
                ((F.col("cl") + 8) * 36 + (F.col("cn") + 18))
                .alias("node"))
        .localCheckpoint()  # O(grid) rows; cuts the loop's base plan
    )
    a, b = dense.alias("a"), dense.alias("b")
    edges = (
        a.join(b, (F.abs(F.col("a.cl") - F.col("b.cl")) <= 1)
               & (F.abs(F.col("a.cn") - F.col("b.cn")) <= 1)
               & (F.col("a.node") != F.col("b.node")))
        .select(F.col("a.node").alias("u"), F.col("b.node").alias("v"))
        .localCheckpoint()
    )
    labels = dense.select("node", F.col("node").alias("label"))
    while True:
        nbr = (
            edges.join(labels, edges.u == labels.node)
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("label"),
                        F.coalesce("nbr_label", F.col("label")))
                .alias("label"),
                (F.coalesce("nbr_label", F.col("label"))
                 < F.col("label")).alias("changed"),
            )
            .localCheckpoint()
        )
        shrank = new_labels.where("changed").limit(1).count()
        labels = new_labels.select("node", "label")
        if not shrank:
            break
    return dense.join(labels, "node").select(
        F.col("cl").alias("cell_lat"), F.col("cn").alias("cell_lon"),
        "cnt", F.col("label").alias("cluster"))


# ----------------------------------------------- llm_containment_dedup

_CD_K = 3        #: shingle width (words)
_CD_MAXDF = 32   #: stop-shingle cap for candidate generation
_CD_THRESH = 0.5

_CD_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE len(string_split(text, ' ')) >= {_CD_K}),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(
           range(1, len(ws) - {_CD_K - 2}),
           i -> array_to_string(ws[i:i+{_CD_K - 1}], ' '))) AS g
  FROM docs),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
posts AS (
  SELECT g FROM sh GROUP BY g HAVING count(*) <= {_CD_MAXDF}),
cand AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
  FROM sh a JOIN posts USING (g) JOIN sh b USING (g)
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT c.da AS doc_a, c.db AS doc_b, c.inter,
       sa.sz AS size_a, sb.sz AS size_b,
       FLOOR(c.inter * 1000000.0 / sa.sz + 0.5) / 1000000.0
         AS cont_a6,
       FLOOR(c.inter * 1000000.0 / sb.sz + 0.5) / 1000000.0
         AS cont_b6
FROM cand c
JOIN sizes sa ON sa.doc_id = c.da
JOIN sizes sb ON sb.doc_id = c.db
WHERE c.inter * 2 >= sa.sz OR c.inter * 2 >= sb.sz
"""


@query("llm_containment_dedup", oracle=_CD_ORACLE)
def llm_containment_dedup(spark, sf_dir):
    """ASYMMETRIC CONTAINMENT dedup — |S_a ∩ S_b| / |S_min side|
    ≥ {_CD_THRESH} over distinct word-{_CD_K}-gram shingle sets:
    Jaccard (llm_dedup_ngram_jaccard, llm_jaccard_knn_text) misses
    the quote/excerpt case where a short document sits INSIDE a long
    one (the union dilutes the score); containment normalizes by one
    side and catches it — the Broder distinction (resemblance vs
    containment) every curation pipeline needs for sub-document
    dedup. Candidates come from the round-9 inverted-index recipe:
    one posting list per shingle with document frequency ≤
    {_CD_MAXDF} (the stop-shingle cut), so pair fan-out is
    O(capped df²) per shingle, never all-pairs. The threshold test
    cross-multiplies integers (inter·2 ≥ size) — exact; the reported
    per-side containments are floor-6dp rationals.

    Scale: shingling is one explode + distinct; the candidate join
    shuffles on the 16-byte-ish gram key; sizes broadcast-join back.
    The MinHash twin (llm_dedup_minhash) estimates the same
    containment from sketches when exact shingle sets are too wide
    to shuffle."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("ws"))
        .where(F.size("ws") >= _CD_K)
    )
    sh = (
        docs.select(
            "doc_id",
            F.explode(F.expr(
                f"transform(sequence(0, size(ws) - {_CD_K}),"
                f" i -> concat_ws(' ', slice(ws, i + 1, {_CD_K})))"))
            .alias("g"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    posts = (
        sh.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= _CD_MAXDF)
        .select("g")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    cand = (
        a.join(posts, "g").join(b.withColumnRenamed("doc_id", "db"),
                                "g")
        .where(F.col("a.doc_id") < F.col("db"))
        .groupBy(F.col("a.doc_id").alias("da"), "db")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        cand.join(sa, F.col("sa.doc_id") == F.col("da"))
        .join(sb, F.col("sb.doc_id") == F.col("db"))
        .where((F.col("inter") * 2 >= F.col("sa.sz"))
               | (F.col("inter") * 2 >= F.col("sb.sz")))
        .select(
            F.col("da").alias("doc_a"), F.col("db").alias("doc_b"),
            "inter",
            F.col("sa.sz").alias("size_a"),
            F.col("sb.sz").alias("size_b"),
            dround6_div(F.col("inter"), F.col("sa.sz"))
            .alias("cont_a6"),
            dround6_div(F.col("inter"), F.col("sb.sz"))
            .alias("cont_b6"),
        )
    )


# ------------------------------------------------ stream_absence_timeout

_SAT_WIN_MS = 10 * 60 * 1000
_SAT_WIN_US = _SAT_WIN_MS * 1000


def _absence_fn(key, pdf_iter, state):
    """Per-user pending-view state machine. Pending views resolve
    when a purchase lands in (view, view + 10 min] — μs-exact, the
    oracle's NOT EXISTS test — and EXPIRE as absence rows once the
    event-time watermark passes view + 10 min (ms-floored, the state
    API's unit). Expiry runs on BOTH branches: Spark delivers a
    batch's data to a key through the data invocation even when its
    timer has lapsed (hasTimedOut fires only for keys with no data),
    so a data-branch-less design would miss timers and then die
    re-arming a timeout at or below the watermark."""
    import pandas as pd

    if state.exists:
        ids, tss = state.get
        pending = list(zip(ids, tss))
    else:
        pending = []

    if not state.hasTimedOut:
        rows = []
        for pdf in pdf_iter:
            rows.append(pdf[["event_id", "event_type", "ts"]])
        if rows:
            allr = pd.concat(rows)
            allr["us"] = allr["ts"].astype("int64") // 1000
            allr = allr.sort_values(["us", "event_id"])
            for eid, et, us in zip(allr["event_id"], allr["event_type"],
                                   allr["us"]):
                if et == "view":
                    pending.append((int(eid), int(us)))
                else:  # purchase
                    pending = [
                        (e, t) for e, t in pending
                        if not (us > t and us <= t + _SAT_WIN_US)]
    wm = state.getCurrentWatermarkMs()
    expired = [(e, t) for e, t in pending
               if t // 1000 + _SAT_WIN_MS <= wm]
    pending = [(e, t) for e, t in pending
               if t // 1000 + _SAT_WIN_MS > wm]
    if pending:
        state.update(([e for e, _ in pending],
                      [t for _, t in pending]))
        state.setTimeoutTimestamp(
            min(t for _, t in pending) // 1000 + _SAT_WIN_MS)
    else:
        state.remove()
    if expired:
        yield pd.DataFrame({
            "user_id": [key[0]] * len(expired),
            "view_event_id": [e for e, _ in sorted(expired)],
            "view_ts": [pd.Timestamp(t, unit="us")
                        for _, t in sorted(expired)],
        })


@query(
    "stream_absence_timeout",
    oracle="""
    WITH v AS (
      SELECT user_id, event_id, ts FROM events
      WHERE event_type = 'view'),
    p AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT v.user_id, v.event_id AS view_event_id, v.ts AS view_ts
    FROM v
    WHERE v.ts + INTERVAL 10 MINUTE <=
          (SELECT max(ts) - INTERVAL 10 MINUTE FROM events
           WHERE event_type IN ('view', 'purchase'))
      AND NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = v.user_id AND p.ts > v.ts
          AND p.ts <= v.ts + INTERVAL 10 MINUTE)
    """,
)
def stream_absence_timeout(spark, sf_dir):
    """STREAMING absence detection — the applyInPandasWithState +
    EventTimeTimeout twin of seq_absence_detect (whose batch form is
    this operator's ground truth): each un-purchased view emits an
    absence row the moment the event-time watermark passes
    view + 10 min, which is how a real-time pipeline observes a
    NON-event (no join can produce a row from data that never
    arrived; a timer can). State per user is the O(pending-views)
    id/timestamp lists; purchases clear pending views μs-exactly;
    timers re-arm to the earliest pending deadline. The emitted set
    is deterministic and chunking-invariant on the time-ordered
    replay: every resolving purchase precedes its view's expiry
    watermark, and AvailableNow's closing no-data batch fires all
    timers at or below the final watermark (max ts − 10 min — the
    stream_session_timeout finding), so the result equals the batch
    anti-join restricted to that boundary.

    Scale: state shards by user across the state store and is
    evicted at expiry — timers are the idle-key GC; the watermark
    bounds state to one window of pending views per key."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..streaming.queries import _replayed, _to_table

    stream = (
        _replayed(spark, sf_dir)
        .where(F.col("event_type").isin("view", "purchase"))
        .select("user_id", "event_id", "event_type", "ts")
    )
    result = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _absence_fn,
            "user_id long, view_event_id long, view_ts timestamp",
            "ids array<bigint>, tss array<bigint>",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    return spark.table(_to_table(result, "absence", "append"))


# ------------------------------------------------- llm_watermark_detect

_WM_Z = 2.0

_WM_ORACLE = """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 2),
toks AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || '|' || ws[i + 1])) AS bg
  FROM docs),
scored AS (
  SELECT doc_id, count(*) AS n_scored,
         CAST(sum(CASE WHEN substr(md5(bg), 1, 1) <= '7'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_green
  FROM toks GROUP BY doc_id)
SELECT doc_id, n_scored, n_green,
       (2.0 * n_green - n_scored) / sqrt(CAST(n_scored AS DOUBLE))
         AS z,
       (2.0 * n_green - n_scored) / sqrt(CAST(n_scored AS DOUBLE))
         > 2.0 AS suspect
FROM scored
"""


@query("llm_watermark_detect", oracle=_WM_ORACLE)
def llm_watermark_detect(spark, sf_dir):
    """LLM WATERMARK detection (Kirchenbauer et al. greenlist test)
    — the synthetic-text screen a training-data pipeline runs before
    ingesting scraped corpora: a watermarking sampler biases each
    token toward a pseudorandom context-keyed "green list", so
    watermarked text shows a green fraction far above the null 1/2.
    Detector: token t is green iff the first hex nibble of
    md5(prev_token || '|' || token) ≤ '7' (exactly half the nibble
    space — md5 hex renders identically in every engine, the
    llm_dedup_minhash_md5 portability recipe), z = (2g − n)/√n is
    the one-proportion z-score, suspect at z > {_WM_Z}. On this
    organic fixture every doc should sit near z = 0 — the test's
    null calibration — while a watermarked shard would light up.
    Integer counts + one IEEE-exact sqrt and division: bit-identical,
    no quantization.

    Scale: one explode + hash aggregate per document, all JVM-side
    built-ins (md5/substr); the greenlist key never materializes a
    vocabulary — it is recomputed per bigram, exactly like the
    production detector."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("ws"))
        .where(F.size("ws") >= 2)
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(0, size(ws) - 2),"
            " i -> concat(ws[i], '|', ws[i + 1]))")).alias("bg"))
    scored = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(F.when(F.substring(F.md5("bg"), 1, 1) <= "7", 1)
              .otherwise(0)).alias("n_green"),
    )
    z = ((F.lit(2.0) * F.col("n_green") - F.col("n_scored"))
         / F.sqrt(F.col("n_scored").cast("double")))
    return scored.select(
        "doc_id", "n_scored", "n_green", z.alias("z"),
        (z > _WM_Z).alias("suspect"))


# --------------------------------------------------- ts_mann_kendall

_MK_ORACLE = f"""
WITH d AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {sql_dsum('value')} AS y
  FROM events GROUP BY event_type, date_trunc('day', ts)),
s AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
           AS idx,
         y
  FROM d),
pairs AS (
  SELECT a.event_type,
         CAST(sum(CAST(sign(b.y - a.y) AS INTEGER)) AS BIGINT) AS s_stat,
         count(*) AS n_pairs
  FROM s a JOIN s b
    ON b.event_type = a.event_type AND b.idx > a.idx
  GROUP BY a.event_type),
n_of AS (
  SELECT event_type, count(*) AS n FROM s GROUP BY event_type),
ties AS (
  SELECT event_type,
         CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (SELECT event_type, y, count(*) AS t FROM s
        GROUP BY event_type, y HAVING count(*) > 1)
  GROUP BY event_type),
fin AS (
  SELECT p.event_type, p.s_stat, n.n,
         (CAST(n.n * (n.n - 1) * (2 * n.n + 5)
               - coalesce(t.tie_term, 0) AS DOUBLE)) / 18.0 AS var_s
  FROM pairs p
  JOIN n_of n ON n.event_type = p.event_type
  LEFT JOIN ties t ON t.event_type = p.event_type)
SELECT event_type, s_stat, n,
       FLOOR(s_stat * 1000000.0 / (n * (n - 1) / 2) + 0.5)
         / 1000000.0 AS tau6,
       CASE WHEN s_stat > 0
              THEN (s_stat - 1.0) / sqrt(var_s)
            WHEN s_stat < 0
              THEN (s_stat + 1.0) / sqrt(var_s)
            ELSE 0.0 END AS z
FROM fin
"""


@query("ts_mann_kendall", oracle=_MK_ORACLE)
def ts_mann_kendall(spark, sf_dir):
    """MANN-KENDALL nonparametric trend test per event type's daily
    value series: S = Σ_{{i<j}} sign(y_j − y_i), Kendall's
    tau = S / C(n,2), and the continuity-corrected normal
    approximation z = (S ∓ 1)/√Var(S) with the full tie-group
    correction Var(S) = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)]/18 —
    the standard monotone-trend detector (is this metric drifting?)
    that assumes nothing about distribution, complementing
    ts_theil_sen (which estimates the slope this test scores).
    S and the tie terms are exact integers from a sign-pair
    self-join; tau quantizes with the floor tie rule; z is integer
    arithmetic + one IEEE-exact sqrt and division — bit-identical.

    Scale: the O(n²) sign-pair join is per series over the bounded
    daily relation (the Kendall trick of merge-sort inversion
    counting applies for long series — same output contract);
    millions of series parallelize on the series key."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(dsum("value").alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    s = daily.select(
        "event_type", (F.row_number().over(w) - 1).alias("idx"), "y")
    a, b = s.alias("a"), s.alias("b")
    pairs = (
        a.join(b, (F.col("b.event_type") == F.col("a.event_type"))
               & (F.col("b.idx") > F.col("a.idx")))
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.sum(F.signum(F.col("b.y") - F.col("a.y")).cast("int"))
             .alias("s_stat"))
    )
    n_of = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        s.groupBy("event_type", "y").agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .groupBy("event_type")
        .agg(F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
             .alias("tie_term"))
    )
    fin = (
        pairs.join(n_of, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type", "s_stat", "n",
            ((F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
              - F.coalesce("tie_term", F.lit(0))).cast("double")
             / 18.0).alias("var_s"),
        )
    )
    z = (
        F.when(F.col("s_stat") > 0,
               (F.col("s_stat") - 1.0) / F.sqrt("var_s"))
        .when(F.col("s_stat") < 0,
              (F.col("s_stat") + 1.0) / F.sqrt("var_s"))
        .otherwise(F.lit(0.0))
    )
    return fin.select(
        "event_type", "s_stat", "n",
        dround6_div(F.col("s_stat"),
                    F.col("n") * (F.col("n") - 1) / 2).alias("tau6"),
        z.alias("z"),
    )


# ------------------------------------------------ dq_checksum_partition

_CK_ORACLE = """
WITH rows_c AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS part,
         md5(CAST(o_orderkey AS VARCHAR) || '|'
             || CAST(o_custkey AS VARCHAR) || '|'
             || o_orderstatus || '|' || o_orderpriority || '|'
             || strftime(o_orderdate, '%Y-%m-%d')) AS h
  FROM orders)
SELECT part, count(*) AS n_rows,
       CAST(sum(CAST('0x' || substr(h, 1, 8) AS BIGINT)) AS BIGINT)
         AS checksum
FROM rows_c GROUP BY part
"""


@query("dq_checksum_partition", oracle=_CK_ORACLE)
def dq_checksum_partition(spark, sf_dir):
    """PER-PARTITION TABLE CHECKSUMS — the cross-system sync audit
    (did the replica receive exactly these rows?) that dq_table_diff
    answers row-by-row, answered here in O(partitions) output: each
    month's checksum is the SUM of a 32-bit integer digest of every
    row's canonical string (md5 first 8 hex chars — Spark parses via
    conv(hex,16,10), DuckDB via CAST('0x…'), both unsigned-exact in
    a BIGINT sum), making the checksum order-insensitive and
    mergeable — partial checksums from shards add up, the property
    that lets two systems compare without co-locating data. Only
    integer/string/date columns enter the canonical string: float
    rendering is engine-specific and belongs in value-level diffs,
    not identity checksums (documented contract).

    Scale: one scan, one hash aggregate keyed by partition; the
    output is one row per partition regardless of table size."""
    o = load_table(spark, sf_dir, "orders")
    h = F.md5(F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"), F.col("o_orderpriority"),
        F.date_format("o_orderdate", "yyyy-MM-dd")))
    return (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("part"),
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            .alias("hv"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("hv").alias("checksum"))
    )


# ----------------------------------------------------- graph_modularity

_GM_ORACLE = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 4 = 0),
pairs AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
lab AS (
  SELECT p.u, p.v, pu.p_brand AS bu, pv.p_brand AS bv
  FROM pairs p
  JOIN part pu ON pu.p_partkey = p.u
  JOIN part pv ON pv.p_partkey = p.v),
m AS (SELECT count(*) AS m FROM pairs),
intra AS (
  SELECT bu AS brand, count(*) AS e_in
  FROM lab WHERE bu = bv GROUP BY bu),
degs AS (
  SELECT brand, CAST(sum(cnt) AS BIGINT) AS deg
  FROM (
    SELECT bu AS brand, count(*) AS cnt FROM lab GROUP BY bu
    UNION ALL
    SELECT bv AS brand, count(*) AS cnt FROM lab GROUP BY bv) t
  GROUP BY brand)
SELECT d.brand,
       coalesce(i.e_in, 0) AS e_in, d.deg,
       FLOOR((coalesce(i.e_in, 0) * 1000000.0 / m.m
              - (CAST(d.deg AS DOUBLE) * d.deg * 1000000.0)
                / (4.0 * m.m * m.m)) + 0.5) / 1000000.0 AS q_contrib6
FROM degs d LEFT JOIN intra i ON i.brand = d.brand
CROSS JOIN m
"""


@query("graph_modularity", oracle=_GM_ORACLE)
def graph_modularity(spark, sf_dir):
    """MODULARITY decomposition of the part co-purchase graph under
    the BRAND partition: per brand b, Q_b = e_b/m − (deg_b/2m)² —
    intra-brand edge fraction minus its null-model expectation
    (Newman-Girvan). Σ Q_b near 0 means co-purchases ignore brand
    boundaries; positive brands are shopping-basket communities. The
    per-brand decomposition (rather than one scalar) is what a
    community-evaluation job reports, and unlike component-based
    partitions it is non-degenerate (components make every edge
    intra by construction). Both Q terms are rationals of exact
    integers; the combined contribution quantizes once at 6 dp with
    the floor tie rule (note: quantizing the DIFFERENCE, not each
    term — one rounding per output value).

    Scale: rides the shared persisted edge relation; brand labels
    broadcast from the part dim (two broadcast joins); everything
    after is two hash aggregates on the brand key and a 1-row edge
    count broadcast back."""
    from .analytics_ext import _copurchase_pairs

    pairs = _copurchase_pairs(spark, sf_dir)
    brands = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), F.col("p_brand").alias("b"))
    lab = (
        pairs.join(F.broadcast(brands).alias("pu"),
                   F.col("pu.pk") == F.col("u"))
        .join(F.broadcast(brands).alias("pv"),
              F.col("pv.pk") == F.col("v"))
        .select(F.col("pu.b").alias("bu"), F.col("pv.b").alias("bv"))
    )
    m = pairs.agg(F.count(F.lit(1)).alias("m"))
    intra = (
        lab.where(F.col("bu") == F.col("bv"))
        .groupBy(F.col("bu").alias("brand"))
        .agg(F.count(F.lit(1)).alias("e_in"))
    )
    degs = (
        lab.select(F.col("bu").alias("brand"))
        .unionAll(lab.select(F.col("bv").alias("brand")))
        .groupBy("brand").agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        degs.join(intra, "brand", "left")
        .join(F.broadcast(m))
        .select(
            "brand",
            F.coalesce("e_in", F.lit(0)).alias("e_in"), "deg",
            (F.floor(
                F.coalesce("e_in", F.lit(0)) * F.lit(1000000.0)
                / F.col("m")
                - (F.col("deg").cast("double") * F.col("deg")
                   * F.lit(1000000.0))
                / (F.lit(4.0) * F.col("m") * F.col("m"))
                + F.lit(0.5)).cast("double") / F.lit(1000000.0))
            .alias("q_contrib6"),
        )
    )


# ------------------------------------------------- ts_spectral_entropy

_SE_ORACLE = f"""
WITH d AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY date_trunc('day', ts)) - 1 AS t
  FROM events GROUP BY event_type, date_trunc('day', ts)),
s AS (SELECT d.*, count(*) OVER (PARTITION BY event_type) AS n FROM d),
ks AS (SELECT unnest(range(1, 11)) AS k),
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
  SELECT event_type, k, power,
         CAST(sum(CAST(power AS DECIMAL(18,6)))
              OVER (PARTITION BY event_type) AS DOUBLE) AS total
  FROM pw),
sh AS (
  SELECT event_type, power / total AS p FROM tot WHERE power > 0)
SELECT event_type,
       {sql_dsum(
           '-(p * (floor(ln(p) * 1000000000.0 + 0.5)'
           ' / 1000000000.0))')}
         / (floor(ln(10) * 1000000000.0 + 0.5) / 1000000000.0)
         AS entropy,
       max(p) AS max_share
FROM sh GROUP BY event_type
"""


@query("ts_spectral_entropy", oracle=_SE_ORACLE)
def ts_spectral_entropy(spark, sf_dir):
    """SPECTRAL ENTROPY of each daily count series' normalized
    periodogram: H = −Σ p_k ln p_k / ln K ∈ [0, 1] — the one-number
    regularity score (≈1 = white noise, ≈0 = one dominant cycle)
    that complements ts_periodogram's full spectrum; the standard
    forecastability feature in ts feature sets (tsfresh/catch22
    lineage). Shares reuse the periodogram pipeline (bit-identical
    cos/sin, decimal product sums); each ln output quantizes at 9 dp
    (the module's ln rule — including the ln(10) normalizer) so the
    entropy sum runs on identical doubles in both engines, then
    accumulates in exact decimal.

    Scale: identical posture to ts_periodogram — one daily
    aggregate, a 10-row broadcast, two hash aggregates per series."""
    from .round10b import _daily

    daily = _daily(spark, sf_dir, F.count(F.lit(1)).cast("double"))
    w = Window.partitionBy("event_type").orderBy("day")
    ser = daily.select(
        "event_type", "y",
        (F.row_number().over(w) - 1).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    ks = spark.range(1, 11).select(F.col("id").cast("int").alias("k"))
    terms = ser.crossJoin(F.broadcast(ks)).withColumn(
        "theta", F.expr("2 * pi() * k * t / n"))
    comps = terms.groupBy("event_type", "k").agg(
        dsum(F.col("y") * F.cos("theta")).alias("a"),
        dsum(F.col("y") * F.sin("theta")).alias("b"),
    )
    pw = comps.select(
        "event_type",
        (F.col("a") * F.col("a") + F.col("b") * F.col("b"))
        .alias("power"),
    )
    wk = Window.partitionBy("event_type")
    sh = (
        pw.withColumn(
            "total",
            F.sum(F.col("power").cast(DEC)).over(wk).cast("double"))
        .where(F.col("power") > 0)
        .select("event_type",
                (F.col("power") / F.col("total")).alias("p"))
    )
    lnp = (F.floor(F.log(F.col("p")) * F.lit(1000000000.0)
                   + F.lit(0.5)).cast("double") / F.lit(1000000000.0))
    ln10 = (F.floor(F.log(F.lit(10.0)) * F.lit(1000000000.0)
                    + F.lit(0.5)).cast("double") / F.lit(1000000000.0))
    return sh.groupBy("event_type").agg(
        (dsum(-(F.col("p") * lnp)) / ln10).alias("entropy"),
        F.max("p").alias("max_share"),
    )


# --------------------------------------------------------- seq_top_paths

_TP_LEN = 8
_TP_K = 20

_TP_ORACLE = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
p AS (
  SELECT user_id,
         string_agg(event_type, ' > ' ORDER BY rn) AS path
  FROM r WHERE rn <= {_TP_LEN} GROUP BY user_id)
SELECT path, count(*) AS n_users
FROM p GROUP BY path
ORDER BY n_users DESC, path LIMIT {_TP_K}
"""


@query("seq_top_paths", oracle=_TP_ORACLE)
def seq_top_paths(spark, sf_dir):
    """TOP USER PATHS — the product-analytics path enumeration that
    sits between funnel_conversion (a FIXED pattern) and
    seq_transition_matrix (single steps): each user's first
    {_TP_LEN} events, in (ts, event_id) order, joined into a path
    string; the {_TP_K} most common paths by user count (count DESC,
    path ASC total order). Spark's collect_list is UNORDERED by
    contract, so ordering is reconstructed deterministically by
    collecting (rn, event_type) structs and sort_array-ing before
    the join — the portable ordered-string-agg recipe (DuckDB's
    string_agg ... ORDER BY is the native form).

    Scale: one window to rank events within user (partitioned by the
    natural key), one hash aggregate per user, one aggregate per
    path, and a distributed TakeOrderedAndProject for the cut. Path
    cardinality is bounded by min(users, |alphabet|^len); the
    head-path skew all real clickstreams show lands harmlessly in
    the final tiny aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = (
        ev.select("user_id", "event_type",
                  F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _TP_LEN)
    )
    paths = (
        ranked.groupBy("user_id")
        .agg(F.sort_array(
            F.collect_list(F.struct("rn", "event_type"))).alias("s"))
        .select(F.concat_ws(
            " > ", F.expr("transform(s, x -> x.event_type)"))
            .alias("path"))
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(_TP_K)
    )


# -------------------------------------------------------- agg_moments_34

_M34 = "DECIMAL(38,0)"  #: micro-unit power sums; 4th power ≈ 1e17/row


def _m34_sql(p: int) -> str:
    # left-assoc double power, floor micro-quantized — the same per-row
    # IEEE op sequence the Spark side runs, so each row's contribution
    # is bit-identical before the order-exact decimal accumulation
    x = "value"
    for _ in range(p - 1):
        x = f"({x}) * value"
    return (f"CAST(sum(CAST(floor(({x}) * 1000000.0 + 0.5) AS {_M34}))"
            f" AS DOUBLE) / 1000000.0")


_M34_ORACLE = f"""
WITH mom AS (
  SELECT event_type, count(value) AS n,
         {_m34_sql(1)} AS s1, {_m34_sql(2)} AS s2,
         {_m34_sql(3)} AS s3, {_m34_sql(4)} AS s4
  FROM events GROUP BY event_type)
SELECT event_type, n,
       s1 / n AS mean,
       s2 / n - (s1 / n) * (s1 / n) AS m2,
       (s3 / n - 3 * (s1 / n) * (s2 / n)
        + 2 * (s1 / n) * (s1 / n) * (s1 / n))
         / ((s2 / n - (s1 / n) * (s1 / n))
            * sqrt(s2 / n - (s1 / n) * (s1 / n))) AS skewness,
       (s4 / n - 4 * (s1 / n) * (s3 / n)
        + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
         / ((s2 / n - (s1 / n) * (s1 / n))
            * (s2 / n - (s1 / n) * (s1 / n))) - 3.0 AS ex_kurtosis
FROM mom WHERE n > 1 AND s2 / n - (s1 / n) * (s1 / n) > 0
"""


@query("agg_moments_34", oracle=_M34_ORACLE)
def agg_moments_34(spark, sf_dir):
    """Population SKEWNESS and EXCESS KURTOSIS per group from raw
    power sums — the 3rd/4th-moment completion of agg_stats'
    mean/variance band: m_k expands in raw moments (m3 = E[x³] −
    3μE[x²] + 2μ³, m4 = E[x⁴] − 4μE[x³] + 6μ²E[x²] − 3μ⁴), skew =
    m3/m2^{{3/2}}, excess kurtosis = m4/m2² − 3. Each per-row power
    is computed in DOUBLE with an explicit left-assoc op order (IEEE
    multiplies are exact-rounded, so bit-identical cross-engine),
    micro-quantized half-up — floor(x·1e6 + 0.5), the dround6 tie
    rule (unbiased, unlike plain floor);
    decimal-product casts round DIFFERENTLY in the two engines at
    4th-power magnitude (probed r11) — and accumulated in
    DECIMAL(38,0) micro-units for an ORDER-EXACT sum. Every
    downstream expression is the
    IDENTICAL double op sequence in both engines, with m2^{{3/2}}
    spelled m2·sqrt(m2) (sqrt is IEEE-exact; pow(x, 1.5) is NOT
    guaranteed identical cross-engine and never appears).

    Scale: one partial+final hash aggregate — the four sums are
    map-side combinable (the one-pass moment pattern that beats
    two-pass centered algorithms at 100 TB; decimal accumulation
    also makes it ORDER-EXACT, which float one-pass moments are
    not)."""
    v = F.col("value")

    def _q(c):  # half-up micro-quantize a double power term
        return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast(_M34)

    def _s(c, name):  # order-exact micro-unit sum, back to double
        return (F.sum(_q(c)).cast("double") / F.lit(1000000.0)).alias(name)

    mom = load_table(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count("value").alias("n"),
        _s(v, "s1"),
        _s(v * v, "s2"),
        _s((v * v) * v, "s3"),
        _s(((v * v) * v) * v, "s4"),
    )
    mean = F.col("s1") / F.col("n")
    ex2 = F.col("s2") / F.col("n")
    ex3 = F.col("s3") / F.col("n")
    ex4 = F.col("s4") / F.col("n")
    m2 = ex2 - mean * mean
    m3 = ex3 - 3 * mean * ex2 + 2 * mean * mean * mean
    m4 = (ex4 - 4 * mean * ex3 + 6 * mean * mean * ex2
          - 3 * mean * mean * mean * mean)
    return (
        mom.where((F.col("n") > 1) & (m2 > 0))
        .select(
            "event_type", "n", mean.alias("mean"), m2.alias("m2"),
            (m3 / (m2 * F.sqrt(m2))).alias("skewness"),
            (m4 / (m2 * m2) - 3.0).alias("ex_kurtosis"),
        )
    )
