"""Round-8 wave, part 2 (mechanical split from round8.py, r9;
registry order byte-identical — this module imports DIRECTLY after
round8 in load_all): index-quality metrics (MRR), SemDeDup epsilon
sweep, drift timeline, observed-metrics stream, the catalog stream
sink, format/text connectors, filter calibration, Mann-Whitney U,
CUSUM changepoints, and the per-document datasheet.

Same determinism posture as round8 (see its module docstring).
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..tmputil import scratch_dir
from . import query
from ._util import sql_dsum
from .round8 import _KS_A, _KS_B, _r8_dot

# -------------------------------------------------------------- llm_ann_mrr

def _mrr_oracle() -> str:
    # executor-side pandas-UDF workers re-import THIS module standalone
    # (cloudpickle references _holt_fit/_cusum_fit by module), so the
    # provider of the composed oracle must be imported here — relying
    # on load_all()'s order would KeyError in the worker and kill every
    # round-8 applyInPandas task (caught by the r8 full suite)
    from . import llm_pipeline  # noqa: F401
    from . import ORACLES as _REG

    dot = ("list_aggregate(list_transform(range(1, len({x})+1),"
           " i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)),"
           " 'sum')")
    cos = (f"{dot.format(x='e.embedding', y='q.qe')}"
           f" / (sqrt({dot.format(x='e.embedding', y='e.embedding')})"
           f" * sqrt({dot.format(x='q.qe', y='q.qe')}))")
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe
      FROM embeddings WHERE vec_id % 50 = 0),
    truth AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, e.vec_id,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY {cos} DESC, e.vec_id) AS rn
        FROM embeddings e JOIN q ON e.vec_id % 50 <> 0) t
      WHERE rn = 1),
    lsh AS (
      SELECT qid, vec_id,
             row_number() OVER (PARTITION BY qid
               ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM ({_REG['llm_knn_join']}) j),
    rr AS (
      SELECT t.qid,
             COALESCE(1.0 / l.rnk, 0.0) AS rr
      FROM truth t LEFT JOIN lsh l
        ON l.qid = t.qid AND l.vec_id = t.vec_id)
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CAST(rr AS DECIMAL(18,6))) AS DOUBLE) / count(*)
             AS mrr_at_5
    FROM rr
    """


@query("llm_ann_mrr", oracle=_mrr_oracle())
def llm_ann_mrr(spark, sf_dir):
    """MRR@5 of the LSH k-NN JOIN against exact ground truth — the
    rank-AWARE companion to llm_ann_recall's set-overlap metric (two
    indexes with equal recall can rank the true neighbor first vs
    last; MRR tells them apart, and retrieval-augmented training
    cares exactly about that). Ground truth is each anchor's true
    top-1 over the same candidate universe the index searches; the
    reciprocal rank is 0 when the index misses it entirely. The
    oracle REUSES llm_knn_join's registered oracle text verbatim as
    a subquery, so the metric can never drift from the index it
    evaluates.

    Scale: ground truth is the hard-negatives shape (broadcast
    anchors, one corpus scan, per-anchor window top-1) — O(anchors x
    corpus) by construction, which is exactly what an exact-truth
    eval costs. The fixture's vec_id%50 anchor rule is
    corpus-proportional for oracle convenience; at corpus scale the
    eval panel is a FIXED sample (first K anchors), keeping the
    brute-force truth O(K x corpus) — one bounded scan — while the
    index under test stays bucket-pruned. The evaluation join
    touches k rows per anchor. The MRR mean routes through
    DECIMAL(18,6) (1/3 is not binary-exact; the quantized sum is
    order-insensitive in both engines)."""
    from .llm_pipeline import llm_knn_join

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"))
    ee, qe = F.col("embedding"), F.col("qe")
    cos = _r8_dot(ee, qe) / (
        F.sqrt(_r8_dot(ee, ee)) * F.sqrt(_r8_dot(qe, qe)))
    w_q = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("vec_id"))
    truth = (
        e.where(F.col("vec_id") % 50 != 0)
        .crossJoin(F.broadcast(q))
        .select("qid", "vec_id", cos.alias("cos"))
        .withColumn("rn", F.row_number().over(w_q))
        .where(F.col("rn") == 1)
        .select("qid", "vec_id")
    )
    w_l = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    lsh = (
        llm_knn_join(spark, sf_dir)
        .withColumn("rnk", F.row_number().over(w_l))
        .select(F.col("qid").alias("l_qid"),
                F.col("vec_id").alias("l_vid"), "rnk")
    )
    rr = (
        truth.join(
            lsh,
            (truth.qid == lsh.l_qid) & (truth.vec_id == lsh.l_vid),
            "left")
        .select(F.coalesce(1.0 / F.col("rnk"), F.lit(0.0)).alias("rr"))
    )
    return rr.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (F.sum(F.col("rr").cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("mrr_at_5"),
    )


# ---------------------------------------------------- llm_semdedup_eps_sweep

#: cosine cutoffs for the semantic-dedup epsilon sweep; starts at the
#: pair relation's own floor (llm_neardup_embedding emits > 0.35).
_EPS_GRID = [0.35, 0.40, 0.45, 0.50, 0.55, 0.60, 0.65, 0.70]


def _eps_oracle() -> str:
    from . import llm  # noqa: F401 — see _mrr_oracle: standalone-import safety
    from . import ORACLES as _REG

    arms = ", ".join(f"({t})" for t in _EPS_GRID)
    return f"""
    WITH pairs AS ({_REG['llm_neardup_embedding']}),
    g AS (SELECT * FROM (VALUES {arms}) AS v(eps)),
    n AS (SELECT count(*) AS n_vecs FROM embeddings)
    SELECT g.eps,
           CAST(count(CASE WHEN p.cos_sim > g.eps THEN 1 END)
                AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT CASE WHEN p.cos_sim > g.eps
                      THEN p.vec_b END) AS BIGINT) AS n_dropped,
           CAST(count(DISTINCT CASE WHEN p.cos_sim > g.eps
                      THEN p.vec_b END) AS DOUBLE)
             / CAST((SELECT n_vecs FROM n) AS DOUBLE) AS share_dropped
    FROM pairs p CROSS JOIN g
    GROUP BY g.eps
    """


@query("llm_semdedup_eps_sweep", oracle=_eps_oracle())
def llm_semdedup_eps_sweep(spark, sf_dir):
    """SemDeDup epsilon sweep (Abbas et al. 2023 pick their cosine
    cutoff exactly this way): for each candidate threshold, the
    surviving near-dup pair count, the documents a keep-lowest-id
    rule would drop, and the corpus share dropped — the
    retention-vs-redundancy curve read before committing a semantic
    dedup pass (llm_semantic_dedup_cluster applies ONE epsilon; this
    chooses it). The oracle reuses llm_neardup_embedding's registered
    oracle verbatim as the pair source, so the sweep can never drift
    from the dedup path it calibrates.

    Scale: the pair relation is already the bounded banded-LSH
    candidate set; the whole grid is ONE conditional-aggregate pass
    over it (count + count-distinct per arm — Spark expands by
    |grid|, bounded), never |grid| passes over the corpus."""
    from .llm import llm_neardup_embedding

    pairs = llm_neardup_embedding(spark, sf_dir)
    n = load_table(spark, sf_dir, "embeddings").agg(
        F.count(F.lit(1)).alias("n_vecs"))
    aggs = []
    for i, t in enumerate(_EPS_GRID):
        above = F.col("cos_sim") > F.lit(t)
        aggs += [
            F.count(F.when(above, 1)).alias(f"p{i}"),
            F.count_distinct(
                F.when(above, F.col("vec_b"))).alias(f"d{i}"),
        ]
    wide = pairs.agg(*aggs).crossJoin(F.broadcast(n))
    arms = F.array(*[
        F.struct(
            F.lit(t).alias("eps"),
            F.col(f"p{i}").alias("n_pairs"),
            F.col(f"d{i}").alias("n_dropped"),
            (F.col(f"d{i}").cast("double")
             / F.col("n_vecs").cast("double")).alias("share_dropped"),
        )
        for i, t in enumerate(_EPS_GRID)
    ])
    return (
        wide.select(F.explode(arms).alias("a"))
        .select("a.eps", "a.n_pairs", "a.n_dropped", "a.share_dropped")
    )


# ---------------------------------------------------- dq_drift_timeline

#: fixed-width value bins for the PSI trajectory (domain [0, ~561))
#: and the add-one smoothing that keeps empty bins finite — both
#: deterministic, no baseline-quantile circularity.
_PSI_BINS, _PSI_W = 12, 50.0


@query(
    "dq_drift_timeline",
    oracle=f"""
    WITH c AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(least(floor(value / {_PSI_W}),
                        {_PSI_BINS - 1}) AS BIGINT) AS bin,
             count(*) AS cnt
      FROM events GROUP BY 1, 2),
    days AS (
      SELECT day, sum(cnt) AS day_tot,
             min(day) OVER () AS day0
      FROM c GROUP BY day),
    grid AS (
      SELECT d.day, d.day_tot, d.day0, b.bin,
             (CAST(coalesce(c.cnt, 0) AS DOUBLE) + 1.0)
               / (CAST(d.day_tot AS DOUBLE) + {_PSI_BINS}.0) AS p
      FROM days d
      CROSS JOIN (SELECT unnest(range({_PSI_BINS})) AS bin) b
      LEFT JOIN c ON c.day = d.day AND c.bin = b.bin),
    based AS (
      SELECT g.day, g.bin, g.p, g.day0, b0.p AS p0
      FROM grid g
      JOIN grid b0 ON b0.day = g.day0 AND b0.bin = g.bin),
    terms AS (
      SELECT day, day0, (p - p0) * ln(p / p0) AS term
      FROM based)
    SELECT day,
           CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE) AS psi,
           CAST(sum(CAST(term AS DECIMAL(18,6))) AS DOUBLE) > 0.2
             AS drift_alarm
    FROM terms
    WHERE day > day0
    GROUP BY day
    """,
)
def dq_drift_timeline(spark, sf_dir):
    """PSI drift TRAJECTORY — the production form of dq_drift_psi's
    static two-cohort comparison: every day's value distribution
    scored against the day-0 baseline with the Population Stability
    Index over fixed-width bins (add-one smoothing keeps empty bins
    finite; bins a day never saw still contribute, via the smoothed
    floor probability, exactly as the textbook PSI demands), plus
    the conventional psi > 0.2 "significant shift" alarm — the
    monitoring table a model-serving or ingest pipeline charts daily.

    Scale shape: ONE scan -> a (day) x pivot(bin) aggregate in one
    pass (explicit bin value list, so missing cells densify to zero
    without a skeleton join — the join/branch forms re-execute the
    corpus scan per marginal, the round-8 plan lesson); the baseline
    row attaches by a first_value window over the bounded day
    relation; per-day PSI is a fixed 12-term sum of DECIMAL(18,6)-
    quantized doubles (decimal addition is associative, so the
    row-wise Spark sum equals the oracle's per-day decimal SUM).
    Fixed-width binning keeps the bin domain constant at any corpus
    size; a heavy-tailed measure would log-scale the width, not
    widen the relation."""
    ev = load_table(spark, sf_dir, "events")
    bins = list(range(_PSI_BINS))
    wide = (
        ev.select(
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.least(F.floor(F.col("value") / _PSI_W),
                    F.lit(_PSI_BINS - 1)).cast("long").alias("bin"),
        )
        .groupBy("day")
        .pivot("bin", bins)
        .agg(F.count(F.lit(1)))
    )
    cnt = [F.coalesce(F.col(str(b)), F.lit(0)) for b in bins]
    day_tot = cnt[0]
    for c in cnt[1:]:
        day_tot = day_tot + c
    dense = wide.select(
        "day",
        *[cnt[b].alias(f"c{b}") for b in bins],
        day_tot.alias("day_tot"),
    )
    probs = dense.select(
        "day",
        *[((F.col(f"c{b}").cast("double") + 1.0)
           / (F.col("day_tot").cast("double") + float(_PSI_BINS)))
          .alias(f"p{b}") for b in bins],
    )
    w_base = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    based = probs.select(
        "day",
        *[F.col(f"p{b}") for b in bins],
        *[F.first(f"p{b}").over(w_base).alias(f"b{b}") for b in bins],
        F.first("day").over(w_base).alias("day0"),
    )

    def term(b):
        p, p0 = F.col(f"p{b}"), F.col(f"b{b}")
        return ((p - p0) * F.log(p / p0)).cast("decimal(18,6)")

    psi_dec = term(0)
    for b in bins[1:]:
        psi_dec = psi_dec + term(b)
    return (
        based.where(F.col("day") > F.col("day0"))
        .select("day", psi_dec.cast("double").alias("psi"))
        .select("day", "psi", (F.col("psi") > 0.2).alias("drift_alarm"))
    )


# ---------------------------------------------------- stream_observe_metrics

_OBS_CACHE: dict = {}


def _obs_oracle() -> str:
    from ..streaming.replay import default_chunks

    nb = default_chunks()
    return f"""
    WITH numbered AS (
      SELECT event_id, value,
             row_number() OVER (ORDER BY event_id) - 1 AS rn,
             count(*) OVER () AS n
      FROM events)
    SELECT CAST(floor(rn / ceil(n / {nb}.0)) AS BIGINT) AS batch_id,
           count(*) AS n_rows,
           {sql_dsum('value')} AS sum_value,
           CAST(count(CASE WHEN value > 500 THEN 1 END) AS BIGINT)
             AS n_extreme
    FROM numbered
    GROUP BY 1
    """


@query("stream_observe_metrics", oracle=_obs_oracle())
def stream_observe_metrics(spark, sf_dir):
    """STREAMING OBSERVED METRICS — DataFrame.observe() on a
    streaming source (the in-flight data-quality counters every
    production pipeline attaches: row volume, value total, an
    extreme-value counter), surfaced per micro-batch through
    StreamingQueryProgress.observedMetrics and graded as a TRAJECTORY
    against the exact per-chunk reconstruction. This is the
    engine-side twin of scan_observed_metrics (batch observe): the
    metrics ride the existing plan as accumulator-style aggregates —
    ZERO extra passes, no second subscription — which is the whole
    point of observe() vs running a parallel monitoring query.

    Scale: observed metrics are per-partition partial aggregates
    merged at the batch boundary — O(metrics) driver state per batch,
    never O(rows); the decimal-stabilized sum keeps the reported
    total bit-identical to the oracle's at any partitioning."""
    from ..streaming.replay import (
        build_replay_chunks,
        fresh_sink_name,
        read_events_stream,
        streaming_shuffle,
    )
    from ._util import DEC

    key = (id(spark), sf_dir)
    if key in _OBS_CACHE:
        rows = _OBS_CACHE[key]
    else:
        chunks = build_replay_chunks(spark, sf_dir)
        src = read_events_stream(spark, chunks).observe(
            "dq_gate",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").cast(DEC)).cast("double")
            .alias("sum_value"),
            F.count(F.when(F.col("value") > 500, 1)).alias("n_extreme"),
        )
        with streaming_shuffle(spark):
            q = (
                src.writeStream.format("noop")
                .option("checkpointLocation",
                        scratch_dir(prefix="dbrcf-observe-ckpt-"))
                .trigger(availableNow=True)
                .queryName(fresh_sink_name("observe"))
                .start()
            )
            q.awaitTermination()
        rows = [
            (
                int(p.batchId),
                int(m["n_rows"]),
                float(m["sum_value"]),
                int(m["n_extreme"]),
            )
            for p in q.recentProgress
            if int(p.numInputRows) > 0
            for m in [p.observedMetrics.get("dq_gate")]
            if m is not None
        ]
        _OBS_CACHE[key] = rows
    return spark.createDataFrame(
        rows,
        "batch_id long, n_rows long, sum_value double, n_extreme long")


# -------------------------------------------------------- sink_stream_table

_STBL_CACHE: dict = {}


@query(
    "sink_stream_table",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def sink_stream_table(spark, sf_dir):
    """Streaming CATALOG-TABLE sink — writeStream.toTable(): the
    replayed change stream lands in a metastore-managed table
    (exactly-once per micro-batch via the checkpoint + the table's
    commit protocol) and is read back with spark.read.table — the
    managed-lakehouse counterpart of sink_parquet's path-addressed
    write, completing the sink matrix (path parquet / partitioned /
    resumed / memory / update / idempotent-merge / Python DataSource
    / catalog table). The read-back must reproduce the parquet-backed
    oracle exactly: nothing lost, duplicated, or retyped crossing the
    catalog boundary.

    Scale: the sink is append-only file commits under the table
    location (bucket/partition layout is a DDL choice, not a code
    change); the catalog stores pointers, never data. Table names are
    session-unique so re-registration (a fresh AvailableNow run per
    session) never appends into a previous run's table."""
    key = (id(spark), sf_dir)
    if key not in _STBL_CACHE:
        from ..streaming.replay import (
            build_replay_chunks,
            fresh_sink_name,
            read_events_stream,
            streaming_shuffle,
        )

        # Deterministic session-scoped counter (fresh_sink_name), not
        # Python hash(): string hashing is PYTHONHASHSEED-randomized,
        # which made the catalog table name unreproducible across
        # processes (ADVICE r8) — uniqueness per run is all we need.
        name = fresh_sink_name("events_stream")
        chunks = build_replay_chunks(spark, sf_dir)
        src = read_events_stream(spark, chunks).select(
            "event_id", "user_id", "event_type", "value")
        with streaming_shuffle(spark):
            q = (
                src.writeStream
                .option("checkpointLocation",
                        scratch_dir(prefix="dbrcf-stbl-ckpt-"))
                # external-location table: data lands in scratch (the
                # _bucketed_tables convention), the catalog holds only
                # metadata — no data accrues under ./spark-warehouse
                .option("path", scratch_dir(prefix="dbrcf-stbl-data-"))
                .trigger(availableNow=True)
                .toTable(name)
            )
            q.awaitTermination()
        _STBL_CACHE[key] = name
    return spark.read.table(_STBL_CACHE[key])


# --------------------------------------------------------------- fn_format

@query(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           format('{:,}', o_orderkey) AS key_grouped,
           printf('%010d', o_orderkey) AS key_padded,
           printf('%012.2f', o_totalprice) AS price_fixed,
           '$' || printf('%.2f', o_totalprice) AS price_currency,
           CAST(replace(printf('%012.2f', o_totalprice), ',', '')
                AS DOUBLE) AS price_parsed
    FROM orders
    """,
)
def fn_format(spark, sf_dir):
    """Report-rendering functions (§2.H breadth): printf-style
    fixed-point and zero-padded rendering (format_string), integer
    thousands grouping (format_number), a composed currency string,
    and the parse-back that proves the render is lossless — the
    export/ingestion seam every BI hand-off crosses. Deliberately
    EXCLUDED: %e scientific rendering (Java rounds the halfway digit
    HALF_UP, C printf half-even — '+1.235e+03' vs '+1.234e+03' on
    the same double; probed r8) and grouped FLOAT rendering (DuckDB
    printf refuses thousand separators on doubles) — the graded
    surface is the cross-engine-stable subset, which is also the
    locale-stable subset a portable export should restrict itself
    to. Fixed-point %.2f on the fixture's 2-dp prices never hits a
    representable binary halfway, so both engines round identically.

    Scale: pure codegen projection, one scan, no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    fixed = F.format_string("%012.2f", F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        F.format_number(F.col("o_orderkey"), 0).alias("key_grouped"),
        F.format_string("%010d", F.col("o_orderkey"))
        .alias("key_padded"),
        fixed.alias("price_fixed"),
        F.concat(F.lit("$"),
                 F.format_string("%.2f", F.col("o_totalprice")))
        .alias("price_currency"),
        F.regexp_replace(fixed, ",", "").cast("double")
        .alias("price_parsed"),
    )


# ------------------------------------------------------------ source_text

_TEXT_COPIES: dict = {}


def _text_copy(spark, sf_dir: str) -> str:
    """One pipe-delimited text-line copy of the events projection per
    (session, sf_dir) — the raw-log fixture (graded dir ships parquet
    only). Java's shortest-round-trip double rendering makes the text
    round trip exact."""
    key = (id(spark), sf_dir)
    if key not in _TEXT_COPIES:
        root = scratch_dir(prefix="dbrcf-text-")
        (
            load_table(spark, sf_dir, "events")
            .select(F.concat_ws(
                "|",
                F.col("event_id"), F.col("user_id"),
                F.col("event_type"), F.col("value"),
            ).alias("value"))
            .write.mode("overwrite").text(root)
        )
        _TEXT_COPIES[key] = root
    return _TEXT_COPIES[key]


@query(
    "source_text",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def source_text(spark, sf_dir):
    """Raw text-line source (§2.A2 breadth — the format every log
    pipeline starts from): spark.read.text gives one `value` line
    per record, and the parse back to typed columns is a codegen
    split + casts. Completes the connector matrix alongside
    csv/jsonl/orc/xml/binary/python-datasource; must reproduce the
    parquet-backed oracle exactly (shortest-round-trip rendering
    makes the double survive the text round trip bit-for-bit)."""
    path = _text_copy(spark, sf_dir)
    parts = F.split(F.col("value"), r"\|")
    return spark.read.text(path).select(
        parts.getItem(0).cast("long").alias("event_id"),
        parts.getItem(1).cast("long").alias("user_id"),
        parts.getItem(2).alias("event_type"),
        parts.getItem(3).cast("double").alias("value"),
    )


# ---------------------------------------------------- llm_filter_calibration

#: the candidate gate thresholds on lexical diversity (uniq_ratio):
#: a bounded grid, so the whole sweep is ONE conditional-aggregate
#: pass — never |grid| scans or a grid x corpus cross join.
_CAL_GRID = [0.30, 0.35, 0.40, 0.45, 0.50, 0.55, 0.60]


def _cal_oracle() -> str:
    arms = ", ".join(f"({t})" for t in _CAL_GRID)
    return f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(len(list_distinct(string_split(text, ' ')))
                  AS DOUBLE)
               / len(string_split(text, ' ')) AS uniq_ratio
      FROM documents),
    g AS (SELECT * FROM (VALUES {arms}) AS v(threshold)),
    tot AS (SELECT count(*) AS n FROM t)
    SELECT g.threshold,
           CAST(count(CASE WHEN t.uniq_ratio > g.threshold THEN 1 END)
                AS BIGINT) AS n_kept,
           CAST(count(CASE WHEN t.uniq_ratio > g.threshold THEN 1 END)
                AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE)
             AS share_kept,
           CAST(sum(CASE WHEN t.uniq_ratio > g.threshold
                    THEN CAST(t.n_words AS DECIMAL(18,6)) END)
                AS DOUBLE)
             / count(CASE WHEN t.uniq_ratio > g.threshold THEN 1 END)
             AS mean_words_kept
    FROM t CROSS JOIN g
    GROUP BY g.threshold
    """


@query("llm_filter_calibration", oracle=_cal_oracle())
def llm_filter_calibration(spark, sf_dir):
    """Filter-threshold calibration sweep — the table a pipeline owner
    reads before choosing a quality gate (llm_filter_gate applies ONE
    threshold; this shows the retention/composition trade-off across
    the whole candidate grid): for each lexical-diversity cutoff, the
    docs kept, the corpus share kept, and the mean length of what
    survives (quality gates love to silently skew length — this
    column is the tell).

    Scale shape: the oracle states the semantics as a grid cross
    join; the engine runs it as ONE corpus scan with |grid| x 3
    conditional aggregates (map-side combined, 21 numbers cross the
    shuffle) unpivoted to the grid rows — the sweep costs the same
    as a single-threshold gate at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    ratio = (F.size(F.array_distinct(words)).cast("double")
             / F.size(words))
    n_words = F.size(words).cast("long")
    aggs = []
    for i, t in enumerate(_CAL_GRID):
        kept = ratio > F.lit(t)
        aggs += [
            F.count(F.when(kept, 1)).alias(f"k{i}"),
            F.sum(F.when(kept, n_words.cast("decimal(18,6)")))
            .cast("double").alias(f"s{i}"),
        ]
    wide = d.agg(F.count(F.lit(1)).alias("n"), *aggs)
    arms = F.array(*[
        F.struct(
            F.lit(t).alias("threshold"),
            F.col(f"k{i}").alias("n_kept"),
            (F.col(f"k{i}").cast("double")
             / F.col("n").cast("double")).alias("share_kept"),
            (F.col(f"s{i}") / F.col(f"k{i}")).alias("mean_words_kept"),
        )
        for i, t in enumerate(_CAL_GRID)
    ])
    return (
        wide.select(F.explode(arms).alias("a"))
        .select("a.threshold", "a.n_kept", "a.share_kept",
                "a.mean_words_kept")
    )


# -------------------------------------------------------- dq_mann_whitney

@query(
    "dq_mann_whitney",
    oracle=f"""
    WITH pv AS (
      SELECT value,
             CAST(sum(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ca,
             CAST(sum(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cb
      FROM events
      WHERE event_type IN ('{_KS_A}', '{_KS_B}')
      GROUP BY value),
    cum AS (
      SELECT value, ca, cb, ca + cb AS t,
             sum(ca + cb) OVER (ORDER BY value) - (ca + cb) AS before_t
      FROM pv),
    agg AS (
      SELECT CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb,
             CAST(sum(CAST(ca AS DECIMAL(19,0))
                      * CAST(2 * before_t + t + 1 AS DECIMAL(19,0)))
                  AS DOUBLE) AS r2a,
             CAST(sum(CAST(t AS DECIMAL(12,0))
                      * CAST(t AS DECIMAL(12,0))
                      * CAST(t AS DECIMAL(12,0))
                      - CAST(t AS DECIMAL(12,0))) AS DOUBLE) AS ties
      FROM cum),
    st AS (
      SELECT na, nb,
             (r2a - CAST(na AS DOUBLE)
                * CAST(na + 1 AS DOUBLE)) / 2 AS u_a,
             CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2 AS mu,
             CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12
             * (CAST(na + nb + 1 AS DOUBLE)
                - ties
                  / (CAST(na + nb AS DOUBLE)
                     * CAST(na + nb - 1 AS DOUBLE))) AS var_u
      FROM agg)
    SELECT na AS n_a, nb AS n_b, u_a AS u_stat,
           (u_a - mu) / sqrt(var_u) AS z_stat
    FROM st
    """,
)
def dq_mann_whitney(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) between the click and error
    cohorts — the nonparametric LOCATION test completing the round-8
    testing trio (dq_ks_test: distribution shape; dq_ttest_welch:
    parametric means; this: medians without normality). Tie handling
    is the textbook midrank + tie-corrected variance, and the whole
    rank computation stays in exact INTEGER arithmetic (2*R_a = sum
    ca*(2*before + t + 1) over per-value tie blocks, decimal-widened
    because 2*R_a ~ N^2 and t^3 overflow int64 past ~10^10 rows) —
    doubles appear only in the final closed-form z.

    Same scale shape as dq_ks_test: ONE scan -> per-value partial
    counts over the bounded 2-dp domain, a linear lineage of one
    bounded-domain window for the below-count (see dq_ks_test's
    docstring for why this beats the branch-heavy banded form), then
    a single global aggregate of four numbers; O(1) driver state at
    any corpus size."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(_KS_A, _KS_B))
    pv = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1)
              .otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1)
              .otherwise(0)).alias("cb"),
    ).withColumn("t", F.col("ca") + F.col("cb"))
    wv = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, -1)
    cum = pv.select(
        "value", "ca", "cb", "t",
        F.coalesce(F.sum("t").over(wv), F.lit(0)).alias("before_t"),
    )
    # the two big sums route through DECIMAL: 2*R_a ~ N^2 and t^3
    # both overflow int64 around 10^10 rows — decimal(38) keeps the
    # rank arithmetic exact to any realistic corpus (DuckDB's bigint
    # sum is int128, so the oracle is already safe; this matches it)
    t_dec = F.col("t").cast("decimal(12,0)")
    agg = cum.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(F.col("ca").cast("decimal(19,0)")
              * (2 * F.col("before_t") + F.col("t") + 1)
              .cast("decimal(19,0)"))
        .cast("double").alias("r2a"),
        F.sum(t_dec * t_dec * t_dec - t_dec)
        .cast("double").alias("ties"),
    )
    na_d = F.col("na").cast("double")
    nb_d = F.col("nb").cast("double")
    u_a = (F.col("r2a")
           - na_d * (F.col("na") + 1).cast("double")) / 2
    mu = na_d * nb_d / 2
    var_u = na_d * nb_d / 12 * (
        (F.col("na") + F.col("nb") + 1).cast("double")
        - F.col("ties")
        / ((F.col("na") + F.col("nb")).cast("double")
           * (F.col("na") + F.col("nb") - 1).cast("double")))
    st = agg.select("na", "nb", u_a.alias("u_a"), mu.alias("mu"),
                    var_u.alias("var_u"))
    return st.select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        F.col("u_a").alias("u_stat"),
        ((F.col("u_a") - F.col("mu"))
         / F.sqrt(F.col("var_u"))).alias("z_stat"),
    )


# ------------------------------------------------------------- ts_cusum

_CUSUM_K, _CUSUM_H = 0.5, 4.0
_CUSUM_DDL = ("event_type string, day timestamp, x double, "
              "cusum_pos double, cusum_neg double, alarm boolean")


def _cusum_fit(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sequential one-sided CUSUM pair in float64 — same op order as
    the oracle's recursive CTE: sp' = max(0, sp + (x - mu) - k),
    sn' = min(0, sn + (x - mu) + k)."""
    pdf = pdf.sort_values("day").reset_index(drop=True)
    mu = float(pdf["mu"].iloc[0])
    xs = [float(v) for v in pdf["x"]]
    sp, sn = [], []
    p = n = 0.0
    for x in xs:
        p = max(0.0, p + (x - mu) - _CUSUM_K)
        n = min(0.0, n + (x - mu) + _CUSUM_K)
        sp.append(p)
        sn.append(n)
    return pd.DataFrame({
        "event_type": pdf["event_type"], "day": pdf["day"], "x": xs,
        "cusum_pos": sp, "cusum_neg": sn,
        "alarm": [(a > _CUSUM_H) or (b < -_CUSUM_H)
                  for a, b in zip(sp, sn)],
    })


@query(
    "ts_cusum",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             {sql_dsum('value')} / count(*) AS x,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('day', ts)) - 1
               AS idx
      FROM events GROUP BY event_type, date_trunc('day', ts)),
    m AS (
      SELECT event_type,
             CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
               / count(*) AS mu
      FROM d GROUP BY event_type),
    r AS (
      SELECT d.event_type, d.idx, d.day, d.x, m.mu,
             greatest(0.0, (d.x - m.mu) - {_CUSUM_K}) AS cusum_pos,
             least(0.0, (d.x - m.mu) + {_CUSUM_K}) AS cusum_neg
      FROM d JOIN m USING (event_type) WHERE d.idx = 0
      UNION ALL
      SELECT d.event_type, d.idx, d.day, d.x, r.mu,
             greatest(0.0, r.cusum_pos + (d.x - r.mu) - {_CUSUM_K})
               AS cusum_pos,
             least(0.0, r.cusum_neg + (d.x - r.mu) + {_CUSUM_K})
               AS cusum_neg
      FROM r JOIN d
        ON d.event_type = r.event_type AND d.idx = r.idx + 1)
    SELECT event_type, day, x, cusum_pos, cusum_neg,
           cusum_pos > {_CUSUM_H} OR cusum_neg < -{_CUSUM_H} AS alarm
    FROM r
    """,
)
def ts_cusum(spark, sf_dir):
    """CUSUM control chart (Page 1954) over each event type's daily
    mean value — the classic sequential change detector ops teams run
    beside the rolling z-score (ts_zscore_rolling catches spikes;
    CUSUM accumulates small persistent shifts): one-sided positive/
    negative sums with slack k=0.5, alarm at |S|>4.
    Like ts_holt_linear this is a genuine recurrence (state at t
    needs state at t-1 clamped at 0), so Spark-side it is the
    applyInPandas escape hatch partitioned BY SERIES, and the oracle
    proves the identical float64 op sequence via a recursive CTE.
    The per-day means and the per-series centerline mu both route
    through exact decimal sums, so the recurrence inputs are
    bit-identical in both engines before the smoothing even starts."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .agg((F.sum(F.col("value").cast("decimal(18,6)"))
              .cast("double") / F.count(F.lit(1))).alias("x"))
    )
    mu = daily.groupBy("event_type").agg(
        (F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1))).alias("mu"))
    return (
        daily.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .applyInPandas(_cusum_fit, schema=_CUSUM_DDL)
    )


# ------------------------------------------------------ llm_doc_datasheet

@query(
    "llm_doc_datasheet",
    oracle=f"""
    WITH t AS (
      SELECT lang, source, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens
      FROM documents),
    tot AS (SELECT count(*) AS n FROM t)
    SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END
             AS lang,
           CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END
             AS source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           {sql_dsum('n_chars')} / count(*) AS mean_chars,
           CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           CAST(count(*) AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE)
             AS doc_share
    FROM t
    GROUP BY ROLLUP (lang, source)
    """,
)
def llm_doc_datasheet(spark, sf_dir):
    """Corpus datasheet ("Datasheets for Datasets", Gebru et al. 2021
    — the composition table a training-data release ships): document
    counts, exact char/whitespace-token volumes, mean/max lengths and
    corpus share, at THREE grains in one pass — (lang, source) cells,
    per-lang subtotals, and the grand total — via GROUPING SETS, so
    the report is a single partial-aggregated shuffle, not three
    scans. Subtotal slots render as 'ALL' via GROUPING() — the bitmask
    way, immune to NULL data values — to keep the grain explicit in
    the flat export.

    Scale shape: everything is map-side combinable (counts, integer
    sums, max, one decimal sum for the stabilized mean); the grand
    total broadcasts back for the share column; |output| is the
    bounded grouping-domain size."""
    t = load_table(spark, sf_dir, "documents").select(
        "lang", "source", "n_chars",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"))
    tot = t.agg(F.count(F.lit(1)).alias("n"))
    return (
        t.rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            (F.sum(F.col("n_chars").cast("decimal(18,6)"))
             .cast("double") / F.count(F.lit(1))).alias("mean_chars"),
            F.sum("ws_tokens").cast("long").alias("total_tokens"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.grouping("lang").alias("g_lang"),
            F.grouping("source").alias("g_source"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.when(F.col("g_lang") == 1, F.lit("ALL"))
            .otherwise(F.col("lang")).alias("lang"),
            F.when(F.col("g_source") == 1, F.lit("ALL"))
            .otherwise(F.col("source")).alias("source"),
            "n_docs", "total_chars", "mean_chars", "total_tokens",
            "max_chars",
            (F.col("n_docs").cast("double")
             / F.col("n").cast("double")).alias("doc_share"),
        )
    )
