"""Round-9 wave, second half (mechanical split of queries/round9.py —
VERDICT r9 item 3; registry order preserved byte-identically by
importing this module DIRECTLY AFTER round9 in load_all): the LSM
segment-store trajectory, the IQR/MMR/GROUP-BY-ALL/pivot block, the
Hamming k-NN family, Holt-Winters, the maintained correlation view,
and the permissive JSONL source. Same determinism posture as round9
(see its module docstring)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import dsum, sql_dsum

# -------------------------------------- llm_index_segment_trajectory

_SEG_NB = 9       #: appended batches (fixed: the trajectory IS the op)
_SEG_FANOUT = 4
_SEG_CACHE: dict = {}


@query(
    "llm_index_segment_trajectory",
    oracle=f"""
    SELECT CAST(t.b AS BIGINT) AS batch_id,
           CAST((t.b + 1) % {_SEG_FANOUT} AS BIGINT) AS n_l0,
           CAST((t.b + 1) % {_SEG_FANOUT}
                + ((t.b + 1) // {_SEG_FANOUT}) % {_SEG_FANOUT}
                + ((t.b + 1) // {_SEG_FANOUT ** 2}) % {_SEG_FANOUT}
             AS BIGINT) AS n_segments,
           CAST(CASE
             WHEN ((t.b + 1) // {_SEG_FANOUT ** 2}) % {_SEG_FANOUT} > 0
               THEN 2
             WHEN ((t.b + 1) // {_SEG_FANOUT}) % {_SEG_FANOUT} > 0
               THEN 1
             ELSE 0 END AS BIGINT) AS max_level
    FROM range(0, {_SEG_NB}) t(b)
    """,
)
def llm_index_segment_trajectory(spark, sf_dir):
    """LSM TIERING TRAJECTORY of the segment store under the
    incremental ANN index runners (operators/segment_index.py — the
    round-9 answer to the r8 small-file mark): embeddings arrive in
    {_SEG_NB} batches, each append lands ONE level-0 segment and
    tiered compaction folds every {_SEG_FANOUT} same-level segments
    into one at the next level. The live-segment profile after every
    append is therefore EXACTLY base-{_SEG_FANOUT} counter
    arithmetic — after k appends, the count of level-i segments is
    digit i of k in base {_SEG_FANOUT} — and the oracle grades the
    REAL store's observed trajectory against that closed form:
    sub-linear file growth is not claimed, it is hash-checked
    (9 appends end at 3 live segments, not 9).

    Scale: each append is one O(|batch|) write + at most a cascade
    of bounded merges (amortized O(log_F batches) rewrites per
    batch — the classic LSM write amplification, paid off the
    serving path); the graded profile is O(1) driver rows per
    batch."""
    import os as _os

    from ..operators.segment_index import SegmentedBucketIndex
    from ..streaming.generic_views import _keyed_chunks
    from ..tmputil import scratch_dir

    key = (id(spark), sf_dir)
    if key not in _SEG_CACHE:
        chunks = _keyed_chunks(
            spark, sf_dir, "embeddings", "vec_id", _SEG_NB)
        store = SegmentedBucketIndex(
            spark, scratch_dir(prefix="dbrcf-segtraj-"),
            "vec_id long, label int", fanout=_SEG_FANOUT)
        rows = []
        for b, f in enumerate(sorted(_os.listdir(chunks))):
            batch = spark.read.parquet(_os.path.join(chunks, f))
            store.append_batch(
                batch.select(
                    "vec_id", "label",
                    (F.col("vec_id") % 8).cast("int").alias("bucket")),
                b)
            segs = store.live_segments()
            rows.append((
                b,
                sum(1 for _, lv in segs if lv == 0),
                len(segs),
                max(lv for _, lv in segs),
            ))
        _SEG_CACHE[key] = rows
    return spark.createDataFrame(
        _SEG_CACHE[key],
        "batch_id long, n_l0 long, n_segments long, max_level long")


# ------------------------------------------------------ dq_iqr_outliers

@query(
    "dq_iqr_outliers",
    oracle="""
    WITH c AS (
      SELECT event_type, value, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, value, cnt,
             sum(cnt) OVER (PARTITION BY event_type
                            ORDER BY value) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS n
      FROM c),
    q AS (
      SELECT event_type, CAST(any_value(n) AS BIGINT) AS n,
             min(CASE WHEN cum >= (n + 3) // 4 THEN value END) AS q1,
             min(CASE WHEN cum >= (3 * n + 3) // 4 THEN value END)
               AS q3
      FROM cum GROUP BY event_type),
    f AS (
      SELECT event_type, n, q1, q3, q3 - q1 AS iqr,
             q1 - 1.5 * (q3 - q1) AS lo_fence,
             q3 + 1.5 * (q3 - q1) AS hi_fence
      FROM q)
    SELECT f.event_type, f.n, f.q1, f.q3, f.iqr,
           f.lo_fence, f.hi_fence,
           CAST(coalesce(sum(CASE WHEN c.value < f.lo_fence
                                    OR c.value > f.hi_fence
                                  THEN c.cnt END), 0) AS BIGINT)
             AS n_outliers
    FROM f JOIN c ON c.event_type = f.event_type
    GROUP BY 1, 2, 3, 4, 5, 6, 7
    """,
)
def dq_iqr_outliers(spark, sf_dir):
    """Tukey-fence outlier audit per event type: exact type-1
    quartiles (the ceil(p*n)-th ORDER STATISTIC — a real data value,
    never the cross-engine midpoint interpolation FIXTURES.md bans),
    IQR fences at 1.5x, and the count outside them — the box-plot
    numbers a monitoring page draws, computed exactly.

    Scale shape: `value` is a 2-dp bounded domain, so the
    (event_type, value) count relation is BOUNDED at any corpus
    size; the cumulative rank runs over THAT relation (the
    dq_ks_test banded-domain rule — no data-sized window anywhere),
    the quartile is a conditional MIN, and the outlier count joins
    the |groups|-row fence table back to the same bounded relation.
    Quartile positions use pure integer ceil arithmetic
    ((n+3)//4) — no float ranks."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_et = Window.partitionBy("event_type")
    cum = c.select(
        "event_type", "value", "cnt",
        F.sum("cnt").over(w_et.orderBy("value")).alias("cum"),
        F.sum("cnt").over(w_et).alias("n"),
    )
    q = cum.groupBy("event_type").agg(
        F.any_value("n").alias("n"),
        F.min(F.when(
            F.col("cum") >= F.floor((F.col("n") + 3) / 4),
            F.col("value"))).alias("q1"),
        F.min(F.when(
            F.col("cum") >= F.floor((3 * F.col("n") + 3) / 4),
            F.col("value"))).alias("q3"),
    )
    f = q.select(
        "event_type", "n", "q1", "q3",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")))
        .alias("lo_fence"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
        .alias("hi_fence"),
    )
    return (
        c.join(F.broadcast(f), "event_type")
        .groupBy("event_type", "n", "q1", "q3", "iqr",
                 "lo_fence", "hi_fence")
        .agg(F.coalesce(
            F.sum(F.when(
                (F.col("value") < F.col("lo_fence"))
                | (F.col("value") > F.col("hi_fence")),
                F.col("cnt"))), F.lit(0)).cast("long")
            .alias("n_outliers"))
    )


# ------------------------------------------------- llm_mmr_diversify

_MMR_POOL = 12
_MMR_K = 4
_MMR_LAMBDA = 0.7
#: the diversity weight as its OWN literal — python's 1.0 - 0.7 is
#: 0.30000000000000004, one ulp off the SQL literal 0.3 (caught by
#: the strict parity suite; the driver's 6-dp hash forgave it)
_MMR_MU = 0.3
_MMR_DDL = ("qid long, step int, vec_id long, rel double, "
            "score double")


def _mmr_select(key, pool_pdf, sim_pdf):
    """Sequential MMR selection for ONE query's bounded candidate
    pool — plain float64 python ops in the SAME order as the
    oracle's SQL expressions (0.7*rel - 0.3*maxsim, exact float
    comparisons), so every selected id and score is bit-identical."""
    import pandas as _pd

    qid = int(key[0])
    rel = dict(zip(pool_pdf["vec_id"], pool_pdf["rel"]))
    sim: dict = {}
    for d1, d2, s in zip(sim_pdf["d1"], sim_pdf["d2"],
                         sim_pdf["sim"]):
        sim[(d1, d2)] = s
        sim[(d2, d1)] = s
    selected: list = []
    out = []
    while len(selected) < _MMR_K and len(selected) < len(rel):
        best = None
        for d in sorted(rel):
            if d in selected:
                continue
            if not selected:
                score = rel[d]
            else:
                ms = max(sim.get((d, s), 0.0) for s in selected)
                score = _MMR_LAMBDA * rel[d] - _MMR_MU * ms
            # strict > : ties keep the SMALLEST vec_id (first seen)
            if best is None or score > best[1]:
                best = (d, score)
        selected.append(best[0])
        out.append((qid, len(selected), best[0], rel[best[0]],
                    best[1]))
    return _pd.DataFrame(
        out, columns=["qid", "step", "vec_id", "rel", "score"])


def _mmr_oracle2() -> str:
    from .llm import _SQL_DOT

    def cos(x, y):
        d = _SQL_DOT
        return (f"{d.format(x=x, y=y)} / (sqrt({d.format(x=x, y=x)})"
                f" * sqrt({d.format(x=y, y=y)}))")

    return f"""
    WITH RECURSIVE q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id % 50 = 0),
    scored0 AS (
      SELECT q.qid, e.vec_id AS did, e.embedding AS de,
             {cos('e.embedding', 'q.qe')} AS rel,
             row_number() OVER (
               PARTITION BY q.qid
               ORDER BY {cos('e.embedding', 'q.qe')} DESC, e.vec_id)
               AS rnk
      FROM embeddings e JOIN q ON e.vec_id % 50 <> 0),
    pool AS (
      SELECT qid, did, de, rel FROM scored0
      WHERE rnk <= {_MMR_POOL}),
    sims AS (
      SELECT a.qid, a.did AS d1, b.did AS d2,
             {cos('a.de', 'b.de')} AS sim
      FROM pool a JOIN pool b
        ON b.qid = a.qid AND a.did < b.did),
    sel AS (
      SELECT p.qid, 1 AS step, p.did AS vec_id, p.rel,
             p.rel AS score, [p.did] AS sel_ids
      FROM pool p
      JOIN (SELECT qid, max(rel) AS mr FROM pool GROUP BY qid) m
        ON m.qid = p.qid AND p.rel = m.mr
      QUALIFY row_number() OVER (PARTITION BY p.qid
                                 ORDER BY p.did) = 1
      UNION ALL
      SELECT nxt.qid, nxt.step, nxt.vec_id, nxt.rel, nxt.score,
             list_append(nxt.sel_ids, nxt.vec_id)
      FROM (
        SELECT sc.qid, sc.step, sc.did AS vec_id, sc.rel, sc.score,
               sc.sel_ids,
               row_number() OVER (
                 PARTITION BY sc.qid
                 ORDER BY sc.score DESC, sc.did) AS pick
        FROM (
          SELECT s.qid, s.step + 1 AS step, p.did, p.rel, s.sel_ids,
                 {_MMR_LAMBDA} * p.rel - {_MMR_MU}
                 * (SELECT max(sim) FROM sims x
                    WHERE x.qid = s.qid
                      AND ((x.d1 = p.did
                            AND list_contains(s.sel_ids, x.d2))
                        OR (x.d2 = p.did
                            AND list_contains(s.sel_ids, x.d1))))
                   AS score
          FROM sel s JOIN pool p
            ON p.qid = s.qid
           AND NOT list_contains(s.sel_ids, p.did)
          WHERE s.step < {_MMR_K}) sc) nxt
      WHERE nxt.pick = 1)
    SELECT qid, step, vec_id, rel, score FROM sel
    """


@query("llm_mmr_diversify", oracle=_mmr_oracle2())
def llm_mmr_diversify(spark, sf_dir):
    """MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein,
    SIGIR'98 — public method) of each query's top-{_MMR_POOL}
    retrieval pool: select {_MMR_K} results one at a time, each
    maximizing lambda*relevance - (1-lambda)*max-similarity-to-
    already-selected — the diversification pass RAG pipelines run so
    the context window doesn't fill with {_MMR_K} copies of the same
    passage. Ties break to the smallest vec_id; step 1's objective
    is pure relevance.

    Scale shape: the pool build is the brute-force ground-truth twin
    (like llm_hard_negatives, the scale path swaps in llm_knn_lsh /
    llm_knn_ivf candidates); pairwise similarities exist only WITHIN
    each bounded pool ({_MMR_POOL} choose 2 per query); the
    sequential selection is inherently iterative, so it runs as a
    cogrouped applyInPandas over (pool, sims) per query — O(K *
    pool) python float ops on driver-free executors, embarrassingly
    parallel across millions of queries. Every rel/sim is computed
    by the same Catalyst aggregate the other vector ops use; the
    pandas loop replays the oracle's exact float64 op order, so the
    whole trajectory is bit-identical, not approximately equal."""
    from .llm import _dot

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    # the 64-dim cosine per (q, d) pair is interpreted higher-order-
    # function work that fuses into the single-split embeddings scan;
    # fan the target side out so the rel stage runs on every core
    # (r13; _util.fan_out no-ops on well-split tables)
    from ._util import fan_out

    t = fan_out(
        emb.where(F.col("vec_id") % 50 != 0).select(
            F.col("vec_id").alias("did"), F.col("embedding").alias("de")),
        "did")

    def cos(x, y):
        return _dot(x, y) / (
            F.sqrt(_dot(x, x)) * F.sqrt(_dot(y, y)))

    rel = q.crossJoin(t).select(
        "qid", "did", "de",
        cos(F.col("de"), F.col("qe")).alias("rel"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("rel").desc(), F.col("did"))
    pool = (
        rel.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _MMR_POOL)
        .select("qid", F.col("did").alias("vec_id"), "de", "rel")
    )
    p1, p2 = pool.alias("p1"), pool.alias("p2")
    sims = p1.join(
        p2, (F.col("p2.qid") == F.col("p1.qid"))
        & (F.col("p1.vec_id") < F.col("p2.vec_id"))
    ).select(
        F.col("p1.qid").alias("qid"),
        F.col("p1.vec_id").alias("d1"),
        F.col("p2.vec_id").alias("d2"),
        cos(F.col("p1.de"), F.col("p2.de")).alias("sim"),
    )
    # pin both cogroup exchanges to defaultParallelism partitions on
    # qid: AQE's byte-based coalescing otherwise serializes the
    # per-query python selection loops onto 1-2 partitions (r13;
    # _util.pin_group_parallelism — the gate no-ops at real scale)
    from ._util import pin_group_parallelism

    left = pin_group_parallelism(
        pool.select("qid", "vec_id", "rel"), "qid")
    right = pin_group_parallelism(sims, "qid")
    return (
        left.groupBy("qid")
        .cogroup(right.groupBy("qid"))
        .applyInPandas(_mmr_select, schema=_MMR_DDL)
    )


# ----------------------------------------------------- sql_group_by_all

@query(
    "sql_group_by_all",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM documents
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark, sf_dir):
    """`GROUP BY ALL` — the modern-SQL ergonomics both engines
    (Spark 3.4+/DuckDB) ship: every non-aggregate select item
    becomes a grouping key, so adding a dimension to the SELECT
    list cannot silently fall out of the GROUP BY (the classic
    copy-paste bug in hand-maintained rollups). Same physical plan
    as an explicit GROUP BY lang, source — one partial+final hash
    aggregate; the syntax is the surface under test, executed
    LITERALLY as SQL text in both engines."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(min(doc_id) AS BIGINT) AS first_doc
        FROM documents
        GROUP BY ALL
    """)


# ------------------------------------------------------ llm_shard_balance

def _shard_balance_oracle() -> str:
    # the provider of the composed oracle must be imported HERE, not
    # via load_all (executor-import trap, round8 _mrr_oracle lesson)
    from . import ORACLES as _REG
    from . import round7  # noqa: F401

    return f"""
    WITH shards AS ({_REG['llm_export_shards']})
    SELECT count(*) AS n_shards,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(max(n_tokens) AS DOUBLE) * count(*)
             / CAST(sum(n_tokens) AS DOUBLE) AS imbalance,
           CAST(max(n_tokens) - min(n_tokens) AS BIGINT) AS spread
    FROM shards
    """


@query("llm_shard_balance", oracle=_shard_balance_oracle())
def llm_shard_balance(spark, sf_dir):
    """Shard-balance audit of the training-data export: token
    totals, extremes, the max/mean imbalance ratio (the number that
    decides whether one data-loader worker straggles every epoch)
    and the absolute spread — computed OVER the graded
    llm_export_shards manifest, and the oracle composes that query's
    own registered oracle text, so this metric can never drift from
    the export it audits (the llm_ann_recall self-consistency
    pattern).

    Scale: |shards| input rows; the audit is one tiny aggregate.
    The imbalance ratio is exact-integer arithmetic with one double
    division, written identically in both engines."""
    from .round7 import llm_export_shards

    s = llm_export_shards(spark, sf_dir)
    return s.agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        (F.max("n_tokens").cast("double") * F.count(F.lit(1))
         / F.sum("n_tokens").cast("double")).alias("imbalance"),
        (F.max("n_tokens") - F.min("n_tokens")).cast("long")
        .alias("spread"),
    )


# ------------------------------------------------- stream_tumbling_pivot

_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "stream_tumbling_pivot",
    oracle=f"""
    SELECT time_bucket(INTERVAL 1 DAY, ts) AS window_start,
           {", ".join(
               f"count(*) FILTER (WHERE event_type = '{t}')"
               f" AS n_{t}, "
               "CAST(sum(CAST(value AS DECIMAL(18,6)))"
               f" FILTER (WHERE event_type = '{t}') AS DOUBLE)"
               f" AS sum_{t}"
               for t in _PIVOT_TYPES)}
    FROM events
    GROUP BY 1
    """,
)
def stream_tumbling_pivot(spark, sf_dir):
    """Windowed PIVOT on the replayed stream: tumbling 1-day windows
    with one (count, decimal-stabilized sum) column PAIR per event
    type — the wide per-window health row a dashboard reads in one
    fetch instead of re-pivoting the tall (window, type) relation
    client-side every refresh. The pivot value list is EXPLICIT
    (the five fixture event types) — Spark requires literal pivot
    values in streaming-fed plans anyway, and an explicit list is
    the production rule (a surprise type becomes a schema change you
    review, not a silently appearing column).

    Scale: the streaming aggregate is keyed by (window, type) — the
    same bounded state as stream_tumbling — and the pivot runs on
    the aggregate's |windows| x |types| result, never on raw events.
    Complete-mode grading form, same caveat as stream_tumbling (the
    production twin is append/watermark)."""
    from ..streaming.queries import _replayed, _to_table

    agg = (
        _replayed(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double").alias("sv"),
        )
    )
    name = _to_table(agg, "tumbpivot", "complete")
    tall = spark.table(name).select(
        F.col("window.start").alias("window_start"),
        "event_type", "n", "sv")
    wide = (
        tall.groupBy("window_start")
        .pivot("event_type", _PIVOT_TYPES)
        .agg(F.first("n").alias("n"), F.first("sv").alias("sum"))
    )
    # pivot names columns <type>_n / <type>_sum; align to oracle's
    # n_<type> / sum_<type>
    cols = [F.col("window_start")]
    for t in _PIVOT_TYPES:
        cols.append(F.col(f"{t}_n").alias(f"n_{t}"))
        cols.append(F.col(f"{t}_sum").alias(f"sum_{t}"))
    return wide.select(*cols)


# --------------------------------------------- llm_simhash_hamming_knn

_SH_BANDS = 4      #: 8-bit bands over the 32-bit simhash
_SH_TOPK = 5


def _shknn_oracle() -> str:
    # composed from the graded simhash's own oracle text (the
    # llm_ann_recall pattern); provider imported HERE, not via
    # load_all (executor-import trap)
    from . import ORACLES as _REG
    from . import llm  # noqa: F401

    bands = ", ".join(
        f"(sig.simhash // {256 ** b}) % 256 AS band{b}"
        for b in range(_SH_BANDS))
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS band_val "
        f"FROM banded"
        for b in range(_SH_BANDS))
    return f"""
    WITH sig AS ({_REG['llm_dedup_simhash']}),
    banded AS (SELECT sig.doc_id, {bands} FROM sig),
    posts AS ({band_union}),
    cand AS (
      SELECT DISTINCT q.doc_id AS qid, d.doc_id AS did
      FROM posts q JOIN posts d
        ON d.band_idx = q.band_idx AND d.band_val = q.band_val
      WHERE q.doc_id % 50 = 0 AND d.doc_id % 50 <> 0),
    scored AS (
      SELECT c.qid, c.did,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM cand c
      JOIN sig a ON a.doc_id = c.qid
      JOIN sig b ON b.doc_id = c.did),
    r AS (
      SELECT qid, did, CAST(hamming AS BIGINT) AS hamming,
             row_number() OVER (PARTITION BY qid
                                ORDER BY hamming, did) AS rnk
      FROM scored)
    SELECT qid, did, hamming, rnk FROM r WHERE rnk <= {_SH_TOPK}
    """


@query("llm_simhash_hamming_knn", oracle=_shknn_oracle())
def llm_simhash_hamming_knn(spark, sf_dir):
    """Hamming-space k-NN over the graded 32-bit SimHash — the THIRD
    similarity modality next to embedding cosine (llm_knn_*) and
    shingle Jaccard (llm_jaccard_knn_text), and the cheapest of the
    three (one BIGINT per doc, XOR+popcount per comparison):
    candidates share at least one of {_SH_BANDS} 8-bit bands (the
    Hamming-LSH pigeonhole: any pair within distance
    {_SH_BANDS - 1} MUST collide on some band — misses only farther
    pairs, exactly the multi-index recipe of Manku et al., WWW'07),
    then exact Hamming reranks the candidates. Top-{_SH_TOPK} per
    query, ties to the smaller doc_id. The fingerprint relation is
    the registered llm_dedup_simhash query itself — Spark calls the
    same function, the oracle embeds its registered oracle text, so
    the KNN can never drift from the fingerprint it indexes.

    Scale shape: the posting join is equi on (band_idx, band_val) —
    256 values per band spread the corpus; band skew (a common
    prefix across the corpus) is the known failure and the fix is
    wider bands, not a different plan. The SIGNATURE RIDES THE
    POSTING (doc_id, band, band_val, simhash), so the Hamming
    distance falls straight out of the posting join and the
    fingerprint subtree — an explode+groupBy over the corpus — is
    built into the plan ONCE, not re-executed per band arm and per
    rerank side (the r9 plan audit caught the naive form at 40
    exchanges / 20 scan-mentions; this form posts via one inline
    explode and needs no rerank join at all). Collisions on several
    bands dedup by (qid, did) before the top-k window. The rerank
    is XOR+bit_count — integer-exact in both engines.

    r14: the fingerprint comes from llm_dedup_simhash's shared
    unordered relation (same computation, so the KNN still cannot
    drift from the graded fingerprint) — the presentation ORDER BY
    cost each join arm a range exchange + sort the join immediately
    destroyed. The QUERY side carries an explicit broadcast hint
    (guide §3.1): it is the %50 == 0 slice — 49x smaller than the
    corpus arm by construction — yet Spark built the hash table
    from the corpus side."""
    from .llm import _simhash_unordered

    sig = _simhash_unordered(spark, sf_dir)
    posts = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band_idx"),
                ((F.col("simhash") / F.lit(256 ** b)).cast("long")
                 % 256).alias("band_val"))
            for b in range(_SH_BANDS)
        ])).alias("bb"),
    ).select("doc_id", "simhash",
             F.col("bb.band_idx").alias("band_idx"),
             F.col("bb.band_val").alias("band_val"))
    qp = F.broadcast(posts.where(F.col("doc_id") % 50 == 0)).alias("q")
    dp = posts.where(F.col("doc_id") % 50 != 0).alias("d")
    scored = (
        qp.join(dp, ["band_idx", "band_val"])
        .select(
            F.col("q.doc_id").alias("qid"),
            F.col("d.doc_id").alias("did"),
            F.bit_count(
                F.col("q.simhash").bitwiseXOR(F.col("d.simhash")))
            .cast("long").alias("hamming"),
        )
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy("hamming", "did")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _SH_TOPK)
        .select("qid", "did", "hamming", "rnk")
    )


# ------------------------------------------------------ ts_holt_winters

_HW_A, _HW_B, _HW_G = 0.4, 0.2, 0.3   # alpha, beta, gamma
_HW_M = 7
_HW_DDL = ("event_type string, day timestamp, y double, "
           "fitted double, level double, trend double, "
           "seasonal double")


def _hw_fit(pdf):
    """Sequential additive Holt-Winters (period 7) in plain float64
    — the SAME op order and literal constants as the oracle's
    recursive CTE, so every state is bit-identical. Init: level =
    mean of week 1, trend = (mean week 2 - mean week 1)/7, seasonal
    = week-1 deviations; updates start at t = 7."""
    import pandas as _pd

    pdf = pdf.sort_values("day").reset_index(drop=True)
    y = [float(v) for v in pdf["y"]]
    if len(y) < 2 * _HW_M:
        return _pd.DataFrame(
            columns=["event_type", "day", "y", "fitted", "level",
                     "trend", "seasonal"])
    lv = sum(y[0:_HW_M]) / 7.0
    tr = (sum(y[_HW_M:2 * _HW_M]) / 7.0 - lv) / 7.0
    s = [y[i] - lv for i in range(_HW_M)]
    rows = []
    for t in range(_HW_M, len(y)):
        pos = t % _HW_M
        s_old = s[pos]
        fitted = lv + tr + s_old
        l_new = 0.4 * (y[t] - s_old) + 0.6 * (lv + tr)
        b_new = 0.2 * (l_new - lv) + 0.8 * tr
        s_new = 0.3 * (y[t] - l_new) + 0.7 * s_old
        s[pos] = s_new
        lv, tr = l_new, b_new
        rows.append((pdf["event_type"][t], pdf["day"][t], y[t],
                     fitted, l_new, b_new, s_new))
    return _pd.DataFrame(
        rows, columns=["event_type", "day", "y", "fitted", "level",
                       "trend", "seasonal"])


@query(
    "ts_holt_winters",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS DOUBLE) AS y,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY date_trunc('day', ts)) - 1
               AS idx
      FROM events GROUP BY event_type, date_trunc('day', ts)),
    ok AS (
      SELECT event_type FROM d GROUP BY event_type
      HAVING count(*) >= {2 * _HW_M}),
    init AS (
      SELECT d.event_type,
             sum(CASE WHEN idx < {_HW_M} THEN y END) / 7.0 AS l0,
             (sum(CASE WHEN idx >= {_HW_M}
                        AND idx < {2 * _HW_M} THEN y END) / 7.0
              - sum(CASE WHEN idx < {_HW_M} THEN y END) / 7.0)
             / 7.0 AS b0,
             list_transform(
               list(y ORDER BY idx) [1:{_HW_M}],
               x -> x - sum(CASE WHEN idx < {_HW_M} THEN y END)
                      / 7.0) AS s0
      FROM d JOIN ok USING (event_type)
      GROUP BY d.event_type),
    r AS (
      SELECT event_type, {_HW_M - 1} AS idx,
             CAST(NULL AS TIMESTAMP) AS day,
             CAST(NULL AS DOUBLE) AS y,
             CAST(NULL AS DOUBLE) AS fitted,
             l0 AS l, b0 AS b, s0 AS s,
             CAST(NULL AS DOUBLE) AS s_emit
      FROM init
      UNION ALL
      SELECT d.event_type, d.idx, d.day, d.y,
             r.l + r.b + r.s[d.idx % {_HW_M} + 1] AS fitted,
             {_HW_A} * (d.y - r.s[d.idx % {_HW_M} + 1])
               + {1 - _HW_A} * (r.l + r.b) AS l,
             {_HW_B} * (({_HW_A} * (d.y - r.s[d.idx % {_HW_M} + 1])
                         + {1 - _HW_A} * (r.l + r.b)) - r.l)
               + {1 - _HW_B} * r.b AS b,
             list_concat(list_concat(
               r.s[1:d.idx % {_HW_M}],
               [{_HW_G} * (d.y - ({_HW_A}
                  * (d.y - r.s[d.idx % {_HW_M} + 1])
                  + {1 - _HW_A} * (r.l + r.b)))
                + {1 - _HW_G} * r.s[d.idx % {_HW_M} + 1]]),
               r.s[d.idx % {_HW_M} + 2:{_HW_M}]) AS s,
             {_HW_G} * (d.y - ({_HW_A}
                * (d.y - r.s[d.idx % {_HW_M} + 1])
                + {1 - _HW_A} * (r.l + r.b)))
              + {1 - _HW_G} * r.s[d.idx % {_HW_M} + 1] AS s_emit
      FROM r JOIN d
        ON d.event_type = r.event_type AND d.idx = r.idx + 1)
    SELECT event_type, day, y, fitted, l AS level, b AS trend,
           s_emit AS seasonal
    FROM r WHERE idx >= {_HW_M} AND day IS NOT NULL
    """,
)
def ts_holt_winters(spark, sf_dir):
    """Additive HOLT-WINTERS triple exponential smoothing (period 7)
    over each event type's daily count series — the seasonal
    completion of ts_holt_linear (alpha={_HW_A}, beta={_HW_B},
    gamma={_HW_G}; week-1 mean level, week-over-week trend, week-1
    deviation seasonals; one-step-ahead fitted = l + b + s before
    each update). State at t depends on state at t-1 AND a rotating
    7-slot seasonal vector — a recurrence Catalyst cannot express,
    so it is the documented applyInPandas escape hatch, while the
    oracle carries the seasonal vector as a LIST through DuckDB's
    recursive CTE and rebuilds the updated slot by slicing.

    Scale shape: identical to ts_holt_linear — the scan collapses to
    the bounded (series, day) relation, ONE shuffle partitions by
    series, each series' recurrence runs sequentially inside its own
    Arrow batch: parallel across millions of series, never across
    time. Both engines execute the same float64 op sequence with the
    same literal constants (0.4/0.6, 0.2/0.8, 0.3/0.7 — never
    computed 1-alpha), so every level/trend/seasonal/fitted is
    bit-identical."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    return daily.groupBy("event_type").applyInPandas(
        _hw_fit, schema=_HW_DDL)


# --------------------------------------------------- changefeed_corr_view

def _corr_view_oracle() -> str:
    from ..streaming.view_queries import _VIS_CTE

    mom = """
      SELECT batch_id, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(event_id) AS DOUBLE) AS sy,
             CAST(sum(CAST(value AS DECIMAL(18,6)) * event_id)
                  AS DOUBLE) AS sxy,
             CAST(sum(CAST(value AS DECIMAL(18,6))
                      * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS sx2,
             CAST(sum(CAST(event_id AS DECIMAL(38,0))
                      * CAST(event_id AS DECIMAL(38,0))) AS DOUBLE)
               AS sy2
      FROM vis GROUP BY batch_id, event_type
    """
    return _VIS_CTE + f"""
    , mom AS ({mom})
    SELECT batch_id, event_type, n,
           FLOOR(((sxy - sx * sy / n)
                  / sqrt((sx2 - sx * sx / n) * (sy2 - sy * sy / n)))
                 * 1000000.0 + 0.5) / 1000000.0 AS corr6
    FROM mom WHERE n > 1
          AND (sx2 - sx * sx / n) * (sy2 - sy * sy / n) > 0
    """


@query("changefeed_corr_view", oracle=_corr_view_oracle())
def changefeed_corr_view(spark, sf_dir):
    """Exact Pearson CORRELATION between a group's values and their
    event recency (event_id) as a MAINTAINED VIEW — the bivariate
    completion of changefeed_variance_view's second-moment story,
    and a drift detector (is the metric trending with arrival
    order?) that updates per micro-batch. No new maintenance state:
    the five moments (n, Sx, Sy, Sxy, Sx2, Sy2) fold at read time
    from the SAME delta-maintained LWW base relation every other
    view rides, in EXACT DECIMAL (value as decimal(18,6), event_id
    integer; products stay decimal) — only the final normalized
    quotient runs in IEEE doubles on bit-identical rational inputs,
    quantized to 6 dp (the variance view's tie rule). Groups with
    zero variance on either side are excluded (corr undefined), as
    is n = 1. Trajectory-graded per micro-batch: a wrong retraction
    anywhere in the base's LWW history shifts some batch's moments
    and breaks the hash.

    Scale: read cost is one aggregate over the base relation per
    batch (the distinct/variance-view read posture); maintenance
    cost is zero beyond the base the runner already folds."""
    from ..streaming.view_queries import _runner

    r = _runner(spark, sf_dir)
    vdec = F.col("value").cast("decimal(18,6)")
    parts = []
    for b in r._batches:
        base = r._base.df_at(b).where(~F.col("deleted"))
        g = base.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(vdec).cast("double").alias("sx"),
            F.sum("event_id").cast("double").alias("sy"),
            F.sum(vdec * F.col("event_id")).cast("double")
            .alias("sxy"),
            F.sum(vdec * vdec).cast("double").alias("sx2"),
            F.sum(F.col("event_id").cast("decimal(38,0)")
                  * F.col("event_id").cast("decimal(38,0)"))
            .cast("double").alias("sy2"),
        )
        num = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
        den = ((F.col("sx2")
                - F.col("sx") * F.col("sx") / F.col("n"))
               * (F.col("sy2")
                  - F.col("sy") * F.col("sy") / F.col("n")))
        parts.append(
            g.where((F.col("n") > 1) & (den > 0))
            .select(
                F.lit(b).alias("batch_id"), "event_type", "n",
                (F.floor((num / F.sqrt(den)) * F.lit(1000000.0)
                         + F.lit(0.5)).cast("double")
                 / F.lit(1000000.0)).alias("corr6"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------ source_jsonl_permissive

_JSON_BAD_DIRS: dict = {}
_N_BAD_JSON = 6


def _jsonl_with_corruption(spark, sf_dir: str) -> str:
    """The JSONL events copy plus one file of deliberately broken
    lines (truncated objects, bare text, type garbage) — built once
    per (session, sf_dir); the JSON twin of _csv_with_corruption."""
    import os as _os
    import shutil as _shutil

    from ..tmputil import scratch_dir
    from .scans import _format_copy

    key = (id(spark), sf_dir)
    if key not in _JSON_BAD_DIRS:
        src = _format_copy(spark, sf_dir, "json")
        root = scratch_dir(prefix="dbrcf-jsonbad-")
        for f in _os.listdir(src):
            if f.endswith(".json"):
                _shutil.copy(_os.path.join(src, f),
                             _os.path.join(root, f))
        bad = [
            '{"event_id": 1, "user_id": 2,',        # truncated
            'this is not json at all',              # bare text
            '{"event_id": "zap", "user_id": "x"}',  # type garbage
            '{"event_id": }',                       # missing value
            '{"event_id": 5 "user_id": 6}',         # missing comma
            '{unquoted: keys}',                     # bad tokens
        ]
        with open(_os.path.join(root, "zz-corrupt.json"), "w") as fh:
            fh.write("\n".join(bad) + "\n")
        _JSON_BAD_DIRS[key] = root
    return _JSON_BAD_DIRS[key]


@query(
    "source_jsonl_permissive",
    oracle=f"""
    SELECT 'good' AS klass, count(*) AS n,
           {{S}} AS sum_value,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           CAST(sum(user_id) AS BIGINT) AS sum_user_id,
           count(event_type) AS n_typed
    FROM events
    UNION ALL
    SELECT 'corrupt', {_N_BAD_JSON}, CAST(NULL AS DOUBLE),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 0
    """.replace("{S}", sql_dsum("value")),
)
def source_jsonl_permissive(spark, sf_dir):
    """Malformed-input handling on the JSON-lines connector — the
    JSONL twin of source_csv_permissive, completing the dead-letter
    story across both text formats a 100 TB ingest actually
    receives: PERMISSIVE mode routes every syntactically broken
    line (truncated object, bare text, bad tokens) into
    _corrupt_record instead of killing the job (FAILFAST) or
    silently dropping data (DROPMALFORMED). Six injected breakages
    ride alongside the clean copy; graded output: good rows and
    checksum unchanged, corrupt count exactly the injected lines.
    Type-garbage inside VALID json also lands in _corrupt_record
    under JSON's stricter contract — schema mismatch is corruption
    here, unlike CSV's null-fill (a top-level ARRAY, by contrast,
    parses as an all-null row, which is why the fixture injects
    only unambiguous breakages).

    The audit aggregates REFERENCE EVERY SCHEMA COLUMN on purpose:
    the JSON reader only PARSES projected fields (column pruning),
    so an audit that touched just `value` would let a line with
    type garbage in an unprojected field sail through as 'good' —
    the quarantine gate must force the full parse it claims to
    certify (and the per-column checksums are what a real ingest
    manifest records anyway).

    Scale: one scan, the classifier is a null-check projection, and
    the quarantine column carries the raw line for replay — no
    second pass over the corpus."""
    from .scans import _EVENTS_PROJ_DDL

    path = _jsonl_with_corruption(spark, sf_dir)
    df = (
        spark.read
        .schema(_EVENTS_PROJ_DDL + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    good = F.col("_corrupt_record").isNull()
    klass = F.when(good, "good").otherwise("corrupt")
    return df.groupBy(klass.alias("klass")).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.when(good, F.col("value"))).alias("sum_value"),
        F.sum(F.when(good, F.col("event_id"))).cast("long")
        .alias("sum_event_id"),
        F.sum(F.when(good, F.col("user_id"))).cast("long")
        .alias("sum_user_id"),
        F.count(F.when(good, F.col("event_type"))).alias("n_typed"),
    )
