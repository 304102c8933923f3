"""Round-7 LLM-pipeline widening: exact-substring span dedup (the
Lee et al. windowed-hash recipe), BPE merge learning (the Sennrich
subword algorithm as a fixed-round dataflow), and the sharded
training-data export summary (the pipeline's last mile).

Registered AFTER every pre-r7 module (grading-rotation discipline:
new names must not displace the 47 certified-pending queries from the
~50-query official budget).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

# ----------------------------------------------------- span dedup

_SPAN_W = 8  # words per window — repeated windows of this length
#             mark verbatim cross-/intra-document duplication


@query(
    "llm_dedup_spans",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    wins AS (
      SELECT doc_id, i,
             md5(array_to_string(ws[i:i+{_SPAN_W - 1}], ' ')) AS h
      FROM w, unnest(generate_series(1, len(ws) - {_SPAN_W} + 1))
             AS t(i)),
    c AS (SELECT h, count(*) AS cnt FROM wins GROUP BY h),
    dup AS (
      SELECT doc_id, i FROM wins JOIN c USING (h) WHERE cnt >= 2),
    isl AS (
      SELECT doc_id, i,
             CASE WHEN max(i + {_SPAN_W} - 1) OVER (
                    PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    >= i - 1
                  THEN 0 ELSE 1 END AS is_new
      FROM dup),
    grp AS (
      SELECT doc_id, i,
             sum(is_new) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM isl),
    spans AS (
      SELECT doc_id, island,
             min(i) AS s, max(i) + {_SPAN_W} - 1 AS e
      FROM grp GROUP BY doc_id, island)
    SELECT d.doc_id,
           count(*) AS n_spans,
           CAST(sum(e - s + 1) AS BIGINT) AS covered_tokens,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens
    FROM spans sp JOIN documents d USING (doc_id)
    GROUP BY d.doc_id, d.text
    """,
)
def llm_dedup_spans(spark, sf_dir):
    """EXACT-SUBSTRING span dedup — the windowed-hash approximation
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better", the suffix-array ExactSubstr recipe): every
    overlapping {W}-word window is hashed; windows whose hash repeats
    ANYWHERE in the corpus (cross- or intra-document) mark verbatim
    duplicated text, and per document the marked windows merge into
    maximal duplicated SPANS (gaps-and-islands over window start
    positions — intervals within one position of the running maximum
    end coalesce). Emits per affected document the span count, the
    union coverage in tokens, and the document length — the numbers a
    span-scrub or length-weighted downsample consumes downstream.

    Scale: the explode is O(tokens) rows but only 16-byte hashes
    shuffle (map-side-combined counts, then a hash equi-join back);
    the island window partitions per document (bounded length) —
    nothing corpus-sized serializes through one task. At 100 TB the
    count table gets a min-count Bloom pre-filter before the join
    (the join_bloom_filter pattern) so singleton windows — the vast
    majority — never re-shuffle.
    """.replace("{W}", str(_SPAN_W))
    from ._util import fan_out

    d = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n = F.size(ws)
    idxs = F.when(
        n >= _SPAN_W, F.sequence(F.lit(1), n - _SPAN_W + 1)
    ).otherwise(F.array().cast("array<int>"))
    # r13: the O(tokens) explode+md5 stage feeds TWO consumers (the
    # count fold and the dup join) and was re-executed for each, both
    # times inside the single-split scan stage — fan the scan out and
    # persist the window-hash relation once (16-byte hashes + two
    # ints per row, the only thing this query ever shuffles anyway).
    wins = fan_out(d, "doc_id").select(
        "doc_id",
        F.explode(idxs).alias("i"),
        ws.alias("ws"),
    ).select(
        "doc_id", "i",
        F.md5(F.concat_ws(" ", F.slice("ws", F.col("i"),
                                       F.lit(_SPAN_W)))).alias("h"),
    ).localCheckpoint(eager=False)
    cnt = wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    dup = (
        wins.join(cnt.where(F.col("cnt") >= 2), "h")
        .select("doc_id", "i")
    )
    prev_end = F.max(F.col("i") + _SPAN_W - 1).over(
        Window.partitionBy("doc_id").orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1))
    isl = dup.select(
        "doc_id", "i",
        F.when(prev_end >= F.col("i") - 1, 0).otherwise(1)
        .alias("is_new"),
    )
    grp = isl.select(
        "doc_id", "i",
        F.sum("is_new").over(
            Window.partitionBy("doc_id").orderBy("i")
            .rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    spans = grp.groupBy("doc_id", "island").agg(
        F.min("i").alias("s"),
        (F.max("i") + _SPAN_W - 1).alias("e"),
    )
    return (
        spans.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("e") - F.col("s") + 1).cast("long")
            .alias("covered_tokens"),
        )
        .join(d.select("doc_id", n.cast("long").alias("n_tokens")),
              "doc_id")
        .select("doc_id", "n_spans", "covered_tokens", "n_tokens")
    )


# ----------------------------------------------------- BPE learning

_BPE_ROUNDS = 3


def _bpe_ctes() -> str:
    """Chained-CTE prefix shared by llm_bpe_learn and
    llm_tokenize_bpe: each round recounts weighted adjacent symbol
    pairs over the current segmentation, picks the top merge
    (count desc, pair asc), and re-segments every term with one
    greedy left-to-right replace — the {a}{b} wrapping makes
    adjacent occurrences non-overlapping, which IS the BPE merge
    rule."""
    sql = """
    WITH vocab AS (
      SELECT term, count(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS term
            FROM documents)
      GROUP BY term),
    seg0 AS (
      SELECT term, freq,
             '{' || array_to_string(
                 regexp_split_to_array(term, ''), '}{') || '}' AS seg
      FROM vocab)"""
    for r in range(1, _BPE_ROUNDS + 1):
        p = r - 1
        sql += f""",
    pairs{r} AS (
      SELECT a[i] || ' ' || a[i+1] AS pair, sum(freq) AS cnt
      FROM (SELECT freq,
                   string_split(substr(seg, 2, len(seg) - 2),
                                '}}{{') AS a
            FROM seg{p}),
           unnest(generate_series(1, len(a) - 1)) AS t(i)
      GROUP BY 1),
    top{r} AS (
      SELECT pair, cnt,
             replace(pair, ' ', '') AS merged
      FROM pairs{r} ORDER BY cnt DESC, pair LIMIT 1),
    seg{r} AS (
      SELECT s.term, s.freq,
             replace(s.seg,
                     '{{' || string_split(t.pair, ' ')[1] || '}}{{'
                          || string_split(t.pair, ' ')[2] || '}}',
                     '{{' || t.merged || '}}') AS seg
      FROM seg{p} s, top{r} t)"""
    return sql


def _bpe_oracle() -> str:
    selects = " UNION ALL ".join(
        f"SELECT {r} AS round, pair, merged, CAST(cnt AS BIGINT) "
        f"AS cnt FROM top{r}"
        for r in range(1, _BPE_ROUNDS + 1))
    return _bpe_ctes() + "\n    " + selects


@query("llm_bpe_learn", oracle=_bpe_oracle())
def llm_bpe_learn(spark, sf_dir):
    """BPE MERGE LEARNING (Sennrich et al. 2016) as a fixed-round
    distributed dataflow — the tokenizer-training step of an LLM data
    pipeline. Each round: (1) weighted adjacent-symbol-pair counts
    over the term table's current segmentation (one map-side-combined
    aggregate over terms x their symbol pairs — the corpus text is
    touched ONCE, at vocab build), (2) the argmax merge under the
    deterministic (count desc, pair asc) tie-break, broadcast back as
    a 1-row relation, (3) greedy left-to-right re-segmentation of
    every term via a single string replace over the {a}{b}-wrapped
    symbol string — the wrapping makes adjacent merge sites
    non-overlapping, so built-in replace implements exactly the BPE
    merge semantics on BOTH engines (verified: ' {a}{a}{a} ' -> one
    merge plus a survivor). Emits the learned merge table (round,
    pair, merged token, weighted count).

    Scale: state per round is the term table (vocab-sized, shuffles
    16-byte-ish strings) — corpus-independent after the initial term
    count; rounds are a driver-side loop over tiny DataFrames with
    the merge broadcast, the same shape centroid iteration
    (llm_kmeans) uses. Fixture vocab is ~31 terms; the plan is
    identical at a 10^7-term vocab."""
    merges, _ = _bpe_run(spark, sf_dir)
    return merges


def _bpe_run(spark, sf_dir):
    """The shared BPE loop: returns (merge-table DataFrame, final
    per-term segmentation DataFrame) after _BPE_ROUNDS rounds."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    )
    seg = vocab.select(
        "term", "freq",
        F.concat(F.lit("{"),
                 F.concat_ws("}{", F.split("term", "")),
                 F.lit("}")).alias("seg"),
    )
    out = None
    for r in range(1, _BPE_ROUNDS + 1):
        a = F.split(
            F.expr("substr(seg, 2, length(seg) - 2)"), r"\}\{")
        n = F.size(a)
        pairs_arr = F.zip_with(
            F.slice(a, 1, n - 1), F.slice(a, 2, n - 1),
            lambda x, y: F.concat(x, F.lit(" "), y))
        top = (
            seg.select("freq", F.explode(pairs_arr).alias("pair"))
            .groupBy("pair").agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .select(
                F.lit(r).alias("round"), "pair",
                F.replace("pair", F.lit(" "), F.lit(""))
                .alias("merged"),
                F.col("cnt").cast("long").alias("cnt"),
            )
        )
        row = top.collect()[0]  # 1-row merge decision — O(1) driver
        out = top if out is None else out.unionByName(top)
        pat = "{%s}{%s}" % tuple(row["pair"].split(" "))
        rep = "{%s}" % row["merged"]
        seg = seg.select(
            "term", "freq",
            F.replace("seg", F.lit(pat), F.lit(rep)).alias("seg"),
        )
    return out, seg


# ------------------------------------------------- sharded export

_N_SHARDS = 8


@query(
    "llm_export_shards",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, text, n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS r,
             count(*) OVER () AS n
      FROM documents)
    SELECT CAST(floor(r * {_N_SHARDS} / n) AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
             AS n_tokens,
           CAST(min(r) AS BIGINT) AS min_rank,
           CAST(max(r) AS BIGINT) AS max_rank,
           CAST(sum(CAST(('0x' || substr(md5(text), 1, 10))
                         AS UBIGINT)) AS BIGINT) AS checksum
    FROM ranked
    GROUP BY 1
    """,
)
def llm_export_shards(spark, sf_dir):
    """SHARDED TRAINING-DATA EXPORT — the pipeline's last mile: the
    curriculum-ordered corpus (easy-first: n_chars, doc_id) is range-
    cut into {S} equal shards by exact integer boundaries
    (shard = floor(rank0 * S / N)) and each shard is summarized with
    the manifest a training loader checks before reading: document
    count, token count, rank range, and a content checksum (sum of
    40-bit md5 prefixes — order-insensitive, overflow-free in int64
    far past 10^9 docs/shard).

    The global rank is the two-level histogram-offset build (the
    llm_curriculum_order pattern): a per-n_chars histogram's running
    sum gives bucket offsets, row_number partitions by n_chars — no
    corpus-wide single-partition window anywhere. At 100 TB the
    physical write is repartitionByRange(order_key) + partitionBy
    (shard_id) — the layout_partitioned_write path; tests drive that
    write and re-derive this summary from the written files.
    """.replace("{S}", str(_N_SHARDS))
    d = load_table(spark, sf_dir, "documents")
    n_total = d.count()
    hist = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("bn"))
    wh = (Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = hist.select(
        "n_chars",
        F.coalesce(F.sum("bn").over(wh), F.lit(0)).alias("off"))
    rn = F.row_number().over(
        Window.partitionBy("n_chars").orderBy("doc_id"))
    ranked = (
        d.join(F.broadcast(offsets), "n_chars")
        .select(
            "doc_id", "text",
            (F.col("off") + rn - 1).alias("r"),
        )
        .withColumn(
            "shard_id",
            F.floor(F.col("r") * _N_SHARDS / F.lit(n_total))
            .cast("long"))
    )
    return ranked.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long")
        .alias("n_tokens"),
        F.min("r").cast("long").alias("min_rank"),
        F.max("r").cast("long").alias("max_rank"),
        F.sum(F.conv(F.substring(F.md5("text"), 1, 10), 16, 10)
              .cast("long")).cast("long").alias("checksum"),
    )


@query(
    "llm_tokenize_bpe",
    oracle=_bpe_ctes() + f"""
    , wpt AS (
      SELECT term,
             len(string_split(substr(seg, 2, len(seg) - 2),
                              '}}{{')) AS n_sub
      FROM seg{_BPE_ROUNDS}),
    doc_words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents)
    SELECT doc_id,
           count(*) AS n_words,
           CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
    FROM doc_words JOIN wpt USING (term)
    GROUP BY doc_id
    """,
)
def llm_tokenize_bpe(spark, sf_dir):
    """TOKENIZER APPLY — the second half of the BPE loop: the
    segmentation learned by llm_bpe_learn (after 3 merges) applied
    to every document, emitting exact word and subword-token counts
    per doc — the token-budget accounting a training-data pipeline
    runs after tokenizer training (llm_token_count is the
    whitespace/regex approximation; this is the tokenizer-exact
    form). The corpus never re-segments: documents explode to words
    and JOIN the vocab-sized (term -> subword count) table — at
    100 TB that join is a broadcast (a tokenizer vocab is ~10^5
    terms), so the plan is one corpus scan plus a map-side join,
    and the learning loop's cost stays amortized across every
    downstream apply."""
    _, seg = _bpe_run(spark, sf_dir)
    wpt = seg.select(
        "term",
        F.size(F.split(
            F.expr("substr(seg, 2, length(seg) - 2)"), r"\}\{"))
        .alias("n_sub"),
    )
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " "))
                 .alias("term"))
        .join(F.broadcast(wpt), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_bpe_tokens"),
        )
    )


@query(
    "llm_dedup_spans_rewrite",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    wins AS (
      SELECT doc_id, i,
             md5(array_to_string(ws[i:i+{_SPAN_W - 1}], ' ')) AS h
      FROM w, unnest(generate_series(1, len(ws) - {_SPAN_W} + 1))
             AS t(i)),
    c AS (SELECT h, count(*) AS cnt FROM wins GROUP BY h),
    dup AS (
      SELECT doc_id, i FROM wins JOIN c USING (h) WHERE cnt >= 2),
    toks AS (
      SELECT doc_id, p, ws[p] AS tok
      FROM w, unnest(generate_series(1, len(ws))) AS t(p)),
    kept AS (
      SELECT t.doc_id, t.p, t.tok
      FROM toks t
      WHERE NOT EXISTS (
        SELECT 1 FROM dup d
        WHERE d.doc_id = t.doc_id
          AND t.p BETWEEN d.i AND d.i + {_SPAN_W} - 1)),
    rebuilt AS (
      SELECT doc_id,
             string_agg(tok, ' ' ORDER BY p) AS clean_text
      FROM kept GROUP BY doc_id)
    SELECT w.doc_id,
           CAST(coalesce(strlen(r.clean_text), 0) AS BIGINT)
             AS clean_chars,
           md5(coalesce(r.clean_text, '')) AS clean_digest
    FROM w LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def llm_dedup_spans_rewrite(spark, sf_dir):
    """The SCRUB stage of exact-substring dedup — llm_dedup_spans
    reports the duplicated regions; this emits the cleaned document
    (graded as length + md5, the llm_dedup_paragraphs_rewrite
    convention): every token covered by ANY repeated window is
    removed, the survivors re-join in original order. This is the
    aggressive variant of the Lee et al. scrub (no copy is kept —
    the keep-one-owner variant is the paragraphs family's contract;
    both are standard). A fully-duplicated document rewrites to the
    empty string but stays in the output (LEFT join), so downstream
    length filters see it.

    Determinism without an ordered string aggregate: survivors
    collect as (position, token) structs and array_sort — struct
    order sorts by position first — then join. Scale: the anti
    condition is a per-document interval check against that
    document's OWN spans (documents are bounded, spans few), done as
    a doc-local range join after the hash-count shuffle — the corpus
    text shuffles once."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n = F.size(ws)
    idxs = F.when(
        n >= _SPAN_W, F.sequence(F.lit(1), n - _SPAN_W + 1)
    ).otherwise(F.array().cast("array<int>"))
    wins = d.select(
        "doc_id", F.explode(idxs).alias("i"), ws.alias("ws")
    ).select(
        "doc_id", "i",
        F.md5(F.concat_ws(" ", F.slice("ws", F.col("i"),
                                       F.lit(_SPAN_W)))).alias("h"),
    )
    cnt = wins.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    dup = (
        wins.join(cnt.where(F.col("cnt") >= 2), "h")
        .select("doc_id", F.col("i").alias("di"))
    )
    toks = d.select(
        "doc_id", F.posexplode(ws).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    covered = (
        toks.join(
            dup,
            (toks.doc_id == dup.doc_id)
            & F.col("p").between(F.col("di"),
                                 F.col("di") + _SPAN_W - 1),
            "left_semi")
    )
    kept = toks.exceptAll(covered)
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("p", "tok")))
             .alias("a"))
        .select(
            "doc_id",
            F.array_join(F.transform("a", lambda s: s["tok"]), " ")
            .alias("clean_text"),
        )
    )
    return (
        d.select("doc_id").join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.length("clean_text"), F.lit(0))
            .cast("long").alias("clean_chars"),
            F.md5(F.coalesce("clean_text", F.lit("")))
            .alias("clean_digest"),
        )
    )


@query(
    "sink_python_datasource",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def sink_python_datasource(spark, sf_dir):
    """Custom SINK via the Python DataSource WRITER API (Spark 4) —
    the write half of the connector story (source_python_datasource
    / source_python_datasource_stream cover the read half): each
    task streams its partition through DataSourceArrowWriter as
    Arrow RecordBatches into a uniquely-named staged parquet file
    and returns a commit message; the driver's commit() publishes a
    manifest listing exactly the committed files (tmp + atomic
    rename). The graded read-back honors ONLY the manifest — an
    orphaned staging file from a failed/retried task is invisible,
    which is the two-phase-commit contract every external sink
    needs (the sink_idempotent_merge recipe expressed at the
    connector layer; abort() removes staged files). Classes are
    defined in-function so cloudpickle ships them by value.

    Scale: data flows executor-side as Arrow batches (no driver
    hop, no row loop); the driver handles only O(tasks) commit
    messages. Round-trip graded against the events table."""
    import os
    import uuid as _uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceArrowWriter,
        WriterCommitMessage,
    )

    from ..tmputil import scratch_dir

    out = scratch_dir(prefix="dbrcf-pysink-")
    stage = os.path.join(out, "stage")
    os.makedirs(stage, exist_ok=True)

    class _Msg(WriterCommitMessage):
        def __init__(self, fname, n):
            self.fname = fname
            self.n = n

    class _ArrowSinkWriter(DataSourceArrowWriter):
        def __init__(self, options):
            self.stage = options["stage"]

        def write(self, iterator):
            import pyarrow as pa
            import pyarrow.parquet as pq

            batches = list(iterator)
            fname = f"part-{_uuid.uuid4().hex}.parquet"
            if batches:
                tbl = pa.Table.from_batches(batches)
            else:
                return _Msg(None, 0)
            pq.write_table(tbl, os.path.join(self.stage, fname))
            return _Msg(fname, tbl.num_rows)

        def commit(self, messages):
            import json as _json

            files = [(m.fname, m.n) for m in messages
                     if m is not None and m.fname is not None]
            man = os.path.join(os.path.dirname(self.stage),
                               "_MANIFEST.json")
            with open(man + ".tmp", "w") as f:
                _json.dump({"files": files,
                            "rows": sum(n for _, n in files)}, f)
            os.replace(man + ".tmp", man)

        def abort(self, messages):
            for m in messages:
                if m is not None and m.fname is not None:
                    try:
                        os.remove(os.path.join(self.stage, m.fname))
                    except OSError:
                        pass

    class EventsSink(DataSource):
        @classmethod
        def name(cls):
            return "dbrcf_events_sink"

        def writer(self, schema, overwrite):
            return _ArrowSinkWriter(self.options)

    spark.dataSource.register(EventsSink)
    src = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value")
    (
        src.write.format("dbrcf_events_sink")
        .option("stage", stage).mode("append").save()
    )
    # plant an orphan staged file: a crashed task's leftover MUST be
    # invisible to the manifest-honoring read-back
    import shutil as _shutil
    import json as _json

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        man = _json.load(f)
    committed = [fn for fn, _ in man["files"]]
    if committed:
        _shutil.copyfile(
            os.path.join(stage, committed[0]),
            os.path.join(stage, "part-orphan-not-committed.parquet"))
    paths = [os.path.join(stage, fn) for fn in committed]
    return spark.read.schema(
        "event_id long, user_id long, event_type string, "
        "value double").parquet(*paths)


@query(
    "sink_python_datasource_stream",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def sink_python_datasource_stream(spark, sf_dir):
    """The STREAMING write half of the Python DataSource connector
    matrix (reader/stream-reader/writer are already graded): the
    replayed events stream drains through a custom
    DataSourceStreamArrowWriter — per-micro-batch, each task stages
    its partition as Arrow batches and the driver's
    commit(messages, batchId) publishes an atomic PER-BATCH manifest
    (manifest-00042.json), exactly the Kafka-like external-sink
    contract sink_idempotent_merge expresses via foreachBatch, now
    at the connector layer where Spark itself drives the two-phase
    commit per trigger. A re-delivered batch overwrites its own
    manifest (idempotent); abort() removes that batch's staged
    files. The graded read-back unions exactly the files listed in
    committed manifests — orphaned stages are invisible.

    Scale: executor-side Arrow staging per batch, O(tasks) commit
    messages per trigger on the driver, manifest count = trigger
    count (compacted by any retention job like retention_gc)."""
    import glob as _glob
    import json as _json
    import os
    import uuid as _uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamArrowWriter,
        WriterCommitMessage,
    )

    from ..streaming.queries import _replayed
    from ..streaming.replay import streaming_shuffle, fresh_sink_name
    from ..tmputil import scratch_dir

    out = scratch_dir(prefix="dbrcf-pystreamsink-")
    stage = os.path.join(out, "stage")
    os.makedirs(stage, exist_ok=True)

    class _Msg(WriterCommitMessage):
        def __init__(self, fname, n):
            self.fname = fname
            self.n = n

    class _StreamSinkWriter(DataSourceStreamArrowWriter):
        def __init__(self, options):
            self.root = options["root"]
            self.stage = os.path.join(self.root, "stage")

        def write(self, iterator):
            import pyarrow as pa
            import pyarrow.parquet as pq

            batches = list(iterator)
            if not batches:
                return _Msg(None, 0)
            tbl = pa.Table.from_batches(batches)
            fname = f"part-{_uuid.uuid4().hex}.parquet"
            pq.write_table(tbl, os.path.join(self.stage, fname))
            return _Msg(fname, tbl.num_rows)

        def commit(self, messages, batchId):
            files = [(m.fname, m.n) for m in messages
                     if m is not None and m.fname is not None]
            man = os.path.join(self.root,
                               f"manifest-{batchId:05d}.json")
            with open(man + ".tmp", "w") as f:
                _json.dump({"batch_id": batchId, "files": files}, f)
            os.replace(man + ".tmp", man)

        def abort(self, messages, batchId):
            for m in messages:
                if m is not None and m.fname is not None:
                    try:
                        os.remove(os.path.join(self.stage, m.fname))
                    except OSError:
                        pass

    class EventsStreamSink(DataSource):
        @classmethod
        def name(cls):
            return "dbrcf_events_stream_sink"

        def streamWriter(self, schema, overwrite):
            return _StreamSinkWriter(self.options)

    spark.dataSource.register(EventsStreamSink)
    src = _replayed(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value")
    with streaming_shuffle(spark):
        q = (
            src.writeStream.format("dbrcf_events_stream_sink")
            .option("root", out)
            .option("checkpointLocation",
                    os.path.join(out, "ckpt"))
            .trigger(availableNow=True)
            .queryName(fresh_sink_name("pystreamsink"))
            .start()
        )
        q.awaitTermination()
    committed = []
    for man in sorted(_glob.glob(os.path.join(out,
                                              "manifest-*.json"))):
        with open(man) as f:
            committed += [fn for fn, _ in _json.load(f)["files"]]
    paths = [os.path.join(stage, fn) for fn in committed]
    return spark.read.schema(
        "event_id long, user_id long, event_type string, "
        "value double").parquet(*paths)
