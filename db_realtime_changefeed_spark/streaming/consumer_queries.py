"""Consumer-lifecycle and sink-contract graded queries — the round-6
cursor-resume / idempotent-sink / quarantine / bootstrap / progress
family. Split out of streaming/queries.py in round 6 (housekeeping:
no file over ~2,500 lines) purely mechanically — registration names,
bodies, and declaration order are unchanged (this module is imported
directly after streaming.queries in load_all())."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..tmputil import scratch_dir
from ..queries import query
from ..queries._util import DEC, dsum
from ..catalog import load_table
from .queries import _DELTA_LOG_ORACLE, _changefeed, _replayed, _to_table
from .replay import (
    build_replay_chunks,
    default_chunks,
    fresh_sink_name,
    read_events_stream,
    run_available_now,
    streaming_shuffle,
)
from .changefeed import ChangefeedRunner, cdc_envelope


@query("changefeed_cursor_resume", oracle=_DELTA_LOG_ORACLE)
def changefeed_cursor_resume(spark, sf_dir):
    """RESUME-TOKEN consumption — the client-side contract the
    Cursor API (api.py) makes: a consumer that crashed after
    durably processing batches < mid restarts a BRAND-NEW cursor
    seeked to its persisted token, and the pre-crash segment plus
    the resumed delivery must reassemble the COMPLETE delta log —
    no batch lost at the crash boundary, none replayed before it
    (the graded hash against the full-log oracle fails on either).
    The pre-crash segment is the log DataFrame filtered below the
    token (executor-side); the resumed segment goes through the
    real cursor (seek + poll), which is client-side BY DEFINITION —
    a subscriber is a client — and bounded by delivered-delta size,
    not state size. The position must land one past the final
    batch, asserted loudly."""
    from ..api import Cursor

    runner = _changefeed(spark, sf_dir)
    log = runner.log()
    mid = default_chunks() // 2
    consumed = log.where(F.col("batch_id") < mid)
    c = Cursor(runner)
    c.seek(mid)  # the token the crashed client persisted
    rows = c.poll()
    n_batches = default_chunks()
    if c.position != n_batches:
        raise AssertionError(
            f"cursor resumed to {c.position}, expected {n_batches}")
    resumed = (
        spark.createDataFrame(rows, log.schema) if rows
        else spark.createDataFrame([], log.schema)
    )
    return consumed.unionByName(resumed)


@query(
    "sink_idempotent_merge",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_value
    FROM events GROUP BY event_type
    """,
)
def sink_idempotent_merge(spark, sf_dir):
    """IDEMPOTENT EXTERNAL SINK — the exactly-once recipe for
    foreachBatch delivery into systems without transactional sinks
    (VERDICT r5 missing #2's second half): every batch commits
    (new state version + APPLIED manifest) atomically via
    write-then-rename, keyed by batch_id, and a RE-DELIVERED batch
    id is recognized in the manifest and skipped — so at-least-once
    upstream (Spark's foreachBatch guarantee) composes to
    exactly-once effects. The graded run REPLAYS its final batch
    after the stream completes (the upstream-retry simulation); the
    state must equal the batch aggregate exactly — a non-idempotent
    sink double-counts the replayed chunk and fails the hash.
    State merge is a full-outer join of the previous 5-row state
    with the batch delta in exact DECIMAL — at 100 TB keys this
    becomes the bucketed MVCC store's pruned merge
    (state_store.py); the manifest protocol is identical."""
    import glob
    import json
    import os

    from .replay import build_replay_chunks, read_events_stream

    chunks = build_replay_chunks(spark, sf_dir)
    root = scratch_dir(prefix="dbrcf-idem-")
    manifest = os.path.join(root, "MANIFEST.json")
    ddl = "event_type string, cnt long, sum_value decimal(18,6)"

    def _read_manifest():
        if not os.path.exists(manifest):
            return {"applied": [], "current": None}
        with open(manifest) as f:
            return json.load(f)

    def apply_batch(batch_df, batch_id):
        man = _read_manifest()
        if batch_id in man["applied"]:
            return  # re-delivery: already committed, exactly-once
        delta = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(18,6)").alias("sum_value"),
        )
        prev = (
            spark.read.schema(ddl).parquet(
                os.path.join(root, man["current"]))
            if man["current"] else spark.createDataFrame([], ddl)
        )
        merged = (
            prev.alias("p").join(delta.alias("d"), "event_type", "full")
            .select(
                "event_type",
                (F.coalesce("p.cnt", F.lit(0))
                 + F.coalesce("d.cnt", F.lit(0))).alias("cnt"),
                (F.coalesce(F.col("p.sum_value"),
                            F.lit(0).cast("decimal(18,6)"))
                 + F.coalesce(F.col("d.sum_value"),
                              F.lit(0).cast("decimal(18,6)")))
                .cast("decimal(18,6)").alias("sum_value"),
            )
        )
        version = f"state-v{batch_id}"
        merged.write.mode("overwrite").parquet(
            os.path.join(root, version))
        man["applied"].append(batch_id)
        man["current"] = version
        with open(manifest + ".tmp", "w") as f:
            json.dump(man, f)
        os.replace(manifest + ".tmp", manifest)  # atomic commit

    q = (
        read_events_stream(spark, chunks)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation",
                scratch_dir(prefix="dbrcf-idem-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # Upstream retry: re-deliver the FINAL batch under its original
    # id. The manifest must swallow it (no new version, no recount).
    files = sorted(glob.glob(os.path.join(chunks, "chunk-*.parquet")))
    last_id = len(files) - 1
    before = _read_manifest()
    apply_batch(spark.read.parquet(files[-1]), last_id)
    after = _read_manifest()
    if after != before:
        raise AssertionError(
            "re-delivered batch mutated the sink state — "
            "idempotence contract broken")

    return spark.read.schema(ddl).parquet(
        os.path.join(root, after["current"])
    ).select(
        "event_type", "cnt",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@query(
    "stream_quarantine",
    oracle="""
    SELECT CASE WHEN value IS NULL OR value < 0 OR value > 190
                THEN 'quarantine' ELSE 'main' END AS sink,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_quarantine(spark, sf_dir):
    """DEAD-LETTER ROUTING on a stream — the quarantine pattern every
    production ingest runs (source_csv_permissive's streaming twin):
    each micro-batch splits on a validity predicate, good rows append
    to the MAIN parquet sink and violations to the QUARANTINE sink
    with the batch id that caught them — the pipeline keeps flowing
    while bad records await triage instead of poisoning the feed or
    being dropped silently. One foreachBatch pass writes both sinks
    (the batch DataFrame is tiny per trigger; at 100 TB you'd persist
    it per batch before the two-sink fan-out, exactly the
    stage-then-fan-out shape stream_scd2_maintain uses). Graded on
    the union of both sinks tagged by route: every input row lands in
    EXACTLY one sink — a row lost in the split or double-routed
    fails the hash."""
    import os

    from .replay import build_replay_chunks, read_events_stream

    chunks = build_replay_chunks(spark, sf_dir)
    main_dir = scratch_dir(prefix="dbrcf-dlq-main-")
    quar_dir = scratch_dir(prefix="dbrcf-dlq-quar-")
    # the upper cut sits inside the fixture's value range so the
    # quarantine path is genuinely exercised (about 2% of rows)
    bad = (F.col("value").isNull() | (F.col("value") < 0)
           | (F.col("value") > 190))

    def route(batch_df, batch_id):
        rows = batch_df.select(
            "event_id", "event_type", "value",
            F.lit(batch_id).alias("batch_id"),
        )
        rows.where(~bad).write.mode("append").parquet(main_dir)
        rows.where(bad).write.mode("append").parquet(quar_dir)

    q = (
        read_events_stream(spark, chunks)
        .writeStream.foreachBatch(route)
        .option("checkpointLocation",
                scratch_dir(prefix="dbrcf-dlq-ckpt-"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ddl = ("event_id long, event_type string, value double,"
           " batch_id long")

    def _read(d, tag):
        df = (
            spark.read.schema(ddl).parquet(d)
            if os.listdir(d) else spark.createDataFrame([], ddl)
        )
        return df.select(F.lit(tag).alias("sink"), "event_type",
                         "value")
    return (
        _read(main_dir, "main")
        .unionByName(_read(quar_dir, "quarantine"))
        .groupBy("sink", "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             dsum(F.col("value")).alias("sum_value"))
    )


@query(
    "changefeed_bootstrap",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
             AS sum_value
    FROM events GROUP BY event_type
    """,
)
def changefeed_bootstrap(spark, sf_dir):
    """BOOTSTRAP-THEN-TAIL — the contract every new CDC consumer
    relies on (Kafka compacted topic + tail, Debezium snapshot +
    binlog, CockroachDB initial_scan + resolved deltas): start from
    a MATERIALIZED SNAPSHOT of the feed at batch k (state_at — the
    MVCC version a bootstrap reads without blocking writers), then
    apply only the delta-log tail PAST k; the reconstruction must
    equal the live state exactly — seam-free: a delta replayed
    across the snapshot boundary double-counts, one dropped at it
    goes missing, and either fails the hash against the batch
    aggregate. Application is keep-latest-per-key over the tail
    (WindowGroupLimit pushes the rn=1 cut into the shuffle) full-
    outer-merged with the snapshot — keys silent after k keep their
    snapshot row, keys born after k arrive with no snapshot row."""
    from pyspark.sql import Window

    runner = _changefeed(spark, sf_dir)
    k = default_chunks() // 2
    snap = runner.state_at(k).select(
        "event_type",
        F.col("cnt").alias("s_cnt"),
        F.col("sum_value").alias("s_sum"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("batch_id").desc())
    tail = (
        runner.log().where(F.col("batch_id") > k)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type",
                F.col("new_count").alias("t_cnt"),
                F.col("new_sum").alias("t_sum"))
    )
    return snap.join(tail, "event_type", "full").select(
        "event_type",
        F.coalesce("t_cnt", "s_cnt").alias("cnt"),
        F.coalesce("t_sum", "s_sum").alias("sum_value"),
    )


@query(
    "stream_progress_audit",
    oracle=f"""
    WITH numbered AS (
      SELECT row_number() OVER (ORDER BY event_id) - 1 AS rn,
             count(*) OVER () AS n
      FROM events),
    chunked AS (
      SELECT CAST(floor(rn / ceil(n / {default_chunks()}.0)) AS BIGINT)
               AS batch_id
      FROM numbered)
    SELECT batch_id, count(*) AS input_rows
    FROM chunked GROUP BY batch_id
    """,
)
def stream_progress_audit(spark, sf_dir):
    """PROGRESS OBSERVABILITY — the StreamingQueryProgress feed every
    streaming operator's on-call dashboard is built from (rows per
    trigger, batch ids): run the replay to completion, then read the
    query's recentProgress history back and grade the per-batch
    numInputRows against the deterministic chunk reconstruction —
    proving the engine's own telemetry agrees with ground truth (a
    batch silently split, coalesced, or double-counted by the
    progress reporter would diverge). Progress objects are
    driver-side BY DESIGN in Spark (a bounded ring buffer of
    per-trigger JSON, default 100 entries) — O(batches), never
    O(rows)."""
    from .replay import build_replay_chunks, read_events_stream

    chunks = build_replay_chunks(spark, sf_dir)
    with streaming_shuffle(spark):
        q = (
            read_events_stream(spark, chunks)
            .writeStream.format("noop")
            .option("checkpointLocation",
                    scratch_dir(prefix="dbrcf-progress-ckpt-"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    rows = [
        (int(pr.batchId), int(pr.numInputRows))
        for pr in q.recentProgress
        if int(pr.numInputRows) > 0
    ]
    return spark.createDataFrame(
        rows, "batch_id long, input_rows long")
