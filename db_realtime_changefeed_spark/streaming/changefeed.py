"""The namesake operator (§2.I7 `changefeed_core`): a standing
aggregation query over a CDC stream that maintains a materialized
result and emits per-trigger deltas — the Spark-first re-expression
of a RethinkDB/CockroachDB-style changefeed.

Semantics (docs/changefeed-semantics.md):
- input: CDC-envelope stream (op, before, after, ts) — here built
  from the replayed `events` table as inserts (§2.A5);
- standing query: per-`event_type` count + sum(value);
- materialization: foreachBatch merges each micro-batch's partial
  aggregate into a versioned parquet state table (MVCC-style: write
  new version, flip a pointer file → re-running a failed batch
  overwrites its own version: idempotent under at-least-once);
- feed: every key whose aggregate changed appends an
  {old_count,new_count,old_sum,new_sum,batch_id} row to a changelog
  — the {old_val,new_val} shape of classic changefeeds.

Scale notes: state and deltas are keyed DataFrames — the merge is a
shuffle on the (low-cardinality) group key, never driver-side; sums
are DECIMAL so merge order can't drift; at 100 TB the parquet state
dir becomes an Iceberg/Delta MERGE target and foreachBatch stays
identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .replay import build_replay_chunks, fresh_sink_name, read_events_stream

_STATE_DEC = "decimal(28,6)"


_PAYLOAD_DDL = (
    "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
    "event_type:string,value:double,props:string>"
)


def cdc_envelope(events: DataFrame) -> DataFrame:
    """§2.A5: wrap raw events in a CDC envelope {op, before, after,
    ts}. The replayed table is insert-only (before = typed NULL);
    update/delete arrive pre-tagged in real CDC feeds."""
    payload = F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
    return events.select(
        F.lit("insert").alias("op"),
        F.lit(None).cast(_PAYLOAD_DDL).alias("before"),
        payload.alias("after"),
        F.col("ts"),
    )


class ChangefeedRunner:
    """Runs the changefeed over the replay chunks; exposes the final
    materialized state and the delta log."""

    _STATE_DDL = "event_type string, cnt long, sum_value decimal(28,6)"

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.root = tempfile.mkdtemp(prefix="dbrcf-changefeed-")
        self.log_dir = os.path.join(self.root, "changelog")
        self.state_root = os.path.join(self.root, "state")
        self.pointer = os.path.join(self.root, "CURRENT")
        os.makedirs(self.state_root, exist_ok=True)
        # warm read cache of the current state rows (group-key
        # cardinality sized). Parquet remains the source of truth —
        # a restarted runner re-reads via the pointer.
        self._state_rows: list | None = None

    # ---- state versioning (MVCC pointer flip) ----
    def _current_state(self) -> DataFrame | None:
        if self._state_rows is not None:
            return self.spark.createDataFrame(self._state_rows, self._STATE_DDL)
        if not os.path.exists(self.pointer):
            return None
        with open(self.pointer) as f:
            v = f.read().strip()
        return self.spark.read.parquet(os.path.join(self.state_root, v))

    def _publish_state(self, df: DataFrame, batch_id: int) -> None:
        v = f"v{batch_id}"
        path = os.path.join(self.state_root, v)
        shutil.rmtree(path, ignore_errors=True)  # idempotent re-run
        df.write.mode("overwrite").parquet(path)
        tmp = self.pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(v)
        os.replace(tmp, self.pointer)

    # ---- the standing query ----
    def _merge_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = self.spark
        delta = (
            batch_df.select("after.event_type", "after.value")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("d_count"),
                F.sum(F.col("value").cast(_STATE_DEC)).cast(_STATE_DEC)
                .alias("d_sum"),
            )
        )
        old = self._current_state()
        if old is None:
            old = spark.createDataFrame([], self._STATE_DDL)
        zero = F.lit(0).cast(_STATE_DEC)
        merged = (
            old.join(delta, "event_type", "full")
            .select(
                "event_type",
                F.coalesce("cnt", F.lit(0)).alias("old_count"),
                F.coalesce("sum_value", zero).alias("old_sum"),
                (F.coalesce("cnt", F.lit(0)) + F.coalesce("d_count", F.lit(0)))
                .alias("new_count"),
                (F.coalesce("sum_value", zero)
                 + F.coalesce("d_sum", zero)).cast(_STATE_DEC).alias("new_sum"),
                F.col("d_count").isNotNull().alias("changed"),
            )
        )
        # one tiny (groups × ~40B) local materialization breaks the
        # read-old/write-new cycle; the heavy lifting stayed in Spark
        rows = merged.collect()
        changes = [r for r in rows if r["changed"]]
        if changes:
            spark.createDataFrame(changes, merged.schema).select(
                "event_type", "old_count", "new_count",
                F.col("old_sum").cast("double").alias("old_sum"),
                F.col("new_sum").cast("double").alias("new_sum"),
                F.lit(batch_id).alias("batch_id"),
            ).write.mode("append").parquet(self.log_dir)
        state_rows = [(r["event_type"], r["new_count"], r["new_sum"]) for r in rows]
        new_state = spark.createDataFrame(state_rows, self._STATE_DDL)
        self._publish_state(new_state, batch_id)
        self._state_rows = state_rows

    def run(self, n_chunks: int = 8) -> None:
        chunks = build_replay_chunks(self.spark, self.sf_dir, n_chunks)
        env = cdc_envelope(read_events_stream(self.spark, chunks))
        ckpt = tempfile.mkdtemp(prefix="dbrcf-cf-ckpt-")
        q = (
            env.writeStream.foreachBatch(self._merge_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .queryName(fresh_sink_name("changefeed"))
            .start()
        )
        q.awaitTermination()

    def state(self) -> DataFrame:
        df = self._current_state()
        assert df is not None, "changefeed produced no state"
        return df.select(
            "event_type",
            "cnt",
            F.col("sum_value").cast("double").alias("sum_value"),
        )

    def log(self) -> DataFrame:
        return self.spark.read.parquet(self.log_dir)
