"""Generic per-document changefeeds — the fluent API's
`get(k).changes()` / `get_all(...).changes()` on ANY keyed table
(VERDICT r8 item 6: the point-feed surface was events-only even
though the runner machinery underneath is table-agnostic).

Design: every keyed table normalizes to the SAME insert-only CDC
envelope the events path uses ({op, before, after{event_id, ts,
user_id, event_type, value, props}, ts}); the table's primary key
rides in `after.user_id` (the envelope's generic key slot), its
document scalar in `after.value`, and its LWW sequence in
`after.event_id`. UpsertChangefeedRunner's merge/log/state machinery
then runs UNCHANGED — the generic runner only swaps the source
stream and renames the envelope's internal column names back to the
table's own names on the read surface (state()/log()).

Tables without an event time get a SYNTHETIC arrival timestamp
derived deterministically from the key (timestamp_seconds(epoch +
key)): a snapshot table enters the changefeed as one insert-only
epoch, so the LWW order within it is immaterial — what matters is
that a LATER real change (were one to arrive) carries a later ts and
wins, which the synthetic base epoch guarantees by sitting in 2027.

Scale posture is inherited from the upsert runner: the envelope
predicate (`after.user_id IN (...)`) runs BEFORE the keyed merge, so
a point/watchlist feed holds at most |keys| rows of state no matter
the table size; the merge itself is the bucketed MVCC keyed join
(nothing key-cardinality-sized on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import SCHEMAS
from .changefeed import (
    _PAYLOAD_DDL,
    UpsertChangefeedRunner,
    fresh_sink_name,
    guard_not_phase_fed,
    streaming_shuffle,
)

#: table -> (key column, value column, event-time expr or None).
#: Keys must be integer-typed and unique per row (the document id).
#: Tables with a real event time use it; None means the synthetic
#: snapshot-epoch timestamp. `lineitem` is deliberately absent: its
#: key is composite (l_orderkey, l_linenumber) and the document API
#: keeps the loud raise for tables without a single-column key.
DOC_MAP: dict[str, tuple[str, str, str | None]] = {
    "region": ("r_regionkey", "r_regionkey", None),
    "nation": ("n_nationkey", "n_nationkey", None),
    "customer": ("c_custkey", "c_acctbal", None),
    "supplier": ("s_suppkey", "s_acctbal", None),
    "part": ("p_partkey", "p_retailprice", None),
    "orders": ("o_orderkey", "o_totalprice",
               "cast(o_orderdate as timestamp)"),
    "documents": ("doc_id", "n_chars", None),
    "embeddings": ("vec_id", "label", None),
}

#: snapshot-epoch base for synthetic arrival timestamps (2027-01-15;
#: after every fixture event time, so a hypothetical later real
#: change stream would start strictly above it)
_EPOCH = 1_800_000_000


class GenericUpsertChangefeedRunner(UpsertChangefeedRunner):
    """UpsertChangefeedRunner over any DOC_MAP table: same LWW
    merge, MVCC state, delta log, cursors, and push surface; only
    the source normalization and the outward column names differ."""

    def __init__(self, spark: SparkSession, sf_dir: str, table: str,
                 key_values: tuple[int, ...] | None = None):
        if table not in DOC_MAP:
            raise NotImplementedError(
                f"document feeds need a single-column integer key; "
                f"{table!r} is not in the document map "
                f"({sorted(DOC_MAP)})")
        self.table = table
        self.key_col, self.value_col, self._ts_expr = DOC_MAP[table]
        filter_sql = None
        if key_values is not None:
            in_list = ", ".join(str(int(k)) for k in key_values)
            filter_sql = f"after.user_id IN ({in_list})"
        super().__init__(spark, sf_dir, filter_sql=filter_sql)

    def _envelope(self, src: DataFrame) -> DataFrame:
        ts = (
            F.expr(self._ts_expr) if self._ts_expr is not None
            else F.timestamp_seconds(
                F.lit(_EPOCH) + F.col(self.key_col).cast("long"))
        )
        after = F.struct(
            F.col(self.key_col).cast("long").alias("event_id"),
            ts.alias("ts"),
            F.col(self.key_col).cast("long").alias("user_id"),
            F.lit("row").alias("event_type"),
            F.col(self.value_col).cast("double").alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        return src.select(
            F.lit("insert").alias("op"),
            F.lit(None).cast(_PAYLOAD_DDL).alias("before"),
            after.alias("after"),
            after["ts"].alias("ts"),
        )

    def run(self, n_chunks: int | None = None) -> None:
        from .generic_views import _keyed_chunks

        guard_not_phase_fed(self.root)
        chunks = _keyed_chunks(
            self.spark, self.sf_dir, self.table, self.key_col,
            n_chunks)
        src = (
            self.spark.readStream.schema(SCHEMAS[self.table])
            .option("maxFilesPerTrigger", 1).parquet(chunks)
        )
        with streaming_shuffle(self.spark):
            q = (
                self._envelope(src)
                .writeStream.foreachBatch(self._merge_batch)
                .outputMode("update")
                .option("checkpointLocation", self.ckpt)
                .trigger(availableNow=True)
                .queryName(fresh_sink_name(f"docfeed_{self.table}"))
                .start()
            )
            q.awaitTermination()

    # read surface: the table's own column names, not the envelope's
    def state(self) -> DataFrame:
        return super().state().select(
            F.col("user_id").alias(self.key_col),
            "ts",
            F.col("event_id").alias("seq"),
            F.col("value").alias(self.value_col),
        )

    def log(self) -> DataFrame:
        return super().log().select(
            F.col("user_id").alias(self.key_col),
            "old_value", "new_value",
            F.col("old_event_id").alias("old_seq"),
            F.col("new_event_id").alias("new_seq"),
            "batch_id",
        )
