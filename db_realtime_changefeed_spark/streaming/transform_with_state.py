"""transformWithStateInPandas (Spark 4's arbitrary-stateful API v2)
— gated on the `protobuf` package, which the Python worker needs for
its state-server protocol (pyspark/sql/streaming/proto). This
container ships without protobuf, so the operator follows the same
honest-stub contract as the multimodal codec (operators/
multimodal.py): the REAL implementation activates wherever protobuf
is importable; here construction raises loudly instead of
pretending. The API shape, processor, and query wiring below are
complete and exercised by tests/test_streaming.py's gated test.

Why this API matters at 100 TB: unlike applyInPandasWithState's
single flatMapGroups surface, transformWithState gives named state
variables (value/list/map), timers, TTL, and schema evolution of
state — the building blocks of long-running keyed services (the
changefeed runners would target it for per-key rollup state once
protobuf ships in the runtime image).
"""

from __future__ import annotations

try:  # the driver worker imports google.protobuf at query start
    import google.protobuf  # noqa: F401

    HAVE_PROTOBUF = True
except Exception:  # pragma: no cover - environment-dependent
    HAVE_PROTOBUF = False

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)

_OUT_SCHEMA = "user_id long, total double, n long"
_STATE_SCHEMA = "total double, n long"


def build_running_totals(stream_df):
    """Per-user running (sum, count) over an event stream via
    transformWithStateInPandas in Update mode.

    Returns the transformed streaming DataFrame. Raises
    ImportError in environments without protobuf (this container)
    — callers must gate on HAVE_PROTOBUF.
    """
    if not HAVE_PROTOBUF:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "for the PySpark state-server protocol; not available in "
            "this environment (see module docstring)"
        )
    import pandas as pd
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            total, n = 0.0, 0
            if self._state.exists():
                total, n = self._state.get()
            for pdf in rows:
                total += float(pdf["value"].sum())
                n += len(pdf)
            self._state.update((total, n))
            yield pd.DataFrame(
                {"user_id": [key[0]], "total": [total], "n": [n]}
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
