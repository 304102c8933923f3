"""Event-time (watermark-driven) squash — VERDICT r6 item 5.

changefeed_squash coalesces per-key deltas over BATCH-COUNT windows;
real changefeed engines (RethinkDB's `squash: N` seconds) coalesce
over EVENT-TIME windows and release a window's single squashed change
when the watermark passes its high bound. This module implements that
contract as a custom stateful streaming operator
(applyInPandasWithState + EventTimeTimeout) over the replayed event
stream, hash-graded against a pure-SQL reconstruction.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..queries import query
from .queries import _replayed, _to_table

#: squash window: 1 day in microseconds, aligned to epoch midnights —
#: integer arithmetic on unix micros keeps both engines bit-identical
#: (no timezone/date-truncation semantics anywhere near the hash)
_W_US = 86_400_000_000
#: watermark delay — the allowed out-of-orderness; the final
#: watermark is max(ts) − this, which decides the still-pending tail
_DELAY = "1 hour"
_DELAY_US = 3_600_000_000


@query(
    "changefeed_squash_time",
    oracle=f"""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    sel AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / {_W_US}) AS BIGINT) AS win,
             value, event_id,
             row_number() OVER (
               PARTITION BY user_id, floor(epoch_us(ts) / {_W_US})
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events),
    lastw AS (
      SELECT user_id, win, value AS new_value,
             event_id AS new_event_id
      FROM sel WHERE rn = 1),
    seq AS (
      SELECT user_id, win, new_value, new_event_id,
             lag(new_value) OVER (PARTITION BY user_id
                                  ORDER BY win) AS old_value
      FROM lastw)
    SELECT user_id, win, old_value, new_value, new_event_id
    FROM seq, mx
    WHERE (win + 1) * {_W_US} <= epoch_us(m) - {_DELAY_US}
      AND new_value IS DISTINCT FROM old_value
    """,
)
def changefeed_squash_time(spark, sf_dir):
    """EVENT-TIME SQUASH (RethinkDB `changes(squash: N seconds)`):
    per-key changes inside each 1-day event-time window coalesce to
    ONE squashed delta — old_value = the key's value as of the
    window's start (the previous window's last value), new_value =
    the last value in the window by (ts, event_id) — and the window
    RELEASES when the event-time watermark passes its high bound.
    Net no-ops (old == new) are dropped, per the squash contract.

    Implementation is a custom stateful operator
    (applyInPandasWithState + EventTimeTimeout): state per key holds
    the carried last-released value plus the pending windows'
    last-change candidates; every invocation releases pending
    windows whose high bound is at or below the current watermark,
    and the timeout (set to the earliest pending high bound) flushes
    idle keys — including the closing no-data micro-batch that
    AvailableNow runs with the fully-advanced watermark (max ts −
    1 h), the same empirically-pinned mechanism
    stream_session_timeout relies on. Windows whose high bound never
    passes the final watermark stay pending (the oracle models
    exactly that trailing set).

    Hash-graded: replay arrival is ts-ordered, so no row is ever
    late and the released set is chunking-invariant — it depends
    only on the final watermark and per-window content.

    Scale: state is O(pending windows) per key (bounded by the
    delay/window ratio, here ≤ 2); the watermark evicts — nothing
    accumulates. The graded feed runs the SALTED twin of the
    operator (r13, guide §2.3 "shuffle keys and metadata"): the
    stateful key is pmod(xxhash64(user_id), S) and each group's
    state blob holds its users' sub-states, because
    applyInPandasWithState pays a per-GROUP serializer/state
    round-trip cost (~ms) that dwarfs the per-row work at high key
    cardinality — S ~ 4x cores keeps every task busy while cutting
    group count (and that per-group overhead) by orders of
    magnitude. Released rows are identical by construction (release
    decisions are per-user and depend only on the watermark;
    equivalence pinned by tests/test_streaming.py); the per-user
    keyed form of the SAME operator remains _squash_pipeline, which
    scan_state_store_squash grades including its state layout."""
    result = _squash_pipeline_salted(spark, sf_dir)
    name = _to_table(result, "squashtime", "append")
    return spark.table(name).select(
        "user_id", "win", "old_value", "new_value", "new_event_id")


def _squash_pipeline(spark, sf_dir):
    """The unexecuted squash stream — shared by the graded squash
    feed and the state-introspection query (which needs to own the
    checkpoint location)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def squash(key, pdf_iter, state):
        import json

        import pandas as pd

        cols = ["user_id", "win", "old_value", "new_value",
                "new_event_id"]
        if state.exists:
            has_prev, prev_value, pending_json = state.get
            pending = {int(k): v
                       for k, v in json.loads(pending_json).items()}
        else:
            has_prev, prev_value, pending = False, 0.0, {}
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us = pdf["ts"].astype("int64") // 1000
                for t, eid, val in zip(ts_us, pdf["event_id"],
                                       pdf["value"]):
                    w = int(t // _W_US)
                    cur = pending.get(w)
                    if cur is None or (t, eid) > (cur[0], cur[1]):
                        pending[w] = [int(t), int(eid), float(val)]
        wm_ms = state.getCurrentWatermarkMs()
        out = []
        for w in sorted(pending):
            if (w + 1) * _W_US <= wm_ms * 1000:
                _, eid, val = pending.pop(w)
                if not has_prev or val != prev_value:
                    out.append((key[0], w,
                                prev_value if has_prev else None,
                                val, eid))
                has_prev, prev_value = True, float(val)
        state.update((has_prev, prev_value, json.dumps(pending)))
        if pending:
            # timeout must sit strictly above the current watermark;
            # every remaining window's high bound does by the release
            # loop above (max() is belt-and-braces for ms rounding)
            t_ms = min((w + 1) * _W_US for w in pending) // 1000
            state.setTimeoutTimestamp(max(t_ms, wm_ms + 1))
        if out:
            yield pd.DataFrame(out, columns=cols)

    stream = _replayed(spark, sf_dir).select(
        "ts", "user_id", "event_id", "value")
    return (
        stream.withWatermark("ts", _DELAY)
        .groupBy("user_id")
        .applyInPandasWithState(
            squash,
            "user_id long, win long, old_value double, "
            "new_value double, new_event_id long",
            "has_prev boolean, prev_value double, pending string",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def _salt_count(spark) -> int:
    """Stateful-key salt width for the squash feed: enough groups to
    fill every core several times over, few enough that per-group
    overhead vanishes. At 100 TB the same knob scales with the
    cluster (defaultParallelism) or is pinned via env."""
    env = os.environ.get("SPARK_GRAFT_SQUASH_SALT")
    if env:
        return int(env)
    return 4 * spark.sparkContext.defaultParallelism


def _squash_pipeline_salted(spark, sf_dir):
    """The squash operator with a SALTED stateful key (r13): state is
    keyed on pmod(xxhash64(user_id), S) and the per-user sub-states
    (carried last-released value + pending windows) live inside the
    group's JSON blob. Per-user release logic is identical to
    _squash_pipeline — the released set depends only on the
    watermark and per-window content, never on how users shard
    across state keys — but the per-micro-batch group count drops
    from |users| to S, and with it the per-group Arrow/state
    serializer overhead that dominates applyInPandasWithState at
    high key cardinality."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def squash(key, pdf_iter, state):
        import json

        import pandas as pd

        cols = ["user_id", "win", "old_value", "new_value",
                "new_event_id"]
        blob = json.loads(state.get[0]) if state.exists else {}
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us = pdf["ts"].astype("int64") // 1000
                for u, t, eid, val in zip(pdf["user_id"], ts_us,
                                          pdf["event_id"],
                                          pdf["value"]):
                    ent = blob.get(str(u))
                    if ent is None:
                        ent = [False, 0.0, {}]
                        blob[str(u)] = ent
                    w = str(int(t) // _W_US)
                    cur = ent[2].get(w)
                    if cur is None or (t, eid) > (cur[0], cur[1]):
                        ent[2][w] = [int(t), int(eid), float(val)]
        wm_us = state.getCurrentWatermarkMs() * 1000
        out = []
        min_bound_us = None
        for u, ent in blob.items():
            pending = ent[2]
            if not pending:
                continue
            has_prev, prev_value = ent[0], ent[1]
            for w in sorted(int(k) for k in pending):
                if (w + 1) * _W_US <= wm_us:
                    _, eid, val = pending.pop(str(w))
                    if not has_prev or val != prev_value:
                        out.append((int(u), w,
                                    prev_value if has_prev else None,
                                    val, eid))
                    has_prev, prev_value = True, float(val)
                else:
                    min_bound_us = (
                        (w + 1) * _W_US if min_bound_us is None
                        else min(min_bound_us, (w + 1) * _W_US))
                    break
            ent[0], ent[1] = has_prev, prev_value
        state.update((json.dumps(blob),))
        if min_bound_us is not None:
            state.setTimeoutTimestamp(
                max(min_bound_us // 1000, wm_us // 1000 + 1))
        if out:
            yield pd.DataFrame(out, columns=cols)

    stream = (
        _replayed(spark, sf_dir)
        .select("ts", "user_id", "event_id", "value")
        .withColumn(
            "skey",
            F.pmod(F.xxhash64("user_id"),
                   F.lit(_salt_count(spark))))
    )
    return (
        stream.withWatermark("ts", _DELAY)
        .groupBy("skey")
        .applyInPandasWithState(
            squash,
            "user_id long, win long, old_value double, "
            "new_value double, new_event_id long",
            "payload string",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


@query(
    "scan_state_store_squash",
    oracle=f"""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    sel AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / {_W_US}) AS BIGINT) AS win,
             value, event_id,
             row_number() OVER (
               PARTITION BY user_id, floor(epoch_us(ts) / {_W_US})
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events),
    lastw AS (
      SELECT user_id, win, value AS new_value
      FROM sel WHERE rn = 1),
    tagged AS (
      SELECT l.*, ((win + 1) * {_W_US}
                   <= epoch_us(mx.m) - {_DELAY_US}) AS released
      FROM lastw l, mx),
    prevv AS (
      SELECT user_id, new_value AS prev_value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY win DESC) AS rr
      FROM tagged WHERE released),
    pend AS (
      SELECT user_id, count(*) AS n_pending,
             min(win) AS min_pending_win
      FROM tagged WHERE NOT released GROUP BY user_id)
    SELECT u.user_id,
           (p.user_id IS NOT NULL) AS has_prev,
           coalesce(p.prev_value, 0.0) AS prev_value,
           CAST(coalesce(d.n_pending, 0) AS BIGINT) AS n_pending,
           d.min_pending_win
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN (SELECT user_id, prev_value FROM prevv WHERE rr = 1) p
      USING (user_id)
    LEFT JOIN pend d USING (user_id)
    """,
)
def scan_state_store_squash(spark, sf_dir):
    """STATE INTROSPECTION of a CUSTOM stateful operator: the squash
    operator's per-key state (carried last-released value + pending
    windows) read back from the checkpoint with Spark 4's
    `statestore` batch source — scan_state_store proved the door
    opens on a built-in windowed aggregate; this proves it on
    applyInPandasWithState's USER-DEFINED state struct
    (value.groupState.(has_prev, prev_value, pending)), which is
    what an operator of the changefeed engine actually debugs
    ("which keys still hold unreleased windows, and at what
    horizon?"). Hash-graded against the deterministic reconstruction
    of the final state: per key, prev_value is the last released
    window's value, and the pending set is exactly the windows whose
    high bound never passed the final watermark. The pending JSON is
    parsed with json_object_keys only — the engine-side encoding
    stays an implementation detail; its KEY SET is the contract.
    Scale: the reader exposes partition_id, so a production audit
    prunes to one store partition."""
    from .replay import fresh_sink_name, run_available_now

    result = _squash_pipeline(spark, sf_dir)
    ckpt = run_available_now(result, fresh_sink_name("squashstate"),
                             "append")
    st = spark.read.format("statestore").load(ckpt)
    gs = "value.groupState"
    pend_keys = F.json_object_keys(F.col(f"{gs}.pending"))
    return st.select(
        F.col("key.user_id").alias("user_id"),
        F.col(f"{gs}.has_prev").alias("has_prev"),
        F.col(f"{gs}.prev_value").alias("prev_value"),
        F.size(pend_keys).cast("long").alias("n_pending"),
        F.array_min(F.transform(pend_keys,
                                lambda k: k.cast("long")))
        .alias("min_pending_win"),
    )
