"""Retention / expired-cursor contract (streaming/retention_queries)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.queries import QUERIES, load_all
from db_realtime_changefeed_spark.streaming.retention_queries import (
    _H,
    ExpiredCursorError,
    _gc_runner,
    oldest_retained_batch,
    resume,
)

load_all()


def test_expired_cursor_raw_resume_fails_loudly(spark, sf_smoke):
    """A resume token below the retention horizon without snapshot
    recovery must raise — silently skipping GC'd batches would be
    data loss presented as success."""
    QUERIES["changefeed_resume_expired_cursor"](spark, sf_smoke)
    r = _gc_runner(spark, sf_smoke)
    assert oldest_retained_batch(r) == _H
    with pytest.raises(ExpiredCursorError):
        resume(r, token=0, allow_snapshot=False)


def test_covered_token_resumes_pure_delta(spark, sf_smoke):
    """A token at or above the horizon is still covered: the consumer
    gets exactly the retained deltas from its token on, and NO
    snapshot leg."""
    QUERIES["changefeed_resume_expired_cursor"](spark, sf_smoke)
    r = _gc_runner(spark, sf_smoke)
    got = resume(r, token=_H, allow_snapshot=False)
    assert got.where(F.col("kind") == "snapshot").count() == 0
    assert got.select(F.min("batch_id")).collect()[0][0] == _H


def test_retention_gc_removed_log_and_unpinned_state(spark, sf_smoke):
    """GC must actually delete: no log segment below the horizon
    survives, and the only retained state versions are the pinned
    snapshot (horizon-1) and newer."""
    QUERIES["changefeed_resume_expired_cursor"](spark, sf_smoke)
    r = _gc_runner(spark, sf_smoke)
    assert oldest_retained_batch(r) == _H
    assert min(r.versions()) == _H - 1
    # time travel below the pinned snapshot fails loudly too
    with pytest.raises(KeyError):
        r.state_at(_H - 2)


def test_snapshot_plus_tail_reconstructs_final_state(spark, sf_smoke):
    """Folding the delivered snapshot forward with the delivered
    deltas must land exactly on the feed's final materialized state
    — the recovery path loses nothing."""
    got = QUERIES["changefeed_resume_expired_cursor"](spark, sf_smoke)
    r = _gc_runner(spark, sf_smoke)
    # last delivered new_count/new_sum per key (delta leg if present,
    # else the snapshot) == final state
    last = (
        got.groupBy("event_type")
        .agg(F.max(F.struct("batch_id", "new_count", "new_sum"))
             .alias("m"))
        .select("event_type",
                F.col("m.new_count").alias("cnt"),
                F.col("m.new_sum").alias("sum_value"))
    )
    final = r.state()
    assert last.exceptAll(final).count() == 0
    assert final.exceptAll(last).count() == 0


def test_pins_hold_back_the_horizon(spark, sf_smoke):
    """Protected timestamps: an active subscriber pinned at batch 1
    must hold GC back to 1 even when the policy asks for a later
    horizon — the pinned consumer stays servable by pure delta
    replay."""
    from db_realtime_changefeed_spark.streaming.changefeed import (
        ChangefeedRunner,
    )
    from db_realtime_changefeed_spark.streaming.retention_queries import (
        retention_gc,
    )

    r = ChangefeedRunner(spark, sf_smoke)
    r.run()
    retention_gc(r, horizon=_H + 1, pins=[1, _H])
    assert oldest_retained_batch(r) == 1
    got = resume(r, token=1, allow_snapshot=False)
    assert got.select(F.min("batch_id")).collect()[0][0] == 1
