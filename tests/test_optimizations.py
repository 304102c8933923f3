"""Round-13 optimization helpers (queries/_util.fan_out,
pin_group_parallelism, tmputil.scratch_base): the split-estimate
gate, the deterministic hash fan-out, and the scratch placement
override. These guard the OPTIMIZATION_r13 changes' mechanics — the
result-identity of every touched query is certified separately by
the oracle sweeps."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table
from db_realtime_changefeed_spark.queries._util import (
    _scan_under_split,
    fan_out,
    pin_group_parallelism,
)

SF = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")


def test_under_split_detects_single_file_scan(spark):
    li = load_table(spark, SF, "lineitem")
    # one single-row-group file is always fewer splits than 8 cores
    assert _scan_under_split(li, 8)
    # and trivially enough splits for a 1-core target
    assert not _scan_under_split(li, 1)


def test_fan_out_noops_when_well_split(spark):
    li = load_table(spark, SF, "lineitem")
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # force the estimator to see many splits: 64 KiB max split
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        out = fan_out(li, "l_orderkey")
        assert out is li, "well-split input must pass through unchanged"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_fan_out_spreads_and_preserves_rows(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity")
    out = fan_out(li, "l_orderkey", "l_linenumber")
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    # deterministic hash partitioning: same content, twice
    a = sorted(r["l_orderkey"] * 10 + r["l_linenumber"]
               for r in out.collect())
    b = sorted(r["l_orderkey"] * 10 + r["l_linenumber"]
               for r in fan_out(li, "l_orderkey", "l_linenumber")
               .collect())
    assert a == b
    assert len(a) == li.count()
    # the spread is even-ish: no partition owns more than 3x its share
    sizes = (out.select(F.spark_partition_id().alias("p"))
             .groupBy("p").count().collect())
    mx = max(r["count"] for r in sizes)
    assert mx <= 3 * len(a) / target


def test_pin_group_parallelism_sets_count_and_key(spark):
    ev = load_table(spark, SF, "events").select("user_id", "value")
    out = pin_group_parallelism(ev, "user_id")
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    # keyed partitioning: a given user_id lands in exactly one partition
    parts = (out.select("user_id",
                        F.spark_partition_id().alias("p"))
             .groupBy("user_id")
             .agg(F.countDistinct("p").alias("np")))
    assert parts.agg(F.max("np")).first()[0] == 1


def test_scratch_base_env_override(tmp_path, monkeypatch):
    import importlib

    import db_realtime_changefeed_spark.tmputil as tmputil

    monkeypatch.setenv("SPARK_GRAFT_TMP", str(tmp_path / "s"))
    importlib.reload(tmputil)
    try:
        base = tmputil.scratch_base()
        assert base == str(tmp_path / "s")
        d = tmputil.scratch_dir("t-")
        assert d.startswith(base) and os.path.isdir(d)
    finally:
        monkeypatch.delenv("SPARK_GRAFT_TMP")
        importlib.reload(tmputil)


def test_scratch_base_default_is_writable():
    from db_realtime_changefeed_spark.tmputil import scratch_dir

    d = scratch_dir("t2-")
    assert os.path.isdir(d)
    with open(os.path.join(d, "probe"), "w") as f:
        f.write("ok")



# ---- r13: incremental O(k) top-k / cohort refresh decisions ----
# (views.MaintainedViewsRunner._inc_topk / _inc_sample). The
# trajectory identity of the logs themselves is certified by the
# oracle sweeps (changefeed_topk_view / _topk_offsets /
# _sample_cohort); these pin the DECISION rule — in particular that
# the runner-up ambiguity falls back rather than guessing.


class _IncViews:
    """Bare carrier for the decision methods (no Spark needed)."""

    k = 3
    _inc_topk = __import__(
        "db_realtime_changefeed_spark.streaming.views",
        fromlist=["MaintainedViewsRunner"],
    ).MaintainedViewsRunner._inc_topk
    _inc_sample = __import__(
        "db_realtime_changefeed_spark.streaming.views",
        fromlist=["MaintainedViewsRunner"],
    ).MaintainedViewsRunner._inc_sample


def _extras(tk_adds=(), sm_adds=(), touched=()):
    return {
        "tk_adds": [{"u": u, "v": v, "e": e} for u, v, e in tk_adds],
        "sm_adds": [{"h": h, "u": u} for h, u in sm_adds],
        "pv_touch": set(touched),
    }


def test_inc_topk_untouched_prev_passes_through():
    r = _IncViews()
    prev = [(1, 30.0, 10), (2, 20.0, 11), (3, 10.0, 12)]
    assert r._inc_topk(prev, _extras()) == prev


def test_inc_topk_addition_above_threshold_enters():
    r = _IncViews()
    prev = [(1, 30.0, 10), (2, 20.0, 11), (3, 10.0, 12)]
    got = r._inc_topk(prev, _extras(tk_adds=[(9, 25.0, 13)]))
    assert got == [(1, 30.0, 10), (9, 25.0, 13), (2, 20.0, 11)]


def test_inc_topk_member_update_keeps_membership():
    r = _IncViews()
    prev = [(1, 30.0, 10), (2, 20.0, 11), (3, 10.0, 12)]
    got = r._inc_topk(
        prev, _extras(tk_adds=[(2, 40.0, 13)], touched=[2]))
    assert got == [(2, 40.0, 13), (1, 30.0, 10), (3, 10.0, 12)]


def test_inc_topk_member_delete_without_replacement_falls_back():
    r = _IncViews()
    prev = [(1, 30.0, 10), (2, 20.0, 11), (3, 10.0, 12)]
    # member 3 deleted, no addition at/above the old threshold:
    # the runner-up is invisible to the candidate set -> None
    assert r._inc_topk(prev, _extras(touched=[3])) is None


def test_inc_topk_kth_below_old_threshold_falls_back():
    r = _IncViews()
    prev = [(1, 30.0, 10), (2, 20.0, 11), (3, 10.0, 12)]
    # member 3's row demoted below the old k-th: a hidden runner-up
    # between 5.0 and 10.0 could outrank the new k-th -> None
    got = r._inc_topk(
        prev, _extras(tk_adds=[(3, 5.0, 13)], touched=[3]))
    assert got is None


def test_inc_topk_short_prev_is_complete_state():
    r = _IncViews()
    # previous membership < k == the whole visible state: no hidden
    # rows exist, so any churn decides incrementally — here member 1
    # is deleted (touched, no new row) while user 2 arrives
    prev = [(1, 30.0, 10)]
    got = r._inc_topk(
        prev, _extras(tk_adds=[(2, 5.0, 13)], touched=[1]))
    assert got == [(2, 5.0, 13)]
    # and an untouched short membership simply gains the arrival
    got = r._inc_topk(prev, _extras(tk_adds=[(2, 5.0, 13)]))
    assert got == [(1, 30.0, 10), (2, 5.0, 13)]


def test_inc_sample_rules_mirror_topk():
    r = _IncViews()
    prev = [("0a", 1), ("0b", 2), ("0c", 3)]
    # untouched passes through
    assert r._inc_sample(prev, _extras()) == prev
    # smaller-hash arrival enters, old k-th leaves
    got = r._inc_sample(prev, _extras(sm_adds=[("00", 9)]))
    assert got == [("00", 9), ("0a", 1), ("0b", 2)]
    # member deletion without replacement -> fallback
    assert r._inc_sample(prev, _extras(touched=[2])) is None
