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

