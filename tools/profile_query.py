#!/usr/bin/env python
"""Profile one declared query: run it through the noop sink under a
bench-identical session with the Spark event log enabled, then report
wall time, job count, per-job durations, and the driver-side gaps
between jobs (time no job was running = scheduling / py4j / fs
overhead).  Usage:

    python tools/profile_query.py <query> [reps] [--jobs N]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS.  Pure measurement tooling (guide §1) — never on any
query path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_realtime_changefeed_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    show_jobs = 12
    if "--jobs" in sys.argv:
        show_jobs = int(sys.argv[sys.argv.index("--jobs") + 1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = "/tmp/dbrcf-eventlog"
    os.makedirs(evdir, exist_ok=True)
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(f"profile-{name}")
        .master(f"local[{cpus}]")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{evdir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    # ride the rest of the bench session config
    import db_realtime_changefeed_spark.session as sess

    orig = SparkSession.builder
    SparkSession.builder = builder
    try:
        spark = sess.get_spark(f"profile-{name}")
    finally:
        SparkSession.builder = orig

    from db_realtime_changefeed_spark.queries import all_queries

    queries = all_queries()

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # bench-identical warmup
    materialize(queries["join_broadcast"](spark, sf_dir))
    materialize(queries["scan_parquet"](spark, sf_dir))
    from db_realtime_changefeed_spark.streaming.replay import (
        build_replay_chunks,
        fresh_sink_name,
        read_events_stream,
        run_available_now,
    )

    chunks_dir = build_replay_chunks(spark, sf_dir)
    warm = read_events_stream(spark, chunks_dir).groupBy("event_type").count()
    run_available_now(warm, fresh_sink_name("profwarm"), "complete")

    from db_realtime_changefeed_spark.streaming.queries import _CF_CACHE
    from db_realtime_changefeed_spark.streaming.view_queries import (
        _CACHE as _VIEW_CACHE,
    )
    from db_realtime_changefeed_spark.queries.round7b import (
        _IDX_CACHE, _TBV_CACHE,
    )
    from db_realtime_changefeed_spark.queries.round10 import _KC_CACHE
    from db_realtime_changefeed_spark.queries.round12 import (
        _CACHE as _R12_CACHE,
    )

    app_id = spark.sparkContext.applicationId
    times = []
    for i in range(reps):
        for c in (_CF_CACHE, _VIEW_CACHE, _TBV_CACHE, _IDX_CACHE,
                  _KC_CACHE, _R12_CACHE):
            c.clear()
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0_wall = time.time()
        t0 = time.perf_counter()
        materialize(queries[name](spark, sf_dir))
        dt = time.perf_counter() - t0
        times.append((dt, t0_wall, time.time()))
        print(f"rep{i}: {dt:.3f}s")
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # parse event log for the LAST rep's window
    import glob as _glob

    cands = (
        [os.path.join(evdir, app_id)]
        + _glob.glob(os.path.join(evdir, f"*{app_id}*", "events_*"))
        + _glob.glob(os.path.join(evdir, f"*{app_id}*"))
    )
    evfiles = [p for p in cands if os.path.isfile(p)]
    jobs: dict[int, dict] = {}
    for evfile in evfiles:
        with open(evfile) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    jobs[ev["Job ID"]] = {
                        "start": ev["Submission Time"] / 1000.0,
                        "desc": ev.get("Properties", {}).get(
                            "spark.job.description", ""),
                        "stages": len(ev.get("Stage IDs", [])),
                    }
                elif ev.get("Event") == "SparkListenerJobEnd":
                    if ev["Job ID"] in jobs:
                        jobs[ev["Job ID"]]["end"] = (
                            ev["Completion Time"] / 1000.0)

    for rep, (dt, w0, w1) in enumerate(times):
        sel = sorted(
            (j for j in jobs.values()
             if "end" in j and j["start"] >= w0 - 0.05
             and j["end"] <= w1 + 0.05),
            key=lambda j: j["start"])
        busy = sum(j["end"] - j["start"] for j in sel)
        # driver gap: wall time minus union of job intervals
        union = 0.0
        cur_s = cur_e = None
        for j in sel:
            if cur_s is None:
                cur_s, cur_e = j["start"], j["end"]
            elif j["start"] <= cur_e:
                cur_e = max(cur_e, j["end"])
            else:
                union += cur_e - cur_s
                cur_s, cur_e = j["start"], j["end"]
        if cur_s is not None:
            union += cur_e - cur_s
        print(f"\n== rep{rep}: wall {dt:.3f}s, {len(sel)} jobs, "
              f"sum(job) {busy:.3f}s, union(job) {union:.3f}s, "
              f"no-job gap {dt - union:.3f}s")
        top = sorted(sel, key=lambda j: j["start"] - j["end"])[:show_jobs]
        for j in top:
            print(f"   {j['end']-j['start']:7.3f}s  stages={j['stages']}"
                  f"  {j['desc'][:90]}")


if __name__ == "__main__":
    main()
