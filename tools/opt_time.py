#!/usr/bin/env python
"""Isolated per-query timing at the bench's own protocol (r13
optimization round): same session factory, same noop-sink
materialization, same cache-clearing discipline, median of N.

    python tools/opt_time.py [-nN] query [query ...]

Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS exactly like bench.py,
so a reading here is comparable to the bench's per-query number
without paying for the whole basket.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from db_realtime_changefeed_spark.queries import all_queries  # noqa: E402
from db_realtime_changefeed_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    names = []
    for a in args:
        if a.startswith("-n"):
            reps = int(a[2:])
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-time")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # identical warmup + fixture prep to bench.py
    from db_realtime_changefeed_spark.queries.round7b import (
        _IDX_CACHE as _R7B_IDX,
        _TBV_CACHE as _R7B_TBV,
    )
    from db_realtime_changefeed_spark.queries.round10 import _KC_CACHE
    from db_realtime_changefeed_spark.queries.round12 import (
        _CACHE as _R12_CACHE,
    )
    from db_realtime_changefeed_spark.streaming.queries import _CF_CACHE
    from db_realtime_changefeed_spark.streaming.replay import (
        build_replay_chunks,
    )
    from db_realtime_changefeed_spark.streaming.view_queries import (
        _CACHE as _VIEW_CACHE,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(queries["join_broadcast"](spark, sf_dir))
    noop(queries["scan_parquet"](spark, sf_dir))
    build_replay_chunks(spark, sf_dir)

    for name in names:
        samples = []
        for _ in range(reps):
            for c in (_CF_CACHE, _VIEW_CACHE, _R7B_TBV, _R7B_IDX,
                      _KC_CACHE, _R12_CACHE):
                c.clear()
            spark.sparkContext.setJobDescription(f"opt_time: {name}")
            t = time.perf_counter()
            noop(queries[name](spark, sf_dir))
            samples.append(time.perf_counter() - t)
        med = statistics.median(samples)
        print(f"{name:35s} med={med:7.3f}  "
              f"all={[round(s, 3) for s in samples]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
