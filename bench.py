#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (forces every
column/row to compute, no driver collect overhead). The first
recorded run becomes the de-facto BASELINE (BASELINE.md): later
rounds must stay within 2x.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from db_realtime_changefeed_spark.queries import all_queries  # noqa: E402
from db_realtime_changefeed_spark.session import get_spark  # noqa: E402

# Representative spread: scan-bound agg, shuffle joins, broadcast
# join, window, as-of merge, dedup families, vector search, pandas
# UDF path, streaming windows, and the changefeed itself.
HEADLINE = [
    "scan_parquet",
    "agg_groupby",
    "agg_rollup_cube_gsets",
    "distinct_rows",
    "join_inner_equi",
    "join_broadcast",
    "join_asof",
    "win_topk_per_group",
    "win_frame_range",
    "topk_limit",
    "fn_string",
    "llm_dedup_exact",
    "llm_dedup_minhash",
    "llm_similarity_knn",
    "llm_fingerprint",
    "udtf_grouped_map",
    "agg_stats",
    "tpch_q3",
    "tpch_q5",
    "tpch_q10",
    "stream_tumbling",
    "changefeed_core",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


#: median-of-N per query (machine-load tolerance; VERDICT r1 flagged
#: single-shot variance up to ~1.4x). Override for quick iteration.
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def main() -> None:
    import statistics

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_spark("bench")
    queries = all_queries()

    # JVM/codegen warmup on the smallest table so per-query numbers
    # measure the operator, not first-call compilation.
    materialize(queries["join_broadcast"](spark, sf_dir))
    # replay-chunk fixture prep is one-time and cached across runs —
    # build it outside the timed region so the streaming entries
    # measure streaming, not fixture I/O.
    from db_realtime_changefeed_spark.streaming.queries import _CF_CACHE
    from db_realtime_changefeed_spark.streaming.replay import (
        build_replay_chunks,
    )

    build_replay_chunks(spark, sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        samples = []
        for _ in range(REPEATS):
            # memoized changefeed runs must not serve cached state to
            # later repeats — every sample measures a full run
            _CF_CACHE.clear()
            t = time.perf_counter()
            materialize(queries[name](spark, sf_dir))
            samples.append(time.perf_counter() - t)
        timings[name] = round(statistics.median(samples), 3)
    # headline_total = one pass at median per-query speed
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
