#!/usr/bin/env python
"""Physical-plan audit over the whole batch surface: rank queries by
exchange count and scan mentions to spot shuffle outliers and
re-executed subtrees (this tool found funnel_conversion's 3-scan /
8-shuffle form, win_running_distinct's avoidable second exchange,
and graph_pagerank's per-iteration edge-build re-execution in round
5). Streaming/changefeed queries are skipped — their plans live
inside the micro-batch runner. Usage:

    python tools/plan_audit.py [topN] [query ...]

With query names, prints those queries' full formatted plans.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from db_realtime_changefeed_spark.queries import all_queries  # noqa: E402

SKIP = ("stream_", "changefeed_", "sink_", "source_stream", "source_cdc",
        "join_stream")


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    top = int(args[0]) if args and args[0].isdigit() else 25
    names = [a for a in args if not a.isdigit()]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    qs = all_queries()
    if names:
        for n in names:
            print(f"===== {n}")
            print(qs[n](spark, sf)._jdf.queryExecution().explainString(mode))
        spark.stop()
        return 0
    rows = []
    for name, fn in sorted(qs.items()):
        if name.startswith(SKIP):
            continue
        try:
            plan = fn(spark, sf)._jdf.queryExecution().explainString(mode)
            rows.append(
                (plan.count("+- Exchange"), plan.count("Scan parquet"), name)
            )
        except Exception as ex:  # noqa: BLE001
            rows.append((-1, -1, f"{name} ERROR {type(ex).__name__}"))
    rows.sort(reverse=True)
    print(f"{'exchanges':>9} {'scan-mentions':>13}  query")
    for ex, sc, name in rows[:top]:
        print(f"{ex:9d} {sc:13d}  {name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
