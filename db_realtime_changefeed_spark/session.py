"""SparkSession factory tuned for the graded environment.

Local mode is `local[$SPARK_GRAFT_CPUS]` (default local[*]); the
config choices below are the ones that matter at cluster scale too
(AQE on, skew-join handling, Arrow for any pandas interchange) plus
local-scale tuning (shuffle partitions sized to the data, not the
200 default — SURVEY.md §4 "Shuffle partitioning").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "db-realtime-changefeed-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalescing of shuffle partitions, skew-join
        # splitting, and dynamic join-strategy switching. These are
        # exactly the knobs that keep the same plan viable from
        # sf0.01 locally up to a 1000-executor cluster.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow makes every pandas_udf / toPandas hop batched+columnar.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.ts is parquet timestamp[ns]; Spark's vectorized reader
        # cannot narrow ns→µs directly. Read the raw int64 nanos and
        # let catalog.load_table convert with integer division — the
        # same floor-truncation DuckDB applies (FIXTURES.md trap #1).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # r13 (guide §5 driver overhead): PySpark 4 wraps EVERY
        # DataFrame/Column op with error-context capture — an
        # inspect-stack walk plus ~4 py4j round trips
        # (getActiveSession, conf.get, PySparkCurrentOrigin set /
        # clear) per op, measured ~2-3 ms each → seconds per
        # micro-batch in the plan-heavy IVM runners and a fixed tax
        # on every query's plan construction. The flag only enriches
        # error messages with user call sites; results and plans are
        # identical. Overridable for debugging sessions.
        .config("spark.python.sql.dataFrameDebugging.enabled",
                os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()
