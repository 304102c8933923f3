#!/usr/bin/env python
"""RUNTIME plan audit (VERDICT r8 item 3): plan_audit.py counts
Exchange/Scan nodes in the STATIC formatted plan, which over-counts
whenever a persisted subtree is re-referenced — EXPLAIN re-prints the
subtree under every consumer even though execution serves it from the
block store. This tool drives a query for real and reads the SQL
execution metrics off the Spark UI REST API, reporting what actually
ran:

  * executed Exchange nodes, split into those that actually moved
    shuffle rows vs. reused/zero-row ones
  * parquet Scan nodes and the REAL number of files/rows read
  * InMemoryTableScan nodes (cache consumers) and cached-RDD storage
    (fraction cached) — the direct evidence that a persisted subtree
    was materialized once and served from cache thereafter

Usage: python tools/runtime_audit.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from db_realtime_changefeed_spark.queries import all_queries  # noqa: E402


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # derive the REST base from the LIVE session, never a hardcoded
    # port: Spark falls back to port+1 when the configured port is
    # busy (spark.port.maxRetries), in which case a fixed URL would
    # read a DIFFERENT application's metrics (ADVICE r9); and match
    # our own application id rather than trusting list position.
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        print("Spark UI is disabled; cannot read runtime metrics",
              file=sys.stderr)
        return 1
    base = ui.rstrip("/") + "/api/v1"
    our_id = spark.sparkContext.applicationId
    apps = {a["id"] for a in _get(base, "/applications")}
    if our_id not in apps:
        print(f"application {our_id} not served at {base} "
              f"(found {sorted(apps)})", file=sys.stderr)
        return 1
    app = our_id
    qs = all_queries()
    for name in names:
        before = {e["id"] for e in _get(
            base, f"/applications/{app}/sql?length=1000")}
        qs[name](spark, sf).write.format("noop").mode(
            "overwrite").save()
        # the list endpoint returns nodes WITHOUT metrics — fetch
        # each new execution's detail individually
        new_ids = [e["id"] for e in _get(
            base, f"/applications/{app}/sql?length=1000")
            if e["id"] not in before]
        execs = [_get(base, f"/applications/{app}/sql/{i}"
                            "?details=true") for i in new_ids]
        n_ex = n_ex_live = n_scan = n_imts = 0
        scan_rows = scan_files = shuffle_rows = 0
        for e in execs:
            for node in e.get("nodes", []):
                nm = node["nodeName"]
                mets = {m["name"]: m["value"]
                        for m in node.get("metrics", [])}

                def _num(key):
                    # values look like '30,580' or
                    # 'total (min, med, max ...)\n2.0 s (...)'
                    raw = mets.get(key, "0").split("\n")[-1]
                    tok = raw.split("(")[0].replace(",", "").strip()
                    try:
                        return int(float(tok.split()[0]))
                    except (ValueError, IndexError):
                        return 0

                if "Exchange" in nm and "Reused" not in nm:
                    n_ex += 1
                    moved = _num("shuffle records written")
                    shuffle_rows += moved
                    if moved:
                        n_ex_live += 1
                elif nm.startswith("Scan parquet"):
                    n_scan += 1
                    scan_rows += _num("number of output rows")
                    scan_files += _num("number of files read")
                elif "InMemoryTableScan" in nm \
                        or "TableCacheQueryStage" in nm:
                    n_imts += 1
        storage = _get(base, f"/applications/{app}/storage/rdd")
        cached = [
            (r["name"][:60], r["numCachedPartitions"],
             r["numPartitions"])
            for r in storage
        ]
        print(json.dumps({
            "query": name,
            "sql_executions": len(execs),
            "exchanges_executed": n_ex,
            "exchanges_with_rows": n_ex_live,
            "shuffle_rows_total": shuffle_rows,
            "parquet_scans_executed": n_scan,
            "parquet_rows_read": scan_rows,
            "parquet_files_read": scan_files,
            "cache_scan_nodes": n_imts,
            "cached_rdds": cached,
        }, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
