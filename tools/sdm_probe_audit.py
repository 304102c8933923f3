#!/usr/bin/env python
"""Runtime audit of llm_dedup_streaming_minhash's PARTITION-PRUNED
band-index probe (r11 verdict item 1): replays the query's ingestion
loop batch by batch against the hive-partitioned (batch, bkt) index
layout and reads the REAL FileScan metrics off the Spark UI REST API
for every probe, proving per-batch probe input is proportional to
the batch's bucket set — not the accumulated index.

Reports, per micro-batch:
  * the batch's bucket count vs the index's total bucket-partition
    count at probe time
  * parquet files/rows the pruned probe ACTUALLY read vs the files/
    rows sitting in the index
and finishes with a single-document probe (the corpus-scale shape:
one arriving doc vs a large accumulated index), where the pruning is
starkest: <= n_bands buckets out of _sdm_buckets().

Usage: python tools/sdm_probe_audit.py  [writes JSON lines]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def _scan_metrics(base: str, app: str, before: set) -> dict:
    """files/rows read by parquet scans of the executions created
    since `before` (the runtime_audit.py metric-parsing recipe)."""
    new_ids = [e["id"] for e in _get(
        base, f"/applications/{app}/sql?length=1000")
        if e["id"] not in before]
    files = rows = 0
    for i in new_ids:
        e = _get(base, f"/applications/{app}/sql/{i}?details=true")
        for node in e.get("nodes", []):
            if not node["nodeName"].startswith("Scan parquet"):
                continue
            mets = {m["name"]: m["value"]
                    for m in node.get("metrics", [])}
            for key, acc in (("number of files read", "f"),
                             ("number of output rows", "r")):
                raw = mets.get(key, "0").split("\n")[-1]
                tok = raw.split("(")[0].replace(",", "").strip()
                try:
                    v = int(float(tok.split()[0]))
                except (ValueError, IndexError):
                    v = 0
                if acc == "f":
                    files += v
                else:
                    rows += v
    return {"files": files, "rows": rows}


def main() -> int:
    from db_realtime_changefeed_spark.queries.round11 import (
        _sdm_buckets,
        _sdm_bands,
        _sdm_bucket,
    )
    from db_realtime_changefeed_spark.streaming.replay import (
        default_chunks,
    )
    from db_realtime_changefeed_spark.catalog import load_table
    from db_realtime_changefeed_spark.tmputil import scratch_dir

    sf = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    base = ui.rstrip("/") + "/api/v1"
    app = spark.sparkContext.applicationId

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    nb = default_chunks()
    n = docs.count()
    per = -(-n // nb)
    idx_root = os.path.join(scratch_dir(prefix="dbrcf-sdmaudit-"),
                            "bands")

    def probe_and_absorb(batch_df, batch_id, label):
        bands = (_sdm_bands(batch_df)
                 .withColumn("bkt", _sdm_bucket(F.col("band_hash")))
                 .persist())
        bkts = sorted(r["bkt"] for r in
                      bands.select("bkt").distinct().collect())
        out = {"batch": label, "batch_buckets": len(bkts),
               "total_buckets": _sdm_buckets()}
        if glob.glob(os.path.join(idx_root, "batch=*")):
            idx_files = len(glob.glob(os.path.join(
                idx_root, "batch=*", "bkt=*", "*.parquet")))
            before = {e["id"] for e in _get(
                base, f"/applications/{app}/sql?length=1000")}
            pruned_rows = (
                spark.read.parquet(idx_root)
                .where(F.col("bkt").isin(bkts)).count())
            m = _scan_metrics(base, app, before)
            before = {e["id"] for e in _get(
                base, f"/applications/{app}/sql?length=1000")}
            index_rows = spark.read.parquet(idx_root).count()
            mf = _scan_metrics(base, app, before)
            out.update({
                "index_rows": index_rows,
                "index_files": idx_files,
                "probe_rows_read": m["rows"],
                "probe_files_read": m["files"],
                "full_scan_files_read": mf["files"],
                "probe_row_fraction": round(
                    m["rows"] / max(index_rows, 1), 4),
                "probe_file_fraction": round(
                    m["files"] / max(idx_files, 1), 4),
            })
        if batch_id is not None:
            (bands.withColumn("batch",
                              F.lit(int(batch_id)).cast("int"))
             .repartition("bkt")
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("batch", "bkt")
             .parquet(idx_root))
        bands.unpersist()
        print(json.dumps(out))

    ordered = docs.orderBy("doc_id")
    ids = [r.doc_id for r in ordered.select("doc_id").collect()]
    for b in range(nb):
        chunk_ids = ids[b * per:(b + 1) * per]
        if not chunk_ids:
            continue
        batch = docs.where(F.col("doc_id").isin(chunk_ids))
        probe_and_absorb(batch, b, f"batch-{b}")
    # the corpus-scale shape: ONE arriving doc probed against the
    # whole accumulated index — pruned to <= n_bands buckets
    one = docs.orderBy("doc_id").limit(1).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    probe_and_absorb(one, None, "single-doc-probe")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
