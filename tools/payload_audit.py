#!/usr/bin/env python
"""Runtime audit: after-image PROJECTION PRUNING (r12 verdict item
2). A feed whose filter reads payload columns ships a Debezium-style
`after` JSON image in its envelope chunks; since r13 that image is
pruned to the columns the rewritten predicate actually references
(multitable.rewrite_filter returns the set, _envelope projects it).
This script materializes lineitem envelope chunks — the WIDE table —
three ways and prints the on-disk chunk bytes:

  none    no after image (envelope columns only)       — the floor
  pruned  after = {l_quantity} (a one-column predicate) — r13
  full    after = all 11 lineitem columns              — pre-r13

and asserts pruned sits near the floor, far below full. Bytes are
parquet-compressed (so the ratio understates the raw-JSON saving —
the delivery-path/network saving tracks the uncompressed image),
but the ordering and the gap are the audit's claim: payload bytes
are proportional to the referenced column set, not the table width.
Writes no state outside the chunk cache; safe to re-run.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from db_realtime_changefeed_spark.streaming.multitable import (  # noqa: E402
    build_table_chunks,
    rewrite_filter,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # the referenced-column set comes from the real rewrite, not a
    # hand-picked list — the audit measures what the runner ships
    _sql, cols = rewrite_filter("lineitem", "l_quantity > 49")
    assert cols == ("l_quantity",), cols
    variants = {
        "none": dict(with_after=False),
        "pruned": dict(with_after=True, after_cols=cols),
        "full": dict(with_after=True, after_cols=None),
    }
    sizes = {}
    for name, kw in variants.items():
        d = build_table_chunks(spark, SF, "lineitem", **kw)
        sizes[name] = _dir_bytes(d)
        print(f"{name:>7}: {sizes[name]:>12,} bytes  ({d})")
    overhead_full = sizes["full"] - sizes["none"]
    overhead_pruned = sizes["pruned"] - sizes["none"]
    ratio = overhead_pruned / overhead_full
    print(f"payload overhead: pruned {overhead_pruned:,} B vs full "
          f"{overhead_full:,} B -> {ratio:.1%} of the full image")
    ok = sizes["none"] < sizes["pruned"] < sizes["full"] and ratio < 0.35
    print("AUDIT", "PASS" if ok else "FAIL",
          "(pruned image must stay well under the full-row image)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
