"""Bucketed MVCC state layout for entity-keyed changefeed state.

The round-2 layout rewrote the WHOLE state directory every
micro-batch — correct, but at 100 TB the state of a per-user feed is
itself huge, while a single micro-batch touches only a sliver of it.
This store partitions state into N_BUCKETS hash buckets of the key
and gives each version a tiny JSON MANIFEST mapping bucket -> the
batch id that last rewrote it:

    state_root/
      buckets/b<k>/v<batch>/   parquet: bucket k's FULL contents as
                               of <batch> (written only when touched)
      manifest-v<batch>.json   {"buckets": {"<k>": <writer batch>}}

A micro-batch reads only the buckets its delta touches (path-pruned
scan), merges, rewrites exactly those bucket dirs under the new
version, and copies the previous manifest forward for the rest.
Untouched data is never rewritten or copied — a version flip is a
manifest write. This is the Iceberg/Delta MERGE shape expressed on
plain parquet: immutable data files + a tiny metadata commit, so
MVCC time travel (df_at), at-least-once rewind (re-delivered batches
overwrite their own bucket dirs + manifest — idempotent), and GC
(drop manifests, then unreferenced bucket dirs) all stay exact.

Bucketing uses pmod(xxhash64(key), N) so any key type works and the
bucket is derivable from the key — it is never stored in the data.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def default_state_buckets() -> int:
    """Bucket count B. Per-batch write cost is O(touched buckets /
    B of the state); at 100 TB you size B so one bucket fits a task
    comfortably (thousands) — it's the same knob, larger."""
    return int(os.environ.get("SPARK_GRAFT_STATE_BUCKETS", "16"))


class BucketedMvccState:
    """Versioned, hash-bucketed parquet state with manifest commits.

    The store owns the bucket/manifest layout only; the POINTER file
    (which version is CURRENT) stays with the runner, next to its
    changelog and checkpoint.
    """

    def __init__(self, spark: SparkSession, state_root: str, ddl: str,
                 key_col: str | list[str],
                 n_buckets: int | None = None):
        self.spark = spark
        self.root = state_root
        self.ddl = ddl
        self.key_cols = (
            [key_col] if isinstance(key_col, str) else list(key_col)
        )
        self.n_buckets = n_buckets or default_state_buckets()
        self.buckets_root = os.path.join(state_root, "buckets")
        os.makedirs(self.buckets_root, exist_ok=True)

    # ---- layout helpers ----
    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.root, f"manifest-v{batch_id}.json")

    def _bucket_dir(self, bucket: int, batch_id: int) -> str:
        return os.path.join(self.buckets_root, f"b{bucket}", f"v{batch_id}")

    def bucket_expr(self, *cols):
        if not cols:
            cols = [F.col(c) for c in self.key_cols]
        return F.pmod(F.xxhash64(*cols), F.lit(self.n_buckets))

    def has_version(self, batch_id: int) -> bool:
        return os.path.exists(self._manifest_path(batch_id))

    def versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            m = re.fullmatch(r"manifest-v(\d+)\.json", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def manifest(self, batch_id: int) -> dict[int, int]:
        with open(self._manifest_path(batch_id)) as f:
            raw = json.load(f)["buckets"]
        return {int(k): int(v) for k, v in raw.items()}

    # ---- reads ----
    def df_at(self, batch_id: int,
              buckets: list[int] | None = None) -> DataFrame:
        """State as of `batch_id`; with `buckets`, a PRUNED read of
        only those buckets' paths — the partial-state scan a
        micro-batch merge uses."""
        man = self.manifest(batch_id)
        if buckets is not None:
            sel = set(buckets)
            man = {k: v for k, v in man.items() if k in sel}
        paths = [self._bucket_dir(k, v) for k, v in sorted(man.items())]
        if not paths:
            return self.spark.createDataFrame([], self.ddl)
        return self.spark.read.schema(self.ddl).parquet(*paths)

    def touched_buckets(self, delta_df: DataFrame,
                        key: str | None = None) -> list[int]:
        """Distinct buckets of the batch's keys — at most B small
        ints cross to the driver, never key-cardinality data."""
        expr = (
            self.bucket_expr(F.col(key)) if key is not None
            else self.bucket_expr()
        )
        rows = delta_df.select(expr.alias("b")).distinct().collect()
        return sorted(r["b"] for r in rows)

    # ---- commit ----
    def commit(self, batch_id: int, base_batch: int | None,
               merged_df: DataFrame, touched: list[int]) -> None:
        """Write `merged_df` (the full new contents of exactly the
        `touched` buckets) under version `batch_id`, carry every
        other bucket forward from `base_batch`'s manifest, and
        publish manifest-v{batch_id}. Idempotent: a replayed batch
        rewrites its own bucket dirs and manifest."""
        tmp = os.path.join(self.root, f"tmp-v{batch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        if touched:
            (
                merged_df
                .withColumn("__bucket", self.bucket_expr())
                .repartition("__bucket")
                .write.partitionBy("__bucket")
                .mode("overwrite")
                .parquet(tmp)
            )
        man = {} if base_batch is None else dict(self.manifest(base_batch))
        for k in touched:
            src = os.path.join(tmp, f"__bucket={k}")
            dst = self._bucket_dir(k, batch_id)
            shutil.rmtree(dst, ignore_errors=True)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(src):
                os.replace(src, dst)
            else:  # a touched bucket whose merged contents are empty
                os.makedirs(dst)
            man[k] = batch_id
        shutil.rmtree(tmp, ignore_errors=True)
        mp = self._manifest_path(batch_id)
        with open(mp + ".tmp", "w") as f:
            json.dump({"buckets": {str(k): v for k, v in man.items()}}, f)
        os.replace(mp + ".tmp", mp)

    # ---- GC ----
    def gc(self, keep: set[int]) -> list[int]:
        """Drop manifests outside `keep`, then any bucket version dir
        no retained manifest references. Returns dropped batch ids."""
        removed = []
        for b in self.versions():
            if b not in keep:
                os.remove(self._manifest_path(b))
                removed.append(b)
        referenced: set[tuple[int, int]] = set()
        for b in self.versions():
            referenced.update(self.manifest(b).items())
        if os.path.isdir(self.buckets_root):
            for bname in os.listdir(self.buckets_root):
                m = re.fullmatch(r"b(\d+)", bname)
                if not m:
                    continue
                k = int(m.group(1))
                bdir = os.path.join(self.buckets_root, bname)
                for vname in os.listdir(bdir):
                    vm = re.fullmatch(r"v(\d+)", vname)
                    if vm and (k, int(vm.group(1))) not in referenced:
                        shutil.rmtree(os.path.join(bdir, vname))
        return removed
