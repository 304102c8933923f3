#!/usr/bin/env python
"""Driver-replica sweep: run EVERY registered query and its oracle
through the pandas-level canonicalization the grading driver uses
(toPandas / duckdb .df() → sort columns → sort_values → hash), under
a PLAIN SparkSession. This catches the divergence class the
fetchall-based parity harness cannot see — dtype widening (round 1's
fn_array/fn_map FAILs, the HUGEINT float64 trap) — across the whole
surface at once. Prints one line per query and exits nonzero on any
mismatch."""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(pdf):
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    h = hashlib.md5(pdf.round(6).to_csv(index=False).encode()).hexdigest()
    return h, len(pdf), {c: str(t) for c, t in pdf.dtypes.items()}


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    qs, osql = entry.queries(), entry.oracle_sql()
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 2
        qs = {n: qs[n] for n in only}
    else:
        n_smoke = len(entry.entry(spark).collect())
        print(f"smoke rows: {n_smoke}; queries: {len(qs)}; "
              f"oracles: {len(osql)}")
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sp_h, sp_n, sp_t = canon(fn(spark, sf).toPandas())
            if name not in osql:
                print(f"{name}: rows-only {sp_n} rows "
                      f"({time.time()-t0:.1f}s)")
                continue
            du_h, du_n, du_t = canon(con.sql(osql[name]).df())
            ok = sp_h == du_h and sp_n == du_n
            note = ""
            if not ok and sp_t != du_t:
                diff = {c: (sp_t.get(c), du_t.get(c))
                        for c in set(sp_t) | set(du_t)
                        if sp_t.get(c) != du_t.get(c)}
                note = f" DTYPES {diff}"
            print(f"{name}: rows {sp_n}/{du_n} "
                  f"hash_match {ok}{note} ({time.time()-t0:.1f}s)")
            if not ok:
                failures.append(name)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
            failures.append(name)
    # Strict full-precision gate (the r10 loophole closer): when
    # sweeping named queries at the driver's correctness SF, also run
    # the SAME compare tests/test_oracle_parity.py runs — collect()/
    # fetchall() canonicalization with NO 6-dp rounding. A query that
    # only matches after rounding (the agg_moments_34 class) fails
    # HERE at landing time instead of in the next full-suite run.
    if only and sf.rstrip("/").endswith("sf0.01"):
        from tests.oracle_harness import assert_match, run_pair
        for name in only:
            if name not in osql:
                continue
            try:
                assert_match(name, *run_pair(spark, sf, qs[name],
                                             osql[name]))
                print(f"{name}: strict full-precision parity OK")
            except AssertionError as ex:
                print(f"{name}: STRICT PARITY FAIL {ex}")
                failures.append(f"{name} (strict)")
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
