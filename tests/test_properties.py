"""Property-based + golden tests (SURVEY §5.4–5.5).

Properties that must hold for the driver's order-insensitive hash
grading to be trustworthy:
- decimal-stabilized float aggregation is invariant under row-order
  permutation (the core determinism claim of queries/_util.py);
- dedup is idempotent and self-union collapses;
- the changefeed's materialized state is invariant to replay
  chunking (micro-batch boundaries must not leak into results);
- the flagship entry() output matches a checked-in golden snapshot.
"""

from __future__ import annotations

import json
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.queries._util import dsum
from db_realtime_changefeed_spark.streaming.changefeed import ChangefeedRunner

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group key
        st.floats(
            min_value=-1e6, max_value=1e6,
            allow_nan=False, allow_infinity=False, width=64,
        ),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_dsum_order_invariant(spark, rows, seed):
    """Decimal-routed double sums must not depend on row order or
    partitioning — this is what makes every graded float aggregate
    hash-stable against the oracle."""
    import random

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)
    ddl = "k int, v double"

    def agg(data, parts):
        df = spark.createDataFrame(data, ddl).repartition(parts)
        out = df.groupBy("k").agg(dsum("v").alias("s")).collect()
        return {r["k"]: r["s"] for r in out}

    assert agg(rows, 1) == agg(shuffled, 7)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_dedup_idempotent(spark, rows):
    """dropDuplicates twice == once; union-with-self collapses."""
    ddl = "k int, v double"
    df = spark.createDataFrame(rows, ddl)
    once = sorted(map(tuple, df.dropDuplicates(["k"]).collect()))
    twice = sorted(
        map(tuple, df.dropDuplicates(["k"]).dropDuplicates(["k"]).collect())
    )
    doubled = sorted(
        map(tuple, df.unionByName(df).dropDuplicates(["k"]).collect())
    )
    assert len(once) == len(twice) == len(doubled)
    assert {t[0] for t in once} == {t[0] for t in doubled}


def test_changefeed_chunking_invariant(spark, sf_smoke):
    """The materialized state must be identical no matter how the
    replay is chunked — micro-batch boundaries are an execution
    detail, not a semantic input."""
    a = ChangefeedRunner(spark, sf_smoke)
    a.run(n_chunks=4)
    b = ChangefeedRunner(spark, sf_smoke)
    b.run(n_chunks=8)
    sa = sorted(map(tuple, a.state().collect()))
    sb = sorted(map(tuple, b.state().collect()))
    assert sa == sb


def test_entry_golden(spark):
    """Flagship entry() output vs checked-in snapshot (sf0.001)."""
    import __spark_entry__ as e

    rows = [
        {k: (round(v, 6) if isinstance(v, float) else v)
         for k, v in r.asDict().items()}
        for r in e.entry(spark).collect()
    ]
    rows = sorted(rows, key=lambda d: json.dumps(d, sort_keys=True, default=str))
    path = os.path.join(GOLDEN, "entry_agg_groupby.json")
    if not os.path.exists(path):  # first run writes the snapshot
        os.makedirs(GOLDEN, exist_ok=True)
        with open(path, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True, default=str)
        raise AssertionError("golden snapshot created; re-run to verify")
    with open(path) as f:
        golden = json.load(f)
    assert json.loads(json.dumps(rows, default=str)) == golden


@given(
    num=st.integers(min_value=-10**9, max_value=10**9),
    den=st.integers(min_value=1, max_value=10**4),
)
@settings(max_examples=50, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dround6_div_matches_round_off_ties(spark, num, den):
    """dround6_div == round(num/den, 6) whenever the quotient is NOT
    a 6-dp midpoint; at midpoints it is half-up deterministic
    (floor(x+0.5)) on both engines by construction."""
    import duckdb

    from db_realtime_changefeed_spark.queries._util import (
        dround6_div, sql_dround6_div)
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(float(num), float(den))], "p double, q double")
    got = df.select(dround6_div(F.col("p"), F.col("q")).alias("r")).collect()[0].r
    duck = duckdb.sql(
        f"SELECT {sql_dround6_div(str(float(num)), str(float(den)))}"
    ).fetchone()[0]
    assert got == duck, f"engines disagree: {got} vs {duck}"
    # off-tie agreement with plain round
    scaled = float(num) * 1e6 / float(den)
    if abs(scaled - (int(scaled) + 0.5)) > 1e-9 and abs(scaled) < 2**52:
        assert got == round(scaled) / 1e6 or abs(
            got - round(scaled) / 1e6
        ) <= 1e-6, "diverged from round() off a tie"


_cdc_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),        # user_id
        st.integers(min_value=0, max_value=3),        # ts bucket
        st.sampled_from(["click", "purchase", "error", "view"]),
        st.floats(min_value=0.0, max_value=500.0,
                  allow_nan=False, allow_infinity=False, width=64),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_cdc_events)
def test_maintained_views_match_recompute_on_random_cdc(spark, events):
    """Adversarial IVM property: for ARBITRARY CDC sequences — same-key
    churn, duplicate timestamps, delete/reinsert cycles, all-delete
    streams — the incrementally maintained agg view, support
    relation, and range index must land exactly on a from-scratch
    recomputation over the final LWW-visible table. This probes the
    retraction algebra where the fixture's distribution never goes
    (e.g. every event deleted, ties on (ts) broken by event_id)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from db_realtime_changefeed_spark.streaming.views import (
        MaintainedViewsRunner,
    )
    from db_realtime_changefeed_spark.tmputil import scratch_dir

    sf_dir = scratch_dir(prefix="dbrcf-prop-views-")
    n = len(events)
    tbl = pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array(
            [1_700_000_000_000_000 + t * 3_600_000_000
             for _u, t, _e, _v in events], pa.timestamp("us")),
        "user_id": pa.array([u for u, *_ in events], pa.int64()),
        "event_type": pa.array([e for _u, _t, e, _v in events],
                               pa.string()),
        "value": pa.array([v for *_x, v in events], pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    r = MaintainedViewsRunner(spark, sf_dir)
    r.run(n_chunks=min(3, n))
    last = max(r._batches)
    base = r._base.df_at(last).where(~F.col("deleted"))
    # agg view == direct grouped aggregate over visible rows
    got_agg = {
        (x["event_type"]): (x["cnt"], round(float(x["sum_value"]), 6))
        for x in r._agg.df_at(last).collect()
    }
    want_agg = {
        x["event_type"]: (x["cnt"], round(float(x["s"]), 6))
        for x in base.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
        ).collect()
    }
    assert got_agg == want_agg
    # support multiset == visible (type, value) rows
    sup = r._support.df_at(last)
    assert sup.where(F.col("cnt") <= 0).count() == 0
    assert sup.agg(F.sum("cnt")).collect()[0][0] == base.count() or (
        base.count() == 0 and sup.count() == 0)
    # index rows == visible rows (projected)
    idx = r._index.df_at(last).select("user_id", "value", "event_id")
    want_idx = base.select("user_id", "value", "event_id")
    assert idx.exceptAll(want_idx).count() == 0
    assert want_idx.exceptAll(idx).count() == 0


_seg_ops = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # bucket
        st.integers(min_value=1, max_value=12),   # rows in batch
    ),
    min_size=1,
    max_size=14,
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=_seg_ops, fanout=st.integers(min_value=2, max_value=4))
def test_segment_index_probe_equals_bruteforce(spark, batches, fanout):
    """Random append sequences against SegmentedBucketIndex: after
    EVERY append, probing any bucket returns exactly the rows a
    brute-force dict would hold — across whatever compaction state
    the fanout/sequence produced — and the live level profile obeys
    base-`fanout` counter arithmetic."""
    from db_realtime_changefeed_spark.operators.segment_index import (
        SegmentedBucketIndex,
    )
    from db_realtime_changefeed_spark.tmputil import scratch_dir

    store = SegmentedBucketIndex(
        spark, scratch_dir(prefix="dbrcf-segprop-"),
        "rid long, payload long", fanout=fanout)
    truth: dict = {}
    rid = 0
    for b, (bucket_base, n) in enumerate(batches):
        rows = []
        for i in range(n):
            bucket = (bucket_base + i) % 6
            rows.append((rid, rid * 7, bucket))
            truth.setdefault(bucket, []).append((rid, rid * 7))
            rid += 1
        store.append_batch(
            spark.createDataFrame(
                rows, "rid long, payload long, bucket int"),
            b)
        probe_bucket = bucket_base
        df = store.probe(probe_bucket)
        got = (sorted((r.rid, r.payload) for r in df.collect())
               if df is not None else [])
        assert got == sorted(truth.get(probe_bucket, [])), (b, fanout)
        # live profile == digits of (b+1) in base `fanout`
        k = b + 1
        digits = []
        while k:
            digits.append(k % fanout)
            k //= fanout
        by_level: dict = {}
        for _, lv in store.live_segments():
            by_level[lv] = by_level.get(lv, 0) + 1
        assert by_level == {
            i: d for i, d in enumerate(digits) if d}, (b, fanout)


# ---------------------------------------------------------------------------
# round-10 continuation: algorithmic properties of the wave-3/4 recurrences,
# exercised on SYNTHETIC inputs through the exact worker functions the graded
# queries run (no Spark needed — the DP/filter code is the unit under test)


_series_f = st.lists(
    st.floats(min_value=-1e3, max_value=1e3,
              allow_nan=False, allow_infinity=False, width=64),
    min_size=2, max_size=12)


def _dtw_of(xa, xb):
    import pandas as pd

    from db_realtime_changefeed_spark.queries.round10b import _dtw_fit

    pdf = pd.DataFrame({
        "ta": ["x"] * (len(xa) + len(xb)),
        "tb": ["y"] * (len(xa) + len(xb)),
        "side": ["a"] * len(xa) + ["b"] * len(xb),
        "idx": list(range(len(xa))) + list(range(len(xb))),
        "y": xa + xb,
    })
    return float(_dtw_fit(pdf)["dtw"].iloc[0])


@settings(max_examples=40, deadline=None)
@given(xa=_series_f, xb=_series_f)
def test_dtw_symmetry_and_identity(xa, xb):
    """DTW(a, b) == DTW(b, a) (the min recurrence is symmetric in
    the operands) and DTW(a, a) == 0 — the metric-axiom subset DTW
    actually satisfies (it famously violates the triangle
    inequality, so that is NOT asserted)."""
    assert _dtw_of(xa, xb) == _dtw_of(xb, xa)
    assert _dtw_of(xa, xa) == 0.0
    assert _dtw_of(xa, xb) >= 0.0


@settings(max_examples=40, deadline=None)
@given(xa=_series_f, shift=st.floats(min_value=-100, max_value=100,
                                     allow_nan=False, width=64))
def test_dtw_shift_bound(xa, shift):
    """A constant shift of one series changes DTW by at most
    |shift| x path length <= |shift| * (2 * n): each cell's local
    cost moves by at most |shift| and the warping path has at most
    n + m - 1 cells."""
    xb = [v + shift for v in xa]
    n = len(xa)
    assert _dtw_of(xa, xb) <= abs(shift) * (2 * n) + 1e-6


@settings(max_examples=40, deadline=None)
@given(ys=st.lists(
    st.floats(min_value=-1e3, max_value=1e3,
              allow_nan=False, allow_infinity=False, width=64),
    min_size=3, max_size=30))
def test_kalman_gain_converges_to_steady_state(ys):
    """The local-level Kalman gain must converge monotonically to
    the Riccati fixpoint K* = (sqrt(Q^2 + 4 Q R) - Q) / ... —
    computed here directly as the positive root of
    P = (1-K)(P+Q), K = (P+Q)/(P+Q+R). Data values cannot affect
    the gain sequence at all (it depends only on Q, R, P0)."""
    import math as _m

    import pandas as pd

    from db_realtime_changefeed_spark.queries.round10b import _kalman_fit

    pdf = pd.DataFrame({
        "event_type": ["e"] * len(ys),
        "day": pd.date_range("2024-01-01", periods=len(ys)),
        "y": ys,
    })
    out = _kalman_fit(pdf)
    gains = [g for g in out["gain"] if g is not None and not pd.isna(g)]
    q, r = 0.04, 0.25
    # steady state: p_pred* = (q + sqrt(q*q + 4*q*r)) / 2; k* = p*/(p*+r)
    p_star = (q + _m.sqrt(q * q + 4 * q * r)) / 2.0
    k_star = p_star / (p_star + r)
    # P0 = 1 > p*, so the gain sequence descends monotonically onto
    # the fixpoint from above, each step strictly closer
    assert all(g >= k_star - 1e-12 for g in gains)
    assert all(gains[i + 1] < gains[i] + 1e-15
               for i in range(len(gains) - 1))
    if len(gains) >= 25:
        assert abs(gains[-1] - k_star) < 1e-6
    # gain sequence is data-independent: rerun with zeros
    pdf2 = pdf.assign(y=0.0)
    gains2 = [g for g in _kalman_fit(pdf2)["gain"]
              if g is not None and not pd.isna(g)]
    assert gains == gains2


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 10**6)),
    min_size=1, max_size=30, unique=True))
def test_checksum_single_row_sensitivity(rows):
    """The partition checksum must change when any single row's
    canonical string changes (md5 32-bit prefixes collide with
    probability ~2^-32 — hypothesis won't find one), and shard sums
    must merge to the total."""
    import hashlib

    def digest(part, key):
        h = hashlib.md5(f"{part}|{key}".encode()).hexdigest()
        return int(h[:8], 16)

    from collections import defaultdict
    sums = defaultdict(int)
    for part, key in rows:
        sums[part] += digest(part, key)
    total = sum(sums.values())
    # merge property
    assert total == sum(sums[p] for p in sums)
    # sensitivity: perturb the first row's key
    part0, key0 = rows[0]
    perturbed = total - digest(part0, key0) + digest(part0, key0 + 1)
    assert perturbed != total
