"""Round-10 wave-3 semantic pins.

Every query here already has a DuckDB differential oracle
(test_oracle_parity covers exact-value parity); these pins verify the
SEMANTICS independently — pure-Python replays from the raw parquet
(no SQL on either side), plus algebraic invariants the differential
oracle cannot distinguish from a consistent cross-engine mistake."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.queries.round10b import (
    _FDS,
    _TAXONOMY,
    dq_fd_audit,
    dq_gaps_islands,
    graph_clustering_coeff,
    llm_rouge_ngram,
    llm_taxonomy_classify,
    ts_dtw,
    ts_hurst,
    ts_kalman_level,
    ts_periodogram,
)

SF = "/root/testdata/sf0.001"


def _daily(agg, sf=SF):
    """(event_type -> [v0, v1, ...]) day-ordered series via DuckDB —
    an independent path from both the Spark query and its oracle."""
    rows = duckdb.sql(
        f"SELECT event_type, date_trunc('day', ts) AS day, {agg} AS y "
        f"FROM read_parquet('{sf}/events.parquet') "
        "GROUP BY 1, 2 ORDER BY 1, 2").fetchall()
    out = defaultdict(list)
    for et, _, y in rows:
        out[et].append(float(y))
    return out


def test_dtw_matches_python_replay(spark):
    ser = _daily(
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")

    def dtw(xa, xb):
        n, m = len(xa), len(xb)
        D = [[0.0] * m for _ in range(n)]
        for i in range(n):
            for j in range(m):
                d = abs(xa[i] - xb[j])
                if i == 0 and j == 0:
                    D[i][j] = d
                else:
                    up = D[i - 1][j] if i > 0 else 1e308
                    lf = D[i][j - 1] if j > 0 else 1e308
                    dg = (D[i - 1][j - 1]
                          if i > 0 and j > 0 else 1e308)
                    D[i][j] = d + min(up, lf, dg)
        return D[n - 1][m - 1]

    got = {(r.ta, r.tb): (r.n_a, r.n_b, r.dtw)
           for r in ts_dtw(spark, SF).collect()}
    types = sorted(ser)
    assert set(got) == {(a, b) for a in types for b in types if a < b}
    for (ta, tb), (na, nb, d) in got.items():
        assert (na, nb) == (len(ser[ta]), len(ser[tb]))
        assert d == dtw(ser[ta], ser[tb])  # bit-exact replay
        # DTW lower bound: |sum_a - sum_b| <= ... not generally; but
        # distance is nonneg and zero iff identical series
        assert d >= 0.0


def test_dtw_identical_series_is_zero(spark):
    # self-pair is excluded by construction, but the DP itself must
    # give 0 on identical input — pin the helper directly
    from db_realtime_changefeed_spark.queries.round10b import _dtw_fit
    import pandas as pd

    pdf = pd.DataFrame({
        "ta": ["x"] * 6, "tb": ["y"] * 6,
        "side": ["a"] * 3 + ["b"] * 3,
        "idx": [0, 1, 2, 0, 1, 2],
        "y": [1.5, 2.5, 3.5, 1.5, 2.5, 3.5],
    })
    out = _dtw_fit(pdf)
    assert out["dtw"].iloc[0] == 0.0


def test_kalman_matches_python_replay(spark):
    ser = _daily(
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"
        " / count(value)")
    rows = ts_kalman_level(spark, SF).collect()
    by_et = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_et[r.event_type].append(r)
    for et, ys in ser.items():
        got = by_et[et]
        assert len(got) == len(ys)
        level, p = ys[0], 1.0
        assert got[0].level == ys[0] and got[0].p_var == 1.0
        assert got[0].gain is None
        gains = []
        for t in range(1, len(ys)):
            p_pred = p + 0.04
            k = p_pred / (p_pred + 0.25)
            level = level + k * (ys[t] - level)
            p = (1.0 - k) * p_pred
            assert got[t].level == level and got[t].p_var == p
            assert got[t].gain == k
            gains.append(k)
        # steady-state: gain converges monotonically after warm-up
        assert all(abs(gains[i + 1] - gains[i])
                   <= abs(gains[i] - gains[i - 1]) + 1e-15
                   for i in range(1, len(gains) - 1))


def test_periodogram_invariants(spark):
    rows = ts_periodogram(spark, SF).collect()
    by_et = defaultdict(list)
    for r in rows:
        by_et[r.event_type].append(r)
    ser = _daily("CAST(count(*) AS DOUBLE)")
    for et, rs in by_et.items():
        assert len(rs) == 10
        # shares sum to 1 (decimal-summed total)
        assert abs(sum(r.share for r in rs) - 1.0) < 1e-9
        # rnk 1 is the argmax power
        best = min(rs, key=lambda r: r.rnk)
        assert best.power == max(r.power for r in rs)
        # numpy-free DFT replay (float tolerance — different op order)
        ys = ser[et]
        n = len(ys)
        for r in rs:
            a = sum(y * math.cos(2 * math.pi * r.k * t / n)
                    for t, y in enumerate(ys))
            b = sum(y * math.sin(2 * math.pi * r.k * t / n)
                    for t, y in enumerate(ys))
            assert r.power == pytest.approx(a * a + b * b,
                                            rel=1e-6, abs=1e-4)


def test_hurst_python_replay(spark):
    ser = _daily(
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")
    got = {r.event_type: r for r in ts_hurst(spark, SF).collect()}
    for et, ys in ser.items():
        n = len(ys)
        pts = []
        for m, col in ((5, "rs_m5"), (10, "rs_m10"), (15, "rs_m15")):
            rss = []
            for c in range(n // m):
                chunk = ys[c * m:(c + 1) * m]
                mu = sum(chunk) / m
                z, zs = 0.0, []
                for y in chunk:
                    z += y - mu
                    zs.append(z)
                var = (sum(y * y for y in chunk)
                       - sum(chunk) ** 2 / m) / m
                if var > 0:
                    rss.append((max(zs) - min(zs)) / math.sqrt(var))
            avg = sum(rss) / len(rss)
            assert getattr(got[et], col) == pytest.approx(
                avg, rel=1e-5)
            pts.append((math.log(m), math.log(avg)))
        k = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        assert got[et].hurst == pytest.approx(slope, abs=1e-5)
        # rescaled range must grow with m
        assert got[et].rs_m5 < got[et].rs_m10 < got[et].rs_m15


def test_clustering_coeff_brute_force(spark):
    edges = duckdb.sql(f"""
        WITH li AS (SELECT l_orderkey, l_partkey
                    FROM read_parquet('{SF}/lineitem.parquet')
                    WHERE l_orderkey % 4 = 0)
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
    """).fetchall()
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    rows = graph_clustering_coeff(spark, SF).collect()
    assert len(rows) == min(
        25, sum(1 for n in adj if len(adj[n]) >= 2))
    for r in rows:
        nbrs = adj[r.node]
        assert r.d == len(nbrs)
        tri = sum(1 for a in nbrs for b in nbrs
                  if a < b and b in adj[a])
        assert r.tri_cnt == tri
        exact = math.floor(
            2 * tri * 1e6 / (r.d * (r.d - 1)) + 0.5) / 1e6
        assert r.coeff6 == exact
    # cut is the true top-25 of the full eligible ranking
    full = sorted(
        ((math.floor(2 * sum(1 for a in adj[n] for b in adj[n]
                             if a < b and b in adj[a]) * 1e6
                     / (len(adj[n]) * (len(adj[n]) - 1)) + 0.5) / 1e6,
          n)
         for n in adj if len(adj[n]) >= 2),
        key=lambda t: (-t[0], t[1]))[:25]
    assert [(r.coeff6, r.node) for r in rows] == full


def test_fd_audit_expected_verdicts(spark):
    rows = {r.fd: r for r in dq_fd_audit(spark, SF).collect()}
    assert set(rows) == {name for name, *_ in _FDS}
    assert rows["orders.o_orderkey->o_custkey"].holds
    assert rows["orders.o_orderkey->o_custkey"].violated_groups == 0
    li = rows["lineitem.l_orderkey->l_shipdate"]
    assert not li.holds and li.violation_rows > li.violated_groups
    ev = rows["events.user_id->event_type"]
    assert not ev.holds


def test_gaps_islands_python_replay(spark):
    keys = sorted(k for (k, s) in duckdb.sql(
        f"SELECT o_orderkey, o_orderstatus "
        f"FROM read_parquet('{SF}/orders.parquet')").fetchall()
        if s == "F")
    others = sorted(k for (k, s) in duckdb.sql(
        f"SELECT o_orderkey, o_orderstatus "
        f"FROM read_parquet('{SF}/orders.parquet')").fetchall()
        if s != "F")

    def segments(ks):
        segs, start = [], None
        for i, k in enumerate(ks):
            if start is None:
                start = k
            if i + 1 == len(ks) or ks[i + 1] != k + 1:
                segs.append((start, k, k - start + 1))
                start = None
        return sorted(segs, key=lambda s: (-s[2], s[0]))[:10]

    got = defaultdict(list)
    for r in dq_gaps_islands(spark, SF).collect():
        got[r.kind].append((r.seg_start, r.seg_end, r.seg_len))
    assert sorted(got["island"],
                  key=lambda s: (-s[2], s[0])) == segments(keys)
    assert sorted(got["gap"],
                  key=lambda s: (-s[2], s[0])) == segments(others)


def test_rouge_python_replay(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text "
        f"FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY lang, doc_id").fetchall()
    rows = {(r.doc_a, r.doc_b): r
            for r in llm_rouge_ngram(spark, SF).collect()}
    n_pairs = 0
    prev = {}
    for doc_id, lang, text in docs:
        if lang in prev:
            a_id, a_text = prev[lang]
            n_pairs += 1
            wa, wb = a_text.split(" "), text.split(" ")
            u_a, u_b = Counter(wa), Counter(wb)
            b_a = Counter(zip(wa, wa[1:]))
            b_b = Counter(zip(wb, wb[1:]))
            ov1 = sum((u_a & u_b).values())
            ov2 = sum((b_a & b_b).values())
            r = rows[(a_id, doc_id)]
            assert (r.ov1, r.ov2) == (ov1, ov2)
            assert r.rouge1_f6 == math.floor(
                2 * ov1 * 1e6 / (len(wa) + len(wb)) + 0.5) / 1e6
            assert r.rouge2_f6 == math.floor(
                2 * ov2 * 1e6 / (len(wa) + len(wb) - 2) + 0.5) / 1e6
        prev[lang] = (doc_id, text)
    assert len(rows) == n_pairs


def test_taxonomy_python_replay(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text "
        f"FROM read_parquet('{SF}/documents.parquet')").fetchall()
    kw2topic = {k: t for t, kws in _TAXONOMY.items() for k in kws}
    wins = defaultdict(lambda: [0, 0, 0])  # n, score_sum, margin_sum
    for _, text in docs:
        scores = Counter()
        for w in text.split(" "):
            if w in kw2topic:
                scores[kw2topic[w]] += 1
        if not scores:
            continue
        ranked = sorted(scores.items(), key=lambda t: (-t[1], t[0]))
        topic, best = ranked[0]
        second = ranked[1][1] if len(ranked) > 1 else 0
        wins[topic][0] += 1
        wins[topic][1] += best
        wins[topic][2] += best - second
    got = {r.topic: r for r in llm_taxonomy_classify(spark, SF).collect()}
    assert set(got) == set(wins)
    for t, (n, ssum, msum) in wins.items():
        assert got[t].n_docs == n
        assert got[t].avg_score == pytest.approx(ssum / n, abs=1e-9)
        assert got[t].avg_margin == pytest.approx(msum / n, abs=1e-9)
