"""Semantic invariants for the round-5 fourth-wave operators
(row-pattern matching, Markov transitions, weighted priority
sampling) — properties the differential oracle can't express:
agreement with an independent pure-Python re-computation and
distributional sanity of the derived statistics."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table
from db_realtime_changefeed_spark.queries import all_queries

QUERIES = all_queries()


def test_match_recognize_agrees_with_python_re(spark, sf_smoke):
    """Per-user match counts must equal Python's re module applied to
    the same symbolized timeline (independent ordering + matcher)."""
    got = {r.user_id: r for r in
           QUERIES["seq_match_recognize"](spark, sf_smoke).collect()}
    ev = (
        load_table(spark, sf_smoke, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    timelines: dict[int, list] = {}
    for r in ev:
        timelines.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type[0]))
    n_expected_users = 0
    for uid, rows in timelines.items():
        seq = "".join(s for _, _, s in sorted(rows))
        matches = re.findall(r"vc*p", seq)
        if matches:
            n_expected_users += 1
            r = got[uid]
            assert r.n_events == len(seq)
            assert r.n_matches == len(matches)
            assert r.first_match == matches[0]
        else:
            assert uid not in got
    assert len(got) == n_expected_users
    assert n_expected_users > 0


def test_transition_matrix_rows_normalize(spark, sf_smoke):
    """Each prev-state's probabilities sum to 1 (within the 6-dp
    quantization of at most 5 cells), and total transition count is
    n_events - n_users_with_events (one lag-null per user)."""
    rows = QUERIES["seq_transition_matrix"](spark, sf_smoke).collect()
    ev = load_table(spark, sf_smoke, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n for r in rows) == n_events - n_users
    by_prev: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_prev[r.prev] = by_prev.get(r.prev, 0.0) + r.p
    for prev, total in by_prev.items():
        assert abs(total - 1.0) <= 5e-6, (prev, total)


def test_drift_psi_agrees_with_python(spark, sf_smoke):
    """Each PSI term must be non-negative ((x-y)ln(x/y) >= 0) and
    equal an independent Python re-computation; bucket counts must
    account for every event exactly once per feature."""
    import math

    rows = QUERIES["dq_drift_psi"](spark, sf_smoke).collect()
    ev = (
        load_table(spark, sf_smoke, "events")
        .select("ts", "event_type", "value")
        .collect()
    )
    from collections import Counter
    base: dict[str, Counter] = {"event_type": Counter(), "value": Counter()}
    cur: dict[str, Counter] = {"event_type": Counter(), "value": Counter()}
    cutoff = __import__("datetime").datetime(2024, 1, 16)
    for r in ev:
        side = base if r.ts < cutoff else cur
        side["event_type"][r.event_type] += 1
        side["value"]["b%d" % min(int(r.value // 50), 9)] += 1
    for feat in ("event_type", "value"):
        feat_rows = [r for r in rows if r.feature == feat]
        assert sum(r.n_base + r.n_cur for r in feat_rows) == len(ev)
        buckets = {r.bucket for r in feat_rows}
        nb = len(buckets)
        tot_b = sum(base[feat].values())
        tot_c = sum(cur[feat].values())
        for r in feat_rows:
            assert r.n_base == base[feat][r.bucket]
            assert r.n_cur == cur[feat][r.bucket]
            pb = (r.n_base + 0.5) / (tot_b + 0.5 * nb)
            pc = (r.n_cur + 0.5) / (tot_c + 0.5 * nb)
            term = (pc - pb) * math.log(pc / pb)
            assert r.psi_term6 >= 0.0
            assert abs(r.psi_term6
                       - math.floor(term * 1e6 + 0.5) / 1e6) < 1e-12


def test_profile_columns_matches_pandas(spark, sf_smoke):
    """Profile rows must equal an independent pandas recomputation,
    and the physical plan must read the fact table exactly once
    (one Expand-based aggregate serves all distinct counts)."""
    rows = {r.col_name: r for r in
            QUERIES["dq_profile_columns"](spark, sf_smoke).collect()}
    pdf = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"
    ).toPandas()
    assert set(rows) == {"l_orderkey", "l_quantity",
                         "l_returnflag", "l_shipdate"}
    for col, r in rows.items():
        s = pdf[col]
        assert r.n == len(pdf)
        assert r.n_null == int(s.isna().sum())
        assert r.n_distinct == s.nunique()
    assert rows["l_orderkey"].min_val == str(int(pdf["l_orderkey"].min()))
    assert rows["l_quantity"].max_val == (
        "%.2f" % pdf["l_quantity"].max())
    assert rows["l_shipdate"].min_val == str(
        pdf["l_shipdate"].min().date())
    plan = (
        QUERIES["dq_profile_columns"](spark, sf_smoke)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan") == 1
    assert "Expand" in plan


def test_table_diff_agrees_with_two_snapshot_join(spark, sf_smoke):
    """The fused single-scan diff must emit exactly the keys (and
    classifications) that the naive two-snapshot outer-join diff
    produces."""
    import datetime

    got = {r.user_id: r for r in
           QUERIES["dq_table_diff"](spark, sf_smoke).collect()}
    ev = (
        load_table(spark, sf_smoke, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
        .collect()
    )
    cut = datetime.datetime(2024, 1, 16)
    v1: dict[int, int] = {}
    v2: dict[int, int] = {}
    for r in ev:
        v2[r.user_id] = v2.get(r.user_id, 0) + 1
        if r.ts < cut:
            v1[r.user_id] = v1.get(r.user_id, 0) + 1
    expect = {
        uid: ("added" if uid not in v1 else "modified")
        for uid, n2 in v2.items() if v1.get(uid, 0) != n2
    }
    assert {u: r.change_type for u, r in got.items()} == expect
    for uid, r in got.items():
        assert r.cnt_v1 == v1.get(uid, 0)
        assert r.cnt_v2 == v2[uid]
        assert r.cnt_v1 < r.cnt_v2  # append-only: counts only grow


def test_mix_quota_exact_counts_and_ranking(spark, sf_smoke):
    """Each language contributes exactly min(quota, available) docs,
    and the selected set is the top-quota of an independent Python
    md5 ranking."""
    rows = QUERIES["llm_mix_quota"](spark, sf_smoke).collect()
    docs = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", "lang")
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in docs:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    got_by_lang: dict[str, set] = {}
    for r in rows:
        got_by_lang.setdefault(r.lang, set()).add(r.doc_id)
        assert r.target_n == (80 if r.lang == "en" else 30)
        assert 1 <= r.rn <= r.target_n
    for lang, ids in by_lang.items():
        quota = 80 if lang == "en" else 30
        ranked = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        assert got_by_lang.get(lang, set()) == set(ranked[:quota])


def test_stream_cep_agrees_with_batch_sessions(spark, sf_smoke):
    """The streaming session CEP must produce exactly the matches a
    pure-Python 30-min-gap sessionizer + re matcher finds on the
    same events."""
    got = {(r.user_id, r.session_start): r for r in
           QUERIES["stream_match_recognize"](spark, sf_smoke).collect()}
    ev = (
        load_table(spark, sf_smoke, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    import datetime
    gap = datetime.timedelta(minutes=30)
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, r.event_type[0]))
    expect = {}
    for uid, rows in by_user.items():
        rows.sort()
        sess: list = []
        for row in rows:
            if sess and row[0] - sess[-1][0] > gap:
                expect[(uid, sess[0][0])] = "".join(s for _, _, s in sess)
                sess = []
            sess.append(row)
        if sess:
            expect[(uid, sess[0][0])] = "".join(s for _, _, s in sess)
    expect_matched = {
        k: seq for k, seq in expect.items() if re.search(r"vc*p", seq)
    }
    assert set(got) == set(expect_matched)
    for k, r in got.items():
        matches = re.findall(r"vc*p", expect_matched[k])
        assert r.n_matches == len(matches)
        assert r.first_match == matches[0]
        assert r.n_events == len(expect_matched[k])


def test_time_to_convert_agrees_with_python(spark, sf_smoke):
    """Bucketed latency counts and per-bucket means must equal an
    independent Python recomputation of first-view -> first
    at-or-after purchase per user."""
    got = {r.bucket: r for r in
           QUERIES["funnel_time_to_convert"](spark, sf_smoke).collect()}
    ev = (
        load_table(spark, sf_smoke, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    first_view: dict[int, object] = {}
    for r in ev:
        if r.event_type == "view":
            if r.user_id not in first_view or r.ts < first_view[r.user_id]:
                first_view[r.user_id] = r.ts
    first_p: dict[int, object] = {}
    for r in ev:
        if (r.event_type == "purchase" and r.user_id in first_view
                and r.ts >= first_view[r.user_id]):
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                first_p[r.user_id] = r.ts
    import math
    buckets: dict[str, list] = {}
    for uid, p_ts in first_p.items():
        us = int((p_ts - first_view[uid]).total_seconds() * 1e6)
        b = ("lt_1h" if us < 3_600_000_000 else
             "lt_6h" if us < 21_600_000_000 else
             "lt_24h" if us < 86_400_000_000 else "ge_24h")
        buckets.setdefault(b, []).append(us)
    assert set(got) == set(buckets)
    for b, vals in buckets.items():
        assert got[b].n_users == len(vals)
        want = math.floor(sum(vals) / len(vals) + 0.5) / 1e6
        assert abs(got[b].avg_latency_s - want) < 1e-9


def test_winsorize_thresholds_and_clip(spark, sf_smoke):
    """Per-lang thresholds must equal numpy's linear-interpolation
    percentiles; every clipped value sits inside [p05, p95] and the
    flag agrees with the raw value's position."""
    import numpy as np

    rows = QUERIES["llm_winsorize"](spark, sf_smoke).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        vals = np.array([r.n_chars for r in rs], dtype=float)
        p05 = round(float(np.percentile(vals, 5)), 6)
        p95 = round(float(np.percentile(vals, 95)), 6)
        for r in rs:
            assert abs(r.p05 - p05) < 1e-9
            assert abs(r.p95 - p95) < 1e-9
            assert r.p05 - 1e-9 <= r.clipped <= r.p95 + 1e-9
            assert r.is_clipped == (r.n_chars < r.p05
                                    or r.n_chars > r.p95)
            if not r.is_clipped:
                assert abs(r.clipped - r.n_chars) < 1e-9


def test_weighted_median_matches_python_cumsum(spark, sf_smoke):
    """The weighted median must be the smallest price whose
    cumulative quantity weight reaches half the group total, per an
    independent Python cumsum."""
    got = {r.l_returnflag: r for r in
           QUERIES["agg_weighted_median"](spark, sf_smoke).collect()}
    li = (
        load_table(spark, sf_smoke, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    groups: dict[str, list] = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(
            (r.l_extendedprice, int(r.l_quantity)))
    assert set(got) == set(groups)
    for flag, pairs in groups.items():
        pairs.sort()
        total = sum(w for _, w in pairs)
        cum = 0
        median = None
        for price, wgt in pairs:
            cum += wgt
            if 2 * cum >= total:
                median = price
                break
        assert got[flag].total_qty == total
        assert abs(got[flag].wmedian_price - median) < 1e-9


def test_state_store_reader_matches_batch_agg(spark, sf_smoke):
    """The state read back from the checkpoint must hold exactly the
    batch aggregate of the replayed input — nothing extra resident,
    nothing missing."""
    got = {r.event_type: r.n for r in
           QUERIES["scan_state_store"](spark, sf_smoke).collect()}
    want = {r.event_type: r.n for r in (
        load_table(spark, sf_smoke, "events")
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        .collect())}
    assert got == want


def test_weighted_sample_is_topk_of_python_race(spark, sf_smoke):
    """The 50 winners must be exactly the 50 smallest u/w keys
    recomputed independently with hashlib, and the weight bias must
    show: mean n_chars of winners > corpus mean (longer docs are
    proportionally likelier)."""
    got = QUERIES["llm_sample_weighted"](spark, sf_smoke).collect()
    assert len(got) == 50
    docs = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", "n_chars")
        .collect()
    )
    keyed = []
    for r in docs:
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        keyed.append((u / r.n_chars, r.doc_id, r.n_chars))
    keyed.sort()
    expect_ids = [doc_id for _, doc_id, _ in keyed[:50]]
    assert [r.doc_id for r in got] == expect_ids
    mean_all = sum(n for _, _, n in keyed) / len(keyed)
    mean_win = sum(r.n_chars for r in got) / 50.0
    assert mean_win > mean_all
    for r, (k, _, _) in zip(got, keyed[:50]):
        import math
        assert abs(r.key6 - math.floor(k * 1e6 + 0.5) / 1e6) < 1e-12
