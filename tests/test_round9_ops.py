"""Semantic pins for the round-9 wave (oracle hash-parity is the
driver's job; these assert the properties that make each operator
RIGHT, not merely reproducible)."""

from __future__ import annotations

import math

from db_realtime_changefeed_spark.catalog import load_table
from db_realtime_changefeed_spark.queries import all_queries

QUERIES = all_queries()


def test_cramers_v_bounds_and_consistency(spark, sf_oracle):
    """V in [0, 1]; chi2 >= 0; n equals the corpus size."""
    r = QUERIES["dq_cramers_v"](spark, sf_oracle).collect()[0]
    assert r.n == load_table(spark, sf_oracle, "documents").count()
    assert r.chi2 >= -1e-9
    assert -1e-9 <= r.cramers_v <= 1 + 1e-9


def test_referential_integrity_clean_and_complete(spark, sf_oracle):
    """The generated schema is referentially clean (0 orphans on
    every edge) and coverage never exceeds the parent count."""
    rows = QUERIES["dq_referential_integrity"](
        spark, sf_oracle).collect()
    assert len(rows) == 7
    for r in rows:
        assert r.n_orphans == 0, r
        assert 0 < r.n_referenced <= r.n_parents, r


def test_uniqueness_audit_reports_honestly(spark, sf_oracle):
    """The single-column ids are unique; the synthetic lineitem
    fixture does NOT enforce the TPC-H composite key (observed
    multiplicities up to 6) — the audit must REPORT that, not
    assume it away (this is exactly the constraint drift the
    operator exists to catch)."""
    rows = {r.key_name: r for r in QUERIES["dq_uniqueness_audit"](
        spark, sf_oracle).collect()}
    assert len(rows) == 6
    for name, r in rows.items():
        assert r.n_rows >= r.n_keys, r
        if name.startswith("lineitem"):
            assert (r.n_dup_keys > 0) == (r.max_multiplicity > 1)
            assert r.n_rows > r.n_keys  # fixture is known-dirty
        else:
            assert r.n_dup_keys == 0 and r.max_multiplicity == 1, r
            assert r.n_rows == r.n_keys, r


def test_assortativity_is_a_correlation(spark, sf_oracle):
    r = QUERIES["graph_degree_assortativity"](
        spark, sf_oracle).collect()[0]
    assert -1 - 1e-9 <= r.assortativity <= 1 + 1e-9
    assert r.n_edges > 0


def test_seasonal_decompose_identity_and_centering(spark, sf_oracle):
    """resid = y - trend - seasonal wherever defined; per-series
    seasonal indices sum to ~0 (re-centering contract); trend is
    NULL exactly on the 3-day edges of each series."""
    rows = QUERIES["ts_seasonal_decompose"](
        spark, sf_oracle).collect()
    by_et: dict = {}
    for r in rows:
        by_et.setdefault(r.event_type, []).append(r)
    for et, rs in by_et.items():
        rs.sort(key=lambda r: r.day)
        n = len(rs)
        for i, r in enumerate(rs):
            if i < 3 or i >= n - 3:
                assert r.trend is None, (et, i)
            else:
                assert r.trend is not None
                assert r.resid == r.y - r.trend - r.seasonal
        seas = {r.day.weekday(): r.seasonal for r in rs
                if r.seasonal is not None}
        # 1e-5: seasonal indices are decimal(18,6)-stabilized, so
        # the re-centering residue is bounded by 7 * 0.5e-6
        assert abs(sum(seas.values())) < 1e-5, et


def test_sax_shape_and_zero_mean(spark, sf_oracle):
    """6 segments per series, 30 days covered, PAA values average
    to ~0 (z-normalization), symbols drawn from a..e."""
    rows = QUERIES["ts_sax_symbols"](spark, sf_oracle).collect()
    by_et: dict = {}
    for r in rows:
        assert r.symbol in "abcde"
        by_et.setdefault(r.event_type, []).append(r)
    for et, rs in by_et.items():
        assert sorted(r.seg for r in rs) == list(range(6)), et
        assert sum(r.n_days for r in rs) == 30, et
        wavg = sum(r.paa * r.n_days for r in rs) / 30
        assert abs(wavg) < 1e-6, et


def test_theil_sen_median_rule(spark, sf_oracle):
    """n_pairs = C(days, 2) per series and the slope is an actual
    pairwise slope (reconstructable from the daily series)."""
    rows = QUERIES["ts_theil_sen"](spark, sf_oracle).collect()
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_oracle, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .count().collect()
    )
    by_et: dict = {}
    for r in daily:
        by_et.setdefault(r.event_type, []).append(
            (r.d.toordinal(), r["count"]))
    for r in rows:
        pts = sorted(by_et[r.event_type])
        n = len(pts)
        assert r.n_pairs == n * (n - 1) // 2
        slopes = sorted(
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1:]
        )
        assert math.isclose(
            r.slope, slopes[(len(slopes) + 1) // 2 - 1],
            rel_tol=1e-12)


def test_jaccard_knn_ranks_and_range(spark, sf_oracle):
    rows = QUERIES["llm_jaccard_knn_text"](spark, sf_oracle).collect()
    by_q: dict = {}
    for r in rows:
        assert r.qid % 50 == 0 and r.did % 50 != 0
        assert 0 < r.jaccard <= 1
        by_q.setdefault(r.qid, []).append(r)
    assert by_q, "at least one query must have candidates"
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        jacs = [r.jaccard for r in rs]
        assert jacs == sorted(jacs, reverse=True)


def test_cross_dedup_priority_picks_best_source(spark, sf_oracle):
    """Every kept doc carries the smallest (priority, doc_id) in its
    duplicate group, verified against a brute-force rebuild."""
    rows = QUERIES["llm_cross_dedup_priority"](
        spark, sf_oracle).collect()
    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "source", "text").collect()
    import hashlib

    groups: dict = {}
    for d in docs:
        h = hashlib.md5(d.text[:80].encode()).hexdigest()
        groups.setdefault(h, []).append(
            (int(d.source.replace("src", "")), d.doc_id, d.source))
    dup = {h: g for h, g in groups.items() if len(g) > 1}
    assert dup, "fixture must contain prefix-duplicate families"
    assert {r.text_hash for r in rows} == set(dup)
    for r in rows:
        best = min(dup[r.text_hash])
        assert (r.keep_doc_id, r.keep_source) == (best[1], best[2])
        assert r.n_copies == len(dup[r.text_hash])


def test_dim_stats_cover_all_dims_no_dead(spark, sf_oracle):
    rows = QUERIES["llm_embedding_dim_stats"](
        spark, sf_oracle).collect()
    dims = sorted(r.dim for r in rows)
    assert dims == list(range(1, len(dims) + 1))
    for r in rows:
        assert r.min_v <= r.mean <= r.max_v
        assert r.std > 0 and not r.dead_dim


def test_reservoir_exact_k_and_rerun_stable(spark, sf_oracle):
    rows = QUERIES["llm_sample_reservoir"](spark, sf_oracle).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    for lang, ids in by_lang.items():
        assert len(ids) == 5 and len(set(ids)) == 5, lang
    again = QUERIES["llm_sample_reservoir"](
        spark, sf_oracle).collect()
    assert sorted((r.lang, r.doc_id, r.draw) for r in rows) == \
        sorted((r.lang, r.doc_id, r.draw) for r in again)


def test_kl_divergences_nonnegative_and_contribs_sum(
        spark, sf_oracle):
    rows = QUERIES["llm_mix_kl_divergence"](
        spark, sf_oracle).collect()
    kt = rows[0].kl_to_temperature
    ku = rows[0].kl_to_uniform
    assert kt >= -1e-9 and ku >= -1e-9
    assert abs(sum(r.kl_contrib for r in rows) - kt) < 1e-6
    assert abs(sum(r.p for r in rows) - 1.0) < 1e-9


def test_iqr_fences_and_counts(spark, sf_oracle):
    rows = QUERIES["dq_iqr_outliers"](spark, sf_oracle).collect()
    ev = load_table(spark, sf_oracle, "events").select(
        "event_type", "value").collect()
    by_et: dict = {}
    for r in ev:
        by_et.setdefault(r.event_type, []).append(r.value)
    for r in rows:
        vals = sorted(by_et[r.event_type])
        n = len(vals)
        assert r.n == n
        assert r.q1 == vals[(n + 3) // 4 - 1]
        assert r.q3 == vals[(3 * n + 3) // 4 - 1]
        brute = sum(1 for v in vals
                    if v < r.lo_fence or v > r.hi_fence)
        assert r.n_outliers == brute


def test_segment_trajectory_matches_base4_counter(spark, sf_smoke):
    rows = sorted(
        QUERIES["llm_index_segment_trajectory"](
            spark, sf_smoke).collect(),
        key=lambda r: r.batch_id)
    assert len(rows) == 9
    for r in rows:
        k = r.batch_id + 1
        digits = [k % 4, (k // 4) % 4, (k // 16) % 4]
        assert r.n_l0 == digits[0]
        assert r.n_segments == sum(digits)
        assert r.max_level == max(
            i for i, d in enumerate(digits) if d > 0)


def test_mmr_diversify_matches_bruteforce_replay(spark, sf_oracle):
    """Replay the whole MMR selection in the test from the raw
    embeddings (python float64, same op order) and demand the same
    ids, steps, and scores — pins pool construction, the selection
    objective, and tie rules end to end."""
    from db_realtime_changefeed_spark.queries.round9c import (
        _MMR_K, _MMR_LAMBDA, _MMR_MU, _MMR_POOL)

    emb = {r.vec_id: [float(v) for v in r.embedding]
           for r in load_table(spark, sf_oracle,
                               "embeddings").collect()}

    def cos(a, b):
        d = s1 = s2 = 0.0
        for x, y in zip(emb[a], emb[b]):
            d += x * y
            s1 += x * x
            s2 += y * y
        return d / (math.sqrt(s1) * math.sqrt(s2))

    rows = QUERIES["llm_mmr_diversify"](spark, sf_oracle).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert by_q
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.step)
        rel = {d: cos(d, q) for d in emb if d % 50 != 0}
        pool = sorted(rel, key=lambda d: (-rel[d], d))[:_MMR_POOL]
        sel: list = []
        for step, r in enumerate(rs, start=1):
            best = None
            for d in sorted(pool):
                if d in sel:
                    continue
                if not sel:
                    score = rel[d]
                else:
                    ms = max(cos(d, s) for s in sel)
                    score = (_MMR_LAMBDA * rel[d]
                             - _MMR_MU * ms)
                if best is None or score > best[1]:
                    best = (d, score)
            sel.append(best[0])
            assert (r.step, r.vec_id) == (step, best[0]), (q, step)
            assert math.isclose(r.score, best[1], rel_tol=1e-9,
                                abs_tol=1e-9), (q, step)
        assert len(sel) == _MMR_K


def test_group_by_all_matches_explicit(spark, sf_oracle):
    got = sorted(
        tuple(r) for r in
        QUERIES["sql_group_by_all"](spark, sf_oracle).collect())
    from pyspark.sql import functions as F

    exp = sorted(
        tuple(r) for r in
        load_table(spark, sf_oracle, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"),
             F.min("doc_id").alias("first_doc"))
        .collect())
    assert got == exp


def test_shard_balance_consistent_with_manifest(spark, sf_oracle):
    r = QUERIES["llm_shard_balance"](spark, sf_oracle).collect()[0]
    shards = QUERIES["llm_export_shards"](spark, sf_oracle).collect()
    toks = [s.n_tokens for s in shards]
    assert r.n_shards == len(toks)
    assert r.total_tokens == sum(toks)
    assert (r.min_tokens, r.max_tokens) == (min(toks), max(toks))
    assert r.imbalance >= 1.0
    assert r.spread == max(toks) - min(toks)


def test_tumbling_pivot_reunites_to_totals(spark, sf_oracle):
    rows = QUERIES["stream_tumbling_pivot"](
        spark, sf_oracle).collect()
    assert len(rows) == 30  # one per day
    n_total = sum(
        sum(getattr(r, f"n_{t}") or 0
            for t in ("click", "error", "purchase", "signup",
                      "view"))
        for r in rows)
    assert n_total == load_table(spark, sf_oracle, "events").count()


def test_simhash_knn_band_guarantee(spark, sf_oracle):
    """Ranks are contiguous from 1, hamming is non-decreasing in
    rank, and every returned neighbor shares at least one 8-bit
    band with its query (the candidate-generation invariant)."""
    sig = {r.doc_id: r.simhash for r in
           QUERIES["llm_dedup_simhash"](spark, sf_oracle).collect()}
    rows = QUERIES["llm_simhash_hamming_knn"](
        spark, sf_oracle).collect()
    by_q: dict = {}
    for r in rows:
        assert bin(sig[r.qid] ^ sig[r.did]).count("1") == r.hamming
        assert any(
            (sig[r.qid] >> (8 * b)) & 255
            == (sig[r.did] >> (8 * b)) & 255
            for b in range(4)), r
        by_q.setdefault(r.qid, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        hams = [r.hamming for r in rs]
        assert hams == sorted(hams)


def test_holt_winters_recurrence_replay(spark, sf_oracle):
    """Replay the recurrence in the test from the daily series and
    demand exact equality — pins init rules, update order, and the
    one-step-ahead fitted contract."""
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_oracle, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .count().collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(
            (r.day, float(r["count"])))
    rows = QUERIES["ts_holt_winters"](spark, sf_oracle).collect()
    got = {(r.event_type, r.day): r for r in rows}
    n_checked = 0
    for et, pts in series.items():
        pts.sort()
        y = [v for _, v in pts]
        lv = sum(y[0:7]) / 7.0
        tr = (sum(y[7:14]) / 7.0 - lv) / 7.0
        s = [y[i] - lv for i in range(7)]
        for t in range(7, len(y)):
            pos = t % 7
            fitted = lv + tr + s[pos]
            l_new = 0.4 * (y[t] - s[pos]) + 0.6 * (lv + tr)
            b_new = 0.2 * (l_new - lv) + 0.8 * tr
            s_new = 0.3 * (y[t] - l_new) + 0.7 * s[pos]
            s[pos] = s_new
            lv, tr = l_new, b_new
            r = got[(et, pts[t][0])]
            assert (r.fitted, r.level, r.trend, r.seasonal) == (
                fitted, l_new, b_new, s_new), (et, t)
            n_checked += 1
    assert n_checked == len(rows)


def test_corr_view_trajectory_consistency(spark, sf_oracle):
    """Final-batch correlations equal a direct batch computation
    over the visible LWW state; corr6 always in [-1, 1]."""
    rows = QUERIES["changefeed_corr_view"](spark, sf_oracle).collect()
    assert rows
    last = max(r.batch_id for r in rows)
    finals = {r.event_type: r for r in rows if r.batch_id == last}
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    ev = load_table(spark, sf_oracle, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    vis = (
        ev.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("event_type") != "error"))
    )
    direct = {
        r.event_type: (r.n, r.c)
        for r in vis.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.corr(F.col("value"), F.col("event_id").cast("double"))
            .alias("c"),
        ).collect()
    }
    for et, r in finals.items():
        assert -1 - 1e-9 <= r.corr6 <= 1 + 1e-9
        n, c = direct[et]
        assert r.n == n
        assert abs(r.corr6 - c) < 1e-5, (et, r.corr6, c)


def test_jsonl_permissive_quarantine(spark, sf_oracle):
    rows = {r.klass: r for r in QUERIES["source_jsonl_permissive"](
        spark, sf_oracle).collect()}
    ev = load_table(spark, sf_oracle, "events")
    assert rows["good"].n == ev.count()
    assert rows["good"].n_typed == rows["good"].n
    assert rows["corrupt"].n == 6
    assert rows["corrupt"].sum_value is None


def test_theil_atkinson_against_brute_force(spark, sf_oracle):
    import math as _m

    rows = {r.o_orderpriority: r for r in QUERIES["agg_theil_index"](
        spark, sf_oracle).collect()}
    prices: dict = {}
    for r in load_table(spark, sf_oracle, "orders").select(
            "o_orderpriority", "o_totalprice").collect():
        prices.setdefault(r.o_orderpriority, []).append(
            r.o_totalprice)
    for prio, xs in prices.items():
        r = rows[prio]
        mu = sum(xs) / len(xs)
        t = sum(x / mu * _m.log(x / mu) for x in xs) / len(xs)
        a = 1 - (sum(_m.sqrt(x) for x in xs) / len(xs)) ** 2 / mu
        assert r.n == len(xs)
        assert abs(r.theil_t6 - t) < 1e-5, prio
        assert abs(r.atkinson_05 - a) < 1e-9, prio
        assert r.theil_t6 >= 0 and 0 <= r.atkinson_05 < 1


def test_zipf_fit_reasonable(spark, sf_oracle):
    r = QUERIES["llm_zipf_fit"](spark, sf_oracle).collect()[0]
    assert r.n_ranks > 10
    assert r.slope < 0, "frequency must fall with rank"
    assert 0 <= r.r2 <= 1 + 1e-12


def test_grid_hotspot_flags_and_totals(spark, sf_oracle):
    rows = QUERIES["geo_grid_hotspot"](spark, sf_oracle).collect()
    n_users = (load_table(spark, sf_oracle, "events")
               .select("user_id").distinct().count())
    assert sum(r.cnt for r in rows) == n_users
    for r in rows:
        assert r.hotspot == (r.zscore > 2.0)
        assert -16 <= r.cell_lat <= 15 and -18 <= r.cell_lon <= 17


def test_pacf_matches_statsmodels_free_replay(spark, sf_oracle):
    """Replay ACF + Durbin-Levinson in the test (float64, same fold
    order) and demand exact equality; lag-1 PACF must equal lag-1
    ACF by construction."""
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_oracle, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .count().collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(
            (r.day, float(r["count"])))
    rows = QUERIES["ts_pacf"](spark, sf_oracle).collect()
    got = {(r.event_type, r.lag): r for r in rows}
    assert len(got) == len(series) * 5
    for et, pts in series.items():
        pts.sort()
        ys = [v for _, v in pts]
        n = len(ys)
        mean = 0.0
        for y in ys:
            mean += y
        mean /= n
        cs = [y - mean for y in ys]
        denom = sum(c * c for c in cs)
        racf = [None] + [
            sum(cs[i] * cs[i + k] for i in range(n - k)) / denom
            for k in range(1, 6)]
        assert got[(et, 1)].pacf == got[(et, 1)].acf == racf[1]
        phi = [racf[1]]
        for k2 in range(2, 6):
            num = racf[k2] - sum(
                phi[j - 1] * racf[k2 - j] for j in range(1, k2))
            den = 1.0 - sum(
                phi[j - 1] * racf[j] for j in range(1, k2))
            a = num / den
            phi = [phi[j - 1] - a * phi[k2 - 1 - j]
                   for j in range(1, k2)] + [a]
            assert abs(got[(et, k2)].pacf - a) < 1e-12, (et, k2)
            assert abs(got[(et, k2)].acf - racf[k2]) < 1e-12


def test_expectation_suite_all_pass_and_observed_zero(
        spark, sf_oracle):
    rows = {r.expectation: r for r in QUERIES["dq_expectation_suite"](
        spark, sf_oracle).collect()}
    assert len(rows) == 6
    for name, r in rows.items():
        assert r.passed, name
        if name != "row_count_min":
            assert r.observed == 0.0, name
    assert rows["row_count_min"].observed == \
        load_table(spark, sf_oracle, "events").count()


def test_esd_masking_resistance_and_replay(spark, sf_oracle):
    """Replay the iterative removal in the test (exact int moments,
    same float ops) — ids, order, R stats and flags all match; R
    stats are the per-iteration maxima of RECOMPUTED z-scores."""
    import math as _m

    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_oracle, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts")).alias("day"))
        .count().collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(
            (r.day, int(r["count"])))
    rows = QUERIES["dq_anomaly_esd"](spark, sf_oracle).collect()
    by_et: dict = {}
    for r in rows:
        by_et.setdefault(r.event_type, []).append(r)
    assert set(by_et) == set(series)
    for et, rs in by_et.items():
        rs.sort(key=lambda r: r.iter)
        rem = sorted(series[et])
        for it, r in enumerate(rs, start=1):
            n = len(rem)
            s = sum(y for _, y in rem)
            sq = sum(y * y for _, y in rem)
            mean = s / n
            std = _m.sqrt((sq * n - s * s) / (n * (n - 1)))
            best_i, best_r = 0, -1.0
            for i, (_, y) in enumerate(rem):
                z = abs(y - mean) / std
                if z > best_r:
                    best_i, best_r = i, z
            d, y = rem.pop(best_i)
            assert (r.iter, r.day, r.y) == (it, d, float(y)), (et, it)
            assert r.r_stat == best_r
            assert r.flagged == (best_r > 3.0)
