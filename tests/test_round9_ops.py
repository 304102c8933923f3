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
