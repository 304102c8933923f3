"""Semantic invariants for the round-5 third-wave operators
(regression, ordered LISTAGG, IGNORE NULLS navigation, series
autocorrelation, triangle counting, partitioned write layout) —
properties the differential oracle can't express."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table
from db_realtime_changefeed_spark.queries import all_queries

QUERIES = all_queries()


def test_regression_matches_numpy(spark, sf_smoke):
    """Slope/intercept/R² must agree with an independent pandas OLS
    on the same rows to float precision."""
    got = {r.l_returnflag: r for r in
           QUERIES["agg_regression"](spark, sf_smoke).collect()}
    pdf = (
        load_table(spark, sf_smoke, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    for flag, g in pdf.groupby("l_returnflag"):
        x = g["l_quantity"].astype(float)
        y = g["l_extendedprice"].astype(float)
        n = len(g)
        sxy = (x * y).sum() - x.sum() * y.sum() / n
        sxx = (x * x).sum() - x.sum() ** 2 / n
        syy = (y * y).sum() - y.sum() ** 2 / n
        slope = sxy / sxx
        r = got[flag]
        assert r.n == n
        assert abs(r.slope - slope) / abs(slope) < 1e-9
        assert abs(r.intercept - (y.mean() - slope * x.mean())) < 1e-3
        assert abs(r.r2 - sxy * sxy / (sxx * syy)) < 1e-9
        assert 0.0 < r.r2 <= 1.0


def test_listagg_top3_order_and_sum(spark, sf_smoke):
    """Each segment lists at most 3 nations; the listagg order is
    (count DESC, name); top_cust re-derives from an independent
    groupBy."""
    rows = QUERIES["agg_listagg"](spark, sf_smoke).collect()
    c = load_table(spark, sf_smoke, "customer")
    nt = load_table(spark, sf_smoke, "nation")
    counts = (
        c.join(nt, nt.n_nationkey == c.c_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_seg: dict[str, list[tuple[int, str]]] = {}
    for r in counts:
        by_seg.setdefault(r.c_mktsegment, []).append((r.n, r.n_name))
    for r in rows:
        ordered = sorted(by_seg[r.seg], key=lambda t: (-t[0], t[1]))[:3]
        assert r.top_nations == ",".join(name for _, name in ordered)
        assert r.top_cust == sum(n for n, _ in ordered)


def test_ignore_nulls_is_groupwise_ffill(spark, sf_smoke):
    """`filled` must equal a pandas groupby-ffill of the nulled
    observation series, and `prev_obs` the strictly-previous
    observation."""
    pdf = (
        QUERIES["win_ignore_nulls"](spark, sf_smoke)
        .join(load_table(spark, sf_smoke, "events")
              .select("event_id", "ts"), "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    g = pdf.groupby("user_id")["obs"]
    assert pdf["filled"].equals(g.ffill())
    shifted = g.apply(lambda s: s.ffill().shift(1)).reset_index(
        level=0, drop=True)
    assert pdf["prev_obs"].equals(shifted)


def test_autocorr_bounds(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    n_days = ev.select(F.col("ts").cast("date")).distinct().count()
    r = QUERIES["ts_autocorr"](spark, sf_smoke).collect()[0]
    assert r.n_pairs == n_days - 1
    assert -1.0 <= r.autocorr_lag1 <= 1.0


def test_triangles_match_bruteforce(spark, sf_smoke):
    """Degree-oriented count must equal the naive all-triples count
    on the smoke graph."""
    li = (
        load_table(spark, sf_smoke, "lineitem")
        .where(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            edges.add((u, v))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = sum(
        1 for u, v in edges
        for w in adj[u] & adj[v] if v < w
    )
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    got = QUERIES["graph_triangles"](spark, sf_smoke).collect()[0]
    assert got.n_nodes == len(adj)
    assert got.n_edges == len(edges)
    assert got.n_triangles == tri
    assert got.n_wedges == wedges
    assert abs(got.transitivity - 3.0 * tri / wedges) < 1e-12


def test_triangles_closure_is_not_forced_broadcast(spark, sf_smoke):
    """VERDICT r5: the wedge-closure probe joins against the O(|E|)
    edge relation and must not carry a mandatory broadcast hint (at
    100x the edge set is tens of GB). Broadcast hints are allowed only
    on the bounded-size sides (degrees: one row per node; the scalar
    stats rows). The closure join line in the optimized logical plan
    — the one whose condition equates (u, v) with (a, b) — must be
    hint-free; AQE downgrading it to broadcast at runtime from real
    measured sizes is fine and not what this guards against."""
    import re

    df = QUERIES["graph_triangles"](spark, sf_smoke)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    closure = [
        ln for ln in plan.splitlines()
        if re.search(r"Join Inner, \(\(u#\d+L? = a#\d+L?\)", ln)
    ]
    assert closure, "closure join not found in optimized plan"
    for ln in closure:
        assert "Hint" not in ln, f"forced hint on closure join: {ln}"


def test_layout_write_prunes_partitions(spark, sf_smoke):
    """The read-back plan must carry a partition filter on ym (the
    written layout prunes at the directory level), and the lake must
    hold every ship month exactly once."""
    import os

    from db_realtime_changefeed_spark.queries.analytics_ext import _layout_dir

    df = QUERIES["layout_partitioned_write"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ym" in plan
    out = _layout_dir(sf_smoke)
    months = sorted(
        d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("ym=")
    )
    expected = sorted(
        r.ym for r in load_table(spark, sf_smoke, "lineitem")
        .select(F.date_format("l_shipdate", "yyyy-MM").alias("ym"))
        .distinct().collect()
    )
    assert months == expected
    assert {r.ym for r in df.collect()} == {"1996-03", "1996-04"}


def test_perplexity_buckets_partition_docs(spark, sf_smoke):
    """Tiers 1..3 cover every scoreable doc exactly once, sizes are
    balanced (ntile), and tier ce-ranges are ordered and disjoint."""
    rows = sorted(
        QUERIES["llm_perplexity_buckets"](spark, sf_smoke).collect(),
        key=lambda r: r.bucket,
    )
    assert [r.bucket for r in rows] == [1, 2, 3]
    n_scoreable = (
        load_table(spark, sf_smoke, "documents")
        .where(F.size(F.split("text", " ")) >= 2)
        .count()
    )
    assert sum(r.n_docs for r in rows) == n_scoreable
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_ce <= hi.min_ce
        assert lo.min_ce <= lo.mean_ce <= lo.max_ce


def test_arrow_udf_matches_python(spark, sf_smoke):
    got = {r.p_partkey: r.bin
           for r in QUERIES["udf_scalar_arrow"](spark, sf_smoke).collect()}
    src = load_table(spark, sf_smoke, "part").collect()
    for r in src:
        assert got[r.p_partkey] == (
            f"{r.p_brand.replace('Brand#', 'B')}/{r.p_size // 10}"
        )


def test_stream_datasource_exactly_once(spark, sf_smoke):
    """Offset-planned streaming read must deliver every event exactly
    once — no loss, no duplication across planned partitions."""
    df = QUERIES["source_python_datasource_stream"](spark, sf_smoke)
    n_events = load_table(spark, sf_smoke, "events").count()
    assert df.count() == n_events
    assert df.select("event_id").distinct().count() == n_events


def test_sql_udf_inlines_to_codegen(spark, sf_smoke):
    """The SQL UDF must inline — no Python evaluation node may
    appear, and results equal the hand-inlined expression."""
    df = QUERIES["fn_sql_udf"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    inline = (
        load_table(spark, sf_smoke, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum((F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount")))
                   .cast("decimal(18,6)")).cast("double").alias("revenue"))
        .collect()
    )
    got = {r.l_returnflag: r.revenue for r in df.collect()}
    for r in inline:
        assert got[r.l_returnflag] == r.revenue


def test_session_variable_threshold(spark, sf_smoke):
    """The variable-driven filter must agree with an explicit
    two-step computation of the same threshold."""
    rows = QUERIES["sql_session_variables"](spark, sf_smoke).collect()
    o = load_table(spark, sf_smoke, "orders")
    thr = o.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
         .cast("double") / F.count(F.lit(1))).alias("t")
    ).collect()[0].t
    expect = {
        r.o_orderpriority: r.n
        for r in o.where(F.col("o_totalprice") > thr)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r.o_orderpriority: r.n_above for r in rows} == expect


def test_execute_immediate_binds(spark, sf_smoke):
    rows = QUERIES["sql_execute_immediate"](spark, sf_smoke).collect()
    o = load_table(spark, sf_smoke, "orders")
    expect = {
        r.o_orderstatus: r.n
        for r in o.where(F.col("o_totalprice") > 150000.0)
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.o_orderstatus: r.n for r in rows} == expect


def test_null_safe_join_matches_null_class(spark, sf_smoke):
    """NULL<=>NULL must MATCH: the NULL group's pair count is the
    product of the two delinquent populations, and the plan stays a
    hash join (EqualNullSafe is a join KEY, not a theta filter)."""
    df = QUERIES["join_null_safe"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    c_neg = (load_table(spark, sf_smoke, "customer")
             .where(F.col("c_acctbal") < 0).count())
    s_neg = (load_table(spark, sf_smoke, "supplier")
             .where(F.col("s_acctbal") < 0).count())
    null_row = [r for r in df.collect() if r.k is None]
    if c_neg * s_neg == 0:
        assert null_row == []  # inner join: empty side, no NULL class
    else:
        assert len(null_row) == 1
        assert null_row[0].n_pairs == c_neg * s_neg


def test_sql_tvf_expands_three_rows_per_order(spark, sf_smoke):
    df = QUERIES["fn_sql_tvf"](spark, sf_smoke)
    o = load_table(spark, sf_smoke, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    assert df.count() == 3 * urgent.count()
    back = (
        df.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("k_rows"),
             F.sum("amount").alias("total"))
        .join(urgent.select("o_orderkey", "o_totalprice"), "o_orderkey")
    )
    bad = back.where(
        (F.col("k_rows") != 3)
        | (F.abs(F.col("total") - F.col("o_totalprice")) > 1e-6)
    ).count()
    assert bad == 0


def test_argmax_agrees_with_window(spark, sf_smoke):
    from pyspark.sql import Window as W

    o = load_table(spark, sf_smoke, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc())
    expect = {
        r.o_orderpriority: r.o_orderkey
        for r in o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1).collect()
    }
    got = {r.o_orderpriority: r.top_order
           for r in QUERIES["agg_argmax"](spark, sf_smoke).collect()}
    assert got == expect


def test_mad_outliers_match_pandas(spark, sf_smoke):
    rows = {r.event_type: r
            for r in QUERIES["ts_anomaly_mad"](spark, sf_smoke).collect()}
    pdf = (load_table(spark, sf_smoke, "events")
           .select("event_type", "value").toPandas())
    for et, g in pdf.groupby("event_type"):
        med = round(g["value"].quantile(0.5, interpolation="linear"), 6)
        ad = (g["value"] - med).abs()
        mad = round(ad.quantile(0.5, interpolation="linear"), 6)
        r = rows[et]
        assert r.n == len(g)
        assert abs(r.med - med) < 1e-9
        assert abs(r.mad - mad) < 1e-9
        assert r.n_outliers == int((ad > 3 * mad).sum())


def test_incremental_dedup_consistency(spark, sf_smoke):
    """Survivors carry hashes absent from the corpus side, are unique
    per hash, and cover every batch-only hash exactly once."""
    surv = QUERIES["llm_dedup_incremental"](spark, sf_smoke).cache()
    d = load_table(spark, sf_smoke, "documents")
    h = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    corpus_th = {r.th for r in d.where(F.col("doc_id") % 5 != 4)
                 .select(h.alias("th")).distinct().collect()}
    batch_th = {r.th for r in d.where(F.col("doc_id") % 5 == 4)
                .select(h.alias("th")).distinct().collect()}
    got_th = [r.th for r in surv.collect()]
    assert len(got_th) == len(set(got_th))
    assert set(got_th) == batch_th - corpus_th
    surv.unpersist()


def test_ngram_novelty_totals(spark, sf_smoke):
    df = QUERIES["llm_ngram_novelty"](spark, sf_smoke)
    bad = df.where(F.col("n_novel") > F.col("n_bigrams")).count()
    assert bad == 0
    d = load_table(spark, sf_smoke, "documents")
    ws = F.split("text", " ")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 1),
        F.slice(ws, 2, F.size(ws) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    singletons = (
        d.select(F.explode(bigrams).alias("bg"))
        .groupBy("bg").count().where(F.col("count") == 1).count()
    )
    total_novel = df.agg(F.sum("n_novel")).collect()[0][0]
    assert total_novel == singletons


def test_partitioned_sink_layout(spark, sf_smoke):
    df = QUERIES["sink_parquet_partitioned"](spark, sf_smoke)
    n = (load_table(spark, sf_smoke, "events")
         .where(F.col("event_type").isin("purchase", "signup")).count())
    assert df.count() == n
    assert {r.event_type for r in
            df.select("event_type").distinct().collect()} == {
                "purchase", "signup"}


def test_merge_semantics(spark, sf_smoke):
    """Delete/update/insert/carry-over classes must land exactly."""
    merged = {r.k: r for r in
              QUERIES["merge_into_upsert"](spark, sf_smoke).collect()}
    base = {r.c_custkey: r
            for r in load_table(spark, sf_smoke, "customer").collect()}
    for k, b in base.items():
        if k % 10 == 0 and k % 7 == 0:
            assert k not in merged  # deleted
        elif k % 10 == 0:
            assert abs(merged[k].balance - (b.c_acctbal + 100.0)) < 1e-9
        else:
            assert merged[k].balance == b.c_acctbal
    for k, b in base.items():
        if k % 25 == 0:
            ins = merged[k + 500000]
            assert ins.balance == 0.0
            assert ins.name == f"new-{b.c_name}"
    assert len(merged) == (
        len(base)
        - sum(1 for k in base if k % 10 == 0 and k % 7 == 0)
        + sum(1 for k in base if k % 25 == 0)
    )


def test_dsir_resample_rule(spark, sf_smoke):
    """Kept set is exactly the weights rows passing the deterministic
    hash-Bernoulli rule."""
    import math

    from db_realtime_changefeed_spark.queries.llm_pipeline import llm_dsir_weights

    kept = {r.doc_id for r in
            QUERIES["llm_dsir_resample"](spark, sf_smoke).collect()}
    weights = llm_dsir_weights(spark, sf_smoke).collect()
    assert 0 < len(kept) < len(weights)
    import hashlib

    for r in weights:
        u = int(hashlib.md5(str(r.doc_id).encode())
                .hexdigest()[:6], 16) / 16777216.0
        p = min(math.exp(2.0 * (r.dsir_lr - 0.5)), 1.0)
        assert (r.doc_id in kept) == (u < p)


def test_stream_semi_no_duplicates(spark, sf_smoke):
    """Semi join emits each attributed purchase exactly once, and the
    attributed set equals the distinct purchases of the inner join."""
    semi = QUERIES["join_stream_stream_semi"](spark, sf_smoke).cache()
    assert semi.count() == semi.select("purchase_id").distinct().count()
    inner_ids = {
        r.purchase_id for r in
        QUERIES["join_stream_stream"](spark, sf_smoke)
        .select("purchase_id").distinct().collect()
    }
    assert {r.purchase_id for r in semi.collect()} == inner_ids
    semi.unpersist()


def test_not_in_collapses_on_null(spark, sf_smoke):
    rows = {r.variant: r.n for r in
            QUERIES["subquery_null_semantics"](spark, sf_smoke).collect()}
    o = load_table(spark, sf_smoke, "orders")
    has_pending = o.where(F.col("o_orderstatus") == "P").count() > 0
    c = load_table(spark, sf_smoke, "customer")
    with_nonpending = (
        c.join(o.where(F.col("o_orderstatus") != "P"),
               o.o_custkey == c.c_custkey, "left_semi").count()
    )
    expect_ne = c.count() - with_nonpending
    assert rows["not_exists"] == expect_ne
    if has_pending:
        assert rows["not_in"] == 0  # three-valued logic collapse
    else:
        assert rows["not_in"] == expect_ne


def test_pivot_syntax_matches_dataframe_pivot(spark, sf_smoke):
    got = QUERIES["sql_pivot_syntax"](spark, sf_smoke)
    ev = load_table(spark, sf_smoke, "events")
    df = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"))
    )
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0


def test_knn_join_topk_per_query(spark, sf_smoke):
    """Every query gets at most 5 neighbours, none is the query
    itself, and each list is ordered by descending cosine."""
    rows = QUERIES["llm_knn_join"](spark, sf_smoke).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
        assert r.vec_id % 50 != 0
        assert r.qid % 50 == 0
    for qid, lst in by_q.items():
        assert len(lst) <= 5
        sims = [r.cos_sim for r in lst]
        assert sims == sorted(sims, reverse=True)


def test_language_confusion_totals(spark, sf_smoke):
    rows = QUERIES["llm_language_confusion"](spark, sf_smoke).collect()
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    assert all(r.n > 0 for r in rows)


def test_dq_audit_clean_fixture(spark, sf_smoke):
    rows = {r.rule: r.n_bad for r in
            QUERIES["dq_audit"](spark, sf_smoke).collect()}
    assert len(rows) == 6
    assert all(v == 0 for v in rows.values()), rows


def test_compacted_log_matches_live_state(spark, sf_smoke):
    """The compacted row per key equals the final live aggregate and
    carries the highest batch id."""
    comp = {r.event_type: r for r in
            QUERIES["changefeed_log_compacted"](spark, sf_smoke).collect()}
    live = {r.event_type: r for r in
            QUERIES["changefeed_core"](spark, sf_smoke).collect()}
    full_log = QUERIES["changefeed_log"](spark, sf_smoke).collect()
    max_batch: dict[str, int] = {}
    for r in full_log:
        max_batch[r.event_type] = max(
            max_batch.get(r.event_type, -1), r.batch_id)
    for et, r in comp.items():
        assert r.batch_id == max_batch[et]
        assert r.new_count == live[et].cnt
    assert set(comp) == set(live)


def test_resumed_sink_no_loss_no_dup(spark, sf_smoke):
    df = QUERIES["sink_parquet_resumed"](spark, sf_smoke)
    n = load_table(spark, sf_smoke, "events").count()
    assert df.count() == n
    assert df.select("event_id").distinct().count() == n


def test_permissive_quarantines_exactly_injected(spark, sf_smoke):
    from db_realtime_changefeed_spark.queries.scans import (
        _N_CORRUPT_LINES,
    )

    rows = {r.klass: r for r in
            QUERIES["source_csv_permissive"](spark, sf_smoke).collect()}
    assert rows["corrupt"].n == _N_CORRUPT_LINES
    assert rows["corrupt"].sum_value is None
    assert rows["good"].n == load_table(spark, sf_smoke, "events").count()


def test_filter_gate_matches_components(spark, sf_smoke):
    """The fused gate must agree with the three standalone component
    queries joined row by row."""
    gate = {r.doc_id: r for r in
            QUERIES["llm_filter_gate"](spark, sf_smoke).collect()}
    q = {r.doc_id: r.quality for r in
         QUERIES["llm_quality_score"](spark, sf_smoke).collect()}
    rep = {r.doc_id: r.flagged for r in
           QUERIES["llm_repetition_filter"](spark, sf_smoke).collect()}
    lid = {r.doc_id: r.pred_lang for r in
           QUERIES["llm_lang_id"](spark, sf_smoke).collect()}
    for doc_id, g in gate.items():
        keep = q[doc_id] >= 0.5 and not rep[doc_id] and lid[doc_id] != "und"
        assert g.keep == keep
        if keep:
            assert g.reason is None
        elif q[doc_id] < 0.5:
            assert g.reason == "low_quality"
        elif rep[doc_id]:
            assert g.reason == "repetitive"
        else:
            assert g.reason == "unknown_lang"


def test_minhash_error_within_theory(spark, sf_smoke):
    """Mean estimator error of a k=32 sketch should sit well inside
    a few theoretical standard errors (~0.09 at J=0.5)."""
    r = QUERIES["llm_minhash_error_eval"](spark, sf_smoke).collect()[0]
    assert r.n_pairs > 0
    assert 0.0 <= r.mean_abs_err <= 0.25
    assert r.max_abs_err <= 1.0
    assert 0.0 <= r.mean_est <= 1.0


def test_chargram_langid_structure(spark, sf_smoke):
    """Every doc gets exactly one verdict with at least one profile
    hit, and accuracy clears the 1-in-5 chance floor (the synthetic
    corpus shares one vocabulary across languages — see
    llm_lang_id's docstring — so high accuracy is not expected)."""
    rows = QUERIES["llm_lang_id_chargram"](spark, sf_smoke).collect()
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert len(rows) == n_docs
    langs = {"en", "es", "de", "fr", "zh"}
    assert all(r.pred_lang in langs and r.n_hits >= 1 for r in rows)
    acc = sum(1 for r in rows if r.pred_lang == r.true_lang) / len(rows)
    assert acc > 0.2, f"chargram accuracy {acc:.2f} below chance"


def test_seasonal_naive_eval_day_count(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    n_days = ev.select(F.col("ts").cast("date")).distinct().count()
    r = QUERIES["ts_seasonal_naive_eval"](spark, sf_smoke).collect()[0]
    assert r.n_days == n_days - 7
    assert 0.0 <= r.mae <= r.max_abs_err


def test_resolved_front_is_monotone_and_complete(spark, sf_smoke):
    """Resolved timestamps never regress, every event is below the
    final front, and batch row counts sum to the table."""
    rows = sorted(
        QUERIES["changefeed_resolved"](spark, sf_smoke).collect(),
        key=lambda r: r.batch_id,
    )
    fronts = [r.resolved_ts for r in rows]
    assert fronts == sorted(fronts)
    ev = load_table(spark, sf_smoke, "events")
    assert sum(r.n_rows for r in rows) == ev.count()
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    assert fronts[-1] == max_ts


def test_stream_scd2_matches_batch_and_chunking_invariant(
        spark, sf_smoke, monkeypatch):
    """The incrementally maintained dimension equals the batch build
    row for row, under BOTH the default chunking and a different
    micro-batch count (boundaries must leak nothing)."""
    batch = QUERIES["scd2_build"](spark, sf_smoke)

    def canon(df):
        return sorted(
            (r.user_id, r.version, r.attr, r.valid_from, r.valid_to,
             r.is_current)
            for r in df.collect()
        )

    expected = canon(batch)
    assert canon(
        QUERIES["stream_scd2_maintain"](spark, sf_smoke)) == expected
    monkeypatch.setenv("SPARK_GRAFT_STREAM_CHUNKS", "7")
    assert canon(
        QUERIES["stream_scd2_maintain"](spark, sf_smoke)) == expected


def test_stream_scd2_no_driver_side_open_rows():
    """VERDICT r5: the maintained dimension's open-version state must
    never materialize on the driver — no collect() of rows, no
    createDataFrame re-ship of carried state. The only driver-bound
    data is the touched-bucket id list inside
    BucketedMvccState.touched_buckets (O(B) small ints). Guard the
    function source so a regression to the round-5 carried-dict shape
    fails loudly."""
    import inspect

    from db_realtime_changefeed_spark.streaming.queries import (
        stream_scd2_maintain,
    )

    src = inspect.getsource(stream_scd2_maintain)
    assert ".collect()" not in src
    assert "BucketedMvccState" in src


def test_attrition_monotone_and_consistent(spark, sf_smoke):
    """Stage survivors never increase, input equals the corpus, and
    the final stage matches llm_pipeline_end_to_end's doc total."""
    rows = sorted(
        QUERIES["llm_pipeline_attrition"](spark, sf_smoke).collect(),
        key=lambda r: r.stage_idx,
    )
    counts = [r.n_surviving for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] == load_table(spark, sf_smoke, "documents").count()
    final_docs = sum(
        r.n_docs for r in
        QUERIES["llm_pipeline_end_to_end"](spark, sf_smoke).collect())
    assert counts[-1] == final_docs
