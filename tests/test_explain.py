"""Physical-plan assertions (SURVEY §4): the optimizations we rely on
must actually appear in the plan — pushdown, pruning, broadcast,
whole-stage codegen, top-k without global sort. A correctness-green
query with the wrong plan is a 100 TB failure waiting."""

from __future__ import annotations

from db_realtime_changefeed_spark.queries import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_scan_pruned_pushdown(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "scan_pruned")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan or "l_shipdate" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], "shipdate predicate not pushed to parquet"
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema, "column pruning failed"
    assert "l_quantity" in read_schema


def test_broadcast_join_plan(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dim join should not shuffle-sort"


def test_topk_no_global_sort(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "topk_limit")
    assert "TakeOrderedAndProject" in plan, "top-k should avoid a global sort"


def test_agg_partial_mapside(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "agg_groupby")
    # two HashAggregate nodes (partial + final) around the agg
    # exchange; (WholeStageCodegen markers are hidden under AQE's
    # unfinalized formatted plan, so codegen is not assertable here)
    assert plan.count("HashAggregate") >= 2
    # r13: TWO exchanges — the deterministic hash fan-out of the
    # under-split scan (REPARTITION_BY_NUM on pmod(xxhash64(pk)))
    # plus the 6-group agg shuffle; the partial aggregate must sit
    # ABOVE the fan-out exchange so it runs on every core
    assert plan.count("+- Exchange") == 2, \
        "fan-out exchange + one shuffle of 6 groups"
    assert "REPARTITION_BY_NUM" in plan and "xxhash64" in plan, \
        "fan-out must be the deterministic hash repartition"
    # the details section lists operators bottom-up, so the fan-out
    # (inner, REPARTITION_BY_NUM) must come BEFORE the agg exchange
    # (outer, ENSURE_REQUIREMENTS) — i.e. the partial aggregate sits
    # above the fan-out and runs on every core
    fan = plan.index("REPARTITION_BY_NUM")
    assert "ENSURE_REQUIREMENTS" in plan[fan:], \
        "agg exchange must sit above the fan-out exchange"


def test_semi_anti_join_plans(spark, sf_oracle):
    assert "LeftSemi" in _plan(spark, sf_oracle, "join_semi")
    assert "LeftAnti" in _plan(spark, sf_oracle, "join_anti")


def test_window_topk_group_limit(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "win_topk_per_group")
    # Spark 3.5+/4.x pushes rn<=k into the shuffle as a group limit
    assert "WindowGroupLimit" in plan, "per-group top-k not pushed down"


def test_knn_broadcasts_query_vector(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "llm_similarity_knn")
    assert "Broadcast" in plan, "1-row query side must broadcast"
    assert "TakeOrderedAndProject" in plan


def test_union_no_shuffle(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "set_union_all")
    assert "Exchange" not in plan, "UNION ALL must not shuffle"


def test_tpch_q6_full_pushdown(spark, sf_oracle):
    """All four Q6 predicates must reach the parquet scan, and only
    the four needed columns may be read."""
    plan = _plan(spark, sf_oracle, "tpch_q6")
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} predicate not pushed"
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema, "column pruning failed"


def test_tpch_star_joins_broadcast(spark, sf_oracle):
    """Dim sides of the star joins must broadcast — the fact table
    may shuffle at most once per fact-fact join."""
    for name, max_smj in (("tpch_q3", 1), ("tpch_q5", 1), ("tpch_q10", 1)):
        plan = _plan(spark, sf_oracle, name)
        assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join"
        assert plan.count("SortMergeJoin") <= max_smj, (
            f"{name}: dims are shuffling"
        )


def test_dedup_latest_group_limit(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "dedup_latest")
    assert "WindowGroupLimit" in plan, "rn=1 not pushed as group limit"


def test_sample_hash_filter_pushed(spark, sf_oracle):
    """The md5-bucket sample must run as a scan-time filter (no
    shuffle, no extra stage)."""
    plan = _plan(spark, sf_oracle, "sample_hash")
    assert "Exchange" not in plan, "sampling must not shuffle"


def test_agg_stats_single_shuffle(spark, sf_oracle):
    """All six moments ride ONE hash aggregate (partial + final
    around one agg exchange); r13 adds the deterministic fan-out
    exchange below the partial aggregate (the under-split scan
    spread, same shape as agg_groupby)."""
    plan = _plan(spark, sf_oracle, "agg_stats")
    assert plan.count("+- Exchange") == 2, \
        "fan-out exchange + one agg shuffle"
    assert "REPARTITION_BY_NUM" in plan, \
        "fan-out must be the deterministic hash repartition"
    fan = plan.index("REPARTITION_BY_NUM")
    assert "ENSURE_REQUIREMENTS" in plan[fan:], \
        "agg exchange must sit above the fan-out exchange"
    assert plan.count("HashAggregate") >= 2


def test_join_bucketed_no_exchange(spark, sf_oracle):
    """Co-bucketed fact⋈fact must sort-merge with ZERO exchanges on
    the join inputs (the only shuffle is the final aggregate)."""
    plan = _plan(spark, sf_oracle, "join_bucketed")
    assert "SortMergeJoin" in plan
    # exactly one Exchange node in the whole tree: the post-join
    # aggregate. Any second one means a join input shuffled.
    assert plan.count("Exchange (") == 1, "bucketed join inputs shuffled"


def test_partition_pruning(spark, sf_oracle):
    """The date predicate must become PartitionFilters on the
    partitioned layout (only in-range directories are read)."""
    plan = _plan(spark, sf_oracle, "scan_partition_pruned")
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "event_date" in pf, "date predicate not applied at partition level"


def test_tpch_r2_plan_shapes(spark, sf_oracle):
    """Round-2 TPC-H adaptations must keep the intended shapes:
    semi joins stay semi, dims broadcast, the OR-of-ANDs query
    broadcasts part and reads no extra columns."""
    assert "LeftSemi" in _plan(spark, sf_oracle, "tpch_q4")
    q13 = _plan(spark, sf_oracle, "tpch_q13")
    assert "LeftOuter" in q13
    q18 = _plan(spark, sf_oracle, "tpch_q18")
    assert "LeftSemi" in q18 and "Broadcast" in q18
    q19 = _plan(spark, sf_oracle, "tpch_q19")
    assert "BroadcastHashJoin" in q19
    assert "SortMergeJoin" not in q19
    read_schema = q19.split("ReadSchema:")[1].splitlines()[0]
    assert "l_shipdate" not in read_schema, "q19 reads unused columns"
    q22 = _plan(spark, sf_oracle, "tpch_q22")
    assert "LeftAnti" in q22 and "Broadcast" in q22


def test_contamination_benchmark_broadcasts(spark, sf_oracle):
    """The benchmark n-gram set must broadcast — the corpus side may
    never shuffle for the membership join."""
    plan = _plan(spark, sf_oracle, "llm_contamination")
    assert "BroadcastHashJoin" in plan, "benchmark set must broadcast"


def test_stratified_sample_no_shuffle(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "llm_sample_stratified")
    assert "Exchange" not in plan, "stratified sampling must not shuffle"


def test_salted_join_spreads_skew(spark, sf_oracle):
    """The salted join must actually shuffle (no broadcast — that
    would hide the skew it mitigates) and join on (key, salt)."""
    plan = _plan(spark, sf_oracle, "join_skew_salted")
    assert "BroadcastHashJoin" not in plan, "salting demo must shuffle"
    assert "salt" in plan


def test_banded_jaccard_composite_shuffle_key(spark, sf_oracle):
    """The Jaccard verify stage must join on (lang, n_chars-bucket),
    never on lang alone — a lang-only equi key (5 distinct values)
    degenerates to per-language all-pairs at scale."""
    plan = _plan(spark, sf_oracle, "llm_dedup_ngram_jaccard")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the equi-join keys must include the bucket column next to lang
    key_lines = [ln for ln in plan.splitlines() if "keys [" in ln]
    assert key_lines, "no hash-join key lines in plan"
    assert any("lang" in ln and "bk" in ln for ln in key_lines), (
        f"bucket not in join keys: {key_lines}"
    )


def test_neardup_lsh_composite_shuffle_key(spark, sf_oracle):
    """Banded-LSH near-dup joins on (label, band, band-hash) — the
    non-degenerate key that replaces the label-only block."""
    plan = _plan(spark, sf_oracle, "llm_neardup_embedding_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    key_lines = [ln for ln in plan.splitlines() if "keys [" in ln]
    assert any(
        "label" in ln and "band" in ln and "bh" in ln for ln in key_lines
    ), f"band hash not in join keys: {key_lines}"


def test_tfidf_group_limit_and_vocab_join(spark, sf_oracle):
    """TF-IDF: per-doc top-3 must use the window group-limit pushdown,
    and the corpus-size side must be broadcast."""
    plan = _plan(spark, sf_oracle, "llm_tfidf")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_repetition_filter_is_shuffle_free(spark, sf_oracle):
    """The repetition quality gate is a pure map stage: higher-order
    functions on the scan, zero exchanges."""
    plan = _plan(spark, sf_oracle, "llm_repetition_filter")
    assert "+- Exchange" not in plan, "repetition filter must not shuffle"


def test_knn_quantized_topk_no_global_sort(spark, sf_oracle):
    """Both stages of quantized KNN take top-k via TakeOrdered (heap),
    never a global sort."""
    plan = _plan(spark, sf_oracle, "llm_knn_quantized")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_join_interval_composite_shuffle_key(spark, sf_oracle):
    """join_interval must equi-join on (user_id, epoch), never on
    user_id alone — a power-law user would otherwise make the join
    quadratic in their event count."""
    plan = _plan(spark, sf_oracle, "join_interval")
    key_lines = [ln for ln in plan.splitlines() if "keys [" in ln]
    assert any("user_id" in ln and "bk" in ln for ln in key_lines), (
        f"epoch bucket not in join keys: {key_lines}"
    )


def test_tpch_r4_plan_shapes(spark, sf_oracle):
    """Round-4 TPC-H completions (q2/q9/q11/q16/q20/q21) must keep
    the intended shapes: all dims broadcast, correlations stay
    semi/anti, and no accidental cartesian products anywhere."""
    q2 = _plan(spark, sf_oracle, "tpch_q2")
    assert "BroadcastHashJoin" in q2
    assert "CartesianProduct" not in q2
    q9 = _plan(spark, sf_oracle, "tpch_q9")
    assert "BroadcastHashJoin" in q9
    assert q9.count("HashAggregate") >= 2, "q9 needs map-side partials"
    q11 = _plan(spark, sf_oracle, "tpch_q11")
    # the scalar threshold joins back as a broadcast of ONE row
    assert "BroadcastNestedLoopJoin" in q11 or "BroadcastHashJoin" in q11
    assert "CartesianProduct" not in q11
    q16 = _plan(spark, sf_oracle, "tpch_q16")
    assert "LeftAnti" in q16 and "Broadcast" in q16
    q20 = _plan(spark, sf_oracle, "tpch_q20")
    assert "LeftSemi" in q20 and "Broadcast" in q20
    q21 = _plan(spark, sf_oracle, "tpch_q21")
    assert "LeftSemi" in q21 and "LeftAnti" in q21
    assert "CartesianProduct" not in q21


def test_join_dpp_dynamic_pruning(spark, sf_oracle):
    """join_dpp's fact scan must carry a dynamicpruningexpression in
    its PartitionFilters — the dim filter reaches the fact scan at
    runtime, so only surviving dates' directories are opened. The
    executedPlan is used because formatted explain under AQE hides
    the pruning subquery until finalization."""
    from db_realtime_changefeed_spark.queries import all_queries

    df = all_queries()["join_dpp"](spark, sf_oracle)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "DPP did not fire"


def test_perplexity_buckets_no_global_ntile(spark, sf_oracle):
    """VERDICT r6 item 2: llm_perplexity_buckets' tier cut must not
    run a corpus-wide single-partition window. The per-doc rank is
    two-level (band histogram offsets + row_number PARTITIONED BY
    band); the only unpartitioned windows left fold the tiny band
    histogram. Pin: no ntile anywhere, and every row_number window
    spec carries the band partition key."""
    plan = _plan(spark, sf_oracle, "llm_perplexity_buckets")
    assert "ntile" not in plan.lower(), "global ntile regressed"
    for ln in plan.splitlines():
        if "row_number()" in ln:
            assert "windowspecdefinition(band#" in ln, ln


def test_pagerank_edge_build_broadcasts_dims(spark, sf_oracle):
    """graph_pagerank's corpus-scale stage is the edge build: the
    lineitem-orders join may shuffle, but customer/supplier/nation
    ride broadcasts and nothing is a cartesian product."""
    plan = _plan(spark, sf_oracle, "graph_pagerank")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bitmap_distinct_two_stage(spark, sf_oracle):
    """agg_bitmap_distinct must keep the two-aggregate shape: the
    bitmap build (group, bucket) then the popcount rollup."""
    plan = _plan(spark, sf_oracle, "agg_bitmap_distinct")
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan


def test_asof_tolerance_single_shuffle(spark, sf_oracle):
    """The tolerance variant must not add a join: same single
    user_id exchange + window as join_asof."""
    plan = _plan(spark, sf_oracle, "join_asof_tolerance")
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, (
        "tolerance should be projection arithmetic, not a join"
    )
    assert plan.count("+- Exchange") <= 1


def test_running_distinct_one_shuffle(spark, sf_oracle):
    """Both windows share the user_id partitioning → exactly one
    hash exchange in the plan."""
    plan = _plan(spark, sf_oracle, "win_running_distinct")
    assert plan.count("+- Exchange") == 1


def test_funnel_single_scan(spark, sf_oracle):
    """funnel_conversion must keep the single-pass shape: one events
    scan, no joins, at most 3 exchanges (user_id + the distinct-user
    rollup) — the prior 3-scan/8-shuffle form is banned."""
    plan = _plan(spark, sf_oracle, "funnel_conversion")
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("+- Exchange") <= 3
    # formatted explain names each node twice (tree + details):
    # one scan = 2 mentions; the old 3-scan form showed 6
    assert plan.count("Scan parquet") <= 2, "events must be scanned once"


def test_cohort_single_scan_two_exchanges(spark, sf_oracle):
    """cohort_retention: window first-seen over one user_id exchange
    (no groupBy+self-join), distinct reuses it (subset rule), small
    rollup second — one scan, exactly two exchanges."""
    plan = _plan(spark, sf_oracle, "cohort_retention")
    assert "Join" not in plan, "cohort must not self-join"
    assert plan.count("+- Exchange") == 2
    assert plan.count("Scan parquet") <= 2


def test_knn_join_broadcasts_queries(spark, sf_oracle):
    """The multi-query ANN join must broadcast the query side (tiny)
    and never degrade to a nested loop."""
    plan = _plan(spark, sf_oracle, "llm_knn_join")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_merge_upsert_single_key_joins(spark, sf_oracle):
    """MERGE resolves with equi-joins only — no cartesian, no nested
    loop — and both delta slices push their modular filters to the
    scan."""
    plan = _plan(spark, sf_oracle, "merge_into_upsert")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters" in plan


def test_dq_audit_scan_budget(spark, sf_oracle):
    """The audit reads each table once: 4 tables + 2 join-probe
    sides = at most 6 scan nodes (formatted plans list each node
    twice — tree + details — hence the ×2; the naive
    rule-per-subquery form had 9 scan nodes)."""
    plan = _plan(spark, sf_oracle, "dq_audit")
    n_scans = plan.split("== Physical Plan ==")[-1].count("Scan parquet")
    assert n_scans <= 12, f"{n_scans // 2} scans — audit re-reading tables"


def test_filter_gate_single_scan_no_shuffle(spark, sf_oracle):
    """The fused gate is map-only: one documents scan node (×2 in
    the formatted listing), zero exchanges."""
    plan = _plan(spark, sf_oracle, "llm_filter_gate")
    body = plan.split("== Physical Plan ==")[-1]
    assert body.count("Scan parquet") <= 2
    assert "Exchange" not in body


def test_geo_nearest_heap_topk(spark, sf_oracle):
    plan = _plan(spark, sf_oracle, "geo_nearest")
    assert "TakeOrderedAndProject" in plan, "nearest-k must heap, not sort"


# ------------------------------------------------------- round-8 shapes

def test_ks_test_single_scan_and_top1(spark, sf_oracle):
    """dq_ks_test / dq_mann_whitney: ONE corpus scan (the first cut's
    banded-offset branches re-executed the scan three times — the
    same plan-audit disease as chi-square's join-backs), windows only
    over the domain-bounded per-value relation, and KS's sup-gap is a
    TakeOrdered, never a global sort materialization."""
    plan = _plan(spark, sf_oracle, "dq_ks_test")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Scan parquet  (") == 1
    plan_mw = _plan(spark, sf_oracle, "dq_mann_whitney")
    assert plan_mw.count("Scan parquet  (") == 1
    assert "Join" not in plan_mw


def test_welch_single_aggregate(spark, sf_oracle):
    """dq_ttest_welch reduces to one partial+final aggregate pair over
    one scan — no join, no window, no second exchange."""
    plan = _plan(spark, sf_oracle, "dq_ttest_welch")
    # tree form "Exchange (n)" — the detail section repeats each node
    assert plan.count("Exchange (") <= 1, "more than the single-agg exchange"
    assert "Window" not in plan
    assert "Join" not in plan


def test_chi_square_single_scan(spark, sf_oracle):
    """dq_chi_square / agg_mutual_info: marginals, totals and the
    statistic are WINDOW sums over the bounded cell relation — the
    join-back form re-executed the corpus scan once per marginal
    (plan audit r8: 16-18 exchanges, 4 scans). One scan, no join."""
    for name in ("dq_chi_square", "agg_mutual_info"):
        plan = _plan(spark, sf_oracle, name)
        assert plan.count("Scan parquet  (") == 1, name
        assert "Join" not in plan, name
        assert plan.count("Exchange (") <= 2, name


def test_holt_partitions_by_series(spark, sf_oracle):
    """ts_holt_linear: the recurrence runs inside FlatMapGroupsInPandas
    partitioned by the series key — never a global collect."""
    plan = _plan(spark, sf_oracle, "ts_holt_linear")
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning(event_type" in plan


def test_hard_negatives_broadcast_anchors(spark, sf_oracle):
    """llm_hard_negatives: the anchor set broadcasts; the corpus never
    shuffles for candidate generation."""
    plan = _plan(spark, sf_oracle, "llm_hard_negatives")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_datasheet_single_expand_pass(spark, sf_oracle):
    """llm_doc_datasheet: ROLLUP = one Expand + one partial-aggregated
    shuffle, not three scans of documents."""
    plan = _plan(spark, sf_oracle, "llm_doc_datasheet")
    assert "Expand" in plan
    # tree form — documents feeds the Expand once + once for the total
    assert plan.count("Scan parquet  (") <= 2


def test_round9_knn_group_limits_and_fanout(spark, sf_oracle):
    """The three round-9 ranked-retrieval queries must keep their
    plan shapes: per-query top-k pushed into the shuffle
    (WindowGroupLimit), and the simhash posting join must NOT
    re-execute the fingerprint subtree per band arm (the naive form
    read 40 exchanges; the posting-carried form stays in single
    digits)."""
    for name in ("llm_jaccard_knn_text", "llm_simhash_hamming_knn"):
        plan = _plan(spark, sf_oracle, name)
        assert "WindowGroupLimit" in plan, name
    sim = _plan(spark, sf_oracle, "llm_simhash_hamming_knn")
    assert sim.count("+- Exchange") <= 10, \
        "simhash posting join re-exploded the fingerprint subtree"


def test_round9_winner_cut_pushed(spark, sf_oracle):
    """Provenance-priority dedup's rn=1 winner cut must ride
    WindowGroupLimit (full per-group rankings never materialize)."""
    plan = _plan(spark, sf_oracle, "llm_cross_dedup_priority")
    assert "WindowGroupLimit" in plan


def test_round9_referential_integrity_joins(spark, sf_oracle):
    """Orphan detection is LEFT OUTER joins (one child pass per
    edge); dimension parents broadcast."""
    plan = _plan(spark, sf_oracle, "dq_referential_integrity")
    assert "LeftOuter" in plan
    assert "BroadcastHashJoin" in plan
    # one left join per edge, none of them duplicated by a separate
    # anti-join child scan (the pre-audit form had 28 exchanges)
    assert plan.count("+- Exchange") <= 22


def test_round9_theil_single_aggregate(spark, sf_oracle):
    """The inequality indices are ONE partial+final aggregate over
    orders — no window, no join, no second scan."""
    plan = _plan(spark, sf_oracle, "agg_theil_index")
    assert plan.count("+- Exchange") == 1
    assert "Window" not in plan
    # one physical scan: the node appears once in the tree and once
    # in the details section of the formatted plan
    assert plan.count("Scan parquet") <= 2


def test_round10_distinct_on_group_limit(spark, sf_oracle):
    """sql_distinct_on must plan as the rank-pushdown shape: a
    WindowGroupLimit keeps only per-key heads before the final
    window sort, and a single exchange moves them."""
    plan = _plan(spark, sf_oracle, "sql_distinct_on")
    assert "WindowGroupLimit" in plan
    assert plan.count("+- Exchange") == 1


def test_round10_single_scan_aggregates(spark, sf_oracle):
    """llm_c4_filters and llm_span_corruption are one-scan shapes:
    one pruned parquet read, map-side partial aggregation, ONE
    exchange carrying only the aggregate columns."""
    for name in ("llm_c4_filters", "llm_span_corruption"):
        plan = _plan(spark, sf_oracle, name)
        assert plan.count("Scan parquet") == 2, name  # tree + detail
        assert plan.count("+- Exchange") == 1, name
        assert plan.count("HashAggregate") >= 2, name
    # column pruning: only the referenced columns reach the scan
    plan = _plan(spark, sf_oracle, "llm_c4_filters")
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in rs and "source" in rs and "lang" not in rs


def test_round10_jaccard_reuses_persisted_pairs(spark, sf_oracle):
    """graph_jaccard_linkpred serves every consumer of the edge set
    from the SAME persisted relation as the rest of the graph
    family (InMemoryTableScans in the plan), broadcasts the degree
    sides, and takes the top-20 without a global sort."""
    plan = _plan(spark, sf_oracle, "graph_jaccard_linkpred")
    assert "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_round10_kcore_plan_is_flat_per_round(spark, sf_oracle):
    """The k-core output's plan must NOT contain the exponential
    iterative lineage: every round is a localCheckpoint (scanned as
    an ExistingRDD/LogicalRDD), so the final union is 9 flat RDD
    scans — no joins, no parquet re-reads."""
    plan = _plan(spark, sf_oracle, "graph_kcore")
    assert "Join" not in plan, "lineage not truncated"
    assert "Scan parquet" not in plan
    assert plan.count("Scan ExistingRDD") >= 9


def test_round10b_periodogram_broadcast_krange(spark, sf_oracle):
    """ts_periodogram fans each daily point out to the 10 harmonics
    via a BROADCAST cross join (never a shuffle), and the events
    scan reads only (ts, event_type) — the value column must be
    pruned since y is a count."""
    plan = _plan(spark, sf_oracle, "ts_periodogram")
    assert "BroadcastNestedLoopJoin" in plan
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "value" not in rs and "event_type" in rs


def test_round10b_clustering_coeff_shares_graph_cache(spark, sf_oracle):
    """graph_clustering_coeff rides the SAME persisted edge relation
    as graph_triangles/kcore/jaccard (InMemoryTableScan), broadcasts
    the degree sides, and cuts the top-25 distributed — no global
    sort. Runtime (tools/runtime_audit.py, 2026-08-16): 2 parquet
    scans executed, 13 cache reads, 15 exchanges."""
    plan = _plan(spark, sf_oracle, "graph_clustering_coeff")
    assert "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_round10b_pandas_recurrences_partition_by_series(spark, sf_oracle):
    """ts_dtw / ts_kalman_level are applyInPandas escapes: the plan
    must show FlatMapGroupsInPandas fed by a hash partitioning on
    the group key — parallel across groups, sequential only within.
    ts_dtw additionally tags pair sides via BROADCAST joins."""
    plan = _plan(spark, sf_oracle, "ts_kalman_level")
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning(event_type" in plan
    plan = _plan(spark, sf_oracle, "ts_dtw")
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning(ta" in plan
    assert "BroadcastHashJoin" in plan


def test_round10b_windows_never_global(spark, sf_oracle):
    """The wave-3 window consumers must all partition their windows:
    gaps-islands by the hit flag, hurst by (series, m, chunk), rouge
    pairing by lang, taxonomy ranking by doc_id. An empty window
    spec (single-partition sort of the whole input) is the 100 TB
    failure shape."""
    import re

    for name in ("dq_gaps_islands", "ts_hurst", "llm_rouge_ngram",
                 "llm_taxonomy_classify"):
        plan = _plan(spark, sf_oracle, name)
        for frag in re.findall(r"Arguments: \[[^\]]*windowspecdefinition\(([^,)]*)", plan):
            assert frag.strip(), f"{name}: global window"


def test_round10b_fd_audit_two_stage_distinct(spark, sf_oracle):
    """dq_fd_audit's count-distinct per determinant must expand to
    the two-stage partial aggregate (no single-point distinct), and
    every branch scan reads exactly its two columns."""
    plan = _plan(spark, sf_oracle, "dq_fd_audit")
    assert plan.count("HashAggregate") >= 10
    for rs in {s.splitlines()[0] for s in plan.split("ReadSchema:")[1:]}:
        assert rs.count(",") == 1, f"over-wide FD scan: {rs}"


def test_round10c_matrix_profile_broadcast_offsets(spark, sf_oracle):
    """ts_matrix_profile fans points to covering windows via a
    broadcast offset range and never reads the value column."""
    plan = _plan(spark, sf_oracle, "ts_matrix_profile")
    assert "BroadcastNestedLoopJoin" in plan
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "value" not in rs


def test_round10c_no_cartesian_joins(spark, sf_oracle):
    """ts_crosscorr's lag shift and seq_absence_detect's time window
    must plan as keyed joins (broadcast or shuffle on an equi key) —
    an unkeyed CartesianProduct is the 100 TB failure shape."""
    for name in ("ts_crosscorr", "seq_absence_detect"):
        plan = _plan(spark, sf_oracle, name)
        assert "CartesianProduct" not in plan, name


def test_round10c_dbscan_plan_is_flat(spark, sf_oracle):
    """geo_dbscan_grid's returned plan must be the flat checkpointed
    shape: dense cells and converged labels scan as ExistingRDDs —
    the iterative lineage never reaches the consumer (the measured
    round-10 planner-blowup lesson)."""
    plan = _plan(spark, sf_oracle, "geo_dbscan_grid")
    assert "Scan parquet" not in plan
    assert plan.count("Scan ExistingRDD") >= 2


def test_round10c_containment_df_cap_before_pairs(spark, sf_oracle):
    """llm_containment_dedup must aggregate posting lists (the
    df <= cap stop-shingle cut) BEFORE the pair join — the cap
    filter has to sit on an aggregate, not on the joined fan-out —
    and reads only (doc_id, text)."""
    plan = _plan(spark, sf_oracle, "llm_containment_dedup")
    assert "count(1)" in plan or "HashAggregate" in plan
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in rs and "source" not in rs and "text" in rs


def test_round10c_watermark_one_scan_one_exchange(spark, sf_oracle):
    """llm_watermark_detect is the one-scan shape: explode + partial
    aggregate map-side, ONE exchange on doc_id. Runtime audit
    (2026-08-16): 1 parquet scan, 1 exchange, 500 rows read."""
    plan = _plan(spark, sf_oracle, "llm_watermark_detect")
    assert plan.count("Scan parquet") == 2  # tree + detail section
    assert plan.count("+- Exchange") == 1
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in rs and "source" not in rs


def test_round10c_modularity_broadcasts_brands(spark, sf_oracle):
    """graph_modularity rides the persisted edge relation
    (InMemoryTableScan) and broadcasts the part-brand dim — the edge
    side must never broadcast. Runtime audit (2026-08-16): 4 cache
    reads, 128k rows scanned (2 lineitem + 4 tiny part reads)."""
    plan = _plan(spark, sf_oracle, "graph_modularity")
    assert "InMemoryTableScan" in plan
    assert "BroadcastHashJoin" in plan


def test_round10c_mann_kendall_pair_join_keyed(spark, sf_oracle):
    """ts_mann_kendall's sign-pair self-join must key on the series
    (equi on event_type with the idx inequality as a filter), never
    a CartesianProduct."""
    plan = _plan(spark, sf_oracle, "ts_mann_kendall")
    assert "CartesianProduct" not in plan


def test_round11_stomp_no_pair_join(spark, sf_oracle):
    """ts_matrix_profile_stomp is the O(n·w) long-series path: one
    FlatMapGroupsInPandas per series group, and NO pair join of any
    kind — the O(w²) shuffle the exact-decimal twin pays is exactly
    what STOMP removes."""
    plan = _plan(spark, sf_oracle, "ts_matrix_profile_stomp")
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning(event_type" in plan
    for join in ("SortMergeJoin", "BroadcastHashJoin",
                 "ShuffledHashJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin"):
        assert join not in plan, f"pair join leaked: {join}"


def test_round11_wave_plans(spark, sf_oracle):
    """LTTB rides the same kernel shape as STOMP (one
    FlatMapGroupsInPandas, no join); Dickey-Fuller is one scan, one
    per-series lag window, one moment aggregate — no join at all;
    frame-exclude's window is partitioned (never a global sort);
    hybrid RRF broadcasts the 1-row query vector (the only
    nested-loop join allowed) and the two 50-row rank lists."""
    import re

    plan = _plan(spark, sf_oracle, "ts_downsample_lttb")
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan and "HashJoin" not in plan

    plan = _plan(spark, sf_oracle, "ts_dickey_fuller")
    assert "Join" not in plan
    for frag in re.findall(
            r"windowspecdefinition\(([^,)]*)", plan):
        assert frag.strip(), "ts_dickey_fuller: global window"

    plan = _plan(spark, sf_oracle, "win_frame_exclude")
    for frag in re.findall(
            r"windowspecdefinition\(([^,)]*)", plan):
        assert frag.strip(), "win_frame_exclude: global window"

    plan = _plan(spark, sf_oracle, "llm_hybrid_rrf")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row query vector
    assert "CartesianProduct" not in plan


def test_round12_wave_plans(spark, sf_oracle):
    """Round-12 plan pins: qualify plans the rank predicate as
    WindowGroupLimit (the top-k never materializes full partitions);
    the GROUPS-frame and EXCLUDE emulations keep partitioned windows
    and exactly one exchange; the RA wedge join broadcasts the
    degree relation."""
    import re

    plan = _plan(spark, sf_oracle, "sql_qualify")
    assert "WindowGroupLimit" in plan

    for name in ("win_frame_groups", "win_frame_groups_exclude",
                 "win_frame_exclude_group", "win_frame_exclude_ties"):
        plan = _plan(spark, sf_oracle, name)
        # formatted mode prints each node once in the tree and once
        # in the detail section — count the detail headers
        n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
        assert n_ex == 1, f"{name}: {n_ex} exchanges"
        for frag in re.findall(
                r"windowspecdefinition\(([^,)]*)", plan):
            assert frag.strip(), f"{name}: global window"

    plan = _plan(spark, sf_oracle, "graph_resource_allocation")
    assert "BroadcastHashJoin" in plan  # degree dim broadcast
    assert "CartesianProduct" not in plan
