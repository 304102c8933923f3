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
    # two HashAggregate nodes (partial + final) around one exchange;
    # (WholeStageCodegen markers are hidden under AQE's unfinalized
    # formatted plan, so codegen is not assertable here)
    assert plan.count("HashAggregate") >= 2
    # exactly one Exchange in the plan tree (the details section
    # repeats the node name once more)
    assert plan.count("+- Exchange") == 1, "exactly one shuffle of 6 groups"


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
