"""Round-7 third wave: TPC-H Q1, the Benford audit, the Gopher
quality gate, and the RethinkDB include_states / include_offsets feed
surfaces — behavior properties beyond the hash-parity sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table
from db_realtime_changefeed_spark.queries import all_queries

QUERIES = all_queries()


def test_tpch_q1_groups_and_counts(spark, sf_oracle):
    rows = QUERIES["tpch_q1"](spark, sf_oracle).collect()
    # 3 return flags x 2 line statuses in the fixture
    assert len(rows) <= 6 and len(rows) >= 1
    li = load_table(spark, sf_oracle, "lineitem")
    expected = li.where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    ).count()
    assert sum(r["count_order"] for r in rows) == expected
    for r in rows:
        # avg consistency: avg * count within decimal-cast tolerance
        assert abs(r["avg_qty"] * r["count_order"] - r["sum_qty"]) < 1e-3


def test_benford_frequencies_sum_to_one(spark, sf_oracle):
    rows = QUERIES["dq_benford"](spark, sf_oracle).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    assert abs(sum(r["observed"] for r in rows) - 1.0) < 1e-9
    n_orders = load_table(spark, sf_oracle, "orders").count()
    assert sum(r["n"] for r in rows) == n_orders
    for r in rows:
        assert 0.0 <= r["expected"] <= 0.3011
        assert r["abs_dev"] >= 0.0


def test_gopher_gate_binds_and_is_consistent(spark, sf_oracle):
    rows = QUERIES["llm_quality_gopher"](spark, sf_oracle).collect()
    keeps = sum(r["keep"] for r in rows)
    # the stopword rule drops a real fraction of this corpus; the
    # gate must be non-degenerate in both directions
    assert 0 < keeps < len(rows)
    for r in rows:
        assert 0.0 < r["top_bigram_frac"] <= 1.0
        assert len(r["top_bigram"].split(" ")) == 2
        if r["n_stop"] == 0:
            assert r["keep"] == 0
        if r["keep"] == 1:
            assert r["n_words"] >= 10
            assert 3.0 <= r["mean_word_len"] <= 10.0
            assert r["top_bigram_frac"] <= 0.2


def test_include_states_protocol_order(spark, sf_oracle):
    from db_realtime_changefeed_spark.queries.round7c import _BOOT_K
    from db_realtime_changefeed_spark.streaming.queries import _changefeed

    rows = QUERIES["changefeed_include_states"](spark, sf_oracle).collect()
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq"], []).append(r)
    # exactly one initializing and one ready marker, in phase order
    assert [r["event_type"] for r in by_seq[0]] == ["initializing"]
    assert [r["event_type"] for r in by_seq[2]] == ["ready"]
    # initial rows equal the MVCC snapshot at k
    snap = {
        r["event_type"]: (r["cnt"], r["sum_value"])
        for r in _changefeed(spark, sf_oracle).state_at(_BOOT_K).collect()
    }
    got = {r["event_type"]: (r["cnt"], r["sum_value"]) for r in by_seq[1]}
    assert got == snap
    # every change is strictly past the snapshot batch
    assert all(r["batch_id"] > _BOOT_K for r in by_seq[3])


def test_topk_offsets_are_true_positions(spark, sf_oracle):
    from db_realtime_changefeed_spark.streaming.view_queries import _runner

    rows = QUERIES["changefeed_topk_offsets"](spark, sf_oracle).collect()
    r = _runner(spark, sf_oracle)
    batches = sorted({row["batch_id"] for row in rows})
    assert batches
    for b in batches:
        cur = {u: i for i, (u, _v, _e) in enumerate(r._topk_at(b))}
        prev = {u: i for i, (u, _v, _e) in enumerate(r._topk_at(b - 1))} \
            if b > 0 else {}
        for row in (x for x in rows if x["batch_id"] == b):
            if row["change"] in ("enter", "update"):
                assert row["new_offset"] == cur[row["user_id"]]
            if row["change"] in ("leave", "update"):
                assert row["old_offset"] == prev[row["user_id"]]
            if row["change"] == "enter":
                assert row["old_offset"] is None
            if row["change"] == "leave":
                assert row["new_offset"] is None
            for off in (row["old_offset"], row["new_offset"]):
                if off is not None:
                    assert 0 <= off < r.k


def test_point_changes_matches_row_api(spark, sf_oracle):
    """The point feed's final new-image must equal RowRef.row() —
    the read-your-feed consistency a point subscriber assumes."""
    from db_realtime_changefeed_spark.api import Database

    rows = QUERIES["changefeed_point_changes"](spark, sf_oracle).collect()
    assert rows, "point feed emitted nothing"
    uid = rows[0]["user_id"]
    assert all(r["user_id"] == uid for r in rows)
    last = max(rows, key=lambda r: r["batch_id"])
    point = (
        Database(spark, sf_oracle).table("events").get(uid).row().collect()
    )
    assert len(point) == 1
    assert point[0]["event_id"] == last["new_event_id"]
    assert point[0]["value"] == last["new_value"]
    # chained old/new images: each batch's old is the previous new
    ordered = sorted(rows, key=lambda r: r["batch_id"])
    for prev, cur in zip(ordered, ordered[1:]):
        assert cur["old_event_id"] == prev["new_event_id"]
    assert ordered[0]["old_event_id"] is None


def test_gini_bounds_and_banded_windows(spark, sf_oracle):
    rows = QUERIES["agg_gini"](spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0
        assert r["sum_value"] > 0
    # scale pin: every row_number window must carry the band key —
    # no group-wide single-task sort (the perplexity_buckets rule)
    plan = QUERIES["agg_gini"](spark, sf_oracle)._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("formatted"))
    for ln in plan.splitlines():
        if "row_number()" in ln:
            assert "band#" in ln, ln


def test_attribution_accounts_every_purchase(spark, sf_oracle):
    rows = QUERIES["funnel_attribution"](spark, sf_oracle).collect()
    n_purch = (
        load_table(spark, sf_oracle, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_purchases"] for r in rows) == n_purch
    bands = {r["touch_band"] for r in rows}
    assert bands <= {"no_touch", "lt_1h", "lt_24h", "lt_7d", "expired"}
    assert "no_touch" in bands and "lt_24h" in bands


def test_rolling_median_is_frame_median(spark, sf_smoke):
    rows = (
        QUERIES["win_median_sliding"](spark, sf_smoke)
        .orderBy("user_id", "ts", "event_id").limit(200).collect()
    )
    assert rows
    e = (
        load_table(spark, sf_smoke, "events")
        .orderBy("user_id", "ts", "event_id")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    timeline = {}
    for r in e:
        timeline.setdefault(r["user_id"], []).append(r)
    idx = {
        (r["user_id"], r["event_id"]): i
        for u, lst in timeline.items()
        for i, r in enumerate(lst)
    }
    for r in rows:
        i = idx[(r["user_id"], r["event_id"])]
        assert i >= 6, "emitted before the frame filled"
        frame = sorted(
            x["value"] for x in timeline[r["user_id"]][i - 6: i + 1]
        )
        assert r["med7"] == frame[3]


def test_rolling_zscore_statistics(spark, sf_smoke):
    import math

    rows = (
        QUERIES["ts_zscore_rolling"](spark, sf_smoke)
        .limit(500).collect()
    )
    assert rows
    for r in rows:
        if r["std7"] is None:
            assert r["zscore"] is None
            continue
        assert r["std7"] > 0
        # z must reproduce from the emitted mean/std
        z = (r["value"] - r["mean7"]) / r["std7"]
        assert math.isclose(z, r["zscore"], rel_tol=1e-9, abs_tol=1e-9)
        # a point inside a 7-sample is bounded by sqrt(6) ~ 2.4495
        assert abs(r["zscore"]) <= 2.4495


def test_include_types_partition_the_log(spark, sf_oracle):
    rows = QUERIES["changefeed_include_types"](spark, sf_oracle).collect()
    types = {r["change_type"] for r in rows}
    assert types == {"add", "remove", "change"}
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], {})[r["change_type"]] = r["n"]
    # batch 0 bootstraps: adds only
    assert set(by_batch[0]) == {"add"}
    # later batches churn in all three directions on this fixture
    assert any(set(v) == {"add", "remove", "change"}
               for b, v in by_batch.items() if b > 0)
    # the typed counts partition the log row-for-row
    from db_realtime_changefeed_spark.streaming.queries import _CF_CACHE
    key = (id(spark), sf_oracle, "__upsert_del__")
    assert sum(r["n"] for r in rows) == _CF_CACHE[key].log().count()


def test_orders_support_reads_share_runner(spark, sf_oracle):
    """distinct/variance/minmax/agg on orders must serve from ONE
    cached runner (one CDC scan maintains the whole family)."""
    from db_realtime_changefeed_spark.streaming.generic_views import _CACHE

    d = QUERIES["changefeed_distinct_view_orders"](spark, sf_oracle).collect()
    v = QUERIES["changefeed_variance_view_orders"](spark, sf_oracle).collect()
    key = (id(spark), sf_oracle, "__orders_view__")
    assert key in _CACHE
    assert len(d) == len(v)
    nd = {(r["batch_id"], r["o_orderstatus"]): r for r in d}
    for r in v:
        twin = nd[(r["batch_id"], r["o_orderstatus"])]
        assert twin["n"] == r["n"]
        assert twin["nd_value"] <= r["n"]
        assert r["vark_pop6"] >= 0.0


def test_orders_topk_read_is_band_pruned(spark, sf_oracle):
    """The top-k read must touch only a suffix of descending value
    bands — widened just until it holds k rows — never the whole
    index (the views.py topk_view pruning contract, on the generic
    runner)."""
    from db_realtime_changefeed_spark.queries.round7c import _orders_runner

    QUERIES["changefeed_topk_view_orders"](spark, sf_oracle).collect()
    r = _orders_runner(spark, sf_oracle)
    last = max(r._batches)
    rows = r.topk_at(last)
    assert len(rows) == r.k
    # every returned value must beat everything in the unread bands:
    # reading one band fewer must still produce the same top members
    # or fewer rows (the widening loop's invariant)
    vals = [v for _k, v, _s in rows]
    assert vals == sorted(vals, reverse=True)
    top_band = r._index.n_buckets - 1
    lo = int(min(vals) // r._index.band_width)
    unread = r._index.df_at(last, buckets=list(range(0, max(0, lo))))
    if unread.count():
        assert unread.agg({"value": "max"}).collect()[0][0] <= min(vals)


def test_orders_runner_single_construction_site():
    """Every orders-view query must construct through
    generic_views.orders_runner — a second site building the runner
    without the range index would win the cache and break the top-k
    read (regression guard for the bug found in the closing sweep)."""
    import inspect

    from db_realtime_changefeed_spark.streaming import (
        generic_views, generic_views2)
    from db_realtime_changefeed_spark.queries import round7c

    hits = []
    for mod in (generic_views, generic_views2, round7c):
        src = inspect.getsource(mod)
        hits += [
            (mod.__name__, i)
            for i, ln in enumerate(src.splitlines())
            if "__orders_view__" in ln
        ]
    # exactly one reference: the cache key inside orders_runner
    assert len(hits) == 1, hits
    assert hits[0][0].endswith("generic_views")


def test_orders_quantiles_match_support_window(spark, sf_oracle):
    """The banded two-level read must equal the naive whole-group
    weighted-quantile extraction over the same support relation."""
    from pyspark.sql import Window

    from db_realtime_changefeed_spark.queries.round7c import _orders_runner

    rows = {
        (r["batch_id"], r["o_orderstatus"]): r
        for r in QUERIES["changefeed_quantile_view_orders"](
            spark, sf_oracle).collect()
    }
    r = _orders_runner(spark, sf_oracle)
    for b in r._batches:
        sup = r._support.df_at(b)
        w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice") \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        c = sup.select(
            "o_orderstatus", F.col("o_totalprice").alias("value"),
            F.sum("cnt").over(w).alias("cumw"),
            F.sum("cnt").over(
                Window.partitionBy("o_orderstatus")).alias("tw"),
        )
        naive = (
            c.groupBy("o_orderstatus")
            .agg(F.min(F.when(2 * F.col("cumw") >= F.col("tw"),
                              F.col("value"))).alias("med"),
                 F.min(F.when(10 * F.col("cumw") >= 9 * F.col("tw"),
                              F.col("value"))).alias("p90"))
            .collect()
        )
        for nr in naive:
            got = rows[(b, nr["o_orderstatus"])]
            assert got["median_value"] == nr["med"]
            assert got["p90_value"] == nr["p90"]


def test_publish_order_base_last_in_every_staged_runner():
    """The concurrent-staging rework moved crash consistency entirely
    into PUBLISH order: in every runner the base/view store's
    publish (the commit point) must be the LAST publish of the
    merge. Source-guard so a refactor can't silently reorder it."""
    import inspect

    from db_realtime_changefeed_spark.streaming import (
        changefeed, generic_views, views)

    cases = [
        (generic_views.GenericAggViewRunner._merge_batch,
         "self._base.publish"),
        (views.MaintainedViewsRunner._merge_batch,
         "self._base.publish"),
        (views.DeltaJoinViewRunner._merge_batch,
         "self._v.publish"),
        (changefeed.ChangefeedRunner._merge_batch_spark,
         "self._store.publish"),
        (changefeed.UpsertChangefeedRunner._merge_batch_spark,
         "self._store.publish"),
    ]
    for fn, anchor in cases:
        src = inspect.getsource(fn)
        assert anchor in src, (fn.__qualname__, "no staged publish")
        last_pub = max(
            i for i, ln in enumerate(src.splitlines())
            if ".publish(" in ln
        )
        anchor_line = max(
            i for i, ln in enumerate(src.splitlines())
            if anchor in ln
        )
        assert anchor_line == last_pub, (
            fn.__qualname__,
            "commit-point publish is not the last publish")


def test_staged_but_unpublished_version_is_invisible(spark, tmp_path):
    """The stage/publish split's safety property, pinned at the store
    level: a staged write with NO manifest publication must be
    invisible to every reader (has_version false, versions() empty,
    and a later publish of the same batch id adopts the staged data
    exactly once)."""
    from db_realtime_changefeed_spark.streaming.state_store import (
        BucketedMvccState)

    store = BucketedMvccState(
        spark, str(tmp_path / "st"), "k long, v double", "k",
        n_buckets=4)
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    touched = store.touched_buckets(df, "k")
    store.stage(0, df, touched)
    # crash window: staged, never published
    assert not store.has_version(0)
    assert store.versions() == []
    # recovery: the retry publishes (or re-stages then publishes)
    store.publish(0, None, touched)
    assert store.has_version(0)
    got = sorted(tuple(r) for r in store.df_at(0).collect())
    assert got == [(1, 1.0), (2, 2.0)]
