"""Round-12 semantic pins — the r11 ADVICE fixes.

Delivery-loss race (subscribe vs commit serialization), the
SnapshotTableFeed push refusal, and table_resume on a fully-GC'd
delta log."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table


def test_table_snapshot_feed_refuses_push(spark, sf_smoke):
    """initial_scan='only' must refuse subscribe() too — inherited
    TableFeed.subscribe would push the full historical delta log,
    exactly the history the caller opted out of (ADVICE r11)."""
    from db_realtime_changefeed_spark.api import Database

    feed = (Database(spark, sf_smoke).table("orders")
            .changes(initial_scan="only"))
    with pytest.raises(NotImplementedError):
        feed.subscribe(lambda b, rows: None)


def test_table_subscribe_serializes_under_commit_lock(
        spark, sf_smoke):
    """subscribe() must read the committed pointer and run catch-up
    UNDER _sub_lock (the commit path pushes under the same lock), so
    a batch committing concurrently is seen by exactly one side —
    never neither (the r11 ADVICE delivery-loss race)."""
    from db_realtime_changefeed_spark.streaming.multitable import (
        MultiTableChangefeedRunner,
    )

    r = MultiTableChangefeedRunner(spark, sf_smoke,
                                   tables=("orders",))
    r.run()
    got: list = []
    t = threading.Thread(
        target=lambda: r.subscribe(
            lambda b, rows: got.append(b), name="locktest"))
    assert r._sub_lock.acquire()
    try:
        t.start()
        t.join(timeout=1.0)
        # catch-up must be waiting on the lock the commit path holds
        assert t.is_alive(), "subscribe ran outside _sub_lock"
        assert got == []
    finally:
        r._sub_lock.release()
    t.join(timeout=30)
    assert not t.is_alive()
    # once the lock frees, full history arrives in order, once each
    assert got == list(range(len(r.versions())))


def test_events_push_checks_subscribers_under_lock(spark, sf_smoke):
    """ChangefeedRunner._push must take _sub_lock BEFORE the
    subscriber-list check (same race class, events side)."""
    from db_realtime_changefeed_spark.streaming.changefeed import (
        ChangefeedRunner,
    )

    r = ChangefeedRunner(spark, sf_smoke)
    r.run()
    last = max(
        x.batch_id for x in r.log().select("batch_id").collect())
    assert r._sub_lock.acquire()
    try:
        t = threading.Thread(target=lambda: r._push(last))
        t.start()
        t.join(timeout=1.0)
        assert t.is_alive(), "_push checked subscribers outside lock"
    finally:
        r._sub_lock.release()
    t.join(timeout=30)
    assert not t.is_alive()


def test_table_resume_survives_full_log_gc(spark, sf_smoke):
    """Delta log fully GC'd: allow_snapshot resumes from the LATEST
    committed state with an empty delta tail (state_at(-1) was the
    r11 ADVICE crash), and still replays to the full aggregate."""
    from db_realtime_changefeed_spark.streaming.multitable import (
        MultiTableChangefeedRunner,
        table_oldest_retained,
        table_resume,
        table_retention_gc,
    )
    from db_realtime_changefeed_spark.streaming.retention_queries import (
        ExpiredCursorError,
    )

    r = MultiTableChangefeedRunner(spark, sf_smoke,
                                   tables=("orders",))
    r.run()
    last = max(r.versions())
    table_retention_gc(r, last + 1)  # drops every log segment
    assert table_oldest_retained(r) is None
    with pytest.raises(ExpiredCursorError):
        table_resume(r, "orders", token=0)
    got = table_resume(r, "orders", token=0,
                       allow_snapshot=True).collect()
    assert {x.kind for x in got} == {"snapshot"}
    assert {x.batch_id for x in got} == {last}
    total = sum(x.d_count for x in got)
    assert total == load_table(spark, sf_smoke, "orders").count()


# ---- standing COUNT(DISTINCT) view (r11 verdict item 2)


@pytest.fixture(scope="module")
def nd_runner(spark, sf_smoke):
    from db_realtime_changefeed_spark.streaming.distinct_view import (
        DistinctCountViewRunner,
    )

    r = DistinctCountViewRunner(spark, sf_smoke)
    r.run()
    return r


def test_distinct_view_nd_equals_support_cardinality(nd_runner):
    """The maintained nd store must equal count(*) over the member
    support relation at EVERY committed batch — the fold and the
    state it summarizes can never drift."""
    for b in nd_runner._batches:
        nd = {r.event_type: r.nd
              for r in nd_runner._nd.df_at(b).collect()}
        sup = {r.event_type: r.nd
               for r in nd_runner.support_state(b)
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).alias("nd")).collect()}
        assert nd == sup, f"batch {b}: nd store drifted from support"


def test_distinct_view_retraction_fires(spark, sf_smoke, nd_runner):
    """A member's delete retracts it from EVERY group it supported:
    pick a user whose last 'error' follows events in >= 2 groups and
    assert it is absent from the support relation at the final batch
    unless re-enrolled by later events."""
    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "event_id", "event_type").collect()
    last_err: dict = {}
    for r in ev:
        if r.event_type == "error":
            last_err[r.user_id] = max(
                last_err.get(r.user_id, -1), r.event_id)
    # expected final membership: any event after the user's last error
    expected: set = set()
    pre_groups: dict = {}
    for r in ev:
        if r.event_type == "error":
            continue
        if r.event_id > last_err.get(r.user_id, -1):
            expected.add((r.event_type, r.user_id))
        elif r.user_id in last_err:
            pre_groups.setdefault(r.user_id, set()).add(r.event_type)
    multi = [u for u, g in pre_groups.items() if len(g) >= 2]
    assert multi, "fixture lost its multi-group deleted users"
    last = max(nd_runner._batches)
    got = {(r.event_type, r.user_id)
           for r in nd_runner.support_state(last).collect()}
    assert got == expected
    # the retraction is real: some multi-group deleted user has at
    # least one pre-delete group NOT re-enrolled afterwards
    assert any((g, u) not in expected
               for u in multi for g in pre_groups[u])


def test_distinct_view_final_state_chunk_invariant(spark, sf_smoke):
    """Final nd state must not depend on the replay chunking."""
    from db_realtime_changefeed_spark.streaming.distinct_view import (
        DistinctCountViewRunner,
    )

    r2 = DistinctCountViewRunner(spark, sf_smoke)
    r2.run(n_chunks=2)
    r6 = DistinctCountViewRunner(spark, sf_smoke)
    r6.run(n_chunks=6)
    f2 = {(r.event_type, r.nd)
          for r in r2._nd.df_at(max(r2._batches)).collect()}
    f6 = {(r.event_type, r.nd)
          for r in r6._nd.df_at(max(r6._batches)).collect()}
    assert f2 == f6


# ---- payload-column feed filters + string-keyed feeds (r11 items 3/4)


def test_rewrite_filter_fast_path_and_payload_path():
    from db_realtime_changefeed_spark.streaming.multitable import (
        rewrite_filter,
    )

    # r13 contract: the second element is the tuple of payload
    # columns the rewritten predicate reads (empty = no after image)
    sql, cols = rewrite_filter("orders", "o_totalprice > 200000")
    assert sql == "value > 200000" and cols == ()
    sql, cols = rewrite_filter("orders", "o_orderstatus = 'F'")
    assert cols == ("o_orderstatus",)
    assert "get_json_object(after, '$.o_orderstatus')" in sql
    assert "CAST(" in sql and "AS string" in sql
    # mixed predicate: envelope column direct, payload via after
    sql, cols = rewrite_filter(
        "orders", "o_totalprice > 1000 AND o_orderpriority = '1-URGENT'")
    assert cols == ("o_orderpriority",)
    assert "value > 1000" in sql
    assert "$.o_orderpriority" in sql
    # column names INSIDE string literals are data, not references
    # (ADVICE r12): the literal passes through byte-identical and
    # does not pull the after image
    sql, cols = rewrite_filter(
        "orders", "o_totalprice > 1 AND 'o_orderpriority x' <> 'y'")
    assert cols == () and "'o_orderpriority x'" in sql


def test_payload_filter_applies_to_delivery(spark, sf_smoke):
    """The filtered feed's committed delta log (cursor's read
    surface) must equal the batch aggregate over MATCHING rows only
    — a state-only filter that still delivered everything would
    fail here."""
    from db_realtime_changefeed_spark.api import Database

    feed = (Database(spark, sf_smoke).table("orders")
            .filter("o_orderstatus = 'F'").changes())
    assert feed._runner.with_after
    got = {}
    for r in feed.log().collect():
        k = str(r.key)
        got[k] = got.get(k, 0) + r.d_count
    exp = {
        str(r.o_custkey): r.c
        for r in load_table(spark, sf_smoke, "orders")
        .where("o_orderstatus = 'F'")
        .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert got == exp
    # envelope-column-only filters never ship the after image
    fast = (Database(spark, sf_smoke).table("orders")
            .filter("o_totalprice > 200000").changes())
    assert fast._runner.with_after is False


def test_string_keyed_feed_state_and_types(spark, sf_smoke):
    from db_realtime_changefeed_spark.api import Database

    feed = (Database(spark, sf_smoke).table("customer")
            .changes(key="c_mktsegment"))
    st = {r.key: (r.cnt, round(r.sum_value, 4))
          for r in feed.state().collect()}
    exp = {
        r.c_mktsegment: (r.c, round(float(r.s), 4))
        for r in load_table(spark, sf_smoke, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("c"),
             F.sum(F.col("c_acctbal").cast("decimal(28,6)"))
             .alias("s"))
        .collect()
    }
    assert st == exp
    # the log's key column is genuinely string-typed (no hashing)
    assert dict(feed.log().dtypes)["key"] == "string"
    assert feed._runner._key_ddl == "string"


def test_string_key_refusal_still_loud_for_other_types():
    from db_realtime_changefeed_spark.streaming.multitable import (
        envelope_spec,
    )

    with pytest.raises(NotImplementedError):
        envelope_spec("orders", "o_totalprice")  # double: refused
    # string now accepted
    assert envelope_spec("customer", "c_mktsegment")[0] \
        == "c_mktsegment"


# ---- SQL:2016 frame exclusion twins (r11 verdict item 5)


def test_frame_exclusion_one_exchange(spark, sf_smoke):
    """Both windows (RANGE frame + peer partition) must ride ONE
    exchange: hash(event_type) co-locates (event_type, h) too, so
    Catalyst plans a single shuffle with two Window nodes."""
    from db_realtime_changefeed_spark.queries import all_queries

    for name in ("win_frame_exclude_group", "win_frame_exclude_ties"):
        plan = (all_queries()[name](spark, sf_smoke)
                ._jdf.queryExecution().executedPlan().toString())
        n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
        assert n_ex == 1, f"{name}: {n_ex} exchanges"


def test_frame_exclusion_semantics_small():
    """Hand-check the algebra on a tiny series: group drops the
    whole peer hour, ties keeps self."""
    from decimal import Decimal

    # (event_type, hour, value): two peers in h=1, one in h=0
    rows = [("a", 0, 10.0), ("a", 1, 1.0), ("a", 1, 2.0)]
    # frame +/- 3 hours covers everything
    total = Decimal("13.0")
    for _, h, v in rows:
        peers = [x for x in rows if x[1] == h]
        psum = sum(Decimal(str(x[2])) for x in peers)
        eg_n, eg_sum = len(rows) - len(peers), total - psum
        et_n, et_sum = eg_n + 1, eg_sum + Decimal(str(v))
        if h == 1:
            assert eg_n == 1 and eg_sum == Decimal("10.0")
            assert et_n == 2 and et_sum == Decimal("10.0") \
                + Decimal(str(v))


# ---- QUALIFY rewrite on the SQL-text surface


def test_sql_qualify_rewrite(spark, sf_smoke):
    from db_realtime_changefeed_spark.api import Database

    db = Database(spark, sf_smoke)
    got = db.sql("""
        SELECT o_orderstatus, o_orderkey
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                                   ORDER BY o_orderkey) <= 2
    """).collect()
    assert len(got) == 2 * len({r.o_orderstatus for r in got})
    assert "__qualify__" not in got[0].asDict()
    # a trailing top-level LIMIT after QUALIFY must refuse loudly,
    # while ORDER BY inside the OVER() spec is of course fine
    with pytest.raises(NotImplementedError, match="final clause"):
        db.sql("SELECT o_orderkey FROM orders "
               "QUALIFY row_number() OVER (ORDER BY o_orderkey) <= 2 "
               "LIMIT 1")


def test_distinct_view_restart_from_durable_root(spark, sf_smoke,
                                                 nd_runner):
    """The runner contract every store-backed family honors: a FRESH
    instance over a previous runner's root serves identical
    trajectories without reprocessing (manifest-committed versioned
    parquet; _batches derives from the member-store manifests)."""
    from db_realtime_changefeed_spark.streaming.distinct_view import (
        DistinctCountViewRunner,
    )

    r2 = DistinctCountViewRunner(spark, sf_smoke,
                                 root=nd_runner.root)
    assert r2._batches == nd_runner._batches
    for b in r2._batches:
        got = {(r.event_type, r.nd)
               for r in r2._nd.df_at(b).collect()}
        want = {(r.event_type, r.nd)
                for r in nd_runner._nd.df_at(b).collect()}
        assert got == want, f"restart drifted at batch {b}"


def test_live_payload_filtered_feed(spark, sf_smoke, tmp_path):
    """Live mode + payload filter: the ingest path must carry the
    after JSON image so the rewritten predicate filters each live
    change file — state converges to the matching subset only."""
    import time

    from db_realtime_changefeed_spark.api import Database

    orders = load_table(spark, sf_smoke, "orders")
    f1 = str(tmp_path / "pf1")
    f2 = str(tmp_path / "pf2")
    orders.where("o_orderkey % 2 = 0").write.parquet(f1)
    orders.where("o_orderkey % 2 = 1").write.parquet(f2)
    feed = (Database(spark, sf_smoke).table("orders")
            .filter("o_orderstatus = 'F'").changes(mode="live"))
    assert feed._runner.with_after
    try:
        feed.ingest(f1)
        feed.ingest(f2)
        want = orders.where("o_orderstatus = 'F'").count()
        deadline = time.time() + 60
        got = -1
        while time.time() < deadline:
            got = sum(r["cnt"] for r in feed.state().collect())
            if got == want:
                break
            time.sleep(0.5)
        assert got == want, f"live payload filter saw {got}/{want}"
    finally:
        feed.stop()


def test_live_string_keyed_feed(spark, sf_smoke, tmp_path):
    """Live mode + string key: ingest normalizes to the string key
    slot and the keyed merge converges to the per-segment batch
    aggregate."""
    import time

    from db_realtime_changefeed_spark.api import Database

    cust = load_table(spark, sf_smoke, "customer")
    f1 = str(tmp_path / "sk1")
    cust.write.parquet(f1)
    feed = (Database(spark, sf_smoke).table("customer")
            .changes(key="c_mktsegment", mode="live"))
    try:
        feed.ingest(f1)
        want = {r.c_mktsegment: r.c
                for r in cust.groupBy("c_mktsegment")
                .agg(F.count(F.lit(1)).alias("c")).collect()}
        deadline = time.time() + 60
        got: dict = {}
        while time.time() < deadline:
            got = {r.key: r.cnt for r in feed.state().collect()}
            if got == want:
                break
            time.sleep(0.5)
        assert got == want
    finally:
        feed.stop()
