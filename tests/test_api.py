"""Fluent client API surface (api.py): relational chains, SQL text,
and feed registration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.api import Database
from db_realtime_changefeed_spark.catalog import load_table


def test_table_filter_df(spark, sf_smoke):
    db = Database(spark, sf_smoke)
    got = db.table("orders").filter("o_totalprice > 100000").df().count()
    want = (
        load_table(spark, sf_smoke, "orders")
        .where(F.col("o_totalprice") > 100000)
        .count()
    )
    assert got == want > 0


def test_unknown_table_rejected(spark, sf_smoke):
    with pytest.raises(KeyError):
        Database(spark, sf_smoke).table("nope")


def test_sql_surface(spark, sf_smoke):
    db = Database(spark, sf_smoke)
    n = db.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n == load_table(spark, sf_smoke, "lineitem").count()


def test_filtered_feed_state_and_log(spark, sf_smoke):
    feed = (
        Database(spark, sf_smoke)
        .table("events")
        .filter("event_type = 'purchase'")
        .changes(key="user_id")
    )
    state = feed.state()
    ev = load_table(spark, sf_smoke, "events").where(
        F.col("event_type") == "purchase"
    )
    batch = ev.groupBy("user_id").count()
    got = {r["user_id"]: r["cnt"] for r in state.collect()}
    want = {r["user_id"]: r["count"] for r in batch.collect()}
    assert got == want
    assert feed.log().count() > 0


def test_live_feed_cursor_consumes_successive_batches(spark, sf_smoke):
    """Continuous mode: a live standing query delivers two successive
    delta batches to a cursor WITHOUT restart — the namesake
    subscribe-and-keep-receiving behavior."""
    import glob
    import os
    import time

    from db_realtime_changefeed_spark.api import Database
    from db_realtime_changefeed_spark.streaming.replay import (
        build_replay_chunks,
    )

    chunks = build_replay_chunks(spark, sf_smoke, 4)
    files = sorted(glob.glob(os.path.join(chunks, "chunk-*.parquet")))
    feed = Database(spark, sf_smoke).table("events").changes(mode="live")
    cur = feed.cursor()

    def poll_until(timeout=60.0):
        deadline = time.time() + timeout
        while time.time() < deadline:
            rows = cur.poll()
            if rows:
                return rows
            time.sleep(0.3)
        raise AssertionError("cursor received nothing before timeout")

    try:
        feed.ingest(files[0])
        rows1 = poll_until()
        feed.ingest(files[1])
        rows2 = poll_until()
    finally:
        feed.stop()
    # second poll only delivers batches past the first poll's token
    assert max(r["batch_id"] for r in rows1) < min(r["batch_id"] for r in rows2)
    # per-key counts keep growing across the two deliveries
    tail1 = {r["event_type"]: r["new_count"] for r in rows1}
    tail2 = {r["event_type"]: r["new_count"] for r in rows2}
    assert any(tail2[k] > tail1.get(k, 0) for k in tail2)
    # resume-token seek replays from the start of the log
    cur.seek(0)
    replay = cur.poll()
    assert len(replay) == len(rows1) + len(rows2)


def test_point_lookup_row_and_changes(spark, sf_smoke):
    """get(key): row() is the LWW current row; changes() is a
    per-document feed whose state matches it and whose log never
    mentions another key."""
    from pyspark.sql import functions as F

    from db_realtime_changefeed_spark.api import Database
    from db_realtime_changefeed_spark.catalog import load_table

    ev = load_table(spark, sf_smoke, "events")
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")) \
            .first()["user_id"]
    ref = Database(spark, sf_smoke).table("events").get(uid)
    row = ref.row().collect()
    assert len(row) == 1
    want = (
        ev.where(F.col("user_id") == uid)
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .first()
    )
    assert row[0]["event_id"] == want["event_id"]

    feed = ref.changes()
    state = feed.state().collect()
    assert len(state) == 1
    assert state[0]["user_id"] == uid
    assert state[0]["event_id"] == want["event_id"]
    log = feed.log().collect()
    assert log and all(r["user_id"] == uid for r in log)


def test_create_changefeed_ddl(spark, sf_smoke):
    """CREATE CHANGEFEED DDL text form == the fluent form."""
    from db_realtime_changefeed_spark.api import Database, Feed

    db = Database(spark, sf_smoke)
    feed = db.sql(
        "CREATE CHANGEFEED FOR events "
        "WHERE event_type = 'purchase' KEY BY user_id"
    )
    assert isinstance(feed, Feed)
    fluent = (
        db.table("events")
        .filter("event_type = 'purchase'")
        .changes(key="user_id")
    )
    a = sorted(map(tuple, feed.state().collect()))
    b = sorted(map(tuple, fluent.state().collect()))
    assert a == b
    # plain SQL still works through the same entry point
    n = db.sql("SELECT count(*) AS n FROM events").collect()[0]["n"]
    assert n > 0


def test_changes_on_orders_table(spark, sf_smoke):
    """Feeds are not events-only: orders replays through the
    normalized envelope and serves a per-custkey aggregate feed."""
    from pyspark.sql import functions as F

    from db_realtime_changefeed_spark.api import Database
    from db_realtime_changefeed_spark.catalog import load_table

    feed = Database(spark, sf_smoke).table("orders").changes()
    got = {r["key"]: (r["cnt"], round(r["sum_value"], 2))
           for r in feed.state().collect()}
    want = {
        str(r["o_custkey"]): (r["cnt"], round(r["s"], 2))
        for r in load_table(spark, sf_smoke, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    assert got == want


def test_orders_feed_filtered(spark, sf_smoke):
    """Filters on a non-events feed: the predicate (over the table's
    own column names) is rewritten onto the change envelope and runs
    before the keyed delta."""
    feed = (
        Database(spark, sf_smoke)
        .table("orders")
        .filter("o_totalprice > 200000")
        .changes()
    )
    got = {r["key"]: (r["cnt"], round(r["sum_value"], 2))
           for r in feed.state().collect()}
    want = {
        str(r["o_custkey"]): (r["cnt"], round(r["s"], 2))
        for r in load_table(spark, sf_smoke, "orders")
        .where("o_totalprice > 200000")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("o_totalprice").alias("s"))
        .collect()
    }
    assert got == want


def test_orders_feed_live(spark, sf_smoke, tmp_path):
    """Live mode on a non-events feed: push orders change files with
    ingest(), poll state() until both land."""
    import time

    orders = load_table(spark, sf_smoke, "orders")
    half = orders.where("o_orderkey % 2 = 0")
    rest = orders.where("o_orderkey % 2 = 1")
    f1, f2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    half.write.parquet(f1)
    rest.write.parquet(f2)
    feed = Database(spark, sf_smoke).table("orders").changes(mode="live")
    try:
        feed.ingest(f1)
        feed.ingest(f2)
        want = orders.count()
        deadline = time.time() + 60
        got = -1
        while time.time() < deadline:
            got = sum(r["cnt"] for r in feed.state().collect())
            if got == want:
                break
            time.sleep(0.5)
        assert got == want, f"live orders feed saw {got} of {want} rows"
    finally:
        feed.stop()


def test_orders_feed_custom_key_rejected(spark, sf_smoke):
    """KEY BY on a non-events feed accepts any INTEGER or STRING
    column (r12 widened the envelope key slot); other types must
    still fail loudly, never silently aggregate by a garbage cast."""
    with pytest.raises(NotImplementedError,
                       match="integer- or string-typed"):
        Database(spark, sf_smoke).table("orders").changes(key="o_orderdate")
    # the table's own primary key is accepted (no-op spelling)
    feed = (Database(spark, sf_smoke).table("orders")
            .changes(key="o_custkey"))
    assert feed.state().count() > 0
    # a genuinely custom integer key re-keys the aggregate
    per_order = (Database(spark, sf_smoke).table("orders")
                 .changes(key="o_orderkey"))
    n_orders = (Database(spark, sf_smoke).table("orders")
                .df().count())
    assert per_order.state().count() == n_orders


def test_orders_filter_payload_column_accepted(spark, sf_smoke):
    """Predicates on columns outside the key/ts/value envelope now
    run against the `after` JSON payload image (r12 — previously a
    loud refusal): the filtered state must equal the batch aggregate
    over matching rows."""
    feed = (Database(spark, sf_smoke).table("orders")
            .filter("o_orderstatus = 'F'").changes())
    got = sum(r["cnt"] for r in feed.state().collect())
    want = (load_table(spark, sf_smoke, "orders")
            .where("o_orderstatus = 'F'").count())
    assert got == want


def test_create_changefeed_ddl_on_orders(spark, sf_smoke):
    """CREATE CHANGEFEED FOR orders WHERE ... — DDL path for a
    non-events table, with a filter."""
    feed = Database(spark, sf_smoke).sql(
        "CREATE CHANGEFEED FOR orders WHERE o_totalprice > 200000"
    )
    got = sum(r["cnt"] for r in feed.state().collect())
    want = (load_table(spark, sf_smoke, "orders")
            .where("o_totalprice > 200000").count())
    assert got == want


def test_initial_scan_options(spark, sf_smoke):
    """CockroachDB-style initial_scan: 'yes' delivers history, 'no'
    starts cursors at registration time, 'only' is a snapshot with
    no delta surface."""
    db = Database(spark, sf_smoke)

    full = db.table("events").changes(initial_scan="yes")
    assert len(full.cursor().poll()) > 0, "yes must deliver history"

    no_scan = db.table("events").changes(initial_scan="no")
    assert no_scan.cursor().poll() == [], (
        "no: a fresh cursor must start drained in replay mode"
    )
    assert no_scan.state().count() > 0, "state is still maintained"

    snap = db.table("events").changes(initial_scan="only")
    assert snap.state().count() > 0
    with pytest.raises(NotImplementedError):
        snap.log()
    with pytest.raises(NotImplementedError):
        snap.cursor()

    with pytest.raises(ValueError):
        db.table("events").changes(initial_scan="maybe")
    with pytest.raises(ValueError):
        db.table("events").changes(mode="live", initial_scan="only")
    # r11: initial_scan='no' is WIRED off events too (table delta
    # cursors); the detailed contract pins live in test_round11_ops
    assert db.table("orders").changes(
        initial_scan="no").cursor().poll() == []


def test_live_initial_scan_no_skips_preexisting_history(
        spark, sf_smoke, monkeypatch):
    """ADVICE r4: initial_scan='no' must not be silently ignored in
    live mode — cursors of a live feed registered over a root that
    already holds committed history start AT registration time, not
    at batch 0. The standing query itself is stubbed out: this pins
    the cursor_start wiring, which live-stream machinery tests cover
    elsewhere."""
    from db_realtime_changefeed_spark import api
    from db_realtime_changefeed_spark.streaming.changefeed import (
        ChangefeedRunner,
    )

    seed = ChangefeedRunner(spark, sf_smoke)
    seed.run()
    assert seed.log().count() > 0, "fixture must produce history"

    real_init = ChangefeedRunner.__init__

    def restarted_init(self, spark_, sf_dir, **kw):
        kw["root"] = seed.root  # resume the seeded durable state
        real_init(self, spark_, sf_dir, **kw)

    monkeypatch.setattr(ChangefeedRunner, "__init__", restarted_init)
    monkeypatch.setattr(
        ChangefeedRunner, "start_live",
        lambda self, *a, **kw: None,  # wiring test: no standing query
    )

    db = Database(spark, sf_smoke)
    opted_out = db.table("events").changes(mode="live", initial_scan="no")
    assert opted_out.cursor().poll() == [], (
        "live + initial_scan='no' must skip pre-registration history"
    )
    caught_up = db.table("events").changes(mode="live", initial_scan="yes")
    assert len(caught_up.cursor().poll()) > 0, (
        "live + initial_scan='yes' still delivers full catch-up"
    )


def test_changefeed_log_chains_per_key(spark, sf_smoke):
    """Per-key delivery-order guarantee: ordered by batch_id, each
    key's log entries must CHAIN — entry N's new_count/new_sum is
    entry N+1's old_count/old_sum, the first entry starts from
    empty, and the last entry's new values equal the final state.
    A lost, duplicated, or reordered delta breaks the chain, so
    this is the invariant a downstream consumer materializing the
    feed relies on."""
    feed = Database(spark, sf_smoke).table("events").changes(
        key="user_id")
    log = feed.log().collect()
    assert log, "fixture must produce changefeed history"
    by_key: dict = {}
    for r in sorted(log, key=lambda r: r["batch_id"]):
        prev = by_key.get(r["user_id"])
        if prev is None:
            assert (r["old_count"] or 0) == 0, (
                "first delta for a key must start from empty state")
        else:
            assert r["old_count"] == prev["new_count"], (
                f"count chain broken for user {r['user_id']}")
            assert abs((r["old_sum"] or 0.0)
                       - (prev["new_sum"] or 0.0)) < 1e-9, (
                f"sum chain broken for user {r['user_id']}")
        assert r["new_count"] >= 1
        by_key[r["user_id"]] = r
    state = {r["user_id"]: r for r in feed.state().collect()}
    assert set(state) == set(by_key)
    for uid, last in by_key.items():
        assert state[uid]["cnt"] == last["new_count"], (
            "final state must equal the last chained delta")


def test_get_all_rows_and_changes(spark, sf_smoke):
    """RowSetRef: .rows() returns one LWW row per watched key, and the
    multi-key feed's log is exactly the union of the per-key point
    feeds (one standing query, no cross-key interference)."""
    from db_realtime_changefeed_spark.api import Database
    from pyspark.sql import functions as F

    db = Database(spark, sf_smoke)
    ks = [
        int(r["user_id"])
        for r in (
            db.table("events").df()
            .groupBy("user_id").agg(F.min("event_id").alias("m"))
            .orderBy("m").limit(2).collect()
        )
    ]
    rs = db.table("events").get_all(*ks)
    rows = rs.rows().collect()
    assert sorted(r["user_id"] for r in rows) == sorted(ks)
    feed = rs.changes()
    log = feed.log().collect()
    assert {r["user_id"] for r in log} == set(ks)
    # state bounded by the watchlist
    assert feed.state().count() == len(ks)
    # against the single-key point feeds
    for k in ks:
        point = db.table("events").get(k).changes().log().collect()
        mine = [r for r in log if r["user_id"] == k]
        assert len(point) == len(mine)


def test_get_all_empty_refused(spark, sf_smoke):
    import pytest
    from db_realtime_changefeed_spark.api import Database

    with pytest.raises(ValueError):
        Database(spark, sf_smoke).table("events").get_all()
