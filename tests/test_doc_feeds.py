"""Generic per-document feeds (streaming/doc_feeds.py + api.py):
get()/get_all() lifted off the events-only path onto any DOC_MAP
table (VERDICT r8 item 6). Pins the full trajectory: each watched
key's insert delta lands in exactly the micro-batch its arrival
chunk replays in, state is bounded by the key set, cursors drain
once, and the loud raises guard every unsupported shape."""

from __future__ import annotations

import math

import pytest

from db_realtime_changefeed_spark.api import Database
from db_realtime_changefeed_spark.catalog import load_table


def _expected_batches(spark, sf_smoke, table, key_col, keys):
    """A key's insert batch = its arrival chunk = rank(key)//per
    (the _keyed_chunks slicing contract, default 4 chunks)."""
    all_keys = sorted(
        r[0] for r in load_table(spark, sf_smoke, table)
        .select(key_col).collect())
    per = math.ceil(len(all_keys) / 4)
    rank = {k: i for i, k in enumerate(all_keys)}
    return {k: rank[k] // per for k in keys}


def test_customer_point_feed_trajectory(spark, sf_smoke):
    db = Database(spark, sf_smoke)
    row = db.table("customer").get(7).row().collect()
    assert len(row) == 1 and row[0].c_acctbal == pytest.approx(
        7954.22, abs=1e-6)
    feed = db.table("customer").get(7).changes()
    st = feed.state().collect()
    assert [(r.c_custkey, r.c_acctbal) for r in st] == [
        (7, pytest.approx(7954.22, abs=1e-6))]
    log = feed.log().collect()
    assert len(log) == 1
    r = log[0]
    assert (r.c_custkey, r.old_value, r.new_seq) == (7, None, 7)
    assert r.new_value == pytest.approx(7954.22, abs=1e-6)
    exp = _expected_batches(spark, sf_smoke, "customer",
                            "c_custkey", [7])
    assert r.batch_id == exp[7]


def test_documents_watchlist_trajectory(spark, sf_smoke):
    """Keys chosen to span multiple arrival chunks: every delta
    arrives in ITS key's chunk batch (nothing early, nothing late),
    state holds exactly the watchlist, and a cursor drains once."""
    db = Database(spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents")
    all_ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    # first, one mid, and last key -> chunks 0, 1-2, 3
    keys = [all_ids[0], all_ids[len(all_ids) // 2], all_ids[-1]]
    exp_batch = _expected_batches(
        spark, sf_smoke, "documents", "doc_id", keys)
    assert len(set(exp_batch.values())) >= 2, "keys must span chunks"
    rs = db.table("documents").get_all(*keys)
    n_chars = {r.doc_id: r.n_chars for r in rs.rows().collect()}
    assert set(n_chars) == set(keys)
    feed = rs.changes()
    st = {r.doc_id: r.n_chars for r in feed.state().collect()}
    assert st == {k: float(n_chars[k]) for k in keys}
    log = feed.log().collect()
    assert len(log) == len(keys), "one insert delta per watched key"
    for r in log:
        assert r.old_value is None and r.old_seq is None
        assert r.new_value == float(n_chars[r.doc_id])
        assert r.batch_id == exp_batch[r.doc_id], r
    cur = feed.cursor()
    polled = cur.poll()
    assert sorted(r.doc_id for r in polled) == sorted(keys)
    # batch order within the poll is the trajectory order
    assert [r.batch_id for r in polled] == sorted(
        r.batch_id for r in polled)
    assert cur.poll() == []


def test_doc_feed_guards(spark, sf_smoke):
    db = Database(spark, sf_smoke)
    # composite-key tables take one positional per key column now
    # (round-10); wrong arity raises loudly
    with pytest.raises(TypeError, match="l_orderkey"):
        db.table("lineitem").get(1)
    with pytest.raises(TypeError, match="tuples"):
        db.table("lineitem").get_all(1, 2)
    with pytest.raises(NotImplementedError, match="c_custkey"):
        db.table("customer").get_all(1, 2, key="c_name")
    with pytest.raises(NotImplementedError, match="delete_on"):
        db.table("part").get(1).changes(delete_on="remove")
    # events keeps its native key and path
    with pytest.raises(NotImplementedError, match="user_id"):
        db.table("events").get(1, key="event_type")
    # packing guard: a low-col value outside the bit budget raises
    # driver-side in pack_key
    from db_realtime_changefeed_spark.streaming.doc_feeds import (
        pack_key,
    )

    with pytest.raises(ValueError, match="packing budget"):
        pack_key("lineitem", 1, 8)
    assert pack_key("lineitem", 3, 2) == 26


def test_lineitem_composite_point_feed(spark, sf_smoke):
    """get(orderkey, linenumber) on the composite-key table: state
    is the LWW winner of the packed document, the log unpacks back
    to the table's own columns, and .row() pushes both equalities."""
    from pyspark.sql import functions as F

    db = Database(spark, sf_smoke)
    li = load_table(spark, sf_smoke, "lineitem")
    # a key that occurs exactly once (duplicated PKs exist in the
    # synthetic fixture; a unique key has an order-independent LWW)
    pk = (F.col("l_orderkey").cast("long") * 8
          + F.col("l_linenumber")).alias("k")
    row = (
        li.groupBy(pk).count().where("count = 1")
        .orderBy("k").limit(1).collect()[0])
    ok, ln = row.k >> 3, row.k & 7
    exp = li.where(
        (F.col("l_orderkey") == ok)
        & (F.col("l_linenumber") == ln)).collect()
    assert len(exp) == 1
    r = db.table("lineitem").get(ok, ln)
    got = r.row().collect()
    assert len(got) == 1 and got[0].l_extendedprice == \
        exp[0].l_extendedprice
    feed = r.changes()
    st = feed.state().collect()
    assert len(st) == 1
    assert (st[0].l_orderkey, st[0].l_linenumber) == (ok, ln)
    assert st[0].l_extendedprice == pytest.approx(
        exp[0].l_extendedprice)
    log = feed.log().collect()
    assert len(log) == 1 and log[0].old_value is None
    assert log[0].new_seq == row.k


def test_keyby_custom_key_feed(spark, sf_smoke):
    """KEY BY <integer col> on any envelope-mapped table: the feed
    aggregates by the chosen key; non-integral keys and unknown
    columns raise loudly."""
    from pyspark.sql import functions as F

    db = Database(spark, sf_smoke)
    feed = db.table("supplier").changes(key="s_nationkey")
    got = {r.key: (r.cnt, round(r.sum_value, 6))
           for r in feed.state().collect()}
    exp = {
        str(r.s_nationkey): (r.cnt, round(r.s, 6))
        for r in load_table(spark, sf_smoke, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("s_acctbal").cast("decimal(28,6)"))
             .cast("double").alias("s")).collect()
    }
    assert got == exp
    # string keys are ACCEPTED since r12 (the envelope key slot
    # follows the key column's type); non-integral non-string types
    # still refuse loudly
    with pytest.raises(NotImplementedError,
                       match="integer- or string-typed"):
        db.table("customer").changes(key="c_acctbal")
    with pytest.raises(KeyError, match="not a column"):
        db.table("customer").changes(key="nope")


def test_orders_views_through_fluent_api(spark, sf_smoke):
    """db.table('orders').views() rides the GenericAggViewRunner:
    group_agg equals the batch-computed latest-order rollup, min/max
    brackets it, top_k is value-descending with k rows, and the
    range read returns exactly the in-range subset of the latest
    index."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    db = Database(spark, sf_smoke)
    v = db.table("orders").views()
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    latest = (
        load_table(spark, sf_smoke, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
    )
    exp = {
        r.o_orderstatus: (r.cnt, round(r.s, 6))
        for r in latest.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double").alias("s")).collect()
    }
    got = {r.o_orderstatus: (r.cnt, round(r.sum_value, 6))
           for r in v.group_agg().collect()}
    assert got == exp
    mm = {r.o_orderstatus: r for r in v.min_max().collect()}
    assert set(mm) == set(exp)
    for st, r in mm.items():
        assert r.n == exp[st][0]
        assert r.min_value <= r.max_value
    # the views(k=10) default is HONORED on the read path (ADVICE
    # r9: it used to silently serve the shared runner's k=5); the
    # maintained delta feed keeps the runner's own width
    top = v.top_k()
    assert len(top) == 10 and v._runner.k == 5
    assert db.table("orders").views(k=3).top_k() == top[:3]
    vals = [t[1] for t in top]
    assert vals == sorted(vals, reverse=True)
    lo, hi = vals[-1], vals[0]
    rng = v.between(lo, hi).collect()
    assert {t[0] for t in top} <= {r.o_custkey for r in rng}
    # the generic top-k enter/leave feed (round-10 surface close):
    # replaying the log forward lands on exactly the k=5 membership
    tk = sorted(v.top_k_changes().collect(),
                key=lambda r: r.batch_id)
    member: set = set()
    for r in tk:
        if r.change == "enter":
            member.add(r.o_custkey)
        elif r.change == "leave":
            member.remove(r.o_custkey)
    assert member == {c for c, _, _ in top[:5]}
    names = v.register_sql()
    assert spark.sql(
        "SELECT sum(cnt) FROM orders_agg_view").collect()[0][0] \
        == sum(c for c, _ in exp.values())
    assert names == ["orders_agg_view", "orders_minmax_view",
                     "orders_topk_log", "orders_changes"]
    assert spark.sql(
        "SELECT count(*) FROM orders_topk_log").collect()[0][0] \
        == len(tk) > 0
    # the delta log replays to the same latest state: each key's
    # last delta carries its current (value, seq)
    log = v.changes().collect()
    assert log, "orders changelog must be non-empty"
    last_delta: dict = {}
    for r in sorted(log, key=lambda r: (r.batch_id, r.o_custkey)):
        last_delta[r.o_custkey] = r
    cur = {r.o_custkey: (r.o_totalprice, r.o_orderkey)
           for r in latest.collect()}
    assert set(last_delta) == set(cur)
    for k_, r in last_delta.items():
        assert (r.new_value, r.new_seq) == cur[k_], k_
    firsts = [r for r in log
              if r.old_value is None and r.old_seq is None]
    assert len(firsts) == len(cur), "one NULL-old first delta per key"
    # non-wired table still raises with the parameterization route
    import pytest as _pytest
    with _pytest.raises(KeyError, match="GenericAggViewRunner"):
        db.table("customer").views()


def test_generic_feed_chunk_count_generality(spark, sf_smoke):
    """The generic upsert runner is not wired to the default chunk
    count: replaying documents in 7 chunks lands each watched key's
    insert delta in rank//ceil(n/7) — the _keyed_chunks slicing
    contract at ANY micro-batch granularity — with state identical
    to the 4-chunk run."""
    import math

    from pyspark.sql import functions as F

    from db_realtime_changefeed_spark.streaming.doc_feeds import (
        GenericUpsertChangefeedRunner,
    )

    ids = sorted(
        r.doc_id for r in load_table(spark, sf_smoke, "documents")
        .select("doc_id").collect())
    ks = [int(ids[0]), int(ids[len(ids) // 3]), int(ids[-1])]
    r = GenericUpsertChangefeedRunner(
        spark, sf_smoke, "documents", key_values=tuple(ks))
    r.run(n_chunks=7)
    per = math.ceil(len(ids) / 7)
    rank = {k: i for i, k in enumerate(ids)}
    log = r.log().collect()
    assert sorted(x.doc_id for x in log) == sorted(ks)
    for row in log:
        assert row.batch_id == rank[row.doc_id] // per, row
        assert row.old_value is None
    st = {x.doc_id: x.n_chars for x in r.state().collect()}
    docs = {x.doc_id: float(x.n_chars)
            for x in load_table(spark, sf_smoke, "documents")
            .where(F.col("doc_id").isin(ks)).collect()}
    assert st == docs
