"""Round-6 additions: the file-tail network-twin streaming source and
the scale-posture reworks (SCD2 executor-side state, triangle closure
shuffle join — those two assert in test_round5c_ops next to their
operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table
from db_realtime_changefeed_spark.queries import QUERIES, load_all

load_all()


def test_tail_source_exactly_once_across_restart(spark, sf_smoke):
    """The graded run internally appends half the wire log, drains,
    STOPS, appends the rest, and restarts on the same checkpoint —
    the result must hold every event exactly once (nothing lost at
    the restart boundary, nothing re-emitted from before it)."""
    got = QUERIES["source_stream_tail"](spark, sf_smoke)
    ev = load_table(spark, sf_smoke, "events")
    n = ev.count()
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_tail_source_split_protocol(spark, sf_smoke, monkeypatch):
    """Shrinking the split target to 512 bytes forces dozens of byte
    ranges whose boundaries straddle lines mid-record; the Hadoop
    line-split protocol (skip-partial-head, own-the-straddling-tail)
    must still deliver every line exactly once, with values intact."""
    monkeypatch.setenv("SPARK_GRAFT_TAIL_CHUNK", "512")
    got = QUERIES["source_stream_tail"](spark, sf_smoke)
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "value")
    assert got.count() == ev.count()
    # full-row equality both ways (exceptAll is null-safe)
    assert got.exceptAll(ev).count() == 0
    assert ev.exceptAll(got).count() == 0


def test_tail_reader_offset_is_newline_aligned(sf_smoke):
    """latestOffset must never admit a half-appended record: with a
    torn write at the file's end the reported position stops at the
    last complete newline, and completing the line advances it."""
    import os

    from db_realtime_changefeed_spark.queries.scans import (
        TailReader,
        _tail_lines,
    )
    from db_realtime_changefeed_spark.tmputil import scratch_dir

    lines = _tail_lines(sf_smoke)[:5]
    d = scratch_dir("dbrcf-tailtest-")
    path = os.path.join(d, "wire.ndjson")
    with open(path, "w") as f:
        f.writelines(lines)
        f.write('{"event_id":999999,"user_id":1')  # torn write

    reader = TailReader({"path": path})
    complete = sum(len(ln) for ln in lines)
    assert reader.latestOffset() == {"pos": complete}
    with open(path, "a") as f:
        f.write(',"event_type":"x","value":1.0}\n')
    assert reader.latestOffset() == {"pos": os.path.getsize(path)}
    # empty / missing files admit nothing
    assert TailReader({"path": path + ".nope"}).latestOffset() == \
        {"pos": 0}


def test_tail_reader_split_skips_partial_head(sf_smoke):
    """Driving read() over adjacent byte ranges that cut a record in
    half: the first split owns the straddling line, the second skips
    its partial head — together exactly one copy of every record."""
    import os

    from db_realtime_changefeed_spark.queries.scans import (
        TailReader,
        _tail_lines,
    )
    from db_realtime_changefeed_spark.tmputil import scratch_dir

    lines = _tail_lines(sf_smoke)[:20]
    d = scratch_dir("dbrcf-tailsplit-")
    path = os.path.join(d, "wire.ndjson")
    with open(path, "w") as f:
        f.writelines(lines)
    size = os.path.getsize(path)
    reader = TailReader({"path": path, "chunkBytes": "97"})
    parts = reader.partitions({"pos": 0}, {"pos": size})
    assert len(parts) > 5  # genuinely many mid-line boundaries
    ids = []
    for p in parts:
        for rb in reader.read(p):
            ids.extend(rb.column("event_id").to_pylist())
    expected = [
        __import__("json").loads(ln)["event_id"] for ln in lines
    ]
    assert sorted(ids) == sorted(expected)
    assert len(ids) == len(set(ids))


def test_connected_components_match_bfs(spark, sf_smoke):
    """Component ids must agree with a driver-side BFS ground truth
    on the smoke graph: same partition of nodes, and each component
    labelled by its minimum node id."""
    li = (
        load_table(spark, sf_smoke, "lineitem")
        .where(F.col("l_orderkey") % 4 == 0)
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    adj: dict[int, set[int]] = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    expected: dict[int, int] = {}
    for start in sorted(adj):
        if start in expected:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            n = stack.pop()
            comp.append(n)
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        root = min(comp)
        for n in comp:
            expected[n] = root
    got = {
        r.node: r.component
        for r in QUERIES["graph_connected_components"](
            spark, sf_smoke).collect()
    }
    assert got == expected


def test_interpolate_bounded_by_anchors(spark, sf_smoke):
    """Non-missing days pass through untouched; interpolated days lie
    within the closed interval of their two anchors (linearity)."""
    rows = sorted(
        QUERIES["ts_interpolate"](spark, sf_smoke).collect(),
        key=lambda r: r.day,
    )
    series = [(r.day, r.v_true, r.v_filled, r.was_missing)
              for r in rows]
    for i, (_, v_true, v_filled, missing) in enumerate(series):
        if not missing:
            assert v_filled == v_true
        else:
            prevs = [v for _, v, _, m in series[:i] if not m]
            nexts = [v for _, v, _, m in series[i + 1:] if not m]
            anchors = ([prevs[-1]] if prevs else []) + \
                      ([nexts[0]] if nexts else [])
            assert anchors
            assert min(anchors) - 1e-9 <= v_filled <= max(anchors) + 1e-9


def test_drawdown_invariants(spark, sf_smoke):
    """Peak is the running max of equity; drawdown in [0, 1); equity
    never above its peak; first day's drawdown is zero."""
    rows = sorted(
        QUERIES["ts_drawdown"](spark, sf_smoke).collect(),
        key=lambda r: r.day,
    )
    run_peak = float("-inf")
    for r in rows:
        run_peak = max(run_peak, r.equity)
        assert abs(r.peak - run_peak) < 1e-9
        assert r.equity <= r.peak + 1e-9
        assert 0.0 <= r.drawdown6 < 1.0
    assert rows[0].drawdown6 == 0.0


def test_freshness_high_water_mark(spark, sf_smoke):
    """Exactly the freshest source has zero lag; every lag is
    non-negative; stale flag matches the 1-hour SLO cut."""
    rows = QUERIES["dq_freshness"](spark, sf_smoke).collect()
    lags = sorted(r.lag_us for r in rows)
    assert lags[0] == 0
    assert all(lag >= 0 for lag in lags)
    for r in rows:
        assert r.is_stale == (r.lag_us > 3600000000)


def test_cursor_resume_reassembles_log_and_drains(spark, sf_smoke):
    """The resumed consumption equals the full delta log row for
    row, and a drained cursor polls empty (client exactly-once)."""
    from db_realtime_changefeed_spark.api import Cursor
    from db_realtime_changefeed_spark.streaming.queries import (
        _changefeed,
    )

    got = QUERIES["changefeed_cursor_resume"](spark, sf_smoke)
    runner = _changefeed(spark, sf_smoke)
    full = runner.log()
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0
    c = Cursor(runner)
    c.poll()
    assert c.poll() == []  # drained: nothing re-delivered


def test_idempotent_sink_equals_state(spark, sf_smoke):
    """The idempotent sink's merged totals equal the changefeed's
    materialized state (same replay, same aggregate)."""
    got = {
        r.event_type: (r.cnt, round(r.sum_value, 6))
        for r in QUERIES["sink_idempotent_merge"](
            spark, sf_smoke).collect()
    }
    want = {
        r.event_type: (r.cnt, round(float(r.sum_value), 6))
        for r in QUERIES["changefeed_core"](spark, sf_smoke).collect()
    }
    assert got == want


def test_bloom_join_matches_plain_join_and_restores_confs(
        spark, sf_smoke):
    """Bloom pruning must not change results (false positives are
    re-checked by the exact join), and the conf window must close:
    broadcast threshold is restored after the run."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    got = {
        r.o_orderpriority: (r.n_rows, round(r.revenue, 2))
        for r in QUERIES["join_bloom_filter"](spark, sf_smoke).collect()
    }
    assert spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold") == before
    o = load_table(spark, sf_smoke, "orders").where(
        F.col("o_totalprice") > 400000)
    li = load_table(spark, sf_smoke, "lineitem")
    plain = {
        r.o_orderpriority: (r.n, round(r.s, 2))
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
             .cast("double").alias("s"))
        .collect()
    }
    assert got == plain


def test_quarantine_partition_of_input(spark, sf_smoke):
    """Every event lands in exactly one sink; the quarantine holds
    precisely the predicate violations."""
    rows = QUERIES["stream_quarantine"](spark, sf_smoke).collect()
    ev = load_table(spark, sf_smoke, "events")
    assert sum(r.n for r in rows) == ev.count()
    n_bad = ev.where(
        F.col("value").isNull() | (F.col("value") < 0)
        | (F.col("value") > 190)
    ).count()
    assert sum(r.n for r in rows if r.sink == "quarantine") == n_bad
    assert n_bad > 0  # the fixture genuinely exercises the DLQ path


def test_mode_matches_pandas(spark, sf_smoke):
    """The determinized mode equals a pandas value_counts ground
    truth with the same (count desc, value asc) tie-break."""
    got = {r.l_returnflag: (r.mode_qty, r.mode_n)
           for r in QUERIES["agg_mode"](spark, sf_smoke).collect()}
    pdf = (
        load_table(spark, sf_smoke, "lineitem")
        .select("l_returnflag", "l_quantity")
        .toPandas()
    )
    for flag, g in pdf.groupby("l_returnflag"):
        counts = g.groupby("l_quantity").size()
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[flag] == (float(best[0]), best[1])


def test_bootstrap_equals_live_state(spark, sf_smoke):
    """Snapshot-at-k plus the delta tail reconstructs the live state
    exactly (seam-free bootstrap)."""
    got = sorted(
        (r.event_type, r.cnt, round(r.sum_value, 6))
        for r in QUERIES["changefeed_bootstrap"](
            spark, sf_smoke).collect()
    )
    want = sorted(
        (r.event_type, r.cnt, round(float(r.sum_value), 6))
        for r in QUERIES["changefeed_core"](spark, sf_smoke).collect()
    )
    assert got == want


def test_compaction_preserves_data_and_shrinks_files(spark, sf_smoke):
    """Both phases hold identical row counts and checksums; the
    compacted layout has the target file count."""
    rows = {r.phase: r for r in
            QUERIES["layout_compaction"](spark, sf_smoke).collect()}
    assert rows["small"].n_files == 64
    assert rows["compacted"].n_files == 4
    assert rows["small"].n_rows == rows["compacted"].n_rows
    assert float(rows["small"].sum_value) == \
        float(rows["compacted"].sum_value)


def test_grid_radius_join_matches_bruteforce(spark, sf_smoke):
    """The grid-pruned candidate set must lose NO true pair: compare
    against the exhaustive cross join at the same radius."""
    from db_realtime_changefeed_spark.queries.analytics_ext import (
        _GEO_LAT,
        _GEO_LON,
        _sql_haversine,
    )
    from db_realtime_changefeed_spark.queries.analytics_ext2 import (
        _GEO_HLAT,
        _GEO_HLON,
        _GEO_RADIUS_KM,
    )

    got = sorted(
        (r.user_id, r.hub_id, r.dist_km)
        for r in QUERIES["geo_join_radius"](spark, sf_smoke).collect()
    )
    ev = load_table(spark, sf_smoke, "events")
    nat = load_table(spark, sf_smoke, "nation")
    pts = ev.selectExpr(
        "user_id", f"{_GEO_LAT} AS lat", f"{_GEO_LON} AS lon"
    ).distinct()
    hubs = nat.selectExpr(
        "n_nationkey AS hub_id",
        f"{_GEO_HLAT} AS hlat", f"{_GEO_HLON} AS hlon")
    brute = sorted(
        (r.user_id, r.hub_id, r.dist_km)
        for r in pts.crossJoin(hubs).selectExpr(
            "user_id", "hub_id",
            f"round({_sql_haversine('lat', 'lon', 'hlat', 'hlon')}, 6)"
            " AS dist_km",
        ).where(F.col("dist_km") <= _GEO_RADIUS_KM).collect()
    )
    assert got == brute and len(got) > 0


def test_streaming_dedup_equals_batch_keep_set(spark, sf_smoke):
    """The streaming admission gate accepts exactly the batch dedup's
    keep set (min doc_id per normalized hash), each keeper stamped
    with a valid batch id, one accept per hash."""
    got = QUERIES["llm_dedup_streaming"](spark, sf_smoke).collect()
    want = {
        (r.text_hash, r.keep_id)
        for r in QUERIES["llm_dedup_exact"](spark, sf_smoke).collect()
    }
    assert {(r.text_hash, r.keep_id) for r in got} == want
    assert len(got) == len({r.text_hash for r in got})
    assert all(0 <= r.batch_id < 4 for r in got)


def test_progress_audit_covers_all_rows(spark, sf_smoke):
    """The progress telemetry accounts for every input row across
    consecutive batch ids starting at 0."""
    rows = sorted(
        QUERIES["stream_progress_audit"](spark, sf_smoke).collect(),
        key=lambda r: r.batch_id,
    )
    assert [r.batch_id for r in rows] == list(range(len(rows)))
    total = load_table(spark, sf_smoke, "events").count()
    assert sum(r.input_rows for r in rows) == total
