"""Round-10 wave-4 semantic pins — pure-Python replays from the raw
parquet (independent of both the Spark queries and their DuckDB
oracles), plus the invariants that distinguish a correct
implementation from a consistently-wrong cross-engine one."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb
import pytest

from db_realtime_changefeed_spark.queries.round10c import (
    geo_dbscan_grid,
    llm_containment_dedup,
    seq_absence_detect,
    ts_crosscorr,
    ts_matrix_profile,
)

SF = "/root/testdata/sf0.001"


def _series(agg):
    rows = duckdb.sql(
        f"SELECT event_type, date_trunc('day', ts) AS day, {agg} AS y "
        f"FROM read_parquet('{SF}/events.parquet') "
        "GROUP BY 1, 2 ORDER BY 1, 2").fetchall()
    out = defaultdict(list)
    for et, _, y in rows:
        out[et].append(float(y))
    return out


def test_matrix_profile_brute_force(spark):
    ser = _series("CAST(count(*) AS DOUBLE)")
    got = defaultdict(dict)
    for r in ts_matrix_profile(spark, SF).collect():
        got[r.event_type][r.i] = (r.nn_j, r.mp_dist)
    m, excl = 7, 3
    for et, ys in ser.items():
        n = len(ys)
        w = n - m + 1
        zs = {}
        for i in range(w):
            c = ys[i:i + m]
            mu = sum(c) / m
            var = (sum(y * y for y in c) - sum(c) ** 2 / m) / m
            if var > 0:
                sig = math.sqrt(var)
                zs[i] = [(y - mu) / sig for y in c]
        assert set(got[et]) == set(zs)

        def d2(i, j):
            # mirror the engines' decimal(18,6) pipeline: each
            # squared term rounds HALF_UP at 6 dp before the sum —
            # raw float sums flip near-tie argmins the graded
            # surface resolves identically in both engines
            return sum(
                math.floor((zs[i][k] - zs[j][k]) ** 2 * 1e6 + 0.5)
                for k in range(m)) / 1e6

        for i in zs:
            best = min(
                ((d2(i, j), j) for j in zs if abs(i - j) > excl),
                key=lambda t: (t[0], t[1]))
            nn_j, dist = got[et][i]
            assert nn_j == best[1]
            assert dist == pytest.approx(math.sqrt(best[0]),
                                         rel=1e-6, abs=1e-6)
            assert abs(i - nn_j) > excl


def test_crosscorr_replay_and_overlap(spark):
    ser = _series(
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")
    rows = ts_crosscorr(spark, SF).collect()
    types = sorted(ser)
    assert {(r.ta, r.tb) for r in rows} == {
        (a, b) for a in types for b in types if a < b}
    for r in rows:
        xs, ys = ser[r.ta], ser[r.tb]
        pairs = [(xs[t], ys[t + r.lag]) for t in range(len(xs))
                 if 0 <= t + r.lag < len(ys)]
        assert r.n == len(pairs)
        assert r.n == 30 - abs(r.lag)
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sx2 = sum(x * x for x, _ in pairs)
        sy2 = sum(y * y for _, y in pairs)
        corr = (sxy - sx * sy / n) / math.sqrt(
            (sx2 - sx * sx / n) * (sy2 - sy * sy / n))
        assert r.ccf6 == pytest.approx(corr, abs=2e-6)
        assert -1.0 - 1e-9 <= r.ccf6 <= 1.0 + 1e-9


def test_absence_replay(spark):
    ev = duckdb.sql(
        f"SELECT user_id, event_id, event_type, ts "
        f"FROM read_parquet('{SF}/events.parquet')").fetchall()
    views = [(u, e, t) for u, e, et, t in ev if et == "view"]
    purch = defaultdict(list)
    for u, _, et, t in ev:
        if et == "purchase":
            purch[u].append(t)
    exp = defaultdict(lambda: [0, 0])
    from datetime import timedelta

    for u, _, t in views:
        exp[u][0] += 1
        hit = any(t < p <= t + timedelta(minutes=10)
                  for p in purch.get(u, ()))
        if not hit:
            exp[u][1] += 1
    got = {r.user_id: r for r in seq_absence_detect(spark, SF).collect()}
    assert set(got) == set(exp)
    for u, (nv, na) in exp.items():
        assert (got[u].n_views, got[u].n_absent) == (nv, na)
        assert got[u].absent_rate6 == math.floor(
            na * 1e6 / nv + 0.5) / 1e6


def test_dbscan_grid_union_find(spark):
    pts = duckdb.sql(f"""
      SELECT CAST(floor((-80.0 + 160.0 *
               (CAST((event_id * 2654435761) % 4096 AS DOUBLE)/4096.0)
               * (CAST((event_id * 2654435761) % 4096 AS DOUBLE)
                  /4096.0)) / 10.0) AS BIGINT) AS cl,
             CAST(floor((-180.0 + 360.0 *
               (CAST((event_id * 40503) % 4093 AS DOUBLE)/4093.0)
               * (CAST((event_id * 40503) % 4093 AS DOUBLE)/4093.0))
               / 10.0) AS BIGINT) AS cn,
             count(*) AS c
      FROM read_parquet('{SF}/events.parquet') GROUP BY 1, 2
    """).fetchall()
    k, t = len(pts), sum(c for _, _, c in pts)
    dense = {(cl, cn): c for cl, cn, c in pts if c * k >= 2 * t}
    parent = {x: x for x in dense}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cl, cn) in dense:
        for dl in (-1, 0, 1):
            for dn in (-1, 0, 1):
                nb = (cl + dl, cn + dn)
                if nb != (cl, cn) and nb in dense:
                    ra, rb = find((cl, cn)), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    node = lambda c: (c[0] + 8) * 36 + (c[1] + 18)  # noqa: E731
    comp = {}
    for c in dense:
        root = find(c)
        comp.setdefault(root, []).append(c)
    expected = {}
    for members in comp.values():
        label = min(node(c) for c in members)
        for c in members:
            expected[c] = label
    rows = geo_dbscan_grid(spark, SF).collect()
    assert len(rows) == len(dense)
    for r in rows:
        cell = (r.cell_lat, r.cell_lon)
        assert r.cnt == dense[cell]
        assert r.cluster == expected[cell]
    # the fixture must exercise a non-trivial merge: at least one
    # cluster spanning >= 3 cells and at least 2 distinct clusters
    sizes = defaultdict(int)
    for r in rows:
        sizes[r.cluster] += 1
    assert max(sizes.values()) >= 3 and len(sizes) >= 2


def test_containment_replay_and_asymmetry(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text "
        f"FROM read_parquet('{SF}/documents.parquet')").fetchall()
    sh = {}
    for did, text in docs:
        ws = text.split(" ")
        if len(ws) >= 3:
            sh[did] = {" ".join(ws[i:i + 3])
                       for i in range(len(ws) - 2)}
    df = defaultdict(int)
    for s in sh.values():
        for g in s:
            df[g] += 1
    rows = {(r.doc_a, r.doc_b): r
            for r in llm_containment_dedup(spark, SF).collect()}
    expected = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter_c = {g for g in sh[a] & sh[b] if df[g] <= 32}
            if not inter_c:
                continue  # never a candidate pair
            inter = len(sh[a] & sh[b])
            if inter * 2 >= len(sh[a]) or inter * 2 >= len(sh[b]):
                expected[(a, b)] = (inter, len(sh[a]), len(sh[b]))
    assert set(rows) == set(expected)
    for (a, b), (inter, sa, sb) in expected.items():
        r = rows[(a, b)]
        assert (r.inter, r.size_a, r.size_b) == (inter, sa, sb)
        assert r.cont_a6 == math.floor(inter * 1e6 / sa + 0.5) / 1e6
        assert r.cont_b6 == math.floor(inter * 1e6 / sb + 0.5) / 1e6
    # asymmetry: the two sides must actually differ on some pair.
    # (The synthetic fixture's planted dups are near-equal length at
    # every SF — checked by hand at all three — so no pair clears the
    # threshold on ONE side only; real excerpt/quote corpora are
    # where containment diverges from Jaccard materially.)
    assert any(r.cont_a6 != r.cont_b6 for r in rows.values())


def test_absence_timeout_chunk_invariance(spark):
    """stream_absence_timeout's emitted set must equal the batch
    anti-join restricted to the final-watermark boundary at a chunk
    count the graded default never uses (7) — the chunking-invariance
    property every replayed stream op claims."""
    from datetime import timedelta

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from db_realtime_changefeed_spark.queries.round10c import _absence_fn
    from db_realtime_changefeed_spark.streaming.replay import (
        build_replay_chunks,
        fresh_sink_name,
        read_events_stream,
        run_available_now,
    )

    chunks = build_replay_chunks(spark, SF, 7)
    stream = (
        read_events_stream(spark, chunks)
        .where(F.col("event_type").isin("view", "purchase"))
        .select("user_id", "event_id", "event_type", "ts")
    )
    result = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _absence_fn,
            "user_id long, view_event_id long, view_ts timestamp",
            "ids array<bigint>, tss array<bigint>",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    name = fresh_sink_name("absence7")
    run_available_now(result, name, "append")
    got = sorted((r.user_id, r.view_event_id)
                 for r in spark.table(name).collect())

    ev = duckdb.sql(
        f"SELECT user_id, event_id, event_type, ts "
        f"FROM read_parquet('{SF}/events.parquet') "
        "WHERE event_type IN ('view', 'purchase')").fetchall()
    purch = defaultdict(list)
    for u, _, et, t in ev:
        if et == "purchase":
            purch[u].append(t)
    max_ts = max(t for *_, t in ev)
    win = timedelta(minutes=10)
    exp = sorted(
        (u, e) for u, e, et, t in ev
        if et == "view" and t + win <= max_ts - win
        and not any(t < p <= t + win for p in purch.get(u, ())))
    assert got == exp


def test_watermark_detect_replay_and_null_calibration(spark):
    import hashlib

    from db_realtime_changefeed_spark.queries.round10c import (
        llm_watermark_detect,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text "
        f"FROM read_parquet('{SF}/documents.parquet')").fetchall()
    got = {r.doc_id: r for r in llm_watermark_detect(spark, SF).collect()}
    n_suspect = 0
    for did, text in docs:
        ws = text.split(" ")
        if len(ws) < 2:
            continue
        greens = sum(
            1 for i in range(len(ws) - 1)
            if hashlib.md5(f"{ws[i]}|{ws[i+1]}".encode())
            .hexdigest()[0] <= "7")
        n = len(ws) - 1
        r = got[did]
        assert (r.n_scored, r.n_green) == (n, greens)
        assert r.z == (2.0 * greens - n) / math.sqrt(n)
        n_suspect += bool(r.suspect)
    # organic text must sit near the null: ~2.3% one-sided tail at
    # z>2, so far fewer than 10% of docs may flag
    assert n_suspect < len(got) * 0.10


def test_mann_kendall_replay(spark):
    from db_realtime_changefeed_spark.queries.round10c import (
        ts_mann_kendall,
    )

    ser = _series(
        "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")
    got = {r.event_type: r for r in ts_mann_kendall(spark, SF).collect()}
    for et, ys in ser.items():
        n = len(ys)
        s_stat = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n) for j in range(i + 1, n))
        from collections import Counter

        tie_term = sum(t * (t - 1) * (2 * t + 5)
                       for t in Counter(ys).values() if t > 1)
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        r = got[et]
        assert (r.s_stat, r.n) == (s_stat, n)
        assert r.tau6 == math.floor(
            s_stat * 1e6 / (n * (n - 1) / 2) + 0.5) / 1e6
        assert -1.0 <= r.tau6 <= 1.0
        if s_stat > 0:
            assert r.z == (s_stat - 1.0) / math.sqrt(var_s)
        elif s_stat < 0:
            assert r.z == (s_stat + 1.0) / math.sqrt(var_s)
        else:
            assert r.z == 0.0


def test_checksum_partition_replay_and_mergeability(spark):
    import hashlib

    from db_realtime_changefeed_spark.queries.round10c import (
        dq_checksum_partition,
    )

    rows = duckdb.sql(
        f"SELECT o_orderkey, o_custkey, o_orderstatus,"
        f" o_orderpriority, strftime(o_orderdate, '%Y-%m-%d'),"
        f" strftime(o_orderdate, '%Y-%m')"
        f" FROM read_parquet('{SF}/orders.parquet')").fetchall()
    exp = defaultdict(lambda: [0, 0])
    for ok, ck, st, pr, d, part in rows:
        h = hashlib.md5(f"{ok}|{ck}|{st}|{pr}|{d}".encode()).hexdigest()
        exp[part][0] += 1
        exp[part][1] += int(h[:8], 16)
    got = {r.part: r for r in dq_checksum_partition(spark, SF).collect()}
    assert set(got) == set(exp)
    for part, (n, ck) in exp.items():
        assert (got[part].n_rows, got[part].checksum) == (n, ck)
    # mergeability: shard checksums add — the property that lets two
    # systems compare without co-locating rows
    total = sum(ck for _, ck in exp.values())
    assert total == sum(r.checksum for r in got.values())


def test_modularity_replay(spark):
    from db_realtime_changefeed_spark.queries.round10c import (
        graph_modularity,
    )

    edges = duckdb.sql(f"""
        WITH li AS (SELECT l_orderkey, l_partkey
                    FROM read_parquet('{SF}/lineitem.parquet')
                    WHERE l_orderkey % 4 = 0)
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                           AND a.l_partkey < b.l_partkey
    """).fetchall()
    brand = dict(duckdb.sql(
        f"SELECT p_partkey, p_brand "
        f"FROM read_parquet('{SF}/part.parquet')").fetchall())
    m = len(edges)
    e_in, deg = defaultdict(int), defaultdict(int)
    for u, v in edges:
        bu, bv = brand[u], brand[v]
        deg[bu] += 1
        deg[bv] += 1
        if bu == bv:
            e_in[bu] += 1
    rows = {r.brand: r for r in graph_modularity(spark, SF).collect()}
    assert set(rows) == set(deg)
    for b in deg:
        r = rows[b]
        assert (r.e_in, r.deg) == (e_in[b], deg[b])
        q = math.floor(
            e_in[b] * 1e6 / m - (deg[b] * deg[b] * 1e6) / (4.0 * m * m)
            + 0.5) / 1e6
        assert r.q_contrib6 == q
    # partition bookkeeping: degrees sum to 2m, intra <= m
    assert sum(deg.values()) == 2 * m
    assert sum(e_in.values()) <= m


def test_spectral_entropy_bounds_and_replay(spark):
    from db_realtime_changefeed_spark.queries.round10c import (
        ts_spectral_entropy,
    )

    ser = _series("CAST(count(*) AS DOUBLE)")
    got = {r.event_type: r for r in ts_spectral_entropy(spark, SF).collect()}
    for et, ys in ser.items():
        n = len(ys)
        powers = []
        for k in range(1, 11):
            a = sum(y * math.cos(2 * math.pi * k * t / n)
                    for t, y in enumerate(ys))
            b = sum(y * math.sin(2 * math.pi * k * t / n)
                    for t, y in enumerate(ys))
            powers.append(a * a + b * b)
        tot = sum(powers)
        ps = [p / tot for p in powers if p > 0]
        h = sum(-p * math.log(p) for p in ps) / math.log(10)
        r = got[et]
        assert r.entropy == pytest.approx(h, abs=1e-5)
        assert 0.0 <= r.entropy <= 1.0 + 1e-9
        assert r.max_share == pytest.approx(max(ps), rel=1e-6)


def test_top_paths_replay(spark):
    from db_realtime_changefeed_spark.queries.round10c import (
        seq_top_paths,
    )

    ev = duckdb.sql(
        f"SELECT user_id, event_id, event_type, ts "
        f"FROM read_parquet('{SF}/events.parquet')").fetchall()
    by_user = defaultdict(list)
    for u, e, et, t in ev:
        by_user[u].append((t, e, et))
    from collections import Counter

    paths = Counter(
        " > ".join(et for _, _, et in sorted(evs)[:8])
        for evs in by_user.values())
    expected = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.path, r.n_users) for r in seq_top_paths(spark, SF).collect()]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expected


def test_moments_34_replay(spark):
    from db_realtime_changefeed_spark.queries.round10c import (
        agg_moments_34,
    )

    vals = defaultdict(list)
    for et, v in duckdb.sql(
            f"SELECT event_type, value "
            f"FROM read_parquet('{SF}/events.parquet')").fetchall():
        if v is not None:
            vals[et].append(v)
    got = {r.event_type: r for r in agg_moments_34(spark, SF).collect()}
    for et, xs in vals.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum(x * x for x in xs) / n - mu * mu
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        r = got[et]
        assert r.n == n
        assert r.mean == pytest.approx(mu, rel=1e-9)
        assert r.m2 == pytest.approx(m2, rel=1e-9)
        assert r.skewness == pytest.approx(m3 / m2 ** 1.5, rel=1e-6)
        assert r.ex_kurtosis == pytest.approx(m4 / m2 ** 2 - 3.0,
                                              rel=1e-6)
        # value is a nonnegative right-tailed synthetic metric: its
        # skew must be positive in every fixture
        assert r.skewness > 0
