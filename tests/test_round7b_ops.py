"""Round-7 continuation wave: independent re-derivations (plain
Python/hashlib/pandas) of sticky rebalancing, epoch mixing, the
seeded shuffle, k-anonymity, and tokenizer fertility — plus the
distributed-systems properties that motivate each operator (minimal
movement, budget accounting, balance, sum preservation)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table
from db_realtime_changefeed_spark.queries import all_queries

QUERIES = all_queries()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _rdv_owner(members, key) -> str:
    return max(members, key=lambda m: (_md5(f"{m}#{key}"), m))


def test_rendezvous_moves_minimal_fraction(spark, sf_oracle):
    """THE reason rendezvous beats mod-N: growing the group from 3 to
    4 members moves ~1/4 of the keys; mod-N moves ~3/4."""
    from db_realtime_changefeed_spark.queries.round7b import (
        _MEMBERS_AFTER,
        _MEMBERS_BEFORE,
    )

    users = [
        r.user_id
        for r in load_table(spark, sf_oracle, "events")
        .select("user_id").distinct().collect()
    ]
    assert len(users) >= 100
    moved_rdv = sum(
        _rdv_owner(_MEMBERS_BEFORE, u) != _rdv_owner(_MEMBERS_AFTER, u)
        for u in users
    ) / len(users)
    moved_mod = sum(u % 3 != u % 4 for u in users) / len(users)
    assert moved_rdv < 0.45, f"rendezvous moved {moved_rdv:.2f}"
    assert moved_rdv < moved_mod / 1.5, (moved_rdv, moved_mod)
    # and the new member actually received a fair share
    after = [_rdv_owner(_MEMBERS_AFTER, u) for u in users]
    share = after.count(_MEMBERS_AFTER[-1]) / len(users)
    assert 0.10 < share < 0.45, share


def test_rebalance_sticky_received_matches_python_owner(
        spark, sf_oracle):
    """Every delivered row's consumer must equal the Python
    rendezvous owner for that batch's epoch, and the delivered rows
    per batch must be non-empty through the rebalance boundary."""
    from db_realtime_changefeed_spark.queries.round7b import (
        _MEMBERS_AFTER,
        _MEMBERS_BEFORE,
    )
    from db_realtime_changefeed_spark.streaming.view_queries import (
        _REB,
    )

    rows = QUERIES["changefeed_rebalance_sticky"](
        spark, sf_oracle).collect()
    assert rows
    batches = {r.batch_id for r in rows}
    assert any(b < _REB for b in batches)
    assert any(b >= _REB for b in batches)
    for r in rows:
        members = _MEMBERS_BEFORE if r.batch_id < _REB else _MEMBERS_AFTER
        assert r.consumer == _rdv_owner(members, r.user_id), r


def test_owner_handoff_matrix_properties(spark, sf_oracle):
    """Under rendezvous, a key's argmax over a SUPERSET membership
    can only change to the added member — every off-diagonal cell
    must hand off TO the joiner; the matrix total must cover the
    keyspace exactly once."""
    from db_realtime_changefeed_spark.queries.round7b import (
        _MEMBERS_AFTER,
        _MEMBERS_BEFORE,
    )

    joiner = _MEMBERS_AFTER[-1]
    rows = QUERIES["changefeed_owner_handoff"](
        spark, sf_oracle).collect()
    n_keys = (load_table(spark, sf_oracle, "events")
              .select("user_id").distinct().count())
    assert sum(r.n_keys for r in rows) == n_keys
    for r in rows:
        assert r.moved == (r.owner_before != r.owner_after)
        if r.moved:
            assert r.owner_after == joiner, r
        assert r.owner_before in _MEMBERS_BEFORE
        assert r.owner_after in _MEMBERS_AFTER
    assert any(r.moved for r in rows)
    assert any(not r.moved for r in rows)


def test_mix_epochs_budget_accounting(spark, sf_oracle):
    """Integer-exact schedule: emitted = full-epoch tokens + the
    minimal hash-greedy fractional prefix covering the remainder."""
    from db_realtime_changefeed_spark.queries.round7b import (
        _MIX_CAP,
    )

    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("dt")
    ).collect()
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r.source, []).append((r.doc_id, r.dt))
    out = {r.source: r for r in
           QUERIES["llm_mix_epochs"](spark, sf_oracle).collect()}
    assert set(out) == set(by_src)
    for src, row in out.items():
        toks = sum(dt for _, dt in by_src[src])
        assert row.toks == toks
        assert 0 <= row.epochs_full <= _MIX_CAP
        assert row.emitted_tokens == (
            row.epochs_full * row.toks + row.frac_tokens)
        if row.epochs_full < _MIX_CAP:
            rem = row.r_tokens - (row.r_tokens // toks) * toks
            # greedy prefix: covers the remainder...
            assert row.frac_tokens >= rem
            # ...minimally (dropping the hash-last selected doc
            # falls below the remainder)
            order = sorted(
                by_src[src],
                key=lambda p: (_md5(str(p[0])), p[0]))
            cum, picked = 0, []
            for _, dt in order:
                if cum >= rem:
                    break
                picked.append(dt)
                cum += dt
            assert row.frac_docs == len(picked)
            assert row.frac_tokens == cum
            if picked:
                assert cum - picked[-1] < rem


def test_global_shuffle_balanced_and_reseeded(spark, sf_oracle):
    """Round-robin deal is maximally balanced per epoch; both epochs
    cover the identical corpus (checksum union) but permute it
    differently (python-rederived reader assignment)."""
    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", "text").collect()
    n_total = len(docs)
    rows = QUERIES["llm_global_shuffle"](spark, sf_oracle).collect()
    by_epoch: dict = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == {"e0", "e1"}
    corpus_ck = sum(int(_md5(r.text)[:10], 16) for r in docs)
    for ep, rs in by_epoch.items():
        counts = sorted(r.n_docs for r in rs)
        assert sum(counts) == n_total
        assert counts[-1] - counts[0] <= 1, (ep, counts)
        assert sum(r.checksum for r in rs) == corpus_ck

    def readers(seed):
        order = sorted(
            docs, key=lambda d: (_md5(f"{seed}:{d.doc_id}"), d.doc_id))
        return {d.doc_id: i % 8 for i, d in enumerate(order)}

    r0, r1 = readers("e0"), readers("e1")
    assert any(r0[k] != r1[k] for k in r0), "reseed produced the same deal"
    # and the engine's per-reader checksums match the python deal
    for ep, rd in (("e0", r0), ("e1", r1)):
        want: dict = {}
        for d in docs:
            want[rd[d.doc_id]] = (
                want.get(rd[d.doc_id], 0) + int(_md5(d.text)[:10], 16))
        got = {r.reader: r.checksum for r in by_epoch[ep]}
        assert got == want, ep


def test_union_watermark_min_policy_withholds_tail(spark, sf_oracle):
    """Windows between the lagging source's high-water mark and the
    fast source's must be HELD OPEN (min policy), even though the
    fast source alone would close them — a max-policy engine emits
    them and corrupts finals."""
    import datetime as dt

    from db_realtime_changefeed_spark.queries.round7b import (
        _UNION_CUT,
    )

    ev = load_table(spark, sf_oracle, "events")
    cut = int(ev.agg(F.floor(F.max("event_id") * _UNION_CUT))
              .collect()[0][0])
    max_a = (ev.where(F.col("user_id") % 2 == 0)
             .agg(F.max("ts")).collect()[0][0])
    max_b = (ev.where((F.col("user_id") % 2 == 1)
                      & (F.col("event_id") <= cut))
             .agg(F.max("ts")).collect()[0][0])
    assert max_b < max_a - dt.timedelta(hours=2), (
        "fixture must give the lagging source a real lag")
    wm = max_b - dt.timedelta(hours=1)
    rows = QUERIES["stream_union_watermark"](
        spark, sf_oracle).collect()
    assert rows
    ten = dt.timedelta(minutes=10)
    for r in rows:
        assert r.window_start + ten <= wm, (
            f"window {r.window_start} past the min watermark {wm}")
    # the withheld tail is non-trivial: the fast source has >= 6
    # would-be-closed windows past the min watermark
    tail = (ev.where((F.col("user_id") % 2 == 0) & (F.col("ts") > wm))
            .select(F.window("ts", "10 minutes")).distinct().count())
    assert tail >= 6, tail


def test_union_watermark_audit_trajectory(spark, sf_oracle):
    """The engine-reported watermark trajectory: epoch floor on
    batch 0, strictly increasing afterwards, and each batch's value
    bounded by the LAGGING source's committed max (min policy) —
    never the fast source's."""
    import datetime as dt

    from db_realtime_changefeed_spark.queries.round7b import (
        _UNION_CUT,
    )

    rows = sorted(
        QUERIES["stream_union_watermark_audit"](
            spark, sf_oracle).collect(),
        key=lambda r: r.batch_id)
    assert [r.batch_id for r in rows] == [0, 1, 2, 3]
    assert rows[0].watermark == dt.datetime(1970, 1, 1)
    wms = [r.watermark for r in rows[1:]]
    assert wms == sorted(wms) and len(set(wms)) == len(wms)
    ev = load_table(spark, sf_oracle, "events")
    cut = int(ev.agg(F.floor(F.max("event_id") * _UNION_CUT))
              .collect()[0][0])
    max_a = (ev.where(F.col("user_id") % 2 == 0)
             .agg(F.max("ts")).collect()[0][0])
    max_b = (ev.where((F.col("user_id") % 2 == 1)
                      & (F.col("event_id") <= cut))
             .agg(F.max("ts")).collect()[0][0])
    hour = dt.timedelta(hours=1)
    for r in rows[1:]:
        assert r.watermark <= min(max_a, max_b) - hour + dt.timedelta(
            milliseconds=1)
        # min policy: the fast source alone would have pushed past
        # the lagging bound by the final batch
    assert rows[-1].watermark < max_a - hour - dt.timedelta(hours=1)


def test_union_watermark_chunking_invariant(spark, sf_oracle):
    """The closed-window set is a function of the DATA (final min
    watermark), not of how the replay was chunked: re-running the
    same aggregate from differently-chunked wires must emit the
    identical set."""
    import os
    import shutil

    from db_realtime_changefeed_spark.queries.round7b import (
        _union_source_chunks,
    )
    from db_realtime_changefeed_spark.queries._util import DEC
    from db_realtime_changefeed_spark.streaming import replay as rp
    from db_realtime_changefeed_spark.streaming.queries import (
        _to_table,
    )

    baseline = {(r.window_start, r.n, r.sum_value) for r in
                QUERIES["stream_union_watermark"](
                    spark, sf_oracle).collect()}

    # rebuild the same two wires at a different chunk count
    import pyarrow as pa
    import pyarrow.parquet as pq
    import math

    t = pq.read_table(os.path.join(sf_oracle, "events.parquet"))
    t = t.sort_by("event_id")
    ev = t.column("event_id").to_numpy()
    uid = t.column("user_id").to_numpy()
    from db_realtime_changefeed_spark.queries.round7b import (
        _UNION_CUT,
    )

    cut = int(math.floor(ev.max() * _UNION_CUT))
    dirs = []
    for mask, tag in [
        (uid % 2 == 0, "ta"),
        ((uid % 2 == 1) & (ev <= cut), "tb"),
    ]:
        out = rp._chunk_dir(sf_oracle, f"uniontest-{tag}-c2")
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        part = t.filter(pa.array(mask))
        per = (part.num_rows + 1) // 2
        for i in range(2):
            rp._write_chunk(part.slice(i * per, per), out, i)
        dirs.append(out)
    a = (rp.read_events_stream(spark, dirs[0])
         .withWatermark("ts", "1 hour").select("ts", "value"))
    b = (rp.read_events_stream(spark, dirs[1])
         .withWatermark("ts", "1 hour").select("ts", "value"))
    agg = (
        a.unionByName(b)
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast(DEC)).cast("double")
             .alias("sum_value"))
    )
    name = _to_table(agg, "unionwm2", "append")
    got = {(r.window_start, r.n, r.sum_value)
           for r in spark.table(name).select(
               F.col("window.start").alias("window_start"),
               "n", "sum_value").collect()}
    assert got == baseline


def test_k_anonymity_releases_and_preserves_totals(spark, sf_oracle):
    e = load_table(spark, sf_oracle, "events")
    n_rows = e.count()
    g = e.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    n_groups = g.count()
    rows = QUERIES["dq_k_anonymity"](spark, sf_oracle).collect()
    assert sum(r.cnt for r in rows) == n_rows
    released = [r for r in rows if r.day != "__suppressed__"]
    suppressed = [r for r in rows if r.day == "__suppressed__"]
    assert released and suppressed, "both branches must be exercised"
    for r in released:
        # integer cross-multiplied mean threshold
        assert r.cnt * n_groups >= n_rows, r
    total = e.agg(
        F.sum(F.col("value").cast("decimal(18,6)"))).collect()[0][0]
    assert abs(sum(r.sum_value for r in rows) - float(total)) < 1e-3


def test_index_maintain_final_probe_equals_batch_built(
        spark, sf_oracle):
    """The incremental index's FINAL probe must serve exactly what
    the batch-built llm_knn_lsh index serves (same query vector,
    same bucket family), and results only improve as the index
    grows (batch b's floor cosine >= batch b-1's, over full
    top-10s)."""
    rows = QUERIES["llm_index_maintain_stream"](
        spark, sf_oracle).collect()
    by_batch: dict = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, []).append(
            (r.vec_id, r.label, r.cos_sim))
    last = max(by_batch)
    batch_built = [
        (r.vec_id, r.label, r.cos_sim)
        for r in QUERIES["llm_knn_lsh"](spark, sf_oracle).collect()
    ]
    assert sorted(by_batch[last]) == sorted(batch_built)
    floors = [
        min(c for _, _, c in by_batch[b])
        for b in sorted(by_batch)
        if len(by_batch[b]) == 10
    ]
    assert floors == sorted(floors), floors


def test_metadata_columns_attribute_rows_to_files(spark, sf_oracle):
    """Every row attributes to exactly one chunk file, ranges are
    contiguous and non-overlapping across files, and totals re-unite
    to the corpus."""
    rows = sorted(
        QUERIES["scan_metadata_columns"](spark, sf_oracle).collect(),
        key=lambda r: r.file_name)
    total = load_table(spark, sf_oracle, "events").count()
    assert sum(r.n_rows for r in rows) == total
    for prev, cur in zip(rows, rows[1:]):
        assert prev.max_event_id < cur.min_event_id
    for r in rows:
        assert r.max_event_id - r.min_event_id + 1 == r.n_rows


def test_timebucket_view_retracts_on_bucket_moves(spark, sf_oracle):
    """Derived-group IVM: per batch the view's total count equals
    the number of users seen so far (each user in exactly ONE
    bucket), and at least one bucket's count DECREASES between
    consecutive batches — direct evidence the old bucket is
    retracted when a user's latest event moves forward in time."""
    rows = QUERIES["changefeed_timebucket_view"](
        spark, sf_oracle).collect()
    by_batch: dict = {}
    for r in rows:
        by_batch.setdefault(r.batch_id, {})[r.bucket] = r.cnt
    ev = load_table(spark, sf_oracle, "events").select(
        "user_id", "event_id").collect()
    ids = sorted(r.event_id for r in ev)
    n = len(ids)
    per = -(-n // 4)
    users_by_event = {r.event_id: r.user_id for r in ev}
    seen: set = set()
    for b in sorted(by_batch):
        for eid in ids[: (b + 1) * per]:
            seen.add(users_by_event[eid])
        assert sum(by_batch[b].values()) == len(seen), b
    decreased = False
    batches = sorted(by_batch)
    for prev, cur in zip(batches, batches[1:]):
        for bucket, cnt in by_batch[prev].items():
            if by_batch[cur].get(bucket, 0) < cnt:
                decreased = True
    assert decreased, "no retraction observed across batches"


def test_udtf_table_argument_partition_streaming(spark, sf_oracle):
    """One summary row per PARTITION BY key, counts re-uniting to
    the corpus, and the ORDER BY making last_event_type the
    event-time-last row per user (rederived with a window)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_oracle, "events")
    rows = QUERIES["udtf_table_argument"](spark, sf_oracle).collect()
    n_users = ev.select("user_id").distinct().count()
    assert len(rows) == n_users
    assert sum(r.n for r in rows) == ev.count()
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    want = {
        r.user_id: r.event_type
        for r in ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1").collect()
    }
    assert {r.user_id: r.last_event_type for r in rows} == want


def test_tokenizer_fertility_consistent_with_tokenize(spark, sf_smoke):
    """Per-language fertility must re-aggregate exactly from the
    per-document llm_tokenize_bpe counts, and be >= 1 everywhere
    (a word segments into at least one subword)."""
    per_doc = {r.doc_id: r for r in
               QUERIES["llm_tokenize_bpe"](spark, sf_smoke).collect()}
    langs = {r.doc_id: r.lang for r in
             load_table(spark, sf_smoke, "documents")
             .select("doc_id", "lang").collect()}
    want: dict = {}
    for did, r in per_doc.items():
        k = langs[did]
        d, w, b = want.get(k, (0, 0, 0))
        want[k] = (d + 1, w + r.n_words, b + r.n_bpe_tokens)
    got = QUERIES["llm_tokenizer_fertility"](spark, sf_smoke).collect()
    assert {r.lang: (r.n_docs, r.n_words, r.n_bpe_tokens)
            for r in got} == want
    for r in got:
        assert r.fertility >= 1.0
        assert abs(r.fertility - r.n_bpe_tokens / r.n_words) < 1e-12


def test_rendezvous_single_member_owns_all(spark):
    """ADVICE r7: F.greatest needs >= 2 args; a one-member group must
    still resolve (everyone's owner is the sole member), and an empty
    member list must refuse loudly."""
    import pytest
    from db_realtime_changefeed_spark.streaming.views import (
        ConsumerGroupDispatcher,
    )
    df = spark.range(5).withColumnRenamed("id", "user_id")
    owners = df.select(
        ConsumerGroupDispatcher.rendezvous_owner(["solo"]).alias("m")
    ).distinct().collect()
    assert [r["m"] for r in owners] == ["solo"]
    with pytest.raises(ValueError):
        ConsumerGroupDispatcher.rendezvous_owner([])
