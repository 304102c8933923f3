"""Round-7 wave: independent re-derivations of span dedup, BPE merge
learning, and the sharded export summary (the repo's test model —
each graded result is rebuilt with plain Python/pandas and compared
exactly)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table
from db_realtime_changefeed_spark.queries import all_queries

QUERIES = all_queries()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_dedup_spans_matches_python_reference(spark, sf_smoke):
    from db_realtime_changefeed_spark.queries.round7 import _SPAN_W

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_smoke, "documents").collect()
    }
    counts: dict[str, int] = {}
    wins: dict[int, list[tuple[int, str]]] = {}
    for did, ws in docs.items():
        lst = []
        for i in range(1, len(ws) - _SPAN_W + 2):
            h = _md5(" ".join(ws[i - 1:i - 1 + _SPAN_W]))
            counts[h] = counts.get(h, 0) + 1
            lst.append((i, h))
        wins[did] = lst
    want = {}
    for did, lst in wins.items():
        dup = sorted(i for i, h in lst if counts[h] >= 2)
        if not dup:
            continue
        spans = []
        for i in dup:
            if spans and i <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], i + _SPAN_W - 1)
            else:
                spans.append([i, i + _SPAN_W - 1])
        covered = sum(e - s + 1 for s, e in spans)
        want[did] = (len(spans), covered, len(docs[did]))
    got = {
        r.doc_id: (r.n_spans, r.covered_tokens, r.n_tokens)
        for r in QUERIES["llm_dedup_spans"](spark, sf_smoke).collect()
    }
    assert got == want
    assert want, "fixture produced no duplicated spans"
    for n_spans, covered, n_tokens in got.values():
        assert 0 < covered <= n_tokens
        assert n_spans >= 1


def test_bpe_learn_matches_python_reference(spark, sf_smoke):
    from db_realtime_changefeed_spark.queries.round7 import (
        _BPE_ROUNDS,
    )

    freq: dict[str, int] = {}
    for r in load_table(spark, sf_smoke, "documents").collect():
        for t in r.text.split(" "):
            freq[t] = freq.get(t, 0) + 1
    seg = {t: list(t) for t in freq}
    want = []
    for rnd in range(1, _BPE_ROUNDS + 1):
        pc: dict[tuple[str, str], int] = {}
        for t, syms in seg.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + freq[t]
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rnd, f"{a} {b}", a + b, cnt))
        for t, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[t] = out
    got = sorted(
        (r.round, r.pair, r.merged, r.cnt)
        for r in QUERIES["llm_bpe_learn"](spark, sf_smoke).collect()
    )
    assert got == sorted(want)


def test_export_shards_contiguous_and_written_layout(
        spark, sf_smoke, tmp_path):
    from db_realtime_changefeed_spark.queries.round7 import _N_SHARDS

    rows = sorted(
        QUERIES["llm_export_shards"](spark, sf_smoke).collect(),
        key=lambda r: r.shard_id,
    )
    n_total = load_table(spark, sf_smoke, "documents").count()
    assert [r.shard_id for r in rows] == list(range(_N_SHARDS))
    assert sum(r.n_docs for r in rows) == n_total
    # equal range cut: shard sizes differ by at most 1, rank ranges
    # are contiguous and partition [0, N)
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    edges = [(r.min_rank, r.max_rank) for r in rows]
    assert edges[0][0] == 0 and edges[-1][1] == n_total - 1
    for (_, e0), (s1, _) in zip(edges, edges[1:]):
        assert s1 == e0 + 1
    # checksum recomputed independently from the ranked docs
    docs = sorted(
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", "text", "n_chars").collect(),
        key=lambda r: (r.n_chars, r.doc_id),
    )
    import collections

    ck = collections.defaultdict(int)
    tok = collections.defaultdict(int)
    for r0, d in enumerate(docs):
        sh = r0 * _N_SHARDS // n_total
        ck[sh] += int(_md5(d.text)[:10], 16)
        tok[sh] += len(d.text.split(" "))
    for r in rows:
        assert r.checksum == ck[r.shard_id]
        assert r.n_tokens == tok[r.shard_id]
    # the physical export path: range repartition + partitioned
    # write must land every shard in its own directory
    out = str(tmp_path / "shards")
    d = load_table(spark, sf_smoke, "documents")
    ranked = (
        d.withColumn(
            "r",
            F.row_number().over(
                __import__("pyspark.sql.window",
                           fromlist=["Window"]).Window
                .orderBy("n_chars", "doc_id")) - 1)
        .withColumn(
            "shard_id",
            F.floor(F.col("r") * _N_SHARDS / F.lit(n_total)))
    )
    (
        ranked.repartitionByRange(_N_SHARDS, "r")
        .write.partitionBy("shard_id").mode("overwrite").parquet(out)
    )
    import os

    dirs = sorted(x for x in os.listdir(out)
                  if x.startswith("shard_id="))
    assert len(dirs) == _N_SHARDS
    back = spark.read.parquet(out)
    assert back.count() == n_total


def test_tokenize_bpe_matches_python_reference(spark, sf_smoke):
    """Apply the same reference BPE (as in the learn test) and check
    per-doc subword counts; also n_bpe_tokens >= n_words always
    (merges only shrink within-word counts, floor 1)."""
    from db_realtime_changefeed_spark.queries.round7 import (
        _BPE_ROUNDS,
    )

    docs = load_table(spark, sf_smoke, "documents").collect()
    freq: dict[str, int] = {}
    for r in docs:
        for t in r.text.split(" "):
            freq[t] = freq.get(t, 0) + 1
    seg = {t: list(t) for t in freq}
    for _ in range(_BPE_ROUNDS):
        pc: dict[tuple[str, str], int] = {}
        for t, syms in seg.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + freq[t]
        (a, b), _c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for t, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[t] = out
    want = {
        r.doc_id: (
            len(r.text.split(" ")),
            sum(len(seg[t]) for t in r.text.split(" ")),
        )
        for r in docs
    }
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in QUERIES["llm_tokenize_bpe"](spark,
                                             sf_smoke).collect()
    }
    assert got == want
    assert all(bpe >= w for w, bpe in got.values())


def test_spans_rewrite_consistent_with_spans_report(spark, sf_smoke):
    """Cross-op consistency: clean token count per doc must equal
    n_tokens - covered_tokens from llm_dedup_spans (docs without
    spans keep every token), and the digest must equal the md5 of
    the independently rebuilt text."""
    spans = {
        r.doc_id: (r.covered_tokens, r.n_tokens)
        for r in QUERIES["llm_dedup_spans"](spark, sf_smoke).collect()
    }
    docs = {r.doc_id: r.text.split(" ")
            for r in load_table(spark, sf_smoke,
                                "documents").collect()}
    from db_realtime_changefeed_spark.queries.round7 import _SPAN_W

    counts: dict[str, int] = {}
    wins: dict[int, list[tuple[int, str]]] = {}
    for did, ws in docs.items():
        lst = []
        for i in range(1, len(ws) - _SPAN_W + 2):
            h = _md5(" ".join(ws[i - 1:i - 1 + _SPAN_W]))
            counts[h] = counts.get(h, 0) + 1
            lst.append((i, h))
        wins[did] = lst
    got = {
        r.doc_id: (r.clean_chars, r.clean_digest)
        for r in QUERIES["llm_dedup_spans_rewrite"](
            spark, sf_smoke).collect()
    }
    assert set(got) == set(docs)
    for did, ws in docs.items():
        cov = set()
        for i, h in wins[did]:
            if counts[h] >= 2:
                cov.update(range(i, i + _SPAN_W))
        clean = " ".join(t for p, t in enumerate(ws, start=1)
                         if p not in cov)
        assert got[did] == (len(clean), _md5(clean)), did
        if did in spans:
            kept_tokens = len(ws) - spans[did][0]
            n_clean_tokens = len(clean.split(" ")) if clean else 0
            assert n_clean_tokens == kept_tokens


def test_python_sink_manifest_excludes_orphans(spark, sf_smoke):
    """Two-phase-commit contract: the staging dir holds an orphan
    (planted by the query to simulate a crashed task's leftover),
    the manifest does not list it, and the manifest-honoring
    read-back returns exactly the source rows."""
    import json
    import os

    got = QUERIES["sink_python_datasource"](spark, sf_smoke)
    n_src = load_table(spark, sf_smoke, "events").count()
    assert got.count() == n_src
    # locate the sink root from the read-back file paths
    a_file = got.select(F.input_file_name()).first()[0]
    stage = os.path.dirname(a_file.replace("file://", ""))
    with open(os.path.join(os.path.dirname(stage),
                           "_MANIFEST.json")) as f:
        man = json.load(f)
    staged = {x for x in os.listdir(stage) if x.endswith(".parquet")}
    listed = {fn for fn, _ in man["files"]}
    assert "part-orphan-not-committed.parquet" in staged - listed
    assert man["rows"] == n_src


def test_python_stream_sink_one_manifest_per_batch(spark, sf_smoke):
    """The streaming connector sink must publish exactly one
    manifest per micro-batch, and the manifest union must cover
    every replayed row exactly once."""
    import glob
    import json
    import os

    from db_realtime_changefeed_spark.streaming.replay import (
        default_chunks,
    )

    got = QUERIES["sink_python_datasource_stream"](spark, sf_smoke)
    a_file = got.select(F.input_file_name()).first()[0]
    root = os.path.dirname(
        os.path.dirname(a_file.replace("file://", "")))
    manifests = sorted(glob.glob(os.path.join(root,
                                              "manifest-*.json")))
    assert len(manifests) == default_chunks()
    total = 0
    for man in manifests:
        with open(man) as f:
            total += sum(n for _, n in json.load(f)["files"])
    assert total == load_table(spark, sf_smoke, "events").count()
    assert got.count() == total
