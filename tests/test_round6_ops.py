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
