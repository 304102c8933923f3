"""Connected-components operator: the driver union-find fast path and
the distributed min-label-propagation fallback must agree exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_realtime_changefeed_spark.operators.components import (
    _components_distributed,
    connected_components,
)


def _labels(df):
    return sorted(map(tuple, df.collect()))


def test_distributed_equals_driver_on_synthetic_graph(spark):
    # two chains, one triangle-with-bridge, one isolated edge, ids
    # deliberately out of order so min-label really has to propagate
    pairs = spark.createDataFrame(
        [(9, 3), (3, 7), (12, 9),          # component min 3
         (20, 25), (25, 21), (21, 20), (21, 30),  # component min 20
         (101, 100)],                      # component min 100
        "u long, v long",
    )
    fast = connected_components(pairs, driver_threshold=1_000_000)
    dist = connected_components(pairs, driver_threshold=0)
    assert _labels(fast) == _labels(dist)
    got = dict(_labels(dist))
    assert got[12] == 3 and got[7] == 3
    assert got[30] == 20 and got[25] == 20
    assert got[101] == 100


def test_distributed_path_on_real_neardup_pairs(spark, sf_oracle):
    """Force the distributed path under llm_dedup_cluster's own pair
    graph (threshold 0) and check it equals the union-find result."""
    from db_realtime_changefeed_spark.catalog import load_table

    d = load_table(spark, sf_oracle, "documents")
    w = d.select(
        "doc_id", "lang", "n_chars",
        F.array_distinct(F.split("text", " ")).alias("ws"),
    )
    a, b = w.alias("a"), w.alias("b")
    inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
    jac = inter.cast("double") / (
        F.size(F.col("a.ws")) + F.size(F.col("b.ws")) - inter
    )
    pairs = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 10),
        )
        .where(jac > 0.5)
        .select(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .localCheckpoint(eager=True)  # pay the pair join once
    )
    assert pairs.count() > 0
    fast = connected_components(pairs, driver_threshold=1_000_000)
    dist = _components_distributed(pairs)
    assert _labels(fast) == _labels(dist)


def test_components_property_random_graphs(spark):
    """Property check on random graphs: the distributed min-label
    propagation must equal union-find exactly (bounded examples —
    each distributed run is several Spark jobs)."""
    import random

    rng = random.Random(7)
    for _ in range(4):
        n_nodes = rng.randint(2, 40)
        n_edges = rng.randint(1, 60)
        edges = [
            (rng.randrange(n_nodes * 3), rng.randrange(n_nodes * 3))
            for _ in range(n_edges)
        ]
        edges = [(u, v) for u, v in edges if u != v]
        if not edges:
            continue
        pairs = spark.createDataFrame(edges, "u long, v long")
        fast = connected_components(pairs, driver_threshold=1_000_000)
        dist = connected_components(pairs, driver_threshold=0)
        assert _labels(fast) == _labels(dist), f"mismatch on {edges}"


def test_bucketed_store_random_commit_sequences(spark, tmp_path):
    """Property: for a random sequence of keyed count deltas, the
    bucketed store's current state after N commits equals a plain
    dict fold — including replays (recommit of an old batch id after
    rewind) and GC of old versions."""
    import random

    from db_realtime_changefeed_spark.streaming.state_store import (
        BucketedMvccState,
    )

    rng = random.Random(7)
    ddl = "k long, cnt long"
    for trial in range(3):
        root = str(tmp_path / f"store-{trial}")
        store = BucketedMvccState(spark, root, ddl, "k", n_buckets=8)
        expect: dict[int, int] = {}
        base = None
        for b in range(5):
            delta = {
                rng.randrange(50): rng.randrange(1, 5)
                for _ in range(rng.randrange(1, 12))
            }
            for k, v in delta.items():
                expect[k] = expect.get(k, 0) + v
            ddf = spark.createDataFrame(sorted(delta.items()), ddl)
            touched = store.touched_buckets(ddf, "k")
            old = (
                store.df_at(base, buckets=touched)
                if base is not None
                else spark.createDataFrame([], ddl)
            )
            merged = (
                old.join(ddf.withColumnRenamed("cnt", "d"), "k", "full")
                .select(
                    "k",
                    (F.coalesce("cnt", F.lit(0))
                     + F.coalesce("d", F.lit(0))).alias("cnt"),
                )
            )
            store.commit(b, base, merged, touched)
            base = b
            got = {r["k"]: r["cnt"] for r in store.df_at(b).collect()}
            assert got == expect, f"trial {trial} batch {b}"
        # replay of the last batch onto its predecessor is idempotent
        b = 4
        ddf = spark.createDataFrame(
            [(k, 0) for k in range(3)], ddl
        )  # an empty-ish delta replayed differently would diverge;
        # replay the REAL merge: recompute from version b-1
        # (here: just recommit the same merged contents)
        prev = {r["k"]: r["cnt"] for r in store.df_at(b).collect()}
        touched = store.touched_buckets(store.df_at(b), "k")
        store.commit(b, b - 1, store.df_at(b), touched)
        got = {r["k"]: r["cnt"] for r in store.df_at(b).collect()}
        assert got == prev == expect
        # GC: keep last two versions; earlier manifests go, state stays
        removed = store.gc(keep={3, 4})
        assert set(removed) == {0, 1, 2}
        assert store.versions() == [3, 4]
        got = {r["k"]: r["cnt"] for r in store.df_at(4).collect()}
        assert got == expect


def test_countmin_sketch_guarantees(spark, sf_oracle):
    """Count-min can only OVERestimate, and at d=4 × w=64 over this
    vocabulary the heavy hitters must come back exact."""
    from pyspark.sql import functions as F

    from db_realtime_changefeed_spark.queries.llm_pipeline import countmin_estimates

    est = countmin_estimates(spark, sf_oracle)
    assert est.where(F.col("cm_est") < F.col("true_count")).count() == 0
    top = est.orderBy(F.col("true_count").desc()).limit(10)
    assert top.where(F.col("cm_est") != F.col("true_count")).count() == 0


def test_kmeans_invariants(spark, sf_oracle):
    """Lloyd's must have monotone non-increasing inertia, cover every
    vector exactly once, and be bit-deterministic across reruns
    (decimal-stabilized centroid updates)."""
    from pyspark.sql import functions as F

    from db_realtime_changefeed_spark.queries.llm_pipeline import kmeans_embeddings

    a, cents, hist = kmeans_embeddings(spark, sf_oracle)
    n_vecs = a.count()
    assert a.select("vec_id").distinct().count() == n_vecs
    assert cents.count() == 8
    assert all(
        hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1)
    ), f"inertia not monotone: {hist}"
    a2, _, hist2 = kmeans_embeddings(spark, sf_oracle)
    assert hist == hist2
    assert (
        a.select("vec_id", "cluster")
        .exceptAll(a2.select("vec_id", "cluster"))
        .count() == 0
    )


def test_catalog_adaptive_layout_fallback(spark, sf_oracle, tmp_path):
    """A testdata regeneration that changes physical column types
    must route through the adaptive read and still produce the
    canonical logical schema — degraded pushdown, correct values
    (the round-4 regeneration failure class)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from db_realtime_changefeed_spark.catalog import (
        SCHEMAS,
        _layout_mode,
        load_table,
        table_path,
    )

    tbl = pq.read_table(table_path(sf_oracle, "events"))
    tbl = tbl.set_column(
        tbl.schema.get_field_index("value"),
        "value",
        tbl.column("value").cast(pa.float32()),
    )
    d = str(tmp_path / "drifted")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))

    assert _layout_mode(os.path.join(d, "events.parquet"),
                        "events") == "adaptive"
    df = load_table(spark, d, "events")
    assert df.schema == SCHEMAS["events"]
    ref = load_table(spark, sf_oracle, "events")
    assert df.count() == ref.count()
    # float32→double keeps ordering/aggregation sane even if not
    # bit-identical; spot-check a value column invariant
    from pyspark.sql import functions as F

    lo, hi = df.agg(F.min("value"), F.max("value")).first()
    rlo, rhi = ref.agg(F.min("value"), F.max("value")).first()
    assert abs(lo - rlo) < 1e-3 and abs(hi - rhi) < 1e-2


def test_decode_image_optional_probe(monkeypatch):
    """decode_image routes through PIL when importable and raises a
    loud NotImplementedError otherwise — never a silent fake."""
    import pytest

    from db_realtime_changefeed_spark.operators import multimodal as mm

    if mm._PILImage is None:
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"\x89PNG...")
        # simulate an installed codec: the same call path activates it
        class FakeImg:
            width, height, mode = 2, 3, "L"

            def tobytes(self):
                return b"\x00" * 6

        class FakePIL:
            @staticmethod
            def open(fp):
                return FakeImg()

        monkeypatch.setattr(mm, "_PILImage", FakePIL)
        payload = b"\x89PNG..."
    else:  # real codec available: round-trip an actual image
        import io

        buf = io.BytesIO()
        mm._PILImage.new("L", (2, 3)).save(buf, format="PNG")
        payload = buf.getvalue()
    w, h, mode, px = mm.decode_image(payload)
    assert (w > 0 and h > 0 and isinstance(mode, str)
            and isinstance(px, bytes))


def test_catalog_caches_invalidate_on_regeneration(sf_oracle, tmp_path):
    """ADVICE r4: the footer caches are keyed by (path, size,
    mtime_ns), so regenerating a file IN PLACE with a different
    physical layout must re-sniff — not serve the stale decision for
    the life of the driver process. The replay chunk cache must
    likewise move to a new directory."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from db_realtime_changefeed_spark.catalog import (
        _layout_mode,
        parquet_ts_unit,
        table_path,
    )
    from db_realtime_changefeed_spark.streaming.replay import _chunk_dir

    d = str(tmp_path / "regen")
    os.makedirs(d)
    p = os.path.join(d, "events.parquet")
    shutil.copyfile(table_path(sf_oracle, "events"), p)

    unit0 = parquet_ts_unit(p)
    mode0 = _layout_mode(p, "events")
    chunks0 = _chunk_dir(d, "c4")
    assert mode0 in ("fast", "events_ns")

    # regenerate in place with ts as int64-nanos (the legacy layout)
    tbl = pq.read_table(p)
    import pyarrow as pa

    idx = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(
        idx, "ts", tbl.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(tbl, p)
    os.utime(p, ns=(os.stat(p).st_atime_ns,
                    os.stat(p).st_mtime_ns + 1_000_000))

    assert parquet_ts_unit(p) == "timestamp[ns]" != unit0
    assert _layout_mode(p, "events") == "events_ns"
    assert _chunk_dir(d, "c4") != chunks0, (
        "chunk cache dir must change when the backing file changes"
    )
    # per-table fingerprint: an orders-only cache keys off orders
    shutil.copyfile(table_path(sf_oracle, "orders"),
                    os.path.join(d, "orders.parquet"))
    o0 = _chunk_dir(d, "mtg-orders-c4", table="orders")
    e0 = _chunk_dir(d, "c4")
    os.utime(os.path.join(d, "orders.parquet"),
             ns=(0, os.stat(os.path.join(d, "orders.parquet"))
                 .st_mtime_ns + 1_000_000))
    assert _chunk_dir(d, "mtg-orders-c4", table="orders") != o0
    assert _chunk_dir(d, "c4") == e0, (
        "events cache must not churn on an orders-only regeneration"
    )
