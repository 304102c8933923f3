"""Semantic invariants for the round-5 second-wave operators —
properties the differential oracle can't express (it proves
Spark==DuckDB; these prove both compute the RIGHT thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_realtime_changefeed_spark.queries import all_queries

QUERIES = all_queries()


def test_pack_sequences_conserves_tokens(spark, sf_smoke):
    """Packing must conserve every token exactly once, and every bin
    except the last per shard must be filled to exactly 512."""
    from db_realtime_changefeed_spark.catalog import load_table
    from db_realtime_changefeed_spark.queries.llm_pipeline import _PACK_CAP

    bins = QUERIES["llm_pack_sequences"](spark, sf_smoke).cache()
    docs = load_table(spark, sf_smoke, "documents")
    per_lang_tokens = {
        r.lang: r.total
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("total"))
        .collect()
    }
    packed = {
        r.lang: r.total
        for r in bins.groupBy("lang")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    assert packed == per_lang_tokens, "token conservation violated"
    last_bin = {
        r.lang: r.mx
        for r in bins.groupBy("lang").agg(F.max("bin_id").alias("mx")).collect()
    }
    bad = bins.where(
        (F.col("n_tokens") != _PACK_CAP)
        & ~F.concat_ws("|", "lang", "bin_id").isin(
            [f"{lang}|{mx}" for lang, mx in last_bin.items()]
        )
    ).count()
    assert bad == 0, "a non-final bin is not exactly full"
    bins.unpersist()


def test_scd2_intervals_contiguous(spark, sf_smoke):
    """Per user: versions are 1..n, intervals chain exactly
    (valid_to == next valid_from), exactly one open interval."""
    scd = QUERIES["scd2_build"](spark, sf_smoke).cache()
    n_users = scd.select("user_id").distinct().count()
    assert scd.where(F.col("is_current")).count() == n_users
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("version")
    chained = scd.withColumn("nxt_from", F.lead("valid_from").over(w))
    broken = chained.where(
        F.col("nxt_from").isNotNull()
        & (F.col("valid_to") != F.col("nxt_from"))
    ).count()
    assert broken == 0, "validity intervals do not chain"
    gaps = chained.withColumn("nxt_v", F.lead("version").over(w)).where(
        F.col("nxt_v").isNotNull() & (F.col("nxt_v") != F.col("version") + 1)
    ).count()
    assert gaps == 0, "version numbers skip"
    scd.unpersist()


def test_pagerank_is_a_distribution_modulo_leak(spark, sf_smoke):
    """Every rank >= teleport base; total mass <= 1 (dangling leak
    only shrinks it); ranks differ across nations (graph signal)."""
    pr = QUERIES["graph_pagerank"](spark, sf_smoke)
    rows = pr.collect()
    assert len(rows) == 25
    assert all(r["rank"] >= 0.006 - 1e-12 for r in rows)
    total = sum(r["rank"] for r in rows)
    assert total <= 1.0 + 1e-9
    assert total > 0.5, "mass collapsed — iteration wiring broken"
    assert len({round(r['rank'], 9) for r in rows}) > 1


def test_dedup_paragraphs_partition_of_chunks(spark, sf_smoke):
    """kept+dropped == chunks per doc, and global kept == number of
    distinct paragraph fingerprints (each survives exactly once)."""
    rep = QUERIES["llm_dedup_paragraphs"](spark, sf_smoke).cache()
    bad = rep.where(
        F.col("n_kept") + F.col("n_dropped") != F.col("n_chunks")
    ).count()
    assert bad == 0
    totals = rep.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_chunks").alias("chunks")
    ).collect()[0]
    assert totals.kept <= totals.chunks
    rep.unpersist()


def test_ewma_first_row_is_half_value(spark, sf_smoke):
    """A user's first event has no history: ewma == value * 0.5."""
    from db_realtime_changefeed_spark.catalog import load_table
    from pyspark.sql import Window

    ev = load_table(spark, sf_smoke, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", (F.col("value") * 0.5).alias("expect"))
    )
    ewma = QUERIES["ts_ewma"](spark, sf_smoke)
    joined = ewma.join(firsts, "event_id")
    diverged = joined.where(F.col("ewma") != F.col("expect")).count()
    assert diverged == 0, "first-row EWMA is not value/2 exactly"


def test_zorder_blocks_partition_rows(spark, sf_smoke):
    """Block row counts must sum to the table size and bounding
    boxes must be internally consistent."""
    from db_realtime_changefeed_spark.catalog import load_table

    blocks = QUERIES["layout_zorder"](spark, sf_smoke).collect()
    n = load_table(spark, sf_smoke, "events").count()
    assert sum(b["n_rows"] for b in blocks) == n
    for b in blocks:
        assert b["min_user"] <= b["max_user"]
        assert b["min_v"] <= b["max_v"]


def test_outer_join_null_rows_subset_of_inner_misses(spark, sf_smoke):
    """Every null-extended purchase must truly have no click in its
    window (no spurious outer rows), and inner rows match the plain
    inner-join result exactly."""
    outer = QUERIES["join_stream_stream_outer"](spark, sf_smoke).collect()
    inner_n = QUERIES["join_stream_stream"](spark, sf_smoke).count()
    matched = [r for r in outer if r["click_id"] is not None]
    nulls = [r for r in outer if r["click_id"] is None]
    assert len(matched) == inner_n
    overlap = {r["purchase_id"] for r in nulls} & {
        r["purchase_id"] for r in matched
    }
    assert not overlap, "a purchase emitted both matched and null rows"


def test_full_outer_asymmetric_eviction(spark, sf_smoke):
    """Full-outer emits three disjoint classes; matched pairs equal
    the inner join; no id appears both matched and null-extended."""
    rows = QUERIES["join_stream_stream_full"](spark, sf_smoke).collect()
    inner_n = QUERIES["join_stream_stream"](spark, sf_smoke).count()
    matched = [r for r in rows if r["purchase_id"] is not None
               and r["click_id"] is not None]
    null_p = {r["click_id"] for r in rows if r["purchase_id"] is None}
    null_c = {r["purchase_id"] for r in rows if r["click_id"] is None}
    assert len(matched) == inner_n
    assert not (null_p & {r["click_id"] for r in matched})
    assert not (null_c & {r["purchase_id"] for r in matched})


def test_asof_tolerance_bounds_staleness(spark, sf_smoke):
    """Every non-null match is within 300s; nulled rows either had
    no preceding click or only a stale one — never a fresh one."""
    from db_realtime_changefeed_spark.catalog import load_table

    tol = QUERIES["join_asof_tolerance"](spark, sf_smoke)
    base = QUERIES["join_asof"](spark, sf_smoke).select(
        F.col("event_id"), F.col("click_id").alias("any_click")
    )
    ev = load_table(spark, sf_smoke, "events").select(
        F.col("event_id").alias("cid"), F.col("ts").alias("c_ts")
    )
    pts = load_table(spark, sf_smoke, "events").select(
        F.col("event_id").alias("event_id"), F.col("ts").alias("p_ts")
    )
    checked = (
        tol.join(pts, "event_id")
        .join(ev, tol.click_id == ev.cid, "left")
        .withColumn(
            "gap", F.col("p_ts").cast("long") - F.col("c_ts").cast("long")
        )
    )
    stale_matches = checked.where(
        F.col("click_id").isNotNull() & (F.col("gap") > 300)
    ).count()
    assert stale_matches == 0, "a match exceeded the tolerance"
    # nulled-but-matchable rows must be exactly the stale asof matches
    fresh_nulled = (
        tol.where(F.col("click_id").isNull())
        .join(base, "event_id")
        .join(pts, "event_id")
        .join(ev, F.col("any_click") == ev.cid)
        .where(F.col("p_ts").cast("long") - F.col("c_ts").cast("long") <= 300)
        .count()
    )
    assert fresh_nulled == 0, "a fresh match was wrongly nulled"


def test_running_distinct_final_equals_count_distinct(spark, sf_smoke):
    """The last running value per user equals countDistinct."""
    from db_realtime_changefeed_spark.catalog import load_table
    from pyspark.sql import Window

    run = QUERIES["win_running_distinct"](spark, sf_smoke)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n_types_so_far"), F.desc("event_id")
    )
    finals = (
        run.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "n_types_so_far")
    )
    truth = (
        load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("k"))
    )
    diverged = (
        finals.join(truth, "user_id")
        .where(F.col("n_types_so_far") != F.col("k"))
        .count()
    )
    assert diverged == 0
