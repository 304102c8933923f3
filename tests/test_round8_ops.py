"""Round-8 operator behavior pins (beyond oracle parity): the
update-aware ANN index must actually exercise the non-monotone
hazards it claims to handle, and the statistical tests must emit
well-formed statistics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.catalog import load_table
from db_realtime_changefeed_spark.queries import all_queries
from db_realtime_changefeed_spark.queries.round8 import (
    _rotate1,
    _upd_chunks,
)
from db_realtime_changefeed_spark.queries.llm import _N_PLANES, _ndl_proj

QUERIES = all_queries()


def _signature_df(spark, emb_col):
    bits = [
        F.when(_ndl_proj(emb_col, p) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        for p in range(_N_PLANES)
    ]
    return sum(bits[1:], bits[0])


def test_update_fixture_is_not_vacuous(spark, sf_oracle):
    """The rotated updates must actually move at least one vector's
    LSH bucket (otherwise the stale-exclusion machinery is never
    exercised) and at least one updated vector must keep its bucket
    (exercising same-bucket version replacement)."""
    e = load_table(spark, sf_oracle, "embeddings")
    upd = e.where((F.col("vec_id") % 10).between(1, 3))
    rot = F.concat(F.slice("embedding", 2, F.size("embedding") - 1),
                   F.slice("embedding", 1, 1))
    both = upd.select(
        "vec_id",
        _signature_df(spark, F.col("embedding")).alias("b_old"),
        _signature_df(spark, rot).alias("b_new"),
    )
    moved = both.where(F.col("b_old") != F.col("b_new")).count()
    stayed = both.where(F.col("b_old") == F.col("b_new")).count()
    assert moved > 0, "no update changes its bucket — scenario vacuous"
    assert moved + stayed == upd.count()


def test_update_index_serves_latest_state(spark, sf_oracle):
    """The final probe must equal a batch-built top-10 over the
    LATEST state (original embeddings for never-updated vecs, rotated
    for updated ones) restricted to the query's bucket — i.e. the
    incremental index converges to the rebuild."""
    out = QUERIES["llm_index_maintain_updates"](spark, sf_oracle)
    last_b = out.agg(F.max("batch_id")).collect()[0][0]
    final = {
        (r["vec_id"], round(r["cos_sim"], 9))
        for r in out.where(F.col("batch_id") == last_b).collect()
    }

    from pyspark.sql import Window as W

    e = load_table(spark, sf_oracle, "embeddings")
    n = e.count()
    per = math.ceil(n / 4)
    chunk = F.floor(
        (F.row_number().over(W.orderBy("vec_id")) - 1) / per)
    rot = F.concat(F.slice("embedding", 2, F.size("embedding") - 1),
                   F.slice("embedding", 1, 1))
    updated = ((F.col("vec_id") % 10).between(1, 3)
               & (chunk < F.col("vec_id") % 10))
    latest = e.select(
        "vec_id", "label",
        F.when(updated, rot).otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    qe = e.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    qbucket = (
        spark.createDataFrame([(qe,)], "qe array<float>")
        .select(_signature_df(spark, F.col("qe")).alias("b"))
        .collect()[0]["b"]
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y,
                       lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)

    qcol = F.lit(qe).cast("array<float>")
    ee = F.col("embedding")
    cos = dot(ee, qcol) / (F.sqrt(dot(ee, ee)) * F.sqrt(dot(qcol, qcol)))
    want = {
        (r["vec_id"], round(r["cos_sim"], 9))
        for r in (
            latest.where(
                (_signature_df(spark, F.col("embedding")) == qbucket)
                & (F.col("vec_id") != 0))
            .select("vec_id", cos.alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), "vec_id")
            .limit(10)
            .collect()
        )
    }
    assert final == want


def test_update_fixture_chunks_carry_rearrivals(spark, sf_oracle):
    """Chunk k (k>=1) must contain both its slice and the rotated
    re-arrivals of earlier vectors with vec_id % 10 == k."""
    import glob

    import pyarrow.parquet as pq

    chunks = sorted(glob.glob(_upd_chunks(spark, sf_oracle) + "/*.parquet"))
    assert len(chunks) == 4
    c1 = pq.read_table(chunks[1]).to_pylist()
    ids = [r["vec_id"] for r in c1]
    dups_from_past = [r for r in c1 if r["vec_id"] % 10 == 1]
    assert dups_from_past, "no re-arrivals in chunk 1"
    e = {r["vec_id"]: list(r["embedding"])
         for r in pq.read_table(chunks[0]).to_pylist()}
    for r in dups_from_past:
        if r["vec_id"] in e:  # update of a chunk-0 vector
            assert list(r["embedding"]) == _rotate1(e[r["vec_id"]])


def test_ks_and_mw_statistics_well_formed(spark, sf_oracle):
    ks = QUERIES["dq_ks_test"](spark, sf_oracle).collect()[0]
    assert 0.0 <= ks["d_stat"] <= 1.0
    assert ks["n_a"] > 0 and ks["n_b"] > 0
    mw = QUERIES["dq_mann_whitney"](spark, sf_oracle).collect()[0]
    assert 0.0 <= mw["u_stat"] <= mw["n_a"] * mw["n_b"]
    t = QUERIES["dq_ttest_welch"](spark, sf_oracle).collect()[0]
    assert min(t["n_a"], t["n_b"]) - 1 <= t["welch_df"] \
        <= t["n_a"] + t["n_b"] - 2


def test_holt_fitted_is_one_step_forecast(spark, sf_oracle):
    """fitted[t] must equal level[t-1] + trend[t-1] for every t>=1 —
    the one-step-ahead forecast contract, checked engine-side."""
    from pyspark.sql import Window as W

    df = QUERIES["ts_holt_linear"](spark, sf_oracle)
    w = W.partitionBy("event_type").orderBy("day")
    bad = df.select(
        "event_type", "day", "fitted",
        (F.lag("level").over(w) + F.lag("trend").over(w)).alias("want"),
    ).where(
        F.col("want").isNotNull() & (F.col("fitted") != F.col("want"))
    ).count()
    assert bad == 0


def test_delete_index_tombstones_bite(spark, sf_oracle):
    """The tombstone machinery must actually be exercised: at least
    one deleted vector hashes into the probe bucket (so the
    latest-version exclusion runs), and no deleted vector is ever
    served after its tombstone batch."""
    from db_realtime_changefeed_spark.queries.round8 import (
        _DEL_BATCH,
        _DEL_MOD,
    )

    e = load_table(spark, sf_oracle, "embeddings")
    n = e.count()
    per = math.ceil(n / 4)
    qe = e.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    qbucket = (
        spark.createDataFrame([(qe,)], "qe array<float>")
        .select(_signature_df(spark, F.col("qe")).alias("b"))
        .collect()[0]["b"]
    )
    from pyspark.sql import Window as W

    chunk = F.floor(
        (F.row_number().over(W.orderBy("vec_id")) - 1) / per)
    deleted = e.select(
        "vec_id", chunk.alias("chunk"),
        _signature_df(spark, F.col("embedding")).alias("b"),
    ).where((F.col("vec_id") % 10 == _DEL_MOD)
            & (F.col("chunk") < _DEL_BATCH))
    in_bucket = deleted.where(F.col("b") == qbucket).count()
    assert in_bucket > 0, "no deleted vector in the probe bucket — vacuous"

    out = QUERIES["llm_index_maintain_deletes"](spark, sf_oracle)
    dead_ids = {r["vec_id"] for r in deleted.collect()}
    served_dead = out.where(
        (F.col("batch_id") >= _DEL_BATCH)
        & F.col("vec_id").isin(*dead_ids)).count()
    assert served_dead == 0, "a tombstoned vector was served"
    # and at least one of them WAS served before the tombstone batch
    served_before = out.where(
        (F.col("batch_id") < _DEL_BATCH)
        & F.col("vec_id").isin(*dead_ids)).count()
    assert served_before > 0, "deletion never changed served results"
