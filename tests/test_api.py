"""Fluent client API surface (api.py): relational chains, SQL text,
and feed registration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db_realtime_changefeed_spark.api import Database
from db_realtime_changefeed_spark.catalog import load_table


def test_table_filter_df(spark, sf_smoke):
    db = Database(spark, sf_smoke)
    got = db.table("orders").filter("o_totalprice > 100000").df().count()
    want = (
        load_table(spark, sf_smoke, "orders")
        .where(F.col("o_totalprice") > 100000)
        .count()
    )
    assert got == want > 0


def test_unknown_table_rejected(spark, sf_smoke):
    with pytest.raises(KeyError):
        Database(spark, sf_smoke).table("nope")


def test_sql_surface(spark, sf_smoke):
    db = Database(spark, sf_smoke)
    n = db.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"]
    assert n == load_table(spark, sf_smoke, "lineitem").count()


def test_filtered_feed_state_and_log(spark, sf_smoke):
    feed = (
        Database(spark, sf_smoke)
        .table("events")
        .filter("event_type = 'purchase'")
        .changes(key="user_id")
    )
    state = feed.state()
    ev = load_table(spark, sf_smoke, "events").where(
        F.col("event_type") == "purchase"
    )
    batch = ev.groupBy("user_id").count()
    got = {r["user_id"]: r["cnt"] for r in state.collect()}
    want = {r["user_id"]: r["count"] for r in batch.collect()}
    assert got == want
    assert feed.log().count() > 0
