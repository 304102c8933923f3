"""Client-facing fluent API — the surface a changefeed-DB user
actually types: `db.table("events").filter(...).changes()`, in the
style of RethinkDB's ReQL (`r.table(...).filter(...).changes()`) and
CockroachDB's `CREATE CHANGEFEED FOR ... WITH ...`.

Everything resolves to the same engine underneath: relational chains
return live DataFrames (full Catalyst surface via `.df()` or
continued DataFrame methods), and `.changes(...)` registers a
standing query on the replayed CDC stream via ChangefeedRunner.

Example::

    from db_realtime_changefeed_spark.api import Database

    db = Database(spark, "/root/testdata/sf0.01")
    # batch relational
    big = db.table("orders").filter("o_totalprice > 100000").df()
    # standing filtered aggregate feed
    feed = (db.table("events")
              .filter("event_type = 'purchase'")
              .changes(key="user_id"))
    feed.state()   # materialized per-user aggregate DataFrame
    feed.log()     # {old,new} delta rows per trigger
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLE_NAMES, load_table
from .streaming.changefeed import ChangefeedRunner


class Feed:
    """A standing query: materialized state + change log."""

    def __init__(self, runner: ChangefeedRunner):
        self._runner = runner

    def state(self) -> DataFrame:
        return self._runner.state()

    def log(self) -> DataFrame:
        return self._runner.log()


class TableRef:
    """A lazily-filtered table reference. Relational use: `.df()`
    (full DataFrame API from there). Feed use: `.changes(key=...)`.

    Filters accumulate as SQL predicate strings so `.changes()` can
    re-apply them to the CDC payload (`after.<col>`) — the standing
    query filters the change stream itself, not a snapshot."""

    def __init__(self, db: "Database", name: str,
                 predicates: tuple[str, ...] = ()):
        if name not in TABLE_NAMES:
            raise KeyError(f"unknown table {name!r}; one of {TABLE_NAMES}")
        self._db = db
        self._name = name
        self._predicates = predicates

    def filter(self, predicate_sql: str) -> "TableRef":
        return TableRef(
            self._db, self._name, self._predicates + (predicate_sql,)
        )

    def df(self) -> DataFrame:
        out = load_table(self._db.spark, self._db.sf_dir, self._name)
        for p in self._predicates:
            out = out.where(p)
        return out

    def changes(self, key: str = "event_type",
                driver_merge: bool | str = "auto") -> Feed:
        """Register a standing keyed count+sum over this table's CDC
        stream (only `events` replays in this fixture set) and run it
        to completion over the available changes. Filters apply to
        the change payload, so rows that never match never touch
        state."""
        if self._name != "events":
            raise NotImplementedError(
                "CDC replay fixtures exist only for 'events'"
            )
        filter_sql = None
        if self._predicates:
            filter_sql = " AND ".join(f"({p})" for p in self._predicates)
        runner = ChangefeedRunner(
            self._db.spark,
            self._db.sf_dir,
            driver_merge=driver_merge,
            key=key,
            filter_sql=filter_sql,
        )
        runner.run()
        return Feed(runner)


class Database:
    """Entry point binding a SparkSession to a data directory."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def table(self, name: str) -> TableRef:
        return TableRef(self, name)

    def sql(self, query: str) -> DataFrame:
        """SQL-text surface over the registered views."""
        from .catalog import register_views

        register_views(self.spark, self.sf_dir)
        return self.spark.sql(query)
