"""Table catalog: explicit StructType per graded table, asserted on
read so scale-factor directories can never drift (SURVEY.md §1.3).

Schemas are the measured parquet schemas from FIXTURES.md (driver
testdata, seed=42). `register_views` exposes every table as a temp
view so operators can be written in either DataFrame or SQL form.

100 TB note: at cluster scale these would be partitioned/bucketed
external tables (e.g. lineitem bucketed by l_orderkey, events
partitioned by date(ts)); the loader keeps that swap localized here —
operators only ever see named DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON-encoded string
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

TABLE_NAMES = tuple(SCHEMAS)

# Raw-read variant for a timestamp[ns] physical layout: Spark's
# vectorized reader cannot narrow ns→µs directly, so ts comes in as
# the raw int64 nanos and load_table converts.
EVENTS_NS_SCHEMA = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.LongType())
        for f in SCHEMAS["events"].fields
    ]
)

_TS_UNIT_CACHE: dict[tuple[str, str, int, int], str] = {}


def _file_stamp(path: str) -> tuple[int, int]:
    """(size, mtime_ns) cache-key component: an in-process testdata
    regeneration (the round-4 failure class — same path, new physical
    layout) must miss the footer caches, mirroring the replay chunk
    cache's fingerprint (streaming/replay.py:_chunk_dir)."""
    import os

    st = os.stat(path)
    return (st.st_size, st.st_mtime_ns)


def parquet_ts_unit(path: str, column: str = "ts") -> str:
    """Physical type of `column` in a parquet file (or the first file
    of a directory), e.g. 'timestamp[us]' or 'timestamp[ns]'. The
    driver regenerates testdata between rounds and has shipped BOTH
    layouts (round ≤3: timestamp[ns]; round 4: timestamp[us]), so the
    loader sniffs the footer instead of hard-coding either. One
    driver-side footer read per (file, column, size, mtime) — the
    file-stamp key re-sniffs after an in-process regeneration.

    An empty DIRECTORY (a live-feed source dir polled before its
    first ingest) reports the canonical 'timestamp[us]': live files
    are always produced from load_table output, which is µs by
    construction. Not cached — the answer could change once files
    arrive under a hypothetical ns layout."""
    import glob
    import os

    p = path
    if os.path.isdir(p):
        files = sorted(glob.glob(os.path.join(p, "*.parquet")))
        if not files:
            return "timestamp[us]"
        p = files[0]
    key = (p, column, *_file_stamp(p))
    if key not in _TS_UNIT_CACHE:
        import pyarrow.parquet as pq

        _TS_UNIT_CACHE[key] = str(pq.read_schema(p).field(column).type)
    return _TS_UNIT_CACHE[key]


def ns_to_us(df: DataFrame, column: str = "ts") -> DataFrame:
    """int64-nanos → µs TimestampType with integer floor division
    (values are post-epoch, so floor == DuckDB's truncation).
    `DIV 1000` stays in int64 — a double roundtrip would lose
    precision at 1.7e18."""
    return df.withColumn(
        column, F.timestamp_micros(F.expr(f"{column} DIV 1000"))
    )


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


# Physical types the forced-schema fast path is KNOWN to read
# correctly for each logical type. Anything outside this map routes
# through the adaptive fallback instead of silently misreading —
# round 4's testdata regeneration (timestamp[ns] → timestamp[us])
# proved that a layout drift under a forced schema can corrupt values
# without erroring.
_SAFE_PHYSICAL: dict[str, set[str]] = {
    "bigint": {"int64"},
    "int": {"int32"},
    "double": {"double"},
    "string": {"string", "large_string"},
    "timestamp": {"timestamp[us]", "timestamp[ms]"},
    "array<float>": {"list<element: float>", "list<item: float>"},
}

_LAYOUT_CACHE: dict[tuple[str, str, int, int], str] = {}


def _layout_mode(path: str, name: str) -> str:
    """'fast' when every column's physical type is known-safe for the
    forced-schema read; 'events_ns' for the legacy int64-nanos events
    layout; 'adaptive' otherwise (footer read once per file state —
    the (size, mtime) key component re-sniffs after a regeneration)."""
    key = (path, name, *_file_stamp(path))
    if key not in _LAYOUT_CACHE:
        import pyarrow.parquet as pq

        phys = {f.name: str(f.type) for f in pq.read_schema(path)}
        if (name == "events"
                and phys.get("ts") == "timestamp[ns]"):
            _LAYOUT_CACHE[key] = "events_ns"
        else:
            ok = all(
                phys.get(f.name) in _SAFE_PHYSICAL.get(
                    f.dataType.simpleString(), set())
                for f in SCHEMAS[name].fields
                if f.name in phys
            ) and all(f.name in phys for f in SCHEMAS[name].fields)
            _LAYOUT_CACHE[key] = "fast" if ok else "adaptive"
    return _LAYOUT_CACHE[key]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-asserted parquet read. Column pruning + predicate
    pushdown flow through automatically (verified in tests via
    explain() — SURVEY.md §4).

    Layout drift protection: the footer is sniffed once per (path,
    table). Known layouts use the forced-schema fast path (full
    pushdown); the legacy int64-nanos events layout converts; any
    UNKNOWN physical layout falls back to Spark's inferred read with
    per-column casts to the canonical logical schema — slower (casts
    can block pushdown) but correct, so a future testdata
    regeneration degrades performance instead of corrupting values."""
    path = table_path(sf_dir, name)
    mode = _layout_mode(path, name)
    if mode == "events_ns":
        df = spark.read.schema(EVENTS_NS_SCHEMA).parquet(path)
        return ns_to_us(df)
    if mode == "adaptive":
        df = spark.read.parquet(path)
        cols = []
        for f in SCHEMAS[name].fields:
            c = F.col(f.name)
            if df.schema[f.name].dataType != f.dataType:
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name))
        return df.select(*cols)
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every graded table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
