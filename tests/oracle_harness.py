"""Local replica of the driver's DuckDB differential oracle
(SURVEY.md §5.2): run a registered Spark query and its oracle SQL on
the same parquet, canonicalize both results, and diff values exactly.

Stricter than the driver (exact value equality, not just hash) so
that passing here implies passing any order-insensitive value-hash.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np

from db_realtime_changefeed_spark.catalog import TABLE_NAMES, table_path


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def canon_cell(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "nan"
        return repr(f)  # round-trip repr → bitwise-sensitive
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, np.datetime64):
        return str(v.astype("datetime64[us]"))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted((str(k), canon_cell(x)) for k, x in v.items())
        return "{" + ",".join(f"{k}:{x}" for k, x in items) + "}"
    if v != v:  # pandas NaT / NaN fallbacks
        return "<NULL>"
    return str(v)


def canon_frame(cols: list[str], raw_rows) -> tuple[list[str], list[tuple[str, ...]]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon_cell(row[i]) for i in order) for row in raw_rows]
    rows.sort()
    return sorted(cols), rows


def run_pair(spark, sf_dir: str, query_fn, oracle: str):
    """Returns ((cols, rows), (cols, rows)) as raw python objects —
    Row.collect() and fetchall() both preserve date vs datetime,
    Decimal, and nested lists without pandas dtype widening."""
    sdf = query_fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)
    con = duck_con(sf_dir)
    rel = con.sql(oracle)
    duck_cols = list(rel.columns)
    # The DRIVER canonicalizes through pandas, where a HUGEINT output
    # column (DuckDB's sum-of-integers result type) widens to float64
    # and hash-mismatches Spark's int64 ("900" vs "900.0"). fetchall
    # preserves Python ints and would mask it — fail loudly instead:
    # the oracle must CAST such sums to BIGINT.
    huge = [c for c, t in zip(rel.columns, rel.types)
            if str(t) in ("HUGEINT", "UHUGEINT")]
    assert not huge, (
        f"oracle outputs HUGEINT column(s) {huge} — pandas widens these "
        f"to float64 at the driver; CAST(... AS BIGINT) in the oracle"
    )
    duck_rows = rel.fetchall()
    con.close()
    return (spark_cols, spark_rows), (duck_cols, duck_rows)


def assert_match(name: str, spark_res, duck_res) -> None:
    s_cols, s_rows = canon_frame(*spark_res)
    d_cols, d_rows = canon_frame(*duck_res)
    assert s_cols == d_cols, (
        f"{name}: column mismatch\n spark={s_cols}\n duck ={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(s_rows, d_rows))
            if a != b
        ][:5]
        msg = "\n".join(
            f"  row {i}:\n    spark={a}\n    duck ={b}" for i, a, b in diffs
        )
        raise AssertionError(
            f"{name}: {len([1 for a, b in zip(s_rows, d_rows) if a != b])}"
            f" differing rows (cols={s_cols}); first diffs:\n{msg}"
        )
