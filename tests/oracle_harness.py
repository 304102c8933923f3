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


def canon_frame(pdf) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    rows.sort()
    return cols, rows


def run_pair(spark, sf_dir: str, query_fn, oracle: str):
    sdf = query_fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    con = duck_con(sf_dir)
    duck_pdf = con.sql(oracle).df()
    con.close()
    return spark_pdf, duck_pdf


def assert_match(name: str, spark_pdf, duck_pdf) -> None:
    s_cols, s_rows = canon_frame(spark_pdf)
    d_cols, d_rows = canon_frame(duck_pdf)
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
