"""Registry invariants: the grading-priority list must name real
queries and fully control the head of the registry iteration order —
a typo here would silently waste the driver's grading budget."""

from __future__ import annotations

from db_realtime_changefeed_spark.queries import (
    _GRADE_PRIORITY,
    all_oracles,
    all_queries,
)


def test_priority_names_are_registered():
    qs = all_queries()
    missing = [n for n in _GRADE_PRIORITY if n not in qs]
    assert not missing, f"priority names not registered: {missing}"
    assert len(set(_GRADE_PRIORITY)) == len(_GRADE_PRIORITY), "dupes"


def test_priority_controls_registry_head():
    """Self-rotating order: every query WITHOUT an official green row
    in the latest CORRECTNESS file precedes every query with one, and
    within each class the _GRADE_PRIORITY relative order holds."""
    from db_realtime_changefeed_spark.queries import _officially_green

    green = _officially_green()
    qs = list(all_queries())
    first_green = next((i for i, n in enumerate(qs) if n in green), len(qs))
    assert all(n in green for n in qs[first_green:]), (
        "a non-green query sits behind green ones"
    )
    rank = {n: i for i, n in enumerate(_GRADE_PRIORITY)}
    for part in (qs[:first_green], qs[first_green:]):
        listed = [n for n in part if n in rank]
        assert listed == sorted(listed, key=rank.get), (
            "priority relative order broken"
        )
    # oracles iterate in the same order (driver zips them by name)
    oracle_names = [n for n in all_queries() if n in all_oracles()]
    assert list(all_oracles()) == oracle_names


def test_every_query_runs_or_has_oracle():
    """Every registered query either has an oracle (hash-graded) or
    is a deliberate rows-only op — keep that set explicit."""
    rows_only = set(all_queries()) - set(all_oracles())
    assert rows_only == {
        "agg_approx",
        "llm_dedup_minhash",
        "agg_sketch_hll",  # r3: DataSketches estimate is
        # engine-specific; accuracy tested instead
        "llm_kmeans",  # r4: iterative algorithm (the explicitly
        # non-SQL-expressible class); invariants tested instead
    }, f"unexpected rows-only set: {sorted(rows_only)}"


def test_no_complex_typed_output_columns(spark, sf_oracle):
    """The driver's pandas canonicalizer cannot sort array/map/struct
    cells (round-1 fn_array/fn_map FAILs; agg_collect caught by
    tools/driver_sweep.py in round 2). Ban complex types from EVERY
    graded output schema permanently.

    Runs at sf_oracle, NOT sf_smoke (r14): output schemas are
    SF-independent, and the memoized streaming runners are keyed on
    (session, sf_dir) — at sf_oracle this test rides the replays the
    parity suite already ran instead of re-running every streaming
    pipeline a second time at sf0.001 (measured: 497 s -> the
    non-memoized remainder)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = {}
    for name, fn in all_queries().items():
        schema = fn(spark, sf_oracle).schema
        complex_cols = [
            f.name for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex-typed output columns: {bad}"


def test_rows_only_amnesty_revoked_by_oracle_upgrade(tmp_path, monkeypatch):
    """VERDICT r4 item 1: a completed rows-only record (`err:
    no_oracle`) counts as officially green ONLY while the query still
    has no oracle. Once an oracle is added, the query must re-front so
    the driver's budget reaches its new hash check. Also pins
    failed != green: an official FAIL keeps the query at the front."""
    import json

    from db_realtime_changefeed_spark.queries import (
        ORACLES,
        _officially_green,
        load_all,
    )

    load_all()
    some_oracle = next(iter(ORACLES))
    p = tmp_path / "CORRECTNESS_r99.json"
    p.write_text(json.dumps({
        # rows-only record on a query that NOW has an oracle → not green
        some_oracle: {"hash_match": None, "err": "no_oracle",
                      "spark_rows": 5},
        # rows-only record on a genuinely oracle-less query → green
        "llm_kmeans": {"hash_match": None, "err": "no_oracle",
                       "spark_rows": 5},
        # official FAIL → never green
        "fn_string": {"hash_match": False, "rows_match": True,
                      "err": None, "spark_rows": 5, "oracle_rows": 5},
        # official hash pass → green
        "fn_date": {"hash_match": True, "rows_match": True,
                    "err": None, "spark_rows": 5, "oracle_rows": 5},
    }))
    import glob as glob_mod

    monkeypatch.setattr(glob_mod, "glob", lambda pat: [str(p)])
    green = _officially_green()
    assert some_oracle not in green, "amnesty must die with the upgrade"
    assert "llm_kmeans" in green, "oracle-less rows-only stays green"
    assert "fn_string" not in green, "failed != green"
    assert "fn_date" in green


def test_oracle_backed_ungraded_queries_front():
    """Durable form of the r5 rotation goal: every query that HAS an
    oracle but lacks an official hash-green row must precede every
    officially-green query in the grading order."""
    from db_realtime_changefeed_spark.queries import (
        _officially_green,
        all_oracles,
    )

    green = _officially_green()
    qs = list(all_queries())
    oracles = set(all_oracles())
    pending = [n for n in qs if n in oracles and n not in green]
    if pending:
        worst_pending = max(qs.index(n) for n in pending)
        first_green = min(
            (qs.index(n) for n in qs if n in green), default=len(qs))
        assert worst_pending < first_green, (
            f"oracle-backed ungraded queries parked behind green ones: "
            f"{[n for n in pending if qs.index(n) >= first_green]}"
        )


def test_stable_order_env_flag(monkeypatch):
    """SPARK_GRAFT_STABLE_ORDER=1 must yield a deterministic,
    environment-independent order: _GRADE_PRIORITY first (in list
    order), then declaration order — regardless of which
    CORRECTNESS files exist."""
    monkeypatch.setenv("SPARK_GRAFT_STABLE_ORDER", "1")
    qs = list(all_queries())
    rank = {n: i for i, n in enumerate(_GRADE_PRIORITY)}
    listed = [n for n in qs if n in rank]
    assert listed == _GRADE_PRIORITY, "stable order must follow the list"
    assert qs[: len(listed)] == listed, (
        "listed names must lead in stable mode"
    )


def test_rounded_quotients_are_tie_audited():
    """round(p/q, 6) on a RATIONAL quotient can land exactly on a
    6-dp midpoint, where Spark and DuckDB round in opposite
    directions (observed at sf0.1: -0.088309/26 = -0.0033965 in
    llm_dsir_weights). Such sites must use _util.dround6_div /
    sql_dround6_div (floor(p*1e6/q+0.5)/1e6 — tie-deterministic) or
    be explicitly audited here. Allowlisted as safe:
    - llm_score_model: sigmoid output is transcendental — an exact
      decimal midpoint has measure zero;
    - fn_try_errors: 4-dp values over divisors 1-4 terminate by the
      6th decimal (d in {1,2,4}: power-of-two scaling; d=3: thirds
      of integers never yield exact .5 multiples of 1e-6)."""
    import re

    import __spark_entry__ as e

    AUDITED_SAFE = {"llm_score_model", "fn_try_errors"}
    offenders = [
        name
        for name, sql in e.oracle_sql().items()
        if name not in AUDITED_SAFE
        and re.search(r"round\s*\([^()]*/", sql, re.IGNORECASE)
    ]
    assert not offenders, (
        f"unaudited rounded quotients (use dround6_div or audit): "
        f"{offenders}"
    )


def test_no_unfloored_casts_over_divisions():
    """DuckDB's CAST(double AS BIGINT/INTEGER) ROUNDS half-even;
    Spark's cast TRUNCATES. Any oracle casting a quotient to an
    integer type must wrap it in floor/ceil/round explicitly (found
    live in llm_vocab_growth's decile bucketing)."""
    import re

    import __spark_entry__ as e

    offenders = []
    for name, sql in e.oracle_sql().items():
        for m in re.finditer(
            r"CAST\(([^()]*(?:\([^()]*\))?[^()]*)\s+AS\s+"
            r"(BIGINT|INTEGER)\)",
            sql,
            re.I,
        ):
            inner = m.group(1)
            if "/" in inner and not re.search(
                r"floor|ceil|round", inner, re.I
            ):
                offenders.append((name, m.group(0)[:60]))
    assert not offenders, (
        f"unfloored integer casts over divisions: {offenders}"
    )


def test_operator_index_is_current():
    """docs/OPERATORS.md (the judge-facing inventory) must match the
    live registry — regenerate with tools/gen_operator_index.py."""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    import gen_operator_index

    want = gen_operator_index.build()
    with open(os.path.join(root, "docs", "OPERATORS.md")) as f:
        assert f.read() == want, "stale docs/OPERATORS.md — regenerate"
