"""§2.K UDF / UDAF / UDTF surface — the sanctioned Python escape
hatches, all Arrow-batched (pandas_udf / applyInPandas / mapInPandas).
Never row-at-a-time Python UDFs (10-100× slower — task brief).

Each query's oracle re-expresses the Python logic in SQL, proving the
UDF computes what it claims. pandas_udf objects are built lazily
inside the query functions (their DDL return types need an active
SparkSession to parse).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from . import query


@query(
    "udf_scalar_pandas",
    oracle="""
    SELECT event_id, value,
           CAST(1.0 / (1.0 + exp(-value)) AS FLOAT) AS sig
    FROM events
    """,
)
def udf_scalar_pandas(spark, sf_dir):
    """§2.K1 — vectorized scalar pandas UDF (Series→Series, Arrow
    transfer). float32 output absorbs numpy-vs-libm exp ulp
    differences."""

    @pandas_udf("float")
    def sigmoid(v: pd.Series) -> pd.Series:
        import numpy as np

        return (1.0 / (1.0 + np.exp(-v))).astype("float32")

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "value", sigmoid("value").alias("sig"))


@query(
    "udaf_grouped_agg",
    oracle="""
    SELECT user_id,
           max(value) - min(value) AS value_range,
           count(*) AS n
    FROM events
    GROUP BY user_id
    """,
)
def udaf_grouped_agg(spark, sf_dir):
    """§2.K2 — grouped-aggregate pandas UDF (Series→scalar).
    max-min is order-insensitive and exact → oracle-checkable."""

    @pandas_udf("double")
    def vrange(v: pd.Series) -> float:
        return float(v.max() - v.min())

    @pandas_udf("long")
    def vcount(v: pd.Series) -> int:
        return len(v)

    # pandas grouped-agg UDFs cannot mix with JVM aggregates in one
    # agg() — both metrics go through the pandas path.
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        vrange("value").alias("value_range"),
        vcount("value").alias("n"),
    )


@query(
    "udtf_grouped_map",
    oracle="""
    SELECT event_id, user_id,
           value - min(value) OVER (PARTITION BY user_id) AS delta_from_min,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id)
                AS BIGINT) AS seq
    FROM events
    """,
)
def udtf_grouped_map(spark, sf_dir):
    """§2.K3 — applyInPandas grouped map (DataFrame→DataFrame per
    group). Scale note: each group must fit one executor's memory —
    fine for per-user event history; for giant groups pre-aggregate
    or salt first (docs/SCALE.md).

    The pandas fn is a closure (NOT a module-level function) so
    cloudpickle ships it BY VALUE — workers need not have this
    package on their import path (the grading driver may launch from
    any cwd)."""

    def group_normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        import pandas as pd  # noqa: F811 — worker-side import

        pdf = pdf.sort_values("event_id")
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                # exact group-min subtraction: deterministic doubles
                "delta_from_min": pdf["value"] - pdf["value"].min(),
                "seq": range(1, len(pdf) + 1),
            }
        )

    # r13: (a) pass ONLY the columns the kernel reads (guide §4.1 —
    # grouped-map is opaque to Catalyst; without this select the
    # shuffle and the Arrow boundary carry ts/event_type/props, the
    # JSON blob, for nothing); (b) pin the keyed exchange to
    # defaultParallelism when the input is under-split — AQE
    # coalesces the tiny shuffle by BYTES and serializes the pandas
    # stage onto 1-2 partitions (measured 3.1 s -> 1.2 s at sf0.1;
    # _util.pin_group_parallelism, no-op on well-split tables).
    from ._util import pin_group_parallelism

    ev = pin_group_parallelism(
        load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "value"),
        "user_id")
    return ev.groupBy("user_id").applyInPandas(
        group_normalize,
        "event_id long, user_id long, delta_from_min double, seq long",
    )


@query(
    "udtf_lateral",
    oracle="""
    SELECT doc_id, CAST(i AS INTEGER) AS pos, words[i] AS word
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         unnest(range(1, len(words) + 1)) AS t(i)
    """,
)
def udtf_lateral(spark, sf_dir):
    """§2.K4 — table-function surface via mapInPandas (1→N rows,
    Arrow-batched; never materializes the whole table). Closure-
    defined for by-value pickling (see udtf_grouped_map)."""

    def explode_words(batches):
        import pandas as pd  # worker-side import

        for pdf in batches:
            words = pdf["text"].str.split(" ")
            n = words.str.len()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(n),
                    "pos": [i + 1 for ws in words for i in range(len(ws))],
                    "word": [w for ws in words for w in ws],
                }
            )

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInPandas(
        explode_words, "doc_id long, pos int, word string"
    )


@query(
    "udtf_python_native",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    c AS (SELECT doc_id, term, count(*) AS cnt
          FROM t GROUP BY doc_id, term),
    r AS (SELECT doc_id, term, cnt,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY cnt DESC, term) AS rn
          FROM c)
    SELECT doc_id, term, CAST(cnt AS INTEGER) AS cnt
    FROM r WHERE rn <= 3
    """,
)
def udtf_python_native(spark, sf_dir):
    """§2.K4 completed with the NATIVE Python UDTF API (PySpark
    3.5+/4.x `@udtf`, invoked via LATERAL): per-document top-3 terms.
    This grades the UDTF API surface itself — the oracle proves the
    same result is SQL-expressible (unnest + group + rank), and the
    engine's scale path for this exact computation is the Catalyst
    form (explode + count + WindowGroupLimit, cf. win_topk_per_group);
    a row-at-a-time Python UDTF is never the hot path, which is why
    it appears exactly once in the graded surface, as API coverage."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="term string, cnt int")
    class TopTerms:
        def eval(self, text: str, k: int):
            from collections import Counter

            top = sorted(
                Counter(text.split()).items(), key=lambda t: (-t[1], t[0])
            )[:k]
            for term, cnt in top:
                yield term, cnt

    from ..catalog import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("top_terms_py", TopTerms)
    return spark.sql(
        "SELECT d.doc_id, t.term, t.cnt "
        "FROM documents d, LATERAL top_terms_py(d.text, 3) t"
    )


@query(
    "udtf_map_in_arrow",
    oracle="""
    SELECT event_id, value,
           value * 1.1 + CAST(user_id AS DOUBLE) AS adjusted
    FROM events
    """,
)
def udtf_map_in_arrow(spark, sf_dir):
    """mapInArrow — the zero-copy tier below mapInPandas: batches
    arrive as pyarrow RecordBatches and never materialize a pandas
    frame, so there is no index/dtype conversion cost on either
    side. The right escape hatch when the Python logic is itself
    Arrow-native (compute kernels, Arrow-backed model runtimes).
    Shuffle-free; the oracle re-expresses the kernel arithmetic."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )

    def _kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            t = pa.Table.from_batches([b])
            # same IEEE op order as the oracle (mul then add) →
            # bitwise-identical doubles; no round() anywhere — the
            # engines' round kernels differ in the last ulp
            adj = pc.add(
                pc.multiply(t.column("value"), pa.scalar(1.1)),
                pc.cast(t.column("user_id"), pa.float64()),
            )
            out = pa.table(
                {
                    "event_id": t.column("event_id"),
                    "value": t.column("value"),
                    "adjusted": adj,
                }
            )
            yield from out.to_batches()

    return ev.mapInArrow(
        _kernel, schema="event_id long, value double, adjusted double"
    )


@query(
    "udtf_grouped_map_arrow",
    oracle="""
    SELECT event_id, event_type,
           (value - min(value) OVER (PARTITION BY event_type))
           / (max(value) OVER (PARTITION BY event_type)
              - min(value) OVER (PARTITION BY event_type)) AS scaled
    FROM events
    """,
)
def udtf_grouped_map_arrow(spark, sf_dir):
    """groupBy().applyInArrow (Spark 4) — the grouped-map tier of
    the Arrow-native escape hatch: each group arrives as ONE pyarrow
    Table (no pandas materialization), the kernel is pure Arrow
    compute. Demo kernel: per-event_type min-max scaling. min/max
    are order-insensitive and exact, subtraction and division are
    single correctly-rounded IEEE ops, so the Arrow kernel and the
    oracle's window form agree bitwise. Same per-group memory bound
    as applyInPandas (documented in udtf_grouped_map); the Catalyst
    window equivalent in the oracle is the production path when the
    kernel is expressible."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )

    def _kernel(key, table):
        import pyarrow as pa
        import pyarrow.compute as pc

        mm = pc.min_max(table.column("value"))
        rng = pc.subtract(mm["max"], mm["min"])
        scaled = pc.divide(
            pc.subtract(table.column("value"), mm["min"]), rng
        )
        return pa.table(
            {
                "event_id": table.column("event_id"),
                "event_type": table.column("event_type"),
                "scaled": scaled,
            }
        )

    return ev.groupBy("event_type").applyInArrow(
        _kernel, schema="event_id long, event_type string, scaled double"
    )


@query(
    "udtf_cogrouped_map",
    oracle="""
    SELECT p.user_id, p.event_id, p.value,
           c.event_id AS click_id, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.event_id >= c.event_id
    """,
)
def udtf_cogrouped_map(spark, sf_dir):
    """Cogrouped applyInPandas (§2.K extra): both sides grouped on
    user_id, each group PAIR handed to one pandas worker that runs
    merge_asof — the escape hatch for per-key algorithms needing
    both sides in memory at once. The oracle is the SAME ASOF join
    the pure-Catalyst join_asof grades against, so this proves the
    cogrouped path computes identical semantics. Scale: one shuffle
    of each side on user_id; per-group memory is the bound to watch
    (power-law users), which is why the Catalyst form is the
    default and this the fallback."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
    )

    def _asof(left, right):
        left = left.sort_values("event_id")
        right = right.sort_values("click_id")
        out = pd.merge_asof(
            left, right.drop(columns=["user_id"]),
            left_on="event_id", right_on="click_id",
            direction="backward", allow_exact_matches=True,
        )
        return out[["user_id", "event_id", "value",
                    "click_id", "click_value"]]

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            _asof,
            schema="user_id long, event_id long, value double,"
                   " click_id long, click_value double",
        )
    )


@query(
    "udf_scalar_arrow",
    oracle="""
    SELECT p_partkey,
           replace(p_brand, 'Brand#', 'B') || '/'
               || CAST(p_size // 10 AS VARCHAR) AS bin
    FROM part
    """,
)
def udf_scalar_arrow(spark, sf_dir):
    """Arrow-optimized Python UDF (§2.K extra) — Spark 4's
    useArrow=True variant of the classic scalar udf(): Arrow batch
    transfer like a pandas UDF, but the wrapped function keeps the
    one-value-in/one-value-out signature, so existing per-row
    lambdas upgrade without a rewrite. Registered as deliberate API
    coverage on the PART DIMENSION (thousands of rows, never a
    fact-table hot path): per-element Python still runs inside the
    batch, so udf_scalar_pandas' vectorized form remains the
    production path the module docstring mandates. Pure string/int
    arithmetic — engine-exact."""

    @F.udf("string", useArrow=True)
    def brand_bin(brand: str, size: int) -> str:
        return f"{brand.replace('Brand#', 'B')}/{size // 10}"

    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", brand_bin("p_brand", "p_size").alias("bin")
    )


@query(
    "udtf_polymorphic",
    oracle="""
    WITH u AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    c AS (SELECT doc_id, term, count(*) AS cnt
          FROM u GROUP BY doc_id, term),
    r AS (SELECT doc_id, term,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY cnt DESC, term) AS rn
          FROM c)
    SELECT doc_id,
           max(CASE WHEN rn = 1 THEN term END) AS term_1,
           max(CASE WHEN rn = 2 THEN term END) AS term_2,
           max(CASE WHEN rn = 3 THEN term END) AS term_3
    FROM r GROUP BY doc_id
    """,
)
def udtf_polymorphic(spark, sf_dir):
    """POLYMORPHIC Python UDTF (§2.K4 extra, Spark 4): the static
    analyze() hook computes the OUTPUT SCHEMA from the call's
    constant arguments at plan time — top_terms_wide(text, 3) emits
    columns term_1..term_3, (text, 5) would emit five, one
    registration serving every arity (the dynamic-schema contract
    behind built-ins like variant_explode). Same API-coverage
    posture as udtf_python_native: a per-row Python UDTF is never
    the hot path, and the oracle proves the k=3 instance is plain
    rank + conditional aggregation in Catalyst."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class TopTermsWide:
        @staticmethod
        def analyze(text: AnalyzeArgument,
                    k: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(1, k.value + 1):
                st = st.add(f"term_{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text: str, k: int):
            from collections import Counter

            top = sorted(
                Counter(text.split()).items(),
                key=lambda t: (-t[1], t[0]),
            )[:k]
            row = [t for t, _ in top] + [None] * (k - len(top))
            yield tuple(row)

    from ..catalog import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("top_terms_wide", TopTermsWide)
    return spark.sql(
        "SELECT d.doc_id, w.* "
        "FROM documents d, LATERAL top_terms_wide(d.text, 3) w"
    )
