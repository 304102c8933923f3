"""§2.J continued (round 6): training-order mechanics — curriculum
ordering with domain interleave, and duplicate-cluster-aware
downsampling (the SemDeDup-then-sample recipe).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from .llm import _JACCARD_PAIRS_SQL, _banded_jaccard_pairs


@query(
    "llm_curriculum_order",
    oracle="""
    WITH langs AS (
      SELECT lang,
             row_number() OVER (ORDER BY lang) - 1 AS lang_idx,
             count(*) OVER () AS n_langs
      FROM (SELECT DISTINCT lang FROM documents)
    ), r AS (
      SELECT d.doc_id, d.lang, d.n_chars, l.lang_idx,
             row_number() OVER (PARTITION BY d.lang
                                ORDER BY d.n_chars, d.doc_id) AS rn,
             l.n_langs
      FROM documents d JOIN langs l USING (lang)
    )
    SELECT doc_id, lang, n_chars, rn,
           CAST((rn - 1) * n_langs + lang_idx AS BIGINT)
             AS order_key
    FROM r
    """,
)
def llm_curriculum_order(spark, sf_dir):
    """Curriculum training order (easy-first scheduling with domain
    interleave): within each language docs are ranked easiest-first
    (n_chars ascending — the standard length-as-difficulty proxy;
    swap in any score column), and the global order round-robins
    across languages so no domain is front- or back-loaded.  The
    order key is PURE ARITHMETIC — (rn-1) * n_langs + lang_idx — so
    no single-partition global window and no global sort exist
    anywhere; consumers range-partition on order_key to materialize
    the schedule.

    The per-language rank itself is computed at the 100 TB shape: a
    plain row_number() OVER (PARTITION BY lang) would serialize each
    language through ONE task (3 languages = 3 tasks for the whole
    corpus), so rn is built in two levels — (1) a per-(lang,
    n_chars) histogram (one parallel shuffle, |langs|x|lengths|
    rows) whose running sum over the TINY histogram gives each
    difficulty bucket its starting offset, and (2) a row_number
    partitioned by (lang, n_chars) — thousands of fine partitions —
    breaking ties by doc_id inside each bucket.  rn = bucket offset
    + in-bucket rank reproduces the serial window's answer exactly
    (same oracle) with no per-language bottleneck."""
    d = load_table(spark, sf_dir, "documents")
    langs = (
        d.select("lang").distinct()
        .withColumn("lang_idx",
                    F.row_number().over(Window.orderBy("lang")) - 1)
        .withColumn("n_langs", F.count(F.lit(1)).over(
            Window.partitionBy()))
    )
    hist = d.groupBy("lang", "n_chars").agg(
        F.count(F.lit(1)).alias("bucket_n"))
    wh = (Window.partitionBy("lang").orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = hist.select(
        "lang", "n_chars",
        F.coalesce(F.sum("bucket_n").over(wh), F.lit(0))
        .alias("offset"))
    in_bucket = F.row_number().over(
        Window.partitionBy("lang", "n_chars").orderBy("doc_id"))
    return (
        d.join(F.broadcast(offsets), ["lang", "n_chars"])
        .join(F.broadcast(langs), "lang")
        .select(
            "doc_id", "lang", "n_chars",
            (F.col("offset") + in_bucket).cast("long").alias("rn"),
            "lang_idx", "n_langs",
        )
        .select(
            "doc_id", "lang", "n_chars", "rn",
            ((F.col("rn") - 1) * F.col("n_langs") + F.col("lang_idx"))
            .cast("long").alias("order_key"),
        )
    )


@query(
    "llm_cluster_downsample",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    cl AS (
      SELECT d.doc_id,
             CAST(least(d.doc_id, coalesce(min(r.b), d.doc_id))
                  AS BIGINT) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
      GROUP BY d.doc_id),
    sizes AS (
      SELECT cluster_id, count(*) AS cluster_size
      FROM cl GROUP BY cluster_id),
    k AS (
      SELECT c.doc_id, c.cluster_id, s.cluster_size,
             ((CAST(concat('0x',
                    substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) + 0.5) / 4294967296.0)
               * s.cluster_size AS race
      FROM cl c JOIN sizes s USING (cluster_id))
    SELECT doc_id, cluster_id, cluster_size,
           FLOOR(race * 1000000.0 + 0.5) / 1000000.0 AS key6
    FROM k
    ORDER BY race, doc_id
    LIMIT 60
    """,
)
def llm_cluster_downsample(spark, sf_dir):
    """Duplicate-cluster-aware downsampling (the SemDeDup-then-
    sample recipe): docs race with weight 1/cluster_size, so a
    near-dup cluster of size s contributes the SAME expected mass as
    a unique doc — sampling no longer over-represents boilerplate
    that survived dedup thresholds.  Clusters come from the banded-
    Jaccard near-dup components (the llm_dedup_cluster machinery);
    the race key is u * cluster_size with the exact dyadic-rational
    u (first 4 md5 bytes + 0.5) / 2^32 — u has 33 significand bits
    and cluster_size is a small integer, so the product is exact in
    IEEE and both engines hold bit-identical keys.  Map-side scoring
    + TakeOrdered heap top-k: the only shuffles are the pair-build
    and the cluster-size aggregate (both bounded by the dedup-pair
    count, not the corpus)."""
    from ..operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = (
        _banded_jaccard_pairs(spark, sf_dir)
        .where(F.col("jaccard") > 0.5)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    labels = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("label").alias("mapped"))
    cl = d.join(F.broadcast(labels), "doc_id", "left").select(
        "doc_id",
        F.coalesce("mapped", F.col("doc_id")).alias("cluster_id"))
    # sizes of NON-singleton clusters only — bounded by the docs that
    # appear in near-dup pairs (the dedup rate x corpus), never the
    # corpus itself; singletons default to 1 via coalesce. A count
    # over `cl` would be one row per doc — broadcastable here but a
    # scale bug at 10^12 docs.
    sizes = labels.groupBy(F.col("mapped").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("multi_size"))
    u = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("long").cast("double") + F.lit(0.5))
        / F.lit(4294967296.0)
    )
    race = u * F.col("cluster_size").cast("double")
    return (
        cl.join(F.broadcast(sizes), "cluster_id", "left")
        .withColumn("cluster_size",
                    F.coalesce("multi_size", F.lit(1)).cast("long"))
        .select("doc_id", "cluster_id", "cluster_size",
                race.alias("_race"))
        .orderBy("_race", "doc_id")
        .limit(60)
        .select(
            "doc_id", "cluster_id", "cluster_size",
            (F.floor(F.col("_race") * F.lit(1000000.0) + F.lit(0.5))
             .cast("double") / F.lit(1000000.0)).alias("key6"),
        )
    )


@query(
    "llm_mix_temperature",
    oracle="""
    WITH sizes AS (
      SELECT lang, count(*) AS n_l FROM documents GROUP BY lang
    ), shares AS (
      SELECT lang, n_l,
             sqrt(CAST(n_l AS DOUBLE)) AS s,
             sum(sqrt(CAST(n_l AS DOUBLE))) OVER () AS s_tot
      FROM sizes
    ), targets AS (
      SELECT lang, n_l,
             CAST(floor(200.0 * s / s_tot) AS BIGINT) AS target_n
      FROM shares
    ), r AS (
      SELECT d.doc_id, d.lang, t.n_l, t.target_n,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS rn
      FROM documents d JOIN targets t USING (lang))
    SELECT doc_id, lang, rn, target_n
    FROM r WHERE rn <= target_n
    """,
)
def llm_mix_temperature(spark, sf_dir):
    """Temperature-smoothed domain mixture (the XLM-R / mT5
    multilingual sampling rule, alpha = 0.5): each language's share
    of the 200-doc training mix is proportional to sqrt(corpus
    size), flattening the native skew — high-resource domains are
    downweighted, low-resource ones upweighted — with exact-count
    targets cut by ranking each language's docs on a
    content-independent hash (the llm_mix_quota mechanism with
    computed, not fixed, quotas).  sqrt is correctly rounded in
    IEEE 754, so the share computation is bit-identical in both
    engines; the floor() cut makes the integer targets exact.  One
    aggregate for sizes (broadcast back — |langs| rows), one
    per-language hash-rank shuffle; nothing driver-sized."""
    d = load_table(spark, sf_dir, "documents")
    sizes = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    shares = sizes.select(
        "lang", "n_l",
        F.sqrt(F.col("n_l").cast("double")).alias("s"),
    ).withColumn("s_tot", F.sum("s").over(Window.partitionBy()))
    targets = shares.select(
        "lang", "n_l",
        F.floor(F.lit(200.0) * F.col("s") / F.col("s_tot"))
        .cast("long").alias("target_n"),
    )
    rn = F.row_number().over(
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id"))
    return (
        d.join(F.broadcast(targets), "lang")
        .select("doc_id", "lang", rn.alias("rn"), "target_n")
        .where(F.col("rn") <= F.col("target_n"))
    )
