"""§2.J LLM-data-pipeline operators (mandated extension) plus the
training-pipeline extras: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding near-dup), similarity search (brute-force
+ LSH-bucketed ANN), text analysis (lang-ID, quality, tokens,
fingerprints).

Scale design (100 TB, docs/SCALE.md): everything here is
shuffle-on-key DataFrame ops — shingle explode → hash → min-agg for
MinHash (no driver-side state), band-bucket equi-join for candidate
pairs (never an all-pairs cross join), block-keyed joins for exact
verification. Cosine math stays in Catalyst higher-order functions
(zip_with/aggregate fold) — JVM codegen, no Python.

Determinism: Spark's fold (F.aggregate) and DuckDB's list_aggregate
both add doubles sequentially left-to-right → dot products are
BITWISE equal across engines (verified in tests), so cosine
thresholds and orderings agree exactly.
"""

from __future__ import annotations


from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import (DEC, dround6_div, dsum, sql_dround6_div,
                    sql_dsum)

# ------------------------------------------------------------------ dedup

@query(
    "llm_dedup_exact",
    oracle="""
    SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS text_hash,
           min(doc_id) AS keep_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def llm_dedup_exact(spark, sf_dir):
    """Exact dedup by normalized-text hash (§2.J1): one hash-groupBy,
    map-side partial agg; at 100 TB this is a single shuffle of
    (16-byte hash, id) pairs, never the text itself."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    return d.groupBy(h.alias("text_hash")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


_N_MINHASH = 32
_N_BANDS = 8  # 4 rows per band


def _rebalanced(df):
    """Spread an under-split scan across all cores before a
    CPU-heavy map stage — now a thin wrapper over _util.fan_out
    (r13 optimization round), which replaced the keyless round-robin
    repartition with a deterministic hash fan-out on doc_id where
    available: round-robin pays a sortBeforeRepartition local sort of
    the whole input (measured at sf0.1: ~half the exchange cost);
    hashpartitioning on pmod(xxhash64(doc_id), 64*cores) spreads just
    as evenly, skips the sort, and is retry-deterministic (guide
    §2.5). Split estimation and the at-scale no-op behavior are
    unchanged — see fan_out's docstring."""
    from ._util import fan_out

    cols = ("doc_id",) if "doc_id" in df.columns else ()
    return fan_out(df, *cols)


def _shingles(d, k: int = 3):
    """Distinct k-word shingles per doc via sequence+transform —
    stays in Catalyst (no UDF). Input rebalanced: the per-shingle
    hashing downstream is the CPU hot spot of the dedup family."""
    d = _rebalanced(d)
    words = F.split(F.col("text"), " ")
    idx = F.sequence(F.lit(1), F.size(words) - (k - 1))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    return d.where(F.size(words) >= k).select(
        "doc_id", F.explode(F.array_distinct(sh)).alias("shingle")
    )


@query("llm_dedup_minhash")  # rows-only: hash family is engine-specific
def llm_dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup candidates (§2.J2), pure DataFrame:
    shingle→xxhash64→32 seeded re-hashes→per-doc min→8 bands of 4→
    band-bucket self-join. The only join is an equi-join on
    (band_idx, band_hash) — candidate generation is O(collisions),
    not O(n²), which is the property that survives 100 TB.
    Hash-graded twin: llm_dedup_minhash_md5 (same plan, portable md5
    family) — this xxhash64 form stays the scale path."""
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d).withColumn("h", F.xxhash64("shingle"))
    # seeded hash family via xxhash64(seed, h): ANSI-safe (no long
    # overflow), deterministic, and independent across seeds.
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("h"))).alias(f"mh{i}")
            for i in range(_N_MINHASH)
        ]
    )
    rows_per_band = _N_MINHASH // _N_BANDS
    bands = mins.select(
        "doc_id",
        F.array(
            *[
                F.xxhash64(
                    F.lit(b),
                    *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
                for b in range(_N_BANDS)
            ]
        ).alias("band_hashes"),
        F.array(*[F.col(f"mh{i}") for i in range(_N_MINHASH)]).alias("sig"),
    )
    exploded = bands.select(
        "doc_id", "sig", F.posexplode("band_hashes").alias("band_idx", "band_hash")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(float(_N_MINHASH))
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))


def _minhash_md5_oracle() -> str:
    """DuckDB twin of llm_dedup_minhash_md5, generated from the same
    (_N_MINHASH, _N_BANDS) constants so the two engines cannot drift."""
    rpb = _N_MINHASH // _N_BANDS
    mins = ",\n             ".join(
        f"min(md5('{i}|' || shingle)) AS mh{i}"
        for i in range(_N_MINHASH)
    )
    band_hashes = ",\n             ".join(
        "md5(" + " || ".join(f"mh{b * rpb + r}" for r in range(rpb))
        + f") AS bh{b}"
        for b in range(_N_BANDS)
    )
    carry = ", ".join(f"mh{i}" for i in range(_N_MINHASH))
    union = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, bh{b} AS band_hash, {carry} "
        "FROM bands"
        for b in range(_N_BANDS)
    )
    eq_count = " + ".join(
        f"(CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END)"
        for i in range(_N_MINHASH)
    )
    return f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    s AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(range(1, len(words) - 1),
                 i -> array_to_string(words[i:i+2], ' ')))) AS shingle
      FROM w WHERE len(words) >= 3),
    m AS (
      SELECT doc_id,
             {mins}
      FROM s GROUP BY doc_id),
    bands AS (
      SELECT doc_id, {carry},
             {band_hashes}
      FROM m),
    x AS ({union})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({eq_count} AS DOUBLE) / {float(_N_MINHASH)} AS est_jaccard
    FROM x a JOIN x b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    """


@query("llm_dedup_minhash_md5", oracle=_minhash_md5_oracle())
def llm_dedup_minhash_md5(spark, sf_dir):
    """Portable-hash twin of llm_dedup_minhash: the SAME banded-LSH
    plan (shingle → 32-fn min-hash signature → 8 bands of 4 →
    band-bucket equi self-join, O(collisions) candidates) with the
    hash family swapped from Spark's xxhash64 to md5 hex strings —
    md5 renders identically in every engine and hex strings compare
    bytewise the same everywhere, so the full pipeline is
    cross-engine exact and hash-GRADED (the r4 simhash-upgrade
    pattern). xxhash64 stays the documented scale path: md5-per-
    shingle-per-function costs ~3x (measured r4), confined to this
    twin. Min-hash i = min over shingles of md5('i|' || shingle);
    band hash = md5 of its 4 concatenated member hashes."""
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d)
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))
                      .cast("binary"))
            ).alias(f"mh{i}")
            for i in range(_N_MINHASH)
        ]
    )
    rpb = _N_MINHASH // _N_BANDS
    mh_cols = [F.col(f"mh{i}") for i in range(_N_MINHASH)]
    bands = mins.select(
        "doc_id",
        *mh_cols,
        F.array(
            *[
                F.md5(
                    F.concat(*[F.col(f"mh{b * rpb + r}")
                               for r in range(rpb)]).cast("binary")
                )
                for b in range(_N_BANDS)
            ]
        ).alias("band_hashes"),
    )
    exploded = bands.select(
        "doc_id", *mh_cols,
        F.posexplode("band_hashes").alias("band_idx", "band_hash"),
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    eq_count = sum(
        [
            (F.col(f"a.mh{i}") == F.col(f"b.mh{i}")).cast("int")
            for i in range(_N_MINHASH)
        ],
        F.lit(0),
    )
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (eq_count.cast("double") / F.lit(float(_N_MINHASH)))
            .alias("est_jaccard"),
        )
        .distinct()
    )


@query(
    "llm_dedup_simhash",
    oracle="""
    WITH wc AS (
      SELECT doc_id, w, count(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY doc_id, w),
    bits AS (
      SELECT doc_id,
             sum(CASE WHEN substring(md5(w), 1, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b0,
             sum(CASE WHEN substring(md5(w), 2, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b1,
             sum(CASE WHEN substring(md5(w), 3, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b2,
             sum(CASE WHEN substring(md5(w), 4, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b3,
             sum(CASE WHEN substring(md5(w), 5, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b4,
             sum(CASE WHEN substring(md5(w), 6, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b5,
             sum(CASE WHEN substring(md5(w), 7, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b6,
             sum(CASE WHEN substring(md5(w), 8, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b7,
             sum(CASE WHEN substring(md5(w), 9, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b8,
             sum(CASE WHEN substring(md5(w), 10, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b9,
             sum(CASE WHEN substring(md5(w), 11, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b10,
             sum(CASE WHEN substring(md5(w), 12, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b11,
             sum(CASE WHEN substring(md5(w), 13, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b12,
             sum(CASE WHEN substring(md5(w), 14, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b13,
             sum(CASE WHEN substring(md5(w), 15, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b14,
             sum(CASE WHEN substring(md5(w), 16, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b15,
             sum(CASE WHEN substring(md5(w), 17, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b16,
             sum(CASE WHEN substring(md5(w), 18, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b17,
             sum(CASE WHEN substring(md5(w), 19, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b18,
             sum(CASE WHEN substring(md5(w), 20, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b19,
             sum(CASE WHEN substring(md5(w), 21, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b20,
             sum(CASE WHEN substring(md5(w), 22, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b21,
             sum(CASE WHEN substring(md5(w), 23, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b22,
             sum(CASE WHEN substring(md5(w), 24, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b23,
             sum(CASE WHEN substring(md5(w), 25, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b24,
             sum(CASE WHEN substring(md5(w), 26, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b25,
             sum(CASE WHEN substring(md5(w), 27, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b26,
             sum(CASE WHEN substring(md5(w), 28, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b27,
             sum(CASE WHEN substring(md5(w), 29, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b28,
             sum(CASE WHEN substring(md5(w), 30, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b29,
             sum(CASE WHEN substring(md5(w), 31, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b30,
             sum(CASE WHEN substring(md5(w), 32, 1) IN ('1','3','5','7','9','b','d','f') THEN cnt ELSE -cnt END) AS b31
      FROM wc GROUP BY doc_id)
    SELECT doc_id,
           CAST((CASE WHEN b0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN b1 > 0 THEN 2 ELSE 0 END) + (CASE WHEN b2 > 0 THEN 4 ELSE 0 END) + (CASE WHEN b3 > 0 THEN 8 ELSE 0 END) + (CASE WHEN b4 > 0 THEN 16 ELSE 0 END) + (CASE WHEN b5 > 0 THEN 32 ELSE 0 END) + (CASE WHEN b6 > 0 THEN 64 ELSE 0 END) + (CASE WHEN b7 > 0 THEN 128 ELSE 0 END) + (CASE WHEN b8 > 0 THEN 256 ELSE 0 END) + (CASE WHEN b9 > 0 THEN 512 ELSE 0 END) + (CASE WHEN b10 > 0 THEN 1024 ELSE 0 END) + (CASE WHEN b11 > 0 THEN 2048 ELSE 0 END) + (CASE WHEN b12 > 0 THEN 4096 ELSE 0 END) + (CASE WHEN b13 > 0 THEN 8192 ELSE 0 END) + (CASE WHEN b14 > 0 THEN 16384 ELSE 0 END) + (CASE WHEN b15 > 0 THEN 32768 ELSE 0 END) + (CASE WHEN b16 > 0 THEN 65536 ELSE 0 END) + (CASE WHEN b17 > 0 THEN 131072 ELSE 0 END) + (CASE WHEN b18 > 0 THEN 262144 ELSE 0 END) + (CASE WHEN b19 > 0 THEN 524288 ELSE 0 END) + (CASE WHEN b20 > 0 THEN 1048576 ELSE 0 END) + (CASE WHEN b21 > 0 THEN 2097152 ELSE 0 END) + (CASE WHEN b22 > 0 THEN 4194304 ELSE 0 END) + (CASE WHEN b23 > 0 THEN 8388608 ELSE 0 END) + (CASE WHEN b24 > 0 THEN 16777216 ELSE 0 END) + (CASE WHEN b25 > 0 THEN 33554432 ELSE 0 END) + (CASE WHEN b26 > 0 THEN 67108864 ELSE 0 END) + (CASE WHEN b27 > 0 THEN 134217728 ELSE 0 END) + (CASE WHEN b28 > 0 THEN 268435456 ELSE 0 END) + (CASE WHEN b29 > 0 THEN 536870912 ELSE 0 END) + (CASE WHEN b30 > 0 THEN 1073741824 ELSE 0 END) + (CASE WHEN b31 > 0 THEN 2147483648 ELSE 0 END) AS BIGINT) AS simhash
    FROM bits ORDER BY doc_id
    """,
)
def llm_dedup_simhash(spark, sf_dir):
    """32-bit SimHash per document: sign of the count-weighted sum of
    each hash bit over the doc's words. Hash-graded (upgraded from
    rows-only in r4): the bit source is the LOW BIT OF EACH HEX DIGIT
    of md5(word) — md5 renders identically on both engines, so the
    whole fingerprint is cross-engine exact, unlike the previous
    xxhash64 family. Pure integer Catalyst expressions; one explode +
    one groupBy at any scale."""
    return _simhash_unordered(spark, sf_dir).orderBy("doc_id")


def _simhash_unordered(spark, sf_dir):
    """The simhash relation without the presentation ORDER BY, shared
    with consumers that re-sort anyway (llm_simhash_hamming_knn).

    r14 (guide §2.2 — shuffle fewer stages, not just fewer bytes):
    the oracle's count-weighted sum over DISTINCT (doc_id, word)
    pairs equals the plain signed sum over word OCCURRENCES
    (sum_w cnt(w)·sign(w) == sum_occ sign(w), exact integers), so the
    intermediate groupBy(doc_id, w) — one full-width shuffle of the
    exploded words plus two aggregate stages — is dropped and the 32
    bit-sums fold straight off the explode. Plan: 3 Exchanges -> 2
    per fingerprint arm; md5 is computed once per occurrence (CSE
    across the 32 CASE branches), same as before per surviving row."""
    d = _rebalanced(load_table(spark, sf_dir, "documents"))
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    hexd = F.md5(F.col("w").cast("binary"))
    odd_digits = ["1", "3", "5", "7", "9", "b", "d", "f"]
    bit_sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.substring(hexd, i + 1, 1).isin(*odd_digits),
                    F.lit(1),
                ).otherwise(-1)
            ).alias(f"b{i}".format(i=i))
            for i in range(32)
        ]
    )
    return bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"b{i}".format(i=i)) > 0,
                       F.lit(2 ** i).cast("long")).otherwise(0)
                for i in range(32)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )


def _banded_jaccard_pairs(spark, sf_dir):
    """Shared blocked candidate-pair builder for the Jaccard verify
    stage: pairs with same lang, |Δn_chars| <= 10, doc_a < doc_b,
    with word-set Jaccard attached.

    The length band is part of the SHUFFLE KEY, not a post-join
    filter: each doc lands in one floor(n_chars/10) bucket, the
    probe side is exploded into its ±1 neighboring buckets (any
    |Δn_chars| <= 10 pair must share or border a bucket since the
    bucket width equals the band), and the join is the EQUI join on
    (lang, bucket) with the exact |Δ| <= 10 predicate as a residual
    filter — the join_range_bucketed pattern (analytics.py). lang
    alone has ~5 distinct values, so at 100 TB a lang-only equi key
    degenerates to O(n²/5) pair enumeration on 5 hot keys; the
    composite key keeps work O(true pairs + bucket collisions)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / F.lit(10))
    w = d.select(
        "doc_id", "lang", "n_chars",
        F.array_distinct(F.split("text", " ")).alias("ws"),
    )
    a = w.select(
        F.col("doc_id").alias("doc_a"), "lang",
        F.col("n_chars").alias("nc_a"), F.col("ws").alias("ws_a"),
        bucket.alias("bk"),
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"), "lang",
        F.col("n_chars").alias("nc_b"), F.col("ws").alias("ws_b"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bk"),
    )
    inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b")))
    jac = inter.cast("double") / (
        F.size(F.col("ws_a")) + F.size(F.col("ws_b")) - inter
    )
    return (
        a.join(b, ["lang", "bk"])
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("nc_a") - F.col("nc_b")) <= 10)
        )
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )


@query(
    "llm_dedup_ngram_jaccard",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, n_chars,
             list_distinct(string_split(text, ' ')) AS ws
      FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
             / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))
             AS jaccard
    FROM w a JOIN w b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= 10
    WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
             / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) > 0.5
    """,
)
def llm_dedup_ngram_jaccard(spark, sf_dir):
    """Exact word-set Jaccard over blocked candidate pairs (§2.J
    extra) — the standard verify stage after MinHash candidates.
    Candidate generation is the banded (lang, n_chars-bucket) equi
    join (_banded_jaccard_pairs); the all-pairs and lang-only-
    blocked forms would not survive scale."""
    return (
        _banded_jaccard_pairs(spark, sf_dir)
        .where(F.col("jaccard") > 0.5)
    )


def _dot(x, y):
    prods = F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


_SQL_DOT = (
    "list_aggregate(list_transform(range(1, len({x})+1),"
    " i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)), 'sum')"
)


def _sql_dot(x, y):
    return _SQL_DOT.format(x=x, y=y)


@query(
    "llm_neardup_embedding",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           {_sql_dot('a.embedding', 'b.embedding')}
             / (sqrt({_sql_dot('a.embedding', 'a.embedding')})
              * sqrt({_sql_dot('b.embedding', 'b.embedding')})) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_sql_dot('a.embedding', 'b.embedding')}
             / (sqrt({_sql_dot('a.embedding', 'a.embedding')})
              * sqrt({_sql_dot('b.embedding', 'b.embedding')})) > 0.35
    """,
)
def llm_neardup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (§2.J extra), label-blocked.
    Cosines are bitwise-identical to DuckDB (sequential double fold
    on both sides), so the 0.35 threshold cuts the same set.

    EXACT DEMO ONLY — label has few distinct values, so this is
    O(n²/labels) within each block and does NOT survive 100 TB.
    The production path is llm_neardup_embedding_lsh (banded
    hyperplane signatures in the shuffle key, same verify stage) or
    llm_knn_lsh / llm_knn_ivf for top-k retrieval."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    ea, eb = F.col("a.embedding"), F.col("b.embedding")
    cos = _dot(ea, eb) / (F.sqrt(_dot(ea, ea)) * F.sqrt(_dot(eb, eb)))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_sim"),
        )
        .where(F.col("cos_sim") > 0.35)
    )


#: banded-LSH near-dup: 4 bands x 4 hyperplanes (AND within a band,
#: OR across bands). Plane weights are small integers from a fixed
#: affine-mod formula — exactly representable doubles, so Spark and
#: DuckDB compute bit-identical projections with no libm involved.
_NDL_BANDS, _NDL_ROWS = 4, 4


def _ndl_proj(emb, p: int):
    """Projection of `emb` onto deterministic pseudo-plane p: weight
    for dim i (0-based) = ((p*131 + i*17) % 7) - 3 ∈ [-3, 3]."""
    idx = F.sequence(F.lit(0), F.size(emb) - 1)
    w = F.transform(
        idx, lambda i: ((F.lit(p * 131) + i * 17) % 7 - 3).cast("double")
    )
    return F.aggregate(
        F.zip_with(emb, w, lambda x, wv: x.cast("double") * wv),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _ndl_sql_proj(p_expr: str) -> str:
    """The same projection in DuckDB SQL (i is 1-based there)."""
    return (
        "list_aggregate(list_transform(range(1, len(e.embedding)+1),"
        f" i -> CAST(e.embedding[i] AS DOUBLE)"
        f" * CAST((({p_expr})*131 + (i-1)*17) % 7 - 3 AS DOUBLE)),"
        " 'sum')"
    )


def _ndl_sql_band_hash() -> str:
    return " + ".join(
        f"(CASE WHEN {_ndl_sql_proj(f'b.band*{_NDL_ROWS}+{r}')} > 0"
        f" THEN {2 ** r} ELSE 0 END)"
        for r in range(_NDL_ROWS)
    )


@query(
    "llm_neardup_embedding_lsh",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
    sig AS (
      SELECT e.vec_id, e.label, b.band,
             {_ndl_sql_band_hash()} AS bh
      FROM e, (SELECT unnest(range({_NDL_BANDS})) AS band) b
    ),
    cand AS (
      SELECT DISTINCT s1.vec_id AS vec_a, s2.vec_id AS vec_b
      FROM sig s1 JOIN sig s2
        ON s1.label = s2.label AND s1.band = s2.band AND s1.bh = s2.bh
       AND s1.vec_id < s2.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           {_sql_dot('ea.embedding', 'eb.embedding')}
             / (sqrt({_sql_dot('ea.embedding', 'ea.embedding')})
              * sqrt({_sql_dot('eb.embedding', 'eb.embedding')})) AS cos_sim
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.vec_a
    JOIN embeddings eb ON eb.vec_id = c.vec_b
    WHERE {_sql_dot('ea.embedding', 'eb.embedding')}
             / (sqrt({_sql_dot('ea.embedding', 'ea.embedding')})
              * sqrt({_sql_dot('eb.embedding', 'eb.embedding')})) > 0.35
    """,
)
def llm_neardup_embedding_lsh(spark, sf_dir):
    """Banded-LSH near-dup over embeddings — the scale form of
    llm_neardup_embedding: candidate pairs come from an EQUI join
    whose shuffle key is (label, band, band_hash), never a
    label-only block. 4 bands of 4 deterministic hyperplane sign
    bits each (OR-amplified across bands); candidates are deduped,
    exact cosine re-verifies, and the 0.35 threshold cuts the final
    set. Output = the exact variant's pairs RESTRICTED to
    band-collision survivors — approximate by design, but fully
    deterministic (integer plane weights, bit-identical folds), so
    the DuckDB oracle reproduces it hash-exactly. At 100 TB the
    shuffle key has ~labels × bands × 2^rows distinct values and
    work is O(collisions), not O(n²/labels)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")

    def band_hash(band: int):
        bits = [
            F.when(_ndl_proj(emb, band * _NDL_ROWS + r) > 0, F.lit(2 ** r))
            .otherwise(F.lit(0))
            for r in range(_NDL_ROWS)
        ]
        return sum(bits[1:], bits[0])

    sig = e.select(
        "vec_id", "label",
        F.posexplode(
            F.array(*[band_hash(bd) for bd in range(_NDL_BANDS)])
        ).alias("band", "bh"),
    )
    s1 = sig.select(F.col("vec_id").alias("vec_a"),
                    "label", "band", "bh")
    s2 = sig.select(F.col("vec_id").alias("vec_b"),
                    "label", "band", "bh")
    cand = (
        s1.join(s2, ["label", "band", "bh"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_a"),
                  F.col("embedding").alias("emb_a"))
    eb = e.select(F.col("vec_id").alias("vec_b"),
                  F.col("embedding").alias("emb_b"))
    xa, xb = F.col("emb_a"), F.col("emb_b")
    cos = _dot(xa, xb) / (F.sqrt(_dot(xa, xa)) * F.sqrt(_dot(xb, xb)))
    return (
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") > 0.35)
    )


# ------------------------------------------------------- similarity search

@query(
    "llm_similarity_knn",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, e.label,
           {_sql_dot('e.embedding', 'q.qe')}
             / (sqrt({_sql_dot('e.embedding', 'e.embedding')})
              * sqrt({_sql_dot('q.qe', 'q.qe')})) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def llm_similarity_knn(spark, sf_dir):
    """Brute-force cosine top-k for one query vector (§2.J3). The
    query side is a 1-row broadcast; top-k is TakeOrdered (per-
    partition heap, no global sort). Brute force is the exact
    baseline; the LSH-bucketed scale path is llm_knn_lsh."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    ee, qe = F.col("embedding"), F.col("qe")
    cos = _dot(ee, qe) / (F.sqrt(_dot(ee, ee)) * F.sqrt(_dot(qe, qe)))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


_N_PLANES = 8


@query(
    "llm_knn_lsh",
    oracle="""
    WITH sig AS (
      SELECT e.vec_id, e.label,
             (CASE WHEN list_aggregate(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(((0)*131 + (i-1)*17) % 7 - 3 AS DOUBLE)), 'sum') > 0 THEN 1 ELSE 0 END) + (CASE WHEN list_aggregate(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(((1)*131 + (i-1)*17) % 7 - 3 AS DOUBLE)), 'sum') > 0 THEN 2 ELSE 0 END) + (CASE WHEN list_aggregate(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(((2)*131 + (i-1)*17) % 7 - 3 AS DOUBLE)), 'sum') > 0 THEN 4 ELSE 0 END) + (CASE WHEN list_aggregate(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(((3)*131 + (i-1)*17) % 7 - 3 AS DOUBLE)), 'sum') > 0 THEN 8 ELSE 0 END) + (CASE WHEN list_aggregate(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(((4)*131 + (i-1)*17) % 7 - 3 AS DOUBLE)), 'sum') > 0 THEN 16 ELSE 0 END) + (CASE WHEN list_aggregate(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(((5)*131 + (i-1)*17) % 7 - 3 AS DOUBLE)), 'sum') > 0 THEN 32 ELSE 0 END) + (CASE WHEN list_aggregate(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(((6)*131 + (i-1)*17) % 7 - 3 AS DOUBLE)), 'sum') > 0 THEN 64 ELSE 0 END) + (CASE WHEN list_aggregate(list_transform(range(1, len(e.embedding)+1), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(((7)*131 + (i-1)*17) % 7 - 3 AS DOUBLE)), 'sum') > 0 THEN 128 ELSE 0 END) AS bucket
      FROM embeddings e),
    q AS (
      SELECT s.bucket AS qbucket, ev.embedding AS qe
      FROM sig s JOIN embeddings ev ON ev.vec_id = s.vec_id
      WHERE s.vec_id = 0)
    SELECT s.vec_id, s.label, s.bucket,
           list_aggregate(list_transform(range(1, len(ev.embedding)+1), i -> CAST(ev.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum') / (sqrt(list_aggregate(list_transform(range(1, len(ev.embedding)+1), i -> CAST(ev.embedding[i] AS DOUBLE) * CAST(ev.embedding[i] AS DOUBLE)), 'sum')) * sqrt(list_aggregate(list_transform(range(1, len(q.qe)+1), i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), 'sum'))) AS cos_sim
    FROM sig s
    JOIN embeddings ev ON ev.vec_id = s.vec_id, q
    WHERE s.vec_id <> 0 AND s.bucket = q.qbucket
    ORDER BY cos_sim DESC, s.vec_id LIMIT 10
    """,
)
def llm_knn_lsh(spark, sf_dir):
    """LSH-bucketed ANN (§2.J3 scale path): hyperplane signatures
    (8 planes → 256 buckets), candidates = same-bucket equi-join
    against the query signature, exact cosine re-rank inside the
    bucket. Hash-graded (upgraded from rows-only in r4): plane
    weights are the same small-integer affine-mod family as
    llm_neardup_embedding_lsh — exactly representable doubles, so
    both engines compute bit-identical projections and the bucket
    assignment is cross-engine exact. At 100 TB the bucket join
    replaces the all-pairs scan; multiple probe tables (signature
    rotations) trade recall for cost — see docs/SCALE.md."""
    e = load_table(spark, sf_dir, "embeddings")

    def signature(emb):
        bits = [
            F.when(_ndl_proj(emb, p) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
            for p in range(_N_PLANES)
        ]
        return sum(bits[1:], bits[0])

    sig = e.select("vec_id", "label", "embedding",
                   signature(F.col("embedding")).alias("bucket"))
    q = sig.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket")
    )
    ee, qe = F.col("embedding"), F.col("qe")
    cos = _dot(ee, qe) / (F.sqrt(_dot(ee, ee)) * F.sqrt(_dot(qe, qe)))
    return (
        sig.where(F.col("vec_id") != 0)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select("vec_id", "label", "bucket", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# ----------------------------------------------------------- text analysis

@query(
    "llm_text_analysis",
    oracle=f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)
             AS avg_words,
           count(DISTINCT source) AS n_sources,
           {sql_dsum("CAST(n_chars AS DOUBLE) / len(string_split(text, ' '))")}
             AS sum_chars_per_word
    FROM documents
    GROUP BY lang
    """,
)
def llm_text_analysis(spark, sf_dir):
    """Corpus stats per language (§2.J4): tokenize + aggregate."""
    d = load_table(spark, sf_dir, "documents")
    nw = F.size(F.split("text", " "))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum(nw).cast("double") / F.count(F.lit(1))).alias("avg_words"),
        F.countDistinct("source").alias("n_sources"),
        dsum(F.col("n_chars").cast("double") / nw).alias("sum_chars_per_word"),
    )


_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "zu"],
    "fr": ["le", "la", "de", "et", "que"],
}
_LANG_ORDER = ["en", "es", "de", "fr"]


def _sql_lang_hits(lang):
    lst = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS[lang]) + "]"
    return (f"len(list_filter(string_split(text, ' '),"
            f" w -> list_contains({lst}, w)))")


@query(
    "llm_lang_id",
    oracle=f"""
    SELECT doc_id, lang AS true_lang,
           {" ".join(
               f"CAST({_sql_lang_hits(lg)} AS INTEGER) AS hits_{lg}," for lg in _LANG_ORDER
           )}
           CASE
             WHEN {_sql_lang_hits('en')} = 0 AND {_sql_lang_hits('es')} = 0
              AND {_sql_lang_hits('de')} = 0 AND {_sql_lang_hits('fr')} = 0
               THEN 'und'
             WHEN {_sql_lang_hits('en')} >= {_sql_lang_hits('es')}
              AND {_sql_lang_hits('en')} >= {_sql_lang_hits('de')}
              AND {_sql_lang_hits('en')} >= {_sql_lang_hits('fr')} THEN 'en'
             WHEN {_sql_lang_hits('es')} >= {_sql_lang_hits('de')}
              AND {_sql_lang_hits('es')} >= {_sql_lang_hits('fr')} THEN 'es'
             WHEN {_sql_lang_hits('de')} >= {_sql_lang_hits('fr')} THEN 'de'
             ELSE 'fr'
           END AS pred_lang
    FROM documents
    """,
)
def llm_lang_id(spark, sf_dir):
    """Stopword-scoring language ID (§2.J4 extra): count hits from
    per-language stopword lists, argmax with a fixed priority order.
    Pure Catalyst higher-order fns; deterministic by construction
    (the synthetic corpus shares one vocabulary, so most rows score
    'und' — the operator is graded on exact agreement, not accuracy)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")

    def hits(lang):
        lst = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        return F.size(F.filter(words, lambda w: F.array_contains(lst, w)))

    h = {lg: hits(lg) for lg in _LANG_ORDER}
    pred = (
        F.when((h["en"] == 0) & (h["es"] == 0) & (h["de"] == 0) & (h["fr"] == 0),
               "und")
        .when((h["en"] >= h["es"]) & (h["en"] >= h["de"]) & (h["en"] >= h["fr"]),
              "en")
        .when((h["es"] >= h["de"]) & (h["es"] >= h["fr"]), "es")
        .when(h["de"] >= h["fr"], "de")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        *[h[lg].alias(f"hits_{lg}") for lg in _LANG_ORDER],
        pred.alias("pred_lang"),
    )


@query(
    "llm_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_uniq
      FROM documents)
    SELECT doc_id, n_chars,
           CAST(n_words AS INTEGER) AS n_words,
           CAST(n_chars AS DOUBLE) / n_words AS chars_per_word,
           CAST(n_uniq AS DOUBLE) / n_words AS uniq_ratio,
           if(n_words BETWEEN 20 AND 80, 1.0, 0.0) * 0.5
             + if(CAST(n_uniq AS DOUBLE) / n_words > 0.4, 1.0, 0.0) * 0.5
             AS quality
    FROM t
    """,
)
def llm_quality_score(spark, sf_dir):
    """Heuristic doc-quality scoring (§2.J4 extra): length band +
    lexical diversity. All ratio arithmetic is single-division IEEE →
    exact parity."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    n_uniq = F.size(F.array_distinct(words))
    uniq_ratio = n_uniq.cast("double") / n_words
    quality = (
        F.when(n_words.between(20, 80), 1.0).otherwise(0.0) * 0.5
        + F.when(uniq_ratio > 0.4, 1.0).otherwise(0.0) * 0.5
    )
    return d.select(
        "doc_id",
        "n_chars",
        n_words.alias("n_words"),
        (F.col("n_chars").cast("double") / n_words).alias("chars_per_word"),
        uniq_ratio.alias("uniq_ratio"),
        quality.alias("quality"),
    )


@query(
    "llm_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER)
             AS re_tokens,
           CAST(ceil(CAST(n_chars AS DOUBLE) / 4) AS BIGINT) AS bpe_est
    FROM documents
    """,
)
def llm_token_count(spark, sf_dir):
    """Token counting (§2.J4 extra): whitespace tokens, regex
    word-ish tokens, and the chars/4 BPE estimate."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.regexp_count("text", F.lit("[a-z]+|[0-9]+")).alias("re_tokens"),
        F.ceil(F.col("n_chars").cast("double") / 4).alias("bpe_est"),
    )


@query(
    "llm_fingerprint",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           list_aggregate(
             list_transform(range(1, len(words) - 3),
               i -> md5(array_to_string(words[i:i+4], ' '))), 'min')
             AS fingerprint,
           md5(array_to_string(words[1:5], ' ')) AS head_hash
    FROM w
    WHERE len(words) >= 5
    """,
)
def llm_fingerprint(spark, sf_dir):
    """Document fingerprinting (§2.J4 extra): min-md5 over 5-word
    shingles (winnowing-style) + head shingle hash. md5 is identical
    across engines → fully oracle-checked."""
    d = _rebalanced(load_table(spark, sf_dir, "documents"))
    words = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.size(words) - 4)
    shingle_md5 = F.transform(
        idx, lambda i: F.md5(F.concat_ws(" ", F.slice(words, i, 5)))
    )
    return (
        d.where(F.size(words) >= 5)
        .select(
            "doc_id",
            F.array_min(shingle_md5).alias("fingerprint"),
            F.md5(F.concat_ws(" ", F.slice(words, 1, 5))).alias("head_hash"),
        )
    )


# ------------------------------------------------------- multimodal bundle

@query(
    "llm_multimodal_cols",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.source, d.n_chars, e.label,
           CAST(len(e.embedding) AS INTEGER) AS dim,
           {_sql_dot('e.embedding', 'e.embedding')} AS norm2
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def llm_multimodal_cols(spark, sf_dir):
    """Multimodal struct column (§2.J5): bundle {text, embedding,
    metadata} into one nested column, then project typed fields back
    out (the oracle validates the flattened projection)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    bundled = (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            F.struct(
                F.col("text"),
                F.col("embedding"),
                F.struct("lang", "source", "n_chars", "label").alias("meta"),
            ).alias("mm"),
        )
    )
    emb = F.col("mm.embedding")
    return bundled.select(
        "doc_id",
        F.col("mm.meta.lang").alias("lang"),
        F.col("mm.meta.source").alias("source"),
        F.col("mm.meta.n_chars").alias("n_chars"),
        F.col("mm.meta.label").alias("label"),
        F.size(emb).alias("dim"),
        _dot(emb, emb).alias("norm2"),
    )


@query(
    "llm_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(ascii(substring(text, 1, 1)) AS INTEGER) AS first_byte,
           CAST(ascii(substring(text, length(text), 1)) AS INTEGER) AS last_byte,
           CAST(list_aggregate(list_transform(range(1, 9),
                  i -> ascii(substring(text, i, 1))), 'sum') AS BIGINT)
             AS head_sum
    FROM documents
    """,
)
def llm_multimodal_decode(spark, sf_dir):
    """Multimodal decode plumbing (task mandate): binary media column
    → Arrow-batched mapInPandas feature extraction. The 'decode' is a
    deterministic byte-level fake (operators/multimodal.py — real
    codecs absent from this container), which makes the whole
    pipeline oracle-checkable via byte arithmetic in SQL."""
    from ..operators.multimodal import build_media_table, extract_features

    return extract_features(build_media_table(spark, sf_dir))


@query(
    "llm_multimodal_frames",
    oracle="""
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(ascii(substring(text, 1 + i * 64, 1)) AS INTEGER) AS frame_byte
    FROM documents,
         unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))) AS t(i)
    """,
)
def llm_multimodal_frames(spark, sf_dir):
    """Frame-sampling plumbing (task mandate): one byte every 64 from
    each blob as (doc_id, frame_idx, frame_byte) rows — the 1→N shape
    of video frame extraction, pure Catalyst (no Python). The text
    corpus is ASCII, so the oracle reproduces byte values with
    ascii(substring(...))."""
    from ..operators.multimodal import build_media_table, sample_frames

    return sample_frames(build_media_table(spark, sf_dir), 64)


@query(
    "llm_multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS orig_len,
           CAST(128 AS BIGINT) AS out_len,
           CAST(list_aggregate(list_transform(
                  range(1, 1 + least(length(text), 128)),
                  i -> ascii(substring(text, i, 1))), 'sum') AS BIGINT)
             AS byte_sum
    FROM documents
    """,
)
def llm_multimodal_resize(spark, sf_dir):
    """Resize plumbing (task mandate): normalize blobs to 128 bytes
    (truncate/zero-pad) in an Arrow-batched mapInPandas stage —
    variable blob in, fixed-size buffer out, graded on derived
    scalars (zero padding contributes 0 to the byte checksum)."""
    from ..operators.multimodal import build_media_table, resize_blob

    return resize_blob(build_media_table(spark, sf_dir), 128)


@query(
    "llm_embedding_centroid",
    oracle=f"""
    SELECT label, CAST(i - 1 AS INTEGER) AS pos,
           {sql_dsum('CAST(embedding[i] AS DOUBLE)')} / count(*) AS centroid_v
    FROM embeddings, range(1, 65) AS t(i)
    GROUP BY label, i
    """,
)
def llm_embedding_centroid(spark, sf_dir):
    """Per-label centroid vectors (position-wise mean over the
    64-dim embeddings) — the coarse-quantizer primitive under IVF
    similarity search (docs/SCALE.md). One posexplode + one
    decimal-stabilized hash aggregate: shuffle carries (label, pos)
    partial sums, never vectors."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(
            (F.sum(F.col("v").cast("double").cast(DEC)).cast("double")
             / F.count(F.lit(1))).alias("centroid_v")
        )
    )


@query(
    "llm_knn_ivf",
    oracle=f"""
    WITH pm AS (
      SELECT label, i AS pos,
             {sql_dsum('CAST(embedding[i] AS DOUBLE)')} / count(*) AS cv
      FROM embeddings, range(1, 65) AS t(i)
      GROUP BY label, i),
    cent AS (SELECT label, list(cv ORDER BY pos) AS centroid
             FROM pm GROUP BY label),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
    qc AS (SELECT c.label,
                  {_sql_dot('c.centroid', 'q.qe')}
                    / (sqrt({_sql_dot('c.centroid', 'c.centroid')})
                     * sqrt({_sql_dot('q.qe', 'q.qe')})) AS qcos
           FROM cent c, q),
    probes AS (SELECT label FROM qc ORDER BY qcos DESC, label LIMIT 1)
    SELECT e.vec_id, e.label,
           {_sql_dot('e.embedding', 'q.qe')}
             / (sqrt({_sql_dot('e.embedding', 'e.embedding')})
              * sqrt({_sql_dot('q.qe', 'q.qe')})) AS cos_sim
    FROM embeddings e JOIN probes p ON e.label = p.label, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id LIMIT 10
    """,
)  # hash-graded since r4: same deterministic index walk as multiprobe
def llm_knn_ivf(spark, sf_dir):
    """IVF-style ANN (§2.J3 scale path #2, complementing llm_knn_lsh):
    labels act as the inverted-file cells, the per-cell centroids
    (llm_embedding_centroid) are the coarse quantizer, and the query
    searches ONLY its nearest cell — candidate count ~n/cells.
    Exact cosine re-rank inside the probed cell. At 100 TB the label
    column comes from k-means and cells are partition keys, so a
    probe prunes partitions at the scan. Hash-graded (upgraded from
    rows-only in r4): the decimal-stabilized centroids, bit-identical
    cosine folds, and explicit probe/rank tie-breaks make the whole
    single-probe index walk cross-engine exact — the same model that
    already graded llm_knn_ivf_multiprobe, with nprobe=1."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg((F.sum(F.col("v").cast("double").cast(DEC)).cast("double")
              / F.count(F.lit(1))).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pc"))
        .select("label", F.transform("pc", lambda s: s.cv).alias("centroid"))
    )
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    ee, qe, ce = F.col("embedding"), F.col("qe"), F.col("centroid")
    qcos = _dot(ce, qe) / (F.sqrt(_dot(ce, ce)) * F.sqrt(_dot(qe, qe)))
    best_cell = (
        cents.crossJoin(F.broadcast(q))
        .select("label", qcos.alias("qc"))
        .orderBy(F.col("qc").desc(), F.col("label"))
        .limit(1)
        .select(F.col("label").alias("probe_label"))
    )
    cos = _dot(ee, qe) / (F.sqrt(_dot(ee, ee)) * F.sqrt(_dot(qe, qe)))
    return (
        e.where(F.col("vec_id") != 0)
        .join(F.broadcast(best_cell), F.col("label") == F.col("probe_label"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", cos.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


_JACCARD_PAIRS_SQL = """
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT doc_id, lang, n_chars,
               list_distinct(string_split(text, ' ')) AS ws FROM documents) a
  JOIN (SELECT doc_id, lang, n_chars,
               list_distinct(string_split(text, ' ')) AS ws FROM documents) b
    ON a.lang = b.lang AND a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= 10
  WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
          / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) > 0.5
"""


@query(
    "llm_dedup_cluster",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
    SELECT d.doc_id,
           CAST(least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS BIGINT)
             AS cluster_id
    FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
    GROUP BY d.doc_id
    """,
)
def llm_dedup_cluster(spark, sf_dir):
    """Dedup clustering (§2.J extra): connected components over the
    near-dup pair graph, so each duplicate cluster elects one
    canonical doc_id (its minimum). The heavy, O(rows)-scaling work
    — building the blocked candidate-pair list — is the distributed
    Spark join; components are solved by operators/components.py:
    union-find over the collected pairs when the pair list is small
    (it is the dedup rate times the corpus, not the corpus), and the
    distributed min-label-propagation loop (per-round equi-join +
    min-aggregate) past a pair-count threshold — both paths tested
    equivalent (tests/test_streaming.py). Docs outside any pair
    label themselves. The DuckDB oracle recomputes the same
    components with a recursive transitive-closure CTE."""
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        _banded_jaccard_pairs(spark, sf_dir)
        .where(F.col("jaccard") > 0.5)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    from ..operators.components import connected_components

    labels = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("label").alias("mapped")
    )
    return d.join(F.broadcast(labels), "doc_id", "left").select(
        "doc_id",
        F.coalesce("mapped", F.col("doc_id")).alias("cluster_id"),
    )




def _doc_chunks(sf_dir: str, n_chunks: int) -> str:
    """Documents split into doc_id-ordered chunk files with strictly
    increasing mtimes (the file-stream replay order contract) — the
    arriving-corpus fixture for streaming dedup. Idempotent per
    (sf_dir, n_chunks); pyarrow slice-writes, one read."""
    import math
    import os
    import shutil
    import time

    import pyarrow.parquet as pq

    from ..catalog import table_path
    from ..tmputil import scratch_dir

    key = (os.path.abspath(sf_dir), n_chunks)
    if key in _DOC_CHUNK_DIRS:
        return _DOC_CHUNK_DIRS[key]
    out = scratch_dir(prefix="dbrcf-docchunks-")
    tbl = pq.read_table(table_path(sf_dir, "documents")).sort_by(
        "doc_id")
    per = math.ceil(tbl.num_rows / n_chunks)
    now = time.time()
    for i in range(n_chunks):
        piece = tbl.slice(i * per, per)
        p = os.path.join(out, f"chunk-{i:03d}.parquet")
        pq.write_table(piece, p)
        os.utime(p, (now + i, now + i))
    _DOC_CHUNK_DIRS[key] = out
    return out


_DOC_CHUNK_DIRS: dict = {}

_DEDUP_STREAM_CHUNKS = 4


@query(
    "llm_dedup_streaming",
    oracle=f"""
    WITH numbered AS (
      SELECT doc_id, text,
             row_number() OVER (ORDER BY doc_id) - 1 AS rn,
             count(*) OVER () AS n
      FROM documents),
    chunked AS (
      SELECT doc_id,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))
               AS text_hash,
             CAST(floor(rn / ceil(n / {_DEDUP_STREAM_CHUNKS}.0))
                  AS BIGINT) AS batch_id
      FROM numbered),
    k AS (SELECT text_hash, min(doc_id) AS keep_id
          FROM chunked GROUP BY 1)
    SELECT c.text_hash, k.keep_id, c.batch_id
    FROM chunked c JOIN k ON c.doc_id = k.keep_id
    """,
)
def llm_dedup_streaming(spark, sf_dir):
    """STREAMING exact dedup — the admission gate a continuously-fed
    training corpus runs (the streaming twin of llm_dedup_exact):
    documents arrive in micro-batches; a doc is ACCEPTED iff its
    normalized-text hash has never been seen — first within its own
    batch (min doc_id per hash), then against the accumulated seen
    store (left_anti join) — and the accept log records which batch
    admitted it. Graded against the batch reconstruction: the accept
    set must equal the global min-doc_id-per-hash keep set with each
    keeper stamped by the deterministic chunk that contains it — an
    admission leaked across the batch boundary (re-accepting a hash
    seen two batches ago) or a batch-local dedup miss both fail the
    hash. Only (16-byte hash, id) pairs ever shuffle or persist —
    never text. The per-batch anti-join scans the whole seen store
    here; at 100 TB the store becomes the hash-BUCKETED layout
    (streaming/state_store.py) so a batch probes only its buckets'
    paths, or dropDuplicates-with-state when end-to-end exactly-once
    matters more than a readable store."""
    import os

    from ..streaming.replay import streaming_shuffle
    from ..tmputil import scratch_dir

    chunks = _doc_chunks(sf_dir, _DEDUP_STREAM_CHUNKS)
    store = scratch_dir(prefix="dbrcf-dedupstream-")
    store_ddl = "text_hash string, keep_id long, batch_id long"
    h = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))

    def admit(batch_df, batch_id):
        firsts = (
            batch_df.select(F.col("doc_id"), h.alias("text_hash"))
            .groupBy("text_hash")
            .agg(F.min("doc_id").alias("keep_id"))
        )
        seen = (
            spark.read.schema(store_ddl).parquet(store)
            .select("text_hash")
            if os.listdir(store) else None
        )
        fresh = (
            firsts.join(seen, "text_hash", "left_anti")
            if seen is not None else firsts
        )
        fresh.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("append").parquet(store)

    with streaming_shuffle(spark):
        q = (
            spark.readStream
            .schema("doc_id long, text string, lang string,"
                    " source string, n_chars long")
            .option("maxFilesPerTrigger", 1)
            .parquet(chunks)
            .writeStream.foreachBatch(admit)
            .option("checkpointLocation",
                    scratch_dir(prefix="dbrcf-dedupstream-ckpt-"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.schema(store_ddl).parquet(store)
