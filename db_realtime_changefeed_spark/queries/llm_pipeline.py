"""§2.J continued: retrieval scoring (BM25, count-min, score
models), embedding analytics (gram/PCA/k-means/silhouette), LM and
PMI statistics, DSIR, packing/splitting, and the end-to-end pipeline
composition. Split out of llm.py in round 6 (VERDICT r5
housekeeping) purely mechanically - registration names, bodies, and
declaration order are unchanged.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from .llm import (_LANG_ORDER, _N_PLANES, _STOPWORDS, _dot,
                  _minhash_md5_oracle, _ndl_proj, _ndl_sql_proj,
                  _rebalanced, _shingles, _sql_dot,
                  llm_dedup_cluster, llm_dedup_minhash_md5,
                  llm_knn_lsh, llm_lang_id, llm_similarity_knn)
from ._util import (DEC, dround6_div, dsum, sql_dround6_div,
                    sql_dsum)


@query(
    "agg_sketch_countmin",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    truth AS (SELECT term, count(*) AS true_count FROM w GROUP BY term)
    SELECT term, true_count
    FROM truth ORDER BY true_count DESC, term LIMIT 20
    """,
)
def agg_sketch_countmin(spark, sf_dir):
    """Count-min sketch expressed as pure DataFrame ops: every token
    increments d=4 hashed buckets of width w=64; a term's estimate
    is the MIN over its 4 buckets — always ≥ the true count, with
    overestimate bounded by collisions. The sketch table is d×w=256
    rows REGARDLESS of corpus size — the fixed-size summary you
    ship from every partition at 100 TB, merged by addition (the
    groupBy below IS the merge). Graded output: the exact top-20
    terms with true counts (hash families are engine-specific, so
    the estimate column is asserted in tests — est ≥ true, and
    est = true for the heavy hitters at this width — rather than
    hash-compared)."""
    est = countmin_estimates(spark, sf_dir)
    return (
        est.orderBy(F.col("true_count").desc(), "term")
        .limit(20)
        .select("term", "true_count")
    )


def countmin_estimates(spark, sf_dir):
    """(term, true_count, cm_est) for every term — the full sketch
    pipeline; agg_sketch_countmin grades the deterministic columns,
    tests assert the sketch guarantees on cm_est."""
    d = load_table(spark, sf_dir, "documents")
    w = _rebalanced(d).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    depth, width = 4, 64
    # sketch: one explode to (d, bucket), one groupBy → 256 rows
    sketch = (
        w.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("d"),
                        F.pmod(
                            F.xxhash64(F.lit(i), F.col("term")),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ])
            ).alias("hb")
        )
        .groupBy("hb.d", "hb.bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = w.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    probes = truth.select(
        "term", "true_count",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("d"),
                    F.pmod(
                        F.xxhash64(F.lit(i), F.col("term")),
                        F.lit(width),
                    ).alias("bucket"),
                )
                for i in range(depth)
            ])
        ).alias("hb"),
    ).select("term", "true_count", "hb.d", "hb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("term", "true_count")
        .agg(F.min("c").alias("cm_est"))
    )


@query(
    "llm_score_model",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) / 1000.0 AS f_len,
             CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0
               AS f_tokens,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS f_en
      FROM documents)
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(0.8 * f_len + 0.5 * f_tokens
                                    + 0.3 * f_en - 1.2))), 6)
             AS model_score
    FROM f
    """,
)
def llm_score_model(spark, sf_dir):
    """Batch model-inference plumbing: featurize in Catalyst, then
    score inside an Arrow-batched mapInPandas worker — the exact
    shape of running a real classifier/reward model over a corpus
    (the 'model' here is a fixed-weight logistic so DuckDB can
    oracle it; swap `_score_batch` for an ONNX/torch call and
    nothing else changes). Scale: featurization is scan-local, the
    model worker sees vectorized pandas batches (one Python process
    per core, no per-row overhead), output is (id, score) —
    shuffle-free end to end."""
    import pandas as pd  # noqa: F401 (worker-side)

    d = _rebalanced(load_table(spark, sf_dir, "documents"))
    feats = d.select(
        "doc_id",
        (F.col("n_chars").cast("double") / 1000.0).alias("f_len"),
        (F.size(F.split("text", " ")).cast("double") / 100.0)
        .alias("f_tokens"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("f_en"),
    )

    def _score_batch(batches):
        import numpy as np

        for pdf in batches:
            z = (0.8 * pdf["f_len"] + 0.5 * pdf["f_tokens"]
                 + 0.3 * pdf["f_en"] - 1.2)
            out = pdf[["doc_id"]].copy()
            out["model_score"] = np.round(1.0 / (1.0 + np.exp(-z)), 6)
            yield out

    return feats.mapInPandas(
        _score_batch, schema="doc_id long, model_score double"
    )


@query(
    "llm_pipeline_end_to_end",
    oracle="""
    WITH survivors AS (
      SELECT doc_id, lang, n_chars, text,
             row_number() OVER (
               PARTITION BY md5(lower(regexp_replace(text, '\\s+', ' ',
                                                     'g')))
               ORDER BY doc_id) AS rn
      FROM documents),
    clean AS (
      SELECT doc_id, lang, n_chars, text,
             len(string_split(text, ' ')) AS n_tokens,
             list_distinct(string_split(text, ' ')) AS ws
      FROM survivors
      WHERE rn = 1 AND n_chars >= 60
        AND len(string_split(text, ' ')) >= 20),
    neardup_losers AS (
      SELECT DISTINCT b.doc_id AS loser
      FROM clean a JOIN clean b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
       AND abs(a.n_chars - b.n_chars) <= 10
      WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
              / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))
            > 0.5),
    final AS (SELECT * FROM clean
              WHERE doc_id NOT IN (SELECT loser FROM neardup_losers))
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE)
             AS total_chars
    FROM final GROUP BY lang
    """,
)
def llm_pipeline_end_to_end(spark, sf_dir):
    """The whole training-data pipeline as ONE composed dataflow —
    exact dedup (normalized-hash, keep-first), quality gate (length
    + token floor), blocked near-dup removal (banded word-set
    Jaccard > 0.5, drop the younger of each pair), then per-language
    corpus statistics. Every stage is a form already graded alone
    (llm_dedup_exact / quality gates / llm_dedup_ngram_jaccard);
    this proves they COMPOSE without driver-side glue: one plan,
    shuffles = dedup hash + banded pair key + final stats, the
    text column never shuffles after `clean`. The near-dup drop is
    a broadcast ANTI join (losers ≪ corpus). At 100 TB each stage
    keeps its standalone scale shape."""
    d = _rebalanced(load_table(spark, sf_dir, "documents"))
    norm = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    rn = F.row_number().over(
        Window.partitionBy(norm).orderBy("doc_id")
    )
    toks = F.size(F.split("text", " "))
    clean = (
        d.withColumn("rn", rn)
        .where(
            (F.col("rn") == 1) & (F.col("n_chars") >= 60) & (toks >= 20)
        )
        .select(
            "doc_id", "lang", "n_chars",
            toks.alias("n_tokens"),
            F.array_distinct(F.split("text", " ")).alias("ws"),
        )
    )
    bucket = F.floor(F.col("n_chars") / F.lit(10))
    a = clean.select(
        F.col("doc_id").alias("doc_a"), "lang",
        F.col("n_chars").alias("nc_a"), F.col("ws").alias("ws_a"),
        bucket.alias("bk"),
    )
    b = clean.select(
        F.col("doc_id").alias("doc_b"), "lang",
        F.col("n_chars").alias("nc_b"), F.col("ws").alias("ws_b"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bk"),
    )
    inter = F.size(F.array_intersect(F.col("ws_a"), F.col("ws_b")))
    jac = inter.cast("double") / (
        F.size(F.col("ws_a")) + F.size(F.col("ws_b")) - inter
    )
    losers = (
        a.join(b, ["lang", "bk"])
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("nc_a") - F.col("nc_b")) <= 10)
            & (jac > 0.5)
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final = clean.join(F.broadcast(losers), "doc_id", "left_anti")
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        dsum("n_chars").alias("total_chars"),
    )


def kmeans_embeddings(spark, sf_dir, k: int = 8, n_iter: int = 5):
    """Distributed Lloyd's k-means over the embedding column —
    the iterative-algorithm pattern (docs/SCALE.md): each round is
    ONE assign-and-aggregate pass (broadcast centroids → argmin
    cosine-free L2 via Catalyst HOFs → posexplode → decimal-exact
    per-(cluster, pos) partial sums), with localCheckpoint cutting
    the lineage between rounds exactly like the components
    propagation loop. Deterministic end to end: init is the first k
    vec_ids (data order is a parquet read of unique ids), distance
    ties break toward the lower cluster id, and the decimal sums
    make every centroid bit-reproducible regardless of partitioning.
    Returns (assignments DF, centroids DF, inertia history list)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    init = (
        e.orderBy("vec_id").limit(k)
        .select(
            F.monotonically_increasing_id().alias("_c"),
            F.col("embedding").alias("centroid"),
        )
        .select(
            (F.row_number().over(Window.orderBy("_c")) - 1)
            .alias("cluster"),
            "centroid",
        )
    )
    cents = [
        (int(r["cluster"]), [float(x) for x in r["centroid"]])
        for r in init.collect()
    ]
    inertia_hist = []
    assigned = None
    for _ in range(n_iter):
        # distance to each centroid via HOFs; argmin with id tiebreak
        dist_cols = []
        for cid, cv in cents:
            arr = F.array(*[F.lit(float(x)) for x in cv])
            d2 = F.aggregate(
                F.zip_with(
                    "embedding", arr,
                    lambda a, b: (a.cast("double") - b)
                    * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            dist_cols.append(F.struct(d2.alias("d2"),
                                      F.lit(cid).alias("cluster")))
        best = F.array_min(F.array(*dist_cols))
        assigned = e.select(
            "vec_id", "embedding",
            best["cluster"].alias("cluster"), best["d2"].alias("d2"),
        ).localCheckpoint(eager=True)
        inertia = assigned.agg(
            F.sum(F.col("d2").cast(DEC)).cast("double")
        ).collect()[0][0]
        inertia_hist.append(float(inertia))
        new_cents = (
            assigned.select(
                "cluster", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("cluster", "pos")
            .agg(
                (F.sum(F.col("v").cast("double").cast(DEC))
                 .cast("double") / F.count(F.lit(1))).alias("cv")
            )
            .orderBy("cluster", "pos")
            .collect()
        )
        by_c: dict = {}
        for r in new_cents:
            by_c.setdefault(int(r["cluster"]), []).append(float(r["cv"]))
        # empty clusters keep their previous centroid
        cents = [
            (cid, by_c.get(cid, cv)) for cid, cv in cents
        ]
    centroids = spark.createDataFrame(
        [(cid, cv) for cid, cv in cents],
        "cluster int, centroid array<double>",
    )
    return assigned.select("vec_id", "cluster", "d2"), centroids, \
        inertia_hist


@query("llm_kmeans")  # rows-only: iterative algorithm (explicitly the
# non-SQL-expressible class); invariants pytest-asserted instead —
# monotone inertia, full coverage, deterministic reruns
def llm_kmeans(spark, sf_dir):
    """K-means cluster assignments over the embeddings table (k=8,
    5 Lloyd rounds) — the missing iterative-algorithm operator
    class. Per round: centroids BROADCAST as literals (k×64 doubles
    — always driver-sized), one scan assigns via codegen'd HOF
    arithmetic, one decimal-exact aggregate re-estimates; k×64
    numbers cross the driver per round, never vectors. At 100 TB
    the same loop runs with centroid literals swapped for a
    broadcast join; rounds stay O(scan)."""
    assigned, _, _ = kmeans_embeddings(spark, sf_dir)
    return assigned.select(
        "vec_id", "cluster", F.round("d2", 6).alias("d2")
    )


def _gram_full(spark, sf_dir):
    """Full symmetric gram matrix (i, j, g) as a DataFrame — the
    upper-triangle aggregate (llm_embedding_gram's shape) mirrored
    across the diagonal. g values are decimal-stabilized sums cast
    to double, so they are bit-identical to the DuckDB oracle's."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    d = F.size(emb)
    tri = F.flatten(
        F.transform(
            F.sequence(F.lit(0), d - 1),
            lambda i: F.transform(
                F.sequence(i, d - 1),
                lambda j: F.struct(
                    i.alias("i"), j.alias("j"),
                    (F.element_at(emb, i + 1).cast("double")
                     * F.element_at(emb, j + 1).cast("double"))
                    .alias("p"),
                ),
            ),
        )
    )
    upper = (
        e.select(F.explode(tri).alias("t"))
        .groupBy(F.col("t.i").alias("i"), F.col("t.j").alias("j"))
        .agg(F.sum(F.col("t.p").cast(DEC)).cast("double").alias("g"))
    )
    lower = upper.where(F.col("i") != F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "g"
    )
    return upper.unionByName(lower)


_PCA_SQL_GM = """
    WITH upper_g AS (
      SELECT i - 1 AS i, j - 1 AS j,
             {gsum} AS g
      FROM embeddings, range(1, 65) ti(i), range(1, 65) tj(j)
      WHERE i <= j GROUP BY 1, 2),
    gfull AS (SELECT i, j, g FROM upper_g
              UNION ALL
              SELECT j AS i, i AS j, g FROM upper_g WHERE i <> j),
    gm AS (SELECT list(glist ORDER BY i) AS gmat
           FROM (SELECT i, list(g ORDER BY j) AS glist
                 FROM gfull GROUP BY i)),
    it0 AS (SELECT gmat,
                   list_transform(range(1, 65), x -> 1.0) AS v
            FROM gm),
    {iters}
    SELECT e.vec_id, e.label,
           list_aggregate(list_transform(range(1, 65),
             k -> CAST(e.embedding[k] AS DOUBLE) * it3.v[k]), 'sum')
             AS pc1
    FROM embeddings e, it3
"""


def _pca_sql_iter(k: int) -> str:
    """One power-iteration CTE: w = G·v via per-row sequential list
    folds, then normalize — the same left-to-right addition order as
    Spark's aggregate(), so the trajectory is bitwise identical (no
    decimal casts whose tie-rounding differs between engines)."""
    return f"""it{k} AS (
      SELECT gmat,
             list_transform(w, x -> x / nrm) AS v
      FROM (
        SELECT gmat, w,
               sqrt(list_aggregate(list_transform(w, x -> x * x),
                                   'sum')) AS nrm
        FROM (
          SELECT gmat,
                 list_transform(gmat, row ->
                   list_aggregate(list_transform(range(1, 65),
                     kk -> row[kk] * v[kk]), 'sum')) AS w
          FROM it{k - 1})))"""


@query(
    "llm_embedding_pca",
    oracle=_PCA_SQL_GM.format(
        gsum=sql_dsum("CAST(embedding[i] AS DOUBLE)"
                      " * CAST(embedding[j] AS DOUBLE)"),
        iters=",\n    ".join(_pca_sql_iter(k) for k in (1, 2, 3)),
    ),
)
def llm_embedding_pca(spark, sf_dir):
    """First principal component by POWER ITERATION, entirely
    in-engine and hash-graded: 3 iterations of v ← normalize(G·v)
    from an all-ones start over the distributed gram matrix, then
    every embedding projected onto the eigenvector. The gram entries
    ride decimal-exact sums (bit-identical across engines); the
    iteration and projection use SEQUENTIAL left-to-right folds —
    the same order on both engines, so the whole trajectory is
    bitwise reproducible with no decimal tie-rounding involved.
    Scale: the corpus is touched exactly twice (gram build: O(d²)
    communication; projection: one scan) — the iteration itself
    runs on a 64×64 matrix, broadcast-sized at any corpus size. The
    pattern extends to top-k components via deflation or block
    iteration."""
    gmat_df = (
        _gram_full(spark, sf_dir)
        .groupBy("i")
        .agg(F.array_sort(F.collect_list(F.struct("j", "g"))).alias("gr"))
        .select("i", F.transform("gr", lambda st: st.g).alias("glist"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("i", "glist")))
             .alias("rows"))
        .select(F.transform("rows", lambda st: st.glist).alias("gmat"))
        .localCheckpoint(eager=True)
    )
    df = gmat_df.withColumn(
        "v", F.transform(F.sequence(F.lit(1), F.lit(64)),
                         lambda _: F.lit(1.0))
    )
    mul = lambda a, b: a * b  # noqa: E731
    add = lambda acc, x: acc + x  # noqa: E731
    for _ in range(3):
        df = df.withColumn(
            "w",
            F.transform(
                F.col("gmat"),
                lambda row: F.aggregate(
                    F.zip_with(row, F.col("v"), mul), F.lit(0.0), add
                ),
            ),
        )
        df = df.withColumn(
            "nrm",
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("w"), lambda x: x * x),
                    F.lit(0.0), add,
                )
            ),
        )
        df = df.withColumn(
            "v", F.transform(F.col("w"), lambda x: x / F.col("nrm"))
        ).drop("w", "nrm")
    vrow = df.select("v")
    e = load_table(spark, sf_dir, "embeddings")
    pc1 = F.aggregate(
        F.zip_with(
            F.transform(F.col("embedding"), lambda x: x.cast("double")),
            F.col("v"), mul,
        ),
        F.lit(0.0), add,
    )
    return (
        e.crossJoin(F.broadcast(vrow))
        .select("vec_id", "label", pc1.alias("pc1"))
    )


@query(
    "llm_pmi_collocations",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    g AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                       i -> ws[i] || ' ' || ws[i+1]))
            AS bg
          FROM w),
    cxy AS (SELECT bg, count(*) AS c_xy FROM g GROUP BY bg),
    u AS (SELECT term, count(*) AS c
          FROM (SELECT unnest(ws) AS term FROM w) GROUP BY term),
    nb AS (SELECT CAST(sum(c_xy) AS DOUBLE) AS n_b FROM cxy),
    nu AS (SELECT CAST(sum(c) AS DOUBLE) AS n_u FROM u)
    SELECT bg, c_xy,
           round(ln((CAST(c_xy AS DOUBLE) / nb.n_b)
                    / ((CAST(ux.c AS DOUBLE) / nu.n_u)
                       * (CAST(uy.c AS DOUBLE) / nu.n_u))), 6) AS pmi
    FROM cxy
    JOIN u ux ON ux.term = string_split(bg, ' ')[1]
    JOIN u uy ON uy.term = string_split(bg, ' ')[2]
    CROSS JOIN nb CROSS JOIN nu
    WHERE c_xy >= 3
    ORDER BY pmi DESC, bg LIMIT 30
    """,
)
def llm_pmi_collocations(spark, sf_dir):
    """Bigram collocation mining by pointwise mutual information —
    the boilerplate/fixed-phrase detector of corpus analysis (high
    PMI = words that co-occur far more than chance; used to find
    template strings and tokenizer merge candidates). Spark-first:
    bigram and unigram counts are two map-side-combined hash
    aggregates; the unigram table and the two one-row totals join
    back as BROADCASTs (vocab ≪ corpus), so the only full-corpus
    work is the tokenize scan — at 100 TB nothing wider than
    (term, count) ever shuffles. The PMI expression is the same
    double-arithmetic tree on both engines and rounds to 6 dp, so
    ln cannot flip the hash; min-support c_xy >= 3 keeps the
    top-30 stable."""
    d = _rebalanced(load_table(spark, sf_dir, "documents"))
    ws = F.split("text", " ")
    n = F.size(ws)
    bigrams = F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    cxy = (
        d.select(F.explode(bigrams).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    u = (
        d.select(F.explode(ws).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nb = cxy.agg(F.sum("c_xy").cast("double").alias("n_b"))
    nu = u.agg(F.sum("c").cast("double").alias("n_u"))
    parts = F.split(F.col("bg"), " ")
    ux = u.select(F.col("term").alias("x"), F.col("c").alias("c_x"))
    uy = u.select(F.col("term").alias("y"), F.col("c").alias("c_y"))
    pmi = F.round(
        F.log(
            (F.col("c_xy").cast("double") / F.col("n_b"))
            / ((F.col("c_x").cast("double") / F.col("n_u"))
               * (F.col("c_y").cast("double") / F.col("n_u")))
        ),
        6,
    )
    return (
        cxy.where(F.col("c_xy") >= 3)
        .withColumn("x", parts.getItem(0))
        .withColumn("y", parts.getItem(1))
        .join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .join(F.broadcast(nb))
        .join(F.broadcast(nu))
        .select("bg", "c_xy", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "bg")
        .limit(30)
    )


@query(
    "llm_neardup_verify_md5",
    oracle=f"""
    WITH cand AS ({_minhash_md5_oracle()}),
    vsh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
                 range(1, len(string_split(text, ' ')) - 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
               AS shingle
      FROM documents WHERE len(string_split(text, ' ')) >= 3),
    sets AS (SELECT doc_id, count(*) AS n_sh FROM vsh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, c.est_jaccard, count(*) AS n_int
      FROM cand c
      JOIN vsh a ON a.doc_id = c.doc_a
      JOIN vsh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY c.doc_a, c.doc_b, c.est_jaccard)
    SELECT i.doc_a, i.doc_b, i.est_jaccard,
           FLOOR(CAST(i.n_int AS DOUBLE) * 1000000.0
                 / CAST(sa.n_sh + sb.n_sh - i.n_int AS DOUBLE) + 0.5)
             / 1000000.0 AS true_jaccard
    FROM inter i
    JOIN sets sa ON sa.doc_id = i.doc_a
    JOIN sets sb ON sb.doc_id = i.doc_b
    """,
)
def llm_neardup_verify_md5(spark, sf_dir):
    """End-to-end near-dup with VERIFY stage (the MinHashLSH →
    exact-rerank shape every production dedup ships): banded-LSH
    candidates from the portable md5 MinHash (llm_dedup_minhash_md5)
    re-scored with EXACT shingle-set Jaccard — estimate and truth
    side by side, fully hash-graded. Scale shape: the verify join
    touches only candidate pairs (O(collisions), not O(n²)); the
    intersection is a shingle equi-join restricted to those pairs,
    so per-pair work is bounded by document length. The final
    Jaccard is one integer division rounded to 6 dp — identical on
    both engines."""
    d = load_table(spark, sf_dir, "documents")
    cand = llm_dedup_minhash_md5(spark, sf_dir)
    sh = _shingles(d)
    sets = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"),
                  F.col("shingle").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("b_id"),
                  F.col("shingle").alias("sh_b"))
    inter = (
        cand.join(a, "doc_a")
        .join(b, (F.col("doc_b") == F.col("b_id"))
              & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b", "est_jaccard")
        .agg(F.count(F.lit(1)).alias("n_int"))
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"),
                     F.col("n_sh").alias("n_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"),
                     F.col("n_sh").alias("n_b"))
    tj = dround6_div(
        F.col("n_int").cast("double"),
        (F.col("n_a") + F.col("n_b") - F.col("n_int")).cast("double"),
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .select("doc_a", "doc_b", "est_jaccard", tj.alias("true_jaccard"))
    )


_PARA_W = 10  # words per paragraph unit


@query(
    "llm_dedup_paragraphs",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    ch AS (
        SELECT doc_id, i AS chunk_idx,
               md5(array_to_string(
                   ws[i*{_PARA_W}+1 : i*{_PARA_W}+{_PARA_W}], ' ')) AS h
        FROM w, UNNEST(range(CAST(ceil(len(ws)/{_PARA_W}.0) AS BIGINT)))
                t(i)
    ),
    owned AS (
        SELECT doc_id, chunk_idx,
               (row_number() OVER (PARTITION BY h
                                   ORDER BY doc_id, chunk_idx) = 1)
               AS kept
        FROM ch
    )
    SELECT doc_id, count(*) AS n_chunks,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dropped
    FROM owned GROUP BY doc_id
    """,
)
def llm_dedup_paragraphs(spark, sf_dir):
    """Cross-corpus paragraph-level exact dedup (the CCNet pass that
    removes boilerplate shared across pages: headers, licenses,
    navigation). The fixture corpus has no newlines, so the
    paragraph unit is a deterministic 10-word window — which is also
    the robust choice at scale, where newline conventions vary by
    source. Each unit is md5-fingerprinted (portable across engines;
    16 bytes — the TEXT never shuffles), ownership goes to the
    lexicographically first (doc_id, chunk_idx) occurrence via one
    window pass over the fingerprint key, and the per-doc report
    counts kept vs dropped units. At 100 TB: shuffle payload is
    (hash, doc_id, idx) triples only, the window partitions by
    fingerprint (uniform key), and the output is a per-doc summary —
    the full-text rewrite would reuse the same kept flags."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n_units = F.ceil(F.size(ws) / F.lit(float(_PARA_W))).cast("int")
    d = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_units - 1),
                lambda i: F.md5(
                    F.array_join(
                        F.slice(
                            F.split("text", " "),
                            i * F.lit(_PARA_W) + F.lit(1),
                            F.lit(_PARA_W),
                        ),
                        " ",
                    )
                ),
            )
        ).alias("chunk_idx", "h"),
    )
    kept = (
        F.row_number().over(
            Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
        )
        == 1
    )
    return (
        d.withColumn("kept", kept)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("kept"), 0).otherwise(1)).alias(
                "n_dropped"
            ),
        )
    )


_PACK_CAP = 512  # tokens per packed training sequence


@query(
    "llm_pack_sequences",
    oracle=f"""
    WITH d AS (SELECT lang, doc_id,
                      len(string_split(text, ' ')) AS n_tok
               FROM documents),
    c AS (SELECT lang, doc_id, n_tok,
                 CAST(COALESCE(sum(n_tok) OVER (
                     PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS BIGINT) AS s
          FROM d),
    x AS (SELECT lang, doc_id, n_tok, s,
                 UNNEST(range(s // {_PACK_CAP},
                              (s + n_tok - 1) // {_PACK_CAP} + 1))
                     AS bin_id
          FROM c)
    SELECT lang, bin_id, count(*) AS n_docs,
           CAST(sum(LEAST(s + n_tok, (bin_id + 1) * {_PACK_CAP})
                    - GREATEST(s, bin_id * {_PACK_CAP})) AS BIGINT)
               AS n_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM x GROUP BY lang, bin_id
    """,
)
def llm_pack_sequences(spark, sf_dir):
    """Training-sequence packing — the GPT-style concat-then-split
    pass that turns ragged documents into fixed 512-token training
    windows with zero padding waste. Documents are concatenated in
    doc_id order within each language shard (a running token-offset
    window), each doc's token span is mapped to the bin range it
    covers, and the bin range is exploded so a boundary doc
    contributes its exact overlap to both neighbors. All integer
    arithmetic — exact on any engine. Scale shape: the cumulative
    offset partitions by shard key (lang here; a 100 TB pipeline
    uses many hash shards the same way), so packing parallelizes
    per shard and no global sort exists; output is one row per
    packed sequence."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn(
        "s", F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    )
    cap = F.lit(_PACK_CAP).cast("long")
    x = c.select(
        "lang",
        "doc_id",
        "n_tok",
        "s",
        F.explode(
            F.sequence(
                F.expr(f"s DIV {_PACK_CAP}"),
                F.expr(f"(s + n_tok - 1) DIV {_PACK_CAP}"),
            )
        ).alias("bin_id"),
    )
    overlap = F.least(
        F.col("s") + F.col("n_tok"), (F.col("bin_id") + 1) * cap
    ) - F.greatest(F.col("s"), F.col("bin_id") * cap)
    return x.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(overlap).alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "llm_dsir_weights",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents),
    cnt AS (SELECT term, count(*) AS c,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS c_en
            FROM w GROUP BY term),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_all,
                   CAST(sum(c_en) AS DOUBLE) AS n_en,
                   count(*) AS vocab FROM cnt),
    p AS (SELECT term,
                 (CAST(c AS DOUBLE) + 1.0)
                   / (tot.n_all + CAST(tot.vocab AS DOUBLE)) AS pr,
                 (CAST(c_en AS DOUBLE) + 1.0)
                   / (tot.n_en + CAST(tot.vocab AS DOUBLE)) AS pt
          FROM cnt, tot)
    SELECT w.doc_id, any_value(w.lang) AS lang, count(*) AS n_tok,
           CAST(sum(CAST(ln(p.pt) - ln(p.pr) AS DECIMAL(18,6)))
                AS DOUBLE) AS dsir_lr
    FROM w JOIN p USING (term)
    GROUP BY w.doc_id
    """,
)
def llm_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document by the
    per-token log-likelihood ratio between a TARGET unigram LM
    (here: the English slice, standing in for a high-quality
    reference like Wikipedia) and the RAW-corpus LM — the standard
    cheap way to pick pretraining data that 'looks like' a trusted
    distribution. Both LMs are add-one smoothed over the shared
    corpus vocabulary so every term has mass under both. Plan shape
    mirrors llm_unigram_lm: one (term) shuffle builds both count
    columns in a single aggregate, totals and the probability table
    broadcast back (vocab ≪ corpus), scoring is one (doc_id)
    shuffle; each ln-ratio term is DEC-quantized pre-sum
    (FIXTURES.md float rule), so the per-doc total dsir_lr is an
    exact 6-dp decimal — identical on both engines at every SF. The
    graded output is deliberately the TOTAL log-ratio plus n_tok
    rather than round(lr/n_tok): the per-token division can land
    exactly on a 6-dp rounding midpoint (observed at sf0.1:
    -0.088309/26 = -0.0033965 precisely), where the engines' round
    kernels disagree — consumers normalize downstream at whatever
    precision they need."""
    d = load_table(spark, sf_dir, "documents")
    w = _rebalanced(d).select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    cnt = w.groupBy("term").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias(
            "c_en"
        ),
    )
    tot = cnt.agg(
        F.sum("c").cast("double").alias("n_all"),
        F.sum("c_en").cast("double").alias("n_en"),
        F.count(F.lit(1)).alias("vocab"),
    )
    p = cnt.join(F.broadcast(tot)).select(
        "term",
        ((F.col("c").cast("double") + F.lit(1.0))
         / (F.col("n_all") + F.col("vocab").cast("double"))
         ).alias("pr"),
        ((F.col("c_en").cast("double") + F.lit(1.0))
         / (F.col("n_en") + F.col("vocab").cast("double"))
         ).alias("pt"),
    )
    return (
        w.join(F.broadcast(p), "term")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_tok"),
            dsum(F.log("pt") - F.log("pr")).alias("dsir_lr"),
        )
    )


@query(
    "llm_word_entropy",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    cnt AS (SELECT doc_id, term, count(*) AS c
            FROM w GROUP BY doc_id, term),
    tot AS (SELECT doc_id, CAST(sum(c) AS DOUBLE) AS n,
                   count(*) AS n_types
            FROM cnt GROUP BY doc_id)
    SELECT cnt.doc_id, CAST(tot.n AS BIGINT) AS n_tok, tot.n_types,
           round(CAST(sum(CAST(
                     -(CAST(c AS DOUBLE) / tot.n)
                       * ln(CAST(c AS DOUBLE) / tot.n)
                     AS DECIMAL(18,6))) AS DOUBLE), 6) AS entropy,
           FLOOR(CAST(tot.n_types AS DOUBLE) * 1000000.0 / tot.n + 0.5)
               / 1000000.0 AS ttr
    FROM cnt JOIN tot USING (doc_id)
    GROUP BY cnt.doc_id, tot.n, tot.n_types
    """,
)
def llm_word_entropy(spark, sf_dir):
    """Word-distribution entropy + type-token ratio — the
    information-theoretic quality gates (Gopher/FineWeb family):
    near-zero entropy flags keyword-stuffed or template pages, low
    TTR flags repetitive generation. Per doc: H = -Σ (c/n)·ln(c/n)
    over word frequencies. One (doc_id, term) shuffle builds the
    frequency table, per-doc totals join back on the same doc_id
    partitioning, each entropy term is DEC-quantized pre-sum
    (FIXTURES.md float rule) and the result rounds to 6 dp. The
    text itself never shuffles — only (doc_id, term, count)
    triples."""
    d = load_table(spark, sf_dir, "documents")
    w = _rebalanced(d).select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    cnt = w.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("double").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
    )
    p = F.col("c").cast("double") / F.col("n")
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id", "n", "n_types")
        .agg(dsum(-p * F.log(p)).alias("h"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tok"),
            "n_types",
            F.round("h", 6).alias("entropy"),
            dround6_div(
                F.col("n_types").cast("double"), F.col("n")
            ).alias("ttr"),
        )
    )


from . import ORACLES as _REGISTERED_ORACLES  # noqa: E402


@query(
    "llm_ann_recall",
    oracle=f"""
    SELECT 10 AS k, count(*) AS n_overlap,
           CAST(count(*) AS DOUBLE) / 10 AS recall_at_10
    FROM ({_REGISTERED_ORACLES['llm_similarity_knn']}) bf
    JOIN ({_REGISTERED_ORACLES['llm_knn_lsh']}) l
      ON bf.vec_id = l.vec_id
    """,
)
def llm_ann_recall(spark, sf_dir):
    """ANN index quality evaluation — recall@10 of the LSH index
    against the exact brute-force top-10 for the same query vector:
    the acceptance metric every ANN deployment monitors before
    trading exactness for speed. Composed from the two graded
    pipelines (llm_similarity_knn = ground truth, llm_knn_lsh =
    candidate index) with a semi-join on the returned ids; the
    oracle REUSES those queries' registered oracle texts verbatim as
    subqueries, so this check can never drift from the queries it
    evaluates. recall = overlap/10 is a 1-dp-safe quotient. At
    scale: both sides are top-k results (k rows) — the evaluation
    join is driver-trivial regardless of corpus size; sampling more
    query vectors fans out the same shape."""
    bf = llm_similarity_knn(spark, sf_dir).select("vec_id")
    lsh = llm_knn_lsh(spark, sf_dir).select(F.col("vec_id").alias("l_id"))
    overlap = bf.join(lsh, bf.vec_id == lsh.l_id)
    return overlap.agg(
        F.lit(10).alias("k"),
        F.count(F.lit(1)).alias("n_overlap"),
        (F.count(F.lit(1)).cast("double") / F.lit(10)).alias(
            "recall_at_10"
        ),
    )


@query(
    "llm_dedup_paragraphs_rewrite",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    ch AS (
        SELECT doc_id, i AS chunk_idx,
               array_to_string(
                   ws[i*{_PARA_W}+1 : i*{_PARA_W}+{_PARA_W}], ' ')
                   AS chunk
        FROM w, UNNEST(range(CAST(ceil(len(ws)/{_PARA_W}.0) AS BIGINT)))
                t(i)
    ),
    owned AS (
        SELECT doc_id, chunk_idx, chunk,
               (row_number() OVER (PARTITION BY md5(chunk)
                                   ORDER BY doc_id, chunk_idx) = 1)
               AS kept
        FROM ch
    ),
    rebuilt AS (
        SELECT doc_id,
               string_agg(chunk, ' ' ORDER BY chunk_idx)
                   FILTER (WHERE kept) AS clean_text
        FROM owned GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN clean_text IS NULL THEN 0
                ELSE CAST(strlen(clean_text) AS BIGINT) END
               AS clean_chars,
           md5(COALESCE(clean_text, '')) AS clean_digest
    FROM rebuilt
    """,
)
def llm_dedup_paragraphs_rewrite(spark, sf_dir):
    """The REWRITE stage of paragraph dedup — llm_dedup_paragraphs
    reports kept/dropped counts; this emits the cleaned document
    itself (graded as length + md5 so the hash stays scalar): the
    surviving 10-word units re-joined in original order, duplicates
    gone. Spark side keeps determinism without an ordered string
    aggregate (collect order is shuffle-dependent): the kept units
    are collected as (idx, chunk) structs, array_sort'ed — struct
    order sorts by idx first — then joined. A doc whose every unit
    was claimed elsewhere (an exact duplicate) rewrites to the
    empty string. Same shuffle shape as the report query; the full
    text reassembles per doc_id, touching each unit exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n_units = F.ceil(F.size(ws) / F.lit(float(_PARA_W))).cast("int")
    d = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_units - 1),
                lambda i: F.array_join(
                    F.slice(
                        F.split("text", " "),
                        i * F.lit(_PARA_W) + F.lit(1),
                        F.lit(_PARA_W),
                    ),
                    " ",
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    kept = (
        F.row_number().over(
            Window.partitionBy(F.md5("chunk")).orderBy(
                "doc_id", "chunk_idx"
            )
        )
        == 1
    )
    rebuilt = (
        d.withColumn("kept", kept)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"),
                                F.struct("chunk_idx", "chunk"),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text")
        )
    )
    return rebuilt.select(
        "doc_id",
        F.length("clean_text").cast("long").alias("clean_chars"),
        F.md5(F.coalesce("clean_text", F.lit(""))).alias("clean_digest"),
    )


_RECALL_QIDS = (0, 100, 200, 300, 400)


def _lsh_bucket_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN {_ndl_sql_proj(str(p))} > 0 THEN {2 ** p} "
        f"ELSE 0 END)"
        for p in range(_N_PLANES)
    )
    return f"({terms})"


_COS_EV_Q = (
    f"{_sql_dot('ev.embedding', 'q.qe')}"
    f" / (sqrt({_sql_dot('ev.embedding', 'ev.embedding')})"
    f" * sqrt({_sql_dot('q.qe', 'q.qe')}))"
)


@query(
    "llm_ann_recall_multi",
    oracle=f"""
    WITH sig AS (
        SELECT e.vec_id, {_lsh_bucket_sql()} AS bucket
        FROM embeddings e),
    qs AS (
        SELECT s.vec_id AS qid, s.bucket AS qbucket, ev.embedding AS qe
        FROM sig s JOIN embeddings ev ON ev.vec_id = s.vec_id
        WHERE s.vec_id IN {_RECALL_QIDS}),
    cand AS (
        SELECT q.qid, s.vec_id, {_COS_EV_Q} AS cos
        FROM sig s
        JOIN embeddings ev ON ev.vec_id = s.vec_id
        JOIN qs q ON s.bucket = q.qbucket AND s.vec_id <> q.qid),
    lsh AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cos DESC, vec_id) AS rn
            FROM cand) t WHERE rn <= 10),
    allp AS (
        SELECT q.qid, ev.vec_id, {_COS_EV_Q} AS cos
        FROM embeddings ev JOIN qs q ON ev.vec_id <> q.qid),
    bf AS (
        SELECT qid, vec_id FROM (
            SELECT qid, vec_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY cos DESC, vec_id) AS rn
            FROM allp) t WHERE rn <= 10),
    hits AS (
        SELECT lsh.qid, lsh.vec_id FROM lsh
        JOIN bf ON bf.qid = lsh.qid AND bf.vec_id = lsh.vec_id)
    SELECT q.qid, count(h.vec_id) AS n_overlap,
           CAST(count(h.vec_id) AS DOUBLE) / 10 AS recall_at_10
    FROM qs q LEFT JOIN hits h ON h.qid = q.qid
    GROUP BY q.qid
    """,
)
def llm_ann_recall_multi(spark, sf_dir):
    """Multi-probe index-quality evaluation — recall@10 of the LSH
    index for FIVE query vectors at once (llm_ann_recall generalizes
    from its single probe): the per-query recall distribution is
    what an ANN deployment actually monitors, since bucket-local
    quality varies. One signature pass over the corpus serves all
    probes; the query set broadcasts; LSH candidates come from the
    bucket equi-join and the brute-force truth from a
    corpus × 5-query broadcast product ranked per query — at 100 TB
    the truth side runs on a SAMPLE of queries exactly like this.
    Queries whose bucket holds < 10 candidates score their recall
    against a short candidate list (qid 0's bucket at sf0.01, for
    example), which is precisely the operational signal."""
    e = load_table(spark, sf_dir, "embeddings")

    def signature(emb):
        bits = [
            F.when(_ndl_proj(emb, p) > 0, F.lit(2 ** p)).otherwise(
                F.lit(0)
            )
            for p in range(_N_PLANES)
        ]
        return sum(bits[1:], bits[0])

    sig = e.select(
        "vec_id", "embedding", signature(F.col("embedding")).alias("bucket")
    )
    qs = sig.where(F.col("vec_id").isin(*_RECALL_QIDS)).select(
        F.col("vec_id").alias("qid"),
        F.col("bucket").alias("qbucket"),
        F.col("embedding").alias("qe"),
    )
    ee, qe = F.col("embedding"), F.col("qe")
    cos = _dot(ee, qe) / (F.sqrt(_dot(ee, ee)) * F.sqrt(_dot(qe, qe)))
    wq = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    cand = (
        sig.join(
            F.broadcast(qs),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id", cos.alias("cos"))
    )
    lsh = (
        cand.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    allp = (
        e.join(F.broadcast(qs), F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("cos"))
    )
    bf = (
        allp.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 10)
        .select("qid", "vec_id")
    )
    hits = lsh.join(bf, ["qid", "vec_id"])
    return (
        qs.select("qid")
        .join(hits, "qid", "left")
        .groupBy("qid")
        .agg(
            F.count("vec_id").alias("n_overlap"),
            (F.count("vec_id").cast("double") / F.lit(10)).alias(
                "recall_at_10"
            ),
        )
    )


_BLM_LAMBDA = 0.75  # interpolation weight: exact dyadic double


# Shared CTE chain for the interpolated bigram LM: `scored` holds the
# per-doc (n_bigrams, bg_logp) that both the raw scoring query and the
# perplexity bucketing query consume.
_BLM_CTES = f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(ws) - 1),
                                       i -> ws[i] || ' ' || ws[i+1]))
              AS bg
          FROM w),
    cxy AS (SELECT bg, count(*) AS c_xy FROM g GROUP BY bg),
    ctx AS (SELECT string_split(bg, ' ')[1] AS w1,
                   CAST(sum(c_xy) AS DOUBLE) AS c_ctx
            FROM cxy GROUP BY 1),
    u AS (SELECT term, count(*) AS c
          FROM (SELECT unnest(ws) AS term FROM w) GROUP BY term),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_u, count(*) AS vocab
            FROM u),
    p AS (SELECT cxy.bg,
                 CAST({_BLM_LAMBDA} AS DOUBLE)
                   * (CAST(cxy.c_xy AS DOUBLE) / ctx.c_ctx)
                 + CAST({1 - _BLM_LAMBDA} AS DOUBLE)
                   * ((CAST(u.c AS DOUBLE) + 1.0)
                      / (tot.n_u + CAST(tot.vocab AS DOUBLE))) AS prob
          FROM cxy
          JOIN ctx ON ctx.w1 = string_split(cxy.bg, ' ')[1]
          JOIN u ON u.term = string_split(cxy.bg, ' ')[2]
          CROSS JOIN tot),
    scored AS (
        SELECT g.doc_id, count(*) AS n_bigrams,
               CAST(sum(CAST(ln(p.prob) AS DECIMAL(18,6))) AS DOUBLE)
                   AS bg_logp
        FROM g JOIN p USING (bg)
        GROUP BY g.doc_id)
"""


@query(
    "llm_bigram_lm",
    oracle=f"""
    {_BLM_CTES}
    SELECT doc_id, n_bigrams, bg_logp FROM scored
    """,
)
def llm_bigram_lm(spark, sf_dir):
    """Interpolated bigram language-model scoring — the KenLM-class
    upgrade of llm_unigram_lm's quality proxy: p(w2|w1) =
    λ·c(w1w2)/c(w1·) + (1-λ)·p_add1(w2), λ=0.75 (exact dyadic).
    The context totals derive FROM the bigram table (no third
    corpus scan); bigram/unigram/context tables broadcast back and
    scoring is one (doc_id) aggregate of DEC-quantized ln terms.
    Emits the per-doc TOTAL log-prob plus the bigram count (the
    dsir lesson: a normalized quotient can land on a rounding
    midpoint; consumers divide downstream). Same shuffle classes as
    unigram_lm — (bigram) partial counts and (doc_id) partials,
    text never re-shuffles."""
    return _bigram_doc_scores(spark, sf_dir)


_CE_CACHE: dict = {}


def _ce_scores(spark, sf_dir):
    """Per-doc banded cross-entropy, persisted MEMORY_AND_DISK and
    memoized per (session, sf_dir, documents fingerprint): the
    perplexity tiering consumes it twice (band histogram + ranked
    read) and each consumer would otherwise re-execute the full
    bigram-LM scoring pipeline."""
    import os

    from pyspark import StorageLevel

    ap = os.path.abspath(os.path.normpath(sf_dir))
    try:
        st = os.stat(os.path.join(ap, "documents.parquet"))
        fp = (st.st_size, st.st_mtime_ns)
    except OSError:
        fp = None
    key = (id(spark), ap, fp)
    if key in _CE_CACHE:
        return _CE_CACHE[key]
    ce = (
        _bigram_doc_scores(spark, sf_dir)
        .select(
            "doc_id",
            ((-F.col("bg_logp")) / F.col("n_bigrams")).alias("ce"),
            dround6_div(-F.col("bg_logp"), F.col("n_bigrams"))
            .alias("ce_q"),
        )
        .withColumn("band", F.floor(F.col("ce") * 64).cast("long"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _CE_CACHE[key] = ce
    return ce


def _bigram_doc_scores(spark, sf_dir):
    """Per-doc (n_bigrams, bg_logp) under the interpolated bigram LM
    — the shared plan behind llm_bigram_lm (raw scores) and
    llm_perplexity_buckets (CCNet-style tiering)."""
    d = _rebalanced(load_table(spark, sf_dir, "documents"))
    ws = F.split("text", " ")
    n = F.size(ws)
    bigrams = F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    g = d.select("doc_id", F.explode(bigrams).alias("bg"))
    cxy = g.groupBy("bg").agg(F.count(F.lit(1)).alias("c_xy"))
    ctx = (
        cxy.groupBy(F.split("bg", " ").getItem(0).alias("w1"))
        .agg(F.sum("c_xy").cast("double").alias("c_ctx"))
    )
    u = (
        d.select(F.explode(ws).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = u.agg(
        F.sum("c").cast("double").alias("n_u"),
        F.count(F.lit(1)).alias("vocab"),
    )
    prob = (
        F.lit(_BLM_LAMBDA)
        * (F.col("c_xy").cast("double") / F.col("c_ctx"))
        + F.lit(1 - _BLM_LAMBDA)
        * ((F.col("c").cast("double") + F.lit(1.0))
           / (F.col("n_u") + F.col("vocab").cast("double")))
    )
    p = (
        cxy.join(
            F.broadcast(ctx),
            F.split("bg", " ").getItem(0) == F.col("w1"),
        )
        .join(
            F.broadcast(u),
            F.split("bg", " ").getItem(1) == F.col("term"),
        )
        .join(F.broadcast(tot))
        .select("bg", prob.alias("prob"))
    )
    return (
        g.join(F.broadcast(p), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            dsum(F.log("prob")).alias("bg_logp"),
        )
    )


@query(
    "llm_vocab_growth",
    oracle="""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents),
    first_seen AS (
        SELECT term, min(doc_id) AS first_doc
        FROM (SELECT doc_id,
                     unnest(list_transform(
                         generate_series(1, len(ws) - 1),
                         i -> ws[i] || ' ' || ws[i+1])) AS term
              FROM w) t
        GROUP BY term),
    bucketed AS (
        SELECT CAST(floor(first_doc * 10.0 / n.n_docs) AS BIGINT)
                   AS decile,
               count(*) AS new_terms
        FROM first_seen, n GROUP BY 1)
    SELECT decile, new_terms,
           CAST(sum(new_terms) OVER (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS vocab_size
    FROM bucketed
    """,
)
def llm_vocab_growth(spark, sf_dir):
    """Vocabulary growth curve (Heaps' law): how many NEW terms each
    successive tenth of the corpus contributes, plus the cumulative
    vocabulary — the sublinearity check that tells you whether more
    data still buys lexical coverage (a flat tail says the corpus
    is saturating; a hot tail flags contamination or language
    drift). The unit is BIGRAMS: the fixture's unigram vocabulary
    (~40 words) saturates inside the first decile, while the bigram
    space keeps growing corpus-long — which is also the honest
    real-world choice, where n-gram novelty outlives unigram
    novelty. Each unit's first occurrence is one aggregate —
    min(doc_id) — then per-decile counts and a 10-row cumulative
    window. The corpus is tokenized once; only (term, min_doc)
    pairs shuffle. Integer-exact throughout."""
    d = _rebalanced(load_table(spark, sf_dir, "documents"))
    n_docs = d.count()
    ws = F.split("text", " ")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 1),
        F.slice(ws, 2, F.size(ws) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    first_seen = (
        d.select("doc_id", F.explode(bigrams).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    # floor() explicitly on BOTH engines: DuckDB's CAST(double AS
    # BIGINT) ROUNDS half-even while Spark's cast truncates — an
    # implicit-cast trap worth this comment
    bucketed = first_seen.groupBy(
        F.floor(F.col("first_doc") * 10 / F.lit(n_docs))
        .cast("long")
        .alias("decile")
    ).agg(F.count(F.lit(1)).alias("new_terms"))
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return bucketed.select(
        "decile",
        "new_terms",
        F.sum("new_terms").over(w).alias("vocab_size"),
    )


@query(
    "llm_perplexity_buckets",
    oracle=f"""
    {_BLM_CTES},
    ce AS (SELECT doc_id, (-bg_logp) / n_bigrams AS ce,
                  {sql_dround6_div('-bg_logp', 'n_bigrams')} AS ce_q
           FROM scored),
    bk AS (SELECT ce, ce_q,
                  ntile(3) OVER (ORDER BY ce, doc_id) AS bucket
           FROM ce)
    SELECT bucket, count(*) AS n_docs,
           CAST(sum(CAST(ce_q AS DECIMAL(18,6))) AS DOUBLE) / count(*)
               AS mean_ce,
           min(ce) AS min_ce, max(ce) AS max_ce
    FROM bk GROUP BY bucket
    """,
)
def llm_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity tiering (Wenzek et al., LREC 2020):
    split the corpus into head/middle/tail thirds by language-model
    score and profile each tier — the standard recipe for choosing
    which slice of a crawl feeds training. The score is per-bigram
    CROSS-ENTROPY (-logp/n) from the shared interpolated-bigram LM
    plan; perplexity = exp(ce) is monotone in it, and exp() is
    deliberately not materialized (JVM StrictMath vs libm can differ
    in the last ulp — ce keeps both engines exact). The tier cut is
    ntile(3) over the total (ce, doc_id) order, so ties cannot
    straddle tiers nondeterministically. The tier MEAN sums the
    dround6_div-quantized ce, not a bare DECIMAL cast: ce is a
    6-dp decimal over a small integer, so it CAN land exactly on a
    6-dp cast midpoint where Spark's HALF_UP and DuckDB's half-even
    disagree by 1e-6 (observed once at sf0.01 — the dsir lesson
    again); min/max/ordering use the raw ce (pure picks).

    The tier assignment itself runs at the 100 TB shape (VERDICT r6
    item 2): a literal ntile(3) OVER (ORDER BY ce, doc_id) is a
    single-partition sort of one row per document — O(corpus) on one
    task. Instead each doc's GLOBAL rank is built in two levels, the
    llm_curriculum_order pattern: (1) a histogram over a coarse
    monotone banding of ce (band = floor(ce·64) — ce is bounded by
    the LM's log-vocab, so the band domain stays small at any
    corpus size) whose running sum gives each band its starting
    offset plus the corpus total, and (2) a row_number partitioned
    BY BAND ordered by (ce, doc_id). Banding is monotone in ce, so
    offset + in-band rank reproduces the serial window's total
    order exactly, and the ntile bucket is then pure arithmetic on
    (rank, N): the first N%3 tiers take ceil(N/3) rows — exactly
    ntile(3)'s fill rule, same oracle hash. The only unpartitioned
    window left scans the band histogram (bounded domain), not the
    corpus; test_llm_pipeline pins the plan shape. The ce relation
    (one row per doc) persists per fixture fingerprint — it feeds
    BOTH the histogram and the ranked branch, and without the cache
    each consumer re-executes the whole bigram-LM scoring subtree
    (the graph_triangles plan-audit lesson)."""
    ce = _ce_scores(spark, sf_dir)
    hist = ce.groupBy("band").agg(F.count(F.lit(1)).alias("bn"))
    wh = (Window.orderBy("band")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = hist.select(
        "band",
        F.coalesce(F.sum("bn").over(wh), F.lit(0)).alias("offset"),
        F.sum("bn").over(
            Window.partitionBy()).alias("n_total"),
    )
    in_band = F.row_number().over(
        Window.partitionBy("band").orderBy("ce", "doc_id"))
    ranked = (
        ce.join(F.broadcast(offsets), "band")
        .withColumn("rnk", F.col("offset") + in_band)
    )
    # ntile(3) fill rule: tier i gets N/3 rows +1 while i <= N%3
    n, third = F.col("n_total"), F.floor(F.col("n_total") / 3)
    r1 = third + F.when(n % 3 >= 1, 1).otherwise(0)
    r2 = r1 + third + F.when(n % 3 >= 2, 1).otherwise(0)
    bk = ranked.select(
        "ce", "ce_q",
        F.when(F.col("rnk") <= r1, 1)
         .when(F.col("rnk") <= r2, 2)
         .otherwise(3).alias("bucket"),
    )
    return bk.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.col("ce_q").cast(DEC)).cast("double")
         / F.count(F.lit(1))).alias("mean_ce"),
        F.min("ce").alias("min_ce"),
        F.max("ce").alias("max_ce"),
    )


@query(
    "llm_dedup_incremental",
    oracle="""
    WITH batch AS (
      SELECT doc_id, lang,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS th
      FROM documents WHERE doc_id % 5 = 4),
    corpus AS (
      SELECT DISTINCT
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS th
      FROM documents WHERE doc_id % 5 <> 4),
    fresh AS (
      SELECT b.doc_id, b.lang, b.th
      FROM batch b LEFT JOIN corpus c USING (th)
      WHERE c.th IS NULL),
    kept AS (
      SELECT doc_id, lang, th,
             row_number() OVER (PARTITION BY th ORDER BY doc_id) AS rn
      FROM fresh)
    SELECT doc_id, lang, th FROM kept WHERE rn = 1
    """,
)
def llm_dedup_incremental(spark, sf_dir):
    """INCREMENTAL exact dedup — the shape every continuously-fed
    corpus actually runs: an incoming batch (doc_id%5=4 is the
    deterministic stand-in) dedups against the existing corpus
    (anti-join on the normalized-text hash) and then within itself
    (keep-first per hash), emitting only genuinely new documents.
    Both sides shuffle 16-byte hashes, never text — the anti-join
    probes the corpus's DISTINCT hash set, and at 100 TB that set
    is the bloom-filter / state-store half of the streaming twin
    (stream_dedup). Same normalization as llm_corpus_dedup, so the
    union of (corpus survivors + incremental survivors) equals a
    full-corpus dedup — the consistency a rolling pipeline needs."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    batch = (
        d.where(F.col("doc_id") % 5 == 4)
        .select("doc_id", "lang", h.alias("th"))
    )
    corpus = (
        d.where(F.col("doc_id") % 5 != 4)
        .select(h.alias("th")).distinct()
    )
    fresh = batch.join(corpus, "th", "left_anti")
    w = Window.partitionBy("th").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "lang", "th")
    )


@query(
    "llm_ngram_novelty",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
               FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(ws) - 1),
                                       i -> ws[i] || ' ' || ws[i+1]))
              AS bg
          FROM w),
    cxy AS (SELECT bg, count(*) AS c FROM g GROUP BY bg)
    SELECT g.doc_id,
           count(*) AS n_bigrams,
           count(*) FILTER (WHERE cxy.c = 1) AS n_novel
    FROM g JOIN cxy USING (bg)
    GROUP BY g.doc_id
    """,
)
def llm_ngram_novelty(spark, sf_dir):
    """Per-document n-gram NOVELTY — how many of a doc's bigrams
    occur nowhere else in the corpus (corpus count = 1). High
    novelty marks original text worth keeping; near-zero novelty
    marks boilerplate/template families that near-dup passes then
    confirm (the cheap pre-filter before MinHash). Counts are
    emitted raw (consumers divide; the dsir midpoint lesson) —
    integer-exact on both engines. Shuffle classes: (bigram)
    counts, broadcast back onto the exploded stream, one (doc_id)
    aggregate — text itself never re-shuffles."""
    d = _rebalanced(load_table(spark, sf_dir, "documents"))
    ws = F.split("text", " ")
    n = F.size(ws)
    bigrams = F.zip_with(
        F.slice(ws, 1, n - 1),
        F.slice(ws, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    g = d.select("doc_id", F.explode(bigrams).alias("bg"))
    cxy = g.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    return (
        g.join(F.broadcast(cxy), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.count(F.when(F.col("c") == 1, 1)).alias("n_novel"),
        )
    )


@query(
    "llm_dsir_resample",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents),
    cnt AS (SELECT term, count(*) AS c,
                   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS c_en
            FROM w GROUP BY term),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_all,
                   CAST(sum(c_en) AS DOUBLE) AS n_en,
                   count(*) AS vocab FROM cnt),
    p AS (SELECT term,
                 (CAST(c AS DOUBLE) + 1.0)
                   / (tot.n_all + CAST(tot.vocab AS DOUBLE)) AS pr,
                 (CAST(c_en AS DOUBLE) + 1.0)
                   / (tot.n_en + CAST(tot.vocab AS DOUBLE)) AS pt
          FROM cnt, tot),
    lr AS (
      SELECT w.doc_id, any_value(w.lang) AS lang, count(*) AS n_tok,
             CAST(sum(CAST(ln(p.pt) - ln(p.pr) AS DECIMAL(18,6)))
                  AS DOUBLE) AS dsir_lr
      FROM w JOIN p USING (term)
      GROUP BY w.doc_id),
    u AS (
      SELECT *,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                      1, 6) AS BIGINT) AS DOUBLE)
               / 16777216.0 AS unif
      FROM lr)
    SELECT doc_id, lang, n_tok, dsir_lr
    FROM u
    WHERE unif < least(exp(2.0 * (dsir_lr - 0.5)), 1.0)
    """,
)
def llm_dsir_resample(spark, sf_dir):
    """The SAMPLING half of DSIR (Xie et al., NeurIPS 2023):
    llm_dsir_weights scores docs by target/raw log-likelihood ratio;
    this query actually draws the resampled corpus — a per-doc
    Bernoulli with p = min(exp(2(lr-0.5)), 1), tempered/shifted so
    the fixture's ratios spread over (0,1) and target-like docs
    dominate the draw. The coin is the REPRODUCIBLE kind:
    uniform = first 24 md5 bits of doc_id (the split-query's
    content-independent hash discipline), so membership is stable
    across runs/machines/partitionings and docs keep or lose their
    seat independently of corpus growth. The emitted columns are
    all deterministic (DEC-stabilized lr; the exp() appears ONLY
    inside the comparison, where a last-ulp engine difference
    could matter only if the 24-bit uniform landed within ~1e-16
    of the threshold). One extra codegen filter over the weights
    plan — no new shuffle."""
    lr = llm_dsir_weights(spark, sf_dir)
    unif = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
            16, 10,
        ).cast("bigint").cast("double")
        / F.lit(16777216.0)
    )
    return lr.where(
        unif < F.least(
            F.exp(2.0 * (F.col("dsir_lr") - 0.5)), F.lit(1.0))
    ).select("doc_id", "lang", "n_tok", "dsir_lr")


_KNNJ_SIG_SQL = " + ".join(
    f"(CASE WHEN {_ndl_sql_proj(str(p))} > 0 THEN {2 ** p} ELSE 0 END)"
    for p in range(_N_PLANES)
)
_KNNJ_COS_SQL = (
    f"{_sql_dot('ev.embedding', 'q.qe')}"
    f" / (sqrt({_sql_dot('ev.embedding', 'ev.embedding')})"
    f" * sqrt({_sql_dot('q.qe', 'q.qe')}))"
)


@query(
    "llm_knn_join",
    oracle=f"""
    WITH sig AS (
      SELECT e.vec_id, e.label, {_KNNJ_SIG_SQL} AS bucket
      FROM embeddings e),
    q AS (
      SELECT s.vec_id AS qid, s.bucket AS qbucket, ev.embedding AS qe
      FROM sig s JOIN embeddings ev ON ev.vec_id = s.vec_id
      WHERE s.vec_id % 50 = 0),
    cand AS (
      SELECT q.qid, s.vec_id, s.label,
             {_KNNJ_COS_SQL} AS cos_sim
      FROM sig s
      JOIN embeddings ev ON ev.vec_id = s.vec_id
      JOIN q ON s.bucket = q.qbucket
      WHERE s.vec_id % 50 <> 0),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY cos_sim DESC, vec_id) AS rn
      FROM cand)
    SELECT qid, vec_id, label, cos_sim FROM r WHERE rn <= 5
    """,
)
def llm_knn_join(spark, sf_dir):
    """k-NN JOIN — the MULTI-query form of llm_knn_lsh, and the
    operator that actually runs at scale (single-query top-k is a
    lookup; batch retrieval for RAG indexing / dedup candidate
    generation is a JOIN): every 50th vector is a query, all
    queries' signatures broadcast at once, candidates come from ONE
    shared bucket equi-join against the corpus signatures, and
    per-query top-5 is a (qid) window cut — no per-query scan, no
    N× plan. Cosines are the same bit-identical sequential folds
    as the single-query path. At 100 TB the broadcast holds only
    (qid, bucket, query vector) — queries in the thousands fit in
    tens of MB; corpus-scale query sets switch the broadcast to a
    bucket-partitioned shuffle join, same plan shape."""
    e = load_table(spark, sf_dir, "embeddings")

    def signature(emb):
        bits = [
            F.when(_ndl_proj(emb, p) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
            for p in range(_N_PLANES)
        ]
        return sum(bits[1:], bits[0])

    sig = e.select("vec_id", "label", "embedding",
                   signature(F.col("embedding")).alias("bucket"))
    q = sig.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    ee, qe = F.col("embedding"), F.col("qe")
    cos = _dot(ee, qe) / (F.sqrt(_dot(ee, ee)) * F.sqrt(_dot(qe, qe)))
    cand = (
        sig.where(F.col("vec_id") % 50 != 0)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select("qid", "vec_id", "label", cos.alias("cos_sim"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("qid", "vec_id", "label", "cos_sim")
    )


