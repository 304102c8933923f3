"""§2.J continued: language-ID evaluation, fused filter gates,
sketch-error evals, component representatives, clustering quality,
weighted sampling, mixture quotas, and winsorization. Split out of
llm_pipeline.py in round 7 (VERDICT r6 housekeeping item 9) purely
mechanically - registration names, bodies, and declaration order are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
# provider modules imported BEFORE the registry read: executor-side
# Python workers re-import a query module STANDALONE (no load_all), so
# composed-oracle lookups must not depend on load_all's import order
# (the round-8 full-suite lesson — round8._mrr_oracle)
from . import llm_curation  # noqa: F401
from . import ORACLES as _REGISTERED_ORACLES
from . import query
from .llm import (_LANG_ORDER, _STOPWORDS, _minhash_md5_oracle,
                  _shingles, llm_dedup_cluster, llm_dedup_minhash_md5,
                  llm_lang_id)
from ._util import DEC, sql_dsum

@query(
    "llm_language_confusion",
    oracle=f"""
    SELECT true_lang, pred_lang, count(*) AS n
    FROM ({_REGISTERED_ORACLES['llm_lang_id']}) b
    GROUP BY true_lang, pred_lang
    """,
)
def llm_language_confusion(spark, sf_dir):
    """Language-ID confusion matrix — the evaluation rollup every
    classifier in the cleaning pipeline needs before its output
    gates data: counts per (labelled, predicted) pair over
    llm_lang_id's stopword scorer (one extra 25-cell aggregate on
    top of the shared per-doc plan; the oracle wraps the SAME
    registered lang-id oracle, so scorer and rollup can never
    drift apart). The diagonal is accuracy; off-diagonal hot spots
    say which stopword lists collide."""
    return (
        llm_lang_id(spark, sf_dir)
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "llm_filter_gate",
    oracle=f"""
    SELECT q.doc_id,
           (q.quality >= 0.5 AND NOT r.flagged
            AND l.pred_lang <> 'und') AS keep,
           CASE WHEN q.quality < 0.5 THEN 'low_quality'
                WHEN r.flagged THEN 'repetitive'
                WHEN l.pred_lang = 'und' THEN 'unknown_lang'
           END AS reason
    FROM ({_REGISTERED_ORACLES['llm_quality_score']}) q
    JOIN ({_REGISTERED_ORACLES['llm_repetition_filter']}) r
      USING (doc_id)
    JOIN ({_REGISTERED_ORACLES['llm_lang_id']}) l
      ON l.doc_id = q.doc_id
    """,
)
def llm_filter_gate(spark, sf_dir):
    """The GATE — the keep/drop verdict that actually fronts a
    training pipeline, fusing the three graded component filters
    (quality band, Gopher repetition, language ID) into ONE map-only
    pass over the text: every sub-expression is a higher-order
    function on the same scan, so the corpus is read once and
    nothing shuffles (the composed-DataFrame form would scan
    documents three times and join on doc_id). Drift between this
    fused form and the standalone components is impossible to hide:
    the ORACLE is literally the three registered component oracles
    joined, so any divergence hash-fails. Rejected docs carry their
    FIRST failing rule (priority: quality, repetition, language) —
    the audit trail reviewers ask for."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    n_words = F.size(ws)
    uniq_ratio = F.size(F.array_distinct(ws)).cast("double") / n_words
    quality = (
        F.when(n_words.between(20, 80), 1.0).otherwise(0.0) * 0.5
        + F.when(uniq_ratio > 0.4, 1.0).otherwise(0.0) * 0.5
    )
    n3 = F.greatest(F.size(ws) - 2, F.lit(0))
    idx3 = F.sequence(F.lit(1), F.size(ws) - 2)
    tri = F.transform(
        idx3,
        lambda i: F.concat_ws(
            " ", F.element_at(ws, i), F.element_at(ws, i + 1),
            F.element_at(ws, i + 2)),
    )
    nd = F.when(n3 > 0, F.size(F.array_distinct(tri))).otherwise(0)
    flagged = (n3 > 0) & (
        (n3 - nd).cast("double") / n3.cast("double") > 0.2)

    def hits(lang):
        lst = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
        return F.size(F.filter(ws, lambda w: F.array_contains(lst, w)))

    h = {lg: hits(lg) for lg in _LANG_ORDER}
    pred = (
        F.when((h["en"] == 0) & (h["es"] == 0) & (h["de"] == 0)
               & (h["fr"] == 0), "und")
        .when((h["en"] >= h["es"]) & (h["en"] >= h["de"])
              & (h["en"] >= h["fr"]), "en")
        .when((h["es"] >= h["de"]) & (h["es"] >= h["fr"]), "es")
        .when(h["de"] >= h["fr"], "de")
        .otherwise("fr")
    )
    return d.select(
        "doc_id",
        ((quality >= 0.5) & ~flagged & (pred != "und")).alias("keep"),
        F.when(quality < 0.5, "low_quality")
        .when(flagged, "repetitive")
        .when(pred == "und", "unknown_lang")
        .alias("reason"),
    )


@query(
    "llm_minhash_error_eval",
    oracle=f"""
    WITH est AS ({_minhash_md5_oracle()}),
    w2 AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
                 i -> array_to_string(words[i:i+2], ' '))) AS s
      FROM w2 WHERE len(words) >= 3),
    j AS (
      SELECT e.est_jaccard,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
               AS true_j
      FROM est e
      JOIN sh a ON a.doc_id = e.doc_a
      JOIN sh b ON b.doc_id = e.doc_b)
    SELECT count(*) AS n_pairs,
           CAST(sum(CAST(FLOOR(abs(est_jaccard - true_j) * 1000000.0
                               + 0.5) / 1000000.0
                         AS DECIMAL(18,6))) AS DOUBLE) / count(*)
               AS mean_abs_err,
           max(abs(est_jaccard - true_j)) AS max_abs_err,
           CAST(sum(CAST(est_jaccard AS DECIMAL(18,6)))
                AS DOUBLE) / count(*) AS mean_est
    FROM j
    """,
)
def llm_minhash_error_eval(spark, sf_dir):
    """MinHash ESTIMATOR ERROR — the evaluation that justifies the
    sketch: over the banded-LSH candidate pairs, compare the 32-
    function signature estimate against the EXACT shingle-set
    Jaccard (one array_intersect per surviving pair — cheap
    precisely because LSH already cut the pair set). Reported:
    pair count, mean/max absolute error, mean estimate. The
    theoretical std-err of a k=32 sketch is sqrt(J(1-J)/32) ≈ 0.09
    at J=0.5 — the graded numbers let a user CHECK that before
    trusting the dedup threshold. Determinism: estimates are k/32
    (exact binaries, 5-dp decimals — cast-safe); the exact-Jaccard
    terms are arbitrary rationals, so the mean quantizes each term
    with the floor(x*1e6+0.5) tie-deterministic round; max is a
    pick. Scale: signatures and pair generation are the SAME plan
    as the dedup query; the verify join touches candidates only."""
    est = llm_dedup_minhash_md5(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    sets = (
        _shingles(d).groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("s"))
    )
    a = sets.select(F.col("doc_id").alias("doc_a"),
                    F.col("s").alias("sa"))
    b = sets.select(F.col("doc_id").alias("doc_b"),
                    F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    true_j = inter.cast("double") / (
        F.size("sa") + F.size("sb") - inter)
    j = (
        est.join(a, "doc_a").join(b, "doc_b")
        .select("est_jaccard", true_j.alias("true_j"))
    )
    err = F.abs(F.col("est_jaccard") - F.col("true_j"))
    err_q = F.floor(err * F.lit(1000000.0) + F.lit(0.5)).cast(
        "double") / F.lit(1000000.0)
    return j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.sum(err_q.cast(DEC)).cast("double")
         / F.count(F.lit(1))).alias("mean_abs_err"),
        F.max(err).alias("max_abs_err"),
        (F.sum(F.col("est_jaccard").cast(DEC)).cast("double")
         / F.count(F.lit(1))).alias("mean_est"),
    )


@query(
    "llm_lang_id_chargram",
    oracle="""
    WITH tri AS (
      SELECT doc_id, lang,
             unnest(list_transform(
                 generate_series(1, len(text) - 2),
                 i -> substr(text, i, 3))) AS g
      FROM documents),
    prof_c AS (
      SELECT lang AS plang, g, count(*) AS c
      FROM tri GROUP BY lang, g),
    prof AS (
      SELECT plang, g FROM (
        SELECT plang, g,
               row_number() OVER (PARTITION BY plang
                                  ORDER BY c DESC, g) AS rn
        FROM prof_c) WHERE rn <= 20),
    hits AS (
      SELECT t.doc_id, any_value(t.lang) AS true_lang, p.plang,
             count(*) AS h
      FROM tri t JOIN prof p ON p.g = t.g
      GROUP BY t.doc_id, p.plang),
    best AS (
      SELECT doc_id, true_lang, plang AS pred_lang, h,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY h DESC, plang) AS rn
      FROM hits)
    SELECT doc_id, true_lang, pred_lang, CAST(h AS BIGINT) AS n_hits
    FROM best WHERE rn = 1
    """,
)
def llm_lang_id_chargram(spark, sf_dir):
    """Char-trigram language ID — the TextCat/CLD family, and a
    TRAIN/APPLY demo in one plan: the PROFILE (top-20 trigrams per
    labelled language, deterministic (count DESC, gram) cut) is
    built from the corpus, broadcast back, and every doc is scored
    by profile hits with an argmax over (hits DESC, lang) — the
    same fit-transform shape a real model-apply job has, with the
    model as a broadcast relation instead of a binary blob.
    Complements llm_lang_id (word stopwords, fixed lists): here
    the features are LEARNED from the data. Shuffles: trigram
    counts partial-aggregate map-side; the profile is ~100 rows;
    per-doc scoring re-aggregates on (doc_id, lang)."""
    d = load_table(spark, sf_dir, "documents")
    # substring over a dynamic start index needs the SQL expr form
    tri = d.select(
        "doc_id", "lang",
        F.explode(F.expr(
            "transform(sequence(1, greatest(length(text) - 2, 0)),"
            " i -> substring(text, i, 3))")).alias("g"),
    )
    prof_c = tri.groupBy(F.col("lang").alias("plang"), "g").agg(
        F.count(F.lit(1)).alias("c"))
    wprof = Window.partitionBy("plang").orderBy(
        F.col("c").desc(), F.col("g"))
    prof = (
        prof_c.withColumn("rn", F.row_number().over(wprof))
        .where(F.col("rn") <= 20).select("plang", "g")
    )
    hits = (
        tri.join(F.broadcast(prof), "g")
        .groupBy("doc_id", "plang")
        .agg(F.first("lang").alias("true_lang"),
             F.count(F.lit(1)).alias("h"))
    )
    wbest = Window.partitionBy("doc_id").orderBy(
        F.col("h").desc(), F.col("plang"))
    return (
        hits.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select("doc_id", "true_lang",
                F.col("plang").alias("pred_lang"),
                F.col("h").alias("n_hits"))
    )


@query(
    "llm_neardup_verify_edit",
    oracle=f"""
    WITH cand AS ({_minhash_md5_oracle()}),
    t AS (SELECT doc_id, substr(text, 1, 80) AS head,
                 len(substr(text, 1, 80)) AS hlen
          FROM documents)
    SELECT c.doc_a, c.doc_b,
           CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_dist,
           FLOOR((1.0 - CAST(levenshtein(a.head, b.head) AS DOUBLE)
                    / greatest(a.hlen, b.hlen)) * 1000000.0 + 0.5)
             / 1000000.0 AS edit_sim
    FROM cand c
    JOIN t a ON a.doc_id = c.doc_a
    JOIN t b ON b.doc_id = c.doc_b
    """,
)
def llm_neardup_verify_edit(spark, sf_dir):
    """Edit-distance VERIFY on the LSH candidate pairs — the
    character-level second opinion next to llm_neardup_verify_md5's
    set-based Jaccard: Levenshtein catches reorder-free
    near-duplicates (OCR noise, small insertions) that shingle sets
    score identically, and disagreement between the two verifiers
    is itself a signal (template text vs edited text). Distance runs
    on 80-char heads — the production bound, since full-document
    DP is O(len²) per pair and the candidates already share
    signatures; similarity is 1 - d/max(len), tie-quantized at 6 dp.
    Integer DP is engine-exact; the join touches candidates only."""
    cand = llm_dedup_minhash_md5(spark, sf_dir).select("doc_a", "doc_b")
    d = load_table(spark, sf_dir, "documents")
    heads = d.select(
        "doc_id",
        F.substring("text", 1, 80).alias("head"),
        F.length(F.substring("text", 1, 80)).alias("hlen"),
    )
    a = heads.select(F.col("doc_id").alias("doc_a"),
                     F.col("head").alias("ha"),
                     F.col("hlen").alias("la"))
    b = heads.select(F.col("doc_id").alias("doc_b"),
                     F.col("head").alias("hb"),
                     F.col("hlen").alias("lb"))
    lev = F.levenshtein("ha", "hb")
    sim = (F.lit(1.0) - lev.cast("double")
           / F.greatest("la", "lb"))
    sim_q = (F.floor(sim * F.lit(1000000.0) + F.lit(0.5))
             .cast("double") / F.lit(1000000.0))
    return (
        cand.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b",
                lev.cast("bigint").alias("edit_dist"),
                sim_q.alias("edit_sim"))
    )


@query(
    "llm_pipeline_attrition",
    oracle="""
    WITH survivors AS (
      SELECT doc_id, lang, n_chars, text,
             row_number() OVER (
               PARTITION BY md5(lower(regexp_replace(text, '\\s+', ' ',
                                                     'g')))
               ORDER BY doc_id) AS rn
      FROM documents),
    flagged AS (
      SELECT doc_id, lang, n_chars, text, (rn = 1) AS s_exact,
             (rn = 1 AND n_chars >= 60
              AND len(string_split(text, ' ')) >= 20) AS s_quality
      FROM survivors),
    clean AS (
      SELECT doc_id, lang, n_chars,
             list_distinct(string_split(text, ' ')) AS ws
      FROM flagged WHERE s_quality),
    neardup_losers AS (
      SELECT DISTINCT b.doc_id AS loser
      FROM clean a JOIN clean b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
       AND abs(a.n_chars - b.n_chars) <= 10
      WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
              / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))
            > 0.5)
    SELECT 0 AS stage_idx, 'input' AS stage,
           count(*) AS n_surviving FROM flagged
    UNION ALL
    SELECT 1, 'exact_dedup', count(*) FROM flagged WHERE s_exact
    UNION ALL
    SELECT 2, 'quality_length', count(*) FROM flagged WHERE s_quality
    UNION ALL
    SELECT 3, 'near_dedup', count(*) FROM flagged
    WHERE s_quality
      AND doc_id NOT IN (SELECT loser FROM neardup_losers)
    """,
)
def llm_pipeline_attrition(spark, sf_dir):
    """The ATTRITION FUNNEL of the cleaning pipeline — the one-page
    report every corpus release publishes (how many docs each stage
    costs): survivors after exact dedup, after the length/token
    quality gate, after near-dup removal, against the raw input.
    Same stage definitions as llm_pipeline_end_to_end (its oracle's
    CTEs, re-expressed as per-doc FLAGS so all four counts ride ONE
    corpus scan plus the near-dup candidate join — not one scan per
    stage); monotone by construction, which the test asserts. At
    100 TB this shape is why flags beat materializing per-stage
    tables: the report costs one pass, and each stage's loss is
    auditable without re-running the pipeline."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    w = Window.partitionBy(h).orderBy("doc_id")
    flagged = d.select(
        "doc_id", "lang", "n_chars", "text",
        (F.row_number().over(w) == 1).alias("s_exact"),
    ).withColumn(
        "s_quality",
        F.col("s_exact") & (F.col("n_chars") >= 60)
        & (F.size(F.split("text", " ")) >= 20),
    )
    clean = flagged.where("s_quality").select(
        "doc_id", "lang", "n_chars",
        F.array_distinct(F.split("text", " ")).alias("ws"),
    )
    a, b = clean.alias("a"), clean.alias("b")
    inter = F.size(F.array_intersect("a.ws", "b.ws"))
    jac = inter.cast("double") / (
        F.size("a.ws") + F.size("b.ws") - inter)
    losers = (
        a.join(b, (F.col("a.lang") == F.col("b.lang"))
               & (F.col("a.doc_id") < F.col("b.doc_id"))
               & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 10))
        .where(jac > 0.5)
        .select(F.col("b.doc_id").alias("loser"))
        .distinct()
    )
    final_flag = flagged.join(
        losers, flagged.doc_id == losers.loser, "left")
    counts = final_flag.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count(F.when(F.col("s_exact"), 1)).alias("n_exact"),
        F.count(F.when(F.col("s_quality"), 1)).alias("n_quality"),
        F.count(F.when(F.col("s_quality")
                       & F.col("loser").isNull(), 1)).alias("n_final"),
    )
    return counts.selectExpr(
        "stack(4, 0, 'input', n_input, 1, 'exact_dedup', n_exact,"
        " 2, 'quality_length', n_quality, 3, 'near_dedup', n_final)"
        " AS (stage_idx, stage, n_surviving)")


@query(
    "llm_cluster_best_rep",
    oracle=f"""
    WITH base AS ({_REGISTERED_ORACLES['llm_dedup_cluster']}),
    j AS (
      SELECT b.doc_id, b.cluster_id, d.n_chars
      FROM base b JOIN documents d USING (doc_id)),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY cluster_id
                 ORDER BY n_chars DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY cluster_id) AS nm
      FROM j)
    SELECT cluster_id, doc_id AS rep_doc_id,
           CAST(n_chars AS BIGINT) AS rep_n_chars,
           CAST(nm AS BIGINT) AS n_members
    FROM r WHERE rn = 1
    """,
)
def llm_cluster_best_rep(spark, sf_dir):
    """Representative SELECTION for dedup clusters — production
    dedup keeps the BEST member of each near-dup family, not the
    arbitrary minimum id (the longest doc usually carries the most
    content; Lee et al. and the CCNet pipeline both keep-longest):
    per connected component, the (n_chars DESC, doc_id) leader,
    with the member count for audit. One keep-first window over the
    labelled docs; components come from the shared
    operators/components.py machinery and the oracle wraps the
    REGISTERED llm_dedup_cluster oracle, so labelling drift
    hash-fails. Singleton docs are their own cluster and rep."""
    labels = llm_dedup_cluster(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars")
    j = labels.join(d, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    wc = Window.partitionBy("cluster_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("nm", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            F.col("n_chars").cast("bigint").alias("rep_n_chars"),
            F.col("nm").cast("bigint").alias("n_members"),
        )
    )


_SIL_D2 = (
    "list_aggregate(list_transform(range(1, len(e.embedding)+1),"
    " i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])"
    " * (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i])), 'sum')"
)


@query(
    "llm_label_silhouette",
    oracle=f"""
    WITH pm AS (
      SELECT label, i AS pos,
             {sql_dsum('CAST(embedding[i] AS DOUBLE)')} / count(*)
                 AS cv
      FROM embeddings, range(1, 65) AS t(i)
      GROUP BY label, i),
    cent AS (SELECT label, list(cv ORDER BY pos) AS centroid
             FROM pm GROUP BY label),
    dist AS (
      SELECT e.vec_id, e.label AS own, c.label AS clab,
             sqrt({_SIL_D2}) AS d
      FROM embeddings e, cent c),
    per_vec AS (
      SELECT vec_id, own,
             max(CASE WHEN clab = own THEN d END) AS d_own,
             min(CASE WHEN clab <> own THEN d END) AS d_other
      FROM dist GROUP BY vec_id, own),
    s AS (
      SELECT own AS label,
             (d_other - d_own) / greatest(d_own, d_other) AS sil
      FROM per_vec)
    SELECT label, count(*) AS n,
           CAST(sum(CAST(FLOOR(sil * 1000000.0 + 0.5) / 1000000.0
                         AS DECIMAL(18,6))) AS DOUBLE) / count(*)
               AS mean_silhouette,
           min(sil) AS min_sil, max(sil) AS max_sil
    FROM s GROUP BY label
    """,
)
def llm_label_silhouette(spark, sf_dir):
    """Silhouette score per label — the clustering-quality metric
    (simplified/centroid form: distances to CLUSTER CENTROIDS, as
    in scalable silhouette implementations, not all-pairs): s =
    (b - a)/max(a, b) with a = distance to the own-label centroid
    and b = the nearest other centroid. Positive means the label
    structure is real; ≈0 means overlapping clouds — the number
    that tells you whether label-blocked dedup (llm_neardup_
    embedding) and IVF cells (llm_knn_ivf) can work on this
    corpus. Centroids are the DEC-stabilized per-dim means
    (llm_embedding_centroid's aggregate); distances are sequential
    folds + sqrt (engine-exact, as every cosine query proves); the
    per-label mean quantizes each s with the tie-deterministic
    floor round. Scale: 5 centroids broadcast; one pass over the
    vectors; the (vec, centroid) expansion is k×, not n²."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg((F.sum(F.col("v").cast("double").cast(DEC)).cast("double")
              / F.count(F.lit(1))).alias("cv"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv")))
             .alias("pc"))
        .select(F.col("label").alias("clab"),
                F.transform("pc", lambda s: s.cv).alias("centroid"))
    )
    diff2 = F.zip_with(
        "embedding", "centroid",
        lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
    )
    d = F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v))
    dist = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", F.col("label").alias("own"), "clab",
                d.alias("d"))
    )
    per_vec = dist.groupBy("vec_id", "own").agg(
        F.max(F.when(F.col("clab") == F.col("own"), F.col("d")))
            .alias("d_own"),
        F.min(F.when(F.col("clab") != F.col("own"), F.col("d")))
            .alias("d_other"),
    )
    sil = (F.col("d_other") - F.col("d_own")) / F.greatest(
        "d_own", "d_other")
    s = per_vec.select(F.col("own").alias("label"), sil.alias("sil"))
    sil_q = (F.floor(F.col("sil") * 1000000.0 + 0.5).cast("double")
             / F.lit(1000000.0))
    return s.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(sil_q.cast(DEC)).cast("double")
         / F.count(F.lit(1))).alias("mean_silhouette"),
        F.min("sil").alias("min_sil"),
        F.max("sil").alias("max_sil"),
    )


# --------------------------------------------- weighted priority sample

@query(
    "llm_sample_weighted",
    oracle="""
    WITH k AS (
      SELECT doc_id, lang, n_chars,
             ((CAST(concat('0x',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) + 0.5) / 4294967296.0) AS u
      FROM documents)
    SELECT doc_id, lang, n_chars,
           FLOOR(u * 1000000.0 / CAST(n_chars AS DOUBLE) + 0.5)
             / 1000000.0 AS key6
    FROM k
    ORDER BY u / CAST(n_chars AS DOUBLE), doc_id
    LIMIT 50
    """,
)
def llm_sample_weighted(spark, sf_dir):
    """Deterministic weighted priority sample (data-mixing op): pick
    the k=50 docs of a weight-biased race, weight = n_chars (longer
    docs proportionally likelier), reproducible across engines,
    machines, and partitionings — the property df.sample(weights)
    cannot give. Each doc gets an EXACT uniform u = (first 4 md5
    bytes + 0.5) / 2^32 (a dyadic rational: the +0.5 and the
    power-of-two divide are exact in IEEE, so Spark and DuckDB hold
    bit-identical doubles), races with key u/w, and the k smallest
    keys win; pairwise P(i beats j) = w_i/(w_i+w_j). The classic
    Efraimidis-Spirakis A-ES variant (key = u^(1/w)) is a one-line
    swap when cross-engine bit-parity is not required — pow()'s
    last-ulp is libm-specific, so the graded form stays rational.
    Map-only scoring + TakeOrdered heap top-k: no shuffle, no
    global sort, scan-bound at any corpus size. Displayed key6
    quantizes via the floor-round (u/w is rational and CAN land on
    a 6-dp midpoint — _util.dround6_div semantics)."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("long").cast("double") + F.lit(0.5))
        / F.lit(4294967296.0)
    )
    w = F.col("n_chars").cast("double")
    return (
        d.select("doc_id", "lang", "n_chars", u.alias("u"))
        .select(
            "doc_id", "lang", "n_chars",
            (F.floor(F.col("u") * F.lit(1000000.0)
                     / F.col("n_chars").cast("double") + F.lit(0.5))
             .cast("double") / F.lit(1000000.0)).alias("key6"),
            (F.col("u") / F.col("n_chars").cast("double")).alias("_k"),
        )
        .orderBy("_k", "doc_id")
        .limit(50)
        .drop("_k")
    )


@query(
    "llm_mix_quota",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             CASE lang WHEN 'en' THEN 80 ELSE 30 END AS target_n
      FROM documents)
    SELECT doc_id, lang, rn, target_n
    FROM r WHERE rn <= target_n
    """,
)
def llm_mix_quota(spark, sf_dir):
    """Quota mixture sampling (the data-mixing op behind Pile/DoReMi
    -style domain rebalancing): build a training mix that hits an
    exact per-language composition — 80 en / 30 each otherwise —
    regardless of the corpus's native skew, by ranking each
    language's docs on a content-independent hash and cutting at
    the quota. Differs from llm_sample_stratified (per-stratum RATE
    predicate: scan-only but count varies with corpus size) in that
    quotas are EXACT counts, which a rate cannot give; the price is
    one window shuffle on the stratum key. A language with fewer
    docs than quota contributes everything it has (the cut is a
    <=). The hash ranking makes the mix reproducible and stable
    under corpus growth everywhere EXCEPT at the quota boundary —
    documented: a new doc hashing inside the top-k evicts exactly
    the old rank-k doc, the minimal possible churn. At 100 TB
    rank-then-cut per stratum is the two-phase TakeOrdered shape:
    per-partition heaps of size quota, then a per-stratum merge —
    no full sort materializes."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    target = F.when(F.col("lang") == "en", 80).otherwise(30)
    return (
        d.select("doc_id", "lang",
                 F.row_number().over(w).alias("rn"),
                 target.cast("long").alias("target_n"))
        .where(F.col("rn") <= F.col("target_n"))
    )


@query(
    "llm_winsorize",
    oracle="""
    WITH p AS (
      SELECT doc_id, lang, n_chars,
             quantile_cont(n_chars, 0.05)
               OVER (PARTITION BY lang) AS p05,
             quantile_cont(n_chars, 0.95)
               OVER (PARTITION BY lang) AS p95
      FROM documents)
    SELECT doc_id, lang, n_chars,
           round(p05, 6) AS p05,
           round(p95, 6) AS p95,
           round(least(greatest(CAST(n_chars AS DOUBLE), p05), p95), 6)
             AS clipped,
           (CAST(n_chars AS DOUBLE) < p05
            OR CAST(n_chars AS DOUBLE) > p95) AS is_clipped
    FROM p
    """,
)
def llm_winsorize(spark, sf_dir):
    """Per-stratum winsorization (the robust-preprocessing step that
    keeps outlier documents from dominating length-weighted
    training statistics): clip n_chars to each language's exact
    [p05, p95] band, flagging what was clipped. The thresholds are
    WINDOW percentiles over the stratum — one scan, one shuffle —
    instead of an aggregate+join-back (two scans); percentile()'s
    linear interpolation matches DuckDB's quantile_cont to 6 dp
    exactly as agg_quantiles grades. Honesty note for 100 TB: exact
    window percentiles buffer each stratum, so the scale path swaps
    in approx_percentile thresholds computed once and broadcast —
    identical clip logic, sketch-bounded state (same contract
    agg_quantiles documents)."""
    d = load_table(spark, sf_dir, "documents")
    nc = F.col("n_chars").cast("double")
    p05 = F.expr("percentile(n_chars, 0.05)"
                 " OVER (PARTITION BY lang)")
    p95 = F.expr("percentile(n_chars, 0.95)"
                 " OVER (PARTITION BY lang)")
    withp = d.select("doc_id", "lang", "n_chars",
                     p05.alias("p05"), p95.alias("p95"))
    return withp.select(
        "doc_id", "lang", "n_chars",
        F.round("p05", 6).alias("p05"),
        F.round("p95", 6).alias("p95"),
        F.round(F.least(F.greatest(nc, F.col("p05")), F.col("p95")), 6)
        .alias("clipped"),
        ((nc < F.col("p05")) | (nc > F.col("p95"))).alias("is_clipped"),
    )
