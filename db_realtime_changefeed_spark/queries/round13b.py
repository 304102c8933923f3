"""Round-13 second-session graded queries — the diff (before/after
image) envelope surface, the key-only envelope option, the
FETCH ... WITH TIES SQL rewrite, quantified subqueries, and label
propagation.

Registered LAST in load_all (after round13) so every name here sits
behind the certified tail (grading-rotation discipline,
queries/__init__.py). Reference citations are N/A — the reference
tree is empty (SURVEY.md §0); the binding spec is the driver
contract + SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..streaming.replay import default_chunks
from . import query
from ._util import ts_group_chunk_cte

__all__ = ["load"]


def load() -> None:  # imported for side effects; keep a hook anyway
    pass


_CACHE: dict = {}


def _custkey_feed(spark, sf_dir):
    """Shared orders feed keyed on o_custkey — a key with real
    multiplicity ACROSS batches (a customer orders in many chunks),
    so before/after images are non-degenerate: the same key's
    aggregate evolves batch over batch, unlike the unique-PK feeds
    where every before image would be NULL."""
    from ..api import Database

    key = (id(spark), sf_dir, "__custkey__")
    if key not in _CACHE:
        _CACHE[key] = (
            Database(spark, sf_dir).table("orders")
            .changes(key="o_custkey"))
    return _CACHE[key]


# ---------------------------------------------- changefeed_table_diff

def _ctd_oracle() -> str:
    nb = default_chunks()
    return f"""
    WITH env AS (
      SELECT o_custkey AS k,
             CAST(o_orderdate AS TIMESTAMP) AS ts,
             o_totalprice AS value
      FROM orders),
    {ts_group_chunk_cte(nb).lstrip()},
    d AS (
      SELECT bt.batch_id, e.k, count(*) AS d_count,
             sum(CAST(e.value AS DECIMAL(28,6))) AS ds
      FROM env e JOIN batched bt ON e.ts = bt.ts
      GROUP BY 1, 2)
    SELECT batch_id, CAST(k AS VARCHAR) AS key, d_count,
           CAST(ds AS DOUBLE) AS d_sum,
           CAST(sum(d_count) OVER wprior AS BIGINT) AS before_cnt,
           CAST(sum(ds) OVER wprior AS DOUBLE) AS before_sum,
           CAST(COALESCE(sum(d_count) OVER wprior, 0) + d_count
                AS BIGINT) AS after_cnt,
           CAST(COALESCE(sum(ds) OVER wprior,
                         CAST(0 AS DECIMAL(28,6))) + ds
                AS DOUBLE) AS after_sum
    FROM d
    WINDOW wprior AS (PARTITION BY k ORDER BY batch_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)
    """


@query("changefeed_table_diff", oracle=_ctd_oracle)
def changefeed_table_diff(spark, sf_dir):
    """DIFF ENVELOPE — the CockroachDB ``WITH diff`` option
    re-expressed on the aggregate feed: every committed change
    carries the BEFORE image (the key's state just prior — NULL on
    first appearance, the CDC insert convention) and the AFTER image
    (state just following), alongside the delta itself. Served by
    ``TableFeed.log(diff=True)`` (api.py) straight off the committed
    delta log: the log totally orders each key's history by
    batch_id, so the before image is ONE running-prefix window — no
    base-table rescan, no second state store. Keyed on o_custkey
    (real cross-batch multiplicity; a unique-PK feed would make
    every before image NULL and the surface degenerate). The oracle
    reconstructs the chunk trajectory and folds the SAME prefix
    windows in the log's exact decimal slot, so a wrong accumulation
    order, a double-rounded image, or an off-by-one frame (before
    including the current batch) all break the hash.

    Scale: one shuffle on key — the partitioning the merge already
    uses; the prefix frame streams (no whole-partition buffering).
    At 100 TB the diff surface costs exactly one window over the
    delta log, never O(state) per batch."""
    feed = _custkey_feed(spark, sf_dir)
    log = feed.log(diff=True)
    nb = default_chunks()
    batches = sorted(
        r["batch_id"]
        for r in log.select("batch_id").distinct().collect())
    if batches != list(range(nb)):
        raise AssertionError(
            f"diff log committed batches {batches}, "
            f"expected {list(range(nb))}")
    return log

# ----------------------------------------------- sql_fetch_with_ties

#: the statement the engine runs — ANSI row-limiting with ties,
#: which Spark SQL does not parse; our SQL layer rewrites it into
#: the explicit rank() form (api.py _FETCH_TAIL)
_FETCH_TIES_SQL = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate DESC
FETCH FIRST 100 ROWS WITH TIES
"""

_FETCH_TIES_ORACLE = """
WITH r AS (
  SELECT o_orderkey, o_orderdate, o_totalprice,
         rank() OVER (ORDER BY o_orderdate DESC) AS rk
  FROM orders)
SELECT o_orderkey, o_orderdate, o_totalprice
FROM r WHERE rk <= 100
"""


@query("sql_fetch_with_ties", oracle=_FETCH_TIES_ORACLE)
def sql_fetch_with_ties(spark, sf_dir):
    """ANSI ``FETCH FIRST n ROWS WITH TIES`` (Postgres/SQL:2008),
    absent from Spark SQL — the r13 SQL-layer rewrite: the
    end-anchored clause detector (anchoring IS the top-level check:
    a FETCH inside a subquery or string literal is always followed
    by more text) strips the clause, requires the standard's
    top-level ORDER BY (ties are DEFINED by the sort key), and
    splices ``rank() OVER (ORDER BY <keys>) <= n`` into the body's
    own select list — the same visibility rule as the QUALIFY
    splice, so the sort key may name non-projected columns. ONLY
    (the tieless form) maps to LIMIT. The oracle is the de-sugared
    rank() form run natively on DuckDB — the exact relational
    algebra WITH TIES abbreviates — so a rewrite that dropped
    boundary ties (plain LIMIT) or kept too many (rank vs
    row_number confusion) breaks rows/hash. Set-deterministic: the
    result is every row tying the 100th latest order date,
    independent of intra-tie order.

    Scale: Spark's WindowGroupLimit pushes the rank predicate
    map-side (each task keeps its local top rows before the single
    merge), so the global ORDER BY never materializes a full sort —
    the sql_qualify plan shape."""
    from ..api import Database

    return Database(spark, sf_dir).sql(_FETCH_TIES_SQL)

# ---------------------------------------------- subquery_quantified

_QUANT_ORACLE = """
SELECT s_suppkey,
       s_acctbal > ALL (SELECT c_acctbal FROM customer c
                        WHERE c.c_nationkey = s.s_nationkey)
         AS gt_all,
       s_acctbal > ANY (SELECT c_acctbal FROM customer c
                        WHERE c.c_nationkey = s.s_nationkey)
         AS gt_any
FROM supplier s
"""


@query("subquery_quantified", oracle=_QUANT_ORACLE)
def subquery_quantified(spark, sf_dir):
    """QUANTIFIED comparison subqueries — ``x > ALL (sub)`` / ``x >
    ANY (sub)`` (SQL:1992), which Spark SQL does not parse
    (SPARK-24395 territory; IN/EXISTS are the only subquery
    predicates) — decorrelated into ONE aggregate per correlation
    key plus a broadcast join, with the FULL three-valued ANSI
    semantics made explicit instead of the naive min/max shortcut:
    per nation the subquery folds to (max, min, n_rows, n_nonnull),
    and then gt_all is TRUE on an empty set, NULL when x is NULL,
    FALSE when a non-null element >= x exists (x <= max), NULL when
    any NULL element remains (the comparison against it is UNKNOWN
    and nothing decided FALSE), else TRUE — and gt_any dually
    (FALSE on empty, TRUE when x > min, NULL under residual NULLs).
    The oracle runs the NATIVE correlated quantifiers on DuckDB
    (probed: empty -> TRUE/FALSE, NULL-element sets -> NULL), so
    the hash certifies the decorrelation against a real ANSI
    implementation, including the tie rows where x equals the
    nation's max exactly.

    Scale: the correlated subquery never re-executes per row — it
    is ONE map-side-combinable aggregate over customer (25 rows
    out), broadcast to supplier; at 100 TB the same shape holds for
    any correlation key with bounded cardinality, and a high-
    cardinality key degrades to a shuffle join on that key, never
    to per-row subquery execution."""
    from ..catalog import load_table

    agg = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.max("c_acctbal").alias("cmax"),
             F.min("c_acctbal").alias("cmin"),
             F.count(F.lit(1)).alias("n_rows"),
             F.count("c_acctbal").alias("n_nonnull"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    j = sup.join(F.broadcast(agg),
                 sup.s_nationkey == agg.c_nationkey, "left")
    x = F.col("s_acctbal")
    has_nulls = F.col("n_rows") > F.col("n_nonnull")
    null_b = F.lit(None).cast("boolean")
    gt_all = (
        F.when(F.col("n_rows").isNull(), F.lit(True))
        .when(x.isNull(), null_b)
        .when(x <= F.col("cmax"), F.lit(False))
        .when(has_nulls, null_b)
        .otherwise(F.lit(True)))
    gt_any = (
        F.when(F.col("n_rows").isNull(), F.lit(False))
        .when(x.isNull(), null_b)
        .when(x > F.col("cmin"), F.lit(True))
        .when(has_nulls, null_b)
        .otherwise(F.lit(False)))
    return j.select("s_suppkey", gt_all.alias("gt_all"),
                    gt_any.alias("gt_any"))

# ------------------------------------------ graph_label_propagation

_LPA_ROUNDS = 3  #: fixed synchronous rounds — determinism over
#: convergence-detection (the result is the round-3 labelling
#: itself, well-defined whatever the graph's diameter)

_LPA_STEP = """
s{i} AS (
  SELECT e.v AS node, l.label, count(*) AS c
  FROM edges e JOIN l{j} l ON l.node = e.u
  GROUP BY 1, 2),
l{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY c DESC, label) AS rk
    FROM s{i})
  WHERE rk = 1)"""

_LPA_ORACLE = (
    """
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 4 = 0),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey < b.l_partkey),
    edges AS (
      SELECT u, v FROM pairs
      UNION ALL SELECT v AS u, u AS v FROM pairs),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM edges),"""
    + ",".join(_LPA_STEP.format(i=i, j=i - 1)
               for i in range(1, _LPA_ROUNDS + 1))
    + f"""
    SELECT node, label AS community FROM l{_LPA_ROUNDS}
    """)


@query("graph_label_propagation", oracle=_LPA_ORACLE)
def graph_label_propagation(spark, sf_dir):
    """LABEL PROPAGATION community detection (Raghavan et al. 2007)
    over the co-purchase graph — a different OBJECT from the
    hash-min components twin: hash-min converges on connectivity
    (one label per connected component), LPA on label FREQUENCY
    (each node adopts its neighbourhood's majority label, so dense
    regions keep distinct communities inside one component). The
    classic algorithm is randomized twice over — random update
    order, random tie-break — so this is the DETERMINISTIC
    synchronous form: all nodes update simultaneously from the
    round-t labelling, ties broken (max count, then MIN label), a
    FIXED 3 rounds (_LPA_ROUNDS), and the graded result is the round-3
    labelling itself — exact, whatever the graph's convergence
    behaviour (synchronous LPA can 2-cycle on bipartite structures;
    a fixed horizon sidesteps that honestly). Each round is the
    Pregel message shape as DataFrame ops: edges join labels on the
    source, fold (dst, label) counts (map-side combinable), then
    max_by(label, (count, -label)) per dst — the argmax WITH the
    tie-break inside one aggregate, no per-node window. The oracle
    unrolls the same 3 rounds as chained CTEs with a rank-1
    window — an independent reconstruction of both the frequency
    argmax and the tie order.

    Scale: per round, one partial-aggregated shuffle on (node,
    label) then one on node — never an all-pairs step; labels
    localCheckpoint per round so the plan stays O(1) deep
    (the connected-components lineage lesson, round 6). At 100 TB
    the round count is the knob: LPA is near-converged by round 5
    on power-law graphs."""
    from pyspark import StorageLevel

    from .analytics_ext import _copurchase_pairs

    pairs = _copurchase_pairs(spark, sf_dir)
    edges = (
        pairs.select("u", "v")
        .unionAll(pairs.select(F.col("v").alias("u"),
                               F.col("u").alias("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(_LPA_ROUNDS):
        counts = (
            edges.join(labels, edges.u == labels.node)
            .groupBy(F.col("v").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counts.groupBy("node")
            .agg(F.max_by(
                "label",
                F.struct(F.col("c"),
                         (-F.col("label")).alias("nl")))
                .alias("label"))
            .localCheckpoint(eager=False)
        )
    out = labels.select("node", F.col("label").alias("community"))
    return out

# ------------------------------------------ changefeed_table_key_only

def _ctko_oracle() -> str:
    nb = default_chunks()
    return f"""
    WITH env AS (
      SELECT l_suppkey AS k,
             CAST(l_shipdate AS TIMESTAMP) AS ts
      FROM lineitem),
    {ts_group_chunk_cte(nb).lstrip()}
    SELECT bt.batch_id, CAST(e.k AS VARCHAR) AS key,
           count(*) AS d_count
    FROM env e JOIN batched bt ON e.ts = bt.ts
    GROUP BY 1, 2
    """


@query("changefeed_table_key_only", oracle=_ctko_oracle)
def changefeed_table_key_only(spark, sf_dir):
    """KEY-ONLY ENVELOPE — the CockroachDB ``envelope=key_only``
    option (r13): ``.changes(key="l_suppkey", envelope="key_only")``
    strips the change envelope to (tbl, op, key, ts) — no value, no
    payload image — for consumers that only need WHICH keys changed
    (cache invalidation, notification fan-out). This is an option
    of the MACHINERY, not a read-side projection: the chunk files
    carry no value column (their own cache tag), the merge
    aggregates counts only, and state ("cnt") and delta log
    ("d_count") drop their sum slots end to end — asserted in-query
    off the runner's DDLs. Filters are refused loudly on key-only
    feeds (the predicate would read columns the envelope
    deliberately does not carry). The graded frame is the full
    per-batch keyed-delta trajectory; the oracle re-derives the
    chunking and counts without ever touching a value.

    Scale: on a wide table the key-only envelope is the difference
    between shipping every change's row bytes and shipping ~24
    bytes per change; state per key shrinks to one long, and the
    merge's shuffle rows carry no decimal payload."""
    from ..api import Database

    key = (id(spark), sf_dir, "__ko__")
    if key not in _CACHE:
        _CACHE[key] = (
            Database(spark, sf_dir).table("lineitem")
            .changes(key="l_suppkey", envelope="key_only"))
    feed = _CACHE[key]
    r = feed._runner
    if not r.key_only:
        raise AssertionError("feed did not engage key_only")
    for ddl in (r._env_ddl, r._STATE_DDL, r._LOG_DDL):
        if "value" in ddl or "sum" in ddl:
            raise AssertionError(
                f"key-only DDL still carries a value slot: {ddl}")
    log = feed.log()
    if log.columns != ["batch_id", "key", "d_count"]:
        raise AssertionError(
            f"key-only log schema leaked a sum: {log.columns}")
    return log

# ------------------------------------------- changefeed_ddl_key_only

def _cdko_oracle() -> str:
    nb = default_chunks()
    return f"""
    WITH env AS (
      SELECT o_orderstatus AS k,
             CAST(o_orderdate AS TIMESTAMP) AS ts
      FROM orders),
    {ts_group_chunk_cte(nb).lstrip()}
    SELECT bt.batch_id, e.k AS key, count(*) AS d_count
    FROM env e JOIN batched bt ON e.ts = bt.ts
    GROUP BY 1, 2
    """


@query("changefeed_ddl_key_only", oracle=_cdko_oracle)
def changefeed_ddl_key_only(spark, sf_dir):
    """DDL OPTIONS CLAUSE x string key x key-only envelope:
    ``CREATE CHANGEFEED FOR orders KEY BY o_orderstatus WITH
    envelope = 'key_only'`` — the CockroachDB-style WITH clause
    lands in the DDL grammar (api.py _parse_changefeed_options;
    unknown options raise loudly — a silently dropped delivery
    option is a consumer-side correctness bug) and flows into the
    same runner machinery the fluent form uses. The interaction
    matters: the envelope key slot follows the STRING key type while
    the key-only layout drops the value slot — two orthogonal
    envelope axes set from one clause. Graded on the full per-batch
    keyed-delta trajectory (3 status keys recurring every batch).

    Scale: identical to changefeed_table_key_only — the option only
    narrows the envelope; no new runtime shape."""
    from ..api import Database

    key = (id(spark), sf_dir, "__ddlko__")
    if key not in _CACHE:
        _CACHE[key] = Database(spark, sf_dir).sql(
            "CREATE CHANGEFEED FOR orders KEY BY o_orderstatus "
            "WITH envelope = 'key_only'")
    feed = _CACHE[key]
    if not feed._runner.key_only:
        raise AssertionError("DDL option did not engage key_only")
    return feed.log()


# ----------------------------------------------- changefeed_ddl_diff

def _cdd_oracle() -> str:
    nb = default_chunks()
    return f"""
    WITH env AS (
      SELECT o_orderpriority AS k,
             CAST(o_orderdate AS TIMESTAMP) AS ts,
             o_totalprice AS value
      FROM orders),
    {ts_group_chunk_cte(nb).lstrip()},
    d AS (
      SELECT bt.batch_id, e.k, count(*) AS d_count,
             sum(CAST(e.value AS DECIMAL(28,6))) AS ds
      FROM env e JOIN batched bt ON e.ts = bt.ts
      GROUP BY 1, 2)
    SELECT batch_id, k AS key, d_count,
           CAST(ds AS DOUBLE) AS d_sum,
           CAST(sum(d_count) OVER wprior AS BIGINT) AS before_cnt,
           CAST(sum(ds) OVER wprior AS DOUBLE) AS before_sum,
           CAST(COALESCE(sum(d_count) OVER wprior, 0) + d_count
                AS BIGINT) AS after_cnt,
           CAST(COALESCE(sum(ds) OVER wprior,
                         CAST(0 AS DECIMAL(28,6))) + ds
                AS DOUBLE) AS after_sum
    FROM d
    WINDOW wprior AS (PARTITION BY k ORDER BY batch_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING)
    """


@query("changefeed_ddl_diff", oracle=_cdd_oracle)
def changefeed_ddl_diff(spark, sf_dir):
    """``CREATE CHANGEFEED FOR orders KEY BY o_orderpriority WITH
    diff`` — the DDL diff option must flow into DELIVERY, not just
    the log reader: the graded frame is what a fresh CURSOR drains
    (Cursor.poll calls the feed's log() with no arguments, which
    resolves to the feed's diff default), so a WITH-diff feed whose
    cursors silently served the plain 4-column envelope would break
    rows and schema here. String-keyed (5 priority values recurring
    every batch — every post-first before image non-NULL), with the
    before/after images accumulating in the log's exact decimal
    slot as in changefeed_table_diff.

    Scale: the cursor drain is the client-delivery surface (keyed
    aggregates, bounded by |priorities| x batches); the image
    window remains one key-partitioned prefix scan."""
    from ..api import Database

    key = (id(spark), sf_dir, "__ddldiff__")
    if key not in _CACHE:
        _CACHE[key] = Database(spark, sf_dir).sql(
            "CREATE CHANGEFEED FOR orders KEY BY o_orderpriority "
            "WITH diff")
    feed = _CACHE[key]
    rows = feed.cursor().poll()
    if not rows:
        raise AssertionError("diff cursor drained nothing")
    schema = feed.log().schema
    if len(rows[0]) != len(schema):
        raise AssertionError(
            f"cursor rows carry {len(rows[0])} columns, "
            f"log schema {len(schema)}")
    return spark.createDataFrame(rows, schema)

# ------------------------------------------------ sql_select_exclude

#: ONE text, both engines: DuckDB runs it natively, our SQL layer
#: maps EXCLUDE to Spark's native `* EXCEPT` star modifier
_SEL_EXCLUDE_SQL = """
SELECT * EXCLUDE (o_orderpriority, o_orderdate)
FROM orders
WHERE o_orderkey % 10 = 0
"""


@query("sql_select_exclude", oracle=_SEL_EXCLUDE_SQL)
def sql_select_exclude(spark, sf_dir):
    """DuckDB-style ``SELECT * EXCLUDE (cols)`` — the wide-table
    ergonomics modifier (project everything but the named columns)
    bridged onto Spark's native spelling ``* EXCEPT (cols)``
    (api.py _spark_sql): a quote/paren-aware scan parses the
    modifier list off the star and swaps the keyword; everything
    else stays Spark-native, so Catalyst still sees a plain star
    projection and prunes the excluded columns AT THE SCAN
    (ReadSchema drops them — this is sugar over column pruning, not
    a post-projection). The identical text runs natively on DuckDB
    as the oracle, certifying the bridge against the dialect being
    emulated. Unknown excluded columns raise on both engines.

    Scale: column pruning is the 100 TB point — EXCLUDE of 2 of 6
    columns cuts scan bytes proportionally on columnar storage;
    the rewrite adds zero runtime shape."""
    from ..api import Database

    return Database(spark, sf_dir).sql(_SEL_EXCLUDE_SQL)


# ------------------------------------------------ sql_select_replace

_SEL_REPLACE_SQL = """
SELECT * EXCLUDE (o_orderpriority)
       REPLACE (o_totalprice * 2 AS o_totalprice,
                lower(o_orderstatus) AS o_orderstatus)
FROM orders
WHERE o_orderkey % 10 = 0
"""


@query("sql_select_replace", oracle=_SEL_REPLACE_SQL)
def sql_select_replace(spark, sf_dir):
    """DuckDB-style ``* REPLACE (expr AS col, ...)`` composed with
    EXCLUDE — Spark has NO native replace modifier, so the bridge
    emulates it: resolve the base star's columns (analysis only,
    nothing executes), then emit the full ordered projection with
    the named columns replaced IN PLACE — positional parity with
    DuckDB, not an append-at-the-end approximation. Supported on
    the plain ``SELECT * ... FROM ...`` statement shape and refused
    loudly elsewhere (an expansion guessed around subclauses would
    silently misproject). The doubled price stays exact (x2 is an
    IEEE exponent bump) and lower() is deterministic, so the
    identical text hashes equal from DuckDB's native evaluation.

    Scale: the emulation is a projection rewrite at plan time; the
    executed plan is the same single pruned scan a hand-written
    projection gets."""
    from ..api import Database

    return Database(spark, sf_dir).sql(_SEL_REPLACE_SQL)

# -------------------------------------------- llm_kmeans_relational

_KM_K = 4       #: clusters (seeded by the K smallest vec_ids)
_KM_ROUNDS = 2  #: unrolled Lloyd rounds — determinism over
#: convergence (the LPA fixed-horizon recipe)

_KM_STEP = """
d{r} AS (
  SELECT e.vec_id, c.cid,
         sum(CAST((e.x - c.x) * (e.x - c.x)
                  AS DECIMAL(18,6))) AS d
  FROM emb e JOIN c{p} c ON c.i = e.i
  GROUP BY 1, 2),
a{r} AS (
  SELECT vec_id, cid, d FROM (
    SELECT vec_id, cid, d,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d, cid) AS rk
    FROM d{r})
  WHERE rk = 1),
c{r} AS (
  SELECT a.cid, e.i,
         CAST(sum(CAST(e.x AS DECIMAL(18,9))) AS DOUBLE)
           / count(*) AS x
  FROM emb e JOIN a{r} a ON a.vec_id = e.vec_id
  GROUP BY 1, 2)"""

_KM_ORACLE = (
    f"""
    WITH emb AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings,
           (SELECT unnest(range(1, 65)) AS i)),
    c0 AS (SELECT vec_id AS cid, i, x FROM emb
           WHERE vec_id < {_KM_K}),"""
    + ",".join(_KM_STEP.format(r=r, p=r - 1)
               for r in range(1, _KM_ROUNDS + 1))
    + f"""
    SELECT vec_id, cid AS cluster,
           CAST(d AS DOUBLE) AS dist_q6
    FROM a{_KM_ROUNDS}
    """)


@query("llm_kmeans_relational", oracle=_KM_ORACLE)
def llm_kmeans_relational(spark, sf_dir):
    """HASH-GRADED k-means — the exact-twin upgrade of the
    rows-only llm_kmeans (the llm_dedup_minhash_md5 move: the
    family's iterative member stays, a fully determinized twin
    earns the hash row). Every randomness and float hazard of
    Lloyd's algorithm is pinned: seeds are the embeddings of the
    4 smallest vec_ids (_KM_K; data-derived, no RNG); exactly
    2 synchronous rounds (_KM_ROUNDS — fixed horizon, the LPA
    recipe); the squared distance quantizes EACH per-dimension
    term to decimal(18,6) before the order-free decimal sum (the
    granger moment recipe — term doubles are bit-identical in both
    engines because float32 widens exactly and the subtract/square
    tree is transliterated); argmin ties break (distance, cid) —
    stated, not engine-luck; centroid updates are exact decimal
    means cast to double through ONE division. The oracle unrolls
    both rounds as chained CTEs over the 1-based DuckDB list index
    — an independent relational reconstruction of assignment AND
    re-estimation (a drifted tie-break, a reordered float sum, or
    an off-by-one dimension index all break the hash).

    Scale: the explode is 64 rows/vector ONCE (persisted);
    per round one broadcast join against the k x 64 centroid
    relation, one partial-aggregated shuffle on (vec_id, cid) and
    one on (cid, i) — the classic distributed Lloyd shape, no
    driver-side vectors. At 100 TB swap the seeded start for
    k-means|| and raise the horizon; the per-round dataflow is
    unchanged."""
    from pyspark import StorageLevel

    from ..catalog import load_table

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id",
                F.posexplode("embedding").alias("i0", "xf"))
        .select("vec_id", (F.col("i0") + 1).alias("i"),
                F.col("xf").cast("double").alias("x"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cent = (emb.where(F.col("vec_id") < _KM_K)
            .select(F.col("vec_id").alias("cid"), "i", "x"))
    dec6, dec9 = "decimal(18,6)", "decimal(18,9)"
    assign = None
    for _ in range(_KM_ROUNDS):
        c = cent.select(F.col("cid"), F.col("i").alias("ci"),
                        F.col("x").alias("cx"))
        d = (
            emb.join(F.broadcast(c), emb.i == F.col("ci"))
            .groupBy("vec_id", "cid")
            .agg(F.sum(((F.col("x") - F.col("cx"))
                        * (F.col("x") - F.col("cx")))
                       .cast(dec6)).alias("d"))
        )
        assign = (
            d.groupBy("vec_id")
            .agg(F.min_by(F.struct("cid", "d"),
                          F.struct("d", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"),
                    F.col("m.d").alias("d"))
            .localCheckpoint(eager=False)
        )
        cent = (
            emb.join(assign.select("vec_id", "cid"), "vec_id")
            .groupBy("cid", "i")
            .agg((F.sum(F.col("x").cast(dec9)).cast("double")
                  / F.count(F.lit(1))).alias("x"))
        )
    out = assign.select(
        "vec_id", F.col("cid").alias("cluster"),
        F.col("d").cast("double").alias("dist_q6"))
    emb.unpersist()
    return out

# ---------------------------------------------------- sql_asof_join

#: ONE text, both engines: DuckDB executes its native ASOF JOIN;
#: our SQL layer lowers the same text onto the union-merge plan
_ASOF_SQL = """
SELECT p.user_id, p.event_id AS purchase_id,
       c.event_id AS click_id, p.value - c.value AS value_gap
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.event_id > c.event_id
"""


@query("sql_asof_join", oracle=_ASOF_SQL)
def sql_asof_join(spark, sf_dir):
    """DuckDB-style ``ASOF JOIN`` as SQL TEXT (r13) — the dialect
    surface over the engine's existing as-of machinery (join_asof
    is the DataFrame operator; this is the statement a DuckDB/
    QuestDB/kdb user would paste): Database.sql detects a
    top-level ASOF [LEFT] JOIN, parses the constrained shape
    (aliased sides, alias-qualified conditions, equalities plus
    exactly ONE inequality — everything else refuses loudly,
    naming the reason), and lowers it onto the union-merge plan:
    tag both sides, one window over (keys, axis, side) carries the
    last right row forward — O(n log n) per key whatever the
    fan-in, never the naive range join. This query exercises the
    STRICT (>) INNER form — unmatched purchases drop, and a click
    at exactly the purchase's event_id must NOT match (strictness
    is the side sort key, stated not engine-luck). DuckDB runs the
    identical text natively as the oracle, certifying direction,
    strictness, and inner-drop semantics against the dialect being
    emulated; value_gap is one IEEE subtraction, bit-identical.

    Scale: same plan as join_asof — one shuffle on user_id + one
    sort; WindowExec streams the running last(ignorenulls)."""
    from ..api import Database

    return Database(spark, sf_dir).sql(_ASOF_SQL)
