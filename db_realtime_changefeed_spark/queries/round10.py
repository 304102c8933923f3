"""Round-10 graded queries.

Registered LAST in load_all (after round9b) so every name here sits
behind the certified-pending rotation tail (grading-rotation
discipline, queries/__init__.py). Reference citations are N/A — the
reference tree is empty (SURVEY.md §0); the binding spec is the
driver contract + SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query
from ._util import dsum, sql_dsum

__all__ = ["load"]


def load() -> None:  # imported for side effects; keep a hook anyway
    pass


# ---------------------------------------------- changefeed_topk_orders

def _topk_orders_oracle() -> str:
    from ..streaming.replay import default_chunks

    nb = default_chunks()
    return f"""
    WITH numbered AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
             count(*) OVER () AS n
      FROM orders
    ), chunked AS (
      SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
             CAST(floor(rn / ceil(n / {nb}.0)) AS BIGINT) AS chunk
      FROM numbered
    ), batches AS (
      SELECT DISTINCT chunk AS batch_id FROM chunked
    ), latest AS (
      SELECT b.batch_id, c.o_custkey, c.o_totalprice, c.o_orderkey,
             row_number() OVER (
               PARTITION BY b.batch_id, c.o_custkey
               ORDER BY c.o_orderdate DESC, c.o_orderkey DESC) AS rrn
      FROM batches b JOIN chunked c ON c.chunk <= b.batch_id
    ), vis AS (
      SELECT batch_id, o_custkey, o_totalprice, o_orderkey
      FROM latest WHERE rrn = 1
    ), ranked AS (
      SELECT batch_id, o_custkey, o_totalprice, o_orderkey,
             row_number() OVER (PARTITION BY batch_id
                                ORDER BY o_totalprice DESC,
                                         o_orderkey ASC) AS rk
      FROM vis
    ), topk AS (
      SELECT batch_id, o_custkey, o_totalprice, o_orderkey
      FROM ranked WHERE rk <= 5
    ), cur AS (
      SELECT batch_id AS bb, o_custkey, o_totalprice, o_orderkey
      FROM topk
    ), prev AS (
      SELECT batch_id + 1 AS bb, o_custkey, o_totalprice, o_orderkey
      FROM topk
      WHERE batch_id + 1 <= (SELECT max(chunk) FROM chunked)
    )
    SELECT bb AS batch_id, o_custkey,
           CASE WHEN prev.o_orderkey IS NULL THEN 'enter'
                WHEN cur.o_orderkey IS NULL THEN 'leave'
                ELSE 'update' END AS change,
           prev.o_totalprice AS old_value,
           cur.o_totalprice AS new_value
    FROM cur FULL JOIN prev USING (bb, o_custkey)
    WHERE cur.o_orderkey IS NULL OR prev.o_orderkey IS NULL
       OR cur.o_orderkey <> prev.o_orderkey
    """


@query("changefeed_topk_orders", oracle=_topk_orders_oracle())
def changefeed_topk_orders(spark, sf_dir):
    """`db.table('orders').views().top_k().changes()` — the top-k
    enter/leave/update DELTA FEED on the GENERIC runner (the round-9
    verdict's #1 surface gap: the events family had it,
    streaming/views.py _refresh_topk, but "top 5 customers by latest
    order value" on a generic table could not emit deltas). The
    shared orders runner now writes the same durable per-batch
    enter/leave/update log off its range index
    (generic_views.GenericAggViewRunner._refresh_topk): previous
    membership from the warm cache or recomputed from the durable
    index at batch-1, offsets carried on emitted rows only (a
    member whose position shifts purely because another member moved
    emits nothing — the events contract, changefeed_topk_view).

    The oracle reconstructs every batch's true visible LWW state,
    ranks it (value DESC, seq ASC), and diffs consecutive top-5
    lists — a stale or phantom member in ANY batch breaks the hash.

    Scale: each per-batch refresh is the O(k + band) widening index
    read (descending value bands, every unread band strictly worse),
    never a scan of the whole state; driver holds O(k) rows per
    batch; the log write is O(deltas)."""
    from ..streaming.generic_views import orders_runner

    return orders_runner(spark, sf_dir).topk_log().select(
        "batch_id", "o_custkey", "change", "old_value", "new_value")


# ---------------------------------------- changefeed_lineitem_watchlist

_LI_CACHE: dict = {}


def _li_watch_oracle() -> str:
    from ..streaming.replay import default_chunks

    nb = default_chunks()
    return f"""
    WITH pk AS (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             l_orderkey * 8 + l_linenumber AS k
      FROM lineitem
    ), uniq AS (
      SELECT k FROM pk GROUP BY k HAVING count(*) = 1
    ), uo AS (
      SELECT k, row_number() OVER (ORDER BY k) - 1 AS urn,
             count(*) OVER () AS un
      FROM uniq
    ), watch AS (
      SELECT k FROM uo WHERE urn = 0 OR urn = un // 2 OR urn = un - 1
    )
    SELECT p.l_orderkey, p.l_linenumber,
           CAST(NULL AS DOUBLE) AS old_value,
           p.l_extendedprice AS new_value,
           CAST(NULL AS BIGINT) AS old_seq,
           p.k AS new_seq,
           CAST((SELECT count(*) FROM pk q WHERE q.k < p.k)
                // CAST(ceil((SELECT count(*) FROM pk) / {nb}.0)
                        AS BIGINT)
             AS BIGINT) AS batch_id
    FROM pk p JOIN watch w ON w.k = p.k
    """


@query("changefeed_lineitem_watchlist", oracle=_li_watch_oracle())
def changefeed_lineitem_watchlist(spark, sf_dir):
    """COMPOSITE-KEY document feed (round-10: the last loud
    get()/get_all() refusal lifted): `db.table('lineitem')
    .get_all((ok1,ln1), (ok2,ln2), (ok3,ln3)).changes()`. The
    (l_orderkey, l_linenumber) primary key packs into the envelope's
    single bigint key slot via the declared 3-bit codec (l_linenumber
    in 1..7 — per-row assert_true guard, doc_feeds.COMPOSITE_DOC_MAP)
    and the LWW/MVCC machinery runs UNCHANGED; the read surface
    unpacks back to the table's own two columns. Graded output is
    the full delta-log TRAJECTORY: each watched document's insert
    lands in exactly the micro-batch its arrival chunk replays in
    (arrival = (l_orderkey, l_linenumber) order, the _keyed_chunks
    composite slicing contract).

    Watched keys are the first / middle / last among keys that occur
    EXACTLY ONCE: the synthetic fixture duplicates ~23% of lineitem
    PKs, and a duplicated key's LWW winner on an exact (ts, seq) tie
    depends on which batch boundary separates the duplicates — a
    correct feed behavior, but not a batch-count-invariant graded
    target. Key picks are Spark-side order statistics
    (_util.kth_smallest + min/max aggregates — no O(|table|) driver
    transfer, the r9-verdict discipline).

    Scale: the envelope IN-set predicate prunes every micro-batch
    BEFORE the merge — state holds at most |watchlist| rows on any
    table size."""
    from ..api import Database
    from ._util import kth_smallest

    key = (id(spark), sf_dir, "li-watch")
    if key not in _LI_CACHE:
        li = load_table(spark, sf_dir, "lineitem")
        packed = (F.col("l_orderkey").cast("long") * 8
                  + F.col("l_linenumber"))
        uniq = (
            li.groupBy(packed.alias("k")).count()
            .where("count = 1").select("k"))
        lo, hi = uniq.agg(F.min("k"), F.max("k")).first()
        ks = [int(lo), kth_smallest(uniq, "k"), int(hi)]
        watch = [(k >> 3, k & 7) for k in ks]
        _LI_CACHE[key] = (
            Database(spark, sf_dir).table("lineitem")
            .get_all(*watch).changes()
        )
    return _LI_CACHE[key].log().select(
        "l_orderkey", "l_linenumber", "old_value", "new_value",
        "old_seq", "new_seq", "batch_id",
    )


# -------------------------------------------- changefeed_keyby_customer

@query(
    "changefeed_keyby_customer",
    oracle="""
    SELECT CAST(c_nationkey AS VARCHAR) AS key,
           count(*) AS cnt,
           CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
             AS sum_value
    FROM customer
    GROUP BY c_nationkey
    """,
)
def changefeed_keyby_customer(spark, sf_dir):
    """CUSTOM-KEY feed on a non-events table (round-10 close of the
    api.py KEY-BY refusal): `CREATE CHANGEFEED FOR customer KEY BY
    c_nationkey` — the standing per-key count/sum aggregate keyed by
    a CHOSEN integer column instead of the table's document key.
    envelope_spec (streaming/multitable.py) validates the override
    against the table schema (non-integral keys raise loudly),
    normalizes customer into the shared change envelope with its
    synthetic snapshot-epoch event time, and the key-agnostic
    merge/MVCC/resolved machinery runs unchanged. Graded output is
    the feed's final materialized state: one row per nation with the
    exact decimal-stabilized balance sum — any mis-keyed or dropped
    change breaks the hash.

    Scale: per-batch partial aggregates combine map-side; only
    (key, cnt, sum) rows cross the shuffle; state rewrites touch
    only the buckets the batch's keys hash into."""
    from ..api import Database

    feed = Database(spark, sf_dir).sql(
        "CREATE CHANGEFEED FOR customer KEY BY c_nationkey")
    return feed.state()


# --------------------------------------- changefeed_topk_orders_offsets

@query(
    "changefeed_topk_orders_offsets",
    oracle=_topk_orders_oracle().replace(
        "SELECT bb AS batch_id, o_custkey,",
        "SELECT bb AS batch_id, o_custkey, "
        "prev.rk - 1 AS old_offset, cur.rk - 1 AS new_offset,"
    ).replace(
        "), topk AS (\n      SELECT batch_id, o_custkey, o_totalprice, o_orderkey\n      FROM ranked WHERE rk <= 5",
        "), topk AS (\n      SELECT batch_id, o_custkey, o_totalprice, o_orderkey, rk\n      FROM ranked WHERE rk <= 5",
    ).replace(
        "SELECT batch_id AS bb, o_custkey, o_totalprice, o_orderkey\n      FROM topk",
        "SELECT batch_id AS bb, o_custkey, o_totalprice, o_orderkey, rk\n      FROM topk",
    ).replace(
        "SELECT batch_id + 1 AS bb, o_custkey, o_totalprice, o_orderkey\n      FROM topk",
        "SELECT batch_id + 1 AS bb, o_custkey, o_totalprice, o_orderkey, rk\n      FROM topk",
    ),
)
def changefeed_topk_orders_offsets(spark, sf_dir):
    """include_offsets on the GENERIC top-k feed (parity with the
    events family's changefeed_topk_offsets): each emitted
    enter/update/leave row carries the member's 0-based position in
    the (value DESC, seq ASC) order before and after the change —
    positions are emitted ONLY on rows that themselves change (the
    documented deviation from RethinkDB's position-only move rows;
    consumers can reconstruct every position because the lists are
    totally ordered). Served from the SAME shared runner/log as
    changefeed_topk_orders — zero extra stream work; the oracle
    re-derives both batches' ranks and diffs."""
    from ..streaming.generic_views import orders_runner

    return orders_runner(spark, sf_dir).topk_log().select(
        "batch_id", "o_custkey", "old_offset", "new_offset",
        "change", "old_value", "new_value")


# ------------------------------------------------------ sql_distinct_on

@query(
    "sql_distinct_on",
    oracle="""
    SELECT DISTINCT ON (o_custkey)
           o_custkey, o_orderkey AS latest_orderkey,
           o_totalprice AS latest_totalprice
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
)
def sql_distinct_on(spark, sf_dir):
    """DISTINCT ON (the Postgres/DuckDB spelling of
    first-row-per-group): each customer's LATEST order row. Spark
    has no DISTINCT ON clause; the engine's spelling is the
    row_number window + rk=1 filter, which Spark 4 plans as a
    WindowGroupLimit (rank pushdown): each shuffle partition keeps
    only its per-key head BEFORE the final window sort, so the
    post-shuffle volume is O(|keys|), not O(|rows|) — the same
    physical shape a native DISTINCT ON implementation runs.

    Determinism: the ORDER BY carries the full (date DESC, key DESC)
    tie-break, so 'first row' is total-ordered in both engines."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("__rk", F.row_number().over(w))
        .where("__rk = 1")
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_totalprice").alias("latest_totalprice"),
        )
    )


# ------------------------------------------------- agg_order_statistics

@query(
    "agg_order_statistics",
    oracle="""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ), n AS (SELECT count(*) AS n FROM v),
    s AS (SELECT cents, row_number() OVER (ORDER BY cents) - 1 AS rn
          FROM v)
    SELECT 'q1' AS stat, (SELECT cents FROM s, n WHERE rn = n // 4)
             AS cents
    UNION ALL
    SELECT 'median_low', (SELECT cents FROM s, n WHERE rn = n // 2)
    UNION ALL
    SELECT 'q3', (SELECT cents FROM s, n WHERE rn = (3 * n) // 4)
    UNION ALL
    SELECT 'min', (SELECT min(cents) FROM v)
    UNION ALL
    SELECT 'max', (SELECT max(cents) FROM v)
    """,
)
def agg_order_statistics(spark, sf_dir):
    """EXACT distributed order statistics (quartiles by the
    low-element convention, 0-based rank k = n//4, n//2, 3n//4) of an
    integral column — the official grade for _util.kth_smallest, the
    banded order-statistic that replaced the r9 `weak` full-column
    collects: one min/max/count aggregate, a <=4096-band integer-div
    histogram (O(bands) driver rows), then an exact percentile INSIDE
    the single band holding rank k. Executor memory is O(per-band
    distinct values), never O(n) — the reason this beats a
    whole-column exact percentile at 100 TB; driver traffic is
    O(bands), never O(n) — the reason it beats sort+LIMIT/OFFSET
    (a global sort) and collect (the r9 anti-pattern).

    Values are integer cents (round(price*100) — 2-dp doubles land
    within 1e-9 of an integer, never at a rounding tie), so every
    statistic is exact integer arithmetic in both engines."""
    from ._util import kth_smallest

    cents_col = F.round(F.col("l_extendedprice") * 100) \
        .cast("long").alias("cents")
    v = load_table(spark, sf_dir, "lineitem").select(cents_col)
    n = v.count()
    lo, hi = v.agg(F.min("cents"), F.max("cents")).first()
    rows = [
        ("q1", kth_smallest(v, "cents", n // 4)),
        ("median_low", kth_smallest(v, "cents", n // 2)),
        ("q3", kth_smallest(v, "cents", (3 * n) // 4)),
        ("min", int(lo)),
        ("max", int(hi)),
    ]
    return spark.createDataFrame(rows, "stat string, cents long")


# ------------------------------------------------- llm_span_corruption

#: mask a token iff the first hex byte of md5('<doc>:<pos>') sorts
#: below '33' (51/256 ~ 19.9% target corruption — the T5 default 15%
#: rounded to a clean hex boundary); text-independent so the plan is
#: reproducible across pipeline re-runs
_SPAN_HEX = "33"


@query(
    "llm_span_corruption",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), pos AS (
      SELECT doc_id, len(ws) AS n_tokens,
             unnest(range(len(ws))) AS i
      FROM toks
    ), m AS (
      SELECT doc_id, n_tokens, i,
             substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                        CAST(i AS VARCHAR)), 1, 2) < '{_SPAN_HEX}'
               AS masked,
             CASE WHEN i = 0 THEN FALSE ELSE
               substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                          CAST(i - 1 AS VARCHAR)), 1, 2)
                 < '{_SPAN_HEX}' END AS prev_masked
      FROM pos
    )
    SELECT doc_id,
           CAST(any_value(n_tokens) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (masked) AS BIGINT) AS n_masked,
           CAST(count(*) FILTER (masked AND NOT prev_masked)
             AS BIGINT) AS n_spans,
           CAST(count(*) FILTER (masked) AS DOUBLE)
             / any_value(n_tokens) AS corruption_rate
    FROM m GROUP BY doc_id
    """,
)
def llm_span_corruption(spark, sf_dir):
    """T5/UL2-style SPAN-CORRUPTION PLANNING (Raffel et al., JMLR'20
    — public method): decide deterministically which token positions
    of each document get masked for denoising pretraining, and
    report per-doc span statistics (token count, masked count,
    SPAN count = runs of consecutive masked positions, corruption
    rate). The mask is a pure position hash — md5(doc:pos) hex
    prefix below a threshold — so the plan needs NO stored
    randomness, is identical on re-runs and across engines, and a
    span boundary is detectable from the two adjacent positions'
    hashes alone: span starts are `masked(i) AND NOT masked(i-1)`,
    a per-row expression, so the whole statistic is ONE explode +
    ONE hash aggregate — no window, no self-join.

    Scale: O(tokens) explode with map-side partial aggregation back
    to O(docs); all hashing JVM-side (F.md5); nothing driver-side."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws"))
    pos = toks.select(
        "doc_id", F.size("ws").alias("n_tokens"),
        F.posexplode("ws").alias("i", "tok"))

    def _masked(idx_col):
        return F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(":"), idx_col.cast("string"))),
            1, 2) < _SPAN_HEX

    m = pos.select(
        "doc_id", "n_tokens",
        _masked(F.col("i")).alias("masked"),
        F.when(F.col("i") == 0, F.lit(False))
        .otherwise(_masked(F.col("i") - 1)).alias("prev_masked"),
    )
    return m.groupBy("doc_id").agg(
        F.any_value("n_tokens").cast("long").alias("n_tokens"),
        F.count(F.when(F.col("masked"), 1)).alias("n_masked"),
        F.count(F.when(F.col("masked") & ~F.col("prev_masked"), 1))
        .alias("n_spans"),
        (F.count(F.when(F.col("masked"), 1)).cast("double")
         / F.any_value("n_tokens")).alias("corruption_rate"),
    )


# ----------------------------------------------------- llm_c4_filters

@query(
    "llm_c4_filters",
    oracle="""
    WITH t AS (
      SELECT source, string_split(text, ' ') AS ws FROM documents
    ), f AS (
      SELECT source,
             len(ws) < 40 AS f_short,
             1.0 * len(list_distinct(ws)) / len(ws) < 0.55
               AS f_lowdiv,
             list_contains(ws, 'slow') AS f_blocklist
      FROM t
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (f_short) AS BIGINT) AS n_short,
           CAST(count(*) FILTER (f_lowdiv) AS BIGINT)
             AS n_low_diversity,
           CAST(count(*) FILTER (f_blocklist) AS BIGINT)
             AS n_blocklisted,
           CAST(count(*) FILTER (NOT f_short AND NOT f_lowdiv
                                 AND NOT f_blocklist) AS BIGINT)
             AS n_pass
    FROM f GROUP BY source
    """,
)
def llm_c4_filters(spark, sf_dir):
    """C4-style heuristic CLEANING FILTERS (Raffel et al., JMLR'20 —
    public method), adapted to this corpus's shape, with per-source
    ATTRITION accounting (which upstream source loses how much to
    which rule — the report a data-mixing decision actually needs):
      * minimum length (< 40 words — C4's 'at least N words' rule),
      * lexical diversity (distinct-token ratio < 0.55 — the
        boilerplate/template signal; C4's dedup-adjacent line rule),
      * token blocklist ('slow' — standing in for C4's bad-words
        list; list membership, not substring, so no false hits on
        compounds).
    All three flags are per-row expressions over ONE split of the
    text — one projection scan, one hash aggregate by source; counts
    are exact integers (the diversity ratio compares identical IEEE
    divisions in both engines). At 100 TB this is the shape that
    matters: no second scan per rule, no UDF, map-side combine."""
    ws = F.split("text", " ")
    t = load_table(spark, sf_dir, "documents").select(
        "source",
        (F.size(ws) < 40).alias("f_short"),
        ((F.size(F.array_distinct(ws)).cast("double") * 1.0
          / F.size(ws)) < 0.55).alias("f_lowdiv"),
        F.array_contains(ws, "slow").alias("f_blocklist"),
    )
    passes = (~F.col("f_short") & ~F.col("f_lowdiv")
              & ~F.col("f_blocklist"))
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(F.col("f_short"), 1)).alias("n_short"),
        F.count(F.when(F.col("f_lowdiv"), 1))
        .alias("n_low_diversity"),
        F.count(F.when(F.col("f_blocklist"), 1))
        .alias("n_blocklisted"),
        F.count(F.when(passes, 1)).alias("n_pass"),
    )


# --------------------------------------------------------- graph_kcore

_KC_MOD = 16      #: sparser sample than triangles' mod-4 so peeling
_KC_K = 4         #: actually iterates (mod-4's 4-core ~= round 1)
_KC_ROUNDS = 8    #: converged by round 6 at every fixture SF
_KC_CACHE: dict = {}


def _kcore_cte() -> str:
    return f"""
    WITH RECURSIVE li AS (
      SELECT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey % {_KC_MOD} = 0
    ), e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), und AS (
      SELECT u AS node, v AS other FROM e
      UNION ALL SELECT v, u FROM e
    ), rec AS (
      SELECT 0 AS round, u AS node FROM e UNION SELECT 0, v FROM e
      UNION ALL
      SELECT d.round + 1, d.node FROM (
        SELECT a.round, x.node, count(*) AS deg
        FROM rec a JOIN und x ON x.node = a.node
        JOIN rec b ON b.node = x.other AND b.round = a.round
        GROUP BY a.round, x.node
      ) d
      WHERE d.deg >= {_KC_K} AND d.round < {_KC_ROUNDS}
    )
    SELECT CAST(round AS BIGINT) AS round, node FROM rec
    """


@query("graph_kcore", oracle=_kcore_cte())
def graph_kcore(spark, sf_dir):
    """{_K}-CORE decomposition by iterative peeling (Matula & Beck,
    JACM'83 — public method) over the part co-purchase graph: each
    round drops every node whose degree in the CURRENT induced
    subgraph is below k, until fixpoint — the classic dense-subgraph
    / spam-cluster / community-seed primitive a corpus-graph audit
    runs. Graded output is the FULL per-round membership trajectory
    (round 0 = all nodes, rounds 1..{_R} after each peel; the graph
    converges by round 6 at every fixture SF, so the final rounds
    ARE the true 4-core, not a truncation — the fixpoint is
    asserted in tests).

    Spark shape: the edge list is built once and persisted; each
    round is two SEMI joins (both endpoints still alive) + one
    count aggregate, and the shrinking alive set is
    LOCAL-CHECKPOINTED per round — the mandatory lineage cut for an
    iterative plan that references its previous round twice (persist
    alone leaves the logical plan doubling per round: 2^r subtree
    copies blew the compiler heap by round 4 — measured, not
    theorized; on a cluster the same call is checkpoint() to a
    reliable dir). O(rounds) bounded jobs, alive sets only ever
    shrink, nothing driver-side but per-round counts. The DuckDB
    oracle is the same peel as a recursive CTE (the working table
    referenced for both endpoints). At 100 TB each round is one
    shuffle on node id; the alive set broadcast-shrinks as peeling
    progresses."""
    from pyspark import StorageLevel

    key = (id(spark), sf_dir)
    if key in _KC_CACHE:
        return _KC_CACHE[key]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % _KC_MOD == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # r14: lazy localCheckpoint + count fuses the per-round
    # materialize-and-measure into ONE job (the eager form paid a
    # checkpoint job AND a count job per round), and the peel runs
    # on the HALF-SIZE directed pair list instead of the doubled
    # undirected relation: an edge is alive iff both endpoints are,
    # so two semi joins against the SAME checkpointed alive set
    # (identical build subtrees -> AQE reuses one broadcast build
    # per round where the old union form built four — the union
    # pushed both semi joins into each arm) followed by an explode
    # of the surviving (u, v) pairs gives the identical per-node
    # degree. Guide §2.4 (remove exchanges), §2.6 (fewer jobs per
    # iteration); before/after job audit in OPTIMIZATION_r14.md.
    alive = (pairs.select(F.col("u").alias("node")).unionAll(
        pairs.select(F.col("v").alias("node"))).distinct()
        .localCheckpoint(eager=False))
    rounds = [alive]
    prev_n = alive.count()  # triggers + truncates in the same job
    for _ in range(_KC_ROUNDS):
        prev = rounds[-1]
        live = (
            pairs.join(prev, F.col("u") == prev["node"], "semi")
            .join(prev, F.col("v") == prev["node"], "semi")
        )
        deg = (
            live.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
        )
        # lazy localCheckpoint: the count() below materializes the
        # alive set AND truncates lineage in one job (prev appears
        # twice per round; without the cut the plan doubles every
        # round and planning OOMs)
        nxt = (deg.where(F.col("deg") >= _KC_K).select("node")
               .localCheckpoint(eager=False))
        n = nxt.count()
        if n == prev_n:
            # FIXPOINT: alive sets only ever shrink, so equal count
            # means equal set — peeling the core yields itself;
            # reuse the checkpointed set for the remaining rounds
            # instead of re-running identical join rounds
            rounds.extend(
                [prev] * (_KC_ROUNDS + 1 - len(rounds)))
            break
        prev_n = n
        rounds.append(nxt)
    out = None
    for r, df in enumerate(rounds):
        p = df.select(F.lit(r).cast("long").alias("round"), "node")
        out = p if out is None else out.unionByName(p)
    _KC_CACHE[key] = out
    return out


graph_kcore.__doc__ = graph_kcore.__doc__.replace(
    "{_K}", str(_KC_K)).replace("{_R}", str(_KC_ROUNDS))


# --------------------------------------------- graph_jaccard_linkpred

@query(
    "graph_jaccard_linkpred",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
                WHERE l_orderkey % 4 = 0),
    pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    und AS (SELECT u AS node, v AS other FROM pairs
            UNION ALL SELECT v, u FROM pairs),
    deg AS (SELECT node, count(*) AS d FROM und GROUP BY node),
    w AS (
      SELECT x.other AS u, y.other AS v, count(*) AS common
      FROM und x JOIN und y
        ON x.node = y.node AND x.other < y.other
      GROUP BY x.other, y.other
    ), cand AS (
      SELECT w.u, w.v, w.common FROM w
      WHERE NOT EXISTS (SELECT 1 FROM pairs p
                        WHERE p.u = w.u AND p.v = w.v)
    )
    SELECT c.u, c.v,
           CAST(c.common AS BIGINT) AS common_neighbors,
           CAST(du.d AS BIGINT) AS deg_u,
           CAST(dv.d AS BIGINT) AS deg_v,
           CAST(c.common AS DOUBLE) / (du.d + dv.d - c.common)
             AS jaccard
    FROM cand c
    JOIN deg du ON du.node = c.u
    JOIN deg dv ON dv.node = c.v
    ORDER BY jaccard DESC, c.u, c.v LIMIT 20
    """,
)
def graph_jaccard_linkpred(spark, sf_dir):
    """Neighborhood-Jaccard LINK PREDICTION (Liben-Nowell & Kleinberg,
    CIKM'03 — public method) on the part co-purchase graph: for every
    NON-edge with at least one common neighbor, score
    |N(u) n N(v)| / |N(u) u N(v)| and report the top 20 predicted
    links — the 'you might also bundle' primitive. Candidates come
    from WEDGE ENUMERATION (pairs of neighbors around each center),
    so only pairs with >= 1 common neighbor are ever materialized —
    never the all-pairs square; existing edges are removed with an
    anti-join.

    Reuses the SAME persisted co-purchase edge relation as
    graph_triangles/assortativity (_copurchase_pairs — one
    materialization serves the whole graph family). Wedge volume is
    sum C(deg, 2) (~10M rows at sf0.1, one hash aggregate); on a
    hub-heavy 100 TB graph the standard cap (drop super-hub centers
    above a degree bound) bounds it, documented rather than silently
    applied since this fixture's max degree is 90. Scores are exact
    integer ratios through one identical IEEE division; the top-20
    cut carries a total (jaccard DESC, u, v) tie-break."""
    from .analytics_ext import _copurchase_pairs

    pairs = _copurchase_pairs(spark, sf_dir)
    und = pairs.select(F.col("u").alias("node"),
                       F.col("v").alias("other")).unionAll(
        pairs.select(F.col("v").alias("node"),
                     F.col("u").alias("other")))
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    x, y = und.alias("x"), und.alias("y")
    wedges = (
        x.join(y, (F.col("x.node") == F.col("y.node"))
               & (F.col("x.other") < F.col("y.other")))
        .groupBy(F.col("x.other").alias("u"),
                 F.col("y.other").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = wedges.join(pairs, ["u", "v"], "anti")
    du = F.broadcast(deg.select(F.col("node").alias("u"),
                                F.col("d").alias("deg_u")))
    dv = F.broadcast(deg.select(F.col("node").alias("v"),
                                F.col("d").alias("deg_v")))
    scored = (
        cand.join(du, "u").join(dv, "v")
        .select(
            "u", "v",
            F.col("common").alias("common_neighbors"),
            "deg_u", "deg_v",
            (F.col("common").cast("double")
             / (F.col("deg_u") + F.col("deg_v") - F.col("common")))
            .alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), "u", "v").limit(20)


# ------------------------------------------- dq_invariant_totalprice

@query(
    "dq_invariant_totalprice",
    oracle="""
    WITH ls AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           * (1 + l_tax) AS DECIMAL(18,6)))
               AS DOUBLE) AS computed
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (ls.l_orderkey IS NULL) AS BIGINT)
             AS n_no_lineitems,
           CAST(count(*) FILTER (abs(o.o_totalprice - ls.computed)
                                 < 0.01) AS BIGINT) AS n_consistent,
           CAST(sum(CAST(abs(o.o_totalprice - ls.computed)
                         AS DECIMAL(18,6))) AS DOUBLE)
             AS total_abs_deviation
    FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def dq_invariant_totalprice(spark, sf_dir):
    """CROSS-TABLE BUSINESS-RULE audit — the TPC-H invariant
    o_totalprice = SUM(l_extendedprice * (1-disc) * (1+tax)) checked
    for every order, reported per status: order count, orders with
    NO lineitems at all (257 in this fixture — a referential hole
    dq_referential_integrity's FK direction cannot see), orders
    consistent to the cent, and the total absolute deviation. The
    audit HONESTLY reports that this synthetic fixture derives
    o_totalprice independently of its lineitems (0 consistent) —
    exactly what the check exists to catch after a partial load or
    a broken rollup job.

    Scale shape: one lineitem scan projecting 4 columns into a
    map-side-combinable per-order decimal aggregate, one shuffle on
    the join key, one bounded per-status aggregate. The per-line
    product is the identical IEEE op sequence in both engines; every
    sum is decimal-stabilized."""
    ls = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum((F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                    * (F.lit(1) + F.col("l_tax")))
                   .cast("decimal(18,6)"))
             .cast("double").alias("computed"))
    )
    o = load_table(spark, sf_dir, "orders")
    j = o.join(ls, o.o_orderkey == ls.l_orderkey, "left")
    dev = F.abs(F.col("o_totalprice") - F.col("computed"))
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("l_orderkey").isNull(), 1))
        .alias("n_no_lineitems"),
        F.count(F.when(dev < 0.01, 1)).alias("n_consistent"),
        F.sum(dev.cast("decimal(18,6)")).cast("double")
        .alias("total_abs_deviation"),
    )


# -------------------------------------------------- graph_bfs_distance

_BFS_ROUNDS = 6


@query(
    "graph_bfs_distance",
    oracle=f"""
    WITH RECURSIVE li AS (
      SELECT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey % {_KC_MOD} = 0
    ), e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), und AS (
      SELECT u AS node, v AS other FROM e
      UNION ALL SELECT v, u FROM e
    ), src AS (SELECT min(u) AS s FROM e),
    rec AS (
      SELECT s AS node, 0 AS d FROM src
      UNION
      SELECT x.other, r.d + 1
      FROM rec r JOIN und x ON x.node = r.node
      WHERE r.d < {_BFS_ROUNDS}
    )
    SELECT node, CAST(min(d) AS BIGINT) AS dist
    FROM rec GROUP BY node
    """,
)
def graph_bfs_distance(spark, sf_dir):
    """Single-source BFS hop distances (bounded to {_R} hops) over
    the mod-{_M} co-purchase graph from its smallest part id — the
    reachability/radius primitive behind blast-radius analysis and
    relation expansion. Level-synchronous frontier BFS: each round
    expands the frontier through one join and subtracts everything
    already visited (an anti-join), so a node's recorded distance is
    its FIRST (minimal) hop count; frontiers are localCheckpoint-ed
    per round (the graph_kcore lineage-cut lesson — the frontier
    feeds both the expansion and the visited union).

    The DuckDB oracle is the same walk as a recursive CTE with
    UNION-dedup (the working set stays O(nodes x levels), never
    path-enumeration's exponential fan) and min(d) per node.

    Scale: each round shuffles O(frontier-adjacency) rows on node
    id; visited/frontier sets are node-sized, never edge-sized;
    rounds are bounded by the hop budget."""
    from pyspark import StorageLevel

    key = (id(spark), sf_dir, "bfs")
    if key in _KC_CACHE:
        return _KC_CACHE[key]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % _KC_MOD == 0)
        .select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    und = pairs.select(F.col("u").alias("node"),
                       F.col("v").alias("other")).unionAll(
        pairs.select(F.col("v").alias("node"),
                     F.col("u").alias("other")))
    src = pairs.agg(F.min("u")).first()[0]
    frontier = spark.createDataFrame(
        [(int(src),)], "node long").localCheckpoint()
    visited = frontier
    out = frontier.select(
        "node", F.lit(0).cast("long").alias("dist"))
    for d in range(1, _BFS_ROUNDS + 1):
        nxt = (
            und.join(frontier, "node", "semi")
            .select(F.col("other").alias("node")).distinct()
            .join(visited, "node", "anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt.select(
            "node", F.lit(d).cast("long").alias("dist")))
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    _KC_CACHE[key] = out
    return out


graph_bfs_distance.__doc__ = graph_bfs_distance.__doc__.replace(
    "{_R}", str(_BFS_ROUNDS)).replace("{_M}", str(_KC_MOD))


# --------------------------------------------------- changefeed_cursor_ts

def _cursor_ts_oracle() -> str:
    from ..streaming.replay import default_chunks

    nb = default_chunks()
    return f"""
    WITH numbered AS (
      SELECT event_type, value, ts,
             row_number() OVER (ORDER BY event_id) - 1 AS rn,
             count(*) OVER () AS n
      FROM events
    ), chunked AS (
      SELECT event_type, value, ts,
             CAST(floor(rn / ceil(n / {nb}.0)) AS BIGINT) AS batch_id
      FROM numbered
    ), tpick AS (
      SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts)))
                            // 2) AS tt
      FROM events
    ), b0 AS (
      SELECT min(batch_id) AS b FROM chunked, tpick WHERE ts >= tt
    ), per AS (
      SELECT event_type, batch_id,
             count(*) AS d_cnt,
             sum(CAST(value AS DECIMAL(18,6))) AS d_sum
      FROM chunked GROUP BY 1, 2
    ), log AS (
      SELECT event_type,
             CAST(sum(d_cnt) OVER w - d_cnt AS BIGINT) AS old_count,
             CAST(sum(d_cnt) OVER w AS BIGINT) AS new_count,
             CAST(sum(d_sum) OVER w - d_sum AS DOUBLE) AS old_sum,
             CAST(sum(d_sum) OVER w AS DOUBLE) AS new_sum,
             batch_id
      FROM per
      WINDOW w AS (PARTITION BY event_type ORDER BY batch_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT log.* FROM log, b0 WHERE log.batch_id >= b0.b
    """


@query("changefeed_cursor_ts", oracle=_cursor_ts_oracle())
def changefeed_cursor_ts(spark, sf_dir):
    """TIMESTAMP-BASED cursor resume — Kafka `offsetsForTimes` /
    CockroachDB `CREATE CHANGEFEED ... WITH cursor=<timestamp>`: a
    consumer that knows WHEN it stopped (not which batch token)
    resumes from the first batch containing any change with event
    time >= T. The seek (Cursor.seek_to_ts → ChangefeedRunner
    .batch_for_ts) is a METADATA-ONLY probe: per-chunk max(ts) read
    from parquet footer row-group statistics — the moral equivalent
    of Kafka's time index — O(chunks) tiny reads, no data scan.
    Graded output is the delta-log TAIL from the resolved batch:
    every delta from the first batch whose high-water mark crosses
    the midpoint timestamp, with old/new images reflecting the TRUE
    full history (state is not rewound — only delivery is). T is
    data-derived (epoch-microsecond midpoint of the event-time
    range) so the query is fixture- and SF-independent.

    Scale: the seek cost is independent of history length (footer
    stats only); the tail read prunes on batch_id."""
    from ..streaming.queries import _changefeed

    runner = _changefeed(spark, sf_dir)
    lo, hi = (
        load_table(spark, sf_dir, "events")
        .agg(F.unix_micros(F.min("ts")),
             F.unix_micros(F.max("ts"))).first()
    )
    import datetime as _dt

    t = _dt.datetime.utcfromtimestamp(((lo + hi) // 2) / 1e6)
    b0 = runner.batch_for_ts(t)
    assert b0 is not None, "midpoint must precede the log end"
    return runner.log().where(F.col("batch_id") >= b0).select(
        "event_type", "old_count", "new_count",
        "old_sum", "new_sum", "batch_id")


# ---------------------------------------------- llm_bigram_kneser_ney

_KN_D = 0.75
_KN_TOPK = 50


@query(
    "llm_bigram_kneser_ney",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), bi AS (
      SELECT doc_id,
             unnest(list_slice(ws, 1, len(ws) - 1)) AS w1,
             unnest(list_slice(ws, 2, len(ws))) AS w2
      FROM toks WHERE len(ws) > 1
    ), c AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
      FROM bi GROUP BY w1, w2
    ), m AS (
      SELECT w1, w2, c12,
             sum(c12) OVER (PARTITION BY w1) AS c1,
             count(*) OVER (PARTITION BY w1) AS nf,
             count(*) OVER (PARTITION BY w2) AS np,
             count(*) OVER () AS nbi
      FROM c
    )
    SELECT w1, w2, c12,
           CAST(c1 AS BIGINT) AS c1,
           CAST(nf AS BIGINT) AS n_followers,
           CAST(np AS BIGINT) AS n_predecessors,
           greatest(CAST(c12 AS DOUBLE) - {_KN_D}, 0.0)
             / CAST(c1 AS DOUBLE)
           + ({_KN_D} * CAST(nf AS DOUBLE) / CAST(c1 AS DOUBLE))
             * (CAST(np AS DOUBLE) / CAST(nbi AS DOUBLE)) AS p_kn
    FROM m
    ORDER BY c12 DESC, w1, w2 LIMIT {_KN_TOPK}
    """,
)
def llm_bigram_kneser_ney(spark, sf_dir):
    """Interpolated KNESER-NEY bigram probabilities (Kneser & Ney,
    ICASSP'95; Chen & Goodman'98 — public method), the LM-quality
    step past llm_bigram_lm's plain interpolation: absolute discount
    D={_D} off every bigram count, mass redistributed through the
    CONTINUATION probability (how many distinct contexts a word
    follows — the 'San Francisco' fix: 'Francisco' is frequent but
    predictable, so its continuation mass is tiny). Reported for the
    top-{_K} bigrams with all four count ingredients, so a consumer
    can audit the smoothing.

    Scale shape: ONE corpus scan -> adjacent-pair explode (zip of
    two slices, no self-join) -> one hash aggregate to the bounded
    bigram-type relation; every marginal (prefix total, follower/
    predecessor type counts, total types) is a WINDOW SUM over that
    bounded relation — the r8 dq_chi_square lesson: never re-scan
    the corpus per marginal. Final probabilities are identical IEEE
    expressions over exact integers in both engines; the top-{_K}
    cut carries a total (count DESC, w1, w2) tie-break."""
    ws = F.split("text", " ")
    toks = load_table(spark, sf_dir, "documents").select(
        ws.alias("ws")).where(F.size("ws") > 1)
    pairs = toks.select(
        F.explode(F.arrays_zip(
            F.slice("ws", 1, F.size("ws") - 1),
            F.slice("ws", 2, F.size("ws") - 1))).alias("p")
    ).select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    c = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12"))
    w_1 = Window.partitionBy("w1")
    w_2 = Window.partitionBy("w2")
    w_all = Window.partitionBy()
    m = c.select(
        "w1", "w2", "c12",
        F.sum("c12").over(w_1).alias("c1"),
        F.count(F.lit(1)).over(w_1).alias("nf"),
        F.count(F.lit(1)).over(w_2).alias("np"),
        F.count(F.lit(1)).over(w_all).alias("nbi"),
    )
    d = F.lit(_KN_D)
    p_kn = (
        F.greatest(F.col("c12").cast("double") - d, F.lit(0.0))
        / F.col("c1").cast("double")
        + (d * F.col("nf").cast("double")
           / F.col("c1").cast("double"))
        * (F.col("np").cast("double") / F.col("nbi").cast("double"))
    )
    return (
        m.select(
            "w1", "w2", "c12",
            F.col("c1").cast("long").alias("c1"),
            F.col("nf").cast("long").alias("n_followers"),
            F.col("np").cast("long").alias("n_predecessors"),
            p_kn.alias("p_kn"))
        .orderBy(F.col("c12").desc(), "w1", "w2")
        .limit(_KN_TOPK)
    )


llm_bigram_kneser_ney.__doc__ = llm_bigram_kneser_ney.__doc__ \
    .replace("{_D}", str(_KN_D)).replace("{_K}", str(_KN_TOPK))
