"""Connected components over a pair/edge DataFrame — the clustering
step of near-dup deduplication (llm_dedup_cluster).

Two paths behind one entry point, selected by pair count:

- `pairs <= threshold` (the overwhelmingly common case — the pair
  list is the dedup rate times the corpus, not the corpus): exact
  union-find over the collected pairs; the label map broadcast-joins
  back. One collect of an already-small DataFrame.
- `pairs > threshold` (pathological near-dup volume): distributed
  min-label propagation — per round, every node takes the minimum
  label among itself and its neighbors (one equi-join + one
  min-aggregate, the same shuffle shapes as the rest of the engine),
  until a fixed point. Converges in O(graph diameter) rounds; the
  only driver-side value per round is the single `changed` count.
  Nothing node- or edge-cardinality-sized ever reaches the driver.

At 100 TB both the pair build and (if needed) the propagation rounds
are plain keyed shuffles; the propagation loop is the documented
scale fallback promised by round-1's llm_dedup_cluster docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _components_driver(spark: SparkSession, pair_rows) -> DataFrame:
    """Exact union-find with path halving; min root = cluster id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for r in pair_rows:
        ru, rv = find(r["u"]), find(r["v"])
        if ru != rv:
            # union by smaller root so the cluster id is the min
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    label_rows = sorted((x, find(x)) for x in parent)
    return spark.createDataFrame(
        label_rows or [(None, None)], "node long, label long"
    )


def _components_distributed(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Min-label propagation: labels(node) <- min(label over N(node) ∪
    {node}) per round until no label changes. Each round is one
    equi-join + one min-agg. Every round's result is localCheckpoint'd
    (the standard Spark iterative-algorithm pattern): without lineage
    truncation the logical plan doubles per round and analysis blows
    the JVM stack long before data size matters. Checkpoint blocks
    live on executors — no node-cardinality data touches the driver;
    the only per-round driver value is the single `changed` count."""
    edges = (
        pairs.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(pairs.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        # neighbor labels flow along edges; keep own label in play
        msgs = (
            edges.join(labels, edges.a == labels.node)
            .select(F.col("b").alias("node"), "label")
            .unionByName(labels)
        )
        new_labels = (
            msgs.groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"components did not converge in {max_rounds} rounds")


def connected_components(
    pairs: DataFrame, driver_threshold: int = 1_000_000
) -> DataFrame:
    """Label every node that appears in `pairs` (cols u, v) with its
    component's minimum node id. Returns (node long, label long);
    nodes in no pair are absent (callers coalesce to self-label)."""
    spark = pairs.sparkSession
    if driver_threshold > 0:
        head = pairs.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            return _components_driver(spark, head)
    return _components_distributed(pairs)
