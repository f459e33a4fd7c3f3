"""Duplicate-cluster resolution: candidate pairs → connected components.

The dedup operators (`dedup.py`) emit *pairs* (minhash/LSH candidates,
n-gram Jaccard, embedding near-dups). Keeping one representative per
duplicate *group* needs the transitive closure of those pairs — connected
components. This is the iterative min-label-propagation formulation in
plain DataFrame ops:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated to fixpoint. Each round is one self-contained Catalyst job:
a (dst→label) hash join + a min-aggregation on src — two key shuffles on
the edge list, nothing proportional to payloads. Rounds needed =
diameter of the largest component, which for near-dup clusters is tiny
(dup groups are cliques or near-cliques from LSH banding, so 1-3 rounds
converge). Lineage is truncated with ``localCheckpoint`` per round —
without it the plan doubles each iteration and the driver OOMs compiling
it long before data is a problem.

At extreme skew (one giant component), the alternating small-star /
large-star variant (Kiveris et al., "Connected Components in MapReduce")
halves the rounds; the hook is the same edge-relabel loop, so the
formulation below upgrades in place if a corpus ever needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id_a, id_b) pair list → (node, cluster_id), cluster_id = min node
    id reachable through the pair graph. Only nodes appearing in pairs
    are returned (callers union singletons; see ``dedup_clusters``)."""
    # undirected: propagate both ways
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
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
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Every row of ``df`` labeled with its duplicate-cluster id: the min
    id of its connected component under ``pairs``, or its own id when it
    appears in no pair (singleton). One left join over the component
    labels — the pair graph is tiny next to the corpus, so at scale this
    broadcasts."""
    comp = connected_components(pairs, id_a=id_a, id_b=id_b, max_iter=max_iter)
    return (
        df.select(id_col)
        .join(comp, df[id_col] == comp["node"], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias(
                "cluster_id"
            ),
        )
    )


def cluster_representatives(
    df: DataFrame,
    clusters: DataFrame,
    order_by,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One canonical row per duplicate cluster — the keep-best step that
    turns cluster labels into a deduplicated corpus. ``order_by`` decides
    which member survives (e.g. longest text, best quality; append the id
    as tiebreak for a total order). Adds ``n_members`` so downstream can
    weight or audit collapsed clusters.

    One shuffle on ``cluster_col``; both window functions (rank + member
    count) share that single partitioning. Cluster sizes are bounded by
    duplicate-group fan-in, so no skew beyond what dedup itself implies.
    """
    from pyspark.sql import Window

    joined = df.join(clusters.select(id_col, cluster_col), id_col)
    w = Window.partitionBy(cluster_col)
    ranked = joined.withColumn(
        "_rk", F.row_number().over(w.orderBy(*order_by))
    ).withColumn("n_members", F.count(F.lit(1)).over(w).cast("long"))
    return ranked.where(F.col("_rk") == 1).drop("_rk")
