"""Graph propagation: PageRank with a fixed iteration count.

Iterative graph algorithms on Spark are a sequence of join+aggregate
rounds; with a FIXED iteration count the whole computation is one
Catalyst plan (no driver loop state), deterministic, and expressible in
plain SQL — which keeps it under the exact-oracle gate even though the
general fixed-point version isn't.

Per iteration: ``rank_contrib = rank/out_degree`` flows along edges
(shuffle keyed by dst), then ``rank' = (1-d)/N + d·Σ contrib``. Dangling
nodes (no out-edges) keep default rank mass out of circulation — the
standard simplification; document, don't hide. Cost model per iteration:
one shuffle of the edge list keyed dst + one broadcast of the (small)
rank vector when node count allows, else a shuffled join keyed src.
Iterations reuse the same edge partitioning, so at scale pre-partition
edges by src once (bucketing) and every iteration's src-join is
exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank after exactly ``iterations`` rounds from a uniform
    start. ``edges``: directed (src, dst) pairs (pre-dedup them if edge
    multiplicity shouldn't weight the walk). Returns (node, rank)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(src_col).agg(
        F.count(F.lit(1)).alias("__outdeg")
    )
    n_nodes = nodes.count()  # one scalar, driver-side (like P6)
    if n_nodes == 0:
        # empty edge frame (upstream filter matched nothing): an empty
        # (node, rank) result, not a bare ZeroDivisionError (r11 review)
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n_nodes

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        contribs = (
            edges.join(outdeg, src_col)
            .join(
                ranks.withColumnRenamed("node", src_col), src_col
            )
            .select(
                F.col(dst_col).alias("node"),
                (F.col("rank") / F.col("__outdeg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("__in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
