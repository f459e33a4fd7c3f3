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

Min-label propagation moves a label ONE hop per round, so rounds =
component diameter — fine for LSH cliques (1–3 rounds), pathological
for a high-diameter component (a 1000-node chain needs ~999 rounds).
``connected_components_star`` (r11) implements the alternating
small-star / large-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public): each large-star
hangs every larger neighbor off the neighborhood minimum, each
small-star re-hangs the smaller neighbors, and the component collapses
to a star in O(log n) alternations regardless of diameter. Both return
identical labels (equivalence-tested, including a planted 1000-node
path); pick with ``algorithm=`` or call the star variant directly for
graphs that may carry a giant/high-diameter component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """(id_a, id_b) pair list → (node, cluster_id), cluster_id = min node
    id reachable through the pair graph. Only nodes appearing in pairs
    are returned (callers union singletons; see ``dedup_clusters``).

    ``algorithm="label"`` (default — rounds = diameter, best for the
    near-clique groups LSH banding emits) or ``"star"`` (O(log n)
    alternating small-star/large-star, safe for high-diameter or giant
    components; see ``connected_components_star``)."""
    if algorithm == "star":
        return connected_components_star(
            pairs, id_a=id_a, id_b=id_b, max_iter=max_iter
        )
    if algorithm != "label":
        raise ValueError(f"algorithm must be 'label' or 'star': {algorithm}")
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


def _neighborhood_mins(sym: DataFrame) -> DataFrame:
    """(src, m) with m = min(N(src) ∪ {src}). Also the correct center
    for small-star: when no neighbor is smaller the min of the
    smaller-neighbor set ∪ {src} is src itself, which equals this."""
    return (
        sym.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least(F.col("src"), F.col("_mn")).alias("m"))
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Alternating small-star / large-star connected components
    (Kiveris et al., SoCC'14): same (node, cluster_id = component min)
    contract as ``connected_components``, but rounds grow O(log n) in
    component SIZE instead of linearly in component DIAMETER — the
    variant to use when an LSH clique graph may have chained into a
    high-diameter or giant component.

    Per alternation, each operation is one groupBy (neighborhood min)
    plus one equi-join on the edge list — nothing proportional to
    payloads, same shuffle shape as one label-prop round. Edges strictly
    shrink toward a star per component (every node → component min);
    convergence is detected by edge-set fixpoint. ``localCheckpoint``
    per alternation truncates the doubling lineage exactly like the
    label-prop loop."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .where(F.col(id_a) != F.col(id_b))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_count = -1
    for _ in range(max_iter):
        sym = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        mins = _neighborhood_mins(sym)
        # large-star: hang every LARGER neighbor off the neighborhood min
        large = (
            sym.where(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        sym2 = large.union(
            large.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        mins2 = _neighborhood_mins(sym2)
        # small-star: re-hang the smaller neighbors (and the center)
        small = (
            sym2.where(F.col("dst") < F.col("src"))
            .join(mins2, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .union(mins2.select(F.col("src"), F.col("m").alias("dst")))
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n = small.count()
        if n == prev_count and small.exceptAll(edges).limit(1).count() == 0:
            edges = small
            break
        prev_count = n
        edges = small
    # The star shape (exactly one edge per non-root node) is only
    # guaranteed AT fixpoint; if max_iter truncated the loop a node may
    # still carry several edges, which would duplicate rows through
    # dedup_clusters/leakage_safe_split. Collapse to min so truncation
    # degrades to a wrong-but-unique label instead of row duplication.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("cluster_id"))
        .select(F.col("src").alias("node"), "cluster_id")
    )
    roots = all_nodes.join(
        labels, "node", "left_anti"
    ).select("node", F.col("node").alias("cluster_id"))
    return labels.union(roots)


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """Every row of ``df`` labeled with its duplicate-cluster id: the min
    id of its connected component under ``pairs``, or its own id when it
    appears in no pair (singleton). One left join over the component
    labels — the pair graph is tiny next to the corpus, so at scale this
    broadcasts. ``algorithm`` passes through to
    ``connected_components`` ("label" or "star")."""
    comp = connected_components(
        pairs, id_a=id_a, id_b=id_b, max_iter=max_iter, algorithm=algorithm
    )
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
