"""Connected-components duplicate clustering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pinecone_datasets_spark.operators.cluster import (
    connected_components,
    dedup_clusters,
)


@pytest.fixture(scope="module")
def chain_pairs(spark):
    # two components: a 5-node chain (worst-case diameter for propagation)
    # and a 2-node pair, plus node 100 isolated (absent from pairs)
    rows = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    return spark.createDataFrame(rows, schema="id_a long, id_b long")


def test_connected_components_chain(chain_pairs):
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components(chain_pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_connected_components_direction_agnostic(spark):
    # edges given high->low must still label by the component minimum
    pairs = spark.createDataFrame(
        [(9, 3), (3, 7)], schema="id_a long, id_b long"
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert out == {3: 3, 7: 3, 9: 3}


def test_dedup_clusters_includes_singletons(spark, chain_pairs):
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 100]], schema="doc_id long"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(docs, chain_pairs).collect()
    }
    assert out[100] == 100  # singleton keeps its own id
    assert {out[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert out[10] == out[11] == 10


def test_dedup_clusters_representative_selection(spark, chain_pairs):
    """keep-one-per-cluster composes directly: filter doc_id == cluster_id."""
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 100]], schema="doc_id long"
    )
    kept = (
        dedup_clusters(docs, chain_pairs)
        .where(F.col("doc_id") == F.col("cluster_id"))
        .select("doc_id")
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 10, 100]


def test_cluster_representatives_keep_best(spark):
    from pinecone_datasets_spark.operators.cluster import (
        cluster_representatives,
    )
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 5), (5, 7)],
        "doc_id long, n_chars long",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)],
        "doc_id long, cluster_id long",
    )
    reps = {
        r["cluster_id"]: (r["doc_id"], r["n_members"])
        for r in cluster_representatives(
            docs,
            clusters,
            order_by=[F.col("n_chars").desc(), F.col("doc_id")],
        ).collect()
    }
    assert reps == {1: (2, 3), 4: (4, 1), 5: (5, 1)}


# --- r11: alternating small-star / large-star (Kiveris et al. SoCC'14) ---


def test_star_matches_label_on_fixtures(spark, chain_pairs):
    from pinecone_datasets_spark.operators.cluster import (
        connected_components_star,
    )

    want = {
        r["node"]: r["cluster_id"]
        for r in connected_components(chain_pairs).collect()
    }
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(chain_pairs).collect()
    }
    assert got == want


def test_star_matches_label_on_random_graph(spark):
    import random

    from pinecone_datasets_spark.operators.cluster import (
        connected_components_star,
    )

    rng = random.Random(1311)
    nodes = list(range(200))
    rows = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    rows = [(a, b) for a, b in rows if a != b]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    want = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs, max_iter=50).collect()
    }
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(pairs).collect()
    }
    assert got == want


def test_star_collapses_planted_1000_node_path(spark):
    """The case the star variant exists for (r10 verdict item 5): a
    1000-node path has diameter 999, so min-label propagation would
    need ~999 rounds (its default max_iter=20 leaves it unconverged) —
    small-star/large-star must collapse it to one component within its
    default O(log n) iteration budget."""
    from pinecone_datasets_spark.operators.cluster import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    out = connected_components_star(pairs).collect()
    assert len(out) == 1000
    assert {r["cluster_id"] for r in out} == {0}
    assert {r["node"] for r in out} == set(range(1000))


def test_star_via_algorithm_param_and_strings(spark):
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y"), ("c", "c")],
        "id_a string, id_b string",
    )
    out = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs, algorithm="star").collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    with pytest.raises(ValueError, match="algorithm"):
        connected_components(pairs, algorithm="bogus")


def test_dedup_clusters_star_passthrough(spark, chain_pairs):
    df = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 100]], "doc_id long"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(df, chain_pairs, algorithm="star").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 100: 100}


def test_star_truncated_still_one_label_per_node(spark):
    """r11 ADVICE: the star shape (one edge per non-root node) is only
    guaranteed AT fixpoint — a max_iter-truncated run could emit
    several (node, cluster_id) rows per node and duplicate rows through
    dedup_clusters. Truncation must degrade to a possibly-wrong but
    UNIQUE label per node."""
    from pinecone_datasets_spark.operators.cluster import (
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "id_a long, id_b long"
    )
    out = connected_components_star(pairs, max_iter=1).collect()
    nodes = [r["node"] for r in out]
    assert len(nodes) == len(set(nodes)) == 200
