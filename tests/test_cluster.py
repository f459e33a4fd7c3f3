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
