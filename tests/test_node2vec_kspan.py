"""Node2Vec training (Node2VecModel.java analog via Spark ML
Word2Vec over the deterministic p/q walks), k-spanning-tree
(KSpanningTree.java), and the pearson/euclidean similarity kernels
(alpha similarity functions)."""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.node2vec import node2vec
from graph_data_science_spark.algorithms.spanning import k_spanning_tree
from graph_data_science_spark.pipeline.ann import similarity_topk
from tests.conftest import edge_df


def _clique(ids):
    return [(a, b) for a in ids for b in ids if a != b]


@pytest.fixture(scope="module")
def two_cliques(spark):
    from graph_data_science_spark.catalog import GraphCatalog

    edges = _clique([0, 1, 2, 3, 4]) + _clique([10, 11, 12, 13, 14]) + [(4, 10), (10, 4)]
    return GraphCatalog().create("n2v", edge_df(spark, edges))


def test_node2vec_deterministic(spark, two_cliques):
    kw = dict(embedding_dim=8, walk_length=8, walks_per_node=6,
              window_size=3, iterations=1, seed=7, deterministic=True)
    a = {r["id"]: list(r["embedding"]) for r in node2vec(spark, two_cliques, **kw).collect()}
    b = {r["id"]: list(r["embedding"]) for r in node2vec(spark, two_cliques, **kw).collect()}
    assert a == b
    assert set(a) == {0, 1, 2, 3, 4, 10, 11, 12, 13, 14}
    assert all(len(v) == 8 for v in a.values())


def test_node2vec_clusters_closer_than_cross(spark, two_cliques):
    emb = {
        r["id"]: r["embedding"]
        for r in node2vec(
            spark, two_cliques, embedding_dim=8, walk_length=10,
            walks_per_node=20, window_size=4, iterations=3, seed=7,
        ).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    intra = [cos(emb[a], emb[b]) for a in (0, 1, 2) for b in (1, 2, 3) if a < b]
    inter = [cos(emb[a], emb[b]) for a in (0, 1, 2) for b in (11, 12, 13)]
    assert sum(intra) / len(intra) > sum(inter) / len(inter)


def test_k_spanning_tree_cuts_heaviest(spark, catalog):
    edges = edge_df(
        spark, [(0, 1), (1, 2), (2, 3)], weights=[1.0, 5.0, 1.0]
    )
    g = catalog.create("kspan", edges)
    comp = {r["id"]: r["component"] for r in k_spanning_tree(spark, g, k=2).collect()}
    assert comp[0] == comp[1]
    assert comp[2] == comp[3]
    assert comp[0] != comp[2]
    # k=1 keeps the full spanning tree: one component
    one = {r["component"] for r in k_spanning_tree(spark, g, k=1).collect()}
    assert len(one) == 1


def test_pearson_and_euclidean_topk(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [2.0, 4.0, 6.0]), (3, [3.0, 2.0, 1.0]),
         (4, [1.0, 2.0, 3.1])],
        "vec_id long, embedding array<float>",
    )
    p = similarity_topk(vecs, vecs, k=1, metric="pearson")
    top = {r["query_id"]: (r["neighbor_id"], r["similarity"]) for r in p.collect()}
    # 2 is a perfect linear transform of 1 -> pearson 1.0
    assert top[1][0] == 2 and abs(top[1][1] - 1.0) < 1e-6
    e = similarity_topk(vecs, vecs, k=1, metric="euclidean")
    etop = {r["query_id"]: r["neighbor_id"] for r in e.collect()}
    # 4 is the nearest euclidean neighbor of 1 (distance 0.1)
    assert etop[1] == 4
    with pytest.raises(ValueError, match="metric"):
        similarity_topk(vecs, vecs, metric="nope")
