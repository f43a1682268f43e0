"""Tests: betweenness (exact Brandes values), Borůvka MSF, KNN."""

import numpy as np
import pytest

from graph_data_science_spark.algorithms.betweenness import betweenness
from graph_data_science_spark.algorithms.knn import knn
from graph_data_science_spark.algorithms.spanning import minimum_spanning_forest
from graph_data_science_spark.catalog import Graph
from tests.conftest import edge_df


def test_betweenness_path_directed(spark):
    # directed path 0->1->2->3: interior vertices lie on (source,target)
    # pairs: bc(1) = |{(0,2),(0,3)}| = 2, bc(2) = 2
    g = Graph(name="bc1", edges=edge_df(spark, [(0, 1), (1, 2), (2, 3)]))
    got = {r["id"]: r["score"] for r in betweenness(spark, g).collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}


def test_betweenness_star_undirected(spark):
    # undirected star: the hub lies between every leaf pair:
    # bc(hub) = C(4,2) = 6 (unordered pairs)
    g = Graph(name="bc2", edges=edge_df(spark, [(0, i) for i in range(1, 5)]))
    got = {r["id"]: r["score"] for r in betweenness(spark, g, directed=False).collect()}
    assert got[0] == pytest.approx(6.0)
    for leaf in range(1, 5):
        assert got[leaf] == pytest.approx(0.0)


def test_betweenness_diamond_split_paths(spark):
    # 0->1->3, 0->2->3: two shortest paths; each middle gets 0.5
    g = Graph(name="bc3", edges=edge_df(spark, [(0, 1), (0, 2), (1, 3), (2, 3)]))
    got = {r["id"]: r["score"] for r in betweenness(spark, g).collect()}
    assert got[1] == pytest.approx(0.5)
    assert got[2] == pytest.approx(0.5)


def test_betweenness_sampling_scales(spark):
    g = Graph(name="bc4", edges=edge_df(spark, [(0, 1), (1, 2), (2, 3)]))
    got = betweenness(spark, g, sampling_size=2, sampling_seed=1)
    assert got.count() == 4  # all vertices scored, estimate scaled


def test_msf_known_tree(spark):
    # classic: MST of a weighted square + diagonal
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    weights = [1.0, 4.0, 2.0, 3.0, 5.0]
    g = Graph(name="msf1", edges=edge_df(spark, pairs, weights))
    forest = minimum_spanning_forest(spark, g)
    got = {(r["src"], r["dst"]): r["weight"] for r in forest.collect()}
    assert got == {(0, 1): 1.0, (2, 3): 2.0, (0, 3): 3.0}
    assert sum(got.values()) == 6.0


def test_msf_disconnected_forest(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11)]
    weights = [1.0, 2.0, 3.0, 1.0]
    g = Graph(name="msf2", edges=edge_df(spark, pairs, weights))
    forest = minimum_spanning_forest(spark, g)
    got = {(r["src"], r["dst"]) for r in forest.collect()}
    assert got == {(0, 1), (1, 2), (10, 11)}


def test_knn_finds_true_neighbors(spark):
    # three well-separated clusters in 8-d; true top-2 neighbors are
    # in-cluster — NN-descent must recover them
    rng = np.random.default_rng(5)
    rows = []
    centers = [np.eye(8)[0] * 10, np.eye(8)[3] * 10, np.eye(8)[6] * 10]
    for i in range(24):
        c = centers[i % 3]
        rows.append((i, [float(x) for x in c + rng.normal(0, 0.1, 8)]))
    nodes = spark.createDataFrame(rows, "id long, embedding array<double>")
    res = knn(spark, nodes, top_k=2, max_iterations=10)
    got = {}
    for r in res.collect():
        got.setdefault(r["node1"], []).append(r["node2"])
    for node, nbrs in got.items():
        for nb in nbrs:
            assert nb % 3 == node % 3, f"{node} paired with off-cluster {nb}"
    # deterministic
    again = knn(spark, nodes, top_k=2, max_iterations=10)
    assert res.exceptAll(again).count() == 0


def test_betweenness_random_degree_prefers_hubs(spark):
    """SelectionStrategy.java:107-181 analog: degree-proportional
    acceptance puts hub sources in the sample, so on a hub-and-spoke
    graph the degree-biased estimate recovers the hub's dominance
    that a like-sized uniform sample may miss entirely."""
    # hub 0 with 30 spokes, plus a 5-chain hanging off spoke 1
    edges = [(0, i) for i in range(1, 31)] + [
        (30 + i, 31 + i) for i in range(0, 5)
    ]
    g = Graph(name="bc_rd", edges=edge_df(spark, edges))
    exact = {
        r["id"]: r["score"]
        for r in betweenness(spark, g, directed=False).collect()
    }
    est = {
        r["id"]: r["score"]
        for r in betweenness(
            spark, g, directed=False, sampling_size=3, sampling_seed=7,
            strategy="random_degree",
        ).collect()
    }
    # hub is max-degree -> accept probability 1 -> always sampled;
    # its estimated score must identify it as the top vertex
    assert max(est, key=est.get) == 0
    assert max(exact, key=exact.get) == 0
    # scaled estimate lands within 2x of exact on the hub
    assert est[0] == pytest.approx(exact[0], rel=1.0)


def test_betweenness_unknown_strategy_raises(spark):
    g = Graph(name="bc_bad", edges=edge_df(spark, [(0, 1), (1, 2)]))
    with pytest.raises(ValueError, match="strategy"):
        betweenness(spark, g, sampling_size=1, strategy="degree^2")
