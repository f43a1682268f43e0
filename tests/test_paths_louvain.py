"""Tests for SSSP/shortest-path and Louvain."""

import pytest

from graph_data_science_spark.algorithms.louvain import LouvainConfig, louvain
from graph_data_science_spark.algorithms.paths import shortest_path, sssp
from graph_data_science_spark.catalog import Graph
from tests.conftest import edge_df


def _graph(spark, pairs, weights=None, name="gp"):
    return Graph(name=name, edges=edge_df(spark, pairs, weights))


# ------------------------------------------------------------------ SSSP

def test_sssp_weighted_matches_dijkstra(spark):
    # classic diamond: 0->1 (4), 0->2 (1), 2->1 (2), 1->3 (1), 2->3 (5)
    pairs = [(0, 1), (0, 2), (2, 1), (1, 3), (2, 3)]
    w = [4.0, 1.0, 2.0, 1.0, 5.0]
    g = _graph(spark, pairs, w)
    got = {r["id"]: (r["distance"], r["predecessor"]) for r in sssp(spark, g, 0).collect()}
    assert got[0] == (0.0, None)
    assert got[2] == (1.0, 0)
    assert got[1] == (3.0, 2)  # via 2, not the direct 4.0 edge
    assert got[3] == (4.0, 1)


def test_sssp_unreachable_omitted(spark):
    g = _graph(spark, [(0, 1), (2, 3)])
    ids = {r["id"] for r in sssp(spark, g, 0, weighted=False).collect()}
    assert ids == {0, 1}


def test_shortest_path_reconstruction(spark):
    pairs = [(0, 1), (0, 2), (2, 1), (1, 3), (2, 3)]
    w = [4.0, 1.0, 2.0, 1.0, 5.0]
    g = _graph(spark, pairs, w)
    cost, path = shortest_path(spark, g, 0, 3)
    assert cost == 4.0
    assert path == [0, 2, 1, 3]


def test_sssp_negative_weight_rejected(spark):
    g = _graph(spark, [(0, 1)], [-1.0])
    with pytest.raises(ValueError):
        sssp(spark, g, 0)


# ------------------------------------------------------------------ Louvain

def _clique(nodes):
    return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]


def test_louvain_two_cliques(spark):
    pairs = _clique([0, 1, 2, 3]) + _clique([4, 5, 6, 7]) + [(3, 4)]
    g = _graph(spark, pairs)
    res = louvain(spark, g)
    comms = {r["id"]: r["community"] for r in res.communities.collect()}
    assert len({comms[i] for i in (0, 1, 2, 3)}) == 1
    assert len({comms[i] for i in (4, 5, 6, 7)}) == 1
    assert comms[0] != comms[4]
    # known modularity of the 2-clique partition on this graph:
    # m=13; internal both-dir=24; tot each community: 13 ⇒
    # Q = 24/26 - 2*(13/26)^2 = 12/13 - 1/2
    assert res.modularity == pytest.approx(12 / 13 - 0.5, abs=1e-9)


def test_louvain_ring_of_cliques_levels(spark):
    # 4 triangles in a ring — classic multi-level fixture
    cliques = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    pairs = []
    for c in cliques:
        pairs += _clique(c)
    pairs += [(2, 3), (5, 6), (8, 9), (11, 0)]
    g = _graph(spark, pairs)
    res = louvain(spark, g, LouvainConfig())
    comms = {r["id"]: r["community"] for r in res.communities.collect()}
    for c in cliques:
        assert len({comms[i] for i in c}) == 1, comms
    assert len({comms[c[0]] for c in cliques}) == 4
    # m=16 (12 intra + 4 ring); Q = 24/32 - 4*(8/32)^2 = 0.5 exactly
    assert res.modularity == pytest.approx(0.5, abs=1e-9)


def test_louvain_intermediate_communities(spark):
    # LouvainBaseConfig.includeIntermediateCommunities: per-level
    # dendrogram column; last level equals the final community
    pairs = _clique([0, 1, 2, 3]) + _clique([4, 5, 6, 7]) + [(3, 4)]
    g = _graph(spark, pairs)
    res = louvain(spark, g, LouvainConfig(include_intermediate_communities=True))
    rows = {r["id"]: r for r in res.communities.collect()}
    assert res.levels >= 1
    for r in rows.values():
        assert len(r["intermediate_communities"]) == res.levels
        assert r["intermediate_communities"][-1] == r["community"]
    # final partition still the two cliques
    assert len({rows[i]["community"] for i in (0, 1, 2, 3)}) == 1
    assert rows[0]["community"] != rows[4]["community"]


def test_louvain_consecutive_ids(spark):
    pairs = _clique([10, 11, 12, 13]) + _clique([24, 25, 26, 27]) + [(13, 24)]
    g = _graph(spark, pairs)
    res = louvain(spark, g, LouvainConfig(consecutive_ids=True))
    comms = {r["id"]: r["community"] for r in res.communities.collect()}
    assert sorted(set(comms.values())) == [0, 1]


def test_louvain_option_exclusion():
    # LouvainBaseConfig.java:65-67
    with pytest.raises(ValueError, match="cannot be used at the same time"):
        LouvainConfig(include_intermediate_communities=True, consecutive_ids=True)


# ---------------------------------------------------- allShortestPaths

def test_all_shortest_paths_unweighted(spark):
    # MSBFSAllShortestPaths.java:104-121 — ANP stream: hop distances,
    # targets at dist >= 1 only, unreachable pairs omitted
    from graph_data_science_spark.algorithms.msbfs import all_shortest_paths

    g = _graph(spark, [(0, 1), (1, 2), (3, 2)], name="asp_u")
    got = {
        (r["source_id"], r["target_id"]): r["distance"]
        for r in all_shortest_paths(spark, g, directed=True).collect()
    }
    assert got == {
        (0, 1): 1.0, (0, 2): 2.0, (1, 2): 1.0, (3, 2): 1.0,
    }


def test_all_shortest_paths_weighted(spark):
    # WeightedAllShortestPaths.java:96-152 — per-source Dijkstra
    # distances; (s, s, 0.0) rows included, only finite pairs kept
    from graph_data_science_spark.algorithms.msbfs import all_shortest_paths

    pairs = [(0, 1), (0, 2), (2, 1), (1, 3), (2, 3)]
    w = [4.0, 1.0, 2.0, 1.0, 5.0]
    g = _graph(spark, pairs, w, name="asp_w")
    got = {
        (r["source_id"], r["target_id"]): r["distance"]
        for r in all_shortest_paths(spark, g, weighted=True).collect()
    }
    # per-source rows from source 0 match the Dijkstra fixture above
    assert got[(0, 0)] == 0.0
    assert got[(0, 2)] == 1.0
    assert got[(0, 1)] == 3.0  # via 2, not the direct 4.0 edge
    assert got[(0, 3)] == 4.0
    # other sources advance in the same sweep
    assert got[(2, 3)] == 3.0  # 2 -> 1 -> 3 beats the direct 5.0
    assert got[(1, 3)] == 1.0
    assert (3, 0) not in got  # unreachable pairs omitted


def test_all_shortest_paths_bounded_sources(spark):
    from graph_data_science_spark.algorithms.msbfs import all_shortest_paths

    g = _graph(spark, [(0, 1), (1, 2), (3, 2)], name="asp_s")
    srcs = spark.createDataFrame([(0,)], "id long")
    got = {
        (r["source_id"], r["target_id"])
        for r in all_shortest_paths(spark, g, sources=srcs).collect()
    }
    assert got == {(0, 1), (0, 2)}
