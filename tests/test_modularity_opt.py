"""Tests for standalone modularity optimization.

Reference semantics: /root/reference/algo/src/main/java/org/neo4j/
gds/beta/modularity/ModularityOptimization.java and its proc tests
(single-level local moving, seedProperty, tolerance/didConverge).
"""

import pytest

from graph_data_science_spark.algorithms.modularity_opt import (
    modularity_optimization,
)
from graph_data_science_spark.catalog import Graph
from tests.conftest import edge_df


def _graph(spark, pairs, weights=None, name="gmo"):
    return Graph(name=name, edges=edge_df(spark, pairs, weights))


def _clique(nodes):
    return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]


def test_two_cliques_partition_and_modularity(spark):
    pairs = _clique([0, 1, 2, 3]) + _clique([4, 5, 6, 7]) + [(3, 4)]
    g = _graph(spark, pairs)
    res = modularity_optimization(spark, g)
    comms = {r["id"]: r["community"] for r in res.communities.collect()}
    assert len({comms[i] for i in (0, 1, 2, 3)}) == 1
    assert len({comms[i] for i in (4, 5, 6, 7)}) == 1
    assert comms[0] != comms[4]
    # same closed form as the louvain fixture: Q = 12/13 - 1/2
    assert res.modularity == pytest.approx(12 / 13 - 0.5, abs=1e-9)
    assert res.did_converge
    assert 1 <= res.ran_iterations <= 10


def test_seeded_start_respected_and_not_degraded(spark):
    pairs = _clique([0, 1, 2, 3]) + _clique([4, 5, 6, 7]) + [(3, 4)]
    g = _graph(spark, pairs)
    seed = g.edges.sparkSession.createDataFrame(
        [(i, 0 if i < 4 else 4) for i in range(8)], "id long, community long"
    )
    res = modularity_optimization(spark, g, seed=seed)
    # seeded with the optimum: nothing should move, Q identical
    comms = {r["id"]: r["community"] for r in res.communities.collect()}
    assert {comms[i] for i in (0, 1, 2, 3)} == {0}
    assert {comms[i] for i in (4, 5, 6, 7)} == {4}
    assert res.modularity == pytest.approx(12 / 13 - 0.5, abs=1e-9)


def test_isolated_vertices_keep_singleton(spark):
    # vertex 9 exists only in the nodes DF (degree 0): it must come
    # back assigned to its own singleton community
    pairs = _clique([0, 1, 2]) + [(3, 4)]
    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 4, 9)], "id long")
    g = Graph(name="gmo_iso", edges=edge_df(spark, pairs), nodes=nodes)
    res = modularity_optimization(spark, g)
    comms = {r["id"]: r["community"] for r in res.communities.collect()}
    assert len(comms) == 6  # every vertex assigned exactly once
    assert len({comms[i] for i in (0, 1, 2)}) == 1
    assert comms[3] == comms[4]
    assert comms[9] == 9


def test_max_iterations_bounds_sweeps(spark):
    pairs = _clique([0, 1, 2, 3]) + _clique([4, 5, 6, 7]) + [(3, 4)]
    g = _graph(spark, pairs)
    res = modularity_optimization(spark, g, max_iterations=1)
    assert res.ran_iterations == 1
    assert not res.did_converge


def test_engine_proc_stats(spark):
    from graph_data_science_spark.engine import GdsEngine

    pairs = _clique([0, 1, 2, 3]) + _clique([4, 5, 6, 7]) + [(3, 4)]
    g = _graph(spark, pairs)
    stats = GdsEngine(spark).modularity_optimization(g).stats()
    assert stats["modularity"] == pytest.approx(12 / 13 - 0.5, abs=1e-9)
    assert stats["did_converge"] is True
