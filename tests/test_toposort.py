"""Topological sort / DAG longest path fixture tests.

GDS `gds.dag.topologicalSort` / `gds.dag.longestPath` analogs
(2.4-era alpha, beyond the 2.0-era reference snapshot). Fixtures pin:
level = longest unit path from sources, (level, id) is a valid topo
order, weighted dist = max-plus recurrence, and GDS's cycle semantics
(cyclic + downstream vertices excluded from the result).
"""

import pytest

from graph_data_science_spark.algorithms.toposort import (
    longest_path,
    topological_sort,
)
from graph_data_science_spark.catalog import Graph

from tests.conftest import edge_df


def _graph(spark, pairs, weights=None, name="gt"):
    return Graph(name=name, edges=edge_df(spark, pairs, weights))


#   0 -> 1 -> 3 -> 5
#    \-> 2 ----^    (2 -> 3)
#   4 -> 5          (second source)
DAG = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 5), (4, 5)]
LEVELS = {0: 0, 4: 0, 1: 1, 2: 1, 3: 2, 5: 3}


def test_toposort_levels(spark):
    g = _graph(spark, DAG)
    res = topological_sort(spark, g)
    got = {r["id"]: r["level"] for r in res.order.collect()}
    assert got == LEVELS
    assert res.n_sorted == 6 and res.n_cyclic == 0
    assert res.rounds == 4
    # (level, id) is a valid topological order: every edge goes
    # strictly level-upward
    for s, d in DAG:
        assert got[s] < got[d]


def test_toposort_is_valid_order_on_random_dag(spark):
    # a layered random-ish DAG: edges only from lower to higher id
    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10) if (i * 7 + j) % 3 == 0]
    g = _graph(spark, pairs)
    res = topological_sort(spark, g)
    got = {r["id"]: r["level"] for r in res.order.collect()}
    for s, d in pairs:
        assert got[s] < got[d]
    assert res.n_cyclic == 0


def test_longest_path_weighted(spark):
    weights = [1.0, 5.0, 2.0, 1.0, 3.0, 0.5]
    g = _graph(spark, DAG, weights)
    res = longest_path(spark, g)
    got = {r["id"]: r["dist"] for r in res.order.collect()}
    # dist = max over in-paths: 3 via 0->2->3 = 6.0 (beats 0->1->3 = 3)
    assert got[0] == 0.0 and got[4] == 0.0
    assert got[1] == 1.0
    assert got[2] == 5.0
    assert got[3] == pytest.approx(6.0)
    # 5: max(dist(3) + 3.0, dist(4) + 0.5) = 9.0
    assert got[5] == pytest.approx(9.0)


def test_toposort_cycle_excluded(spark):
    # 0 -> 1 -> 2 -> 1 (cycle), 0 -> 3: only 0 and 3 sortable
    g = _graph(spark, [(0, 1), (1, 2), (2, 1), (0, 3)])
    res = topological_sort(spark, g)
    got = {r["id"]: r["level"] for r in res.order.collect()}
    assert got == {0: 0, 3: 1}
    assert res.n_cyclic == 2


def test_toposort_cycle_raises(spark):
    g = _graph(spark, [(0, 1), (1, 0)])
    with pytest.raises(ValueError, match="cycle"):
        topological_sort(spark, g, on_cycle="raise")
    with pytest.raises(ValueError, match="on_cycle"):
        topological_sort(spark, g, on_cycle="nope")


def test_toposort_deep_chain(spark):
    # depth > Truncator period: exercises the lineage-truncation path
    n = 25
    g = _graph(spark, [(i, i + 1) for i in range(n)])
    res = topological_sort(spark, g)
    got = {r["id"]: r["level"] for r in res.order.collect()}
    assert got == {i: i for i in range(n + 1)}
    assert res.rounds == n + 1
