"""Bellman-Ford SSSP (GDS ``gds.bellmanFord`` semantics): negative
weights allowed, Dijkstra parity on non-negative inputs, reachable
negative cycles flagged with -inf distances over their forward
closure."""

import math

from graph_data_science_spark.algorithms.paths import bellman_ford, sssp
from tests.conftest import edge_df


def _dist_map(df):
    return {r["id"]: r["distance"] for r in df.collect()}


def test_matches_sssp_on_nonnegative(spark, catalog):
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (0, 4), (2, 5), (5, 4)]
    weights = [1.0, 4.0, 1.0, 1.0, 1.0, 9.0, 0.5, 0.5]
    g = catalog.create("bf1", edge_df(spark, pairs, weights=weights))
    assert _dist_map(bellman_ford(spark, g, source=0)) == _dist_map(
        sssp(spark, g, source=0)
    )


def test_negative_edges_no_cycle(spark, catalog):
    # 0 -> 1 (5), 0 -> 2 (2), 2 -> 1 (-4): best 0->1 is 2 + (-4) = -2
    pairs = [(0, 1), (0, 2), (2, 1), (1, 3)]
    weights = [5.0, 2.0, -4.0, 1.0]
    g = catalog.create("bf2", edge_df(spark, pairs, weights=weights))
    stats = {}
    got = bellman_ford(spark, g, source=0, stats=stats)
    d = _dist_map(got)
    assert d == {0: 0.0, 1: -2.0, 2: 2.0, 3: -1.0}
    assert stats["contains_negative_cycle"] is False
    assert all(not r["negative_cycle"] for r in got.collect())
    # Dijkstra-style sssp would refuse this input outright
    preds = {r["id"]: r["predecessor"] for r in got.collect()}
    assert preds[1] == 2 and preds[3] == 1


def test_negative_cycle_flagged_with_forward_closure(spark, catalog):
    # 0 -> 1 -> 2 -> 1 is a negative cycle (1->2->1 sums to -1);
    # 2 -> 3 is downstream of it; 0 -> 4 is on a clean branch
    pairs = [(0, 1), (1, 2), (2, 1), (2, 3), (0, 4)]
    weights = [1.0, 2.0, -3.0, 1.0, 7.0]
    g = catalog.create("bf3", edge_df(spark, pairs, weights=weights))
    stats = {}
    got = bellman_ford(spark, g, source=0, stats=stats)
    assert stats["contains_negative_cycle"] is True
    rows = {r["id"]: r for r in got.collect()}
    for v in (1, 2, 3):
        assert rows[v]["negative_cycle"] is True
        assert math.isinf(rows[v]["distance"]) and rows[v]["distance"] < 0
    assert rows[0]["distance"] == 0.0 and rows[0]["negative_cycle"] is False
    assert rows[4]["distance"] == 7.0 and rows[4]["negative_cycle"] is False


def test_unreachable_negative_cycle_is_ignored(spark, catalog):
    # the 5 -> 6 -> 5 negative cycle is not reachable from source 0
    pairs = [(0, 1), (5, 6), (6, 5)]
    weights = [1.0, -2.0, 1.0]
    g = catalog.create("bf4", edge_df(spark, pairs, weights=weights))
    stats = {}
    got = bellman_ford(spark, g, source=0, stats=stats)
    assert stats["contains_negative_cycle"] is False
    assert _dist_map(got) == {0: 0.0, 1: 1.0}


def test_undirected_negative_edge_is_a_cycle(spark, catalog):
    # an undirected negative edge u-v is itself the cycle u->v->u
    pairs = [(0, 1), (1, 2)]
    weights = [1.0, -1.0]
    g = catalog.create("bf5", edge_df(spark, pairs, weights=weights))
    stats = {}
    got = bellman_ford(spark, g, source=0, directed=False, stats=stats)
    assert stats["contains_negative_cycle"] is True
    rows = {r["id"]: r for r in got.collect()}
    assert rows[1]["negative_cycle"] and rows[2]["negative_cycle"]


def test_equal_distance_smaller_predecessor_wins_across_rounds(spark, catalog):
    """The min-(distance, predecessor) tie-break is round-order
    independent: the optimal predecessor with the SMALLER id wins
    even when its path has more hops (settles in a later relaxation
    round). Here node 9 is reachable at cost 3 via 5 (2 hops,
    settles first) and via 2 (3 hops, settles later); pred must be
    min(5, 2) = 2."""
    pairs = [(0, 5), (5, 9), (0, 1), (1, 2), (2, 9)]
    weights = [2.0, 1.0, 1.0, 1.0, 1.0]
    g = catalog.create("bf_tie", edge_df(spark, pairs, weights=weights))
    got = {
        r["id"]: (r["distance"], r["predecessor"])
        for r in bellman_ford(spark, g, source=0).collect()
    }
    assert got[9] == (3.0, 2)

    from graph_data_science_spark.algorithms.paths import sssp

    got_d = {
        r["id"]: (r["distance"], r["predecessor"])
        for r in sssp(spark, g, source=0).collect()
    }
    assert got_d[9] == (3.0, 2)
