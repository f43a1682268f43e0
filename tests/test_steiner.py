"""Steiner tree (shortest-path heuristic, gds.steinerTree analog):
union of source->terminal shortest paths with shared prefixes merged."""

from graph_data_science_spark.algorithms.steiner import steiner_tree
from tests.conftest import edge_df


def test_shared_prefix_merges(spark, catalog):
    #     0 -1- 1 -1- 2 -1- 3(term)
    #                  \-2- 4(term)
    # both terminals share the 0-1-2 prefix; tree = 4 edges, weight 5
    pairs = [(0, 1), (1, 2), (2, 3), (2, 4)]
    weights = [1.0, 1.0, 1.0, 2.0]
    g = catalog.create("st1", edge_df(spark, pairs, weights=weights))
    res = steiner_tree(spark, g, source=0, terminals=[3, 4])
    got = {(r["src"], r["dst"]): r["weight"] for r in res.edges.collect()}
    assert got == {(0, 1): 1.0, (1, 2): 1.0, (2, 3): 1.0, (2, 4): 2.0}
    assert res.total_weight == 5.0
    assert res.reached_terminals == 2


def test_shortest_route_chosen_per_terminal(spark, catalog):
    # two routes to 3: 0->1->3 (cost 5) vs 0->2->3 (cost 3)
    pairs = [(0, 1), (1, 3), (0, 2), (2, 3)]
    weights = [1.0, 4.0, 1.0, 2.0]
    g = catalog.create("st2", edge_df(spark, pairs, weights=weights))
    res = steiner_tree(spark, g, source=0, terminals=[3])
    got = {(r["src"], r["dst"]) for r in res.edges.collect()}
    assert got == {(0, 2), (2, 3)}
    assert res.total_weight == 3.0


def test_unreachable_terminal_skipped(spark, catalog):
    pairs = [(0, 1), (5, 6)]
    weights = [1.0, 1.0]
    g = catalog.create("st3", edge_df(spark, pairs, weights=weights))
    res = steiner_tree(spark, g, source=0, terminals=[1, 6])
    assert res.reached_terminals == 1
    got = {(r["src"], r["dst"]) for r in res.edges.collect()}
    assert got == {(0, 1)}


def test_terminal_on_another_terminals_path(spark, catalog):
    # 0 -> 1 -> 2, terminals {1, 2}: edge set is just the chain
    pairs = [(0, 1), (1, 2)]
    weights = [1.0, 1.0]
    g = catalog.create("st4", edge_df(spark, pairs, weights=weights))
    res = steiner_tree(spark, g, source=0, terminals=[1, 2])
    got = {(r["src"], r["dst"]) for r in res.edges.collect()}
    assert got == {(0, 1), (1, 2)}
    assert res.total_weight == 2.0
