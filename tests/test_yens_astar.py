"""Yen's K-shortest (Yens.java) and A* (AStar.java) parity tests on
the classic Yen example graph (C..H -> 0..5)."""

from graph_data_science_spark.algorithms.paths import astar, shortest_path, yens
from tests.conftest import edge_df

YEN_EDGES = [(0, 1), (0, 2), (1, 3), (2, 1), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)]
YEN_WEIGHTS = [3.0, 2.0, 4.0, 1.0, 2.0, 3.0, 2.0, 1.0, 2.0]


def _graph(spark, catalog, name):
    return catalog.create(name, edge_df(spark, YEN_EDGES, weights=YEN_WEIGHTS))


def test_yens_classic_example(spark, catalog):
    g = _graph(spark, catalog, "yen1")
    paths = yens(spark, g, source=0, target=5, k=3)
    assert [(c, p) for c, p in paths] == [
        (5.0, [0, 2, 3, 5]),
        (7.0, [0, 2, 4, 5]),
        (8.0, [0, 1, 3, 5]),  # ties with C-E-D-F-H; lex-smaller path wins
    ]


def test_yens_finds_tied_fourth_path(spark, catalog):
    g = _graph(spark, catalog, "yen2")
    paths = yens(spark, g, source=0, target=5, k=4)
    assert paths[3] == (8.0, [0, 2, 1, 3, 5])


def test_yens_unreachable(spark, catalog):
    g = catalog.create("yen3", edge_df(spark, [(0, 1)]))
    assert yens(spark, g, source=1, target=0, k=2) == []


def test_astar_zero_heuristic_matches_dijkstra(spark, catalog):
    g = _graph(spark, catalog, "astar1")
    h = spark.createDataFrame([(i, 0.0) for i in range(6)], "id long, h double")
    assert astar(spark, g, 0, 5, h) == shortest_path(spark, g, 0, 5)


def test_astar_admissible_heuristic_same_answer(spark, catalog):
    g = _graph(spark, catalog, "astar2")
    # true remaining distances to node 5 (the perfect heuristic)
    true_h = {0: 5.0, 1: 5.0, 2: 3.0, 3: 1.0, 4: 2.0, 5: 0.0}
    h = spark.createDataFrame(list(true_h.items()), "id long, h double")
    cost, path = astar(spark, g, 0, 5, h)
    assert cost == 5.0 and path == [0, 2, 3, 5]
