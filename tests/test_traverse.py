"""DFS/BFS traversal order (Traverse.java:38-150): visit order,
exit conditions (targets, max_depth), and the DFS driver-size guard."""

import pytest

from graph_data_science_spark.algorithms.traverse import bfs, dfs
from tests.conftest import edge_df

#       0
#      / \
#     1   4
#    / \   \
#   2   3   5
TREE = [(0, 1), (0, 4), (1, 2), (1, 3), (4, 5)]


def _order(df):
    return [r["id"] for r in df.orderBy("visit_order").collect()]


def test_dfs_preorder_ascending_neighbors(spark, catalog):
    g = catalog.create("tr1", edge_df(spark, TREE))
    assert _order(dfs(spark, g, source=0)) == [0, 1, 2, 3, 4, 5]


def test_dfs_stops_at_target(spark, catalog):
    g = catalog.create("tr2", edge_df(spark, TREE))
    assert _order(dfs(spark, g, source=0, target_nodes=[3])) == [0, 1, 2, 3]


def test_dfs_max_depth(spark, catalog):
    g = catalog.create("tr3", edge_df(spark, TREE))
    assert _order(dfs(spark, g, source=0, max_depth=1)) == [0, 1, 4]


def test_dfs_cycle_and_direction(spark, catalog):
    g = catalog.create("tr4", edge_df(spark, [(0, 1), (1, 2), (2, 0)]))
    assert _order(dfs(spark, g, source=1)) == [1, 2, 0]
    # undirected view from a leaf reaches everything
    g2 = catalog.create("tr5", edge_df(spark, [(0, 1), (1, 2)]))
    assert _order(dfs(spark, g2, source=2, directed=False)) == [2, 1, 0]


def test_dfs_guard_raises(spark, catalog):
    g = catalog.create("tr6", edge_df(spark, TREE))
    with pytest.raises(ValueError, match="max_nodes"):
        dfs(spark, g, source=0, max_nodes=2)


def test_bfs_level_order(spark, catalog):
    g = catalog.create("tr7", edge_df(spark, TREE))
    assert _order(bfs(spark, g, source=0)) == [0, 1, 4, 2, 3, 5]


def test_bfs_target_truncates_after_level(spark, catalog):
    g = catalog.create("tr8", edge_df(spark, TREE))
    # target 4 found at level 1 -> nothing beyond level 1 returned
    assert _order(bfs(spark, g, source=0, target_nodes=[4])) == [0, 1, 4]


def test_collapse_path_templates(spark):
    """Arbitrary-length and multiple pathTemplates
    (CollapsePathConfig.pathTemplates, CollapsePath.java:77-142)."""
    from graph_data_science_spark.algorithms.walking import collapse_path
    from graph_data_science_spark.catalog import Graph

    rows = [
        (0, 1, "A", 1.0), (1, 2, "B", 1.0), (2, 3, "C", 1.0),
        (0, 4, "X", 1.0), (4, 5, "Y", 1.0),
    ]
    g = Graph(name="cp", edges=spark.createDataFrame(
        rows, "src long, dst long, rel_type string, weight double"))

    # 3-hop template A->B->C
    abc = {(r["src"], r["dst"]) for r in collapse_path(
        spark, g, ["A", "B", "C"]).collect()}
    assert abc == {(0, 3)}

    # multiple templates union
    multi = {(r["src"], r["dst"]) for r in collapse_path(
        spark, g, [["A", "B"], ["X", "Y"]]).collect()}
    assert multi == {(0, 2), (0, 5)}

    # single-type template = the typed edges themselves
    single = {(r["src"], r["dst"]) for r in collapse_path(
        spark, g, ["A"]).collect()}
    assert single == {(0, 1)}

    import pytest

    with pytest.raises(ValueError, match="at least one"):
        collapse_path(spark, g, [])
