"""Node-label filtering (AlgoBaseConfig.nodeLabels analog,
api/GraphStore.java:169-173): PageRank over a label subset must equal
PageRank over the manually filtered subgraph, and the engine facade
must accept node_labels / rel_types / node_ids on any algorithm."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.pagerank import PageRankConfig, pagerank
from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.engine import GdsEngine
from tests.conftest import edge_df


@pytest.fixture()
def labeled_graph(spark):
    # 0-3 are 'User' nodes chained; 4-5 are 'Item' nodes hanging off
    edges = edge_df(spark, [(0, 1), (1, 2), (2, 3), (0, 4), (2, 5), (4, 5)])
    nodes = spark.createDataFrame(
        [(0, ["User"]), (1, ["User"]), (2, ["User", "Admin"]), (3, ["User"]),
         (4, ["Item"]), (5, ["Item"])],
        "id long, labels array<string>",
    )
    return Graph(name="labeled", edges=edges, nodes=nodes)


def test_label_subgraph_matches_manual_filter(spark, labeled_graph):
    sub = labeled_graph.subgraph(node_labels=["User"])
    got = {
        r["id"]: round(r["score"], 6)
        for r in pagerank(spark, sub, PageRankConfig(tolerance=0.0)).state.collect()
    }
    manual = Graph(
        name="manual",
        edges=edge_df(spark, [(0, 1), (1, 2), (2, 3)]),
        nodes=spark.createDataFrame([(i,) for i in range(4)], "id long"),
    )
    want = {
        r["id"]: round(r["score"], 6)
        for r in pagerank(spark, manual, PageRankConfig(tolerance=0.0)).state.collect()
    }
    assert got == want
    assert set(got) == {0, 1, 2, 3}


def test_label_union_semantics(labeled_graph):
    # nodeLabels are a union: ['User', 'Item'] keeps everything
    sub = labeled_graph.subgraph(node_labels=["User", "Item"])
    assert sub.vertices().count() == 6
    assert sub.edges.count() == 6
    # a single specific label keeps only its carriers
    admins = labeled_graph.subgraph(node_labels=["Admin"])
    assert [r["id"] for r in admins.vertices().collect()] == [2]
    assert admins.edges.count() == 0


def test_node_id_filter(spark, labeled_graph):
    keep = spark.createDataFrame([(0,), (1,), (4,)], "id long")
    sub = labeled_graph.subgraph(node_ids=keep)
    assert {tuple(r) for r in sub.edges.select("src", "dst").collect()} == {
        (0, 1), (0, 4),
    }


def test_engine_node_labels_kwarg(spark, labeled_graph):
    gds = GdsEngine(spark)
    full = gds.degree_centrality(labeled_graph).stream()
    sub = gds.degree_centrality(labeled_graph, node_labels=["User"]).stream()
    assert full.count() == 6
    got = {r["id"]: r["score"] for r in sub.collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 3: 0.0}


def test_missing_labels_column_raises(spark):
    g = Graph(name="nolabels", edges=edge_df(spark, [(0, 1)]))
    with pytest.raises(ValueError, match="node_labels"):
        g.subgraph(node_labels=["User"])


def test_catalog_property_procs(spark):
    # GraphDeleteRelationshipProc / GraphRemoveNodePropertiesProc /
    # GraphStream{Node,Relationship}PropertiesProc analogs
    import pytest
    from pyspark.sql import functions as F

    from graph_data_science_spark.catalog import Graph

    edges = spark.createDataFrame(
        [(0, 1, "A", 1.0), (1, 2, "B", 2.0)],
        "src long, dst long, rel_type string, weight double",
    )
    nodes = spark.createDataFrame(
        [(0, 5.0, "x"), (1, 6.0, "y"), (2, 7.0, "z")],
        "id long, score double, label string",
    )
    g = Graph(name="cat", edges=edges, nodes=nodes)

    g2 = g.delete_relationships("A")
    assert {r["rel_type"] for r in g2.edges.collect()} == {"B"}

    g3 = g.remove_node_properties("label")
    assert set(g3.nodes.columns) == {"id", "score"}
    with pytest.raises(ValueError):
        g.remove_node_properties("id")
    with pytest.raises(ValueError):
        g.remove_node_properties("nope")

    snp = g.stream_node_properties(["score"])
    assert {(r["id"], r["score"]) for r in snp.collect()} == {(0, 5.0), (1, 6.0), (2, 7.0)}

    srp = g.stream_relationship_properties(["weight"])
    assert {(r["src"], r["dst"], r["weight"]) for r in srp.collect()} == {
        (0, 1, 1.0), (1, 2, 2.0)
    }
