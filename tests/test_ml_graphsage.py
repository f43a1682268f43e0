"""Tests for the ML pipelines (node classification, link prediction)
and GraphSAGE embeddings.

Fixture graphs are small and deterministic: two dense communities
with a separable node feature, so a correct pipeline must score well
above chance, and a broken split/feature path shows up as chance-level
metrics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph

from tests.conftest import edge_df


def _two_community_graph(spark, n_per: int = 20, seed: int = 7):
    """Nodes 0..n-1 in community A, n..2n-1 in B; dense intra-edges
    (ring + chords), sparse inter-edges. Node feature `x` separates
    the communities; label = community."""
    pairs = []
    for base in (0, n_per):
        for i in range(n_per):
            pairs.append((base + i, base + (i + 1) % n_per))
            pairs.append((base + i, base + (i + 3) % n_per))
            pairs.append((base + i, base + (i + 7) % n_per))
    pairs.append((0, n_per))  # one bridge
    edges = edge_df(spark, pairs)
    nodes = spark.createDataFrame(
        [
            (
                i,
                float(1.0 + (i % 5) * 0.01) if i < n_per else float(-1.0 - (i % 5) * 0.01),
                "A" if i < n_per else "B",
            )
            for i in range(2 * n_per)
        ],
        "id long, x double, cls string",
    )
    return Graph(name="two_comm", edges=edges, nodes=nodes, directed=False)


def test_node_classification_train_predict(spark):
    from graph_data_science_spark.mlpipeline import NodeClassificationPipeline

    g = _two_community_graph(spark)
    pipe = NodeClassificationPipeline()
    pipe.add_node_property("degree_centrality", "deg")
    pipe.select_features(["x", "deg"])
    pipe.set_params([{"penalty": 0.0}, {"penalty": 1.0}])
    model = pipe.train(
        spark, g, target_property="cls", holdout_fraction=0.3, validation_folds=3
    )
    # x is perfectly separable -> near-perfect holdout metrics
    assert model.metrics["test"]["ACCURACY"] >= 0.95
    assert model.metrics["test"]["F1_WEIGHTED"] >= 0.95
    assert model.best_params in pipe.param_grid

    pred = model.predict(spark, g)
    rows = {r["id"]: r["predicted_class"] for r in pred.collect()}
    assert len(rows) == 40
    acc = sum(1 for i, c in rows.items() if c == ("A" if i < 20 else "B")) / 40
    assert acc >= 0.95
    # probabilities are a 2-class simplex
    p = pred.select(F.aggregate("probability", F.lit(0.0), lambda a, x: a + x).alias("s"))
    assert all(abs(r["s"] - 1.0) < 1e-6 for r in p.collect())


def test_node_classification_split_deterministic(spark):
    from graph_data_science_spark.mlpipeline import NodeClassificationPipeline

    g = _two_community_graph(spark)
    pipe = NodeClassificationPipeline()
    pipe.select_features(["x"])
    m1 = pipe.train(spark, g, target_property="cls", validation_folds=2, seed=11)
    m2 = pipe.train(spark, g, target_property="cls", validation_folds=2, seed=11)
    assert m1.metrics["test"] == m2.metrics["test"]
    assert m1.classes == m2.classes == ["A", "B"]


def test_link_prediction_train_and_topn(spark):
    from graph_data_science_spark.mlpipeline import LinkPredictionPipeline

    # near-clique communities: almost every intra pair IS an edge, so
    # sampled negatives are (almost) all inter-community — the
    # hadamard(x) feature then separates positives from negatives
    n_per = 16
    pairs = [
        (base + i, base + j)
        for base in (0, n_per)
        for i in range(n_per)
        for j in range(i + 1, n_per)
        if (i * 31 + j) % 7 != 0  # keep a few intra NON-edges for topN
    ] + [(0, n_per)]
    edges = edge_df(spark, pairs)
    nodes = spark.createDataFrame(
        [
            (i, 1.0 + (i % 5) * 0.01 if i < n_per else -1.0 - (i % 5) * 0.01)
            for i in range(2 * n_per)
        ],
        "id long, x double",
    )
    g = Graph(name="cliques", edges=edges, nodes=nodes, directed=False)
    pipe = LinkPredictionPipeline()
    pipe.add_feature("hadamard", ["x"])
    pipe.add_feature("l2", ["x"])
    model = pipe.train(spark, g, test_fraction=0.3, seed=5)
    # hadamard(x) separates intra (+1) from inter (-1) pairs; the
    # intra NON-edges kept in the fixture land among the sampled
    # negatives with positive-identical features (ties), so perfect
    # AUCPR is impossible by construction — well-above-chance is the
    # correct bar (positive rate ~0.5)
    assert model.metrics["AUCPR"] >= 0.65
    assert model.metrics["test_positive"] > 0
    assert model.metrics["test_negative"] > 0

    top = model.predict_topn(spark, g, top_n=10, candidates="twohop")
    rows = top.collect()
    assert 0 < len(rows) <= 10
    # predictions are non-edges
    und = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    und |= {(d, s) for s, d in und}
    for r in rows:
        assert (r["src"], r["dst"]) not in und
        assert 0.0 <= r["probability"] <= 1.0
    # top suggestions should be intra-community (model learned that)
    intra = sum(1 for r in rows if (r["src"] < n_per) == (r["dst"] < n_per))
    assert intra >= len(rows) * 0.8


def test_link_prediction_rejects_unknown_combiner(spark):
    from graph_data_science_spark.mlpipeline import LinkPredictionPipeline

    pipe = LinkPredictionPipeline()
    with pytest.raises(ValueError, match="combiner"):
        pipe.add_feature("concat", ["x"])


def test_graphsage_shapes_and_determinism(spark):
    from graph_data_science_spark.algorithms.graphsage import (
        graphsage,
        graphsage_train,
    )

    g = _two_community_graph(spark)
    kwargs = dict(
        embedding_dim=8,
        sample_sizes=[5, 5],
        epochs=2,
        max_iterations=3,
        sample_nodes=40,
        feature_properties=["x"],
        seed=3,
    )
    out = graphsage(spark, g, **kwargs).collect()
    assert len(out) == 40
    for r in out:
        assert len(r["embedding"]) == 8
        norm = sum(v * v for v in r["embedding"]) ** 0.5
        assert all(abs(v) < 1e6 and v == v for v in r["embedding"])  # finite
        assert norm == pytest.approx(1.0, abs=1e-6) or norm == 0.0

    m1 = graphsage_train(spark, g, **kwargs)
    m2 = graphsage_train(spark, g, **kwargs)
    for a, b in zip(m1.weights, m2.weights):
        assert a == pytest.approx(b)


def test_graphsage_weighted_mean(spark):
    """relationship_weight=True: the neighbor mean weights by edge
    weight (self stays 1) — with a dominant-weight edge the embedding
    input shifts toward that neighbor's features, changing the output
    vs the unweighted run; with all weights 1 both modes agree."""
    from graph_data_science_spark.algorithms.graphsage import graphsage_train

    pairs = [(0, 1), (0, 2), (1, 2)]
    edges_w = spark.createDataFrame(
        [(0, 1, "REL", 100.0), (0, 2, "REL", 1.0), (1, 2, "REL", 1.0)],
        "src long, dst long, rel_type string, weight double",
    )
    nodes = spark.createDataFrame(
        [(0, 1.0), (1, 5.0), (2, -5.0)], "id long, x double"
    )
    kwargs = dict(
        embedding_dim=4, sample_sizes=[2], epochs=1, max_iterations=1,
        sample_nodes=3, feature_properties=["x"], seed=3,
    )
    g_w = Graph(name="wg", edges=edges_w, nodes=nodes, directed=False)
    m = graphsage_train(spark, g_w, relationship_weight=True, **kwargs)
    m_un = graphsage_train(spark, g_w, **kwargs)
    # same seed -> identical trained weights; only the inference
    # aggregation differs
    for a, b in zip(m.weights, m_un.weights):
        assert a == pytest.approx(b)
    ew = {r["id"]: r["embedding"] for r in m.predict(spark, g_w).collect()}
    eu = {r["id"]: r["embedding"] for r in m_un.predict(spark, g_w).collect()}
    assert ew[0] != pytest.approx(eu[0])  # hub mean dominated by w=100 edge
    # uniform weights reproduce the unweighted mean exactly
    edges_1 = edges_w.withColumn("weight", F.lit(1.0))
    g_1 = Graph(name="wg1", edges=edges_1, nodes=nodes, directed=False)
    m1 = graphsage_train(spark, g_1, relationship_weight=True, **kwargs)
    e1 = {r["id"]: r["embedding"] for r in m1.predict(spark, g_1).collect()}
    for i in e1:
        assert e1[i] == pytest.approx(eu[i], abs=1e-9)


def test_graphsage_community_structure(spark):
    """Embeddings of same-community nodes are closer than
    cross-community pairs on average — the unsupervised loss pulls
    neighbors together."""
    from graph_data_science_spark.algorithms.graphsage import graphsage

    g = _two_community_graph(spark)
    emb = {
        r["id"]: r["embedding"]
        for r in graphsage(
            spark,
            g,
            embedding_dim=8,
            sample_sizes=[5],
            epochs=3,
            max_iterations=5,
            sample_nodes=40,
            feature_properties=["x"],
            seed=3,
        ).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num  # embeddings are unit-norm

    intra = [cos(emb[i], emb[i + 1]) for i in range(0, 19)]
    inter = [cos(emb[i], emb[i + 20]) for i in range(0, 20)]
    assert sum(intra) / len(intra) > sum(inter) / len(inter)
