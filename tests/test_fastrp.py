"""FastRP determinism + semantics tests."""

import numpy as np
import pytest

from graph_data_science_spark.algorithms.fastrp import fastrp
from graph_data_science_spark.catalog import Graph
from tests.conftest import edge_df


def test_fastrp_shape_and_determinism(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    g = Graph(name="frp", edges=edge_df(spark, pairs))
    a = {r["id"]: r["embedding"] for r in fastrp(spark, g, embedding_dim=16).collect()}
    b = {r["id"]: r["embedding"] for r in fastrp(spark, g, embedding_dim=16).collect()}
    assert set(a) == {0, 1, 2, 3}
    for i in a:
        assert len(a[i]) == 16
        assert a[i] == b[i]  # bit-identical across runs
    # not all-zero
    assert any(abs(x) > 0 for x in a[0])


def test_fastrp_identical_neighborhoods_identical_embeddings(spark):
    # 10 and 11 both point only at {1, 2}; with iterationWeights [0,1]
    # the embedding is purely the neighbor mean -> identical vectors
    pairs = [(10, 1), (10, 2), (11, 1), (11, 2)]
    g = Graph(name="frp2", edges=edge_df(spark, pairs))
    emb = {
        r["id"]: np.array(r["embedding"])
        for r in fastrp(
            spark, g, embedding_dim=32, iteration_weights=[0.0, 1.0]
        ).collect()
    }
    assert np.allclose(emb[10], emb[11])
    # embeddings are L2-normalized per iteration -> unit norm
    assert np.linalg.norm(emb[10]) == pytest.approx(1.0, abs=1e-5)


def test_fastrp_seed_changes_embeddings(spark):
    pairs = [(0, 1), (1, 0)]
    g = Graph(name="frp3", edges=edge_df(spark, pairs))
    a = {r["id"]: r["embedding"] for r in fastrp(spark, g, 16, seed=1).collect()}
    b = {r["id"]: r["embedding"] for r in fastrp(spark, g, 16, seed=2).collect()}
    assert a[0] != b[0]
