"""RWR graph sampling tests (gds.graph.sample.rwr analog)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.graphsample import sample_rwr
from graph_data_science_spark.catalog import Graph

from tests.conftest import edge_df


def _ring(spark, n=40, name="gs"):
    pairs = [(i, (i + 1) % n) for i in range(n)]
    return Graph(name=name, edges=edge_df(spark, pairs))


def test_rwr_sample_size_and_induced_edges(spark):
    g = _ring(spark, 40)
    res = sample_rwr(spark, g, sampling_ratio=0.5, walkers=4, seed=7)
    # target 20, overshoot bounded by the walker pool
    assert 20 <= res.n_nodes < 20 + 4
    sampled = {r["id"] for r in res.graph.vertices().collect()}
    assert len(sampled) == res.n_nodes
    got_edges = {(r["src"], r["dst"]) for r in res.graph.edges.collect()}
    # induced: exactly the original edges with both endpoints sampled
    expect = {
        (i, (i + 1) % 40)
        for i in range(40)
        if i in sampled and (i + 1) % 40 in sampled
    }
    assert got_edges == expect
    assert res.n_edges == len(expect)


def test_rwr_sample_deterministic(spark):
    g = _ring(spark, 30)
    a = {r["id"] for r in sample_rwr(spark, g, 0.4, seed=3).graph.vertices().collect()}
    b = {r["id"] for r in sample_rwr(spark, g, 0.4, seed=3).graph.vertices().collect()}
    assert a == b
    c = {r["id"] for r in sample_rwr(spark, g, 0.4, seed=4).graph.vertices().collect()}
    # a different seed starts different walkers on this sparse ring
    assert a != c


def test_rwr_stays_in_component(spark):
    # two disjoint triangles; walkers start only in the first
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    g = Graph(name="gs2", edges=edge_df(spark, pairs))
    starts = spark.createDataFrame([(0,)], "id long")
    res = sample_rwr(
        spark, g, sampling_ratio=0.5, start_nodes=starts, walkers=1, seed=1
    )
    sampled = {r["id"] for r in res.graph.vertices().collect()}
    assert sampled <= {0, 1, 2}


def test_rwr_validation(spark):
    g = _ring(spark, 10)
    with pytest.raises(ValueError):
        sample_rwr(spark, g, sampling_ratio=0.0)
    with pytest.raises(ValueError):
        sample_rwr(spark, g, restart_probability=1.0)


def test_rwr_full_ratio_covers_reachable(spark):
    g = _ring(spark, 12)  # one strongly-connected ring
    res = sample_rwr(spark, g, sampling_ratio=1.0, walkers=3, seed=5, max_rounds=200)
    assert res.n_nodes == 12
