"""CNARW sampling (gds.graph.sample.cnarw analog): common-neighbor
weight table correctness + sampler invariants/determinism."""

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.graphsample import (
    common_neighbor_weights,
    sample_cnarw,
    sample_rwr,
)
from tests.conftest import edge_df


def test_weight_table_hand_values(spark, catalog):
    # triangle 0-1-2 plus pendant 3 on 2:
    #   (0,1): CN={2}, min deg 2 -> w = 1 - 1/2 = 0.5
    #   (0,2): CN={1}, min(2,3)=2 -> 0.5
    #   (2,3): CN={}, min(3,1)=1 -> 1.0
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = catalog.create("cw1", edge_df(spark, pairs))
    w = {
        (r["src"], r["dst"]): r["w"]
        for r in common_neighbor_weights(spark, g).collect()
    }
    assert w[(0, 1)] == 0.5 and w[(1, 0)] == 0.5
    assert w[(0, 2)] == 0.5 and w[(2, 0)] == 0.5
    assert w[(2, 3)] == 1.0 and w[(3, 2)] == 1.0
    # both directions of every undirected edge carry a weight
    assert len(w) == 8


def test_weight_floor_applies(spark, catalog):
    # K4: every edge has CN = 2, min deg 3 -> 1 - 2/3 = 1/3 (> floor)
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = catalog.create("cw2", edge_df(spark, pairs))
    w = common_neighbor_weights(spark, g, floor=0.4)
    vals = {r["w"] for r in w.collect()}
    assert vals == {0.4}  # 1/3 clipped up to the floor


def test_cnarw_sampler_invariants_and_determinism(spark, catalog):
    pairs = [(i, (i + 1) % 20) for i in range(20)] + [
        (i, (i + 5) % 20) for i in range(20)
    ]
    g = catalog.create("cw3", edge_df(spark, pairs))
    r1 = sample_cnarw(spark, g, sampling_ratio=0.4, seed=7)
    r2 = sample_cnarw(spark, g, sampling_ratio=0.4, seed=7)
    s1 = sorted(r["id"] for r in r1.graph.vertices().collect())
    s2 = sorted(r["id"] for r in r2.graph.vertices().collect())
    assert s1 == s2
    target, walkers = r1.stats["target"], r1.stats["walkers"]
    assert target <= r1.n_nodes < target + walkers
    # induced edges: both endpoints sampled, subset of original
    se = r1.graph.edges.select("src", "dst")
    oe = g.edges.select("src", "dst")
    assert se.join(oe, ["src", "dst"], "left_anti").count() == 0


def test_unweighted_rwr_unchanged_by_generalization(spark, catalog):
    # w=None path must keep byte-identical picks (regression guard)
    pairs = [(i, (i + 1) % 12) for i in range(12)]
    g = catalog.create("cw4", edge_df(spark, pairs))
    a = sample_rwr(spark, g, sampling_ratio=0.5, seed=3)
    b = sample_rwr(spark, g, sampling_ratio=0.5, seed=3)
    assert sorted(r["id"] for r in a.graph.vertices().collect()) == sorted(
        r["id"] for r in b.graph.vertices().collect()
    )
