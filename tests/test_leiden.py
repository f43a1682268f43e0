"""Leiden fixture tests — quality vs Louvain, refinement invariants.

Leiden (Traag et al. 2019) is beyond the reference's 2.0-era suite
(it ships Louvain only, algo/.../louvain/Louvain.java); these tests
pin the three Leiden-specific guarantees on top of louvain's fixture
expectations: refined subcommunities (a) partition each phase-1
community, (b) are internally connected, and (c) the final quality
is never below the deterministic Louvain run on the same fixture.
"""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.leiden import (
    LeidenConfig,
    LeidenResult,
    _refine,
    leiden,
)
from graph_data_science_spark.algorithms.louvain import louvain
from graph_data_science_spark.catalog import Graph

from tests.conftest import edge_df


def _graph(spark, pairs, weights=None, name="gl"):
    return Graph(name=name, edges=edge_df(spark, pairs, weights))


def _clique(nodes):
    return [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]


def test_leiden_two_cliques(spark):
    pairs = _clique([0, 1, 2, 3]) + _clique([4, 5, 6, 7]) + [(3, 4)]
    g = _graph(spark, pairs)
    res = leiden(spark, g)
    comms = {r["id"]: r["community"] for r in res.communities.collect()}
    assert len({comms[i] for i in (0, 1, 2, 3)}) == 1
    assert len({comms[i] for i in (4, 5, 6, 7)}) == 1
    assert comms[0] != comms[4]
    # same closed-form as the louvain fixture: Q = 12/13 - 1/2
    assert res.modularity == pytest.approx(12 / 13 - 0.5, abs=1e-9)


def test_leiden_ring_of_cliques(spark):
    cliques = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    pairs = []
    for c in cliques:
        pairs += _clique(c)
    pairs += [(2, 3), (5, 6), (8, 9), (11, 0)]
    g = _graph(spark, pairs)
    res = leiden(spark, g)
    comms = {r["id"]: r["community"] for r in res.communities.collect()}
    for c in cliques:
        assert len({comms[i] for i in c}) == 1, comms
    assert len({comms[c[0]] for c in cliques}) == 4
    assert res.modularity == pytest.approx(0.5, abs=1e-9)


def test_leiden_not_below_louvain(spark):
    # weighted barbell with a noisy middle — both must find Q >= the
    # deterministic Louvain result (Leiden's refinement can only
    # change WHERE contraction happens, never accept a worse level)
    pairs = (
        _clique([0, 1, 2, 3, 4])
        + _clique([5, 6, 7, 8, 9])
        + [(4, 5), (0, 9), (2, 7)]
    )
    g = _graph(spark, pairs)
    q_louvain = louvain(spark, g).modularity
    q_leiden = leiden(spark, g).modularity
    assert q_leiden >= q_louvain - 1e-9


def test_leiden_determinism(spark):
    pairs = _clique([0, 1, 2, 3]) + _clique([10, 11, 12, 13]) + [(3, 10), (0, 13)]
    g = _graph(spark, pairs)
    a = {
        (r["id"], r["community"])
        for r in leiden(spark, g).communities.collect()
    }
    b = {
        (r["id"], r["community"])
        for r in leiden(spark, g).communities.collect()
    }
    assert a == b


def test_leiden_consecutive_ids_and_gamma_validation(spark):
    pairs = _clique([20, 21, 22]) + _clique([30, 31, 32]) + [(22, 30)]
    g = _graph(spark, pairs)
    res = leiden(spark, g, LeidenConfig(consecutive_ids=True))
    comms = {r["id"]: r["community"] for r in res.communities.collect()}
    assert sorted(set(comms.values())) == [0, 1]
    with pytest.raises(ValueError):
        LeidenConfig(gamma=0.0)
    with pytest.raises(ValueError):
        LeidenConfig(max_levels=0)


def test_refine_keeps_subs_inside_communities_and_connected(spark):
    # two disjoint triangles forced into ONE phase-1 community: the
    # refinement must not bridge them — every subcommunity stays
    # within one triangle (= internally connected here, since any
    # cross-triangle sub would contain unreachable vertices)
    pairs = _clique([0, 1, 2]) + _clique([3, 4, 5])
    e = edge_df(spark, pairs)
    und = e.selectExpr("src", "dst", "weight as w").unionByName(
        e.selectExpr("dst as src", "src as dst", "weight as w")
    )
    comm = spark.createDataFrame(
        [(i, 99) for i in range(6)], "id long, community long"
    )
    m2 = und.agg(F.sum("w")).collect()[0][0]
    refined = _refine(und, comm, float(m2), gamma=1.0, max_rounds=10)
    rows = refined.collect()
    assert {r["community"] for r in rows} == {99}
    sub_members = {}
    for r in rows:
        sub_members.setdefault(r["sub"], set()).add(r["id"])
    left, right = {0, 1, 2}, {3, 4, 5}
    for members in sub_members.values():
        assert members <= left or members <= right, sub_members


def test_leiden_empty_graph(spark):
    g = Graph(
        name="gl_empty",
        edges=spark.createDataFrame(
            [], "src long, dst long, rel_type string, weight double"
        ),
    )
    res = leiden(spark, g)
    assert isinstance(res, LeidenResult)
    assert res.modularity == 0.0


def test_leiden_theta_refinement_quality(spark):
    """theta > 0 enables Traag's randomized well-connected merge;
    with the pinned seed it must reach at least the deterministic
    mode's quality on the fixture graphs (the paper's claim is that
    randomized refinement explores partitions greedy merging misses,
    never that it degrades a converged fixture)."""
    for pairs in (
        _clique([0, 1, 2, 3]) + _clique([4, 5, 6, 7]) + [(3, 4)],
        _clique([0, 1, 2])
        + _clique([3, 4, 5])
        + _clique([6, 7, 8])
        + [(2, 3), (5, 6), (8, 0)],
    ):
        g = _graph(spark, pairs, name=f"gl_theta_{len(pairs)}")
        q_det = leiden(spark, g).modularity
        q_theta = leiden(
            spark, g, LeidenConfig(theta=0.05, seed=11)
        ).modularity
        assert q_theta >= q_det - 1e-9
        # same seed -> same result (hash draws, no RNG state)
        q_again = leiden(
            spark, g, LeidenConfig(theta=0.05, seed=11)
        ).modularity
        assert q_again == pytest.approx(q_theta, abs=1e-12)


def test_leiden_theta_validation(spark):
    with pytest.raises(ValueError, match="theta"):
        LeidenConfig(theta=-0.1)
