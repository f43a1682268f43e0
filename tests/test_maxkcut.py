"""Approx Max-k-Cut (ApproxMaxKCut.java analog) — deterministic
parity-block local search."""

import pytest

from graph_data_science_spark.algorithms.maxkcut import approx_max_k_cut
from tests.conftest import edge_df


def test_k33_reaches_optimal_bipartition(spark, catalog):
    g = catalog.create(
        "mkc_k33", edge_df(spark, [(a, b) for a in (0, 1, 2) for b in (10, 11, 12)])
    )
    r = approx_max_k_cut(spark, g, k=2, max_iterations=6)
    assert r.cut_weight == 9.0  # all 9 edges cut
    comm = {x["id"]: x["community"] for x in r.assignments.collect()}
    assert len({comm[i] for i in (0, 1, 2)}) == 1
    assert comm[0] != comm[10]


def test_two_triangles_k3_optimal(spark, catalog):
    g = catalog.create(
        "mkc_tri", edge_df(spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])
    )
    r = approx_max_k_cut(spark, g, k=3, max_iterations=6)
    assert r.cut_weight == 6.0  # 3 colors cut every triangle edge


def test_cut_never_degrades_and_is_deterministic(spark, catalog):
    g = catalog.create("mkc_p4", edge_df(spark, [(0, 1), (1, 2), (2, 3)]))
    a = approx_max_k_cut(spark, g, k=2, max_iterations=6)
    assert a.cut_weight >= a.init_cut_weight
    b = approx_max_k_cut(spark, g, k=2, max_iterations=6)
    assert a.cut_weight == b.cut_weight
    assert {tuple(r) for r in a.assignments.collect()} == {
        tuple(r) for r in b.assignments.collect()
    }
    with pytest.raises(ValueError, match="k must be"):
        approx_max_k_cut(spark, g, k=1)
