"""Maximum spanning forest / kmax-kmin (KSpanningTreeProc.java kmax/
kmin, Prim.java MAX_OPERATOR) and plain greedy influence maximization
(Greedy.java analog)."""

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.celf import celf, greedy
from graph_data_science_spark.algorithms.spanning import (
    k_spanning_tree,
    maximum_spanning_forest,
    minimum_spanning_forest,
    spanning_forest,
)
from tests.conftest import edge_df


def _forest_set(df):
    return {(r["src"], r["dst"], r["weight"]) for r in df.collect()}


def test_maximum_forest_picks_heavy_edges(spark, catalog):
    # square with one diagonal: max tree keeps the heavy edges
    edges = edge_df(
        spark,
        [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)],
        weights=[1.0, 9.0, 8.0, 2.0, 7.0],
    )
    g = catalog.create("maxsp", edges)
    fmax = _forest_set(maximum_spanning_forest(spark, g))
    assert fmax == {(1, 2, 9.0), (2, 3, 8.0), (0, 2, 7.0)}
    fmin = _forest_set(minimum_spanning_forest(spark, g))
    assert fmin == {(0, 1, 1.0), (0, 3, 2.0), (0, 2, 7.0)}


def test_max_forest_equals_min_forest_on_negated_weights(spark, catalog):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 6)]
    w = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.0]
    g = catalog.create("negsp", edge_df(spark, pairs, weights=w))
    gneg = catalog.create(
        "negsp2",
        edge_df(spark, pairs, weights=[-x for x in w]),
    )
    fmax = {(s, d) for s, d, _ in _forest_set(maximum_spanning_forest(spark, g))}
    fneg = {(s, d) for s, d, _ in _forest_set(minimum_spanning_forest(spark, gneg))}
    assert fmax == fneg


def test_kmax_cuts_lightest_tree_edge(spark, catalog):
    # chain 0-1-2-3 with weights 5,1,5: kmax(k=2) builds the max tree
    # (the whole chain) and cuts the LIGHTEST tree edge (1-2), giving
    # components {0,1} and {2,3}; kmin cuts a heaviest edge instead.
    edges = edge_df(spark, [(0, 1), (1, 2), (2, 3)], weights=[5.0, 1.0, 5.0])
    g = catalog.create("kmaxsp", edges)
    part = {
        r["id"]: r["component"]
        for r in k_spanning_tree(spark, g, k=2, objective="maximum").collect()
    }
    assert part[0] == part[1] and part[2] == part[3] and part[0] != part[2]
    pmin = {
        r["id"]: r["component"]
        for r in k_spanning_tree(spark, g, k=2, objective="minimum").collect()
    }
    # kmin cuts one of the two weight-5 edges (tie-break: 0-1 first)
    assert pmin[1] == pmin[2] == pmin[3] and pmin[0] != pmin[1]


def test_spanning_forest_rejects_bad_objective(spark, catalog):
    g = catalog.create("badobj", edge_df(spark, [(0, 1)]))
    try:
        spanning_forest(spark, g, objective="median")
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_greedy_matches_celf_on_fixture(spark, catalog):
    # identical Monte-Carlo worlds (same seed/hash) -> same greedy
    # argmax sequence; CELF is a lazy evaluation of the same argmax
    pairs = [(0, i) for i in range(1, 11)] + [(20, 21), (21, 22)]
    g = catalog.create("greedy_star", edge_df(spark, pairs))
    kw = dict(k=3, propagation_probability=0.5, monte_carlo_sims=8)
    gres = greedy(spark, g, **kw)
    cres = celf(spark, g, **kw)
    assert [v for v, _ in gres] == [v for v, _ in cres]
    for (_, gs), (_, cs) in zip(gres, cres):
        assert abs(gs - cs) < 1e-6


def test_greedy_p1_spread_is_full_reach(spark, catalog):
    g = catalog.create("greedy_chain", edge_df(spark, [(0, 1), (1, 2), (2, 3)]))
    res = greedy(spark, g, k=1, propagation_probability=1.0, monte_carlo_sims=3)
    assert res == [(0, 4.0)]
