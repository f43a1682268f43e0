"""PageRank-family parity tests vs the reference's golden fixtures.

The reference asserts its own output within SCORE_PRECISION = 1e-5 of
the fixture constants (PageRankTest.java:65) — the constants are
7-digit roundings of the true fixpoint. We assert the same 1e-5 vs
the constants AND 1e-6 vs an independent exact simulation of the
reference's delta-formulation (PageRankComputation.java:77-97).
"""

import numpy as np
import pytest

from graph_data_science_spark.algorithms.pagerank import (
    PageRankConfig,
    article_rank,
    eigenvector,
    pagerank,
)
from tests.conftest import PAGERANK_EDGES, PAGERANK_EXPECTED, edge_df


def _reference_sim(edges, n, max_iterations=41, tol=0.0, d=0.85):
    """Exact per-superstep simulation of PageRankComputation.java."""
    out = [[] for _ in range(n)]
    for s, t in edges:
        out[s].append(t)
    deg = [len(o) for o in out]
    rank = [1 - d] * n
    delta = [1 - d] * n
    for _ in range(1, max_iterations):
        msgs = [0.0] * n
        for v in range(n):
            if delta[v] > tol and deg[v] > 0:
                share = delta[v] / deg[v]
                for t in out[v]:
                    msgs[t] += share
        for v in range(n):
            delta[v] = d * msgs[v]
            rank[v] += delta[v]
    return rank


def _graph(spark, catalog, name="prg"):
    return catalog.create(name, edge_df(spark, PAGERANK_EDGES), persist=True)


def test_pagerank_fixture_parity(spark, catalog):
    g = _graph(spark, catalog)
    res = pagerank(spark, g, PageRankConfig(max_iterations=41, tolerance=0.0))
    got = {r["id"]: r["score"] for r in res.state.collect()}
    sim = _reference_sim(PAGERANK_EDGES, 11)
    assert set(got) == set(PAGERANK_EXPECTED)
    for v, expected in PAGERANK_EXPECTED.items():
        assert got[v] == pytest.approx(expected, abs=1e-5), f"node {v} vs fixture"
        assert got[v] == pytest.approx(sim[v], abs=1e-6), f"node {v} vs exact sim"


def test_pagerank_tolerance_iterations(spark, catalog):
    # PageRankTest.java:127-141 — tolerance 0.5 -> 2 iterations, 0.1 -> 13
    g = _graph(spark, catalog)
    res = pagerank(spark, g, PageRankConfig(max_iterations=40, tolerance=0.5))
    assert res.ran_iterations == 2
    res = pagerank(spark, g, PageRankConfig(max_iterations=40, tolerance=0.1))
    assert res.ran_iterations == 13


def test_pagerank_personalized(spark, catalog):
    # sources {a, e}: expectedPersonalizedRank1, PageRankTest.java:75-85
    expected = {
        0: 0.17053529152163158, 1: 0.3216114449911402, 2: 0.27329311398643763,
        3: 0.048318333106500536, 4: 0.17053529152163158, 5: 0.048318333106500536,
        6: 0.0, 7: 0.0, 8: 0.0, 9: 0.0, 10: 0.0,
    }
    g = _graph(spark, catalog)
    res = pagerank(
        spark, g, PageRankConfig(max_iterations=41, tolerance=0.0, source_nodes=[0, 4])
    )
    got = {r["id"]: r["score"] for r in res.state.collect()}
    for v, e in expected.items():
        assert got[v] == pytest.approx(e, abs=1e-5), f"node {v}"


def test_article_rank_runs_and_orders_like_pagerank(spark, catalog):
    g = _graph(spark, catalog)
    res = article_rank(spark, g, PageRankConfig(max_iterations=20, tolerance=1e-7))
    got = {r["id"]: r["score"] for r in res.state.collect()}
    # b is the dominant sink in the fixture; dangling nodes stay at alpha
    assert got[1] == max(got.values())
    assert got[6] == pytest.approx(0.15, abs=1e-12)


def test_eigenvector_l2_normalized(spark, catalog):
    g = _graph(spark, catalog)
    res = eigenvector(spark, g, PageRankConfig(max_iterations=40, tolerance=1e-7))
    scores = np.array([r["score"] for r in res.state.collect()])
    assert np.sqrt((scores**2).sum()) == pytest.approx(1.0, abs=1e-6)
    got = {r["id"]: r["score"] for r in res.state.collect()}
    assert got[1] == max(got.values())  # b dominates


def test_pagerank_parallelism_invariance(spark, catalog):
    """Same result at different shuffle parallelism (WccTest concurrency sweep analog)."""
    g = _graph(spark, catalog)
    res1 = pagerank(spark, g, PageRankConfig(max_iterations=21, tolerance=0.0))
    r1 = {r["id"]: r["score"] for r in res1.state.collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try:
        g2 = catalog.create("prg13", edge_df(spark, PAGERANK_EDGES))
        res2 = pagerank(spark, g2, PageRankConfig(max_iterations=21, tolerance=0.0))
        r2 = {r["id"]: r["score"] for r in res2.state.collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for v in r1:
        assert r1[v] == pytest.approx(r2[v], abs=1e-12)


def test_pagerank_scaler_variants(spark, catalog):
    # PageRankAlgorithm.scaleScores (PageRankAlgorithm.java:77-95):
    # scaler applies to the final scores; NONE is identity; L2NORM on
    # eigenvector is a no-op (already normalized)
    import math

    from graph_data_science_spark.algorithms.pagerank import eigenvector

    g = _graph(spark, catalog, name="prg_scaled")
    base = {
        r["id"]: r["score"]
        for r in pagerank(
            spark, g, PageRankConfig(max_iterations=10, tolerance=0.0)
        ).state.collect()
    }
    l2 = {
        r["id"]: r["score"]
        for r in pagerank(
            spark, g, PageRankConfig(max_iterations=10, tolerance=0.0, scaler="L2NORM")
        ).state.collect()
    }
    norm = math.sqrt(sum(v * v for v in base.values()))
    for k in base:
        assert l2[k] == pytest.approx(base[k] / norm, rel=1e-9)
    assert sum(v * v for v in l2.values()) == pytest.approx(1.0, rel=1e-9)

    mm = {
        r["id"]: r["score"]
        for r in pagerank(
            spark, g, PageRankConfig(max_iterations=10, tolerance=0.0, scaler="MINMAX")
        ).state.collect()
    }
    assert min(mm.values()) == pytest.approx(0.0, abs=1e-12)
    assert max(mm.values()) == pytest.approx(1.0, abs=1e-12)

    # eigenvector + L2NORM: no-op (scores already unit-L2)
    ev = {
        r["id"]: r["score"]
        for r in eigenvector(
            spark, g, PageRankConfig(max_iterations=5, tolerance=0.0, scaler="L2NORM")
        ).state.collect()
    }
    assert sum(v * v for v in ev.values()) == pytest.approx(1.0, rel=1e-6)

    with pytest.raises(ValueError, match="scaler"):
        PageRankConfig(scaler="NOPE")


def _katz_sim(edges, n, iters, alpha=0.5, beta=1.0):
    """Exact numpy simulation of x_{t+1} = beta + alpha * A^T x_t."""
    x = np.full(n, beta)
    for _ in range(iters):
        nxt = np.full(n, beta)
        for s, t in edges:
            nxt[t] += alpha * x[s]
        x = nxt
    return x


def test_katz_fixture_parity(spark, catalog):
    from graph_data_science_spark.algorithms.pagerank import KatzConfig, katz

    g = _graph(spark, catalog, "katzg")
    res = katz(spark, g, KatzConfig(alpha=0.5, tolerance=0.0, max_iterations=8))
    got = {r["id"]: r["score"] for r in res.state.collect()}
    sim = _katz_sim(PAGERANK_EDGES, 11, 8)
    assert set(got) == set(range(11))
    for v in range(11):
        assert got[v] == pytest.approx(sim[v], abs=1e-9), f"node {v}"


def test_katz_converges_with_tolerance(spark, catalog):
    from graph_data_science_spark.algorithms.pagerank import KatzConfig, katz

    g = _graph(spark, catalog, "katzg2")
    # alpha=0.2 < 1/lambda_max on this graph; the geometric tail means
    # per-vertex movement shrinks every round -> tolerance stop fires.
    res = katz(spark, g, KatzConfig(alpha=0.2, tolerance=1e-6, max_iterations=60))
    assert res.ran_iterations < 60
    got = {r["id"]: r["score"] for r in res.state.collect()}
    sim = _katz_sim(PAGERANK_EDGES, 11, 200, alpha=0.2)
    for v in range(11):
        assert got[v] == pytest.approx(sim[v], abs=1e-4), f"node {v}"


def test_katz_alpha_validation():
    from graph_data_science_spark.algorithms.pagerank import KatzConfig

    with pytest.raises(ValueError):
        KatzConfig(alpha=1.5)
    with pytest.raises(ValueError):
        KatzConfig(alpha=0.5, max_iterations=0)
