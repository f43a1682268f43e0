"""Degree assortativity and hard-negative mining."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.graph_ops import assortativity
from graph_data_science_spark.pipeline.ann import hard_negatives
from tests.conftest import edge_df


def test_assortativity_star_is_negative_one(spark):
    # star K1,4: every edge joins deg-4 hub to deg-1 leaf -> r = -1
    e = edge_df(spark, [(0, i) for i in range(1, 5)])
    r = assortativity(e).first()
    assert r.n_edges == 4
    assert r.r == pytest.approx(-1.0, abs=1e-6)


def test_assortativity_regular_graph_null(spark):
    # 4-cycle: all degrees 2 -> zero variance -> NULL r
    e = edge_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    r = assortativity(e).first()
    assert r.n_edges == 4 and r.r is None


def test_assortativity_matches_networkx_formula(spark):
    # path 0-1-2-3 plus chord 1-3: hand-check vs the Pearson-over-
    # endpoint-degrees definition
    pairs = [(0, 1), (1, 2), (2, 3), (1, 3)]
    e = edge_df(spark, pairs)
    deg = {0: 1, 1: 3, 2: 2, 3: 2}
    js, ks = [], []
    for a, b in pairs:
        js += [deg[a], deg[b]]
        ks += [deg[b], deg[a]]
    m = len(js)
    sj, sjk, sjj = sum(js), sum(j * k for j, k in zip(js, ks)), sum(
        j * j for j in js
    )
    expect = (m * sjk - sj * sj) / (m * sjj - sj * sj)
    got = assortativity(e).first().r
    assert got == pytest.approx(expect, abs=1e-6)


def test_assortativity_ignores_self_loops(spark):
    e = edge_df(spark, [(0, 0), (0, 1), (0, 2), (0, 3), (0, 4)])
    r = assortativity(e).first()
    assert r.n_edges == 4 and r.r == pytest.approx(-1.0, abs=1e-6)


@pytest.fixture()
def labeled_vecs(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, [0.8, 0.2], 1),  # close to label-0 cluster -> hard negative
        (3, [0.0, 1.0], 1),
        (4, [0.1, 0.9], 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_hard_negatives_excludes_same_label(labeled_vecs):
    out = hard_negatives(labeled_vecs, k=2).collect()
    for r in out:
        assert r.query_label != r.neighbor_label
    got = {r.query_id: [] for r in out}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        got[r.query_id].append(r.neighbor_id)
    # vec 0's hardest negative is vec 2 (cosine 0.97), not vec 3/4
    assert got[0][0] == 2
    # every query has at most k=2 rows, all ranked 1..k
    assert all(len(v) <= 2 for v in got.values())


def test_hard_negatives_all_same_label_empty(spark):
    df = spark.createDataFrame(
        [(0, [1.0], 7), (1, [0.5], 7)],
        "vec_id long, embedding array<double>, label int",
    )
    assert hard_negatives(df, k=3).count() == 0
