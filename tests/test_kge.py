"""KGE link scoring (TransE / DistMult) vs numpy reference."""

import math

import numpy as np

from graph_data_science_spark.pipeline.kge import kge_score, lcg_relation


def _nodes(spark):
    rows = [
        (0, [1.0, 0.0, 2.0]),
        (1, [0.5, -1.0, 1.0]),
        (2, [-2.0, 0.25, 0.0]),
    ]
    return spark.createDataFrame(rows, "id long, embedding array<double>"), {
        i: np.array(v) for i, v in rows
    }


def test_transe_matches_numpy(spark):
    nodes, vecs = _nodes(spark)
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    r = np.array(lcg_relation(3))
    got = {
        (x["src"], x["dst"]): x["score"]
        for x in kge_score(nodes, edges, model="transe").collect()
    }
    for (s, d), sc in got.items():
        want = -float(np.linalg.norm(vecs[s] + r - vecs[d]))
        assert math.isclose(sc, round(want, 6), abs_tol=2e-6), (s, d)


def test_distmult_matches_numpy(spark):
    nodes, vecs = _nodes(spark)
    edges = spark.createDataFrame([(0, 2), (2, 1)], "src long, dst long")
    r = np.array(lcg_relation(3))
    got = {
        (x["src"], x["dst"]): x["score"]
        for x in kge_score(nodes, edges, model="distmult").collect()
    }
    for (s, d), sc in got.items():
        want = float(np.sum(vecs[s] * r * vecs[d]))
        assert math.isclose(sc, round(want, 6), abs_tol=2e-6), (s, d)


def test_explicit_relation_vector(spark):
    nodes, vecs = _nodes(spark)
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    r = [0.0, 0.0, 0.0]
    got = kge_score(nodes, edges, relation=r, model="transe").collect()[0]
    want = -float(np.linalg.norm(vecs[0] - vecs[1]))
    assert math.isclose(got["score"], round(want, 6), abs_tol=2e-6)
