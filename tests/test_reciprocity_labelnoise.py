"""Reciprocity graph stat and kNN label-agreement screen."""

import pytest

from graph_data_science_spark.graph_ops import reciprocity
from graph_data_science_spark.pipeline.ann import knn_label_agreement
from tests.conftest import edge_df


def test_reciprocity_values(spark):
    # 0->1 and 1->0 reciprocal; 1->2 not; self-loop ignored;
    # duplicate 0->1 deduped
    e = edge_df(spark, [(0, 1), (1, 0), (1, 2), (2, 2), (0, 1)])
    r = reciprocity(e).first()
    assert (r.n_edges, r.n_reciprocal) == (3, 2)
    assert r.r == pytest.approx(2 / 3, abs=1e-6)


def test_reciprocity_feed_forward_zero(spark):
    e = edge_df(spark, [(0, 1), (1, 2), (2, 3)])
    r = reciprocity(e).first()
    assert r.n_reciprocal == 0 and r.r == 0.0


def test_reciprocity_empty(spark):
    e = edge_df(spark, [(0, 0)])
    r = reciprocity(e).first()
    assert r.n_edges == 0 and r.r is None


@pytest.fixture()
def clustered(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.95, 0.05], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.05, 0.95], 1),
        (5, [0.92, 0.08], 1),  # mislabeled: sits in cluster 0
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_label_agreement_flags_mislabeled(clustered):
    out = {r.vec_id: r for r in knn_label_agreement(clustered, k=2).collect()}
    assert len(out) == 6
    # the mislabeled point's 2 nearest neighbors are label-0
    assert out[5].agreement == 0.0
    # core cluster-0 points agree (nearest 2 of {0,1,2,5-labeled-1})
    assert out[0].agreement >= 0.5
    assert out[3].k_used == 2


def test_label_agreement_k_capped(spark):
    df = spark.createDataFrame(
        [(0, [1.0], 0), (1, [0.9], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    r = {x.vec_id: x for x in knn_label_agreement(df, k=5).collect()}
    assert r[0].k_used == 1 and r[0].agreement == 1.0
