"""Exact Mann-Whitney AUC and threshold classification report."""

import pytest

from graph_data_science_spark.pipeline.evaluate import (
    binary_auc,
    classification_report,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "score double, label int")


def test_auc_perfect_and_inverted(spark):
    perfect = _df(spark, [(1.0, 1), (2.0, 1), (-1.0, 0), (-2.0, 0)])
    r = binary_auc(perfect).first()
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)
    inverted = _df(spark, [(-1.0, 1), (-2.0, 1), (1.0, 0), (2.0, 0)])
    assert binary_auc(inverted).first().auc == 0.0


def test_auc_with_ties_matches_hand_value(spark):
    # scores: pos {3, 2, 2}, neg {2, 1}; ranks asc: 1:(1), 2:(2,3,4), 3:(5)
    # avg rank of the 2-group = 3; R_pos = 3 + 3 + 5 = 11
    # AUC = (11 - 3*4/2) / (3*2) = 5/6
    df = _df(spark, [(3.0, 1), (2.0, 1), (2.0, 1), (2.0, 0), (1.0, 0)])
    r = binary_auc(df).first()
    assert r.auc == pytest.approx(5 / 6, abs=1e-6)


def test_auc_random_matches_sklearn_formula(spark):
    import random

    rng = random.Random(7)
    rows = [(round(rng.uniform(0, 1), 2), rng.randint(0, 1)) for _ in range(200)]
    # pure-python average-rank Mann-Whitney
    srt = sorted(range(len(rows)), key=lambda i: rows[i][0])
    ranks = [0.0] * len(rows)
    i = 0
    while i < len(srt):
        j = i
        while j < len(srt) and rows[srt[j]][0] == rows[srt[i]][0]:
            j += 1
        avg = (i + 1 + j) / 2
        for k in range(i, j):
            ranks[srt[k]] = avg
        i = j
    n_pos = sum(y for _, y in rows)
    n_neg = len(rows) - n_pos
    rpos = sum(r for r, (_, y) in zip(ranks, rows) if y == 1)
    expect = (rpos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    got = binary_auc(_df(spark, rows)).first().auc
    assert got == pytest.approx(expect, abs=1e-6)


def test_auc_degenerate_single_class(spark):
    r = binary_auc(_df(spark, [(1.0, 1), (2.0, 1)])).first()
    assert r.auc is None and r.n_neg == 0


def test_classification_report(spark):
    df = _df(spark, [(1.0, 1), (2.0, 1), (-1.0, 1), (3.0, 0), (-2.0, 0)])
    r = classification_report(df, threshold=0.0).first()
    assert (r.tp, r.fp, r.tn, r.fn) == (2, 1, 1, 1)
    assert r.precision == pytest.approx(2 / 3, abs=1e-6)
    assert r.recall == pytest.approx(2 / 3, abs=1e-6)
    assert r.f1 == pytest.approx(2 / 3, abs=1e-6)
    assert r.accuracy == pytest.approx(3 / 5, abs=1e-6)


def test_report_all_negative_predictions(spark):
    df = _df(spark, [(-1.0, 1), (-2.0, 0)])
    r = classification_report(df).first()
    assert (r.tp, r.fp, r.tn, r.fn) == (0, 0, 1, 1)
    assert r.precision is None
    assert r.recall == 0.0
