"""Hashed NB quality classifier and DSIR importance weights."""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.classify import (
    dsir_weights,
    hash_bucket,
    nb_classifier,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        # positives: "good clean prose" vocabulary
        (0, "good clean prose flows well", 1),
        (1, "clean prose reads well good", 1),
        (2, "well written good clean text", 1),
        # negatives: "spam buy click" vocabulary
        (3, "buy spam click buy spam", 0),
        (4, "click spam buy now spam", 0),
        # unlabeled, one from each vocabulary
        (5, "good clean prose well", None),
        (6, "spam click buy spam", None),
        (7, "", None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_nb_separates_and_scores_all_rows(corpus):
    out = nb_classifier(corpus, n_buckets=64).collect()
    got = {r.doc_id: r for r in out}
    assert len(got) == 8
    assert got[5].log_odds > 0 and got[5].pred == 1
    assert got[6].log_odds < 0 and got[6].pred == 0
    # empty doc scores exactly the prior ln(3/2)
    assert got[7].n_tokens == 0
    assert got[7].log_odds == pytest.approx(math.log(3 / 2), abs=1e-6)
    # training rows score consistently with their labels
    assert all(got[i].log_odds > 0 for i in (0, 1, 2))
    assert all(got[i].log_odds < 0 for i in (3, 4))


def test_nb_hand_value(spark):
    # 1 pos doc "a", 1 neg doc "b", B=4, alpha=1:
    # t_pos = t_neg = 1, priors equal -> prior term 0
    df = spark.createDataFrame(
        [(0, "a", 1), (1, "b", 0)], "doc_id long, text string, label int"
    )
    out = {r.doc_id: r for r in nb_classifier(df, n_buckets=4).collect()}
    ba = out[0]
    # score("a") = ln(2/5) - ln(1/5) = ln 2 (buckets of 'a' and 'b'
    # differ; verified below)
    b_a = spark.range(1).select(hash_bucket(F.lit("a"), 4)).first()[0]
    b_b = spark.range(1).select(hash_bucket(F.lit("b"), 4)).first()[0]
    assert b_a != b_b
    assert ba.log_odds == pytest.approx(math.log(2), abs=1e-6)


def test_nb_deterministic_across_partitions(corpus):
    a = sorted(map(tuple, nb_classifier(corpus, n_buckets=64).collect()))
    b = sorted(
        map(tuple, nb_classifier(corpus.repartition(7), n_buckets=64).collect())
    )
    assert a == b


def test_dsir_prefers_target_like_docs(spark):
    raw = spark.createDataFrame(
        [
            (0, "alpha beta gamma alpha beta"),
            (1, "omega psi chi omega psi"),
            (2, "alpha beta alpha beta gamma"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "beta gamma alpha")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dsir_weights(raw, target, n_buckets=128).collect()}
    assert len(out) == 4
    assert out[0].log_weight > out[1].log_weight
    assert out[2].log_weight > out[1].log_weight
    assert out[3].n_feats == 0 and out[3].log_weight == 0.0


def test_dsir_bigram_features_counted(spark):
    raw = spark.createDataFrame([(0, "x y z")], "doc_id long, text string")
    tgt = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    out = dsir_weights(raw, tgt, n_buckets=32).first()
    # 3 unigrams + 2 bigrams
    assert out.n_feats == 5
    uni_only = dsir_weights(raw, tgt, n_buckets=32, bigrams=False).first()
    assert uni_only.n_feats == 3
