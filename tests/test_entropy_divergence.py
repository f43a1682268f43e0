"""Character entropy and corpus JS-divergence."""

import math

import pytest

from graph_data_science_spark.pipeline.text import char_entropy, corpus_divergence


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_entropy_values(spark):
    df = _docs(
        spark,
        [
            (0, "aaaa"),          # H = 0
            (1, "abab"),          # H = ln 2
            (2, "abcd"),          # H = ln 4
            (3, ""),              # empty -> 0
        ],
    )
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert got[0].entropy == pytest.approx(0.0)
    assert got[0].n_chars == 4 and got[0].n_distinct_chars == 1
    assert got[1].entropy == pytest.approx(math.log(2), abs=1e-6)
    assert got[2].entropy == pytest.approx(math.log(4), abs=1e-6)
    assert got[3].n_chars == 0 and got[3].entropy == 0.0


def test_char_entropy_deterministic(spark):
    rows = [(i, "the quick brown fox " * (i % 5 + 1)) for i in range(40)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, char_entropy(df).collect()))
    b = sorted(map(tuple, char_entropy(df.repartition(13)).collect()))
    assert a == b


def test_divergence_identical_zero(spark):
    a = _docs(spark, [(0, "x y z x"), (1, "y z")])
    r = corpus_divergence(a, a).first()
    assert r.jsd == pytest.approx(0.0, abs=1e-6)
    assert r.n_tokens_a == r.n_tokens_b == 6


def test_divergence_disjoint_ln2(spark):
    a = _docs(spark, [(0, "aa bb cc")])
    b = _docs(spark, [(1, "dd ee ff")])
    r = corpus_divergence(a, b).first()
    assert r.jsd == pytest.approx(math.log(2), abs=1e-6)
    assert r.vocab_union == 6


def test_divergence_hand_value(spark):
    # P: {x: 1.0}; Q: {x: .5, y: .5}
    a = _docs(spark, [(0, "x x")])
    b = _docs(spark, [(1, "x y")])
    r = corpus_divergence(a, b).first()
    m_x, m_y = 0.75, 0.25
    kl_a = 1.0 * math.log(1.0 / m_x)
    kl_b = 0.5 * math.log(0.5 / m_x) + 0.5 * math.log(0.5 / m_y)
    assert r.kl_a_m == pytest.approx(kl_a, abs=1e-6)
    assert r.kl_b_m == pytest.approx(kl_b, abs=1e-6)
    assert r.jsd == pytest.approx((kl_a + kl_b) / 2, abs=1e-6)
