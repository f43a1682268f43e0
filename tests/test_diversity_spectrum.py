"""N-gram diversity ratios and frequency spectrum."""

import pytest

from graph_data_science_spark.pipeline.text import freq_spectrum, ngram_diversity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_diversity_hand_values(spark):
    df = _docs(spark, [(0, "a b a b c"), (1, "a b"), (2, "")])
    r = ngram_diversity(df).first()
    assert (r.total_1, r.distinct_1) == (7, 3)
    assert (r.total_2, r.distinct_2) == (5, 3)
    assert (r.total_3, r.distinct_3) == (3, 3)
    assert r.ratio_1 == pytest.approx(3 / 7, abs=1e-6)
    assert r.ratio_3 == 1.0


def test_diversity_empty_corpus(spark):
    r = ngram_diversity(_docs(spark, [(0, "")])).first()
    assert r.total_1 == 0 and r.ratio_1 is None
    assert r.total_3 == 0 and r.ratio_3 is None


def test_diversity_mode_collapse_signal(spark):
    # templated corpus: same sentence repeated -> ratios collapse
    rep = _docs(spark, [(i, "the same line again") for i in range(20)])
    var = _docs(spark, [(i, f"unique line number {i} here") for i in range(20)])
    r_rep = ngram_diversity(rep).first()
    r_var = ngram_diversity(var).first()
    assert r_rep.ratio_2 < r_var.ratio_2


def test_freq_spectrum(spark):
    df = _docs(spark, [(0, "a a a b b c")])
    got = {r.freq: r.n_types for r in freq_spectrum(df, max_freq=2).collect()}
    assert got == {1: 1, 2: 1, -1: 1}


def test_freq_spectrum_total_types(spark):
    df = _docs(spark, [(0, "x y z x y x w")])
    rows = freq_spectrum(df, max_freq=10).collect()
    assert sum(r.n_types for r in rows) == 4
