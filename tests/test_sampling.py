"""Weighted corpus sampling (pipeline/sampling.py)."""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.sampling import (
    _M31,
    sample_to_token_budget,
    weighted_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, float(1 + (i % 5)), 10 * (1 + i % 3)) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, quality double, tokens int")


def _key(doc_id: int, w: float, seed: int = 42) -> float:
    a = ((doc_id % _M31) * 2654435761 + seed * 40503 + 12345) % _M31
    b = (a * a) % _M31
    c = (b * 1103515245 + a) % _M31
    u = (c + 1.0) / _M31
    return math.log(u) / w


def test_weighted_sample_matches_reference_ranking(spark, corpus):
    got = weighted_sample(corpus, "quality", n=10).collect()
    assert len(got) == 10
    expect = sorted(
        ((_key(i, float(1 + (i % 5))), i) for i in range(40)),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [r["doc_id"] for r in got] == [i for _, i in expect]
    for r in got:
        assert r["sample_key"] == pytest.approx(_key(r["doc_id"], r["quality"]))


def test_weighted_sample_determinism_and_seed(spark, corpus):
    a = [r["doc_id"] for r in weighted_sample(corpus, "quality", n=8).collect()]
    b = [r["doc_id"] for r in weighted_sample(corpus, "quality", n=8).collect()]
    assert a == b
    c = [r["doc_id"] for r in weighted_sample(corpus, "quality", n=8, seed=7).collect()]
    assert a != c


def test_weighted_sample_bias_toward_heavy_weights(spark):
    # weight 100 vs 1: the heavy half dominates any sizeable sample
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r["doc_id"] for r in weighted_sample(df, "w", n=20).collect()]
    assert sum(1 for i in got if i < 50) >= 17


def test_weighted_sample_excludes_nonpositive_weights(spark):
    rows = [(1, 0.0), (2, -1.0), (3, 2.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r["doc_id"] for r in weighted_sample(df, "w", n=3).collect()]
    assert got == [3]


def test_token_budget_matches_naive_cumsum(spark, corpus):
    budget = 300
    got = sample_to_token_budget(
        corpus, budget, weight_col="quality", token_col="tokens"
    ).collect()
    # naive: order all docs by (key desc, id), take while cum <= budget
    ordered = sorted(
        ((i, _key(i, float(1 + (i % 5))), 10 * (1 + i % 3)) for i in range(40)),
        key=lambda t: (-t[1], t[0]),
    )
    cum, expect = 0, []
    for i, _, toks in ordered:
        if cum + toks > budget:
            break
        cum += toks
        expect.append((i, cum))
    assert sorted((r["doc_id"], r["cum_tokens"]) for r in got) == sorted(expect)
    assert max(r["cum_tokens"] for r in got) <= budget


def test_token_budget_first_doc_guarantee(spark):
    df = spark.createDataFrame([(1, 1.0, 1000), (2, 1.0, 1000)], "doc_id long, w double, tokens int")
    got = sample_to_token_budget(df, 10, weight_col="w", token_col="tokens").collect()
    assert len(got) == 1  # the top-priority doc alone, despite busting the budget


def test_token_budget_whole_corpus_fits(spark, corpus):
    got = sample_to_token_budget(
        corpus, 10**9, weight_col="quality", token_col="tokens"
    ).collect()
    assert len(got) == 40
    assert max(r["cum_tokens"] for r in got) == sum(10 * (1 + i % 3) for i in range(40))


def test_stratified_sample_quota_and_ranking(spark):
    from graph_data_science_spark.pipeline.sampling import stratified_sample

    rows = [(i, "en" if i % 2 == 0 else "de", float(1 + i % 4)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, w double")
    got = stratified_sample(df, "w", strata_col="lang", n_per_stratum=5).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert sorted(len(v) for v in by_lang.values()) == [5, 5]
    # per-stratum top-5 matches the pure-python priority ranking
    for lang, parity in (("en", 0), ("de", 1)):
        expect = sorted(
            ((_key(i, float(1 + i % 4)), i) for i in range(30) if i % 2 == parity),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        assert sorted(by_lang[lang]) == sorted(i for _, i in expect)


def test_mix_corpus(spark):
    from graph_data_science_spark.pipeline import sampling

    rows = [
        (i, "a" if i < 60 else ("b" if i < 90 else "c"), 10)
        for i in range(120)
    ]  # masses: a=600, b=300, c=300 tokens
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    # target 50/50 between a and b: binding source is b
    # (N = min(600/.5, 300/.5) = 600) -> r_a = .5*600/600 = 0.5, r_b = 1.0
    out = sampling.mix_corpus(
        df, {"a": 0.5, "b": 0.5}, weight_col="n_tokens", seed=11
    )
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    rates = {r["source"]: r["accept_rate"]
             for r in out.select("source", "accept_rate").distinct().collect()}
    assert "c" not in counts            # unlisted source dropped
    assert counts["b"] == 30            # binding source keeps everything
    assert rates["b"] == 1.0 and rates["a"] == 0.5
    assert 15 <= counts["a"] <= 45      # ~50% acceptance, deterministic
    # determinism: same seed -> same sample
    again = sampling.mix_corpus(
        df, {"a": 0.5, "b": 0.5}, weight_col="n_tokens", seed=11
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # shares normalize: {1, 1} == {0.5, 0.5}
    norm = sampling.mix_corpus(df, {"a": 1, "b": 1}, weight_col="n_tokens", seed=11)
    assert sorted(r["doc_id"] for r in norm.collect()) == sorted(
        r["doc_id"] for r in out.collect()
    )
    # doc-count weighting when weight_col is None
    bydoc = sampling.mix_corpus(df, {"a": 0.5, "b": 0.5}, seed=11)
    r2 = {r["source"]: r["accept_rate"]
          for r in bydoc.select("source", "accept_rate").distinct().collect()}
    assert r2["b"] == 1.0 and r2["a"] == 0.5
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sampling.mix_corpus(df, {})


def test_source_caps_hard_limit_and_determinism(spark):
    from graph_data_science_spark.pipeline.sampling import source_caps

    rows = [(i, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_caps(df, cap=10, seed=17)
    got = out.collect()
    per = {}
    for r in got:
        per.setdefault(r["source"], []).append(r["src_rank"])
    assert set(per) == {"s0", "s1", "s2"}
    for src, ranks in per.items():
        assert sorted(ranks) == list(range(1, 11))  # exactly cap kept
    # deterministic across invocations
    again = {(r["doc_id"], r["src_rank"]) for r in source_caps(df, 10, seed=17).collect()}
    assert again == {(r["doc_id"], r["src_rank"]) for r in got}
    # different seed -> (almost surely) different survivor set
    other = {r["doc_id"] for r in source_caps(df, 10, seed=18).collect()}
    assert other != {r["doc_id"] for r in got}
    # small source: cap larger than the source keeps everything
    tiny = source_caps(df.where("doc_id < 4"), cap=10, seed=17)
    assert tiny.count() == 4


def test_temperature_mix_flattens_toward_uniform(spark):
    """q_s ∝ p_s^(1/T): T=1 reproduces natural proportions (rate 1
    everywhere — no resampling needed); higher T upweights the tail
    source relative to the head."""
    import pytest as _pt

    from graph_data_science_spark.pipeline.sampling import temperature_mix

    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    t1 = temperature_mix(df, temperature=1.0, seed=5)
    rates1 = {r["source"]: r["accept_rate"] for r in t1.collect()}
    assert rates1["big"] == _pt.approx(1.0) and rates1["small"] == _pt.approx(1.0)

    t4 = temperature_mix(df, temperature=4.0, seed=5)
    rates4 = {r["source"]: r["accept_rate"] for r in t4.collect()}
    # tail keeps everything (binding source); head is downsampled
    assert rates4["small"] == _pt.approx(1.0)
    assert rates4["big"] < 0.6
    with _pt.raises(ValueError, match="temperature"):
        temperature_mix(df, temperature=0.0)
