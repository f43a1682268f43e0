"""Property-based tests: pack_sequences against a pure-Python
next-fit oracle over arbitrary small corpora, and corpus_filter's
keep <-> reasons consistency."""

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graph_data_science_spark.pipeline import text

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
_IDS = itertools.count()

token_counts = st.lists(st.integers(min_value=0, max_value=17), min_size=1, max_size=25)


def _py_next_fit(weights, budget):
    """Reference next-fit: (bin_idx per doc in order)."""
    bins, fill, b = [], 0, 0
    for i, w in enumerate(weights):
        if i > 0 and fill + w > budget:
            b += 1
            fill = 0
        fill += w
        bins.append(b)
    return bins


@given(ws=token_counts, budget=st.integers(min_value=1, max_value=20))
@settings(**_SETTINGS)
def test_pack_matches_python_next_fit(spark, ws, budget):
    base = next(_IDS) * 1000
    docs = spark.createDataFrame(
        [(base + i, " ".join(["w"] * w)) for i, w in enumerate(ws)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["bin_idx"], r["n_tokens"])
        for r in text.pack_sequences(docs, budget=budget, n_shards=1).collect()
    }
    want = _py_next_fit(ws, budget)
    assert [got[base + i][0] for i in range(len(ws))] == want
    assert [got[base + i][1] for i in range(len(ws))] == ws


@given(ws=token_counts, budget=st.integers(min_value=1, max_value=20),
       n_shards=st.integers(min_value=1, max_value=5))
@settings(**_SETTINGS)
def test_pack_shards_are_independent_next_fits(spark, ws, budget, n_shards):
    base = next(_IDS) * 1000
    docs = spark.createDataFrame(
        [(base + i, " ".join(["w"] * w)) for i, w in enumerate(ws)],
        "doc_id long, text string",
    )
    rows = text.pack_sequences(docs, budget=budget, n_shards=n_shards).collect()
    assert len(rows) == len(ws)
    for shard in {r["shard"] for r in rows}:
        seq = sorted((r for r in rows if r["shard"] == shard),
                     key=lambda r: r["doc_id"])
        want = _py_next_fit([r["n_tokens"] for r in seq], budget)
        assert [r["bin_idx"] for r in seq] == want


@given(texts=st.lists(
    st.sampled_from(["", "hi", "the a of to is it and or in words",
                     "x " * 8, "the " * 30, "1 2 3 4 5 6"]),
    min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_corpus_filter_keep_iff_no_reasons(spark, texts):
    base = next(_IDS) * 1000
    docs = spark.createDataFrame(
        [(base + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in text.corpus_filter(docs).collect():
        assert r["keep"] == (r["reasons"] == "")
        # reasons are a subset of the rule tags, in fixed order
        tags = [t for t in r["reasons"].split(",") if t]
        order = ["too_short", "too_long", "low_alpha", "repetitive",
                 "low_stopword", "bad_word_len"]
        assert tags == [t for t in order if t in tags]
