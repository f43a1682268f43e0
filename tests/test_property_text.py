"""Property-based tests for the text/corpus pipeline operators:
pure-Python oracles over arbitrary small documents (empty strings,
repeated words, unicode-free word salad) for chunking coverage,
repetition ratios, PII-redaction idempotence, and corpus-mixing
feasibility invariants."""

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graph_data_science_spark.pipeline import sampling, text

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
_IDS = itertools.count()

words = st.lists(
    st.sampled_from("alpha beta gamma delta spam x1 y2".split()),
    min_size=0,
    max_size=30,
).map(" ".join)
docs_strategy = st.lists(words, min_size=1, max_size=6)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@given(texts=docs_strategy, max_tokens=st.integers(2, 8), overlap=st.integers(0, 3))
@settings(**_SETTINGS)
def test_chunk_coverage_property(spark, texts, max_tokens, overlap):
    if overlap >= max_tokens:
        overlap = max_tokens - 1
    stride = max_tokens - overlap
    out = text.chunk_documents(
        _docs(spark, texts), max_tokens=max_tokens, overlap=overlap
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r
    for i, t in enumerate(texts):
        toks = t.split()
        chunks = by_doc.get(i, {})
        if not toks:
            assert chunks == {}
            continue
        # chunk_idx contiguous from 0; windows reconstruct the doc
        assert sorted(chunks) == list(range(len(chunks)))
        seen = []
        for k in range(len(chunks)):
            ctoks = chunks[k]["chunk_text"].split()
            assert ctoks == toks[k * stride : k * stride + max_tokens]
            assert chunks[k]["n_chunk_tokens"] == len(ctoks)
            seen.extend(ctoks if k == 0 else ctoks[overlap:])
        # full coverage, no token lost or duplicated beyond overlap
        assert seen == toks


@given(texts=docs_strategy)
@settings(**_SETTINGS)
def test_repetition_ratio_bounds_property(spark, texts):
    rows = text.repetition_stats(_docs(spark, texts)).collect()
    assert len(rows) == len(texts)
    for r in rows:
        toks = texts[r["doc_id"]].split()
        assert r["n_words"] == len(toks)
        for c in ("distinct_word_ratio", "top_word_frac", "top_bigram_frac"):
            assert 0.0 <= r[c] <= 1.0
        if toks:
            # exact python oracle for distinct ratio
            assert r["distinct_word_ratio"] == round(len(set(toks)) / len(toks), 4)
            from collections import Counter

            assert r["top_word_frac"] == round(
                max(Counter(toks).values()) / len(toks), 4
            )


@given(texts=docs_strategy)
@settings(**_SETTINGS)
def test_pii_redaction_idempotent_property(spark, texts):
    # inject pii into some rows; redacting twice == redacting once
    salted = [
        t + (" a@b.io 10.0.0.1 555-867-5309 123-45-6789" if i % 2 else "")
        for i, t in enumerate(texts)
    ]
    df = _docs(spark, salted)
    once = text.pii_scrub(df)
    twice = text.pii_scrub(
        once.select("doc_id", once["redacted"].alias("text"))
    ).collect()
    red1 = {r["doc_id"]: r["redacted"] for r in once.collect()}
    for r in twice:
        assert r["redacted"] == red1[r["doc_id"]]
        assert r["n_email"] == r["n_ssn"] == r["n_phone"] == r["n_ipv4"] == 0


@given(
    masses=st.lists(st.integers(1, 50), min_size=2, max_size=4),
    shares=st.lists(st.integers(1, 5), min_size=2, max_size=4),
)
@settings(**_SETTINGS)
def test_mix_corpus_rates_property(spark, masses, shares):
    k = min(len(masses), len(shares))
    masses, shares = masses[:k], shares[:k]
    rows = []
    did = 0
    for si, m in enumerate(masses):
        for _ in range(m):
            rows.append((did, f"s{si}", 1))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    targets = {f"s{si}": float(sh) for si, sh in enumerate(shares)}
    out = sampling.mix_corpus(df, targets, weight_col="n_tokens", seed=3)
    rates = {
        r["source"]: r["accept_rate"]
        for r in out.select("source", "accept_rate").distinct().collect()
    }
    total_share = sum(shares)
    n_feasible = min(m / (sh / total_share) for m, sh in zip(masses, shares))
    for si, (m, sh) in enumerate(zip(masses, shares)):
        src = f"s{si}"
        expected = (sh / total_share) * n_feasible / m
        if src in rates:  # sources can drop out only by sampling to zero rows
            assert abs(rates[src] - round(expected, 6)) <= 1e-6
            assert rates[src] <= 1.0 + 1e-12
    # the binding source keeps everything
    binding = min(
        range(k), key=lambda i: masses[i] / (shares[i] / total_share)
    )
    kept = {r["source"] for r in out.collect()}
    assert f"s{binding}" not in kept or rates[f"s{binding}"] == 1.0
