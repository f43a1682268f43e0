"""lm_perplexity and bpe_pair_counts against pure-Python oracles:
hand-built bigram-LM scoring (add-alpha smoothed MLE with the
bigram-first-position history counts) and brute-force character-pair
counting, over deterministic small corpora."""

import math
from collections import Counter

import pytest

from graph_data_science_spark.pipeline import text


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_lm(texts, alpha=1.0):
    """Reference scores: dict doc_id -> (n_bigrams, avg_nlp, ppl)."""
    bigrams, firsts, vocab = Counter(), Counter(), set()
    toks = {i: t.split() for i, t in enumerate(texts)}
    for ts in toks.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bigrams[(a, b)] += 1
            firsts[a] += 1
    out = {}
    v = len(vocab)
    for i, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            continue
        terms = [
            round(
                -math.log((bigrams[p] + alpha) / (firsts[p[0]] + alpha * v)), 9
            )
            for p in pairs
        ]
        avg = round(sum(terms) / len(pairs), 6)
        out[i] = (len(pairs), avg, round(math.exp(avg), 6))
    return out


def test_lm_perplexity_matches_python_oracle(spark):
    texts = [
        "a b a b c",
        "a b a b a b",
        "c c c c",
        "b a",
        "solo",  # 1 token -> no bigrams -> no output row
    ]
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_neg_logprob"], r["perplexity"])
        for r in text.lm_perplexity(_docs(spark, texts)).collect()
    }
    assert got == _py_lm(texts)


def test_lm_perplexity_boilerplate_scores_lower(spark):
    # 9 identical template docs + 1 shuffled-vocab doc: the template
    # must be more predictable (lower perplexity) than the outlier.
    texts = ["the quick brown fox jumps over the lazy dog"] * 9 + [
        "dog the over fox quick lazy jumps brown the"
    ]
    rows = {
        r["doc_id"]: r["perplexity"]
        for r in text.lm_perplexity(_docs(spark, texts)).collect()
    }
    assert rows[0] < rows[9]


def test_lm_perplexity_rejects_bad_alpha(spark):
    with pytest.raises(ValueError):
        text.lm_perplexity(_docs(spark, ["a b"]), alpha=0.0)


def test_bpe_pair_counts_matches_python_oracle(spark):
    texts = ["abab cd x", "abc abc", "zz zz zz"]
    counts = Counter()
    for t in texts:
        for tok in t.split():
            for i in range(len(tok) - 1):
                counts[tok[i : i + 2]] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [
        (r["pair"], r["n"])
        for r in text.bpe_pair_counts(_docs(spark, texts), top_n=100)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect
    # single-char tokens contribute nothing; ranks are 1..k dense
    ranks = [
        r["rank"]
        for r in text.bpe_pair_counts(_docs(spark, texts), top_n=3)
        .orderBy("rank")
        .collect()
    ]
    assert ranks == [1, 2, 3]


def test_bpe_pair_counts_rejects_bad_top_n(spark):
    with pytest.raises(ValueError):
        text.bpe_pair_counts(_docs(spark, ["ab"]), top_n=0)


def test_ccnet_buckets_terciles(spark):
    # 9 docs with distinct perplexities -> exact thirds: doc i is
    # token t_i repeated i+2 times, so its only bigram has
    # p = (i+2)/(i+10) and perplexity strictly decreases with i
    texts = [(f"t{i} " * (i + 2)).strip() for i in range(9)]
    out = text.ccnet_buckets(_docs(spark, texts)).collect()
    assert len(out) == 9
    by_bucket = Counter(r["bucket"] for r in out)
    # interpolated tercile cuts put 3 docs in each band
    assert by_bucket == {"head": 3, "middle": 3, "tail": 3}
    # head holds the LOWEST perplexities
    ppl = sorted(out, key=lambda r: r["perplexity"])
    assert [r["bucket"] for r in ppl] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3


def test_ccnet_buckets_excludes_short_docs(spark):
    out = text.ccnet_buckets(_docs(spark, ["single", "two tokens", "a b c"])).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_ccnet_buckets_validation(spark):
    with pytest.raises(ValueError):
        text.ccnet_buckets(_docs(spark, ["a b"]), cut_lo=0.7, cut_hi=0.3)


# ---- BPE merge training (bpe_train) ----------------------------------------


def _ref_bpe(texts, n_merges, min_pair_count=2):
    """Pure-Python word-type BPE replay (Sennrich 2016)."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t):
            if w:
                words[w] += 1
    state = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in state.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += words[w]
        if not pc:
            break
        # count desc, pair lexicographic asc
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((a, b, n))
        for w, syms in state.items():
            out = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            state[w] = out
    return merges, state


def test_bpe_train_matches_python_replay(spark):
    from graph_data_science_spark.pipeline.text import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wider wide wide low",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    res = bpe_train(df, n_merges=6)
    want_merges, want_state = _ref_bpe(texts, 6)
    assert res.merges == want_merges
    got_state = {
        r["word"]: list(r["symbols"]) for r in res.word_symbols.collect()
    }
    assert got_state == want_state
    rows = sorted(res.merge_table.collect(), key=lambda r: r["merge_rank"])
    assert [(r["left"], r["right"], r["n"]) for r in rows] == want_merges


def test_bpe_train_early_stop(spark):
    from graph_data_science_spark.pipeline.text import bpe_train

    df = spark.createDataFrame([("ab cd ef",)], "text string")
    # every pair occurs once; min_pair_count=2 stops before any merge
    res = bpe_train(df, n_merges=5, min_pair_count=2)
    assert res.merges == []
    assert res.merge_table.count() == 0


def test_bpe_encode_counts(spark):
    from graph_data_science_spark.pipeline.text import bpe_encode, bpe_train

    texts = ["low lower low", "newest low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    res = bpe_train(df, n_merges=4)
    _, state = _ref_bpe(texts, 4)
    got = {
        r["id"]: (r["n_tokens"], r["n_bpe_tokens"])
        for r in bpe_encode(df, res).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        ws = [w for w in t.split() if w]
        want[i] = (len(ws), sum(len(state[w]) for w in ws))
    assert got == want
