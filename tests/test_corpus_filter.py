"""Gopher/C4 heuristic filter (pipeline/text.corpus_filter) and
chat-template rendering (sources/transcripts.render_chat)."""

from datetime import datetime

from graph_data_science_spark.pipeline.text import corpus_filter
from graph_data_science_spark.sources.transcripts import render_chat


def test_corpus_filter_rules(spark):
    docs = spark.createDataFrame(
        [
            # kept: long enough, alphabetic, distinct, stopwordy
            (0, "the quick brown fox jumps over a lazy dog in the sun"),
            (1, "hi"),  # too_short (also low_stopword)
            (2, "the the the the the the the the the the"),  # repetitive
            (3, "1 2 3 4 5 6 7 8 9 10 11 12"),  # low_alpha + low_stopword
            (4, ""),  # empty: too_short, low_alpha, bad_word_len...
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus_filter(docs).collect()}
    assert out[0]["keep"] and out[0]["reasons"] == ""
    assert not out[1]["keep"] and "too_short" in out[1]["reasons"]
    assert not out[2]["keep"] and "repetitive" in out[2]["reasons"]
    # doc 2 has 10 'the' tokens -> stopword rule satisfied
    assert "low_stopword" not in out[2]["reasons"]
    assert not out[3]["keep"] and "low_alpha" in out[3]["reasons"]
    assert "low_stopword" in out[3]["reasons"]
    assert not out[4]["keep"]
    assert out[4]["n_tokens"] == 0 and "bad_word_len" in out[4]["reasons"]
    # reasons keep fixed rule order
    assert out[1]["reasons"].startswith("too_short")


def test_corpus_filter_thresholds(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    strict = corpus_filter(docs, min_tokens=10).collect()[0]
    assert not strict["keep"] and "too_short" in strict["reasons"]
    lax = corpus_filter(docs, min_stopword_hits=0).collect()[0]
    assert "low_stopword" not in lax["reasons"]


def test_render_chat(spark):
    ts = datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "hi there", None, ts),
        ("c1", 1, "assistant", None, "search", ts),
        ("c2", 0, "user", "solo", None, ts),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = {r["conv_id"]: r for r in render_chat(df).collect()}
    assert out["c1"]["text"] == "<|user|> hi there\n<|assistant|> "
    assert out["c1"]["n_turns"] == 2
    # tokens of the rendered text: <|user|>, hi, there, <|assistant|>
    assert out["c1"]["n_tokens"] == 4
    assert out["c2"]["text"] == "<|user|> solo"
    assert out["c2"]["n_tokens"] == 2


def test_incremental_dedup(spark):
    from graph_data_science_spark.pipeline.dedup import incremental_dedup

    new = spark.createDataFrame(
        [(10, "aaa"), (11, "bbb"), (12, "aaa"), (13, "ccc")],
        "doc_id long, text string",
    )
    # index already contains the hash of "bbb"
    seen = new.where("doc_id = 11").selectExpr("md5(text) AS h")
    out = {r["doc_id"]: r for r in incremental_dedup(new, seen).collect()}
    assert out[10]["is_new"] and not out[10]["is_batch_duplicate"]
    assert not out[11]["is_new"]  # already in the index
    assert out[12]["is_new"] and out[12]["is_batch_duplicate"]  # dup of 10
    assert out[13]["is_new"] and not out[13]["is_batch_duplicate"]
    accept = [d for d, r in out.items() if r["is_new"] and not r["is_batch_duplicate"]]
    assert sorted(accept) == [10, 13]
