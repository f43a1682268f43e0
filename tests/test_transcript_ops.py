"""Transcript-table operators (sources/transcripts.py): exact
conversation dedup, ingest validation, reply-latency rollup, tool
sequence mining — plus pipeline.text.pack_sequences next-fit packing."""

from datetime import datetime

import pytest

from graph_data_science_spark.pipeline.text import pack_sequences
from graph_data_science_spark.sources.transcripts import (
    conversation_dedup,
    tool_sequences,
    transcript_validate,
    turn_latency,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _ts(sec: int) -> datetime:
    return datetime(2026, 1, 1, 0, 0, sec)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        # conv a and conv b: identical turn-text sequences
        ("a", 0, "user", "hi", "t1", _ts(0)),
        ("a", 1, "assistant", "hello", "t2", _ts(2)),
        ("b", 0, "user", "hi", "t9", _ts(10)),
        ("b", 1, "assistant", "hello", "t9", _ts(11)),
        # conv c: different text, null text turn, ts regression,
        # non-dense turn_idx (0,1,3), non-alternating roles
        ("c", 0, "user", "x", "t1", _ts(5)),
        ("c", 1, "user", None, "t2", _ts(4)),
        ("c", 3, "assistant", "y", "t3", _ts(6)),
        # conv d: single turn
        ("d", 0, "user", "solo", None, _ts(7)),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_conversation_dedup(tiny):
    out = {r["conv_id"]: r for r in conversation_dedup(tiny).collect()}
    assert out["a"]["group_id"] == "a" and not out["a"]["is_duplicate"]
    assert out["b"]["group_id"] == "a" and out["b"]["is_duplicate"]
    assert out["c"]["group_id"] == "c" and not out["c"]["is_duplicate"]
    assert out["d"]["group_id"] == "d" and not out["d"]["is_duplicate"]


def test_transcript_validate(tiny):
    out = {r["conv_id"]: r for r in transcript_validate(tiny).collect()}
    a, c, d = out["a"], out["c"], out["d"]
    assert a["n_turns"] == 2 and a["dense_turns"] and a["ts_monotone"]
    assert a["n_null_text"] == 0 and a["role_alternation_frac"] == 1.0
    assert c["n_turns"] == 3 and not c["dense_turns"] and not c["ts_monotone"]
    assert c["n_null_text"] == 1
    # c's consecutive role pairs: (user,user)=0, (user,assistant)=1
    assert c["role_alternation_frac"] == 0.5
    assert d["n_turns"] == 1 and d["dense_turns"] and d["ts_monotone"]
    assert d["role_alternation_frac"] is None


def test_turn_latency(tiny):
    out = {r["role"]: r for r in turn_latency(tiny).collect()}
    # assistant gaps: a (2s), b (1s), c turn3 (2s) -> in MICROSECONDS
    assert out["assistant"]["n_gaps"] == 3
    assert out["assistant"]["avg_gap_us"] == pytest.approx(5_000_000 / 3, abs=1e-3)
    assert out["assistant"]["p50_gap_us"] == 2_000_000.0
    # user gaps: c turn1 (-1s: ts regression keeps its sign)
    assert out["user"]["n_gaps"] == 1
    assert out["user"]["avg_gap_us"] == -1_000_000.0


def test_tool_sequences(tiny):
    rows = tool_sequences(tiny, top_n=10).collect()
    pairs = {(r["tool_1"], r["tool_2"]): r["n"] for r in rows}
    # null-tool turns (conv d) never pair; conv b pairs (t9,t9)
    assert pairs == {("t1", "t2"): 2, ("t9", "t9"): 1, ("t2", "t3"): 1}
    top = min(rows, key=lambda r: r["rank"])
    assert (top["tool_1"], top["tool_2"], top["n"]) == ("t1", "t2", 2)
    # ranks are dense 1..n, count-desc then lexicographic
    assert sorted(r["rank"] for r in rows) == [1, 2, 3]


def test_pack_sequences_next_fit(spark):
    # one shard (n_shards=1), budget 5; token counts: 3,3,2,6,1
    docs = spark.createDataFrame(
        [
            (0, "a b c"),
            (1, "d e f"),
            (2, "g h"),
            (3, "i j k l m n"),  # longer than budget -> own bin
            (4, "o"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=5, n_shards=1).collect()
    }
    # next-fit: [3] | [3,2] | [6] | [1]
    assert [out[i]["bin_idx"] for i in range(5)] == [0, 1, 1, 2, 3]
    assert out[3]["n_tokens"] == 6  # oversized doc kept whole
    assert all(r["shard"] == 0 for r in out.values())


def test_pack_sequences_sharding_and_bounds(spark):
    import pyspark.sql.functions as F

    docs = spark.range(97).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("w"), (F.pmod(F.col("id"), 7) + 1).cast("int"))
        ).alias("text"),
    )
    out = pack_sequences(docs, budget=10, n_shards=4)
    rows = out.collect()
    assert len(rows) == 97
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    assert all(r["shard"] == r["doc_id"] % 4 for r in rows)
    # no multi-doc bin exceeds the budget; bins are contiguous in
    # doc_id order within a shard (next-fit never reopens a bin)
    from collections import defaultdict

    bins = defaultdict(list)
    for r in rows:
        bins[(r["shard"], r["bin_idx"])].append(r)
    for members in bins.values():
        if len(members) > 1:
            assert sum(m["n_tokens"] for m in members) <= 10
    for shard in range(4):
        seq = sorted(
            (r for r in rows if r["shard"] == shard), key=lambda r: r["doc_id"]
        )
        deltas = {
            b["bin_idx"] - a["bin_idx"] for a, b in zip(seq, seq[1:])
        }
        assert deltas <= {0, 1}
        assert seq[0]["bin_idx"] == 0


def test_pack_sequences_null_text(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, None), (2, "d e")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(docs, budget=4, n_shards=1).collect()
    }
    assert out[1]["n_tokens"] == 0
    # zero-width doc never opens a new bin
    assert out[0]["bin_idx"] == 0 and out[1]["bin_idx"] == 0
    assert out[2]["bin_idx"] == 1


def test_tool_entropy(tiny):
    from graph_data_science_spark.sources.transcripts import tool_entropy

    out = {r["conv_id"]: r for r in tool_entropy(tiny).collect()}
    # conv b: both turns use t9 -> one tool, entropy 0
    assert out["b"]["n_tools"] == 1 and out["b"]["entropy"] == 0.0
    # conv a: t1,t2 uniform over 2 -> ln 2
    import math

    assert out["a"]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert out["a"]["n_turns"] == 2
    # conv d: null tool only -> excluded entirely
    assert "d" not in out


def test_tool_affinity(tiny):
    from graph_data_science_spark.sources.transcripts import tool_affinity

    rows = tool_affinity(tiny, top_n=100).collect()
    # N=7 non-null tool turns; t9 only in conv b: pmi = ln(2*7/(2*2))
    import math

    by = {(r["conv_id"], r["tool"]): r for r in rows}
    assert by[("b", "t9")]["pmi"] == pytest.approx(
        round(math.log(14 / 4), 6), abs=1e-9
    )
    assert by[("b", "t9")]["n_joint"] == 2
    # ranks dense from 1, pmi non-increasing
    ranked = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in ranked] == list(range(1, len(rows) + 1))
    assert all(a["pmi"] >= b["pmi"] for a, b in zip(ranked, ranked[1:]))


# ---------------------------------------------------------- loss masks

def test_render_chat_masked_spans_slice_exactly(spark, tiny):
    from graph_data_science_spark.sources.transcripts import render_chat_masked

    out = {r["conv_id"]: r for r in render_chat_masked(tiny).collect()}
    # conv a: "<|user|> hi\n<|assistant|> hello"
    a = out["a"]
    assert a["text"] == "<|user|> hi\n<|assistant|> hello"
    assert len(a["loss_spans"]) == 1
    s = a["loss_spans"][0]
    assert a["text"][s["start"] : s["end"]] == "hello"
    # conv c: null text renders empty; only the assistant turn masked
    c = out["c"]
    assert len(c["loss_spans"]) == 1
    s = c["loss_spans"][0]
    assert c["text"][s["start"] : s["end"]] == "y"
    # conv d: user-only -> no spans
    assert out["d"]["loss_spans"] == []


def test_render_chat_masked_total_mask_chars(spark, tiny):
    from pyspark.sql import functions as F

    from graph_data_science_spark.sources.transcripts import render_chat_masked

    got = (
        render_chat_masked(tiny)
        .select(
            F.aggregate(
                "loss_spans",
                F.lit(0).cast("long"),
                lambda acc, s: acc + s["end"] - s["start"],
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    # assistant texts: "hello" (a), "hello" (b), "y" (c) = 11 chars
    assert got == 11


def test_render_chat_masked_custom_roles(spark, tiny):
    from graph_data_science_spark.sources.transcripts import render_chat_masked

    out = {
        r["conv_id"]: r
        for r in render_chat_masked(tiny, loss_roles=("user", "assistant")).collect()
    }
    a = out["a"]
    assert [a["text"][s["start"] : s["end"]] for s in a["loss_spans"]] == [
        "hi",
        "hello",
    ]
