"""Transcript source dispatch (sources/transcripts.py): catalog
table identifier vs parquet path, schema validation, and graph
projection parity between the two read paths."""

import pytest

from graph_data_science_spark.datagen import generate_transcripts
from graph_data_science_spark.sources.transcripts import (
    read_transcripts,
    transcript_graph,
)


@pytest.fixture(scope="module")
def transcript_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tsrc") / "transcripts.parquet")
    generate_transcripts(spark, n_conversations=50, seed=11).write.parquet(path)
    return path


def test_path_read(spark, transcript_path):
    df = read_transcripts(spark, transcript_path)
    assert {"conv_id", "turn_idx", "role", "text", "tool", "ts"} <= set(df.columns)
    assert df.count() > 0


def test_table_identifier_read(spark, transcript_path):
    # a saved table resolved via the session catalog — the same
    # spark.read.table seam an Iceberg catalog table comes through
    spark.read.parquet(transcript_path).write.mode("overwrite").saveAsTable(
        "transcripts_tbl"
    )
    try:
        df = read_transcripts(spark, "transcripts_tbl")
        assert df.count() == spark.read.parquet(transcript_path).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS transcripts_tbl")


def test_schema_validation(spark):
    bad = spark.createDataFrame([(1,)], "x long")
    bad.createOrReplaceTempView("not_transcripts")
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, "not_transcripts")


def test_graph_parity_between_read_paths(spark, transcript_path):
    g_path = transcript_graph(spark, transcript_path)
    spark.read.parquet(transcript_path).write.mode("overwrite").saveAsTable(
        "transcripts_tbl2"
    )
    try:
        g_tbl = transcript_graph(spark, "transcripts_tbl2")
        a = sorted((r["src"], r["dst"]) for r in g_path.edges.collect())
        b = sorted((r["src"], r["dst"]) for r in g_tbl.edges.collect())
        assert a == b and len(a) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS transcripts_tbl2")


def test_conversation_stats_hand_fixture(spark):
    import datetime as dt

    from graph_data_science_spark.sources.transcripts import conversation_stats

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        ("c1", 0, "user", "hello there", None, t0),
        ("c1", 1, "assistant", "hi", "search", t0 + dt.timedelta(seconds=2)),
        ("c1", 2, "user", None, "search", t0 + dt.timedelta(seconds=5)),
        ("c2", 0, "user", "one two three", None, t0),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {r["conv_id"]: r.asDict() for r in conversation_stats(df).collect()}
    assert got["c1"] == {
        "conv_id": "c1",
        "n_turns": 3,
        "n_user_turns": 2,
        "n_assistant_turns": 1,
        "n_tools": 1,  # count_distinct skips nulls
        "total_tokens": 3,
        "avg_turn_tokens": 1.0,
        "duration_us": 5_000_000,
    }
    assert got["c2"]["n_turns"] == 1
    assert got["c2"]["n_tools"] == 0
    assert got["c2"]["total_tokens"] == 3
    assert got["c2"]["duration_us"] == 0


def test_jsonl_roundtrip_exact(spark, tmp_path):
    from graph_data_science_spark.pipeline.corpus_io import (
        jsonl_roundtrip_report,
        read_jsonl,
        write_jsonl,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} text", "en", i * 7) for i in range(100)],
        "doc_id long, text string, lang string, n_chars long",
    )
    rep = jsonl_roundtrip_report(docs, str(tmp_path / "rt")).collect()[0]
    assert rep["n_rows"] == 100
    assert rep["n_reimported"] == 100
    assert rep["n_missing"] == 0
    assert rep["n_extra"] == 0
    assert rep["schema_preserved"]
    # gzip variant round-trips too (non-splittable, so opt-in only)
    write_jsonl(docs, str(tmp_path / "gz"), compression="gzip")
    back = read_jsonl(spark, str(tmp_path / "gz"), docs.schema)
    assert back.count() == 100
    assert back.subtract(docs).count() == 0
