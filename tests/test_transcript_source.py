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
