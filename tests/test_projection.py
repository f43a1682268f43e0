"""Transcript datagen + edge derivation + orientation/aggregation tests
(FIXTURES.md §0, §E, §F.3-4)."""

from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.datagen import expected_text, generate_transcripts
from tests.conftest import edge_df


def test_transcripts_deterministic_and_text_invariant(spark):
    t = generate_transcripts(spark, n_conversations=100, n_tools=5, seed=42)
    rows = t.orderBy("conv_id", "turn_idx").collect()
    assert len(rows) >= 200  # >= 2 turns per conversation
    # per-turn text equality under stable (conv_id, turn_idx) ordering
    for r in rows:
        assert r["text"] == expected_text(r["conv_id"], r["turn_idx"], r["role"])
    # regeneration is identical (seed-stable)
    rows2 = generate_transcripts(spark, 100, n_tools=5, seed=42).orderBy(
        "conv_id", "turn_idx"
    ).collect()
    assert rows == rows2
    # partitioning does not change content
    rows3 = (
        generate_transcripts(spark, 100, n_tools=5, seed=42, partitions=7)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert rows == rows3


def test_transcript_edges_shape(spark):
    t = generate_transcripts(spark, 50, n_tools=5, seed=42)
    edges = projection.transcript_edges(t)
    n_turns = t.count()
    n_convs = 50
    reply = edges.where(F.col("rel_type") == "REPLY")
    invokes = edges.where(F.col("rel_type") == "INVOKES")
    assert reply.count() == n_turns - n_convs  # turns-1 per conversation
    assert invokes.count() == t.where(F.col("tool").isNotNull()).count()
    # reply edges form per-conversation paths: no vertex repeats as src
    assert reply.groupBy("src").count().agg(F.max("count")).collect()[0][0] == 1


def test_orientation_semantics(spark):
    e = edge_df(spark, [(0, 1), (1, 2)])
    assert projection.orient(e, "NATURAL").count() == 2
    rev = {(r["src"], r["dst"]) for r in projection.orient(e, "REVERSE").collect()}
    assert rev == {(1, 0), (2, 1)}
    und = projection.orient(e, "UNDIRECTED")
    assert und.count() == 4  # both directions materialized; degree counts both
    degs = {
        r["id"]: r["degree"] for r in projection.degrees(und, directed=True).collect()
    }
    assert degs == {0: 1, 1: 2, 2: 1}


def test_aggregation_semantics(spark):
    # Aggregation.java:31-80 — duplicate (0,1) with weights 2.0 and 3.0
    e = edge_df(spark, [(0, 1), (0, 1), (1, 2)], weights=[2.0, 3.0, 5.0])
    def agg(kind):
        out = projection.aggregate_parallel(e, kind)
        return {(r["src"], r["dst"]): r["weight"] for r in out.collect()}
    assert agg("SUM")[(0, 1)] == 5.0
    assert agg("MIN")[(0, 1)] == 2.0
    assert agg("MAX")[(0, 1)] == 3.0
    assert agg("COUNT")[(0, 1)] == 2.0
    assert agg("SINGLE")[(0, 1)] == 2.0  # deterministic: min weight kept
    assert projection.aggregate_parallel(e, "NONE").count() == 3


def test_canonical_undirected(spark):
    e = edge_df(spark, [(1, 0), (0, 1), (2, 2), (1, 2)])
    got = {(r["src"], r["dst"]) for r in projection.canonical_undirected(e).collect()}
    assert got == {(0, 1), (1, 2)}  # self-loop dropped, both dirs collapsed
