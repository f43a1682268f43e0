"""Structured Streaming operators: batch/stream equivalence via
trigger(availableNow) over the sf0.001 events table."""

import tempfile

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.sources import events as ev
from graph_data_science_spark.streaming import (
    streaming_session_stats,
    streaming_turn_counter,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return ev.load_table(spark, SF_DIR, "events")


@pytest.fixture(scope="module")
def events_stream(spark, events_batch, tmp_path_factory):
    # FileStreamSource wants a directory; stage the single-file table
    import shutil

    d = tmp_path_factory.mktemp("events_stream_src")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return spark.readStream.schema(events_batch.schema).parquet(str(d))


def _run_stream(spark, df, name):
    with tempfile.TemporaryDirectory(prefix="gds_stream_ckpt_") as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode("append" if name == "turns" else "complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(name)


def test_streaming_session_stats_matches_batch_mode(spark, events_batch, events_stream):
    # the same transformation applied to the batch DF and the stream
    # must agree row-for-row once the stream drains
    got = _run_stream(
        spark, streaming_session_stats(events_stream), "sess"
    ).collect()
    want = streaming_session_stats(events_batch).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0
    # and the session partitioning agrees with the batch gap operator
    # on totals (boundary semantics differ only at EXACTLY gap)
    from graph_data_science_spark.pipeline.sessions import session_stats

    batch = session_stats(events_batch)
    assert sum(r["n_events"] for r in got) == batch.agg(F.sum("n_events")).collect()[0][0]
    assert len(got) == batch.count()


def test_streaming_turn_counter_matches_event_turns(spark, events_batch, events_stream):
    got = {
        (r["user_id"], r["event_id"]): r["turn_idx"]
        for r in _run_stream(spark, streaming_turn_counter(events_stream), "turns").collect()
    }
    want = {
        (r["user_id"], r["event_id"]): r["turn_idx"]
        for r in ev.event_turns(events_batch).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_exact_dedup(spark, tmp_path):
    """dropDuplicatesWithinWatermark keeps exactly one row per
    distinct text; batch fallback produces the same distinct set."""
    import datetime as dt
    import shutil

    from graph_data_science_spark.streaming import streaming_exact_dedup

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, "alpha text", t0),
        (2, "alpha text", t0 + dt.timedelta(minutes=1)),   # dup within watermark
        (3, "beta text", t0 + dt.timedelta(minutes=2)),
        (4, "gamma text", t0 + dt.timedelta(minutes=3)),
        (5, "beta text", t0 + dt.timedelta(minutes=4)),    # dup within watermark
    ]
    schema = "doc_id long, text string, ts timestamp"
    batch = spark.createDataFrame(rows, schema)
    src = tmp_path / "docs_stream_src"
    src.mkdir()
    batch.coalesce(1).write.parquet(str(src / "docs"))
    stream = spark.readStream.schema(batch.schema).parquet(str(src / "docs"))

    out = streaming_exact_dedup(stream, watermark="1 hour")
    import tempfile

    with tempfile.TemporaryDirectory(prefix="gds_dedup_ckpt_") as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    got = spark.table("dedup_stream").collect()
    texts = [r["text"] for r in got]
    assert sorted(texts) == ["alpha text", "beta text", "gamma text"]
    # batch fallback: same distinct text set, streaming flag respected
    b = streaming_exact_dedup(batch).collect()
    assert sorted(r["text"] for r in b) == ["alpha text", "beta text", "gamma text"]
    assert "_h" not in spark.table("dedup_stream").columns


def test_streaming_corpus_filter_matches_batch(spark, tmp_path):
    """corpus_filter is pure column expressions, so the SAME operator
    runs unchanged on a stream — the batch/streaming-unified claim for
    the stateless pipeline ops (filter runs per micro-batch with no
    state)."""
    import shutil
    import tempfile

    from graph_data_science_spark.pipeline.text import corpus_filter

    batch = ev.load_table(spark, SF_DIR, "documents")
    d = tmp_path / "docs_stream_src"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", d / "part-0.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(str(d))

    out = corpus_filter(stream)
    assert out.isStreaming
    with tempfile.TemporaryDirectory(prefix="gds_stream_ckpt_") as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName("docs_filtered")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["keep"], r["reasons"])
        for r in spark.sql("SELECT * FROM docs_filtered").collect()
    }
    want = {
        r["doc_id"]: (r["keep"], r["reasons"])
        for r in corpus_filter(batch).collect()
    }
    assert got == want and len(got) > 0
