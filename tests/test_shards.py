"""Corpus sharding tests: determinism, coverage, balance, round-trip."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.shards import (
    assign_shards,
    shard_stats,
    write_shards,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )


def test_assign_shards_deterministic_and_partition_independent(spark):
    docs = _docs(spark)
    a = {
        r["doc_id"]: (r["shard"], r["shuffle_pos"])
        for r in assign_shards(docs, 8).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["shuffle_pos"])
        for r in assign_shards(docs.repartition(7), 8).collect()
    }
    assert a == b
    assert set(s for s, _ in a.values()) <= set(range(8))


def test_assign_shards_balance_and_seed_sensitivity(spark):
    docs = _docs(spark, 800)
    counts = {
        r["shard"]: r["n_docs"]
        for r in shard_stats(assign_shards(docs, 8)).collect()
    }
    assert len(counts) == 8
    # multinomial(800, 1/8): mean 100, sd ~9.4 — 5 sd bounds
    assert all(50 <= c <= 150 for c in counts.values()), counts
    other = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(docs, 8, seed=7).collect()
    }
    base = {r["doc_id"]: r["shard"] for r in assign_shards(docs, 8).collect()}
    moved = sum(1 for d in base if base[d] != other[d])
    assert moved > 400  # a new seed reshuffles most documents


def test_write_shards_roundtrip(spark, tmp_path):
    docs = _docs(spark, 300)
    path = str(tmp_path / "shards")
    manifest = write_shards(docs, path, n_shards=4)
    rows = manifest.collect()
    assert {r["shard"] for r in rows} == {0, 1, 2, 3}
    assert sum(r["n_docs"] for r in rows) == 300
    back = spark.read.parquet(path)
    # every document exactly once, payload intact
    assert back.count() == 300
    assert back.select("doc_id").distinct().count() == 300
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got[5] == "doc 5"
    # within a shard, rows are ordered by the shuffle position
    one = back.where(F.col("shard") == 0).collect()
    pos = [r["shuffle_pos"] for r in one]
    assert pos == sorted(pos)


def test_assign_shards_validation(spark):
    with pytest.raises(ValueError):
        assign_shards(_docs(spark, 10), 0)
