"""Deterministic corpus sharding — the "global shuffle + write N
shards" step every large-scale training-data pipeline ends with.

Training jobs want (a) documents shuffled so consecutive samples are
decorrelated, (b) a fixed number of roughly-equal shards so data
loaders stripe cleanly, (c) bit-reproducibility so re-running the
pipeline yields byte-identical shards. A `df.orderBy(rand())` gives
none of that at 100 TB: rand() is partition-order-dependent and a
global sort of the corpus is a full-data shuffle PLUS a total order.

This module instead derives both the shard and the within-shard
order from the same closed-form per-document uniform draw used by
pipeline.sampling (two LCG rounds + one squaring round on the doc
id, integer-exact in BIGINT arithmetic, reproducible in ANSI SQL):

    u      = uniform(doc_id, seed)   in (0, 1]
    shard  = min(floor(u * n_shards), n_shards - 1)
    order  = u within the shard

One hash-partitioned shuffle keyed by ``shard`` (no global sort —
the only total order is per-shard, sorted inside each task), then a
``partitionBy(shard)`` parquet write. Shard sizes concentrate around
|corpus| / n_shards (multinomial; relative spread ~ 1/sqrt(n/k)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.sampling import _uniform


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Add ``shard`` (0..n_shards-1) and ``shuffle_pos`` (the uniform
    draw ordering documents within their shard) — deterministic in
    (id, seed), independent of partitioning and row order."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    u = _uniform(id_col, seed)
    return df.withColumn("shuffle_pos", u).withColumn(
        "shard",
        F.least(
            F.floor(F.col("shuffle_pos") * F.lit(n_shards)),
            F.lit(n_shards - 1),
        ).cast("int"),
    )


def shard_stats(assigned: DataFrame, size_col: str | None = None) -> DataFrame:
    """Per-shard manifest: document count (+ total of ``size_col``
    when given) — what a loader needs to stripe work, and what the
    balance check below reads."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if size_col is not None:
        aggs.append(F.sum(size_col).alias("total_size"))
    return assigned.groupBy("shard").agg(*aggs)


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
    files_per_shard: int = 1,
) -> DataFrame:
    """Shuffle-and-shard the corpus to ``path`` as parquet partitioned
    by ``shard``; returns the shard manifest.

    The plan is one shuffle keyed by shard (coalesced to
    ``files_per_shard`` tasks per shard via an explicit repartition on
    (shard, file bucket)) with a per-task sort on ``shuffle_pos`` —
    at 100 TB this is the minimum data movement that yields stable,
    balanced, internally-shuffled shards.
    """
    assigned = assign_shards(df, n_shards, id_col=id_col, seed=seed)
    bucket = F.pmod(
        F.floor(F.col("shuffle_pos") * F.lit(n_shards * files_per_shard)),
        F.lit(files_per_shard),
    )
    (
        assigned.repartition(
            n_shards * files_per_shard, F.col("shard"), bucket
        )
        .sortWithinPartitions("shard", "shuffle_pos", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    spark = df.sparkSession
    return shard_stats(
        spark.read.parquet(path).withColumn(
            "shard", F.col("shard").cast("int")
        )
    )
