"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: JVM-side
  zip_with/aggregate dot products (whole-stage codegen, no Python),
  grouped top-k window. O(Q x N) — fine when the query set is
  bounded or as the per-bucket kernel below.
* LSH-bucketed ANN — random-hyperplane signatures (deterministic
  md5-seeded hyperplanes) bucket the corpus; search only within the
  query's bucket(s). The scale path: shuffle keyed by bucket, each
  bucket a bounded brute-force.
* embedding cosine near-dup pairs for dedup pipelines.

Cosine here = dot(a,b) / (||a|| * ||b||) accumulated left-to-right in
float64 — deterministic and engine-portable (the DuckDB oracle
computes the identical expression).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact brute force.

    Ties broken by ascending neighbor id (explicit for parity).
    The corpus side is broadcast when small; for corpus >> memory use
    `lsh_topk` instead.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    pairs = q.crossJoin(c).where(F.col("query_id") != F.col("neighbor_id"))
    sim = _dot(F.col("_qv"), F.col("_cv")) / (
        _norm(F.col("_qv")) * _norm(F.col("_cv"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket int) — sign pattern against n deterministic
    random hyperplanes (seeded numpy, Arrow-batched kernel)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float64)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                yield pd.DataFrame({"vec_id": [], "bucket": []})
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (mat @ planes.T) > 0
            bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(), "bucket": bucket})

    return df.select(id_col, vec_col).mapInPandas(batch, "vec_id long, bucket int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket; per-bucket exact cosine + window top-k. Recall rises with
    fewer planes (bigger buckets) — the classic knob."""
    csig = hyperplane_signatures(corpus, dim, n_planes, seed, id_col, vec_col)
    qsig = hyperplane_signatures(queries, dim, n_planes, seed, id_col, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).join(csig.select(F.col("vec_id").alias("neighbor_id"), "bucket"), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).join(qsig.select(F.col("vec_id").alias("query_id"), "bucket"), "query_id")
    pairs = q.join(c, "bucket").where(F.col("query_id") != F.col("neighbor_id"))
    sim = _dot(F.col("_qv"), F.col("_cv")) / (
        _norm(F.col("_qv")) * _norm(F.col("_cv"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def cosine_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine) — near-dup pairs above threshold, LSH-blocked."""
    sig = hyperplane_signatures(df, dim, n_planes, seed, id_col, vec_col)
    v = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")).join(
        sig.select(F.col("vec_id").alias("_id"), "bucket"), "_id"
    )
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "bucket")
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    return (
        pairs.withColumn("cosine", F.round(sim, 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )
