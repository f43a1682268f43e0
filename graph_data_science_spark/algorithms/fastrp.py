"""FastRP — fast random-projection node embeddings.

Reference: /root/reference/algo/src/main/java/org/neo4j/gds/
embeddings/fastrp/FastRP.java — very sparse random projection
(Achlioptas): initial vector entries are

    +sqrt(s) with prob 1/(2s),  -sqrt(s) with prob 1/(2s),  0 else
    (s = 3; entries scaled 1/sqrt(dim); FastRP.java:56-58)

then per iteration the embedding becomes the (weighted) mean of
neighbor embeddings, L2-normalized, and the final embedding is the
iterationWeights-weighted sum of the per-iteration embeddings
(defaults iterationWeights = [0.0, 1.0, 1.0],
FastRPBaseConfig.java:43-69).

Determinism: the reference seeds per node (random seed + nodeId);
here the init matrix is a closed-form splitmix64 hash of
(seed, node id, dimension) computed with vectorized numpy inside
``mapInPandas`` — partition-independent, reproducible at any
parallelism (the input_hint's no-per-row-Python rule: all kernels are
Arrow-batched numpy).

The neighbor-mean gather is ``applyInPandas`` over the dst groups of
(edge ⋈ state) — one shuffle per iteration, the same message-exchange
shape as every other superstep in this engine.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph

_SPARSITY = 3.0


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    return x ^ (x >> np.uint64(31))


def _init_rows(ids: np.ndarray, dim: int, seed: int) -> np.ndarray:
    """Sparse ±sqrt(3) init matrix for a batch of node ids."""
    s = np.float32(np.sqrt(_SPARSITY))
    h = _mix64(
        (ids[:, None].astype(np.uint64) * np.uint64(0x100000001B3))
        ^ np.arange(dim, dtype=np.uint64)[None, :]
        ^ np.uint64(seed)
    )
    u = (h % np.uint64(1 << 24)).astype(np.float64) / float(1 << 24)
    out = np.zeros((len(ids), dim), dtype=np.float32)
    out[u < 1.0 / (2 * _SPARSITY)] = s
    out[(u >= 1.0 / (2 * _SPARSITY)) & (u < 1.0 / _SPARSITY)] = -s
    return out


def _l2_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.sqrt((mat.astype(np.float64) ** 2).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return (mat / norms).astype(np.float32)


def fastrp(
    spark: SparkSession,
    graph: Graph,
    embedding_dim: int = 128,
    iteration_weights: list[float] | None = None,
    seed: int = 42,
    weighted: bool = False,
) -> DataFrame:
    """(id, embedding array<float>) — deterministic FastRP embeddings."""
    weights = iteration_weights if iteration_weights is not None else [0.0, 1.0, 1.0]
    edges = graph.view(weight_property=weighted).persist()

    def init_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                yield pd.DataFrame({"id": [], "emb": []})
                continue
            ids = pdf["id"].to_numpy(np.int64)
            mat = _l2_rows(_init_rows(ids, embedding_dim, seed))
            yield pd.DataFrame({"id": ids, "emb": list(mat)})

    state = graph.vertices().mapInPandas(
        init_batch, f"id long, emb array<float>"
    ).localCheckpoint(eager=True)

    acc = None  # weighted sum of iteration embeddings

    def add_weighted(cur: DataFrame, w: float, acc: DataFrame | None) -> DataFrame | None:
        if w == 0.0:
            return acc
        contrib = cur.select("id", F.transform("emb", lambda x: x * F.lit(float(w))).alias("_c"))
        if acc is None:
            return contrib.withColumnRenamed("_c", "acc")
        return (
            acc.join(contrib, "id")
            .select("id", F.zip_with("acc", "_c", lambda a, b: a + b).alias("acc"))
        )

    acc = add_weighted(state, weights[0], acc)

    for w in weights[1:]:
        # weighted neighbor mean, JVM-side: posexplode the neighbor
        # embeddings to (src, pos, val) and partial+final aggregate —
        # shuffle volume dim × |V| after map-side combine, no Python
        exploded = (
            edges.join(state.select(F.col("id").alias("dst"), "emb"), "dst")
            .select(
                "src",
                "weight",
                F.posexplode("emb").alias("pos", "val"),
            )
        )
        gathered = (
            exploded.groupBy(F.col("src").alias("id"), "pos")
            .agg(
                F.sum(F.col("val") * F.col("weight")).alias("_num"),
                F.sum("weight").alias("_den"),
            )
            .withColumn("v", (F.col("_num") / F.col("_den")).cast("float"))
            .groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("emb")
            )
        )

        def norm_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                if pdf.empty:
                    yield pd.DataFrame({"id": [], "emb": []})
                    continue
                mat = np.stack(pdf["emb"].to_numpy())
                yield pd.DataFrame({"id": pdf["id"].to_numpy(), "emb": list(_l2_rows(mat))})

        state = (
            graph.vertices()
            .join(gathered, "id", "left")
            .select(
                "id",
                F.coalesce(
                    F.col("emb"),
                    F.array(*[F.lit(0.0).cast("float")] * embedding_dim),
                ).alias("emb"),
            )
            .mapInPandas(norm_batch, "id long, emb array<float>")
            .localCheckpoint(eager=True)
        )
        acc = add_weighted(state, w, acc)

    edges.unpersist()
    if acc is None:
        return state.select("id", F.col("emb").alias("embedding"))
    return acc.select("id", F.col("acc").alias("embedding"))
