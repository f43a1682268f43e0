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

Deliberate indexing deviation: the reference runs len(weights)
propagations and weight_i multiplies the i-th PROPAGATED state
(FastRP.java propagateEmbeddings); here weights[0] multiplies the
INITIAL state and weights[1:] the propagations — i.e. this engine's
[0, 1, 1] sums hops 1-2 where the reference's sums hops 2-3. Both
are documented FastRP variants (the init term is the paper's A^0
component); the engine's SQL oracle and fixtures pin THIS contract,
and the reference's RNG makes value parity impossible either way.
Callers wanting the reference's hop depths pass
``reference_iteration_semantics=True`` (which runs len(weights)
propagations with weight_i on the i-th propagated state, exactly the
FastRP.java:217-223 loop) — equivalent to prepending a 0 weight here.

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

import math
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
    normalization_strength: float = 0.0,
    node_self_influence: float = 0.0,
    property_ratio: float = 0.0,
    feature_properties: list[str] | None = None,
    reference_iteration_semantics: bool = False,
) -> DataFrame:
    """(id, embedding array<float>) — deterministic FastRP embeddings.

    Extended knobs (FastRPBaseConfig.java:43-90, FastRP.java:340-400):

    * ``normalization_strength`` β — each node's initial vector is
      scaled by degree^β (degree 0 → 1), so high-degree neighbors
      contribute more (β>0) or less (β<0) to the first propagation.
      Deviation: the reference scales the RAW sparse entries; here
      the scale applies to the L2-normalized base (identical at the
      default β=0, and per-row norms of the sparse base concentrate
      around a constant, so the neighbor weighting matches up to a
      near-constant factor that the post-mean normalization cancels).
    * ``node_self_influence`` — adds selfInfluence × the initial
      vector to the final embedding (addInitialVectorsToEmbedding,
      FastRP.java:203-213).
    * ``property_ratio`` + ``feature_properties`` — FastRP-Extended:
      the last round(dim × ratio) entries of every initial vector are
      Σ_f value_f × propertyVector_f instead of random, where each
      feature's propertyVector is its own deterministic ±sqrt(s)
      draw (FastRP.java:176-183,382-396); structural base shrinks to
      the remaining entries.
    * ``reference_iteration_semantics`` — index iterationWeights the
      way FastRP.java:217-223 does: len(weights) propagations, with
      weight_i multiplying the i-th PROPAGATED state (the initial
      state never enters the sum except via node_self_influence).
      Default False keeps this engine's documented contract
      (weights[0] on the init state), which the SQL oracle pins.
    """
    weights = iteration_weights if iteration_weights is not None else [0.0, 1.0, 1.0]
    if abs(normalization_strength) > 10:
        raise ValueError("normalization_strength out of sane range")
    if node_self_influence < 0:
        raise ValueError("The value of `nodeSelfInfluence` may not be negative.")
    if not weights and node_self_influence == 0:
        raise ValueError(
            "`iterationWeights` must not be empty if `nodeSelfInfluence` is zero."
        )
    if reference_iteration_semantics:
        # ref runs len(weights) propagations, weight_i on the i-th
        # propagated state == this engine's contract with a 0 prefix
        weights = [0.0, *weights]
    if not 0.0 <= property_ratio < 1.0:
        raise ValueError("property_ratio must be in [0, 1)")
    if property_ratio > 0.0 and not feature_properties:
        raise ValueError("property_ratio > 0 requires feature_properties")
    prop_dim = int(round(embedding_dim * property_ratio))
    base_dim = embedding_dim - prop_dim
    feats = list(feature_properties or [])
    edges = graph.view(weight_property=weighted).persist()

    # per-feature deterministic property vectors (tiny: F × prop_dim),
    # broadcast by closure into the Arrow batches
    prop_vectors = (
        _init_rows(
            -(np.arange(len(feats), dtype=np.int64) + 1), prop_dim, seed ^ 0x5EED
        )
        if prop_dim > 0
        else None
    )

    def init_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                yield pd.DataFrame({"id": [], "emb": []})
                continue
            ids = pdf["id"].to_numpy(np.int64)
            base = _l2_rows(_init_rows(ids, base_dim, seed))
            if prop_dim > 0:
                fmat = np.stack(
                    [pdf[c].to_numpy(np.float64) for c in feats], axis=1
                ).astype(np.float32)
                mat = np.concatenate([base, fmat @ prop_vectors], axis=1)
            else:
                mat = base
            if normalization_strength != 0.0:
                deg = pdf["_deg"].to_numpy(np.float64)
                scale = np.where(
                    deg == 0, 1.0, np.power(deg, normalization_strength)
                ).astype(np.float32)
                mat = mat * scale[:, None]
            yield pd.DataFrame({"id": ids, "emb": list(mat)})

    init_input = graph.vertices()
    if prop_dim > 0:
        if graph.nodes is None:
            raise ValueError("feature_properties requires graph.nodes")
        init_input = init_input.join(
            graph.nodes.select("id", *feats), "id", "left"
        ).na.fill({c: 0.0 for c in feats})
    if normalization_strength != 0.0:
        deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("double").alias("_deg")
        )
        init_input = init_input.join(deg, "id", "left").na.fill({"_deg": 0.0})

    state = init_input.mapInPandas(
        init_batch, f"id long, emb array<float>"
    ).localCheckpoint(eager=True)
    init_state = state

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

    acc = add_weighted(state, weights[0], acc) if weights else None

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

    if node_self_influence > 0:
        acc = add_weighted(init_state, node_self_influence, acc)
    edges.unpersist()
    if acc is None:
        return state.select("id", F.col("emb").alias("embedding"))
    return acc.select("id", F.col("acc").alias("embedding"))


# ---------------------------------------------------------------- exact


def _l2_cols(df: DataFrame) -> DataFrame:
    """Row-wise L2 normalization over an array<double> `emb` column,
    pure JVM expressions (sequential fold — same evaluation order as
    an ANSI-SQL windowed sum, so an oracle reproduces it bit-for-bit
    up to rounding)."""
    norm = F.sqrt(F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x))
    return df.select(
        "id",
        F.when(norm > 0, F.transform("emb", lambda x: x / norm))
        .otherwise(F.col("emb"))
        .alias("emb"),
    )


def fastrp_exact(
    spark: SparkSession,
    graph: Graph,
    embedding_dim: int = 8,
    iteration_weights: list[float] | None = None,
    seed: int = 42,
    reference_iteration_semantics: bool = False,
) -> DataFrame:
    """(id, pos, value) — FastRP with a closed-form two-round LCG init
    and pure JVM double arithmetic, value-reproducible in ANSI SQL.

    Same semantics as :func:`fastrp` (very sparse ±sqrt(3) projection
    with p=1/6 per sign, L2-normalized neighbor-mean iterations,
    iterationWeights-weighted sum — FastRP.java:56-58,
    FastRPBaseConfig.java:43-69); only the hash differs: instead of
    splitmix64 (uint64 wrap-around, not expressible in overflow-
    checked SQL engines) the per-(id, dim) uniform is

        h1 = pmod(pmod(id, 2^31)*2654435761 + pos*40503 + seed, 2^31)
        u  = pmod(h1*1103515245 + 12345, 2^31) / 2^31

    (id is reduced mod 2^31 BEFORE the multiply: pmod(id,2^31) *
    2654435761 < 2^62, so the product never overflows signed 64-bit —
    with raw ids |id| >~ 3.5e9 would wrap silently in non-ANSI Spark
    while erroring/diverging in an ANSI oracle)

    — exact in BIGINT arithmetic everywhere. This is the oracle-
    checked driver path; the numpy/Arrow :func:`fastrp` is the scale
    path (float32 kernels, checkpointed iterations).

    ``reference_iteration_semantics`` mirrors :func:`fastrp`: True
    applies weight_i to the i-th propagated state (FastRP.java:217-223)
    by prepending a 0 weight to this engine's contract.
    """
    weights = iteration_weights if iteration_weights is not None else [0.0, 1.0, 1.0]
    if reference_iteration_semantics:
        weights = [0.0, *weights]
    edges = graph.view()
    verts = graph.vertices()
    s3 = math.sqrt(3.0)
    m31 = 2**31

    def init_val(pos):
        h1 = F.pmod(
            F.pmod(F.col("id"), F.lit(m31)) * F.lit(2654435761)
            + pos * F.lit(40503)
            + F.lit(seed),
            F.lit(m31),
        )
        h2 = F.pmod(h1 * F.lit(1103515245) + F.lit(12345), F.lit(m31))
        u = h2.cast("double") / F.lit(float(m31))
        return (
            F.when(u < 1.0 / 6.0, F.lit(s3))
            .when(u < 1.0 / 3.0, F.lit(-s3))
            .otherwise(F.lit(0.0))
        )

    state = _l2_cols(
        verts.select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(embedding_dim - 1)), init_val
            ).alias("emb"),
        )
    )

    acc = None
    if weights[0] != 0.0:
        acc = state.select(
            "id", F.transform("emb", lambda x: x * F.lit(float(weights[0]))).alias("acc")
        )
    zero_vec = F.array(*[F.lit(0.0)] * embedding_dim)
    for w in weights[1:]:
        gathered = (
            edges.join(state.select(F.col("id").alias("dst"), "emb"), "dst")
            .select("src", F.posexplode("emb").alias("pos", "val"))
            .groupBy(F.col("src").alias("id"), "pos")
            .agg(F.avg("val").alias("v"))
            .groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("emb")
            )
        )
        state = _l2_cols(
            verts.join(gathered, "id", "left").select(
                "id", F.coalesce("emb", zero_vec).alias("emb")
            )
        )
        if w != 0.0:
            contrib = state.select(
                "id", F.transform("emb", lambda x: x * F.lit(float(w))).alias("_c")
            )
            if acc is None:
                acc = contrib.withColumnRenamed("_c", "acc")
            else:
                acc = acc.join(contrib, "id").select(
                    "id", F.zip_with("acc", "_c", lambda a, b: a + b).alias("acc")
                )
    out = acc if acc is not None else state.withColumnRenamed("emb", "acc")
    return out.select("id", F.posexplode("acc").alias("pos", "value")).select(
        "id", "pos", F.round("value", 6).alias("value")
    )
