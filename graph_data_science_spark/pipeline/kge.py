"""Knowledge-graph-embedding link scoring (TransE / DistMult) —
GDS 2.5 `gds.ml.kge.predict` analog (the 2.0-era reference predates
it; its embedding lineage is FastRP/Node2Vec/GraphSAGE, which this
repo already ships — KGE scoring is the missing inference-side
kernel for edge plausibility over any node-embedding column).

score_transe(h, r, t)   = -||h + r - t||_2      (Bordes et al. 2013)
score_distmult(h, r, t) = sum_j h_j r_j t_j     (Yang et al. 2015)

Spark plan: two broadcast-free joins (edge endpoints to the
embedding table) and pure column expressions. TransE expands the
norm into dot products —
    ||h + r - t||^2 = h.h + r.r + t.t + 2 h.r - 2 h.t - 2 r.t
— so every term is an in-order `F.aggregate` dot product, exactly
reproducible by DuckDB's list_dot_product for value-exact oracles
(elementwise-then-sum forms would depend on summation order).

The default relation embedding is the closed-form LCG vector
    r_j = ((j * 2654435761) mod 2^31) / 2^31 - 0.5,  j = 1..dim
shared literally between the engine and the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.ann import _dot

M31 = 2_147_483_648


def lcg_relation(dim: int) -> list[float]:
    """Deterministic relation embedding, exact in binary floating
    point (integer LCG scaled by a power of two)."""
    return [((j * 2654435761) % M31) / M31 - 0.5 for j in range(1, dim + 1)]


def kge_score(
    nodes: DataFrame,
    edges: DataFrame,
    relation: list[float] | None = None,
    model: str = "transe",
    id_col: str = "id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(src, dst, score) — higher = more plausible edge.

    ``nodes``: (id, embedding); ``edges``: (src, dst); ``relation``:
    the relation-type embedding (defaults to the LCG vector of the
    node-embedding dimension, read from the first row)."""
    if relation is None:
        first = nodes.select(F.size(F.col(emb_col)).alias("d")).limit(1).collect()
        if not first:
            raise ValueError("nodes is empty; pass `relation` explicitly")
        relation = lcg_relation(int(first[0]["d"]))
    r = F.array(*[F.lit(float(v)) for v in relation])

    h = nodes.select(
        F.col(id_col).alias("src"),
        F.col(emb_col).cast("array<double>").alias("_h"),
    )
    t = nodes.select(
        F.col(id_col).alias("dst"),
        F.col(emb_col).cast("array<double>").alias("_t"),
    )
    e = edges.select("src", "dst").join(h, "src").join(t, "dst")
    if model == "transe":
        s2 = (
            _dot(F.col("_h"), F.col("_h"))
            + _dot(r, r)
            + _dot(F.col("_t"), F.col("_t"))
            + F.lit(2.0) * _dot(F.col("_h"), r)
            - F.lit(2.0) * _dot(F.col("_h"), F.col("_t"))
            - F.lit(2.0) * _dot(r, F.col("_t"))
        )
        score = -F.sqrt(F.greatest(s2, F.lit(0.0)))
    elif model == "distmult":
        ht = F.zip_with(F.col("_h"), F.col("_t"), lambda a, b: a * b)
        score = _dot(ht, r)
    else:
        raise ValueError(f"unknown KGE model {model!r}")
    return e.select("src", "dst", F.round(score, 6).alias("score"))
