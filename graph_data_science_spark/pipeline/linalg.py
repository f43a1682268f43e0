"""Distributed PCA / whitening over an embedding column.

The dimensionality-reduction step of a 100-TB embedding pipeline
(SemDeDup-style corpora PCA-reduce before clustering; whitening
conditions embeddings for cosine ANN). No reference analog — GDS
embeds (FastRP/GraphSAGE/Node2Vec) but never decomposes; included
for the training-data toolkit alongside jl_project (the oblivious
alternative when a second pass is too expensive).

Exactly the classic two-phase shape Spark's own ML PCA uses, built
here directly on the DataFrame API so it composes with the rest of
the pipeline:

1. **fit** — one `mapInPandas` pass emits per-batch moment partials
   (count, sum vector, flattened sum of outer products): O(d + d^2)
   doubles per batch, a few KB each. The driver reduces the partial
   rows (numpy float64) and eigendecomposes the d x d covariance —
   d = 64 here, so the driver-side work is microseconds and the
   collected data is O(n_batches), never O(n_rows).
2. **project** — the top-k eigenvectors become plan literals; each
   output coordinate is one left-to-right float64 fold over the
   input vector (the same codegen'd kernel as jl_project /
   kmeans_lloyd assignment). No shuffle: projection runs at scan
   speed, which is the property that matters at 100 TB.

Determinism: eigh of a fixed matrix is deterministic, and component
signs are canonicalized (largest-|component| coordinate positive).
The covariance itself reduces float64 partials in batch order, so it
is bit-stable for a fixed partitioning and ~1e-12-stable across
partitionings — fine for the invariant oracle and tests; the
value-exact-everywhere alternative (decimal-summed posexplode of all
d^2 products) costs a d^2-wide explode per row and is the wrong
trade at scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.ann import _dot


def pca_fit(
    df: DataFrame,
    in_dim: int,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Fit PCA -> {"mean": (d,), "components": (k, d) row-major,
    "eigvals": (k,), "n": int}. Components are unit-norm, orthogonal,
    sorted by eigenvalue descending, signs canonicalized."""
    if not 1 <= k <= in_dim:
        raise ValueError("k must be in [1, in_dim]")
    d = in_dim

    def moments(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if mat.shape[1] != d:
                raise ValueError(f"expected dim {d}, got {mat.shape[1]}")
            yield pd.DataFrame(
                {
                    "n": [mat.shape[0]],
                    "s": [mat.sum(axis=0).tolist()],
                    "ss": [(mat.T @ mat).ravel().tolist()],
                }
            )

    parts = (
        df.select(vec_col)
        .mapInPandas(moments, "n long, s array<double>, ss array<double>")
        .collect()
    )  # O(n_batches) rows of O(d^2) doubles — bounded by parallelism
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = int(sum(p["n"] for p in parts))
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    ss = np.sum([np.asarray(p["ss"]) for p in parts], axis=0).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    eigvals = np.maximum(w[order], 0.0)
    comps = v[:, order].T  # (k, d)
    for i in range(k):  # canonical sign: largest-|x| coord positive
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "eigvals": eigvals,
        "n": n,
    }


def pca_project(
    df: DataFrame,
    model: dict,
    whiten: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eps: float = 1e-12,
) -> DataFrame:
    """(vec_id, proj_0..proj_{k-1}): proj_j = (x - mean) . comp_j,
    divided by sqrt(eigval_j) when whitening (unit variance per
    output dim). Pure column folds over plan-literal components."""
    from graph_data_science_spark.util import widen_scan

    df = widen_scan(df)
    comps = model["components"]
    mean = model["mean"]
    eig = model["eigvals"]
    cols = [F.col(id_col).alias("vec_id")]
    for j in range(comps.shape[0]):
        w = F.array(*[F.lit(float(x)) for x in comps[j]])
        offset = float(np.dot(mean, comps[j]))
        expr = _dot(F.col(vec_col), w) - F.lit(offset)
        if whiten:
            expr = expr / F.lit(float(np.sqrt(eig[j]) + eps))
        cols.append(F.round(expr, 6).alias(f"proj_{j}"))
    return df.select(*cols)


def pca_embeddings(
    df: DataFrame,
    in_dim: int,
    k: int = 8,
    whiten: bool = False,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, dict]:
    """Fit + project in one call -> (projected DF, model dict)."""
    model = pca_fit(df, in_dim, k, vec_col=vec_col, id_col=id_col)
    return pca_project(df, model, whiten=whiten, vec_col=vec_col, id_col=id_col), model
