"""Tests: jl_project, group_split, PCA/whitening, HyperANF."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.algorithms.hyperanf import (
    effective_diameter,
    neighborhood_function,
)
from graph_data_science_spark.algorithms.msbfs import bfs_distances
from graph_data_science_spark.pipeline.ann import jl_project, jl_signs
from graph_data_science_spark.pipeline.linalg import (
    pca_embeddings,
    pca_fit,
    pca_project,
)
from graph_data_science_spark.pipeline.sampling import group_split
from tests.conftest import edge_df


def _emb_df(spark, n=60, d=8, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, d))
    base[:, 0] *= 5.0  # dominant direction
    base[:, 1] *= 2.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        base.astype(np.float32).astype(np.float64),
    )


# ---------------- jl_project ----------------


def test_jl_project_matches_numpy(spark):
    df, mat = _emb_df(spark, n=40, d=8)
    out = jl_project(df, in_dim=8, out_dim=4, seed=7).orderBy("vec_id").collect()
    signs = np.array([jl_signs(j, 8, 7) for j in range(4)])  # (4, 8)
    expect = (mat @ signs.T) / math.sqrt(4.0)
    got = np.array([[r[f"proj_{j}"] for j in range(4)] for r in out])
    assert np.allclose(got, expect, atol=2e-6)


def test_jl_preserves_distances_statistically(spark):
    df, mat = _emb_df(spark, n=50, d=8)
    k = 8
    out = jl_project(df, in_dim=8, out_dim=k, seed=1).orderBy("vec_id").collect()
    proj = np.array([[r[f"proj_{j}"] for j in range(k)] for r in out])
    # JL with k=d sign projection: norms preserved in expectation;
    # check the mean ratio is within a loose band
    no = np.linalg.norm(mat, axis=1)
    np_ = np.linalg.norm(proj, axis=1)
    ratio = np.mean(np_ / no)
    assert 0.7 < ratio < 1.3


def test_jl_project_validates(spark):
    df, _ = _emb_df(spark, n=5, d=8)
    with pytest.raises(ValueError):
        jl_project(df, in_dim=8, out_dim=0)


# ---------------- group_split ----------------


def test_group_split_constant_within_group(spark):
    rows = [(f"c{i % 7}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "conv_id string, x long")
    out = group_split(df, "conv_id", seed=5)
    per_group = (
        out.groupBy("conv_id")
        .agg(F.count_distinct("split").alias("k"))
        .collect()
    )
    assert all(r["k"] == 1 for r in per_group)


def test_group_split_shares_roughly_hold(spark):
    rows = [(f"g{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "conv_id string")
    out = group_split(df, "conv_id", shares=(0.8, 0.1, 0.1), seed=2)
    counts = dict(
        (r["split"], r["n"])
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert set(counts) == {"train", "val", "test"}


def test_group_split_validates(spark):
    df = spark.createDataFrame([("a",)], "conv_id string")
    with pytest.raises(ValueError):
        group_split(df, shares=(0.5, 0.4), names=("a", "b", "c"))
    with pytest.raises(ValueError):
        group_split(df, shares=(0.5, 0.4), names=("a", "b"))


def test_group_split_deterministic(spark):
    rows = [(f"g{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "conv_id string")
    a = sorted((r["conv_id"], r["split"]) for r in group_split(df, seed=9).collect())
    b = sorted(
        (r["conv_id"], r["split"])
        for r in group_split(df.repartition(7), seed=9).collect()
    )
    assert a == b


# ---------------- PCA ----------------


def test_pca_fit_matches_numpy(spark):
    df, mat = _emb_df(spark, n=80, d=8)
    model = pca_fit(df, in_dim=8, k=8)
    cov = np.cov(mat, rowvar=False, bias=True)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert np.allclose(model["eigvals"], w, rtol=1e-6, atol=1e-8)
    # orthonormal components
    C = model["components"]
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-8)


def test_pca_project_variance_matches_eigvals(spark):
    df, _ = _emb_df(spark, n=100, d=8)
    proj, model = pca_embeddings(df, in_dim=8, k=3)
    rows = proj.collect()
    got = np.array([[r[f"proj_{j}"] for j in range(3)] for r in rows])
    var = got.var(axis=0)  # population variance, matches bias=True cov
    assert np.allclose(var, model["eigvals"][:3], rtol=1e-3)
    # components sorted descending
    e = model["eigvals"]
    assert all(e[i] >= e[i + 1] - 1e-12 for i in range(len(e) - 1))


def test_pca_whiten_unit_variance(spark):
    df, _ = _emb_df(spark, n=100, d=8)
    proj, model = pca_embeddings(df, in_dim=8, k=4, whiten=True)
    got = np.array(
        [[r[f"proj_{j}"] for j in range(4)] for r in proj.collect()]
    )
    assert np.allclose(got.var(axis=0), 1.0, rtol=5e-3)


def test_pca_validates(spark):
    df, _ = _emb_df(spark, n=10, d=8)
    with pytest.raises(ValueError):
        pca_fit(df, in_dim=8, k=0)
    with pytest.raises(ValueError):
        pca_fit(df.where(F.lit(False)), in_dim=8, k=2)


# ---------------- HyperANF ----------------


def _ring_graph(spark, n=64):
    pairs = [(i, (i + 1) % n) for i in range(n)]
    return Graph(name="ring", edges=edge_df(spark, pairs))


def test_hyperanf_matches_exact_nf(spark):
    # two components: a 40-ring and a 12-clique
    n = 40
    pairs = [(i, (i + 1) % n) for i in range(n)]
    pairs += [(100 + i, 100 + j) for i in range(12) for j in range(i + 1, 12)]
    g = Graph(name="nf", edges=edge_df(spark, pairs))
    nf = neighborhood_function(spark, g, max_iter=25, lg_k=12)
    got = {r["t"]: r["n_pairs"] for r in nf.collect()}
    # exact via BFS distances
    dist = bfs_distances(spark, g, directed=False)
    exact = {
        r["dist"]: r["n"]
        for r in dist.groupBy("dist").agg(F.count("*").alias("n")).collect()
    }
    cum = 0
    exact_cum = {}
    for t in sorted(exact):
        cum += exact[t]
        exact_cum[t] = cum
    for t, est in got.items():
        if t in exact_cum:
            assert abs(est - exact_cum[t]) / exact_cum[t] < 0.12, (t, est, exact_cum[t])
    # monotone within estimator jitter
    ts = sorted(got)
    assert all(got[b] >= got[a] * 0.999 for a, b in zip(ts, ts[1:]))


def test_hyperanf_n0_is_exact(spark):
    g = _ring_graph(spark, 32)
    nf = neighborhood_function(spark, g, max_iter=1)
    row0 = nf.where(F.col("t") == 0).first()
    assert row0["n_pairs"] == 32.0


def test_effective_diameter_ring(spark):
    # 16-ring: eccentricity 8 everywhere; d_eff(0.9) should land ~7-8
    g = _ring_graph(spark, 16)
    row = effective_diameter(spark, g, alpha=0.9, max_iter=20).first()
    assert 5.0 <= row["effective_diameter"] <= 8.5
    assert row["n_connected_pairs"] == pytest.approx(256.0, rel=0.1)


def test_hyperanf_validates(spark):
    g = _ring_graph(spark, 8)
    with pytest.raises(ValueError):
        neighborhood_function(spark, g, lg_k=2)
    with pytest.raises(ValueError):
        effective_diameter(spark, g, alpha=0.0)


def test_engine_nf_procs(spark):
    from graph_data_science_spark.engine import GdsEngine

    g = _ring_graph(spark, 12)
    eng = GdsEngine(spark)
    nf = eng.neighborhood_function(g, max_iter=10).stream()
    assert nf.columns == ["t", "n_pairs"]
    assert nf.count() >= 2
    ed = eng.effective_diameter(g, alpha=0.9, max_iter=10).stream()
    assert ed.first()["effective_diameter"] >= 1.0
