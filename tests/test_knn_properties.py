"""KNN over arbitrary node properties — the SimilarityComputer
dispatch (reference: algo/src/main/java/org/neo4j/gds/similarity/
knn/SimilarityComputer.java:33-90): numeric scalars use
1/(1+|a-b|), long arrays use Jaccard, float/double arrays cosine."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.knn import _similarity_expr, knn


def test_knn_scalar_property_nearest_by_abs_diff(spark):
    # values on a line: nearest-by-|a-b| is unambiguous
    vals = [(1, 0.0), (2, 10.0), (3, 11.0), (4, 30.0), (5, 31.5)]
    df = spark.createDataFrame(vals, "id long, score double")
    res = knn(spark, df, id_col="id", vec_col="score", top_k=1,
              max_iterations=10, random_joins=4)
    got = {r["node1"]: r["node2"] for r in res.collect()}
    # each node's single nearest neighbour by |a-b|
    assert got[2] == 3 and got[3] == 2
    assert got[4] == 5 and got[5] == 4
    assert got[1] == 2  # |0-10| < |0-11| < ...
    sims = {r["node1"]: r["similarity"] for r in res.collect()}
    assert sims[2] == pytest.approx(1.0 / 2.0, abs=1e-6)  # 1/(1+1)


def test_knn_long_array_property_jaccard(spark):
    rows = [
        (1, [1, 2, 3]),
        (2, [1, 2, 3, 4]),   # J(1,2)=3/4
        (3, [1, 9]),          # J(1,3)=1/4
        (4, [7, 8]),          # disjoint from 1
    ]
    df = spark.createDataFrame(rows, "id long, tags array<long>")
    res = knn(spark, df, id_col="id", vec_col="tags", top_k=1,
              max_iterations=10, random_joins=4)
    got = {r["node1"]: (r["node2"], r["similarity"]) for r in res.collect()}
    assert got[1][0] == 2
    assert got[1][1] == pytest.approx(0.75, abs=1e-6)
    assert got[2][0] == 1


def test_similarity_expr_matches_reference_formulas(spark):
    df = spark.createDataFrame(
        [(2.0, 5.0)], "a double, b double"
    ).select(_similarity_expr("scalar", F.col("a"), F.col("b")).alias("s"))
    assert df.collect()[0]["s"] == pytest.approx(1.0 / 4.0)
    df2 = spark.createDataFrame(
        [([1, 2], [2, 3])], "a array<long>, b array<long>"
    ).select(
        _similarity_expr("jaccard", F.col("a"), F.col("b")).alias("j"),
        _similarity_expr("overlap", F.col("a"), F.col("b")).alias("o"),
    )
    r = df2.collect()[0]
    assert r["j"] == pytest.approx(1.0 / 3.0)
    assert r["o"] == pytest.approx(1.0 / 2.0)


def test_knn_auto_dispatch_cosine_unchanged(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "id long, emb array<double>")
    res = knn(spark, df, id_col="id", vec_col="emb", top_k=1,
              max_iterations=8, random_joins=2)
    got = {r["node1"]: r["node2"] for r in res.collect()}
    assert got[1] == 2 and got[2] == 1


def test_knn_randomwalk_initial_sampler(spark):
    """KnnBaseConfig.initialSampler RANDOMWALK
    (RandomWalkKnnSampler.java): graph-neighborhood-seeded init, same
    converged top-k on a small instance, and the option validates."""
    import numpy as np

    from graph_data_science_spark.algorithms.knn import knn
    from tests.conftest import edge_df

    rng = np.random.default_rng(3)
    nodes = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=4)]) for i in range(20)],
        "id long, embedding array<double>",
    )
    edges = edge_df(spark, [(i, (i + 1) % 20) for i in range(20)])

    uni = {
        (r["node1"], r["node2"])
        for r in knn(spark, nodes, top_k=3, seed=9).collect()
    }
    rw = {
        (r["node1"], r["node2"])
        for r in knn(
            spark, nodes, top_k=3, seed=9,
            initial_sampler="randomwalk", graph_edges=edges,
        ).collect()
    }
    # NN-descent converges to the same exact top-k from either init
    # on this tiny instance
    assert rw == uni

    import pytest

    with pytest.raises(ValueError, match="requires graph_edges"):
        knn(spark, nodes, initial_sampler="randomwalk")
