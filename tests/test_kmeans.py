"""Deterministic exact Lloyd k-means (pipeline/ann.kmeans_lloyd)."""

import pytest

from graph_data_science_spark.pipeline.ann import kmeans_lloyd


@pytest.fixture(scope="module")
def blobs(spark):
    # two well-separated blobs in 2-D; init = vectors of the 2 smallest
    # ids, so id 0 (blob A) and id 1 (blob B) seed one centroid each
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0])]
    rows += [(i, [0.1 * i, -0.1 * i]) for i in range(2, 7)]
    rows += [(i, [10.0 + 0.1 * (i - 7), 10.0 - 0.1 * (i - 7)]) for i in range(7, 12)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_separable_blobs(blobs):
    out = kmeans_lloyd(blobs, k=2, iterations=3).collect()
    by_id = {r["vec_id"]: r["cluster"] for r in out}
    a = {by_id[0]} | {by_id[i] for i in range(2, 7)}
    b = {by_id[1]} | {by_id[i] for i in range(7, 12)}
    assert a == {0} and b == {1}
    assert all(r["dist2"] >= 0 for r in out)


def test_deterministic(blobs):
    r1 = sorted(map(tuple, kmeans_lloyd(blobs, k=3, iterations=2).collect()))
    r2 = sorted(map(tuple, kmeans_lloyd(blobs, k=3, iterations=2).collect()))
    assert r1 == r2


def test_duplicate_init_and_empty_cluster(spark):
    # ids 0 and 1 are identical vectors -> init centroids 0 and 1
    # coincide, ties break to cluster 0 and cluster 1 starts empty
    # (keeps its previous centroid); must not crash and must cover
    # all rows exactly once
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.1, 1.0]), (3, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_lloyd(df, k=3, iterations=2).collect()
    assert sorted(r["vec_id"] for r in out) == [0, 1, 2, 3]
    assert all(0 <= r["cluster"] < 3 for r in out)


def test_validation(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, iterations=0)
