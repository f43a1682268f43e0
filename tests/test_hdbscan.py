"""HDBSCAN (gds.hdbscan analog, DBSCAN* epsilon cut on the kNN
mutual-reachability graph): blob separation, noise handling,
core-distance values."""

from graph_data_science_spark.algorithms.hdbscan import hdbscan


def _blobs(spark):
    # two tight 2-D blobs + one far outlier
    rows = []
    for i in range(6):
        rows.append((i, [0.0 + 0.01 * i, 0.0]))
    for i in range(6):
        rows.append((10 + i, [5.0 + 0.01 * i, 5.0]))
    rows.append((99, [50.0, 50.0]))
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_two_blobs_and_noise(spark):
    df = _blobs(spark)
    res = hdbscan(spark, df, epsilon=0.5, k=3, min_cluster_size=4)
    got = {r["id"]: r["cluster"] for r in res.clusters.collect()}
    blob1 = {got[i] for i in range(6)}
    blob2 = {got[10 + i] for i in range(6)}
    assert len(blob1) == 1 and len(blob2) == 1 and blob1 != blob2
    # min-id labels
    assert blob1 == {0} and blob2 == {10}
    assert got[99] == -1  # isolated outlier is noise
    assert res.n_clusters == 2


def test_min_cluster_size_prunes_small_groups(spark):
    rows = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(3)] + [
        (10 + i, [9.0 + 0.01 * i, 0.0]) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    res = hdbscan(spark, df, epsilon=0.5, k=2, min_cluster_size=4)
    got = {r["id"]: r["cluster"] for r in res.clusters.collect()}
    assert all(got[i] == -1 for i in range(3))          # too small
    assert len({got[10 + i] for i in range(6)}) == 1    # kept
    assert res.n_clusters == 1


def test_core_distances_are_kth_neighbor(spark):
    rows = [(0, [0.0]), (1, [1.0]), (2, [3.0]), (3, [6.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    res = hdbscan(spark, df, epsilon=100.0, k=2, min_cluster_size=1)
    core = {r["id"]: r["core_distance"] for r in res.core_distances.collect()}
    # id 0: neighbors at 1, 3 -> 2nd nearest = 3
    assert core[0] == 3.0 and core[1] == 2.0 and core[2] == 3.0 and core[3] == 5.0


def test_epsilon_controls_merging(spark):
    rows = [(0, [0.0]), (1, [1.0]), (2, [2.0]), (3, [10.0]), (4, [11.0]), (5, [12.0])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    tight = hdbscan(spark, df, epsilon=2.5, k=2, min_cluster_size=2)
    loose = hdbscan(spark, df, epsilon=20.0, k=3, min_cluster_size=2)
    assert tight.n_clusters == 2
    assert loose.n_clusters == 1
