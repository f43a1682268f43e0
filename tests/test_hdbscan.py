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


def _grid_blobs(spark, n_per=12, dim=4):
    # three well-separated blobs along distinct axes (so euclidean
    # AND cosine neighborhoods agree — lsh_topk hashes direction)
    rows = []
    for b in range(3):
        for i in range(n_per):
            vec = [
                (10.0 if j == b else 0.0) + 0.01 * ((i * 7 + j * 3) % 5)
                for j in range(dim)
            ]
            rows.append((b * 100 + i, vec))
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_candidates_hook_matches_exact_without_crossjoin(spark, monkeypatch):
    """100-TB path: lsh_topk candidate pairs feed the kNN — same
    clusters as the exact all-pairs baseline, and crossJoin is
    never called (monkeypatch-asserted, stronger than plan grep)."""
    from graph_data_science_spark.pipeline import ann
    from pyspark.sql import DataFrame, functions as F

    df = _grid_blobs(spark)
    exact = hdbscan(spark, df, epsilon=1.0, k=3, min_cluster_size=4)

    cand = ann.lsh_topk(
        df, df, dim=4, k=12, n_planes=4, n_tables=2,
        id_col="id", vec_col="embedding",
    ).select(F.col("query_id").alias("u"), F.col("neighbor_id").alias("nbr"))
    cand = cand.localCheckpoint(eager=True)

    def _no_crossjoin(self, other):
        raise AssertionError("crossJoin used on the candidates path")

    monkeypatch.setattr(DataFrame, "crossJoin", _no_crossjoin)
    approx = hdbscan(
        spark, df, epsilon=1.0, k=3, min_cluster_size=4, candidates=cand
    )
    got_e = sorted((r["id"], r["cluster"]) for r in exact.clusters.collect())
    got_a = sorted((r["id"], r["cluster"]) for r in approx.clusters.collect())
    assert got_a == got_e
    assert approx.n_clusters == 3
