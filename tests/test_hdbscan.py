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


def _two_scale(spark):
    # three blobs at WILDLY different density scales: A and B tight
    # (spacing 0.01), C loose (spacing 5.0) — no single epsilon
    # captures all three
    rows = []
    for i in range(8):
        rows.append((i, [0.01 * i, 0.0]))
    for i in range(8):
        rows.append((100 + i, [100.0 + 0.01 * i, 0.0]))
    for i in range(8):
        rows.append((200 + i, [1000.0 + 5.0 * i, 0.0]))
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def test_stability_mode_finds_clusters_at_both_scales(spark):
    """The GDS-2.5 parity fixture: on a two-scale dataset the
    epsilon cut at 0.5 keeps the tight blobs and loses the loose one
    to noise; stability mode recovers all three."""
    df = _two_scale(spark)
    eps = hdbscan(spark, df, epsilon=0.5, k=3, min_cluster_size=4)
    got_eps = {r["id"]: r["cluster"] for r in eps.clusters.collect()}
    assert eps.n_clusters == 2
    assert all(got_eps[200 + i] == -1 for i in range(8))  # loose blob lost

    stab = hdbscan(spark, df, k=3, min_cluster_size=4, mode="stability")
    got = {r["id"]: r["cluster"] for r in stab.clusters.collect()}
    assert stab.n_clusters == 3
    a = {got[i] for i in range(8)}
    b = {got[100 + i] for i in range(8)}
    c = {got[200 + i] for i in range(8)}
    assert len(a) == len(b) == len(c) == 1
    assert len(a | b | c) == 3
    # min-member-id labels (the epsilon mode's label convention)
    assert a == {0} and b == {100} and c == {200}


def test_stability_mode_agrees_with_epsilon_on_single_scale(spark):
    """On single-density data the stability selection lands on the
    same partition as the DBSCAN* cut for the dense blobs. The far
    outlier pins the DOCUMENTED kNN-restriction divergence: its only
    kNN attachment is blob2's component, so FOSC extent labeling
    folds it into that cluster as a low-lambda member, where both the
    epsilon cut and a full-metric tree would call it noise."""
    df = _blobs(spark)
    eps = hdbscan(spark, df, epsilon=0.5, k=3, min_cluster_size=4)
    stab = hdbscan(spark, df, k=3, min_cluster_size=4, mode="stability")
    ge = {r["id"]: r["cluster"] for r in eps.clusters.collect()}
    gs = {r["id"]: r["cluster"] for r in stab.clusters.collect()}
    assert stab.n_clusters == eps.n_clusters == 2
    assert {ge[i] for i in range(6)} == {gs[i] for i in range(6)} == {0}
    assert {ge[10 + i] for i in range(6)} == {gs[10 + i] for i in range(6)} == {10}
    assert ge[99] == -1 and gs[99] == 10  # the documented divergence


def test_stability_mode_bridged_two_level_hierarchy(spark):
    """Two tight blobs joined through one bridge point — connected in
    the kNN graph, so the dendrogram really has two levels; EOM must
    pick the two children over their weakly-merged parent."""
    rows = [(i, [0.2 * i, 0.0]) for i in range(8)]           # 0 .. 1.4
    rows.append((50, [2.5, 0.0]))                             # bridge
    rows += [(100 + i, [3.6 + 0.2 * i, 0.0]) for i in range(8)]  # 3.6 .. 5.0
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    res = hdbscan(spark, df, k=3, min_cluster_size=4, mode="stability")
    got = {r["id"]: r["cluster"] for r in res.clusters.collect()}
    assert res.n_clusters == 2
    a = {got[i] for i in range(8)}
    b = {got[100 + i] for i in range(8)}
    assert len(a) == 1 and len(b) == 1 and a != b and a != {-1} and b != {-1}


def test_stability_mode_deterministic(spark):
    df = _two_scale(spark)
    r1 = hdbscan(spark, df, k=3, min_cluster_size=4, mode="stability")
    r2 = hdbscan(spark, df, k=3, min_cluster_size=4, mode="stability")
    assert sorted(map(tuple, r1.clusters.collect())) == sorted(
        map(tuple, r2.clusters.collect())
    )


def test_mode_validation(spark):
    df = _blobs(spark)
    import pytest

    with pytest.raises(ValueError, match="epsilon"):
        hdbscan(spark, df, k=3)
    with pytest.raises(ValueError, match="mode"):
        hdbscan(spark, df, epsilon=0.5, mode="nope")


def test_stability_mode_empty_input(spark):
    df = spark.createDataFrame([], "id long, embedding array<double>")
    res = hdbscan(spark, df, k=3, min_cluster_size=2, mode="stability")
    assert res.clusters.count() == 0
    assert res.n_clusters == 0


def test_stability_mode_layout_independent_on_ties(spark):
    """Duplicate-heavy data ties every mreach weight; the dendrogram
    tie-break keys on REAL point ids, so labels must not depend on the
    DataFrame's partitioning/collect order."""
    rows = [(i, [0.0, 0.0]) for i in range(8)] + [
        (100 + i, [9.0, 9.0]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = []
    for parts in (1, 7):
        res = hdbscan(
            spark, df.repartition(parts), k=3, min_cluster_size=4,
            mode="stability",
        )
        out.append(sorted(map(tuple, res.clusters.collect())))
    assert out[0] == out[1]
