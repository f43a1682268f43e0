"""Δ-stepping SSSP (ShortestPathDeltaStepping.java:60-200 semantics):
light edges (w <= Δ) relax iteratively inside the open distance
bucket, heavy edges once per settled vertex at bucket close; the
fixpoint distances are Dijkstra-identical, and the OUTER bucket count
is bounded by ceil(max_distance / Δ) + 1."""

import math

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.paths import delta_stepping, sssp
from tests.conftest import edge_df


def _dist_map(df):
    return {r["id"]: r["distance"] for r in df.collect()}


def test_delta_stepping_matches_chaotic_relaxation(spark, catalog):
    # mixed light/heavy weights with multiple competing routes
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (0, 4), (2, 5), (5, 4), (4, 6)]
    weights = [1.0, 4.0, 1.0, 1.0, 1.0, 9.0, 0.5, 0.5, 2.5]
    g = catalog.create("ds1", edge_df(spark, pairs, weights=weights))
    classic = _dist_map(sssp(spark, g, source=0))
    for delta in (0.5, 1.0, 3.0, 100.0):
        got = _dist_map(delta_stepping(spark, g, source=0, delta=delta))
        assert got == classic, f"delta={delta}"


def test_delta_stepping_predecessor_parity(spark, catalog):
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
    weights = [1.0, 1.0, 1.0, 1.0]
    g = catalog.create("ds2", edge_df(spark, pairs, weights=weights))
    classic = {
        r["id"]: r["predecessor"] for r in sssp(spark, g, source=0).collect()
    }
    got = {
        r["id"]: r["predecessor"]
        for r in delta_stepping(spark, g, source=0, delta=1.0).collect()
    }
    # both keep the min-id predecessor among optimal relaxations
    assert got == classic and got[3] == 1


def test_bucket_count_bounded_by_distance_over_delta(spark, catalog):
    # weighted chain: 12 hops of weight 1.0, max distance 12
    n = 13
    pairs = [(i, i + 1) for i in range(n - 1)]
    weights = [1.0] * (n - 1)
    g = catalog.create("ds3", edge_df(spark, pairs, weights=weights))
    maxdist = float(n - 1)
    for delta in (1.0, 4.0, 100.0):
        stats: dict = {}
        res = delta_stepping(spark, g, source=0, delta=delta, stats=stats)
        bound = math.ceil(maxdist / delta) + 1
        assert stats["buckets"] <= bound, (delta, stats)
        assert res.agg(F.max("distance")).collect()[0][0] == maxdist


def test_sssp_delta_kwarg_routes_to_delta_stepping(spark, catalog):
    pairs = [(0, 1), (1, 2)]
    g = catalog.create("ds4", edge_df(spark, pairs, weights=[2.0, 3.0]))
    stats: dict = {}
    got = _dist_map(sssp(spark, g, source=0, delta=2.5, stats=stats))
    assert got == {0: 0.0, 1: 2.0, 2: 5.0}
    assert stats["buckets"] is not None


def test_delta_stepping_undirected_and_unreachable(spark, catalog):
    pairs = [(0, 1), (2, 3)]
    g = catalog.create("ds5", edge_df(spark, pairs, weights=[1.5, 1.0]))
    got = _dist_map(delta_stepping(spark, g, source=1, delta=1.0, directed=False))
    assert got == {1: 0.0, 0: 1.5}  # component {2,3} unreachable, omitted
