"""Filtered KNN and filtered node similarity (GDS 2.3
gds.knn.filtered / gds.nodeSimilarity.filtered analogs)."""

import math

from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.knn import filtered_knn
from graph_data_science_spark.algorithms.similarity import (
    NodeSimilarityConfig,
    node_similarity,
)
from tests.conftest import edge_df


def _vec_nodes(spark):
    rows = [
        (i, [float(i % 4), float((i * 3) % 5), 1.0], "a" if i % 2 == 0 else "b")
        for i in range(12)
    ]
    return spark.createDataFrame(
        rows, "id long, embedding array<double>, label string"
    )


def _brute(rows, sources, targets, k):
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    vecs = {i: v for i, v, _ in rows}
    out = {}
    for s in sources:
        cands = sorted(
            ((cos(vecs[s], vecs[t]), t) for t in targets if t != s),
            key=lambda p: (-p[0], p[1]),
        )[:k]
        out[s] = [(t, sim) for sim, t in cands]
    return out


def test_filtered_knn_exact_matches_bruteforce(spark):
    nodes = _vec_nodes(spark)
    rows = [(r["id"], r["embedding"], r["label"]) for r in nodes.collect()]
    sources = [i for i, _, l in rows if l == "a"]
    targets = [i for i, _, l in rows if l == "b"]
    got = filtered_knn(
        spark, nodes, F.col("label") == "a", F.col("label") == "b",
        top_k=3, exact=True,
    )
    got_map = {}
    for r in sorted(got.collect(), key=lambda r: (r["node1"], r["rank"])):
        got_map.setdefault(r["node1"], []).append((r["node2"], r["similarity"]))
    want = _brute(rows, sources, targets, 3)
    assert got_map == want
    # only filtered sources appear; only filtered targets are neighbors
    assert set(got_map) == set(sources)
    assert all(t in targets for ns in got_map.values() for t, _ in ns)


def test_filtered_knn_approx_respects_filters_and_recall(spark):
    nodes = _vec_nodes(spark)
    rows = [(r["id"], r["embedding"], r["label"]) for r in nodes.collect()]
    sources = [i for i, _, l in rows if l == "a"]
    targets = [i for i, _, l in rows if l == "b"]
    got = filtered_knn(
        spark, nodes, F.col("label") == "a", F.col("label") == "b",
        top_k=3, exact=False, iterations=4,
    )
    res = got.collect()
    assert {r["node1"] for r in res} == set(sources)
    assert all(r["node2"] in targets for r in res)
    # tiny pool: the descent must find the exact answer
    want = _brute(rows, sources, targets, 3)
    got_map = {}
    for r in sorted(res, key=lambda r: (r["node1"], r["rank"])):
        got_map.setdefault(r["node1"], []).append((r["node2"], r["similarity"]))
    assert got_map == want


def test_filtered_node_similarity(spark, catalog):
    # bipartite users {0,1,2} sharing tools {10, 11, 12}
    pairs = [(0, 10), (0, 11), (1, 10), (1, 11), (1, 12), (2, 12)]
    g = catalog.create("fns", edge_df(spark, pairs))
    full = node_similarity(spark, g, NodeSimilarityConfig(top_k=5))
    filt = node_similarity(
        spark, g,
        NodeSimilarityConfig(top_k=5, source_filter=[0], target_filter=[1, 2]),
    )
    frows = {(r["node1"], r["node2"]): r["similarity"] for r in filt.collect()}
    # only node1=0 rows, only node2 in {1,2}
    assert all(n1 == 0 and n2 in (1, 2) for n1, n2 in frows)
    # similarity values match the unfiltered run (full neighborhoods)
    full_rows = {
        (r["node1"], r["node2"]): r["similarity"] for r in full.collect()
    }
    for k, v in frows.items():
        assert full_rows[k] == v
    # 0 vs 1 share {10, 11}: jaccard 2/3
    assert frows[(0, 1)] == round(2 / 3, 6)
