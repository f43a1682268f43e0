"""Distributed biconnectivity (Tarjan-Vishkin via Euler tour +
interval tables + aux-graph WCC) vs a brute-force removal reference
on fixtures and seeded random graphs."""

import random

from graph_data_science_spark.algorithms.biconnectivity import biconnectivity
from graph_data_science_spark.algorithms.euler import euler_tour
from tests.conftest import edge_df


def _ref_bridges_artic(edges):
    """Simple O(E * (V+E)) brute force: remove each edge / vertex,
    count components."""
    def ncomp(vs, es):
        lbl = {v: v for v in vs}
        def find(x):
            while lbl[x] != x:
                lbl[x] = lbl[lbl[x]]
                x = lbl[x]
            return x
        for u, v in es:
            ru, rv = find(u), find(v)
            if ru != rv:
                lbl[ru] = rv
        return len({find(v) for v in vs})

    vs = sorted({x for e in edges for x in e})
    base = ncomp(vs, edges)
    bridges = {
        frozenset(e)
        for i, e in enumerate(edges)
        if ncomp(vs, edges[:i] + edges[i + 1:]) > base
    }
    artic = set()
    for v in vs:
        rem_vs = [x for x in vs if x != v]
        rem_es = [e for e in edges if v not in e]
        # articulation <=> removal increases the component count
        # (an isolated v decreases it; a pendant neighbor keeps it)
        if rem_vs and ncomp(rem_vs, rem_es) > base:
            artic.add(v)
    return bridges, artic


def _run(spark, catalog, name, pairs):
    g = catalog.create(name, edge_df(spark, pairs))
    res = biconnectivity(spark, g)
    got_bridges = {
        frozenset((r["src"], r["dst"])) for r in res.bridges.collect()
    }
    got_artic = {r["id"] for r in res.articulation.collect()}
    return res, got_bridges, got_artic


def test_euler_tour_labels_path_and_forest(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (1, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    rows = {r["id"]: r for r in euler_tour(spark, edges).collect()}
    assert rows[0]["parent"] is None and rows[0]["size"] == 5
    assert rows[10]["parent"] is None and rows[10]["size"] == 2
    assert rows[1]["parent"] == 0 and rows[1]["size"] == 4
    # interval invariant: subtree(1) = {1,2,3,4}
    lo, hi = rows[1]["disc"], rows[1]["disc"] + rows[1]["size"] - 1
    inside = {v for v, r in rows.items() if lo <= r["disc"] <= hi}
    assert inside == {1, 2, 3, 4}
    # global dense disc
    assert sorted(r["disc"] for r in rows.values()) == list(range(7))


def test_bridge_chain(spark, catalog):
    # a path: every edge is a bridge, every interior vertex articulates
    pairs = [(0, 1), (1, 2), (2, 3)]
    _, got_b, got_a = _run(spark, catalog, "bcc_chain", pairs)
    assert got_b == {frozenset(e) for e in pairs}
    assert got_a == {1, 2}


def test_cycle_has_no_bridges(spark, catalog):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    res, got_b, got_a = _run(spark, catalog, "bcc_cycle", pairs)
    assert got_b == set() and got_a == set()
    # single block: all 4 tree edges share one block id
    assert len({r["block"] for r in res.blocks.collect()}) == 1


def test_two_triangles_sharing_a_vertex(spark, catalog):
    # classic: vertex 2 is the cut vertex, no bridges
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)]
    res, got_b, got_a = _run(spark, catalog, "bcc_tri", pairs)
    assert got_b == set()
    assert got_a == {2}
    assert len({r["block"] for r in res.blocks.collect()}) == 2


def test_barbell(spark, catalog):
    # two triangles joined by a bridge
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]
    _, got_b, got_a = _run(spark, catalog, "bcc_barbell", pairs)
    assert got_b == {frozenset((2, 3))}
    assert got_a == {2, 3}


def test_random_graphs_match_bruteforce(spark, catalog):
    rng = random.Random(421)
    for trial in range(6):
        n = rng.randint(5, 14)
        m = rng.randint(n - 2, 2 * n)
        edges = set()
        while len(edges) < m:
            u, v = rng.randrange(n), rng.randrange(n)
            if u != v:
                edges.add((min(u, v), max(u, v)))
        pairs = sorted(edges)
        want_b, want_a = _ref_bridges_artic(pairs)
        _, got_b, got_a = _run(spark, catalog, f"bcc_rnd{trial}", pairs)
        assert got_b == want_b, f"trial {trial}: bridges {got_b} != {want_b} ({pairs})"
        assert got_a == want_a, f"trial {trial}: artic {got_a} != {want_a} ({pairs})"


def test_blocks_partition_tree_edges(spark, catalog):
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6)]
    res, _, _ = _run(spark, catalog, "bcc_part", pairs)
    blocks = res.blocks.collect()
    # one row per non-root vertex = per tree edge
    n_vertices = res.labels.count()
    n_roots = res.labels.where("parent IS NULL").count()
    assert len(blocks) == n_vertices - n_roots
    assert all(r["block"] is not None for r in blocks)
