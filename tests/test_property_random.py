"""Property-based randomized parity tests (hypothesis).

The golden fixtures (FIXTURES.md) pin the reference's own test
graphs; these tests widen coverage to arbitrary small graphs —
self-loops, parallel edges, disconnected pieces, dangling vertices —
by checking each algorithm against an independent pure-Python oracle
(union-find, brute-force triangle enumeration, heap Dijkstra, Tarjan
SCC, numpy power iteration with the reference's exact delta
formulation, PageRankComputation.java:65-103).

Example counts are kept small (each example spins real Spark jobs)
and derandomized so the suite stays deterministic in CI.
"""

import heapq
import itertools
import math
from collections import defaultdict

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graph_data_science_spark.algorithms.pagerank import PageRankConfig, pagerank
from graph_data_science_spark.algorithms.paths import sssp
from graph_data_science_spark.algorithms.scc import scc
from graph_data_science_spark.algorithms.triangle import triangle_count
from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.catalog import GraphCatalog
from tests.conftest import edge_df

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
_NAMES = itertools.count()


def _fresh(spark, pairs, weights=None, orientation="NATURAL"):
    cat = GraphCatalog()
    return cat.create(
        f"prop_{next(_NAMES)}",
        edge_df(spark, pairs, weights=weights),
        orientation=orientation,
    )


# any multigraph incl. self-loops on <= 10 vertices
loopy_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=25
)
# simple digraph, no self-loops, deduped
simple_edges = loopy_edges.map(
    lambda ps: sorted({(s, d) for s, d in ps if s != d})
).filter(lambda ps: len(ps) > 0)


@given(pairs=loopy_edges)
@settings(**_SETTINGS)
def test_wcc_matches_union_find(spark, pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in pairs:
        parent[find(s)] = find(d)
    comps = defaultdict(set)
    for v in parent:
        comps[find(v)].add(v)
    # reference labels = MIN vertex id in component
    expected = {v: min(members) for members in comps.values() for v in members}

    g = _fresh(spark, pairs)
    got = {r["id"]: r["component"] for r in wcc(spark, g).state.collect()}
    assert got == expected


@given(pairs=simple_edges)
@settings(**_SETTINGS)
def test_triangle_matches_bruteforce(spark, pairs):
    adj = defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)
    verts = sorted(adj)
    local = {v: 0 for v in verts}
    tri_global = 0
    for a, b, c in itertools.combinations(verts, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri_global += 1
            local[a] += 1
            local[b] += 1
            local[c] += 1

    g = _fresh(spark, pairs)
    res = triangle_count(spark, g)
    assert res.global_count == tri_global
    assert {r["id"]: r["triangles"] for r in res.local_counts.collect()} == local


@given(
    pairs=simple_edges,
    wseed=st.integers(0, 2**31 - 1),
)
@settings(**_SETTINGS)
def test_sssp_matches_dijkstra(spark, pairs, wseed):
    rng = np.random.default_rng(wseed)
    # small positive weights, exactly representable (halves)
    weights = [float(w) / 2.0 for w in rng.integers(1, 9, size=len(pairs))]
    source = min(s for s, _ in pairs)

    wmap = {}
    for (s, d), w in zip(pairs, weights):
        wmap[(s, d)] = min(w, wmap.get((s, d), math.inf))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, math.inf):
            continue
        for (s, d), w in wmap.items():
            if s == u and du + w < dist.get(d, math.inf):
                dist[d] = du + w
                heapq.heappush(pq, (dist[d], d))

    g = _fresh(spark, pairs, weights=weights)
    got = {r["id"]: r["distance"] for r in sssp(spark, g, source).collect()}
    assert set(got) == set(dist)
    for v, dv in dist.items():
        assert got[v] == dv  # half-integer arithmetic is exact in fp64


@given(pairs=simple_edges)
@settings(**_SETTINGS)
def test_scc_matches_tarjan(spark, pairs):
    adj = defaultdict(list)
    verts = set()
    for s, d in pairs:
        adj[s].append(d)
        verts.update((s, d))

    # iterative Tarjan
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp_of = {}
    counter = itertools.count()
    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = next(counter)
        stack.append(root)
        on_stack.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = next(counter)
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(adj[w])))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    members.append(w)
                    if w == v:
                        break
                rep = min(members)
                for w in members:
                    comp_of[w] = rep

    g = _fresh(spark, pairs)
    got = {r["id"]: r["component"] for r in scc(spark, g).collect()}
    assert got == comp_of


@given(pairs=simple_edges)
@settings(**_SETTINGS)
def test_betweenness_matches_brandes(spark, pairs):
    from graph_data_science_spark.algorithms.betweenness import betweenness

    adj = defaultdict(list)
    verts = set()
    for s, d in pairs:
        adj[s].append(d)
        verts.update((s, d))

    # Brandes 2001, directed unweighted, no endpoints
    bc = {v: 0.0 for v in verts}
    for s in verts:
        order = []
        preds = defaultdict(list)
        sigma = defaultdict(float)
        dist = {s: 0}
        sigma[s] = 1.0
        queue = [s]
        while queue:
            v = queue.pop(0)
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    queue.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]

    g = _fresh(spark, pairs)
    got = {r["id"]: r["score"] for r in betweenness(spark, g).collect()}
    assert set(got) == verts
    for v in verts:
        assert math.isclose(got[v], bc[v], rel_tol=1e-9, abs_tol=1e-12)


@given(pairs=simple_edges)
@settings(**_SETTINGS)
def test_harmonic_matches_bfs_oracle(spark, pairs):
    from graph_data_science_spark.algorithms.msbfs import harmonic_centrality

    # bfs_distances traverses UNDIRECTED by default (the reference's
    # closeness/harmonic contract) — mirror that in the oracle
    adj = defaultdict(set)
    verts = set()
    for s, d in pairs:
        adj[s].add(d)
        adj[d].add(s)
        verts.update((s, d))
    n = len(verts)

    inv = {v: 0.0 for v in verts}
    for s in verts:
        dist = {s: 0}
        queue = [s]
        while queue:
            v = queue.pop(0)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    queue.append(w)
        for v, dv in dist.items():
            if dv > 0:
                inv[v] += 1.0 / dv
    expected = {v: x / (n - 1) for v, x in inv.items()} if n > 1 else {v: 0.0 for v in verts}

    g = _fresh(spark, pairs)
    got = {r["id"]: r["centrality"] for r in harmonic_centrality(spark, g).collect()}
    assert set(got) == verts
    for v in verts:
        assert math.isclose(got[v], expected[v], rel_tol=1e-9, abs_tol=1e-12)


@given(pairs=simple_edges)
@settings(**_SETTINGS)
def test_pagerank_matches_numpy_delta_iteration(spark, pairs):
    # reference delta formulation (PageRankComputation.java:65-103),
    # tolerance 0 so every vertex sends each superstep; K configured
    # iterations = K-1 apply steps (initial superstep counted extra)
    d, k = 0.85, 6
    verts = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    outdeg = np.zeros(n)
    for s, _ in pairs:
        outdeg[idx[s]] += 1
    rank = np.full(n, 1.0 - d)
    delta = rank.copy()
    for _ in range(k - 1):
        incoming = np.zeros(n)
        for s, t in pairs:
            if outdeg[idx[s]] > 0:
                incoming[idx[t]] += delta[idx[s]] / outdeg[idx[s]]
        delta = d * incoming
        rank = rank + delta

    g = _fresh(spark, pairs)
    res = pagerank(
        spark, g, PageRankConfig(damping_factor=d, tolerance=0.0, max_iterations=k)
    )
    got = {r["id"]: r["score"] for r in res.state.collect()}
    assert set(got) == set(verts)
    for v in verts:
        assert math.isclose(got[v], rank[idx[v]], rel_tol=1e-9, abs_tol=1e-12)
