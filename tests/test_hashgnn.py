"""HashGNN (gds.hashgnn analog): min-hash message passing over binary
features, LCG-hashed for closed-form reproducibility — verified
against a pure-Python replay on fixtures."""

from graph_data_science_spark.algorithms.hashgnn import M31, _A, _B1, _B2, hashgnn
from tests.conftest import edge_df


def _lcg(x):
    return ((x % M31) * _A) % M31


def _ref_hashgnn(vertices, edges, dimension, density, iterations, seed):
    """Pure-Python replay of the exact same recurrence."""
    und = set()
    for u, v in edges:
        und.add((u, v))
        und.add((v, u))
    state = {
        v: {_lcg((v % M31) * 31 + j * _B2 + seed) % dimension for j in range(density)}
        for v in vertices
    }
    for _ in range(iterations):
        nbits = {}
        for u, v in und:
            nbits.setdefault(v, set()).update(state[u])
        nxt = {}
        for v in vertices:
            sel = set()
            for k in range(density):
                cands = [
                    (_lcg(b * _B1 + k * _B2 + seed + 1), b) for b in state[v]
                ] + [
                    (_lcg(b * _B1 + k * _B2 + seed + 2), b)
                    for b in nbits.get(v, ())
                ]
                sel.add(min(cands)[1])
            nxt[v] = sel
        state = nxt
    return state


def _collect(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["id"], set()).add(r["bit"])
    return out


def test_matches_python_replay(spark, catalog):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 0)]
    g = catalog.create("hg1", edge_df(spark, pairs))
    got = _collect(hashgnn(spark, g, dimension=16, density=3, iterations=2, seed=7))
    want = _ref_hashgnn(range(5), pairs, 16, 3, 2, 7)
    assert got == {v: b for v, b in want.items()}


def test_deterministic_and_bounded(spark, catalog):
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = catalog.create("hg2", edge_df(spark, pairs))
    a = _collect(hashgnn(spark, g, dimension=8, density=2, iterations=3, seed=1))
    b = _collect(hashgnn(spark, g, dimension=8, density=2, iterations=3, seed=1))
    assert a == b
    assert all(0 <= bit < 8 for bits in a.values() for bit in bits)
    assert all(1 <= len(bits) <= 2 for bits in a.values())


def test_isolated_node_keeps_own_features(spark, catalog):
    # 9 has no edges after projection — no neighbor candidates ever
    pairs = [(0, 1)]
    g = catalog.create("hg3", edge_df(spark, pairs))
    got = _collect(hashgnn(spark, g, dimension=32, density=2, iterations=2, seed=3))
    want = _ref_hashgnn([0, 1], pairs, 32, 2, 2, 3)
    assert got[0] == want[0] and got[1] == want[1]


def test_seed_changes_embeddings(spark, catalog):
    pairs = [(0, 1), (1, 2), (2, 0)]
    g = catalog.create("hg4", edge_df(spark, pairs))
    a = _collect(hashgnn(spark, g, dimension=64, density=3, iterations=1, seed=1))
    b = _collect(hashgnn(spark, g, dimension=64, density=3, iterations=1, seed=2))
    assert a != b
