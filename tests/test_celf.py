"""CELF influence maximization (CELF.java analog) — deterministic
hash-seeded Monte-Carlo IC worlds + lazy-forward greedy."""

from graph_data_science_spark.algorithms.celf import celf
from tests.conftest import edge_df


def test_celf_picks_hub_first_and_is_deterministic(spark, catalog):
    pairs = [(0, i) for i in range(1, 11)] + [(20, 21)]
    g = catalog.create("celf_star", edge_df(spark, pairs))
    res = celf(spark, g, k=3, propagation_probability=0.5, monte_carlo_sims=8)
    assert res[0][0] == 0  # the hub dominates IC spread
    assert len(res) == 3
    spreads = [s for _, s in res]
    assert spreads == sorted(spreads)  # cumulative spread is monotone
    assert res == celf(spark, g, k=3, propagation_probability=0.5, monte_carlo_sims=8)


def test_celf_p1_spread_is_full_reach(spark, catalog):
    # p=1: every edge live in every world -> spread({0}) = |reachable|
    g = catalog.create("celf_chain", edge_df(spark, [(0, 1), (1, 2), (2, 3)]))
    res = celf(spark, g, k=1, propagation_probability=1.0, monte_carlo_sims=3)
    assert res == [(0, 4.0)]


def test_celf_candidate_sampling_kicks_in(spark, catalog, capsys):
    pairs = [(i, i + 1) for i in range(30)]
    g = catalog.create("celf_samp", edge_df(spark, pairs))
    res = celf(
        spark, g, k=2, propagation_probability=1.0, monte_carlo_sims=2,
        candidate_sample=5,
    )
    assert "restricting candidates to top 5" in capsys.readouterr().out
    assert len(res) == 2
    assert res[0][0] == 0  # chain head reaches everything at p=1
