"""All-pairs safety defaults (VERDICT r1 item 8): betweenness /
closeness / harmonic auto-sample their sources above the vertex-count
threshold unless all_pairs=True is passed explicitly."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms import betweenness as bw
from graph_data_science_spark.algorithms.msbfs import (
    closeness_centrality,
    harmonic_centrality,
)
from tests.conftest import edge_df


def test_auto_sample_size_policy():
    t = bw.AUTO_SAMPLE_THRESHOLD
    assert bw.auto_sample_size(t, None, False, "x") is None  # small: exact
    assert bw.auto_sample_size(t + 1, None, False, "x") == t  # big: sampled
    assert bw.auto_sample_size(t + 1, None, True, "x") is None  # opt-out
    assert bw.auto_sample_size(t + 1, 7, False, "x") == 7  # explicit size
    assert bw.auto_sample_size(5, 7, False, "x") is None  # size >= n: exact


@pytest.fixture()
def ring_graph(spark, catalog):
    n = 40
    return catalog.create(
        "ring", edge_df(spark, [(i, (i + 1) % n) for i in range(n)])
    )


def test_betweenness_sampled_mode_kicks_in(spark, ring_graph, monkeypatch, capsys):
    monkeypatch.setattr(bw, "AUTO_SAMPLE_THRESHOLD", 10)
    res = bw.betweenness(spark, ring_graph, directed=False)
    assert res.count() == 40
    assert "auto-sampling 10 of 40 sources" in capsys.readouterr().out
    # explicit opt-in silences the guard and runs exact
    bw.betweenness(spark, ring_graph, directed=False, all_pairs=True).count()
    assert "auto-sampling" not in capsys.readouterr().out


def test_harmonic_sampled_scale(spark, ring_graph, monkeypatch, capsys):
    monkeypatch.setattr(bw, "AUTO_SAMPLE_THRESHOLD", 10)
    sampled = harmonic_centrality(spark, ring_graph)
    assert "auto-sampling" in capsys.readouterr().out
    exact = harmonic_centrality(spark, ring_graph, all_pairs=True)
    # the n/samples extrapolation keeps the sampled estimate within a
    # small factor of the exact score on a symmetric graph
    s = sampled.agg(F.avg("centrality")).collect()[0][0]
    e = exact.agg(F.avg("centrality")).collect()[0][0]
    assert e > 0 and 0.5 < s / e < 2.0


def test_closeness_sampled_runs(spark, ring_graph, monkeypatch, capsys):
    monkeypatch.setattr(bw, "AUTO_SAMPLE_THRESHOLD", 10)
    res = closeness_centrality(spark, ring_graph)
    assert "auto-sampling" in capsys.readouterr().out
    assert res.where(F.col("centrality") > 0).count() == 40
