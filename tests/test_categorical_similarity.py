"""Categorical Jaccard / Overlap similarity (alpha similarity procs).

Reference semantics: /root/reference/alpha/alpha-algo/src/main/java/
org/neo4j/gds/impl/similarity/CategoricalInput.java:45-72 — jaccard
|∩|/(|a|+|b|−|∩|); overlap |∩|/min(|a|,|b|) with the pair oriented so
the smaller set is the source (inferReverse).
"""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.similarity import (
    CategoricalSimilarityConfig,
    categorical_similarity,
)


def _items(spark, rows):
    return spark.createDataFrame(rows, "item long, category string")


@pytest.fixture()
def sets(spark):
    # a={x,y,z}, b={x,y}, c={y,q,r,s}, d={q}
    rows = (
        [(1, c) for c in "xyz"]
        + [(2, c) for c in "xy"]
        + [(3, c) for c in "yqrs"]
        + [(4, c) for c in "q"]
    )
    return _items(spark, rows)


def test_jaccard_values(sets):
    out = categorical_similarity(sets).collect()
    got = {(r.item1, r.item2): r for r in out}
    # a∩b={x,y}: 2/(3+2-2)=2/3; a∩c={y}: 1/6; b∩c={y}: 1/5; c∩d={q}: 1/4
    assert set(got) == {(1, 2), (1, 3), (2, 3), (3, 4)}
    assert got[(1, 2)].similarity == pytest.approx(2 / 3, abs=1e-6)
    assert got[(1, 3)].similarity == pytest.approx(1 / 6, abs=1e-6)
    assert got[(2, 3)].similarity == pytest.approx(1 / 5, abs=1e-6)
    assert got[(3, 4)].similarity == pytest.approx(1 / 4, abs=1e-6)
    assert (got[(1, 2)].count1, got[(1, 2)].count2, got[(1, 2)].intersection) == (
        3,
        2,
        2,
    )


def test_overlap_orientation(sets):
    out = categorical_similarity(
        sets, CategoricalSimilarityConfig(metric="OVERLAP")
    ).collect()
    got = {(r.item1, r.item2): r for r in out}
    # pairs oriented smaller-set-first: (2,1) |∩|/2=1.0, (1,3) 1/3,
    # (2,3) 1/2, (4,3) 1/1=1.0
    assert set(got) == {(2, 1), (1, 3), (2, 3), (4, 3)}
    assert got[(2, 1)].similarity == pytest.approx(1.0)
    assert got[(2, 1)].count1 == 2 and got[(2, 1)].count2 == 3
    assert got[(4, 3)].similarity == pytest.approx(1.0)
    assert got[(1, 3)].similarity == pytest.approx(1 / 3, abs=1e-6)


def test_topk_and_cutoff(sets):
    out = categorical_similarity(
        sets, CategoricalSimilarityConfig(top_k=1)
    ).collect()
    per_source = {}
    for r in out:
        per_source.setdefault(r.item1, []).append(r)
    assert all(len(v) == 1 for v in per_source.values())
    # source 1's best is item2=2 (2/3 beats 1/6)
    assert per_source[1][0].item2 == 2

    cut = categorical_similarity(
        sets, CategoricalSimilarityConfig(similarity_cutoff=0.5)
    ).collect()
    assert {(r.item1, r.item2) for r in cut} == {(1, 2)}


def test_hot_category_cap(spark):
    # category 'h' shared by all 4 items; capping at 3 drops it
    rows = [(i, "h") for i in range(1, 5)] + [(1, "a"), (2, "a")]
    out = categorical_similarity(
        _items(spark, rows),
        CategoricalSimilarityConfig(max_category_count=3),
    ).collect()
    got = {(r.item1, r.item2): r for r in out}
    assert set(got) == {(1, 2)}
    # counts are post-cap set sizes (documented under-estimate shape)
    assert got[(1, 2)].intersection == 1


def test_duplicates_ignored(spark):
    rows = [(1, "x"), (1, "x"), (2, "x")]
    out = categorical_similarity(_items(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].count1 == 1 and out[0].count2 == 1
    assert out[0].similarity == pytest.approx(1.0)
