"""graph_ops.validate_graph, graph_ops.powerlaw_fit, and
pipeline.profile.profile_table."""

import math
from datetime import datetime

import pytest

from graph_data_science_spark.graph_ops import powerlaw_fit, validate_graph
from graph_data_science_spark.pipeline.profile import profile_table


def test_validate_graph_counts(spark):
    edges = spark.createDataFrame(
        [
            (1, 2),
            (1, 2),  # parallel
            (2, 2),  # self-loop
            (3, 9),  # orphan dst (9 not a vertex)
            (8, 1),  # orphan src
        ],
        "src long, dst long",
    )
    verts = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    r = validate_graph(edges, verts).collect()[0]
    assert r["n_vertices"] == 3 and r["n_edges"] == 5
    assert r["n_self_loops"] == 1
    assert r["n_parallel_edges"] == 1  # 5 edges, 4 distinct pairs
    assert r["n_null_src"] == 0 and r["n_null_dst"] == 0
    assert r["n_orphan_src"] == 1 and r["n_orphan_dst"] == 1


def test_validate_graph_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    verts = spark.createDataFrame([(1,)], "id long")
    r = validate_graph(edges, verts).collect()[0]
    assert r["n_edges"] == 0 and r["n_self_loops"] == 0
    assert r["n_parallel_edges"] == 0
    assert r["n_orphan_src"] == 0 and r["n_orphan_dst"] == 0


def test_validate_graph_null_endpoints(spark):
    edges = spark.createDataFrame(
        [(1, 2), (None, 2), (1, None), (1, 9)], "src long, dst long"
    )
    verts = spark.createDataFrame([(1,), (2,)], "id long")
    r = validate_graph(edges, verts).collect()[0]
    assert r["n_null_src"] == 1 and r["n_null_dst"] == 1
    # null endpoints are NOT orphans (different defect, different fix)
    assert r["n_orphan_src"] == 0 and r["n_orphan_dst"] == 1
    # parallel count only over fully-keyed edges: (1,2),(1,9) distinct
    assert r["n_parallel_edges"] == 0


def test_powerlaw_fit_known_alpha(spark):
    # Hill MLE: alpha = 1 + n / sum(ln d)  with d_min=1
    ds = [1, 1, 2, 4, 8]
    degs = spark.createDataFrame([(i, float(d)) for i, d in enumerate(ds)],
                                 "id long, degree double")
    r = powerlaw_fit(degs, d_min=1).collect()[0]
    expect = 1.0 + len(ds) / sum(round(math.log(d), 9) for d in ds)
    assert r["alpha"] == pytest.approx(expect, abs=1e-6)
    assert r["n_tail"] == 5 and r["d_min"] == 1
    # d_min=2 drops the ones
    r2 = powerlaw_fit(degs, d_min=2).collect()[0]
    assert r2["n_tail"] == 3


def test_powerlaw_fit_degenerate_tail(spark):
    degs = spark.createDataFrame([(0, 1.0), (1, 1.0)], "id long, degree double")
    r = powerlaw_fit(degs, d_min=1).collect()[0]
    assert r["alpha"] is None and r["n_tail"] == 2
    with pytest.raises(ValueError):
        powerlaw_fit(degs, d_min=0)


def test_profile_table_types_and_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, "b", 2.5, datetime(2026, 1, 1)),
            (2, None, -1.0, datetime(2026, 1, 2)),
            (3, "a", None, None),
        ],
        "k long, s string, x double, t timestamp",
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert list(out) == ["k", "s", "x", "t"]
    k, s, x, t = out["k"], out["s"], out["x"], out["t"]
    assert k["n_rows"] == 3 and k["n_nulls"] == 0 and k["n_distinct"] == 3
    assert (k["min_num"], k["max_num"]) == (1.0, 3.0)
    assert k["min_str"] is None
    assert s["n_nulls"] == 1 and (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None
    assert x["n_nulls"] == 1 and (x["min_num"], x["max_num"]) == (-1.0, 2.5)
    # timestamps report epoch microseconds in the numeric slots
    assert t["n_nulls"] == 1
    assert t["min_num"] == float(int(datetime(2026, 1, 1).timestamp()) * 1_000_000)
    assert t["dtype"] == "timestamp"


def test_profile_table_column_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    assert profile_table(df, ["s"]).collect()[0]["column"] == "s"
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, ["nope"])


def test_k_core_peels_to_fixpoint(spark):
    from graph_data_science_spark.graph_ops import k_core

    # triangle 1-2-3 plus a pendant chain 3-4-5: the 2-core is the
    # triangle (chain peels end-in over two rounds)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r["id"]: r["degree"] for r in k_core(edges, k=2, rounds=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # k=3 empties it
    assert k_core(edges, k=3, rounds=4).count() == 0


def test_k_core_fixed_rounds_are_idempotent_at_fixpoint(spark):
    from graph_data_science_spark.graph_ops import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    a = sorted(map(tuple, k_core(edges, k=2, rounds=3).collect()))
    b = sorted(map(tuple, k_core(edges, k=2, rounds=6).collect()))
    assert a == b  # converged: extra rounds are no-ops

    import pytest as _pytest

    with _pytest.raises(ValueError):
        k_core(edges, k=0)
