"""Label propagation tests — LabelPropagationTest.java:65-109 fixture.

Per SURVEY.md §7 the reference is batch-ordered Gauss-Seidel; our
engine is synchronous, so parity is asserted at CONVERGENCE
(the partition {alice,bridget,michael} / {charles,doug,mark}), not at
order-dependent intermediate iterations.
"""

from graph_data_science_spark.algorithms.labelprop import (
    LabelPropagationConfig,
    label_propagation,
)
from tests.conftest import LP_EDGES, LP_PARTITION, LP_SEEDS, edge_df


def _partition_of(labels: dict) -> list[set]:
    groups: dict = {}
    for node, lbl in labels.items():
        groups.setdefault(lbl, set()).add(node)
    return sorted(groups.values(), key=lambda s: min(s))


def test_labelprop_converged_partition(spark, catalog):
    g = catalog.create("lpg", edge_df(spark, LP_EDGES), persist=True)
    res = label_propagation(spark, g, LabelPropagationConfig(max_iterations=20))
    got = {r["id"]: r["label"] for r in res.state.collect()}
    assert _partition_of(got) == sorted(LP_PARTITION, key=min)


def test_labelprop_seeded(spark, catalog):
    nodes = spark.createDataFrame(
        [(k, v) for k, v in LP_SEEDS.items()], "id long, seed long"
    )
    g = catalog.create("lpseed", edge_df(spark, LP_EDGES), nodes=nodes)
    res = label_propagation(
        spark, g, LabelPropagationConfig(max_iterations=20, seed_column="seed")
    )
    got = {r["id"]: r["label"] for r in res.state.collect()}
    # seeded labels must come from the seed domain and respect the partition
    assert set(got.values()) <= set(LP_SEEDS.values())
    assert _partition_of(got) == sorted(LP_PARTITION, key=min)


def test_labelprop_tie_breaks_to_smaller_label(spark, catalog):
    # node 2 hears equal-weight votes from labels 0 and 1 -> takes 0
    # (ComputeStepConsumer.java:64-77)
    g = catalog.create("lptie", edge_df(spark, [(2, 0), (2, 1)]))
    res = label_propagation(spark, g, LabelPropagationConfig(max_iterations=1))
    got = {r["id"]: r["label"] for r in res.state.collect()}
    assert got[2] == 0


def test_labelprop_no_votes_keeps_label(spark, catalog):
    # vertex 1 has no out-edges -> keeps its own label forever
    g = catalog.create("lpkeep", edge_df(spark, [(0, 1)]))
    res = label_propagation(spark, g, LabelPropagationConfig(max_iterations=5))
    got = {r["id"]: r["label"] for r in res.state.collect()}
    assert got[1] == 1 and got[0] == 1  # 0 adopts 1's label; 1 keeps it
