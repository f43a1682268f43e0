"""Degree-split hub layout (Graph.pregel_layout + PregelRunner).

The north-rule's degree-based edge splitting: hub srcs' edges move to
a dst-partitioned hot table joined against broadcast hub state. These
tests force the split with a low explicit threshold and assert results
are IDENTICAL to the unsplit plan.
"""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.algorithms.pagerank import PageRankConfig, pagerank
from graph_data_science_spark.algorithms.wcc import wcc
from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.pregel import PregelRunner
from tests.conftest import edge_df


def _star_plus_chain(spark):
    # hub 0 fans out to 1..20; separate chain 100->101->102
    pairs = [(0, i) for i in range(1, 21)] + [(100, 101), (101, 102)]
    return Graph(name="hubstar", edges=edge_df(spark, pairs)).persist()


def test_pregel_layout_splits_hub(spark):
    g = _star_plus_chain(spark)
    cold, hot, hub_ids = g.pregel_layout(4, hub_threshold=5)
    assert hot is not None
    assert {r["id"] for r in hub_ids.collect()} == {0}
    assert hot.count() == 20           # all hub edges in the hot table
    assert cold.count() == 2           # the chain stays cold
    # disjoint and complete
    assert cold.unionByName(hot).count() == g.edge_count()
    g.unpersist()


def test_pregel_layout_no_hubs(spark):
    g = Graph(name="nohub", edges=edge_df(spark, [(0, 1), (1, 2)]))
    cold, hot, hub_ids = g.pregel_layout(4, hub_threshold=5)
    assert hot is None and hub_ids is None
    assert cold.count() == 2


@pytest.mark.parametrize("algo", ["wcc", "pagerank"])
def test_hub_split_results_identical(spark, algo):
    g1 = _star_plus_chain(spark)
    g2 = _star_plus_chain(spark)

    def run(g, thr):
        from graph_data_science_spark.algorithms.pagerank import _PageRankComputation
        from graph_data_science_spark.algorithms.wcc import _WccComputation, WccConfig

        if algo == "wcc":
            comp = _WccComputation(WccConfig(), seeds=None)
            cols = ["id", "component"]
        else:
            comp = _PageRankComputation(PageRankConfig(tolerance=0.0, max_iterations=6))
            cols = ["id", "rank"]
        runner = PregelRunner(spark, max_iterations=10, hub_split_threshold=thr)
        res = runner.run(comp, g)
        rows = {
            tuple(
                round(v, 9) if isinstance(v, float) else v
                for v in (r[c] for c in cols)
            )
            for r in res.state.select(*cols).collect()
        }
        return rows

    split = run(g1, 5)       # hub 0 (degree 20) splits
    unsplit = run(g2, 0)     # split disabled
    assert split == unsplit
    g1.unpersist()
    g2.unpersist()
