"""gds.alpha.linkprediction.* function parity (LinkPredictionFunc.java)."""

import math

from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.functions.linkpred import (
    link_prediction_scores,
    one_hot_encoding,
)
from tests.conftest import edge_df


def _fixture(spark):
    # undirected view: N(1)={2,3} N(2)={1,3} N(3)={1,2,4} N(4)={3}
    return Graph(name="lp", edges=edge_df(spark, [(1, 2), (2, 3), (1, 3), (3, 4)]))


def test_link_prediction_scores_both(spark):
    g = _fixture(spark)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 4), (2, 4), (1, 1)], "node1 long, node2 long"
    )
    got = {
        (r["node1"], r["node2"]): r.asDict()
        for r in link_prediction_scores(g, pairs).collect()
    }
    aa3 = 1.0 / math.log(3)  # common neighbor 3 has raw degree 3
    r = got[(1, 2)]
    assert r["common_neighbors"] == 1.0
    assert abs(r["adamic_adar"] - aa3) < 1e-12
    assert abs(r["resource_allocation"] - 1 / 3) < 1e-12
    assert r["preferential_attachment"] == 4.0
    assert r["total_neighbors"] == 3.0  # {2,3} U {1,3}
    r = got[(1, 4)]
    assert r["common_neighbors"] == 1.0
    assert r["preferential_attachment"] == 2.0
    assert r["total_neighbors"] == 2.0  # {2,3} U {3}
    r = got[(1, 1)]  # self pair: empty common set, TN = |N(1)|
    assert r["common_neighbors"] == 0.0
    assert r["adamic_adar"] == 0.0
    assert r["total_neighbors"] == 2.0


def test_link_prediction_directed(spark):
    # OUTGOING: common(n1,n2) = out-targets both point to
    g = Graph(name="lpd", edges=edge_df(spark, [(1, 3), (2, 3), (3, 4)]))
    pairs = spark.createDataFrame([(1, 2)], "node1 long, node2 long")
    r = link_prediction_scores(g, pairs, direction="OUTGOING").collect()[0]
    assert r["common_neighbors"] == 1.0           # both 1 and 2 point to 3
    assert r["preferential_attachment"] == 1.0    # out-deg 1 * 1
    # adamic adar over OUT degree of 3 (=1): 1/ln(1) is +inf, reference
    # behavior of Math.log — common neighbor degree under d, not flipped
    assert math.isinf(r["adamic_adar"])


def test_same_community(spark):
    g = _fixture(spark)
    comms = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)], "id long, community long"
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "node1 long, node2 long")
    got = {
        (r["node1"], r["node2"]): r["same_community"]
        for r in link_prediction_scores(g, pairs, communities=comms).collect()
    }
    assert got == {(1, 2): 1.0, (1, 3): 0.0, (1, 4): 0.0}  # 4 missing -> 0.0


def test_one_hot_encoding(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["c", "a"])], "avail array<string>, sel array<string>"
    )
    out = df.select(one_hot_encoding(F.col("avail"), F.col("sel")).alias("v")).collect()
    assert out[0]["v"] == [1, 0, 1]
