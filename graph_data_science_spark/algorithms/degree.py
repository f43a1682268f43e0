"""Degree centrality — /root/reference/algo/src/main/java/org/neo4j/
gds/degree/DegreeCentrality.java:79-160.

Orientation NATURAL (out-degree), REVERSE (in-degree) or UNDIRECTED
(both); unweighted = relationship count, weighted = sum of POSITIVE
edge weights (negative weights contribute 0, DegreeCentrality.java's
positive-weight guard). One groupBy — partial aggregation makes hub
vertices cheap (each map partition emits one partial per hub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph


def degree_centrality(
    spark: SparkSession,
    graph: Graph,
    orientation: str = "NATURAL",
    weighted: bool = False,
) -> DataFrame:
    """(id, score) for every vertex; 0 for vertices with no edges."""
    edges = projection.orient(graph.view(weight_property=weighted), orientation)
    if weighted:
        agg = F.sum(
            F.when(F.col("weight") > 0, F.col("weight")).otherwise(0.0)
        ).alias("score")
    else:
        agg = F.count(F.lit(1)).cast("double").alias("score")
    deg = edges.groupBy(F.col("src").alias("id")).agg(agg)
    return (
        graph.vertices()
        .join(deg, "id", "left")
        .select("id", F.coalesce(F.col("score"), F.lit(0.0)).alias("score"))
    )
