"""Conductance — per-community boundary/volume ratio.

Reference: /root/reference/alpha/alpha-algo/src/main/java/org/neo4j/
gds/impl/conductance/Conductance.java: for each community C,
conductance(C) = externalEdges(C) / min over the comparison of
(volume(C), volume(complement)) — the reference reports
external / (external + internal) per community (relationship counts,
optionally weighted).

Pure SQL: one join to tag both endpoints, two groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph


def conductance(
    spark: SparkSession,
    graph: Graph,
    communities: DataFrame,
    weighted: bool = False,
) -> DataFrame:
    """(community, conductance) = external / (external + internal)
    over outgoing edge weight per community of the source vertex.

    ``communities``: DF(id, community).
    """
    edges = graph.view(weight_property=weighted)
    c_src = communities.select(F.col("id").alias("src"), F.col("community").alias("_cs"))
    c_dst = communities.select(F.col("id").alias("dst"), F.col("community").alias("_cd"))
    tagged = edges.join(c_src, "src").join(c_dst, "dst")
    w = F.col("weight") if weighted else F.lit(1.0)
    per = tagged.groupBy(F.col("_cs").alias("community")).agg(
        F.sum(F.when(F.col("_cs") != F.col("_cd"), w).otherwise(0.0)).alias("external"),
        F.sum(F.when(F.col("_cs") == F.col("_cd"), w).otherwise(0.0)).alias("internal"),
    )
    return per.select(
        "community",
        F.when(
            (F.col("external") + F.col("internal")) > 0,
            F.col("external") / (F.col("external") + F.col("internal")),
        )
        .otherwise(F.lit(0.0))
        .alias("conductance"),
    )
