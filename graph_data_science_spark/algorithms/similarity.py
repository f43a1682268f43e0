"""Node similarity — Jaccard/overlap/cosine over neighbor sets.

Reference: /root/reference/algo/src/main/java/org/neo4j/gds/
similarity/nodesim/NodeSimilarity.java (jaccard :315-319; config
defaults degreeCutoff 1, similarityCutoff 1e-42, topK 10 via bounded
TopKMap).

Spark plan: candidate pairs = source nodes sharing >= 1 target
(shingle-style join on the shared neighbor), so disconnected sources
never pair; intersection counts from the join, union from degree
sums; grouped top-K via a window with EXPLICIT tie-break
(desc similarity, asc neighbor id) for deterministic parity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph


@dataclass
class NodeSimilarityConfig:
    degree_cutoff: int = 1
    similarity_cutoff: float = 1e-42
    top_k: int = 10
    metric: str = "JACCARD"  # JACCARD | OVERLAP


def node_similarity(
    spark: SparkSession,
    graph: Graph,
    config: NodeSimilarityConfig | None = None,
) -> DataFrame:
    """(node1, node2, similarity, rank) — top-K similar per node."""
    cfg = config or NodeSimilarityConfig()
    edges = graph.view().select("src", "dst").dropDuplicates(["src", "dst"])
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    eligible = deg.where(F.col("deg") >= cfg.degree_cutoff)
    e = edges.join(eligible.select("src"), "src", "left_semi")

    a = e.select(F.col("src").alias("node1"), "dst")
    b = e.select(F.col("src").alias("node2"), "dst")
    inter = (
        a.join(b, "dst")
        .where(F.col("node1") != F.col("node2"))
        .groupBy("node1", "node2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    d1 = eligible.select(F.col("src").alias("node1"), F.col("deg").alias("deg1"))
    d2 = eligible.select(F.col("src").alias("node2"), F.col("deg").alias("deg2"))
    joined = inter.join(d1, "node1").join(d2, "node2")
    if cfg.metric.upper() == "JACCARD":
        sim = F.col("inter") / (F.col("deg1") + F.col("deg2") - F.col("inter")).cast(
            "double"
        )
    elif cfg.metric.upper() == "OVERLAP":
        sim = F.col("inter") / F.least("deg1", "deg2").cast("double")
    else:
        raise ValueError(f"unknown metric {cfg.metric!r}")
    w = Window.partitionBy("node1").orderBy(F.desc("similarity"), F.asc("node2"))
    return (
        joined.withColumn("similarity", F.round(sim, 6))
        .where(F.col("similarity") >= cfg.similarity_cutoff)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cfg.top_k)
        .select("node1", "node2", "similarity", "rank")
    )
