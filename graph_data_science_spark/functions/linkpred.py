"""Topological link-prediction functions.

Reference: /root/reference/alpha/alpha-proc/src/main/java/org/neo4j/
gds/linkprediction/LinkPredictionFunc.java:30-110 and
NeighborsFinder.java:15-46 — gds.alpha.linkprediction.{adamicAdar,
resourceAllocation, commonNeighbors, preferentialAttachment,
totalNeighbors, sameCommunity}.

Reference semantics, reproduced exactly:

* neighbor sets are DISTINCT nodes (HashSet), self excluded;
* common neighbors under direction d = N_d(n1) ∩ N_d(n2)
  (NeighborsFinder.findCommonNeighbors: a candidate c in N_d(n1) is
  kept when n2 is among c's flipped-direction neighbors, i.e. c is in
  N_d(n2) too); a node paired with itself has no common neighbors;
* degree is the RAW relationship count under d (Node.getDegree), not
  the distinct-neighbor count — parallel edges count;
* adamicAdar = Σ_c 1/ln(degree(c)), resourceAllocation = Σ_c
  1/degree(c) over common neighbors c (degree under d, not flipped);
* preferentialAttachment = degree(n1) * degree(n2);
* totalNeighbors = |N_d(n1) ∪ N_d(n2)|;
* sameCommunity = 1.0 when both nodes carry the property and the
  values are equal, else 0.0.

The reference evaluates these per node pair inside Cypher; here the
same scores come back for a whole pair TABLE in one plan — neighbor
join + aggregation, shuffle keyed by (node1, node2), no per-row
Python. At web scale the pair table is the caller's candidate set
(e.g. LSH or KNN output), never all pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph

_DIRECTIONS = ("BOTH", "OUTGOING", "INCOMING")


def _neighbor_pairs(graph: Graph, direction: str, rel_types) -> DataFrame:
    """(node, nbr) edge endpoints under the direction, self excluded,
    NOT deduplicated (degree = raw relationship count)."""
    e = graph.view(rel_types=rel_types).where(F.col("src") != F.col("dst"))
    out = e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    inc = e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    if direction == "OUTGOING":
        return out
    if direction == "INCOMING":
        return inc
    return out.unionByName(inc)


def link_prediction_scores(
    graph: Graph,
    pairs: DataFrame,
    direction: str = "BOTH",
    rel_types: list[str] | None = None,
    communities: DataFrame | None = None,
) -> DataFrame:
    """(node1, node2, common_neighbors, adamic_adar,
    resource_allocation, preferential_attachment, total_neighbors
    [, same_community]) for every row of ``pairs`` (node1, node2).

    ``communities`` (id, community) adds the sameCommunity column —
    missing ids score 0.0 like the reference's missing property.
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    rel = _neighbor_pairs(graph, direction, rel_types)
    nbrs = rel.distinct()
    deg = rel.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    n1 = nbrs.select(F.col("node").alias("node1"), F.col("nbr").alias("c"))
    n2 = nbrs.select(F.col("node").alias("node2"), F.col("nbr").alias("c"))
    # Java-faithful degenerate cases (getDegree of the common
    # neighbor under d, NOT flipped — can be 0 or 1 on directed
    # views): 1/ln(1) = +Inf, 1/ln(0) = 1/-Inf = -0.0, 1/0 = +Inf.
    # Spark's ANSI division would raise instead, so spell them out.
    inf = F.lit(float("inf"))
    cdeg = F.coalesce(F.col("deg"), F.lit(0))
    aa_term = (
        F.when(cdeg == 0, F.lit(0.0))
        .when(cdeg == 1, inf)
        .otherwise(1.0 / F.log(cdeg))
    )
    ra_term = F.when(cdeg == 0, inf).otherwise(1.0 / cdeg)
    common = (
        pairs.join(n1, "node1")
        .join(n2, ["node2", "c"])
        .join(deg.select(F.col("node").alias("c"), "deg"), "c", "left")
        .groupBy("node1", "node2")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(aa_term).alias("adamic_adar"),
            F.sum(ra_term).alias("resource_allocation"),
        )
    )
    ncount = nbrs.groupBy("node").agg(F.count(F.lit(1)).alias("n_nbrs"))

    def _per_node(col: str, out: str, src: DataFrame, val: str) -> DataFrame:
        return src.select(F.col("node").alias(col), F.col(val).alias(out))

    scored = (
        pairs.join(common, ["node1", "node2"], "left")
        .join(_per_node("node1", "deg1", deg, "deg"), "node1", "left")
        .join(_per_node("node2", "deg2", deg, "deg"), "node2", "left")
        .join(_per_node("node1", "nn1", ncount, "n_nbrs"), "node1", "left")
        .join(_per_node("node2", "nn2", ncount, "n_nbrs"), "node2", "left")
    )
    cn = F.coalesce(F.col("common_neighbors"), F.lit(0)).cast("double")
    total = F.when(
        F.col("node1") == F.col("node2"), F.coalesce(F.col("nn1"), F.lit(0))
    ).otherwise(
        F.coalesce(F.col("nn1"), F.lit(0)) + F.coalesce(F.col("nn2"), F.lit(0)) - cn
    )
    out_cols = [
        "node1",
        "node2",
        # self pairs have no common neighbors (reference returns the
        # empty set for node1 == node2)
        F.when(F.col("node1") == F.col("node2"), F.lit(0.0))
        .otherwise(cn)
        .alias("common_neighbors"),
        F.when(F.col("node1") == F.col("node2"), F.lit(0.0))
        .otherwise(F.coalesce(F.col("adamic_adar"), F.lit(0.0)))
        .alias("adamic_adar"),
        F.when(F.col("node1") == F.col("node2"), F.lit(0.0))
        .otherwise(F.coalesce(F.col("resource_allocation"), F.lit(0.0)))
        .alias("resource_allocation"),
        (
            F.coalesce(F.col("deg1"), F.lit(0)).cast("double")
            * F.coalesce(F.col("deg2"), F.lit(0)).cast("double")
        ).alias("preferential_attachment"),
        total.cast("double").alias("total_neighbors"),
    ]
    if communities is not None:
        c1 = communities.select(
            F.col("id").alias("node1"), F.col("community").alias("_c1")
        )
        c2 = communities.select(
            F.col("id").alias("node2"), F.col("community").alias("_c2")
        )
        scored = scored.join(c1, "node1", "left").join(c2, "node2", "left")
        out_cols.append(
            F.when(
                F.col("_c1").isNotNull()
                & F.col("_c2").isNotNull()
                & (F.col("_c1") == F.col("_c2")),
                F.lit(1.0),
            )
            .otherwise(F.lit(0.0))
            .alias("same_community")
        )
    return scored.select(*out_cols)


def one_hot_encoding(available_values, selected_values):
    """Column function — gds.alpha.ml.oneHotEncoding
    (OneHotEncodingFunc.java): given an array column of available
    values and an array column of selected values, return
    array<int> with 1 at positions whose available value is selected.
    """
    return F.transform(
        available_values,
        lambda v: F.when(F.array_contains(selected_values, v), 1).otherwise(0),
    )
