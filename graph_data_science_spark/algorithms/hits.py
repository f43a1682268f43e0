"""HITS — hubs & authorities (gds.alpha.hits analog).

Semantics from /root/reference/alpha/alpha-proc/src/main/java/org/
neo4j/gds/pregel/Hits.java:69-157: init auth = hub = 1; phase 0 sets
auth(v) = in-degree; then per hits-iteration

    normalize auths:   auth /= sqrt(sum(auth^2))        (:149-156)
    hubs:              hub(u) = sum of auth(v) over out-nbrs (:120-127)
    normalize hubs:    hub  /= sqrt(sum(hub^2))
    auths:             auth(v) = sum of hub(u) over in-nbrs

(The reference drives this as 4 Pregel supersteps per iteration,
maxIterations = 4*hitsIterations + 1, Hits.java:166-170; here each
phase is one join+agg job and the L2 norms are driver-side scalar
aggregates — the masterCompute analog.)

Scale: identical plan shape to PageRank supersteps — frontier ⋈
edges, partial+final sum; two scalar aggs per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph


def _l2_normalize(state: DataFrame, col: str) -> DataFrame:
    norm = state.agg(F.sqrt(F.sum(F.col(col) ** 2))).collect()[0][0] or 1.0
    return state.withColumn(col, F.col(col) / F.lit(float(norm)))


def hits(
    spark: SparkSession,
    graph: Graph,
    hits_iterations: int = 20,
) -> DataFrame:
    """(id, auth, hub) after ``hits_iterations`` normalize-and-sum
    rounds, matching the reference's phase order."""
    edges = graph.view().select("src", "dst").persist()
    verts = graph.vertices()

    in_deg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("auth")
    )
    state = (
        verts.join(in_deg, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
            F.lit(1.0).alias("hub"),
        )
        .localCheckpoint(eager=True)
    )

    from graph_data_science_spark.pregel import _free_local_checkpoint

    for _ in range(hits_iterations):
        prev = state
        state = _l2_normalize(state, "auth")
        # hub(u) = sum of normalized auth over u's out-neighbors
        hub_msgs = (
            state.select(F.col("id").alias("_v"), "auth")
            .join(edges, F.col("_v") == edges.dst)
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("_hub"))
        )
        state = state.join(hub_msgs, "id", "left").select(
            "id", "auth", F.coalesce(F.col("_hub"), F.lit(0.0)).alias("hub")
        )
        state = _l2_normalize(state, "hub")
        # auth(v) = sum of normalized hub over v's in-neighbors
        auth_msgs = (
            state.select(F.col("id").alias("_u"), "hub")
            .join(edges, F.col("_u") == edges.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("_auth"))
        )
        state = (
            state.join(auth_msgs, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("_auth"), F.lit(0.0)).alias("auth"),
                "hub",
            )
            .localCheckpoint(eager=True)
        )
        _free_local_checkpoint(prev)  # superseded round snapshot
    edges.unpersist()
    return state.select("id", "auth", "hub")
