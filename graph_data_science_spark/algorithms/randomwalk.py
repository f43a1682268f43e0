"""Random walks — first- and second-order (node2vec p/q) sampling.

Reference: /root/reference/algo/src/main/java/org/neo4j/gds/
traversal/RandomWalk.java (305 LoC; p/q in-out/return bias per
Grover & Leskovec) feeding node2vec
(embeddings/node2vec/Node2VecBaseConfig.java: walksPerNode 10,
walkLength 80, returnFactor/inOutFactor 1.0).

Spark realization: a walk step is one join — frontier (walk_id, prev,
cur) ⋈ edges on cur=src — followed by a deterministic weighted pick
per walk: each candidate gets a hash-uniform u in [0,1) and score
u^(1/bias_weight) (the exponential-race trick: argmax of u^(1/w) is
a w-weighted sample); the per-walk argmax is a grouped top-1 window.
The p/q bias needs to know whether the candidate neighbors the
previous vertex — one extra left-semi-style join against the edge
set per step. Everything is hash-seeded by (seed, walk_id, step) —
reproducible at any parallelism, no per-row Python.

Walks that reach a sink vertex stop early (the reference truncates
the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph


def random_walks(
    spark: SparkSession,
    graph: Graph,
    walk_length: int = 80,
    walks_per_node: int = 10,
    return_factor: float = 1.0,  # p — cost of going back
    in_out_factor: float = 1.0,  # q — cost of leaving the neighborhood
    seed: int = 42,
    start_nodes: DataFrame | None = None,
) -> DataFrame:
    """(walk_id, step, id) — one row per visited vertex per walk."""
    edges = graph.view().select("src", "dst").dropDuplicates(["src", "dst"]).persist()
    starts = (start_nodes or graph.vertices()).select("id")
    walks = (
        starts.crossJoin(spark.range(walks_per_node).select(F.col("id").alias("_w")))
        .select(
            (F.col("id") * walks_per_node + F.col("_w")).alias("walk_id"),
            F.col("id").alias("cur"),
        )
        .withColumn("prev", F.lit(None).cast("long"))
        .localCheckpoint(eager=True)
    )
    out = [walks.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("id"))]
    second_order = return_factor != 1.0 or in_out_factor != 1.0

    frontier = walks
    for step in range(1, walk_length):
        cand = frontier.join(edges, frontier.cur == edges.src).select(
            "walk_id", "prev", "cur", F.col("dst").alias("nxt")
        )
        if second_order:
            # is the candidate a neighbor of prev? (distance-1 check)
            pe = edges.select(
                F.col("src").alias("prev"), F.col("dst").alias("nxt"),
                F.lit(True).alias("_adj"),
            )
            cand = cand.join(pe, ["prev", "nxt"], "left")
            bias = (
                F.when(F.col("nxt") == F.col("prev"), F.lit(1.0 / return_factor))
                .when(F.col("_adj"), F.lit(1.0))
                .otherwise(F.lit(1.0 / in_out_factor))
            )
            cand = cand.withColumn("_bias", bias).drop("_adj")
        else:
            cand = cand.withColumn("_bias", F.lit(1.0))
        # weighted pick via exponential race: argmax u^(1/w)
        u = (
            F.pmod(F.xxhash64("walk_id", F.lit(step), "nxt", F.lit(seed)), F.lit(1 << 24))
            / F.lit(float(1 << 24))
        )
        cand = cand.withColumn(
            "_score", F.pow(u + F.lit(1e-12), 1.0 / F.col("_bias"))
        )
        from pyspark.sql import Window

        win = Window.partitionBy("walk_id").orderBy(F.desc("_score"), F.asc("nxt"))
        picked = (
            cand.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select(
                "walk_id",
                F.col("cur").alias("prev"),
                F.col("nxt").alias("cur"),
            )
            .localCheckpoint(eager=True)
        )
        if picked.isEmpty():
            break
        out.append(
            picked.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias("id"))
        )
        frontier = picked

    edges.unpersist()
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.repartition("walk_id")
