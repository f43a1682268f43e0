"""Speaker-Listener Label Propagation (SLLPA) — overlapping communities.

Reference: /root/reference/alpha/alpha-proc/src/main/java/org/neo4j/
gds/pregel/SpeakerListenerLPA.java (179 LoC; SLPA per Xie et al.):
every node keeps a label MEMORY; per round each neighbor "speaks"
one label from its memory, the listener adopts the most frequent
heard label; after T rounds a node's communities are the labels
holding at least `min_association` fraction of its memory.

The reference speaks a uniformly random memory entry; for
reproducibility this engine speaks the memory MODE (most frequent,
ties to the smaller label) — the deterministic limit of the same
process. Memory is an array column; all per-round work is
explode -> two grouped aggregations -> grouped top-1 -> array
concat. Memory length is bounded by max_iterations, so the state
row stays O(iterations) wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph


def _mode_per(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """(key, out) = most frequent val per key, ties -> smaller val."""
    counts = df.groupBy(key, val).agg(F.count(F.lit(1)).alias("_n"))
    win = Window.partitionBy(key).orderBy(F.desc("_n"), F.asc(val))
    return (
        counts.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") == 1)
        .select(F.col(key), F.col(val).alias(out))
    )


def sllpa(
    spark: SparkSession,
    graph: Graph,
    max_iterations: int = 20,
    min_association: float = 0.2,
) -> DataFrame:
    """(id, community) — one row per (node, community) membership;
    nodes can belong to several communities (the overlapping part)."""
    edges = (
        projection.orient(graph.view().select("src", "dst"), "UNDIRECTED")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    state = graph.vertices().select(
        "id", F.array(F.col("id")).alias("memory")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        spoken = _mode_per(
            state.select("id", F.explode("memory").alias("lbl")), "id", "lbl", "spoken"
        )
        heard = (
            edges.join(
                spoken.select(F.col("id").alias("dst"), "spoken"), "dst"
            )
            .select(F.col("src").alias("id"), "spoken")
        )
        adopted = _mode_per(heard, "id", "spoken", "adopt")
        state = (
            state.join(adopted, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("adopt").isNotNull(),
                    F.concat("memory", F.array("adopt")),
                )
                .otherwise(F.col("memory"))
                .alias("memory"),
            )
            .localCheckpoint(eager=True)
        )

    edges.unpersist()
    freq = (
        state.select("id", F.size("memory").alias("_m"), F.explode("memory").alias("community"))
        .groupBy("id", "community", "_m")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") / F.col("_m") >= min_association)
        .select("id", "community")
    )
    return freq
