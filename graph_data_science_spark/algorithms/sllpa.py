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
process.

Two equivalent realizations (identical output, asserted by tests):

* :func:`sllpa` — a PregelComputation on the runner's QUEUE
  messenger (the SyncQueueMessenger analog the reference SLLPA runs
  on): speakers send along edges, the runner delivers a bounded
  (count desc, label asc)-ranked inbox, the listener adopts entry 0.
  Hub fan-in stays O(queue_size) — no unbounded collect_list.
* :func:`sllpa_loop` — the original standalone join/groupBy loop,
  kept as the cross-check implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.pregel import PregelComputation, PregelRunner


def _row_mode(col) -> Column:
    """Most frequent element of an array column, ties -> smaller.
    O(k^2) per row with k = memory length (bounded by iterations)."""
    return F.array_max(
        F.transform(
            F.array_distinct(col),
            lambda x: F.struct(
                F.size(F.filter(col, lambda m: m == x)).alias("n"),
                (-x).alias("neg"),
                x.alias("lbl"),
            ),
        )
    )["lbl"]


def _und_graph(graph: Graph) -> Graph:
    edges = (
        projection.orient(graph.view().select("src", "dst"), "UNDIRECTED")
        .dropDuplicates(["src", "dst"])
        .select(
            "src", "dst", F.lit("REL").alias("rel_type"), F.lit(1.0).alias("weight")
        )
    )
    return Graph(name=f"{graph.name}__sllpa", edges=edges, directed=False)


class _SllpaComputation(PregelComputation):
    reducer = "queue"
    queue_size = 8  # the mode needs entry 0; a few spares for audit
    send_full_state = True  # every node speaks every round

    def init(self, graph: Graph) -> DataFrame:
        return graph.vertices().select(
            "id", F.array(F.col("id")).alias("memory"), F.lit(False).alias("_halted")
        )

    def send(self, active: DataFrame, edges: DataFrame, iteration: int) -> DataFrame:
        spoken = active.select("id", _row_mode(F.col("memory")).alias("msg"))
        return spoken.join(edges, spoken.id == edges.src).select(
            F.col("dst"), F.col("msg")
        )

    def step(self, state: DataFrame, inbox: DataFrame, iteration: int) -> DataFrame:
        return (
            state.join(inbox.withColumnRenamed("msg", "_inbox"), "id", "left")
            .select(
                "id",
                F.when(
                    F.col("_inbox").isNotNull(),
                    F.concat("memory", F.array(F.col("_inbox")[0]["msg"])),
                )
                .otherwise(F.col("memory"))
                .alias("memory"),
                F.lit(False).alias("_halted"),
            )
        )


def _extract(state: DataFrame, min_association: float) -> DataFrame:
    return (
        state.select(
            "id", F.size("memory").alias("_m"), F.explode("memory").alias("community")
        )
        .groupBy("id", "community", "_m")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") / F.col("_m") >= min_association)
        .select("id", "community")
    )


def sllpa(
    spark: SparkSession,
    graph: Graph,
    max_iterations: int = 20,
    min_association: float = 0.2,
) -> DataFrame:
    """(id, community) — one row per (node, community) membership;
    nodes can belong to several communities (the overlapping part).
    Runs on the Pregel queue messenger."""
    g = _und_graph(graph).persist()
    try:
        runner = PregelRunner(spark=spark, max_iterations=max_iterations)
        res = runner.run(_SllpaComputation(), g)
    finally:
        g.unpersist()
    return _extract(res.state, min_association)


def sllpa_loop(
    spark: SparkSession,
    graph: Graph,
    max_iterations: int = 20,
    min_association: float = 0.2,
) -> DataFrame:
    """The standalone-loop form of :func:`sllpa` (pre-queue-messenger);
    kept as the equivalence reference for the runner's queue path."""

    def mode_per(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
        counts = df.groupBy(key, val).agg(F.count(F.lit(1)).alias("_n"))
        win = Window.partitionBy(key).orderBy(F.desc("_n"), F.asc(val))
        return (
            counts.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select(F.col(key), F.col(val).alias(out))
        )

    edges = (
        projection.orient(graph.view().select("src", "dst"), "UNDIRECTED")
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    state = graph.vertices().select(
        "id", F.array(F.col("id")).alias("memory")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        spoken = mode_per(
            state.select("id", F.explode("memory").alias("lbl")), "id", "lbl", "spoken"
        )
        heard = (
            edges.join(spoken.select(F.col("id").alias("dst"), "spoken"), "dst")
            .select(F.col("src").alias("id"), "spoken")
        )
        adopted = mode_per(heard, "id", "spoken", "adopt")
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
    return _extract(state, min_association)
