"""Strongly connected components — trimming + forward-backward coloring.

The reference runs a sequential Tarjan-style iterative algorithm
(/root/reference/alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/
scc/SccAlgorithm.java, 225 LoC) — inherently single-threaded. The
distributed classic with identical OUTPUT (component id = MIN vertex
id in the SCC, matching the min-root convention we use for WCC) is
multi-pivot forward-backward coloring (Orzan) with trimming:

  repeat until no vertex unassigned:
    1. TRIM: vertices with no in- or out-edges within the unassigned
       subgraph are singleton SCCs (assign, remove, iterate to
       fixpoint). Kills DAG tails/chains fast.
    2. COLOR: forward min-label propagation over unassigned vertices
       -> color(v) = min id that reaches v (incl. itself).
    3. BACKWARD: from each color root r (color(r) == r), mark
       vertices that reach r through vertices of the SAME color —
       those form SCC(r); assign component = r.

Every phase is frontier joins + min-aggregations — the same shuffle
shape as WCC. Worst case O(D) outer rounds (D = SCC-DAG depth), the
standard distributed trade-off; trimming bounds it on real graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph


def _fixpoint_min_label(seed: DataFrame, edges: DataFrame, forward: bool) -> DataFrame:
    """Propagate min label to fixpoint along edges (forward: src->dst).

    seed: DF(id, label). Returns DF(id, label) at fixpoint, with
    pointer-doubling-style label-of-label shortcutting per round.
    """
    state = seed.localCheckpoint(eager=True)
    a, b = ("src", "dst") if forward else ("dst", "src")
    while True:
        msgs = (
            state.join(edges, state.id == F.col(a))
            .select(F.col(b).alias("id"), F.col("label").alias("_m"))
            .groupBy("id")
            .agg(F.min("_m").alias("_m"))
        )
        new = (
            state.join(msgs, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("_m"), F.col("label"))).alias(
                    "label"
                ),
                F.col("label").alias("_old"),
            )
        )
        # label-of-label shortcut
        lbl = new.select(F.col("id").alias("_lid"), F.col("label").alias("_ll"))
        new = (
            new.join(lbl, new.label == lbl._lid, "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("_ll"), F.col("label"))).alias(
                    "label"
                ),
                "_old",
            )
            .localCheckpoint(eager=True)
        )
        changed = new.where(F.col("label") < F.col("_old")).isEmpty()
        state = new.drop("_old")
        if changed:
            return state


def scc(
    spark: SparkSession,
    graph: Graph,
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component) — component = min vertex id in the SCC."""
    edges0 = graph.view().select("src", "dst").dropDuplicates(["src", "dst"])
    remaining = graph.vertices().localCheckpoint(eager=True)
    edges = edges0.localCheckpoint(eager=True)
    assigned_parts: list[DataFrame] = []

    for _ in range(max_rounds):
        if remaining.isEmpty():
            break
        # -- 1. trim singleton SCCs (no in- or no out-edge) to fixpoint
        while True:
            srcs = edges.select(F.col("src").alias("id")).distinct()
            dsts = edges.select(F.col("dst").alias("id")).distinct()
            core = remaining.join(srcs, "id", "left_semi").join(dsts, "id", "left_semi")
            trimmed = remaining.join(core, "id", "left_anti")
            if trimmed.isEmpty():
                break
            assigned_parts.append(
                trimmed.select("id", F.col("id").alias("component"))
            )
            remaining = core.localCheckpoint(eager=True)
            edges = (
                edges.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .localCheckpoint(eager=True)
            )
        if remaining.isEmpty():
            break
        # -- 2. forward min-label coloring
        colors = _fixpoint_min_label(
            remaining.select("id", F.col("id").alias("label")), edges, forward=True
        )
        # -- 3. backward reach of each color root within its color class
        # restrict edges to same-color endpoints
        ce = (
            edges.join(colors.withColumnRenamed("id", "src").withColumnRenamed("label", "_cs"), "src")
            .join(colors.withColumnRenamed("id", "dst").withColumnRenamed("label", "_cd"), "dst")
            .where(F.col("_cs") == F.col("_cd"))
            .select("src", "dst")
        )
        # roots: label(v) == v; backward propagate a "reached" flag from
        # the root — encode as min-label with sentinel: start label =
        # color for roots, +inf otherwise; propagate backward via min.
        seed = colors.select(
            "id",
            F.when(F.col("label") == F.col("id"), F.col("id"))
            .otherwise(F.lit(2**62))
            .alias("label"),
        )
        back = _fixpoint_min_label(seed, ce, forward=False)
        scc_now = (
            back.join(colors.withColumnRenamed("label", "_color"), "id")
            .where(F.col("label") == F.col("_color"))
            .select("id", F.col("label").alias("component"))
            .localCheckpoint(eager=True)
        )
        assigned_parts.append(scc_now)
        remaining = remaining.join(scc_now.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        edges = (
            edges.join(remaining.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(remaining.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )

    if not remaining.isEmpty():
        raise RuntimeError(
            f"scc did not converge within max_rounds={max_rounds} "
            "(SCC-DAG depth exceeds the round budget; raise max_rounds)"
        )
    if not assigned_parts:
        return graph.vertices().select("id", F.col("id").alias("component"))
    out = assigned_parts[0]
    for p in assigned_parts[1:]:
        out = out.unionByName(p)
    return out
