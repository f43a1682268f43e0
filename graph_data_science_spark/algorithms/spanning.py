"""Minimum/maximum spanning forest — distributed Borůvka.

The reference uses sequential Prim from a root
(/root/reference/alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/
spanningTrees/Prim.java, 168 LoC; KSpanningTree.java for k-trees).
Prim's heap is inherently sequential; Borůvka is the distributed
classic and produces the IDENTICAL minimum spanning forest whenever
edge weights are distinct (ties here are broken deterministically by
(weight, src, dst), so the output is always unique — the divergence
from Prim exists only on tied weights, documented per SURVEY §2.3).

Per round (O(log n) rounds): every component picks its lightest
outgoing edge (grouped top-1), picked edges join the forest, and
components merge by min-label propagation over the picked edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph


def spanning_forest(
    spark: SparkSession,
    graph: Graph,
    max_rounds: int = 64,
    objective: str = "minimum",
) -> DataFrame:
    """Forest edges (src, dst, weight) of the undirected spanning
    forest under ``objective`` ("minimum" | "maximum").

    The reference's maximum variant is Prim over negated weights
    (alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/spanningTrees/
    Prim.java:50 ``MAX_OPERATOR = (w) -> -w``); here Borůvka picks
    each component's heaviest outgoing edge instead of its lightest —
    identical tree by the same negation argument, deterministic
    tie-break (weight, src, dst) either way."""
    if objective not in ("minimum", "maximum"):
        raise ValueError("objective must be 'minimum' or 'maximum'")
    maximize = objective == "maximum"
    base = (
        graph.view(weight_property=True)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(
            (F.max("weight") if maximize else F.min("weight")).alias("weight")
        )
        .persist()
    )
    comp = projection.vertices(base).select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint(eager=True)
    forest = None

    for _ in range(max_rounds):
        cs = comp.select(F.col("id").alias("src"), F.col("comp").alias("_cs"))
        cd = comp.select(F.col("id").alias("dst"), F.col("comp").alias("_cd"))
        cross = (
            base.join(cs, "src")
            .join(cd, "dst")
            .where(F.col("_cs") != F.col("_cd"))
        )
        if cross.isEmpty():
            break
        # lightest outgoing edge per component (both endpoints' views)
        both = cross.select(F.col("_cs").alias("c"), "src", "dst", "weight").unionByName(
            cross.select(F.col("_cd").alias("c"), "src", "dst", "weight")
        )
        win = Window.partitionBy("c").orderBy(
            F.desc("weight") if maximize else F.asc("weight"), "src", "dst"
        )
        picked = (
            both.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select("src", "dst", "weight")
            .dropDuplicates(["src", "dst"])
            .localCheckpoint(eager=True)
        )
        forest = picked if forest is None else forest.unionByName(picked).dropDuplicates(
            ["src", "dst"]
        )
        # merge components along picked edges: min-label to fixpoint
        merged = comp
        pick_und = picked.select("src", "dst").unionByName(
            picked.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        while True:
            msgs = (
                merged.join(pick_und, merged.id == pick_und.src)
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("comp").alias("_m"))
            )
            nxt = (
                merged.join(msgs, "id", "left")
                .select(
                    "id",
                    F.least(F.col("comp"), F.coalesce(F.col("_m"), F.col("comp"))).alias(
                        "comp"
                    ),
                    F.col("comp").alias("_old"),
                )
            )
            # comp-of-comp shortcut for O(log) convergence
            lbl = nxt.select(F.col("id").alias("_l"), F.col("comp").alias("_lc"))
            nxt = (
                nxt.join(lbl, nxt.comp == lbl._l, "left")
                .select(
                    "id",
                    F.least(F.col("comp"), F.coalesce(F.col("_lc"), F.col("comp"))).alias(
                        "comp"
                    ),
                    "_old",
                )
                .localCheckpoint(eager=True)
            )
            if nxt.where(F.col("comp") < F.col("_old")).isEmpty():
                merged = nxt.drop("_old")
                break
            merged = nxt.drop("_old")
        comp = merged.localCheckpoint(eager=True)

    base.unpersist()
    if forest is None:
        return spark.createDataFrame([], "src long, dst long, weight double")
    return forest.localCheckpoint(eager=True)


def minimum_spanning_forest(
    spark: SparkSession,
    graph: Graph,
    max_rounds: int = 64,
) -> DataFrame:
    """gds.alpha.spanningTree.minimum analog."""
    return spanning_forest(spark, graph, max_rounds, objective="minimum")


def maximum_spanning_forest(
    spark: SparkSession,
    graph: Graph,
    max_rounds: int = 64,
) -> DataFrame:
    """gds.alpha.spanningTree.maximum analog (Prim MAX_OPERATOR)."""
    return spanning_forest(spark, graph, max_rounds, objective="maximum")


def k_spanning_tree(
    spark: SparkSession,
    graph: Graph,
    k: int,
    max_rounds: int = 64,
    objective: str = "minimum",
) -> DataFrame:
    """(id, component) — partition into >= k trees by cutting k-1
    edges from the spanning forest.

    Reference: /root/reference/alpha/alpha-algo/src/main/java/org/
    neo4j/gds/impl/spanningTrees/KSpanningTree.java (Prim tree, then
    prune k-1 edges) and KSpanningTreeProc.java (kmin/kmax entry
    points). objective="minimum" (kmin) builds the MIN forest and
    cuts the k-1 HEAVIEST tree edges; "maximum" (kmax) builds the
    MAX forest and cuts the k-1 LIGHTEST (KSpanningTree.java:80
    flips the cut queue against the build operator). On a
    disconnected graph the cut applies to the whole forest, yielding
    (#components + k - 1) trees. Deterministic tie-break; the cut is
    a distributed top-(k-1) — no global sort materializes.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    maximize = objective == "maximum"
    forest = spanning_forest(spark, graph, max_rounds, objective=objective).persist()
    cut = (
        forest.orderBy(
            F.asc("weight") if maximize else F.desc("weight"),
            F.asc("src"),
            F.asc("dst"),
        )
        .limit(k - 1)
        .select("src", "dst")
    )
    kept = forest.join(cut, ["src", "dst"], "left_anti")
    und = kept.select("src", "dst").unionByName(
        kept.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    comp = projection.vertices(graph.edges).select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint(eager=True)
    # min-label to fixpoint over the kept forest (trees are tiny
    # diameter after the comp-of-comp shortcut)
    while True:
        msgs = (
            comp.join(und, comp.id == und.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("comp").alias("_m"))
        )
        nxt = comp.join(msgs, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce(F.col("_m"), F.col("comp"))).alias("comp"),
            F.col("comp").alias("_old"),
        )
        lbl = nxt.select(F.col("id").alias("_l"), F.col("comp").alias("_lc"))
        nxt = (
            nxt.join(lbl, nxt.comp == lbl._l, "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("_lc"), F.col("comp"))).alias(
                    "comp"
                ),
                "_old",
            )
            .localCheckpoint(eager=True)
        )
        done = nxt.where(F.col("comp") < F.col("_old")).isEmpty()
        comp = nxt.drop("_old")
        if done:
            break
    forest.unpersist()
    return comp.select("id", F.col("comp").alias("component"))
