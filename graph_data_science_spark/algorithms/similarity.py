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
    #: per-node LEAST-similar k (NodeSimilarityBaseConfig bottomK);
    #: >0 switches the per-node ranking to ascending — mutually
    #: exclusive with a non-default top_k, as in the reference
    bottom_k: int = 0
    #: global result caps (topN/bottomN, 0 = unlimited): keep only
    #: the N highest- (or lowest-) similarity pairs overall
    top_n: int = 0
    bottom_n: int = 0
    metric: str = "JACCARD"  # JACCARD | OVERLAP
    #: relationshipWeightProperty analog (NodeSimilarity.java:76,
    #: weightedJaccard :324-363): jaccard = sum(min(w1,w2)) /
    #: (total1 + total2 - sum(min)), overlap = sum(min) /
    #: min(total1, total2); parallel edges aggregate by weight sum
    weighted: bool = False
    #: shared neighbors with in-degree above this take the 2-D salted
    #: pair-generation path (the hub-dst n^2 blowup otherwise lands
    #: in ONE task — AQE splits post-shuffle partitions but cannot
    #: split a single join key); <=0 disables the hub path
    hub_threshold: int = 5_000
    #: salt grid size for the hub path: each hub's pair generation
    #: spreads over salt^2 tasks at the cost of replicating only the
    #: hub rows salt times per side
    hub_salt: int = 16


def node_similarity(
    spark: SparkSession,
    graph: Graph,
    config: NodeSimilarityConfig | None = None,
) -> DataFrame:
    """(node1, node2, similarity, rank) — top-K similar per node."""
    cfg = config or NodeSimilarityConfig()
    # the deduped neighbor table is read 4x (degree agg, hub agg,
    # pair join both sides) — persist it once on the graph handle
    # (the CSR-build analog, shared across runs on the same graph)
    if cfg.weighted:
        edges = graph.cached(
            ("nodesim_edges", True),
            lambda: graph.view(weight_property=True)
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("_w")),
        )
    else:
        edges = graph.cached(
            ("nodesim_edges", False),
            lambda: graph.view()
            .select("src", "dst")
            .dropDuplicates(["src", "dst"]),
        )
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg"),
        *([F.sum("_w").alias("tot")] if cfg.weighted else []),
    )
    eligible = deg.where(F.col("deg") >= cfg.degree_cutoff)
    e = edges.join(eligible.select("src"), "src", "left_semi")

    wcols1 = [F.col("_w").alias("_w1")] if cfg.weighted else []
    wcols2 = [F.col("_w").alias("_w2")] if cfg.weighted else []
    a = e.select(F.col("src").alias("node1"), "dst", *wcols1)
    b = e.select(F.col("src").alias("node2"), "dst", *wcols2)

    pcols = ["node1", "node2"] + (["_w1", "_w2"] if cfg.weighted else [])
    if cfg.hub_threshold > 0:
        # hub-aware split: dsts shared by more than hub_threshold
        # sources explode n^2 pairs into a single join-key task; route
        # them through a 2-D salt grid instead. a-side keys on
        # (dst, i=h(node1)%S, j=*), b-side on (dst, i=*, j=h(node2)%S)
        # — every pair lands in exactly one (i, j) cell, so counts are
        # exact and the hub's work spreads over S^2 tasks.
        s = cfg.hub_salt
        hubs = (
            e.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("_dn"))
            .where(F.col("_dn") > cfg.hub_threshold)
            .select("dst")
            .persist()
        )
        if hubs.isEmpty():
            # common case: no dst above threshold — take the plain
            # join and pay only the one degree aggregate, not the
            # anti/semi/salt-join plumbing
            hubs.unpersist()
            pairs = a.join(b, "dst").select(*pcols)
        else:
            a_n = a.join(F.broadcast(hubs), "dst", "left_anti")
            b_n = b.join(F.broadcast(hubs), "dst", "left_anti")
            pairs_n = a_n.join(b_n, "dst").select(*pcols)
            grid = spark.range(s).select(F.col("id").cast("int").alias("_g"))
            a_h = (
                a.join(F.broadcast(hubs), "dst", "left_semi")
                .withColumn("_i", F.pmod(F.xxhash64("node1"), F.lit(s)).cast("int"))
                .crossJoin(F.broadcast(grid.withColumnRenamed("_g", "_j")))
            )
            b_h = (
                b.join(F.broadcast(hubs), "dst", "left_semi")
                .withColumn("_j", F.pmod(F.xxhash64("node2"), F.lit(s)).cast("int"))
                .crossJoin(F.broadcast(grid.withColumnRenamed("_g", "_i")))
            )
            pairs_h = a_h.join(b_h, ["dst", "_i", "_j"]).select(*pcols)
            pairs = pairs_n.unionByName(pairs_h)
    else:
        pairs = a.join(b, "dst").select(*pcols)

    inter_aggs = [F.count(F.lit(1)).alias("inter")]
    if cfg.weighted:
        inter_aggs.append(
            F.sum(F.least("_w1", "_w2")).alias("inter_min")
        )
    inter = (
        pairs.where(F.col("node1") != F.col("node2"))
        .groupBy("node1", "node2")
        .agg(*inter_aggs)
    )
    totcols1 = [F.col("tot").alias("tot1")] if cfg.weighted else []
    totcols2 = [F.col("tot").alias("tot2")] if cfg.weighted else []
    d1 = eligible.select(
        F.col("src").alias("node1"), F.col("deg").alias("deg1"), *totcols1
    )
    d2 = eligible.select(
        F.col("src").alias("node2"), F.col("deg").alias("deg2"), *totcols2
    )
    joined = inter.join(d1, "node1").join(d2, "node2")
    if cfg.metric.upper() == "JACCARD":
        if cfg.weighted:
            sim = F.col("inter_min") / (
                F.col("tot1") + F.col("tot2") - F.col("inter_min")
            )
        else:
            sim = F.col("inter") / (
                F.col("deg1") + F.col("deg2") - F.col("inter")
            ).cast("double")
    elif cfg.metric.upper() == "OVERLAP":
        if cfg.weighted:
            sim = F.col("inter_min") / F.least("tot1", "tot2")
        else:
            sim = F.col("inter") / F.least("deg1", "deg2").cast("double")
    else:
        raise ValueError(f"unknown metric {cfg.metric!r}")
    if cfg.bottom_k > 0 and cfg.top_k != 10:
        raise ValueError("topK and bottomK cannot both be configured")
    if cfg.top_n > 0 and cfg.bottom_n > 0:
        raise ValueError("topN and bottomN cannot both be configured")
    k = cfg.bottom_k if cfg.bottom_k > 0 else cfg.top_k
    order = (
        [F.asc("similarity"), F.asc("node2")]
        if cfg.bottom_k > 0
        else [F.desc("similarity"), F.asc("node2")]
    )
    w = Window.partitionBy("node1").orderBy(*order)
    out = (
        joined.withColumn("similarity", F.round(sim, 6))
        .where(F.col("similarity") >= cfg.similarity_cutoff)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("node1", "node2", "similarity", "rank")
    )
    # global caps: orderBy().limit() compiles to TakeOrdered — a
    # per-partition top-N + driver merge of N rows, no global sort
    if cfg.top_n > 0:
        out = out.orderBy(
            F.desc("similarity"), F.asc("node1"), F.asc("node2")
        ).limit(cfg.top_n)
    elif cfg.bottom_n > 0:
        out = out.orderBy(
            F.asc("similarity"), F.asc("node1"), F.asc("node2")
        ).limit(cfg.bottom_n)
    return out
