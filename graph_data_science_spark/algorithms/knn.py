"""KNN over node properties — deterministic NN-descent.

Reference: /root/reference/algo/src/main/java/org/neo4j/gds/
similarity/knn/Knn.java (625 LoC; NN-Descent per Dong et al. with
defaults topK 10, sampleRate 0.5, deltaThreshold 1e-3, randomJoins
10, maxIterations 100 — KnnBaseConfig.java:41-106), similarity over
node property vectors (SimilarityComputer.java).

Spark realization, deterministic end-to-end (the reference is
randomized; GDS itself only promises approximate results):

  init: k hash-pseudo-random candidate neighbors per node
  iterate: candidates = current ∪ reversed ∪ neighbors-of-neighbors
           -> cosine via JVM zip_with/aggregate -> grouped top-k
           until the fraction of changed (node, neighbor) pairs
           drops below delta_threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.ann import _dot, _norm
from graph_data_science_spark.util import Truncator


#: SimilarityComputer.java:33-90 dispatch — metric per property type
_SIMILARITY_FOR_TYPE = {
    "double": "scalar",
    "float": "scalar",
    "bigint": "scalar",
    "int": "scalar",
    "array<long>": "jaccard",
    "array<bigint>": "jaccard",
    "array<int>": "jaccard",
}


def _similarity_expr(metric: str, a, b):
    """The reference's SimilarityComputer family as column exprs:
    float arrays -> cosine, long arrays -> jaccard overlap, scalars
    -> 1/(1+|a-b|)  (SimilarityComputer.java:33-90)."""
    if metric == "cosine":
        return _dot(a, b) / (_norm(a) * _norm(b))
    if metric == "jaccard":
        inter = F.size(F.array_intersect(a, b)).cast("double")
        union = F.size(F.array_union(a, b)).cast("double")
        return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    if metric == "overlap":
        inter = F.size(F.array_intersect(a, b)).cast("double")
        mn = F.least(F.size(a), F.size(b)).cast("double")
        return F.when(mn > 0, inter / mn).otherwise(F.lit(0.0))
    if metric == "scalar":
        return 1.0 / (1.0 + F.abs(a.cast("double") - b.cast("double")))
    raise ValueError(f"unknown similarity metric {metric!r}")


def _scalar_exact_knn(
    spark: SparkSession,
    nodes: DataFrame,
    id_col: str,
    vec_col: str,
    top_k: int,
) -> DataFrame:
    """EXACT top-k for SCALAR properties — no NN-descent.

    1-D similarity 1/(1+|a-b|) is monotone in |a-b|, so each node's
    true top-k lives among the nodes of the ±top_k nearest DISTINCT
    values, and within a tied-value group only the top_k+1 smallest
    ids can ever rank (the (node2 ASC) tie-break prefers them, and
    k+1 of them crowd out the rest). Candidates are therefore the
    "group heads" (first top_k+1 ids per value, exact two-stage
    top-k — no single-task window funnel) of the ±top_k
    distinct-value window: (2k+1)(k+1) candidates per node, provably
    a superset of the true top-k. Replaces NN-descent for scalars,
    whose recall degrades badly on dense/tied values (measured 0.65
    mean-similarity ratio on sf0.1 c_acctbal; this path is 1.0 by
    construction). Ranking uses the UNROUNDED similarity (the
    superset proof holds for exact distances: any value tying the
    k-th merged distance sits within +-k distinct ranks; a
    post-rounding tie could instead be won by a node OUTSIDE the
    window) — the engine-wide 6-dp rounding is applied to the output
    column only.
    """
    from graph_data_science_spark.util import global_rank

    k = top_k
    v = nodes.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("double").alias("val")
    ).where(F.col("val").isNotNull())
    vals = global_rank(v.select("val").distinct(), ["val"], rank_col="_vr")
    withpid = v.withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("val", "_pid").orderBy("id")
    pruned = (
        withpid.withColumn("_lr", F.row_number().over(w_local))
        .where(F.col("_lr") <= k + 1)
        .drop("_lr", "_pid")
    )
    w_g = Window.partitionBy("val").orderBy("id")
    heads = (
        pruned.withColumn("_gr", F.row_number().over(w_g))
        .where(F.col("_gr") <= k + 1)
        .drop("_gr")
    )
    heads_r = heads.join(vals, "val").select(
        F.col("id").alias("node2"), F.col("val").alias("_bv"),
        F.col("_vr").alias("_hvr"),
    )
    node_r = v.join(vals, "val").select(
        F.col("id").alias("node1"), F.col("val").alias("_av"), F.col("_vr")
    )
    offs = spark.range(-k, k + 1).select(F.col("id").cast("long").alias("_off"))
    cand = (
        node_r.join(F.broadcast(offs))
        .withColumn("_hvr", F.col("_vr") + F.col("_off"))
        .join(heads_r, "_hvr")
        .where(F.col("node1") != F.col("node2"))
    )
    sims = cand.select(
        "node1",
        "node2",
        (1.0 / (1.0 + F.abs(F.col("_av") - F.col("_bv")))).alias("_sim"),
    )
    win = Window.partitionBy("node1").orderBy(F.desc("_sim"), F.asc("node2"))
    return (
        sims.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select("node1", "node2", F.round("_sim", 6).alias("similarity"), "rank")
        .localCheckpoint(eager=True)
    )


def knn(
    spark: SparkSession,
    nodes: DataFrame,
    id_col: str = "id",
    vec_col: str = "embedding",
    top_k: int = 10,
    max_iterations: int = 100,
    delta_threshold: float = 1e-3,
    random_joins: int = 10,
    seed: int = 42,
    similarity: str = "auto",
    initial_sampler: str = "uniform",
    graph_edges: DataFrame | None = None,
) -> DataFrame:
    """(node1, node2, similarity, rank) — approximate top-k by the
    property-appropriate metric.

    ``similarity``: 'cosine' | 'jaccard' | 'overlap' | 'scalar' |
    'auto'. 'auto' dispatches on the property's Spark type the way
    the reference's SimilarityComputer.java:33-90 dispatches on
    ValueType: float/double arrays -> cosine, long arrays -> jaccard,
    numeric scalars -> 1/(1+|a-b|). So KNN runs over ANY node
    property, not just embedding vectors (Knn.java supports long,
    double, long[], float[], double[] properties).
    """
    if similarity == "auto":
        dtype = dict(nodes.dtypes)[vec_col]
        if dtype.startswith("array<float") or dtype.startswith("array<double"):
            similarity = "cosine"
        else:
            similarity = _SIMILARITY_FOR_TYPE.get(dtype, "cosine")
    if similarity == "scalar":
        # 1-D properties get the exact sorted-neighborhood path —
        # strictly better than NN-descent there (see docstring)
        return _scalar_exact_knn(spark, nodes, id_col, vec_col, top_k)
    v = nodes.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).persist()
    n = v.count()
    ids = v.select("id")

    # deterministic pseudo-random init: k candidates by hashed rank —
    # ranked via util.global_rank (range-partitioned, balanced), NOT a
    # global single-task Window.orderBy
    from graph_data_science_spark.util import global_rank

    indexed = global_rank(
        ids.withColumn("_h", F.xxhash64("id", F.lit(seed))), ["_h"], rank_col="_rn"
    ).drop("_h")
    cand0 = (
        indexed.crossJoin(spark.range(1, top_k + 1).select(F.col("id").alias("_o")))
        .select(
            "id",
            (F.pmod(F.col("_rn") + F.col("_o") * 7919, F.lit(n)) + 1).alias("_rn2"),
        )
        .join(indexed.select(F.col("id").alias("node2"), F.col("_rn").alias("_rn2")), "_rn2")
        .where(F.col("id") != F.col("node2"))
        .select(F.col("id").alias("node1"), "node2")
    )
    if initial_sampler.lower() == "randomwalk":
        # KnnBaseConfig.initialSampler RANDOMWALK
        # (RandomWalkKnnSampler.java): seed each node's candidate list
        # from its graph neighborhood (walk-reachable nodes) instead
        # of uniformly — locality-biased init converges faster on
        # clustered data. Deterministic Spark shape: candidates from
        # the <=2-hop neighborhood (the support of short walks),
        # hash-ranked per node, topped up by the uniform draw when a
        # neighborhood is smaller than k.
        if graph_edges is None:
            raise ValueError("initial_sampler='randomwalk' requires graph_edges")
        e1 = graph_edges.select(
            F.col("src").alias("node1"), F.col("dst").alias("node2")
        )
        e2 = (
            e1.alias("a")
            .join(
                e1.alias("b"), F.col("a.node2") == F.col("b.node1")
            )
            .select(F.col("a.node1").alias("node1"), F.col("b.node2").alias("node2"))
        )
        walk = (
            e1.unionByName(e2)
            .where(F.col("node1") != F.col("node2"))
            .dropDuplicates(["node1", "node2"])
            # keep only nodes that carry the property
            .join(ids.select(F.col("id").alias("node2")), "node2", "left_semi")
            .withColumn(
                "_wr",
                F.row_number().over(
                    Window.partitionBy("node1").orderBy(
                        F.xxhash64("node2", F.lit(seed)), F.asc("node2")
                    )
                ),
            )
            .where(F.col("_wr") <= top_k)
            .select("node1", "node2")
        )
        # uniform top-up keeps every candidate list at k even for
        # isolated / low-degree nodes
        cand0 = walk.unionByName(cand0)

    def score_and_topk(pairs: DataFrame) -> DataFrame:
        va = v.select(F.col("id").alias("node1"), F.col("vec").alias("_va"))
        vb = v.select(F.col("id").alias("node2"), F.col("vec").alias("_vb"))
        sims = (
            pairs.dropDuplicates(["node1", "node2"])
            .join(va, "node1")
            .join(vb, "node2")
            .withColumn(
                "similarity",
                F.round(
                    _similarity_expr(similarity, F.col("_va"), F.col("_vb")), 6
                ),
            )
            .select("node1", "node2", "similarity")
        )
        win = Window.partitionBy("node1").orderBy(F.desc("similarity"), F.asc("node2"))
        return (
            sims.withColumn("rank", F.row_number().over(win))
            .where(F.col("rank") <= top_k)
        )

    # parquet-truncate each round: this loop hits the local-mode
    # localCheckpoint-chain slowdown (see util.Truncator docstring)
    tr = Truncator(spark)
    current = tr.cut(score_and_topk(cand0))

    for _it in range(max_iterations):
        fwd = current.select("node1", "node2")
        rev = current.select(
            F.col("node2").alias("node1"), F.col("node1").alias("node2")
        )
        non = (
            fwd.join(
                fwd.withColumnRenamed("node1", "_mid").withColumnRenamed("node2", "_nn"),
                fwd.node2 == F.col("_mid"),
            )
            .select("node1", F.col("_nn").alias("node2"))
            .where(F.col("node1") != F.col("node2"))
        )
        cand = fwd.unionByName(rev).unionByName(non)
        if random_joins > 0:
            # KnnBaseConfig.randomJoins: escape local optima with
            # fresh hash-pseudo-random candidates each round
            rj = (
                indexed.crossJoin(
                    spark.range(random_joins).select(F.col("id").alias("_j"))
                )
                .select(
                    "id",
                    (
                        F.pmod(
                            F.xxhash64("id", F.lit(_it), F.col("_j"), F.lit(seed)),
                            F.lit(n),
                        )
                        + 1
                    ).alias("_rn2"),
                )
                .join(
                    indexed.select(F.col("id").alias("node2"), F.col("_rn").alias("_rn2")),
                    "_rn2",
                )
                .where(F.col("id") != F.col("node2"))
                .select(F.col("id").alias("node1"), "node2")
            )
            cand = cand.unionByName(rj)
        new = tr.cut(score_and_topk(cand))
        changed = (
            new.select("node1", "node2")
            .exceptAll(current.select("node1", "node2"))
            .count()
        )
        current = new
        if changed <= delta_threshold * n * top_k:
            break

    v.unpersist()
    current = current.localCheckpoint(eager=True)  # outlive the scratch dir
    tr.close()
    return current


def filtered_knn(
    spark: SparkSession,
    nodes: DataFrame,
    source_filter,
    target_filter,
    id_col: str = "id",
    vec_col: str = "embedding",
    top_k: int = 10,
    similarity: str = "auto",
    exact: bool = False,
    iterations: int = 5,
    random_joins: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Filtered KNN (GDS 2.3 ``gds.knn.filtered``): per SOURCE node,
    the top-k most similar TARGET nodes — sourceNodeFilter restricts
    which nodes get result rows, targetNodeFilter restricts the
    candidate pool; similarity dispatches on the property type
    exactly like :func:`knn` (SimilarityComputer.java:33-90).

    ``source_filter`` / ``target_filter``: a pyspark Column predicate
    over ``nodes`` (e.g. ``F.col("label") == "a"``).

    ``exact=True`` scores every source x target pair — the
    documented exact baseline (same role as pipeline.ann's
    brute-force topK; use it for oracle-grade results and modest
    target sets). The default approximate path seeds each source
    with hash-pseudo-random targets and refines through the
    target-target KNN graph (NN-descent expansion restricted to the
    target domain), never scoring outside the filter.
    """
    if similarity == "auto":
        dtype = dict(nodes.dtypes)[vec_col]
        if dtype.startswith("array<float") or dtype.startswith("array<double"):
            similarity = "cosine"
        else:
            similarity = _SIMILARITY_FOR_TYPE.get(dtype, "cosine")
    base = nodes.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    sources = base.where(source_filter).persist()
    targets = base.where(target_filter).persist()

    va = sources.select(F.col("id").alias("node1"), F.col("vec").alias("_va"))
    vb = targets.select(F.col("id").alias("node2"), F.col("vec").alias("_vb"))

    def score_topk(pairs: DataFrame) -> DataFrame:
        sims = (
            pairs.dropDuplicates(["node1", "node2"])
            .where(F.col("node1") != F.col("node2"))
            .join(va, "node1")
            .join(vb, "node2")
            .withColumn(
                "similarity",
                F.round(
                    _similarity_expr(similarity, F.col("_va"), F.col("_vb")), 6
                ),
            )
            .select("node1", "node2", "similarity")
        )
        win = Window.partitionBy("node1").orderBy(
            F.desc("similarity"), F.asc("node2")
        )
        return sims.withColumn("rank", F.row_number().over(win)).where(
            F.col("rank") <= top_k
        )

    if exact:
        out = score_topk(
            sources.select(F.col("id").alias("node1")).crossJoin(
                targets.select(F.col("id").alias("node2"))
            )
        )
        sources.unpersist()
        targets.unpersist()
        return out

    from graph_data_science_spark.util import Truncator, global_rank

    n_t = targets.count()
    if n_t == 0:
        # pmod-by-zero below would yield nulls and silently feed an
        # empty frame through the descent — fail loudly instead
        sources.unpersist()
        targets.unpersist()
        raise ValueError("filtered_knn: target filter matches no nodes")
    indexed = global_rank(
        targets.select("id").withColumn("_h", F.xxhash64("id", F.lit(seed))),
        ["_h"],
        rank_col="_rn",
    ).drop("_h")
    cand0 = (
        sources.select(F.col("id").alias("node1"))
        .crossJoin(spark.range(1, top_k + 1).select(F.col("id").alias("_o")))
        .withColumn(
            "_rn",
            F.pmod(
                F.xxhash64("node1", F.lit(seed)) + F.col("_o") * 7919, F.lit(n_t)
            )
            + 1,
        )
        .join(indexed.select(F.col("id").alias("node2"), "_rn"), "_rn")
        .select("node1", "node2")
    )
    # target-target neighborhood graph drives the descent expansion
    tt = knn(
        spark, targets, id_col="id", vec_col="vec",
        top_k=top_k, similarity=similarity, seed=seed,
    ).select(F.col("node1").alias("_mid"), F.col("node2").alias("_nn"))

    tr = Truncator(spark)
    current = tr.cut(score_topk(cand0))
    for _it in range(iterations):
        exp = (
            current.select("node1", "node2")
            .join(tt, current.node2 == tt._mid)
            .select("node1", F.col("_nn").alias("node2"))
        )
        cand = current.select("node1", "node2").unionByName(exp)
        if random_joins > 0:
            # KnnBaseConfig.randomJoins analog: fresh hash-pseudo-
            # random TARGET draws each round escape local optima the
            # target-graph expansion cannot leave
            rj = (
                sources.select(F.col("id").alias("node1"))
                .crossJoin(
                    spark.range(random_joins).select(F.col("id").alias("_j"))
                )
                .withColumn(
                    "_rn",
                    F.pmod(
                        F.xxhash64("node1", F.lit(_it), F.col("_j"), F.lit(seed)),
                        F.lit(n_t),
                    )
                    + 1,
                )
                .join(indexed.select(F.col("id").alias("node2"), "_rn"), "_rn")
                .select("node1", "node2")
            )
            cand = cand.unionByName(rj)
        new = tr.cut(score_topk(cand))
        changed = (
            new.select("node1", "node2")
            .exceptAll(current.select("node1", "node2"))
            .count()
        )
        current = new
        if changed == 0:
            break
    # detach the result from the Truncator scratch dir before
    # removing it (same pattern as knn())
    out = current.localCheckpoint(eager=True)
    tr.close()
    sources.unpersist()
    targets.unpersist()
    return out
