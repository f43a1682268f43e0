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
    #: GDS 2.3 upperDegreeCutoff (NodeSimilarityBaseConfig): nodes
    #: with MORE neighbors than this are excluded from comparison
    #: entirely — the reference's own guard against hub sources whose
    #: neighborhood lists make exact set intersection quadratic.
    #: 0 = unlimited (the reference's 2^31-1 default)
    upper_degree_cutoff: int = 0
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
    #: gds.nodeSimilarity.filtered (GDS 2.3) sourceNodeFilter /
    #: targetNodeFilter analogs: restrict RESULT pairs to node1 in
    #: source_filter and node2 in target_filter (list[int] or a
    #: 1-column DataFrame of ids). Similarity is still computed over
    #: FULL neighborhoods — the filter selects pairs, it does not
    #: shrink neighbor sets (matching the reference semantics); the
    #: semi-joins are pushed below the pair join so filtered runs
    #: never materialize unfiltered pairs.
    source_filter: object = None
    target_filter: object = None
    #: pre-flight candidate-pair guard (the reference's
    #: reject-before-execution contract, proc/common/.../
    #: ProcedureExecutor.java:110, applied to the one term that is
    #: quadratic in the DATA: the co-neighbor join generates
    #: sum_dst indeg*(indeg-1) pair rows, which fixed-vocab hub
    #: targets blow past any linear bound). When the exact count
    #: (one aggregate over the already-cached edge table) exceeds
    #: pair_guard_factor * |E|, a warning with the measured numbers
    #: and the mitigation knobs is emitted; if max_candidate_pairs
    #: is also >0 and exceeded, the run is REJECTED before the pair
    #: join is built. pair_guard_factor <= 0 disables the pre-flight.
    pair_guard_factor: float = 32.0
    max_candidate_pairs: int = 0


def _eligible_edges(graph: Graph, cfg: NodeSimilarityConfig):
    """(edges, deg, eligible, e): the deduped neighbor table, per-source
    degrees, the degree-window-filtered sources, and the neighbor rows
    of eligible sources — shared by the algorithm and the pre-flight
    pair estimate so both see the identical candidate universe."""
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
    if cfg.upper_degree_cutoff > 0:
        eligible = eligible.where(F.col("deg") <= cfg.upper_degree_cutoff)
    e = edges.join(eligible.select("src"), "src", "left_semi")
    return edges, deg, eligible, e


def estimate_candidate_pairs(
    graph: Graph,
    config: NodeSimilarityConfig | None = None,
    _ind: DataFrame | None = None,
) -> dict:
    """EXACT candidate-pair count of the co-neighbor join, from one
    aggregate over shared-target in-degrees — the pre-flight the
    reference's reject-before-execution contract needs for the one
    node-similarity term that is quadratic in the data (sum over
    shared targets of indeg*(indeg-1) ordered pairs, self-pairs
    excluded), plus the facts a user needs to pick a mitigation:
    |E| after eligibility, the hottest shared target's in-degree,
    and the pair mass concentrated in targets above hub_threshold."""
    cfg = config or NodeSimilarityConfig()
    if _ind is not None:
        ind = _ind  # caller-shared shared-target in-degree table
    else:
        _, _, _, e = _eligible_edges(graph, cfg)
        ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("_dn"))
    hub_thr = cfg.hub_threshold if cfg.hub_threshold > 0 else None
    row = ind.agg(
        F.coalesce(
            F.sum(F.col("_dn") * (F.col("_dn") - 1)), F.lit(0)
        ).alias("pairs"),
        F.coalesce(F.sum("_dn"), F.lit(0)).alias("edges"),
        F.coalesce(F.max("_dn"), F.lit(0)).alias("max_shared_degree"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_dn") > (hub_thr or 2**31),
                    F.col("_dn") * (F.col("_dn") - 1),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias("hub_pairs"),
        F.coalesce(
            F.sum(
                F.when(F.col("_dn") > (hub_thr or 2**31), 1).otherwise(0)
            ),
            F.lit(0),
        ).alias("hub_count"),
    ).collect()[0]
    return {
        "candidate_pairs": int(row["pairs"]),
        "edge_count": int(row["edges"]),
        "max_shared_degree": int(row["max_shared_degree"]),
        "hub_pairs": int(row["hub_pairs"]),
        "hub_count": int(row["hub_count"]),
        "hub_threshold": hub_thr,
    }


def estimate_candidate_pairs_filtered(a: DataFrame, b: DataFrame) -> dict:
    """Exact candidate-pair count of the FILTERED co-neighbor join —
    the a/b sides already carry the source_filter/target_filter
    semi-joins, so the guard sees precisely what the pair join will
    generate: sum over shared targets of |a(dst)| * |b(dst)|, minus
    the self pairs ((x, dst) rows present on both sides)."""
    ca = a.groupBy("dst").agg(F.count(F.lit(1)).alias("_na"))
    cb = b.groupBy("dst").agg(F.count(F.lit(1)).alias("_nb"))
    row = ca.join(cb, "dst").agg(
        F.coalesce(F.sum(F.col("_na") * F.col("_nb")), F.lit(0)).alias("p"),
        F.coalesce(F.max(F.greatest("_na", "_nb")), F.lit(0)).alias("mx"),
        F.coalesce(F.sum("_na"), F.lit(0)).alias("ar"),
        F.coalesce(F.sum("_nb"), F.lit(0)).alias("br"),
    ).collect()[0]
    selfs = (
        a.select(F.col("node1").alias("_n"), "dst")
        .join(b.select(F.col("node2").alias("_n"), "dst"), ["_n", "dst"], "left_semi")
        .count()
    )
    return {
        "candidate_pairs": int(row["p"]) - int(selfs),
        "edge_count": max(int(row["ar"]), int(row["br"])),
        "max_shared_degree": int(row["mx"]),
        "hub_pairs": None,
        "hub_count": None,
        "hub_threshold": None,
        "filtered": True,
    }


def _apply_pair_guard(cfg: NodeSimilarityConfig, est: dict) -> None:
    """Reject (max_candidate_pairs) or warn (pair_guard_factor) from a
    computed pair estimate — shared by the unfiltered and filtered
    pre-flight paths."""
    pairs, edges = est["candidate_pairs"], est["edge_count"]
    if cfg.max_candidate_pairs > 0 and pairs > cfg.max_candidate_pairs:
        raise RuntimeError(
            f"node_similarity pre-flight: {pairs:,} candidate pairs exceed "
            f"max_candidate_pairs={cfg.max_candidate_pairs:,} "
            f"(|E|={edges:,}, hottest shared target in-degree "
            f"{est['max_shared_degree']:,}). Raise max_candidate_pairs, "
            "shrink neighborhoods (degree_cutoff / upper_degree_cutoff), "
            "or switch to the approximate path "
            "(pipeline.dedup.minhash_lsh_candidates)."
        )
    threshold = cfg.pair_guard_factor * max(edges, 1)
    if cfg.pair_guard_factor > 0 and pairs > threshold and pairs > 1_000_000:
        import warnings

        hub_note = (
            f"hottest shared target in-degree {est['max_shared_degree']:,}"
        )
        if est.get("hub_count") is not None:
            hub_note += (
                f", {est['hub_pairs']:,} pairs from targets above "
                f"hub_threshold={est['hub_threshold']}"
            )
        warnings.warn(
            f"node_similarity: co-neighbor join will generate {pairs:,} "
            f"candidate pairs ({pairs / max(edges, 1):,.0f}x the "
            f"{edges:,} eligible edges; {hub_note}). "
            "The plan is skew-safe but the work is quadratic in the "
            "data — consider degree_cutoff / upper_degree_cutoff to "
            "shrink neighborhoods, max_candidate_pairs to make this a "
            "hard reject, or the approximate MinHash-LSH path.",
            stacklevel=4,
        )


def _preflight_pair_guard(
    graph: Graph,
    cfg: NodeSimilarityConfig,
    ind: DataFrame | None = None,
) -> dict | None:
    """Warn (or reject, when max_candidate_pairs is set) BEFORE the
    pair join is built, when the exact candidate-pair count dwarfs
    |E| — the ProcedureExecutor.java:110 sudo-check applied to the
    operator that measured ~65x wall at 10x data through fixed-vocab
    hubs. Cost when the caller shares its hub-detection in-degree
    table (node_similarity does): one scalar collect over it."""
    if cfg.pair_guard_factor <= 0 and cfg.max_candidate_pairs <= 0:
        return None
    est = estimate_candidate_pairs(graph, cfg, _ind=ind)
    _apply_pair_guard(cfg, est)
    return est


def node_similarity(
    spark: SparkSession,
    graph: Graph,
    config: NodeSimilarityConfig | None = None,
) -> DataFrame:
    """(node1, node2, similarity, rank) — top-K similar per node."""
    cfg = config or NodeSimilarityConfig()
    edges, deg, eligible, e = _eligible_edges(graph, cfg)
    # ONE shared-target in-degree aggregate serves both the pre-flight
    # pair guard (a scalar collect) and hub detection (a filter on the
    # persisted table) — the guard costs no extra scan of e
    guard_on = cfg.pair_guard_factor > 0 or cfg.max_candidate_pairs > 0
    ind = None
    est = None
    if guard_on or cfg.hub_threshold > 0:
        ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("_dn")).persist()

    wcols1 = [F.col("_w").alias("_w1")] if cfg.weighted else []
    wcols2 = [F.col("_w").alias("_w2")] if cfg.weighted else []
    a = e.select(F.col("src").alias("node1"), "dst", *wcols1)
    b = e.select(F.col("src").alias("node2"), "dst", *wcols2)

    def _filter_ids(flt, col: str) -> DataFrame | None:
        if flt is None:
            return None
        if isinstance(flt, DataFrame):
            return flt.select(F.col(flt.columns[0]).alias(col)).distinct()
        return spark.createDataFrame(
            [(int(x),) for x in flt], f"{col} long"
        ).distinct()

    sf = _filter_ids(cfg.source_filter, "node1")
    if sf is not None:
        a = a.join(sf, "node1", "left_semi")
    tf = _filter_ids(cfg.target_filter, "node2")
    if tf is not None:
        b = b.join(tf, "node2", "left_semi")

    if guard_on:
        try:
            if sf is None and tf is None:
                # ONE collect serves the guard AND hub detection (est
                # carries hub_count, so the hub path below skips its
                # own isEmpty job)
                est = _preflight_pair_guard(graph, cfg, ind=ind)
            else:
                # filters push semi-joins below the pair join, so the
                # guard must count the FILTERED universe — the
                # unfiltered estimate could reject a run whose actual
                # pair join is tiny
                fest = estimate_candidate_pairs_filtered(a, b)
                _apply_pair_guard(cfg, fest)
        except Exception:
            if ind is not None:
                ind.unpersist()
            raise

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
            ind.where(F.col("_dn") > cfg.hub_threshold)
            .select("dst")
            .persist()
        )
        no_hubs = (
            est["hub_count"] == 0
            if est is not None and est.get("hub_count") is not None
            else hubs.isEmpty()
        )
        if no_hubs:
            # common case: no dst above threshold — take the plain
            # join and pay only the one degree aggregate, not the
            # anti/semi/salt-join plumbing
            hubs.unpersist()
            ind.unpersist()
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
            # materialize the (tiny) hub table from the cached ind
            # BEFORE dropping the cache — persist() is lazy, and
            # unpersisting first would recompute the groupBy from e
            # on the hub table's first real use
            hubs.count()
            ind.unpersist()
    else:
        if ind is not None:
            ind.unpersist()
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


@dataclass
class CategoricalSimilarityConfig:
    """gds.alpha.similarity.jaccard / .overlap over categorical sets.

    Reference: /root/reference/alpha/alpha-algo/src/main/java/org/
    neo4j/gds/impl/similarity/CategoricalInput.java:45-72 (jaccard =
    |a∩b| / (|a|+|b|−|a∩b|); overlap = |a∩b| / min(|a|,|b|) with the
    pair oriented so the smaller set is the source — the
    ``inferReverse`` swap at :60-72), JaccardAlgorithm.java:24-38,
    OverlapAlgorithm.java, SimilarityConfig.java:59-66
    (similarityCutoff default −1, degreeCutoff 0).
    """

    metric: str = "JACCARD"  # JACCARD | OVERLAP
    #: per-source top-K (0 = keep all pairs), explicit tie-break
    #: (desc similarity, asc other id) for deterministic parity
    top_k: int = 0
    similarity_cutoff: float = 0.0
    #: categories shared by more than this many items are dropped
    #: from pair generation (non-silent, under-estimates intersection
    #: only for pairs whose overlap is exclusively hot categories);
    #: <=0 disables — the hot-shingle cap pattern from
    #: pipeline/dedup.ngram_jaccard_pairs
    max_category_count: int = 0


def categorical_similarity(
    items: DataFrame,
    config: CategoricalSimilarityConfig | None = None,
    item_col: str = "item",
    category_col: str = "category",
) -> DataFrame:
    """Pairwise similarity between items' categorical sets ->
    (item1, item2, count1, count2, intersection, similarity[, rank]).

    Every unordered pair with >=1 shared category is emitted once.
    JACCARD keeps the (item1 < item2) canonical orientation; OVERLAP
    re-orients each pair so the smaller set is item1 (ties by item
    id), matching CategoricalInput.overlap's inferReverse swap.
    Zero-intersection pairs are never produced (the reference skips
    them for any similarityCutoff >= 0; the all-pairs scan that a
    negative cutoff implies is an anti-scale shape by design).

    100-TB shape: dedup + per-item count are combining groupBys; pair
    generation is a category-keyed self-join (shuffle bounded by
    Σ_cat n_cat² — cap hot categories with max_category_count);
    top-K is a per-item window.
    """
    cfg = config or CategoricalSimilarityConfig()
    t = (
        items.select(
            F.col(item_col).alias("item"),
            F.col(category_col).alias("category"),
        )
        .where(F.col("item").isNotNull() & F.col("category").isNotNull())
        .dropDuplicates(["item", "category"])
    )
    if cfg.max_category_count > 0:
        hot = (
            t.groupBy("category")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > cfg.max_category_count)
            .select("category")
        )
        n_hot = hot.count()
        if n_hot:
            print(
                f"[categorical_similarity] dropping {n_hot} categories "
                f"shared by > {cfg.max_category_count} items from pair "
                "generation (intersection under-estimate only)"
            )
            t = t.join(F.broadcast(hot), "category", "left_anti")
    t = t.persist()
    counts = t.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    a = t.select(F.col("item").alias("item1"), "category")
    b = t.select(F.col("item").alias("item2"), "category")
    inter = (
        a.join(b, "category")
        .where(F.col("item1") < F.col("item2"))
        .groupBy("item1", "item2")
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    joined = (
        inter.join(
            counts.select(F.col("item").alias("item1"), F.col("cnt").alias("count1")),
            "item1",
        )
        .join(
            counts.select(F.col("item").alias("item2"), F.col("cnt").alias("count2")),
            "item2",
        )
    )
    metric = cfg.metric.upper()
    if metric == "OVERLAP":
        # inferReverse: orient so count1 <= count2 (ties keep id order)
        swap = (F.col("count1") > F.col("count2")) | (
            (F.col("count1") == F.col("count2"))
            & (F.col("item1") > F.col("item2"))
        )
        joined = joined.select(
            F.when(swap, F.col("item2")).otherwise(F.col("item1")).alias("item1"),
            F.when(swap, F.col("item1")).otherwise(F.col("item2")).alias("item2"),
            F.when(swap, F.col("count2")).otherwise(F.col("count1")).alias("count1"),
            F.when(swap, F.col("count1")).otherwise(F.col("count2")).alias("count2"),
            "intersection",
        )
        sim = F.col("intersection") / F.col("count1").cast("double")
    elif metric == "JACCARD":
        sim = F.col("intersection") / (
            F.col("count1") + F.col("count2") - F.col("intersection")
        ).cast("double")
    else:
        raise ValueError(f"metric must be JACCARD or OVERLAP, got {cfg.metric!r}")
    out = joined.withColumn("similarity", F.round(sim, 6)).where(
        F.col("similarity") >= cfg.similarity_cutoff
    )
    if cfg.top_k > 0:
        w = Window.partitionBy("item1").orderBy(
            F.desc("similarity"), F.asc("item2")
        )
        out = (
            out.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= cfg.top_k)
        )
    return out
