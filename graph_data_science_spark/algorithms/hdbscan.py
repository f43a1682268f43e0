"""HDBSCAN-style density clustering over an embedding column —
GDS 2.5 `gds.hdbscan` analog (the 2.0-era reference has no density
clustering at all; its nearest kin are KNN + Louvain).

Implemented as the DBSCAN*/single-linkage core of HDBSCAN
(Campello, Moulavi & Sander 2013) at a fixed density level:

1. k-NN with EUCLIDEAN distances (the exact brute-force baseline,
   same role as pipeline.ann.similarity_topk; swap in the LSH/IVF
   candidates for the 100-TB path);
2. core distance = distance to the k-th nearest neighbor;
3. mutual-reachability weight per k-NN edge:
       mreach(u, v) = max(core(u), core(v), d(u, v));
4. clusters = connected components (algorithms.wcc) of the k-NN
   graph restricted to edges with mreach <= epsilon — the DBSCAN*
   flat cut at level epsilon, evaluated on the k-NN graph. An edge
   survives iff both endpoints are core points (core <= eps) and
   d <= eps, exactly DBSCAN*'s connection rule; restricting
   candidate edges to each point's k nearest is the standard
   scalable approximation (RAPIDS/Boruvka-kNN HDBSCAN lineage) —
   it can only SPLIT a true cluster whose internal epsilon-paths
   all run through non-kNN edges, never merge two;
5. components smaller than ``min_cluster_size`` become NOISE
   (cluster = -1), matching HDBSCAN's minimum-cluster-size pruning.

Deterministic (exact distances, min-id cluster labels) and fully
SQL-replayable: the driver oracle recomputes distances, core
distances, the epsilon graph, and min-label components in DuckDB.

Two flat-cut MODES over the same mutual-reachability structure:

* ``mode="epsilon"`` — the DBSCAN* cut above, at one caller-chosen
  density level.
* ``mode="stability"`` — GDS 2.5 `gds.hdbscan` semantic parity
  (HDBSCAN proper, no epsilon): single-linkage dendrogram from the
  MST of the mutual-reachability graph (driver-side Kruskal over the
  collected, distributedly-canonicalized n*k kNN edges — the
  condensed-tree walk is a driver O(n) pass either way, so the MST
  adds only a k-factor to an existing bound; a distributed Boruvka
  was measured and rejected, see _stability_cut), condensed by
  ``min_cluster_size``, clusters selected by Excess-of-Mass
  STABILITY (sum over points of lambda_leave - lambda_birth,
  lambda = 1/distance; a cluster is kept iff its own stability beats
  the sum of its best descendant selections; the root is never
  selected). The kNN, core-distance, and mutual-reachability passes
  — the quadratic work — stay distributed. Deterministic: exact
  distances, (weight, id_a, id_b) edge tie-break on REAL point ids,
  min-member-id flat labels.

The epsilon mode is identical to stability mode on data whose
clusters all live at one density scale; stability mode wins when
cluster densities vary widely (the fixture test pins exactly that
two-scale case). Declared in SURVEY.md §2.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.pipeline.ann import euclidean_distance


@dataclass
class HdbscanResult:
    clusters: DataFrame       # (id, cluster) — cluster -1 = noise
    core_distances: DataFrame  # (id, core_distance)
    n_clusters: int


def hdbscan(
    spark: SparkSession,
    nodes: DataFrame,
    epsilon: float | None = None,
    id_col: str = "id",
    vec_col: str = "embedding",
    k: int = 5,
    min_cluster_size: int = 5,
    candidates: DataFrame | None = None,
    mode: str = "epsilon",
) -> HdbscanResult:
    """See module docstring.

    ``candidates``: optional (u, nbr) pair frame restricting the
    k-NN search — the 100-TB path.  Wire ``pipeline.ann.lsh_topk``
    (or ivf_topk / any blocked generator) output through it so the
    plan contains no crossJoin; pairs are symmetrized and deduped
    here, distances recomputed exactly.  Default (None) is the exact
    all-pairs baseline, fine up to ~10^5 vectors per run.
    """
    from graph_data_science_spark.algorithms.wcc import wcc

    if mode not in ("epsilon", "stability"):
        raise ValueError("mode must be 'epsilon' or 'stability'")
    if mode == "epsilon" and epsilon is None:
        raise ValueError("mode='epsilon' requires an epsilon")

    v = nodes.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).persist()

    a = v.select(F.col("id").alias("u"), F.col("vec").alias("_va"))
    b = v.select(F.col("id").alias("nbr"), F.col("vec").alias("_vb"))
    if candidates is None:
        cand = a.crossJoin(b).where(F.col("u") != F.col("nbr"))
    else:
        sym = candidates.select("u", "nbr").unionByName(
            candidates.select(
                F.col("nbr").alias("u"), F.col("u").alias("nbr")
            )
        )
        cand = (
            sym.where(F.col("u") != F.col("nbr"))
            .dropDuplicates(["u", "nbr"])
            .join(a, "u")
            .join(b, "nbr")
        )
    pairs = cand.select(
        "u",
        "nbr",
        F.round(euclidean_distance(F.col("_va"), F.col("_vb")), 9).alias("d"),
    )
    win = Window.partitionBy("u").orderBy(F.asc("d"), F.asc("nbr"))
    knn = (
        pairs.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") <= k)
        .localCheckpoint(eager=True)
    )
    core = knn.groupBy("u").agg(F.max("d").alias("core_distance"))

    c1 = core.select(F.col("u"), F.col("core_distance").alias("_cu"))
    c2 = core.select(
        F.col("u").alias("nbr"), F.col("core_distance").alias("_cn")
    )
    mreach = (
        knn.join(c1, "u")
        .join(c2, "nbr")
        .select(
            "u",
            "nbr",
            F.greatest("d", "_cu", "_cn").alias("mreach"),
        )
    )
    if mode == "stability":
        return _stability_cut(spark, v, mreach, core, min_cluster_size)

    eps_edges = mreach.where(F.col("mreach") <= F.lit(float(epsilon))).select(
        F.col("u").alias("src"),
        F.col("nbr").alias("dst"),
        F.lit("MR").alias("rel_type"),
        F.lit(1.0).alias("weight"),
    )
    g = Graph(
        name="hdbscan_eps",
        edges=eps_edges,
        nodes=v.select("id"),
        directed=True,  # single arcs; wcc orients
    )
    comp = wcc(spark, g).state  # (id, component) — min-id labels
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("_n"))
    clusters = (
        comp.join(sizes, "component")
        .select(
            "id",
            F.when(
                F.col("_n") >= min_cluster_size, F.col("component")
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("cluster"),
        )
        .localCheckpoint(eager=True)
    )
    n_clusters = (
        clusters.where(F.col("cluster") >= 0).select("cluster").distinct().count()
    )
    v.unpersist()
    return HdbscanResult(
        clusters=clusters,
        core_distances=core.select(F.col("u").alias("id"), "core_distance"),
        n_clusters=n_clusters,
    )


def _stability_cut(
    spark: SparkSession,
    v: DataFrame,
    mreach: DataFrame,
    core: DataFrame,
    min_cluster_size: int,
) -> HdbscanResult:
    """Stability-mode flat cut (module docstring): MST of the
    mutual-reachability graph, then the condensed-tree walk and
    Excess-of-Mass selection (Campello et al. 2013 §4).

    The MST is Kruskal over the COLLECTED (u, nbr, mreach) kNN edges:
    the condensed-tree walk is inherently a driver-side O(n) pass
    (the same single-node bound as the reference), so collecting the
    n*k candidate edges (canonicalized + min-agg'd distributedly
    first) adds only a k-factor to a bound the mode already has —
    while the distributed Boruvka alternative costs hundreds of tiny
    barrier jobs for data this small relative to the kNN pass. The
    expensive, quadratic work (kNN, core distances, mreach) stays on
    the cluster."""
    und = (
        mreach.select(
            F.least("u", "nbr").alias("a"),
            F.greatest("u", "nbr").alias("b"),
            "mreach",
        )
        .groupBy("a", "b")
        .agg(F.min("mreach").alias("w"))
    )
    kedges = sorted(
        ((float(r["w"]), int(r["a"]), int(r["b"])) for r in und.collect())
    )
    point_ids = [int(r["id"]) for r in v.select("id").collect()]
    idx = {p: i for i, p in enumerate(point_ids)}
    parent = list(range(len(point_ids)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mst_edges = []
    for w, pa, pb in kedges:
        ra, rb = find(idx[pa]), find(idx[pb])
        if ra != rb:
            parent[rb] = ra
            mst_edges.append((pa, pb, w))
    labels = _condense_and_select(mst_edges, point_ids, min_cluster_size)
    clusters = spark.createDataFrame(
        [(p, labels.get(p, -1)) for p in point_ids], "id long, cluster long"
    ).localCheckpoint(eager=True)
    n_clusters = len({c for c in labels.values() if c >= 0})
    v.unpersist()
    return HdbscanResult(
        clusters=clusters,
        core_distances=core.select(F.col("u").alias("id"), "core_distance"),
        n_clusters=n_clusters,
    )


def _condense_and_select(
    mst_edges: list[tuple[int, int, float]],
    point_ids: list[int],
    min_cluster_size: int,
) -> dict[int, int]:
    """{point_id: flat_label} by condensed-tree stability selection.

    Single-linkage dendrogram via union-find over edges ascending by
    (weight, src, dst); forest components are joined under a virtual
    root at distance=inf (lambda=0) so each big-enough component is a
    first-level cluster candidate. Condense: at a split whose sides
    are both >= min_cluster_size the cluster dies into two children;
    an undersized side's points fall out at that lambda; two
    undersized sides end the cluster. Stability(c) = sum over points
    of (lambda_leave - lambda_birth). EOM: keep c iff stability(c) >=
    sum of its subtrees' best values; the virtual root is never kept.
    Flat labels = min member point id (the epsilon mode's label
    convention)."""
    n = len(point_ids)
    if n == 0:
        return {}
    idx = {p: i for i, p in enumerate(point_ids)}
    # --- dendrogram (union-find; next internal node = n, n+1, ...) ---
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    INF = float("inf")
    # tie-break on REAL point ids (w, a, b) — keying on collect-order
    # positions would make tied-weight merge order (and with it the
    # condensation on duplicate-heavy data) depend on DataFrame layout
    edges = sorted(
        ((w, a, b) for a, b, w in mst_edges),
        key=lambda t: (t[0], t[1], t[2]),
    )
    children: dict[int, tuple[int, int]] = {}
    height: dict[int, float] = {}
    root_of = list(range(n))  # current dendrogram node of each set root
    nxt = n
    for w, pa, pb in edges:
        ra, rb = find(idx[pa]), find(idx[pb])
        if ra == rb:
            continue
        node = nxt
        nxt += 1
        children[node] = (root_of[ra], root_of[rb])
        height[node] = w
        parent[rb] = ra
        root_of[ra] = node
    # join remaining forest roots under a virtual root at inf
    roots = sorted({root_of[find(i)] for i in range(n)})
    while len(roots) > 1:
        node = nxt
        nxt += 1
        children[node] = (roots[0], roots[1])
        height[node] = INF
        roots = [node] + roots[2:]
    top = roots[0]

    def node_size(x: int) -> int:
        return 1 if x < n else size_cache[x]

    size_cache: dict[int, int] = {}
    order = []
    stack = [top]
    while stack:  # postorder sizes without recursion
        x = stack.pop()
        order.append(x)
        if x >= n:
            stack.extend(children[x])
    for x in reversed(order):
        if x >= n:
            l, r = children[x]
            size_cache[x] = node_size(l) + node_size(r)

    # --- condensed tree -------------------------------------------------
    def lam(d: float) -> float:
        if d == INF:
            return 0.0
        return 1.0 / max(d, 1e-12)

    mcs = max(2, int(min_cluster_size))
    cluster_children: dict[int, list[int]] = {}
    cluster_points: dict[int, list[tuple[int, float]]] = {}  # (leaf, lam_leave)
    cluster_birth: dict[int, float] = {}
    cluster_extent: dict[int, int] = {}  # condensed cluster -> dendro node

    def leaves_under(x: int) -> list[int]:
        out, st = [], [x]
        while st:
            y = st.pop()
            if y < n:
                out.append(y)
            else:
                st.extend(children[y])
        return out

    # walk: (dendro_node, cluster_id); cluster 0 = virtual-root cluster
    cluster_children[0] = []
    cluster_points[0] = []
    cluster_birth[0] = 0.0
    cluster_extent[0] = top
    next_cid = 1
    work = [(top, 0)]
    while work:
        x, c = work.pop()
        while x >= n:
            l, r = children[x]
            lmb = lam(height[x])
            big_l = node_size(l) >= mcs
            big_r = node_size(r) >= mcs
            if big_l and big_r:
                for ch in (l, r):
                    nc = next_cid
                    next_cid += 1
                    cluster_children.setdefault(c, []).append(nc)
                    cluster_children[nc] = []
                    cluster_points[nc] = []
                    cluster_birth[nc] = lmb
                    cluster_extent[nc] = ch
                # points still present when c dies leave at this lambda
                cluster_points[c].extend(
                    (leaf, lmb) for leaf in leaves_under(x)
                )
                work.append((l, next_cid - 2))
                work.append((r, next_cid - 1))
                x = -1
                break
            if big_l or big_r:
                small, big = (r, l) if big_l else (l, r)
                cluster_points[c].extend(
                    (leaf, lmb) for leaf in leaves_under(small)
                )
                x = big
                continue
            # both sides undersized: every remaining point leaves here
            cluster_points[c].extend((leaf, lmb) for leaf in leaves_under(x))
            x = -1
            break
        if x >= 0 and x < n:
            # descended to a single point (component of size 1)
            cluster_points[c].append((x, INF if c == 0 else lam(0.0)))
    # note: points recorded at c's death (big/big split) use lam of the
    # split — their membership in c spans [birth, split], the EOM span

    # --- stability + EOM selection --------------------------------------
    stability = {
        c: sum(
            (lv if lv != INF else 0.0) - cluster_birth[c]
            for _, lv in pts
        )
        if c != 0
        else 0.0
        for c, pts in cluster_points.items()
    }
    best: dict[int, float] = {}
    selected: set[int] = set()
    for c in sorted(cluster_children, reverse=True):  # children have larger ids
        ch_sum = sum(best[ch] for ch in cluster_children[c])
        if c == 0:
            best[c] = ch_sum
            continue
        if cluster_children[c] and ch_sum > stability[c]:
            best[c] = ch_sum
        else:
            best[c] = stability[c]
            selected.add(c)
    # drop selected descendants of selected clusters (keep the highest)
    final: set[int] = set()
    stack = [(0, False)]
    while stack:
        c, covered = stack.pop()
        keep = c in selected and not covered and c != 0
        if keep:
            final.add(c)
        for ch in cluster_children.get(c, []):
            stack.append((ch, covered or keep))

    labels: dict[int, int] = {}
    for c in final:
        # FOSC extent labeling: a selected cluster's flat members are
        # every leaf under its dendrogram node (descendant clusters
        # were deselected and map up to the selected ancestor — the
        # do_labelling convention); noise = points whose fall-out
        # chain reaches the virtual root without crossing a selected
        # cluster. NOTE the documented kNN-restriction artifact: a
        # far straggler whose ONLY kNN attachment is one cluster's
        # component joins that cluster's extent here, where the
        # full-metric tree would shed it from the (never-selected)
        # root — raise k, or use mode="epsilon", for the full-tree
        # noise behavior on such points.
        members = [point_ids[leaf] for leaf in leaves_under(cluster_extent[c])]
        lbl = min(members)
        for p in members:
            labels[p] = lbl
    return labels
