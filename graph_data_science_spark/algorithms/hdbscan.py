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

DIVERGENCE from GDS 2.5 `gds.hdbscan`: the reference extracts the
flat clustering from the full condensed hierarchy by per-cluster
STABILITY (sum of 1/lambda spans), with no epsilon parameter; this
implementation is the DBSCAN* cut of the same mutual-reachability
structure at a caller-chosen epsilon — i.e. one fixed density level
of the hierarchy rather than the stability-optimal mix of levels.
Identical on data whose clusters all live at one density scale;
differs when cluster densities vary widely. Declared in SURVEY.md
§2 (beyond-reference bonus operator).
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
    epsilon: float,
    id_col: str = "id",
    vec_col: str = "embedding",
    k: int = 5,
    min_cluster_size: int = 5,
    candidates: DataFrame | None = None,
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
