"""Louvain community detection — modularity optimization + coarsening.

Reference semantics (/root/reference/algo/src/main/java/org/neo4j/
gds/louvain/Louvain.java:83-118 and beta/modularity/
ModularityOptimization.java): hierarchical — run local-moving
(phase 1) until modularity gain < tolerance, contract communities
into a coarser graph, repeat up to maxLevels (default 10, tolerance
1e-4, phase-1 maxIterations 10).

The reference's phase 1 parallelizes with color-batched asynchronous
moves (Lu/Halappanavar/Kalyanaraman 2015) — move order is
scheduling-dependent, so GDS itself only guarantees modularity-level
quality, not byte-identical communities. This engine's phase 1 is the
DETERMINISTIC block variant (same device as labelprop.py): iteration
k moves only the (k mod 2)-parity vertices against the other block's
current communities — data-parallel, oscillation-free, reproducible
at any parallelism, one half-sweep of Spark jobs per iteration.

Move rule (standard Louvain gain, undirected): vertex v moves to the
neighbor community c maximizing

    gain(v->c) = w(v,c) - k_v * tot(c \\ v) / (2m)

(constant factors dropped; stay when no strictly positive gain;
ties -> smaller community id). All per-round math is joins +
groupBys; coarsening is one groupBy over community pairs.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph


@dataclass
class LouvainConfig:
    max_levels: int = 10
    max_iterations: int = 10  # phase-1 rounds per level
    tolerance: float = 1e-4  # min modularity gain to start a new level
    #: return the per-level dendrogram column (LouvainBaseConfig.java:59)
    include_intermediate_communities: bool = False
    #: dense 0..C-1 community relabel; mutually exclusive with the
    #: dendrogram (LouvainBaseConfig.java:65-67)
    consecutive_ids: bool = False

    def __post_init__(self) -> None:
        if self.include_intermediate_communities and self.consecutive_ids:
            raise ValueError(
                "`includeIntermediateCommunities` and the `consecutiveIds` "
                "option cannot be used at the same time."
            )


@dataclass
class LouvainResult:
    communities: DataFrame  # (id, community)
    modularity: float
    modularities: list[float] = field(default_factory=list)
    levels: int = 0


def _undirected_weighted(graph: Graph) -> DataFrame:
    """Both-direction edge list (u, v, w) — each undirected edge twice."""
    e = graph.view(weight_property=True).select("src", "dst", "weight")
    if graph.directed:
        e = projection.orient(e, "UNDIRECTED")
    return e.groupBy("src", "dst").agg(F.sum("weight").alias("w"))


def _modularity(
    edges_und: DataFrame, comm: DataFrame, m2: float, gamma: float = 1.0
) -> float:
    """Q = sum_c [ in_c/2m - gamma*(tot_c/2m)^2 ] over the
    both-direction list (gamma = resolution parameter; 1.0 is the
    classic Newman-Girvan modularity)."""
    cs = comm.select(F.col("id").alias("src"), F.col("community").alias("_cs"))
    cd = comm.select(F.col("id").alias("dst"), F.col("community").alias("_cd"))
    tagged = edges_und.join(cs, "src").join(cd, "dst")
    internal = (
        tagged.where(F.col("_cs") == F.col("_cd")).agg(F.sum("w")).collect()[0][0] or 0.0
    )
    k = edges_und.groupBy("src").agg(F.sum("w").alias("k"))
    tot = (
        k.join(cs, "src")
        .groupBy("_cs")
        .agg(F.sum("k").alias("tot"))
        .agg(F.sum(F.col("tot") ** 2))
        .collect()[0][0]
        or 0.0
    )
    return internal / m2 - gamma * tot / (m2 * m2)


def _local_moving(
    edges_und: DataFrame, m2: float, max_iterations: int
) -> DataFrame:
    """One Louvain level; returns (id, community)."""
    comm, _q, _sweeps, _conv = _local_moving_full(edges_und, m2, max_iterations)
    return comm


def _local_moving_full(
    edges_und: DataFrame,
    m2: float,
    max_iterations: int,
    init: DataFrame | None = None,
    tolerance: float = 0.0,
    gamma: float = 1.0,
) -> tuple[DataFrame, float, int, bool]:
    """Local-moving modularity optimization; returns
    ``(communities, modularity, sweeps_run, converged)``.

    ``init`` optionally seeds the starting assignment as an
    ``(id, community)`` DataFrame (the reference's ``seedProperty``,
    beta/modularity/ModularityOptimization.java); vertices absent
    from ``init`` start in their own singleton. ``tolerance`` > 0
    stops early once PATIENCE consecutive sweeps improve modularity
    by less than it (the reference's tolerance-based ``didConverge``).

    Deterministic parity half-sweeps (iteration k moves only
    pmod(id, 2) == k%2 vertices against the frozen other block), with
    two devices added after profiling the user-tool graph:

    * Per-sweep MODULARITY tracking with best-state retention: the
      synchronous half-sweeps can enter a limit cycle (measured: a
      period-4 cycle re-moving ~half the vertices forever, never
      hitting the old two-zero-sweep exit), so each sweep's Q is
      computed (one cheap aggregate against the materialized state)
      and the loop stops after `PATIENCE` consecutive sweeps without
      improvement, returning the best-Q assignment seen — which is
      also what a sequential Louvain's strictly-improving pass would
      have kept.
    * Sweep state truncated through util.Truncator (parquet
      round-trip every few sweeps): a pure localCheckpoint chain
      degrades superlinearly around generation ~9 in Spark 4.1 local
      mode (measured: 0.7 s/ckpt climbing to 15 s).
    """
    from graph_data_science_spark.util import Truncator

    PATIENCE = 2
    spark = edges_und.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    k = edges_und.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    if init is None:
        comm = k.select("id", F.col("id").alias("community"), "k")
    else:
        comm = k.join(
            init.select("id", F.col("community").alias("_seed")), "id", "left"
        ).select(
            "id", F.coalesce(F.col("_seed"), F.col("id")).alias("community"), "k"
        )
    comm = comm.localCheckpoint(True)
    tr = Truncator(spark, every=4)
    best_q = _modularity(edges_und, comm.select("id", "community"), m2, gamma)
    best_comm = comm
    since_best = 0
    sweeps = 0
    converged = False

    for it in range(max_iterations):
        parity = it % 2
        tot = comm.groupBy("community").agg(F.sum("k").alias("tot"))
        c_nbr = comm.select(
            F.col("id").alias("dst"), F.col("community").alias("_nc")
        )
        block = comm.where(F.pmod(F.col("id"), F.lit(2)) == parity)
        # w(v, c) over neighbor communities of block vertices
        # (self-loops stay in k but are not "neighbors in c")
        wvc = (
            edges_und.where(F.col("src") != F.col("dst"))
            .join(block.select(F.col("id").alias("src")), "src", "left_semi")
            .join(c_nbr, "dst")
            .groupBy(F.col("src").alias("id"), F.col("_nc").alias("cand"))
            .agg(F.sum("w").alias("wvc"))
        )
        st = block.join(tot, "community").select(
            "id", "community", "k", F.col("tot").alias("tot_own")
        )
        cand = (
            wvc.join(st, "id")
            .join(tot.withColumnRenamed("community", "cand"), "cand")
            .withColumn(
                "_tot_excl",
                F.when(
                    F.col("cand") == F.col("community"),
                    F.col("tot") - F.col("k"),
                ).otherwise(F.col("tot")),
            )
            .withColumn(
                "gain",
                F.col("wvc")
                - F.lit(gamma) * F.col("k") * F.col("_tot_excl") / F.lit(m2),
            )
        )
        # current standing: gain of staying = w(v, own\v) - k*(tot_own-k)/m2
        stay = (
            cand.where(F.col("cand") == F.col("community"))
            .select("id", F.col("gain").alias("_stay_gain"))
        )
        from pyspark.sql import Window

        win = Window.partitionBy("id").orderBy(F.desc("gain"), F.asc("cand"))
        best = (
            cand.withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select("id", F.col("cand").alias("_best"), F.col("gain").alias("_bg"))
        )
        # gain of staying when v has no in-community neighbor:
        # w(v, own\v) = 0, leaving the -k*(tot_own - k)/2m term
        decide = (
            st.join(best, "id", "left")
            .join(stay, "id", "left")
            .withColumn(
                "_stay",
                F.coalesce(
                    F.col("_stay_gain"),
                    -F.lit(gamma)
                    * F.col("k")
                    * (F.col("tot_own") - F.col("k"))
                    / F.lit(m2),
                ),
            )
            .withColumn(
                "_new",
                F.when(
                    F.col("_bg") > F.col("_stay") + F.lit(1e-12),
                    F.col("_best"),
                ).otherwise(F.col("community")),
            )
            .select("id", F.col("_new").alias("community"), "k")
        )
        # repartition: union sums its children's partition counts, so
        # without this the count doubles per sweep (exponential tasks)
        prev_comm = comm
        comm = tr.cut(  # eager; bounds the checkpoint chain
            comm.where(F.pmod(F.col("id"), F.lit(2)) != parity)
            .select("id", "community", "k")
            .unionByName(decide)
            .repartition(n_parts, "id")
        )
        # free superseded sweep snapshots deterministically (see
        # pregel._free_local_checkpoint: the lazy ContextCleaner
        # otherwise reclaims them mid-sweep as wall spikes)
        from graph_data_science_spark.pregel import _free_local_checkpoint

        if best_comm is not prev_comm:
            _free_local_checkpoint(prev_comm)
        q = _modularity(edges_und, comm.select("id", "community"), m2, gamma)
        sweeps = it + 1
        if q > best_q + max(tolerance, 1e-12):
            best_q, best_comm, since_best = q, comm, 0
        else:
            if q > best_q + 1e-12:  # sub-tolerance improvement: keep it
                best_q, best_comm = q, comm
            since_best += 1
            if since_best >= PATIENCE:
                converged = True
                break
    # detach the result from the Truncator's scratch dir before close
    out = best_comm.select("id", "community").localCheckpoint(eager=True)
    tr.close()
    return out, best_q, sweeps, converged


def louvain(
    spark: SparkSession,
    graph: Graph,
    config: LouvainConfig | None = None,
) -> LouvainResult:
    cfg = config or LouvainConfig()
    workdir = tempfile.mkdtemp(prefix="gds_louvain_")
    # parquet-back the LEVEL-1 edges exactly like every coarser
    # level: the sweep loop localCheckpoints off its input lineage,
    # and an in-session (aggregate/join-derived) lineage triggers the
    # Spark 4.1 local-mode slowdown that made level 1 ~13x slower
    # than the parquet-backed level 2 on the same sweep count
    path0 = os.path.join(workdir, "level_0")
    _undirected_weighted(graph).write.mode("overwrite").parquet(path0)
    edges = spark.read.parquet(path0).persist()
    m2 = edges.agg(F.sum("w")).collect()[0][0] or 0.0
    if m2 == 0:
        verts = graph.vertices().select("id", F.col("id").alias("community"))
        return LouvainResult(communities=verts, modularity=0.0)

    # mapping original id -> current community, refined per level
    mapping = graph.vertices().select("id", F.col("id").alias("community"))
    level_edges = edges
    modularities: list[float] = []
    level_mappings: list[DataFrame] = []  # dendrogram levels (id, community)
    prev_q = None
    levels = 0

    for _ in range(cfg.max_levels):
        comm = _local_moving(level_edges, m2, cfg.max_iterations)
        new_mapping = (
            mapping.join(
                comm.withColumnRenamed("community", "_new").withColumnRenamed(
                    "id", "community"
                ),
                "community",
            )
            .select("id", F.col("_new").alias("community"))
            .localCheckpoint(True)
        )
        q = _modularity(edges, new_mapping, m2)
        if prev_q is not None and q < prev_q:
            # a degrading level: keep the previous dendrogram level
            break
        mapping = new_mapping
        modularities.append(q)
        level_mappings.append(new_mapping)
        levels += 1
        if prev_q is not None and q - prev_q < cfg.tolerance:
            break
        prev_q = q
        # coarsen: communities become vertices; parallel weights summed.
        # Parquet round-trip (not localCheckpoint): empirically, an
        # in-session checkpointed coarse DF triggers pathological
        # per-job slowdown in subsequent sweeps (Spark 4.1, local
        # mode), while a parquet-backed one is flat — and the
        # round-trip is the same plan-truncation device the Pregel
        # runner uses for superstep state.
        cs = comm.select(F.col("id").alias("src"), F.col("community").alias("_cs"))
        cd = comm.select(F.col("id").alias("dst"), F.col("community").alias("_cd"))
        coarse = (
            level_edges.join(cs, "src")
            .join(cd, "dst")
            .groupBy(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        path = os.path.join(workdir, f"level_{levels}")
        coarse.write.mode("overwrite").parquet(path)
        coarse = spark.read.parquet(path)
        if coarse.where(F.col("src") != F.col("dst")).isEmpty():
            break
        level_edges = coarse

    edges.unpersist()
    if cfg.include_intermediate_communities and level_mappings:
        # dendrogram column: per-level community id for every vertex
        # (LouvainResult intermediateCommunities). L <= max_levels
        # co-keyed |V|-row joins — no driver materialization.
        out = level_mappings[0].select("id", F.col("community").alias("_l0"))
        for i, lm in enumerate(level_mappings[1:], start=1):
            out = out.join(
                lm.select("id", F.col("community").alias(f"_l{i}")), "id"
            )
        mapping = out.select(
            "id",
            F.col(f"_l{levels - 1}").alias("community"),
            F.array(*[f"_l{i}" for i in range(levels)]).alias(
                "intermediate_communities"
            ),
        )
    elif cfg.consecutive_ids:
        # dense relabel without a single-task global window (same
        # device as WCC consecutive_ids): range-partitioned rank over
        # the distinct communities, then a broadcast-friendly join
        from graph_data_science_spark.util import global_rank

        relabel = global_rank(
            mapping.select("community").distinct(), ["community"], rank_col="_c"
        ).withColumn("_c", F.col("_c") - 1)
        mapping = mapping.join(relabel, "community").select(
            "id", F.col("_c").alias("community")
        )
    mapping = mapping.localCheckpoint(eager=True)  # outlive workdir cleanup
    shutil.rmtree(workdir, ignore_errors=True)
    return LouvainResult(
        communities=mapping,
        modularity=modularities[-1] if modularities else 0.0,
        modularities=modularities,
        levels=levels,
    )
