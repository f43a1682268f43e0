"""Leiden community detection — local moving + refinement + coarsening.

Traag, Waltman & van Eck 2019 ("From Louvain to Leiden: guaranteeing
well-connected communities", Sci. Rep. 9:5233). The reference's
2.0-era suite ships Louvain only (algo/src/main/java/org/neo4j/gds/
louvain/Louvain.java; Neo4j GDS added Leiden in 2.2) — included here
because refinement fixes Louvain's badly-connected-community defect,
which matters on reply/link graphs with bridge vertices.

Structure per level (the three Leiden phases):

1. **Local moving** — reuses louvain's deterministic parity
   half-sweep optimizer (:func:`louvain._local_moving_full`), seeded
   with the previous level's communities.
2. **Refinement** — every vertex restarts as a singleton
   subcommunity *inside* its phase-1 community; only vertices that
   are still singletons may merge (greedy best positive gain over
   intra-community edges). Subcommunities therefore only ever grow by
   absorbing a vertex adjacent to them — each subcommunity is
   internally connected **by construction**, the Leiden guarantee.
3. **Coarsening** — contracts the *refined* partition (not the
   phase-1 one); the next level's local moving is seeded with the
   phase-1 community of each subcommunity, the Leiden trick that
   lets a split community re-merge at the coarser level.

Determinism device (same family as louvain/labelprop/k1coloring):
refinement round r moves only ``pmod(id, 2) == r % 2`` singletons,
and a move's target subcommunity must be *stationary this round* —
size >= 2 (non-movers by the singleton-only rule) or a singleton of
the opposite parity. Two adjacent same-parity singletons therefore
never merge directly; they contract as separate coarse vertices with
the same seed community and re-merge during the next level's seeded
local moving — a finer-than-necessary refinement is always legal in
Leiden (quality is recovered at the coarser level), while a
dissolving merge target would corrupt the partition.

``gamma`` is the resolution parameter of the quality function
Q_gamma = sum_c [in_c/2m - gamma*(tot_c/2m)^2]; gamma = 1 is classic
modularity, larger gamma favors more, smaller communities.

All per-round math is joins + groupBys (JVM-side, no Python row
path); refinement state is lineage-truncated through util.Truncator
like every other iterative loop in this engine.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.algorithms.louvain import (
    _local_moving_full,
    _modularity,
    _undirected_weighted,
)


@dataclass
class LeidenConfig:
    max_levels: int = 10
    max_iterations: int = 10  # phase-1 sweeps per level
    #: refinement rounds per level; singleton-only moves make the
    #: merged set grow monotonically, so this is a cap, not a tuning
    #: knob — the loop exits as soon as a round moves nothing
    max_refine_rounds: int = 10
    tolerance: float = 1e-4
    gamma: float = 1.0  # resolution
    consecutive_ids: bool = False
    #: Traag et al.'s refinement randomness theta: 0 (default) keeps
    #: the deterministic greedy singleton merge (oracle parity);
    #: theta > 0 enables the paper's randomized merge — movers must
    #: be well-connected to their community, targets well-connected
    #: within it, and the target is drawn with probability
    #: proportional to exp(gain / theta) over the non-negative-gain
    #: candidates, using a seeded hash draw (run-to-run stable)
    theta: float = 0.0
    seed: int = 42

    def __post_init__(self) -> None:
        if self.gamma <= 0:
            raise ValueError("gamma must be > 0")
        if self.theta < 0:
            raise ValueError("theta must be >= 0")
        if self.max_levels < 1 or self.max_iterations < 1:
            raise ValueError("max_levels and max_iterations must be >= 1")


@dataclass
class LeidenResult:
    communities: DataFrame  # (id, community)
    modularity: float
    modularities: list[float] = field(default_factory=list)
    levels: int = 0


def _refine(
    edges_und: DataFrame,
    comm: DataFrame,
    m2: float,
    gamma: float,
    max_rounds: int,
    theta: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Leiden refinement: split each community of ``comm`` into
    internally-connected subcommunities; returns (id, community, sub).

    Starts from singletons; each round, still-singleton vertices of
    the round's parity greedily join the best positive-gain adjacent
    subcommunity within their own community (gain for a singleton
    mover v -> S is w(v,S) - gamma*k_v*tot(S)/2m; staying gain is 0).
    Subcommunities only grow, so every sub is connected.
    """
    from graph_data_science_spark.util import Truncator

    spark = edges_und.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cs = comm.select(F.col("id").alias("src"), F.col("community").alias("_cs"))
    cd = comm.select(F.col("id").alias("dst"), F.col("community").alias("_cd"))
    intra = (
        edges_und.where(F.col("src") != F.col("dst"))
        .join(cs, "src")
        .join(cd, "dst")
        .where(F.col("_cs") == F.col("_cd"))
        .select("src", "dst", "w")
        .repartition(n_parts, "dst")
        .persist()
    )
    k = edges_und.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    state = (
        comm.join(k, "id", "left")
        .select(
            "id",
            "community",
            F.coalesce(F.col("k"), F.lit(0.0)).alias("k"),
            F.col("id").alias("sub"),
        )
        .localCheckpoint(True)
    )
    tr = Truncator(spark, every=4)
    for r in range(max_rounds):
        parity = r % 2
        sizes = state.groupBy("sub").agg(
            F.count(F.lit(1)).alias("_sz"), F.min("id").alias("_m0")
        )
        # movers: this round's parity, still singleton
        movers = (
            state.join(sizes.where(F.col("_sz") == 1), "sub", "left_semi")
            .where(F.pmod(F.col("id"), F.lit(2)) == parity)
        )
        # stationary targets: size >= 2 (members froze when their sub
        # grew) or a singleton of the opposite parity
        stable = sizes.where(
            (F.col("_sz") >= 2)
            | (F.pmod(F.col("_m0"), F.lit(2)) != parity)
        ).select("sub")
        nbr_sub = state.select(F.col("id").alias("dst"), F.col("sub").alias("_ns"))
        wvs = (
            intra.join(movers.select(F.col("id").alias("src")), "src", "left_semi")
            .join(nbr_sub, "dst")
            .groupBy(F.col("src").alias("id"), F.col("_ns").alias("cand"))
            .agg(F.sum("w").alias("wvs"))
        )
        tot = state.groupBy(F.col("sub").alias("cand")).agg(
            F.sum("k").alias("_tot")
        )
        from pyspark.sql import Window

        if theta > 0:
            # Traag et al. 2019 randomized refinement (paper's theta):
            # (a) mover well-connectedness: w(v, C-v) >= gamma *
            #     k_v * (K_C - k_v) / 2m,
            # (b) target-sub well-connectedness: w(S, C-S) >= gamma *
            #     K_S * (K_C - K_S) / 2m,
            # (c) target drawn ~ exp(gain/theta) over gain >= 0
            #     candidates via a seeded inverse-CDF hash draw.
            # The parity/stationary-target device is kept — it is
            # what makes the PARALLEL round sound (no dissolving
            # targets); theta only randomizes the choice within it.
            csub = state.select(F.col("id").alias("src"), F.col("sub").alias("_ss"))
            dsub = state.select(F.col("id").alias("dst"), F.col("sub").alias("_ds"))
            kC = state.groupBy("community").agg(F.sum("k").alias("_kC"))
            wvc = intra.groupBy(F.col("src").alias("id")).agg(
                F.sum("w").alias("_wvc")
            )
            elig_mover = (
                movers.join(wvc, "id", "left")
                .join(kC, "community")
                .where(
                    F.coalesce(F.col("_wvc"), F.lit(0.0))
                    >= F.lit(gamma)
                    * F.col("k")
                    * (F.col("_kC") - F.col("k"))
                    / F.lit(m2)
                )
                .select("id", "k", "sub")
            )
            ws_out = (
                intra.join(csub, "src")
                .join(dsub, "dst")
                .where(F.col("_ss") != F.col("_ds"))
                .groupBy(F.col("_ss").alias("cand"))
                .agg(F.sum("w").alias("_wso"))
            )
            sub_comm = state.groupBy(F.col("sub").alias("cand")).agg(
                F.sum("k").alias("_KS"), F.first("community").alias("_sc")
            )
            elig_target = (
                sub_comm.join(
                    kC.select(F.col("community").alias("_sc"), "_kC"), "_sc"
                )
                .join(ws_out, "cand", "left")
                .where(
                    F.coalesce(F.col("_wso"), F.lit(0.0))
                    >= F.lit(gamma)
                    * F.col("_KS")
                    * (F.col("_kC") - F.col("_KS"))
                    / F.lit(m2)
                )
                .join(
                    stable.withColumnRenamed("sub", "cand"), "cand", "left_semi"
                )
                .select("cand")
            )
            wcum = (
                Window.partitionBy("id")
                .orderBy("cand")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            u = (
                F.pmod(
                    F.xxhash64("id", F.lit(int(seed)), F.lit(int(r))),
                    F.lit(1 << 20),
                )
                + 0.5
            ) / float(1 << 20)
            moves = (
                wvs.join(elig_target, "cand", "left_semi")
                .join(elig_mover, "id")
                .where(F.col("cand") != F.col("sub"))
                .join(tot, "cand")
                .withColumn(
                    "gain",
                    F.col("wvs")
                    - F.lit(gamma) * F.col("k") * F.col("_tot") / F.lit(m2),
                )
                .where(F.col("gain") >= 0)
                .withColumn(
                    "_wt",
                    F.exp(F.least(F.col("gain") / F.lit(theta), F.lit(50.0))),
                )
                .withColumn("_cum", F.sum("_wt").over(wcum))
                .withColumn("_totwt", F.sum("_wt").over(Window.partitionBy("id")))
                .where(F.col("_cum") >= u * F.col("_totwt"))
                .withColumn(
                    "_rn",
                    F.row_number().over(Window.partitionBy("id").orderBy("cand")),
                )
                .where(F.col("_rn") == 1)
                .select("id", F.col("cand").alias("_new_sub"))
            )
        else:
            win = Window.partitionBy("id").orderBy(F.desc("gain"), F.asc("cand"))
            moves = (
                wvs.join(stable.withColumnRenamed("sub", "cand"), "cand", "left_semi")
                .join(movers.select("id", "k", "sub"), "id")
                .where(F.col("cand") != F.col("sub"))
                .join(tot, "cand")
                .withColumn(
                    "gain",
                    F.col("wvs")
                    - F.lit(gamma) * F.col("k") * F.col("_tot") / F.lit(m2),
                )
                .where(F.col("gain") > 0)
                .withColumn("_rn", F.row_number().over(win))
                .where(F.col("_rn") == 1)
                .select("id", F.col("cand").alias("_new_sub"))
            )
        n_moves = moves.count()
        if n_moves == 0:
            break
        state = tr.cut(
            state.join(moves, "id", "left")
            .select(
                "id",
                "community",
                "k",
                F.coalesce(F.col("_new_sub"), F.col("sub")).alias("sub"),
            )
            .repartition(n_parts, "id")
        )
    out = state.select("id", "community", "sub").localCheckpoint(True)
    tr.close()
    intra.unpersist()
    return out


def leiden(
    spark: SparkSession,
    graph: Graph,
    config: LeidenConfig | None = None,
) -> LeidenResult:
    cfg = config or LeidenConfig()
    workdir = tempfile.mkdtemp(prefix="gds_leiden_")
    # parquet-back level-0 edges (same Spark 4.1 local-mode lineage
    # rationale as louvain.louvain)
    path0 = os.path.join(workdir, "level_0")
    _undirected_weighted(graph).write.mode("overwrite").parquet(path0)
    edges = spark.read.parquet(path0).persist()
    m2 = edges.agg(F.sum("w")).collect()[0][0] or 0.0
    if m2 == 0:
        verts = graph.vertices().select("id", F.col("id").alias("community"))
        return LeidenResult(communities=verts, modularity=0.0)

    # vid_map: original id -> current-level vertex id;
    # comm_map: original id -> phase-1 community (the result)
    vid_map = graph.vertices().select("id", F.col("id").alias("vid"))
    comm_map = vid_map.select("id", F.col("vid").alias("community"))
    level_edges = edges
    init: DataFrame | None = None  # seed communities for this level
    modularities: list[float] = []
    prev_q = None
    levels = 0

    for _ in range(cfg.max_levels):
        comm, _q, _sw, _cv = _local_moving_full(
            level_edges,
            m2,
            cfg.max_iterations,
            init=init,
            gamma=cfg.gamma,
        )
        if init is not None and (prev_q is None or _q <= prev_q + cfg.tolerance):
            # seeded local moving is the Leiden prescription, but the
            # greedy parity sweep can trap in the seed's local optimum
            # (measured on the hub-dominated user-tool graph: seeded
            # level 2 stalls at the seed's Q while a singleton restart
            # reaches the all-in-one partition). Coarse levels are
            # small, so when the seeded sweep STALLS (no tolerance-
            # level improvement over the previous level — the trap
            # signature) also run the unseeded sweep and keep the
            # better of the two; a seeded sweep that already improved
            # keeps its result and skips the restart's full extra
            # sweep cost.
            comm_u, q_u, _sw2, _cv2 = _local_moving_full(
                level_edges, m2, cfg.max_iterations, gamma=cfg.gamma
            )
            if q_u > _q + 1e-12:
                comm, _q = comm_u, q_u
        new_comm_map = (
            vid_map.join(
                comm.select(
                    F.col("id").alias("vid"), F.col("community").alias("_new")
                ),
                "vid",
            )
            .select("id", F.col("_new").alias("community"))
            .localCheckpoint(True)
        )
        q = _modularity(edges, new_comm_map, m2, cfg.gamma)
        if prev_q is not None and q < prev_q:
            break
        comm_map = new_comm_map
        modularities.append(q)
        levels += 1
        n_level = comm.count()
        if prev_q is not None and q - prev_q < cfg.tolerance:
            break
        prev_q = q
        # refinement + contraction over the REFINED partition
        refined = _refine(
            level_edges, comm, m2, cfg.gamma, cfg.max_refine_rounds,
            theta=cfg.theta, seed=cfg.seed,
        )
        n_coarse = refined.select("sub").distinct().count()
        if n_coarse == n_level and init is not None:
            # nothing contracted and the level was already seeded —
            # another level would replay the same fixpoint
            break
        rs = refined.select(F.col("id").alias("src"), F.col("sub").alias("_rs"))
        rd = refined.select(F.col("id").alias("dst"), F.col("sub").alias("_rd"))
        coarse = (
            level_edges.join(rs, "src")
            .join(rd, "dst")
            .groupBy(F.col("_rs").alias("src"), F.col("_rd").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        path = os.path.join(workdir, f"level_{levels}")
        coarse.write.mode("overwrite").parquet(path)
        coarse = spark.read.parquet(path)
        if coarse.where(F.col("src") != F.col("dst")).isEmpty():
            break
        level_edges = coarse
        # vid_map now tracks original id -> coarse vertex (= sub id);
        # the NEXT level's local moving seeds from phase-1 communities
        vid_map = (
            vid_map.join(
                refined.select(
                    F.col("id").alias("vid"), F.col("sub").alias("_sub")
                ),
                "vid",
            )
            .select("id", F.col("_sub").alias("vid"))
            .localCheckpoint(True)
        )
        init = refined.select(
            F.col("sub").alias("id"), "community"
        ).distinct()

    edges.unpersist()
    final = comm_map
    if cfg.consecutive_ids:
        from graph_data_science_spark.util import global_rank

        relabel = global_rank(
            final.select("community").distinct(), ["community"], rank_col="_c"
        ).withColumn("_c", F.col("_c") - 1)
        final = final.join(relabel, "community").select(
            "id", F.col("_c").alias("community")
        )
    final = final.localCheckpoint(eager=True)
    shutil.rmtree(workdir, ignore_errors=True)
    return LeidenResult(
        communities=final,
        modularity=modularities[-1] if modularities else 0.0,
        modularities=modularities,
        levels=levels,
    )
