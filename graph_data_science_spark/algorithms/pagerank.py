"""PageRank family: PageRank, ArticleRank, Eigenvector centrality.

Exact semantics replicated from the reference:

* PageRank — /root/reference/algo/src/main/java/org/neo4j/gds/
  pagerank/PageRankComputation.java:65-103. Init rank = 1-d (alpha;
  personalized: alpha only on source nodes, 0 elsewhere); per
  superstep delta = d * sum(messages), rank += delta; a vertex sends
  delta/degree to out-neighbors only while delta > tolerance, else
  votes to halt (reactivating on message). Scores are UNNORMALIZED:
  dangling mass is dropped and isolated vertices stay at alpha —
  matching GDS, not textbook PageRank.
* ArticleRank — ArticleRankComputation.java:99 — identical skeleton,
  message denominator (degree + avgDegree).
* Eigenvector — EigenvectorComputation.java:73-161 — (A + I) power
  iteration: next = rank + sum(messages), send next/weightedDegree,
  master step L2-normalizes and converges when max |Δrank| <= tol.

Iteration accounting: GDS maxIterations counts the initial
(init+send-only) superstep, so K configured iterations = K-1
apply steps here; reported ran_iterations matches GDS
("initial iteration is counted extra", PageRankTest.java:135).

Scale notes: the per-superstep plan is frontier ⋈ edges (hash join,
AQE-skew-handled) followed by a partial+final sum aggregation — the
distributed analog of the reference's ReducingMessenger combine. The
edge DF is persisted once and re-scanned per superstep; state stays
3 doubles wide per vertex, so a 10^10-vertex state is ~300 GB spread
over the cluster — well inside shuffle capacity.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.pregel import PregelComputation, PregelResult, PregelRunner


@dataclass
class PageRankConfig:
    """Defaults per PageRankConfig.java:42-57."""

    damping_factor: float = 0.85
    tolerance: float = 1e-7
    max_iterations: int = 20
    weighted: bool = False
    source_nodes: list[int] | None = None
    #: post-hoc score scaling (PageRankConfig.scaler(), applied by
    #: PageRankAlgorithm.scaleScores PageRankAlgorithm.java:77-95);
    #: any functions.scalers.VARIANTS name, default NONE
    scaler: str = "NONE"

    def __post_init__(self) -> None:
        if not 0 < self.damping_factor < 1:
            raise ValueError("damping_factor must be in (0, 1)")
        if self.max_iterations < 1:
            raise ValueError("max_iterations must be >= 1")
        if self.tolerance < 0:
            raise ValueError("tolerance must be >= 0")
        from graph_data_science_spark.functions.scalers import VARIANTS

        if self.scaler.upper() not in VARIANTS:
            raise ValueError(f"scaler must be one of {VARIANTS}")


def _degree_state(graph: Graph, weighted: bool) -> DataFrame:
    """Vertices joined with out-degree (unweighted count or weight
    sum). Persisted on the Graph handle (catalog.Graph.cached) — the
    distinct+groupBy over the full edge table is paid once per graph,
    not once per algorithm run."""

    def build() -> DataFrame:
        verts = graph.vertices()
        edges = graph.view(weight_property=True)
        deg = (
            projection.weighted_degrees(edges)
            if weighted
            else edges.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).cast("double").alias("degree")
            )
        )
        return verts.join(deg, "id", "left").fillna({"degree": 0.0})

    return graph.cached(("degree_state", weighted), build)


class _PageRankComputation(PregelComputation):
    reducer = "sum"

    def __init__(self, config: PageRankConfig):
        self.cfg = config
        self.alpha = 1.0 - config.damping_factor

    def init(self, graph: Graph) -> DataFrame:
        st = _degree_state(graph, self.cfg.weighted)
        if self.cfg.source_nodes:
            init_rank = F.when(
                F.col("id").isin([int(s) for s in self.cfg.source_nodes]),
                F.lit(self.alpha),
            ).otherwise(F.lit(0.0))
        else:
            init_rank = F.lit(self.alpha)
        return st.select(
            "id",
            "degree",
            init_rank.alias("rank"),
            init_rank.alias("_delta"),
            F.lit(False).alias("_halted"),
        )

    def send(self, active: DataFrame, edges: DataFrame, iteration: int) -> DataFrame:
        src_share = active.where(F.col("degree") > 0).select(
            "id", (F.col("_delta") / F.col("degree")).alias("_share")
        )
        joined = src_share.join(edges, src_share.id == edges.src)
        msg = (F.col("_share") * F.col("weight")) if self.cfg.weighted else F.col("_share")
        return joined.select(F.col("dst"), msg.alias("msg"))

    def step(self, state: DataFrame, inbox: DataFrame, iteration: int) -> DataFrame:
        # one flat select: every withColumn re-analyzes the whole plan
        # tree, and at 10-100 supersteps that per-iteration driver cost
        # dominates small/medium graphs (measured ~0.4s/superstep saved)
        d = self.cfg.damping_factor
        tol = self.cfg.tolerance
        delta = F.lit(d) * F.coalesce(F.col("msg"), F.lit(0.0))
        return state.join(inbox, "id", "left").select(
            "id",
            "degree",
            (F.col("rank") + delta).alias("rank"),
            delta.alias("_delta"),
            (~(delta > F.lit(tol))).alias("_halted"),
        )


class _ArticleRankComputation(_PageRankComputation):
    """ArticleRankComputation.java:90-100 — denominator (degree + avg)."""

    def __init__(self, config: PageRankConfig, avg_degree: float):
        super().__init__(config)
        self.avg_degree = avg_degree

    def send(self, active: DataFrame, edges: DataFrame, iteration: int) -> DataFrame:
        src_share = active.where(F.col("degree") > 0).select(
            "id",
            (F.col("_delta") / (F.col("degree") + F.lit(self.avg_degree))).alias("_share"),
        )
        joined = src_share.join(edges, src_share.id == edges.src)
        msg = (F.col("_share") * F.col("weight")) if self.cfg.weighted else F.col("_share")
        return joined.select(F.col("dst"), msg.alias("msg"))


class _EigenvectorComputation(PregelComputation):
    """EigenvectorComputation.java:92-161 — (A+I) normalized power iteration."""

    reducer = "sum"

    def __init__(self, config: PageRankConfig, node_count: int):
        self.cfg = config
        self.node_count = node_count

    def init(self, graph: Graph) -> DataFrame:
        st = _degree_state(graph, self.cfg.weighted)
        if self.cfg.source_nodes:
            srcs = [int(s) for s in self.cfg.source_nodes]
            init_val = F.when(F.col("id").isin(srcs), F.lit(1.0 / len(srcs))).otherwise(
                F.lit(0.0)
            )
        else:
            init_val = F.lit(1.0 / self.node_count)
        # weighted graphs: denominator = weighted degree; unweighted: 1
        denom = F.col("degree") if self.cfg.weighted else F.lit(1.0)
        st = st.select(
            "id",
            denom.alias("denom"),
            init_val.alias("next"),  # unnormalized NEXT_RANK
            F.lit(False).alias("_halted"),
        )
        # RANK after GDS superstep 0's master = L2-normalized init
        norm = st.agg(F.sqrt(F.sum(F.col("next") ** 2))).collect()[0][0] or 1.0
        return st.withColumn("rank", F.col("next") / F.lit(float(norm)))

    def send(self, active: DataFrame, edges: DataFrame, iteration: int) -> DataFrame:
        # denom = 0 vertices have no out-edges — they send nothing,
        # and the filter also keeps ANSI mode from tripping on the
        # (otherwise join-discarded) division by zero
        share = active.where(F.col("denom") > 0).select(
            "id", (F.col("next") / F.col("denom")).alias("_share")
        )
        joined = share.join(edges, share.id == edges.src)
        msg = (F.col("_share") * F.col("weight")) if self.cfg.weighted else F.col("_share")
        return joined.select(F.col("dst"), msg.alias("msg"))

    def step(self, state: DataFrame, inbox: DataFrame, iteration: int) -> DataFrame:
        return state.join(inbox, "id", "left").select(
            "id",
            "denom",
            (F.col("rank") + F.coalesce(F.col("msg"), F.lit(0.0))).alias("next"),
            "_halted",
            "rank",
        )

    def master_compute(self, state: DataFrame, iteration: int) -> tuple[DataFrame, bool]:
        state = state.localCheckpoint(eager=True)
        norm = state.agg(F.sqrt(F.sum(F.col("next") ** 2))).collect()[0][0] or 1.0
        new_state = state.withColumn("_new_rank", F.col("next") / F.lit(float(norm)))
        max_delta = new_state.agg(
            F.max(F.abs(F.col("_new_rank") - F.col("rank")))
        ).collect()[0][0]
        converged = max_delta is not None and max_delta <= self.cfg.tolerance
        new_state = new_state.withColumn("rank", F.col("_new_rank")).drop("_new_rank")
        return new_state, converged


def _run(
    spark: SparkSession,
    comp: PregelComputation,
    graph: Graph,
    config: PageRankConfig,
    checkpoint_dir: str | None,
    salt_buckets: int,
    resume: bool,
) -> PregelResult:
    runner = PregelRunner(
        spark=spark,
        max_iterations=config.max_iterations - 1,
        checkpoint_dir=checkpoint_dir,
        salt_buckets=salt_buckets,
        # tolerance 0 never halts a vertex, so the per-superstep
        # active-count job buys nothing — skip it
        track_active=config.tolerance > 0,
    )
    res = runner.run(comp, graph, resume=resume)
    if not res.did_converge:
        # GDS counts the initial (send-only) superstep when the loop
        # exhausts maxIterations; on convergence it reports the index
        # of the converging superstep, which equals our apply count
        # (Pregel.java:166-199 loop accounting).
        res.ran_iterations += 1
    return res


def _scale_scores(
    state: DataFrame, cfg: PageRankConfig, is_eigenvector: bool = False
) -> DataFrame:
    """Post-hoc result scaling (PageRankAlgorithm.scaleScores,
    PageRankAlgorithm.java:77-95): NONE is a no-op, and so is L2NORM
    on eigenvector (its scores are already L2-normalized)."""
    v = cfg.scaler.upper()
    if v == "NONE" or (v == "L2NORM" and is_eigenvector):
        return state
    from graph_data_science_spark.functions.scalers import scale_property

    return scale_property(state, "score", v, out_col="score_scaled").select(
        "id", F.col("score_scaled").alias("score")
    )


def pagerank(
    spark: SparkSession,
    graph: Graph,
    config: PageRankConfig | None = None,
    checkpoint_dir: str | None = None,
    salt_buckets: int = 0,
    resume: bool = False,
) -> PregelResult:
    """GDS-parity PageRank; result state has (id, rank)."""
    cfg = config or PageRankConfig()
    res = _run(spark, _PageRankComputation(cfg), graph, cfg, checkpoint_dir, salt_buckets, resume)
    res.state = _scale_scores(
        res.state.select("id", F.col("rank").alias("score")), cfg
    )
    return res


def article_rank(
    spark: SparkSession,
    graph: Graph,
    config: PageRankConfig | None = None,
    checkpoint_dir: str | None = None,
    salt_buckets: int = 0,
    resume: bool = False,
) -> PregelResult:
    cfg = config or PageRankConfig()
    edges = graph.view()
    nv = graph.node_count()
    avg_degree = (edges.count() / nv) if nv else 0.0
    res = _run(
        spark,
        _ArticleRankComputation(cfg, avg_degree),
        graph,
        cfg,
        checkpoint_dir,
        salt_buckets,
        resume,
    )
    res.state = _scale_scores(
        res.state.select("id", F.col("rank").alias("score")), cfg
    )
    return res


def eigenvector(
    spark: SparkSession,
    graph: Graph,
    config: PageRankConfig | None = None,
    checkpoint_dir: str | None = None,
    salt_buckets: int = 0,
    resume: bool = False,
) -> PregelResult:
    cfg = config or PageRankConfig()
    res = _run(
        spark,
        _EigenvectorComputation(cfg, graph.node_count()),
        graph,
        cfg,
        checkpoint_dir,
        salt_buckets,
        resume,
    )
    res.state = _scale_scores(
        res.state.select("id", F.col("rank").alias("score")),
        cfg,
        is_eigenvector=True,
    )
    return res


@dataclass
class KatzConfig:
    """Katz centrality x_{t+1}(v) = beta + alpha * Σ_{u→v} x_t(u)
    (Katz 1953). No analog in the reference's 2.0-era suite (its
    closest relatives are eigenvector and ArticleRank); included as
    the classic attenuation-based link-graph centrality. alpha must
    sit below 1/λ_max of the adjacency for the series to converge —
    on in-degree-bounded graphs (reply chains: in-degree ≤ 1) any
    alpha < 1 is safe; on hub graphs size alpha ≈ 1/max_in_degree."""

    alpha: float = 0.5
    beta: float = 1.0
    tolerance: float = 0.0
    max_iterations: int = 10
    weighted: bool = False

    def __post_init__(self) -> None:
        if not 0 < self.alpha < 1:
            raise ValueError("alpha must be in (0, 1)")
        if self.max_iterations < 1:
            raise ValueError("max_iterations must be >= 1")


class _KatzComputation(PregelComputation):
    reducer = "sum"
    # Katz is a FULL recompute per round (x_{t+1} = beta + alpha·Σ
    # in-neighbor x_t), not a delta scheme: every vertex must send its
    # current score every superstep even after its own value settles —
    # a PageRank-style halted-sender filter silently drops upstream
    # contributions and resets scores (observed on a 3-chain). _halted
    # therefore only feeds the all-quiet convergence break.
    send_full_state = True

    def __init__(self, config: KatzConfig):
        self.cfg = config

    def init(self, graph: Graph) -> DataFrame:
        return graph.vertices().select(
            "id",
            F.lit(float(self.cfg.beta)).alias("score"),
            F.lit(False).alias("_halted"),
        )

    def send(self, active: DataFrame, edges: DataFrame, iteration: int) -> DataFrame:
        joined = active.join(edges, active.id == edges.src)
        msg = (
            (F.col("score") * F.col("weight"))
            if self.cfg.weighted
            else F.col("score")
        )
        return joined.select(F.col("dst"), msg.alias("msg"))

    def step(self, state: DataFrame, inbox: DataFrame, iteration: int) -> DataFrame:
        new = F.lit(float(self.cfg.beta)) + F.lit(
            float(self.cfg.alpha)
        ) * F.coalesce(F.col("msg"), F.lit(0.0))
        tol = self.cfg.tolerance
        return state.join(inbox, "id", "left").select(
            "id",
            new.alias("score"),
            (~(F.abs(new - F.col("score")) > F.lit(tol))).alias("_halted"),
        )


def katz(
    spark: SparkSession,
    graph: Graph,
    config: KatzConfig | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> PregelResult:
    """Katz centrality over the directed graph; state = (id, score).

    Same Pregel envelope as PageRank: one frontier ⋈ edges send join
    + one combining sum per superstep; fixed-iteration (tolerance 0)
    runs are exactly reproducible and SQL-oracle-able, tolerance > 0
    stops when every vertex moves ≤ tolerance."""
    cfg = config or KatzConfig()
    runner = PregelRunner(
        spark=spark,
        max_iterations=cfg.max_iterations,
        checkpoint_dir=checkpoint_dir,
    )
    return runner.run(_KatzComputation(cfg), graph, resume=resume)
