"""Approximate Maximum k-Cut — local-search partition improvement.

Reference: /root/reference/alpha/alpha-algo/src/main/java/org/neo4j/
gds/impl/approxmaxkcut/ApproxMaxKCut.java (random assignment +
parallel local search: each node moves to the community minimizing
its intra-community weight, i.e. maximizing the cut; repeated for
`iterations` restarts with VNS perturbation optional).

Deterministic Spark realization (same device as louvain.py /
labelprop.py): hash-seeded initial assignment, then synchronous
sweeps where every vertex proposes its best class but only an
edge-aware independent set of proposers actually moves — among
would-be movers, a vertex is blocked when any ADJACENT would-be
mover carries a higher per-iteration hash priority (the k1coloring
device). Accepted movers therefore never touch both endpoints of
any edge in the same sweep: each mover's neighbors are all frozen,
the cut-weight change decomposes per-mover, and every accepted move
STRICTLY lowers that mover's same-community adjacent weight — so
the cut weight is monotonically non-decreasing, the invariant the
driver oracle checks. (A plain parity split does NOT give this:
same-parity neighbors could move simultaneously and jointly
decrease the cut.) Deterministic at any parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph


@dataclass
class MaxKCutResult:
    assignments: DataFrame  # (id, community)
    cut_weight: float
    init_cut_weight: float


def _cut_weight(canon: DataFrame, part: DataFrame) -> float:
    ps = part.select(F.col("id").alias("src"), F.col("community").alias("_cs"))
    pd_ = part.select(F.col("id").alias("dst"), F.col("community").alias("_cd"))
    row = (
        canon.join(ps, "src")
        .join(pd_, "dst")
        .agg(
            F.sum(
                F.when(F.col("_cs") != F.col("_cd"), F.col("weight")).otherwise(0.0)
            ).alias("cut")
        )
        .collect()[0]
    )
    return float(row["cut"] or 0.0)


def approx_max_k_cut(
    spark: SparkSession,
    graph: Graph,
    k: int = 2,
    max_iterations: int = 8,
    seed: int = 42,
) -> MaxKCutResult:
    """Partition vertices into k classes approximately maximizing the
    total weight of cross-class edges."""
    if k < 2:
        raise ValueError("k must be >= 2")
    und = (
        projection.orient(
            graph.view(weight_property=True).select("src", "dst", "weight"),
            "UNDIRECTED",
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
        .persist()
    )
    canon = (
        graph.view(weight_property=True)
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .persist()
    )
    classes = spark.range(k).select(F.col("id").cast("long").alias("cand"))

    part = graph.vertices().select(
        "id", F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(k)).alias("community")
    ).localCheckpoint(eager=True)
    init_cut = _cut_weight(canon, part)

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    for it in range(max_iterations):
        nbr = part.select(F.col("id").alias("dst"), F.col("community").alias("_nc"))
        wvc = (
            und.join(nbr, "dst")
            .groupBy(F.col("src").alias("id"), F.col("_nc").alias("cand"))
            .agg(F.sum("w").alias("wvc"))
        )
        full = (
            part.crossJoin(classes)
            .join(wvc, ["id", "cand"], "left")
            .select(
                "id", "community", "cand",
                F.coalesce(F.col("wvc"), F.lit(0.0)).alias("wvc"),
            )
        )
        best = full.groupBy("id", "community").agg(
            F.min(F.struct("wvc", "cand")).alias("_b")
        )
        cur = full.where(F.col("cand") == F.col("community")).select(
            "id", F.col("wvc").alias("_wcur")
        )
        # vertices whose best class strictly beats their current one
        movers = (
            best.join(cur, "id")
            .where(F.col("_b.wvc") < F.col("_wcur") - F.lit(1e-12))
            .select("id", F.col("_b.cand").alias("_new"))
        )
        # edge-aware serialization: a mover is blocked when any
        # ADJACENT mover carries a higher hash priority (ties broken
        # by id) — accepted movers form an independent set, so no
        # edge sees both endpoints move and the cut change is the sum
        # of strictly-improving per-mover deltas
        pri = movers.select(
            "id", F.xxhash64("id", F.lit(seed + 7919 * (it + 1))).alias("_p")
        )
        blocked = (
            und.select("src", "dst")
            .join(pri.select(F.col("id").alias("src"), F.col("_p").alias("_ps")), "src")
            .join(pri.select(F.col("id").alias("dst"), F.col("_p").alias("_pd")), "dst")
            .where(
                (F.col("_pd") > F.col("_ps"))
                | ((F.col("_pd") == F.col("_ps")) & (F.col("dst") > F.col("src")))
            )
            .select(F.col("src").alias("id"))
            .distinct()
        )
        winners = movers.join(blocked, "id", "left_anti")
        part = (
            part.join(winners, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("_new"), F.col("community")).alias("community"),
            )
            .repartition(n_parts, "id")
            .localCheckpoint(eager=True)
        )

    cut = _cut_weight(canon, part)
    und.unpersist()
    canon.unpersist()
    return MaxKCutResult(assignments=part, cut_weight=cut, init_cut_weight=init_cut)
