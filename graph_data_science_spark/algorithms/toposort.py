"""Topological sort + DAG longest path — distributed Kahn peeling.

Reference analog: Neo4j GDS ships `gds.dag.topologicalSort` (with the
`computeMaxDistanceFromSource` option = unit/weighted longest path
from the sources) in its 2.4-era alpha tier — beyond the 2.0-era
reference snapshot (/root/reference has no dag package), included
because transcript reply graphs ARE DAGs and ordering/depth queries
over them are routine (turn depth, longest tool-chain, dependency
ordering).

Algorithm (Kahn 1962, level-synchronous): round r peels the current
zero-remaining-in-degree vertices and assigns them ``level = r``;
their out-edges decrement the remaining in-degree of their targets.
``level`` is therefore the longest unit-weight path from any source
to the vertex, and ``(level, id)`` is a valid, deterministic
topological order. With ``weighted=True`` the peel also emits
``dist(v) = max(dist(u) + w(u,v))`` over in-edges — maintained as a
running-max column ON the pending state (each peeled frontier pushes
``dist(u) + w`` to its targets, frontier-sized work), so when a
vertex finally peels its max is complete: every in-neighbor peeled
strictly earlier. This is the textbook DAG longest-path recurrence
(NP-hard on general graphs, linear on DAGs).

Cycle handling matches GDS: vertices on or downstream of a cycle are
never peeled and are EXCLUDED from the result (``on_cycle="exclude"``,
the default); ``on_cycle="raise"`` turns leftovers into an error for
pipelines that require a full order.

Scale shape: each round does frontier-sized work — one left-semi join
keyed by ``src`` + one aggregate keyed by ``dst`` — so total work is
O(|E|) across all rounds and round count equals the DAG depth (the
same inherent frontier dependency as BFS; reply-chain DAGs at
transcript scale are depth-bounded by the longest conversation).
Peeled rows append to a scratch parquet (one frontier-sized write per
round, one read at the end — never an O(rounds)-child union plan);
pending state is lineage-truncated through util.Truncator like every
iterative loop in this engine; the driver sees only scalar counts.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph


@dataclass
class TopoSortResult:
    #: (id, level[, dist]) — one row per sorted (non-cyclic) vertex
    order: DataFrame
    rounds: int = 0
    n_sorted: int = 0
    #: vertices left unsorted because they sit on/behind a cycle
    n_cyclic: int = 0
    stats: dict = field(default_factory=dict)


def topological_sort(
    spark: SparkSession,
    graph: Graph,
    weighted: bool = False,
    on_cycle: str = "exclude",
    max_rounds: int = 100_000,
) -> TopoSortResult:
    """Kahn-peel the directed graph; see module docstring.

    Returns ``order`` with ``(id, level)`` — plus ``dist`` (weighted
    longest path from the sources) when ``weighted=True``.
    """
    if on_cycle not in ("exclude", "raise"):
        raise ValueError("on_cycle must be 'exclude' or 'raise'")
    from graph_data_science_spark.util import Truncator

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        graph.view(weight_property=True)
        .select("src", "dst", "weight")
        .repartition(n_parts, "src")
        .persist()
    )
    verts = graph.vertices().select("id")
    indeg = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("_in")
    )
    # pending: (id, rem, dmax) — not yet peeled; dmax accumulates the
    # running max of dist(u) + w over already-peeled in-neighbors u
    pending = (
        verts.join(indeg, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("_in"), F.lit(0)).alias("rem"),
            F.lit(0.0).alias("dmax"),
        )
        .localCheckpoint(True)
    )
    workdir = tempfile.mkdtemp(prefix="gds_toposort_")
    out_path = os.path.join(workdir, "order")
    tr = Truncator(spark, every=4)
    rounds = 0
    n_sorted = 0
    n_pending = pending.count()

    while n_pending > 0 and rounds < max_rounds:
        newly = pending.where(F.col("rem") <= 0)
        n_new = newly.count()
        if n_new == 0:
            break  # remainder sits on/behind a cycle
        peel = newly.select(
            "id",
            F.lit(rounds).cast("int").alias("level"),
            *([F.col("dmax").alias("dist")] if weighted else []),
        )
        peel.write.mode("append").parquet(out_path)
        n_sorted += n_new
        # out-edges of the peeled frontier: decrement target in-degree
        # and push dist(u) + w for the weighted running max
        frontier_edges = edges.join(
            newly.select(
                F.col("id").alias("src"),
                *([F.col("dmax").alias("_du")] if weighted else []),
            ),
            "src",
        )
        dec = frontier_edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("_dec"),
            *(
                [F.max(F.col("_du") + F.col("weight")).alias("_dpush")]
                if weighted
                else []
            ),
        )
        pending = tr.cut(
            pending.where(F.col("rem") > 0)
            .join(dec, "id", "left")
            .select(
                "id",
                (F.col("rem") - F.coalesce(F.col("_dec"), F.lit(0))).alias("rem"),
                (
                    F.greatest(
                        F.col("dmax"),
                        F.coalesce(F.col("_dpush"), F.lit(0.0)),
                    )
                    if weighted
                    else F.lit(0.0)
                ).alias("dmax"),
            )
            .repartition(n_parts, "id")
        )
        n_pending -= n_new
        rounds += 1

    n_cyclic = n_pending
    if n_cyclic > 0 and on_cycle == "raise":
        tr.close()
        edges.unpersist()
        shutil.rmtree(workdir, ignore_errors=True)
        raise ValueError(
            f"graph contains a cycle: {n_cyclic} vertices cannot be "
            "topologically sorted"
        )
    if n_sorted > 0:
        out = (
            spark.read.parquet(out_path)
            .repartition(n_parts, "id")
            .localCheckpoint(True)  # outlive the workdir cleanup
        )
    else:
        schema = "id long, level int" + (", dist double" if weighted else "")
        out = spark.createDataFrame([], schema)
    tr.close()
    edges.unpersist()
    shutil.rmtree(workdir, ignore_errors=True)
    return TopoSortResult(
        order=out,
        rounds=rounds,
        n_sorted=n_sorted,
        n_cyclic=n_cyclic,
        stats={"rounds": rounds, "n_sorted": n_sorted, "n_cyclic": n_cyclic},
    )


def longest_path(
    spark: SparkSession,
    graph: Graph,
    on_cycle: str = "exclude",
    max_rounds: int = 100_000,
) -> TopoSortResult:
    """Weighted longest path from the DAG sources to every vertex
    (`gds.dag.longestPath` analog): ``topological_sort`` with the
    max-plus peel enabled."""
    return topological_sort(
        spark, graph, weighted=True, on_cycle=on_cycle, max_rounds=max_rounds
    )
