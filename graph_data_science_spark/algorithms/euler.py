"""Euler-tour labeling of a spanning forest — the PRAM building block
(Tarjan & Vishkin 1985) that turns "subtree of v" into a contiguous
index interval, enabling O(log n)-round distributed biconnectivity,
subtree aggregation, and LCA without any sequential DFS.

The reference's traversal/biconnectivity-adjacent code is strictly
sequential (alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/
traverse/Traverse.java:38 single-threaded stack walk); this module is
the distributed formulation the north rule's 10^12-turn scale
requires: every step is a self-join + shuffle, rounds are
O(log |arcs|), and no driver structure ever holds O(|V|) state.

Plan:
1. Each undirected tree edge {u,v} becomes two arcs (u,v),(v,u) with
   dense ids from util.global_rank (range-partitioned — no
   single-task sort funnel).
2. Arc successor: succ((u,v)) = the arc out of v that follows (v,u)
   in v's cyclic neighbor order — pure window arithmetic per vertex.
   The successor function decomposes the arc set into one Euler
   CIRCUIT per tree.
3. Ring leader election: pointer-doubling min propagation
   (mlab, succ) <- (min(mlab, mlab[succ]), succ[succ]) for
   ceil(log2(2m)) + 1 rounds; the ring minimum arc is the leader and
   its source vertex — the smallest (src, dst) arc's src = the
   smallest vertex with an edge in the tree — becomes the root.
4. Cut each ring before its leader, then Wyllie list-ranking (same
   doubling shape, rank accumulation) yields every arc's tour
   position.
5. Per vertex: of its arc pair, the earlier position is the entry
   (discovery) arc — its src is the parent; the later is the exit.
   subtree_size = (exit - entry + 1) / 2, and the GLOBAL dense
   preorder `disc` (trees laid out contiguously, roots first) comes
   from one more global_rank over (ring, entry_pos).

Output: (id, root, parent, disc, size) with the interval invariant
    x in subtree(v)  <=>  disc(v) <= disc(x) <= disc(v) + size(v) - 1
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from graph_data_science_spark.util import Truncator, global_rank


def _doubling_rounds(n_arcs: int) -> int:
    return max(1, int(math.ceil(math.log2(max(2, n_arcs)))) + 1)


def euler_tour(
    spark: SparkSession,
    tree_edges: DataFrame,
    truncator: Truncator | None = None,
) -> DataFrame:
    """Label the vertices of an undirected spanning FOREST.

    ``tree_edges``: (src, dst) — one row per undirected tree edge
    (self-loops and duplicates are dropped defensively). Vertices
    with no tree edge don't appear (callers union singletons).

    Returns (id long, root long, parent long, disc long, size long);
    ``parent`` is null on roots, ``disc`` is a global dense 0-based
    preorder position, ``size`` the subtree size.

    ``truncator``: shared plan-truncation helper; the doubling loops
    MUST hard-truncate via parquet round-trips — Spark 4.1's chained
    localCheckpoint slows down super-linearly past ~10 iterations
    (see util.Truncator), and these loops run 2*ceil(log2(2m))
    rounds.
    """
    tr = truncator or Truncator(spark, every=1)
    und = (
        tree_edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    arcs = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    arcs = global_rank(arcs, ["src", "dst"], "aid")
    n_arcs = arcs.count()
    if n_arcs == 0:
        return spark.createDataFrame(
            [], "id long, root long, parent long, disc long, size long"
        )

    w = Window.partitionBy("src").orderBy("dst")
    outs = arcs.select(
        "src",
        "dst",
        "aid",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("deg"),
    )

    rev = outs.select(
        F.col("src").alias("_rs"),
        F.col("dst").alias("_rd"),
        F.col("rn").alias("_rrn"),
        F.col("deg").alias("_rdeg"),
    )
    nxt = outs.select(
        F.col("src").alias("_ns"),
        F.col("rn").alias("_nrn"),
        F.col("aid").alias("_naid"),
    )
    ring = (
        outs.join(
            rev,
            (F.col("_rs") == F.col("dst")) & (F.col("_rd") == F.col("src")),
        )
        .withColumn("_srn", F.pmod(F.col("_rrn"), F.col("_rdeg")) + F.lit(1))
        .join(
            nxt,
            (F.col("_ns") == F.col("dst")) & (F.col("_nrn") == F.col("_srn")),
        )
        .select(
            "src",
            "dst",
            "aid",
            F.col("_naid").alias("succ"),
            F.col("aid").alias("mlab"),
        )
    )
    ring = tr.cut(ring)

    # --- ring leader election: min-label pointer doubling ---
    rounds = _doubling_rounds(n_arcs)
    cur = ring
    for i in range(rounds):
        part = cur.select(
            F.col("aid").alias("_pa"),
            F.col("succ").alias("_ps"),
            F.col("mlab").alias("_pm"),
        )
        cur = (
            cur.join(part, cur.succ == part._pa, "left")
            .select(
                "src",
                "dst",
                "aid",
                F.col("_ps").alias("succ"),
                F.least(F.col("mlab"), F.coalesce(F.col("_pm"), F.col("mlab"))).alias(
                    "mlab"
                ),
            )
        )
        if i % 2 == 1 or i == rounds - 1:
            cur = tr.cut(cur)

    # --- cut each ring before its leader, then Wyllie ranking ---
    # re-derive the original successor (doubling collapsed it)
    lab = cur.select(F.col("aid").alias("_la"), F.col("mlab").alias("_lm"))
    lst = (
        ring.join(lab, ring.aid == F.col("_la"))
        .select(
            "src",
            "dst",
            "aid",
            F.when(F.col("succ") == F.col("_lm"), F.lit(None).cast("long"))
            .otherwise(F.col("succ"))
            .alias("succ"),
            F.col("_lm").alias("mlab"),
            F.lit(1).cast("long").alias("srank"),
        )
    )
    lst = tr.cut(lst)
    for i in range(rounds):
        part = lst.select(
            F.col("aid").alias("_pa"),
            F.col("succ").alias("_ps"),
            F.col("srank").alias("_pr"),
        )
        lst = (
            lst.join(part, lst.succ == part._pa, "left")
            .select(
                "src",
                "dst",
                "aid",
                F.col("_ps").alias("succ"),
                "mlab",
                (F.col("srank") + F.coalesce(F.col("_pr"), F.lit(0))).alias("srank"),
            )
        )
        if i % 2 == 1 or i == rounds - 1:
            lst = tr.cut(lst)

    ringlen = (
        lst.where(F.col("aid") == F.col("mlab"))
        .select(F.col("mlab").alias("_rm"), F.col("srank").alias("_rlen"),
                F.col("src").alias("_root"))
    )
    pos = (
        lst.join(ringlen, lst.mlab == F.col("_rm"))
        .select(
            "src",
            "dst",
            "mlab",
            F.col("_root").alias("root"),
            (F.col("_rlen") - F.col("srank") + 1).alias("pos"),
            F.col("_rlen").alias("rlen"),
        )
    )
    pos = tr.cut(pos)

    # --- vertex labels from arc pairs ---
    other = pos.select(
        F.col("src").alias("_os"),
        F.col("dst").alias("_od"),
        F.col("pos").alias("_opos"),
    )
    pairs = pos.join(
        other,
        (F.col("_os") == F.col("dst")) & (F.col("_od") == F.col("src")),
    )
    nonroot = pairs.where(F.col("pos") < F.col("_opos")).select(
        F.col("dst").alias("id"),
        "root",
        F.col("src").alias("parent"),
        "mlab",
        F.col("pos").alias("pfwd"),
        ((F.col("_opos") - F.col("pos") + 1) / 2).cast("long").alias("size"),
    )
    roots = (
        pos.where(F.col("pos") == 1)
        .select(
            F.col("src").alias("id"),
            "root",
            F.lit(None).cast("long").alias("parent"),
            "mlab",
            F.lit(0).cast("long").alias("pfwd"),
            (F.col("rlen") / 2 + 1).cast("long").alias("size"),
        )
    )
    verts = nonroot.unionByName(roots)
    verts = global_rank(verts, ["mlab", "pfwd"], "_disc")
    return verts.select(
        "id", "root", "parent", (F.col("_disc") - 1).alias("disc"), "size"
    )
