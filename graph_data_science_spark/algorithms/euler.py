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

    # --- FUSED leader election + list ranking: one doubling loop ---
    # invariant after round i (window size w = 2^(i+1)): succ points
    # w arcs ahead; mlab = min arc id over the w arcs starting at
    # self; moff = forward distance to that min's FIRST occurrence.
    # Once w >= ring length the min is the ring leader and moff its
    # distance, giving tour position directly — the separate
    # cut-and-Wyllie-rank loop (another `rounds` joins) disappears.
    rounds = _doubling_rounds(n_arcs)
    cur = ring.withColumn("moff", F.lit(0).cast("long"))
    last_cut = cur
    step = 1
    for i in range(rounds):
        part = cur.select(
            F.col("aid").alias("_pa"),
            F.col("succ").alias("_ps"),
            F.col("mlab").alias("_pm"),
            F.col("moff").alias("_po"),
        )
        # strict < : on window overlap (w > ring length) both halves
        # hold the same min and the EARLIER offset must win
        take = F.col("_pm").isNotNull() & (F.col("_pm") < F.col("mlab"))
        cur = cur.join(part, cur.succ == part._pa, "left").select(
            "src",
            "dst",
            "aid",
            F.col("_ps").alias("succ"),
            F.when(take, F.col("_pm")).otherwise(F.col("mlab")).alias("mlab"),
            F.when(take, F.lit(step) + F.col("_po"))
            .otherwise(F.col("moff"))
            .alias("moff"),
        )
        step *= 2
        if i % 2 == 1 or i == rounds - 1:
            cur = tr.cut(cur)
            # adaptive stop: `rounds` is sized for one giant ring
            # (log2 of the GLOBAL arc count), but real forests are
            # many small rings — once two rounds change no mlab,
            # every window already holds its ring minimum and all
            # later rounds are no-ops. The check is one tiny join
            # between the two latest truncated frames, far cheaper
            # than the 2 saved self-joins per skipped round.
            if i < rounds - 1:
                still = (
                    cur.select("aid", "mlab")
                    .join(
                        last_cut.select("aid", F.col("mlab").alias("_prevm")),
                        "aid",
                    )
                    .where(F.col("mlab") != F.col("_prevm"))
                    .limit(1)
                    .count()
                )
                if still == 0:
                    break
            last_cut = cur

    ringlen = cur.groupBy("mlab").agg(F.count(F.lit(1)).alias("_rlen"))
    leader = cur.where(F.col("moff") == 0).select(
        F.col("mlab").alias("_lm"), F.col("src").alias("_root")
    )
    # leader at pos 1; an arc moff steps before the leader sits at
    # pos L - moff + 1 (pmod folds the leader's own moff = 0 case)
    pos = (
        cur.join(ringlen, "mlab")
        .join(leader, cur.mlab == F.col("_lm"))
        .select(
            "src",
            "dst",
            "mlab",
            F.col("_root").alias("root"),
            (F.pmod(F.col("_rlen") - F.col("moff"), F.col("_rlen")) + 1).alias("pos"),
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
