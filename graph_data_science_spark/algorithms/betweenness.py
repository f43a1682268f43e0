"""Betweenness centrality — batched Brandes with source sampling.

Reference: /root/reference/algo/src/main/java/org/neo4j/gds/
betweenness/BetweennessCentrality.java (parallel per-source Brandes)
with SelectionStrategy.java (ALL or RANDOM_DEGREE sampling — the
reference's answer to O(nm) cost; scores scale by n/samples).

Spark realization — all sampled sources advance TOGETHER, one
level-synchronous wave per superstep (the MSBFS trick again; a
driver loop over sources would be O(sources x diameter) jobs,
this is O(2 x diameter)):

  forward:  frontier(source,id,sigma) ⋈ edges -> sum sigma per
            (source,dst), minus visited  => levels(source,id,dist,sigma)
  backward: for L = maxDist..1:
            delta(v) += sigma(v)/sigma(w) * (1 + delta(w))
            over tree edges v->w with dist(w)=dist(v)+1
  score(v) = sum over sources of delta(source,v), halved when the
             graph is undirected (each pair counted twice), scaled
             by n/samples when sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph


#: above this vertex count, all-pairs sweeps auto-sample their
#: sources unless all_pairs=True is passed explicitly — exact Brandes
#: is O(n*m) work with an O(n^2)-row visited set, a cluster-melting
#: default at web scale (the reference's own SelectionStrategy.java
#: RANDOM_DEGREE sampling exists for the same reason)
AUTO_SAMPLE_THRESHOLD = 10_000


def auto_sample_size(
    n: int, sampling_size: int | None, all_pairs: bool, algo: str
) -> int | None:
    """Shared all-pairs guard: None = run exact; otherwise the sample
    size to use. Exact above AUTO_SAMPLE_THRESHOLD requires an
    explicit ``all_pairs=True`` opt-in."""
    if sampling_size is not None:
        return sampling_size if sampling_size < n else None
    if all_pairs or n <= AUTO_SAMPLE_THRESHOLD:
        return None
    print(
        f"{algo}: auto-sampling {AUTO_SAMPLE_THRESHOLD} of {n} sources "
        "(pass all_pairs=True to force the exact O(n*m) sweep)"
    )
    return AUTO_SAMPLE_THRESHOLD


def sampling_metadata(sample_size: int | None, n: int) -> dict:
    """Column metadata recording whether an all-pairs sweep sampled
    its sources — the programmatic signal (beyond the driver-side
    print) that a score is the scaled estimate, not the exact value.
    Read it back via ``df.schema[col].metadata``."""
    if sample_size is None or sample_size >= n:
        return {"sampled": False}
    return {"sampled": True, "sample_size": sample_size, "n": n}


def betweenness(
    spark: SparkSession,
    graph: Graph,
    sampling_size: int | None = None,
    sampling_seed: int = 42,
    directed: bool = True,
    all_pairs: bool = False,
    strategy: str = "random",
) -> DataFrame:
    """(id, score) — exact when all sources run, else the sampled
    estimate scaled by n/samples. Above AUTO_SAMPLE_THRESHOLD
    vertices the sweep auto-samples unless ``all_pairs=True``.

    ``strategy`` mirrors the reference's SelectionStrategy
    (/root/reference/algo/src/main/java/org/neo4j/gds/betweenness/
    SelectionStrategy.java): ``"random"`` = uniform source sample;
    ``"random_degree"`` (SelectionStrategy.java:107-181) = each node
    accepted with probability degree/maxDegree (hub sources carry
    more shortest-path mass, so degree-biased sources cut estimator
    variance on skewed graphs), topped up with uniform draws when
    rejection leaves the sample short — realized here as one
    deterministic sort on (accepted DESC, hash): accepted nodes
    first, hash-ordered top-up after, ``LIMIT samplingSize``."""
    edges = graph.view().select("src", "dst").dropDuplicates(["src", "dst"])
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED").dropDuplicates(["src", "dst"])
    edges = edges.persist()
    verts = graph.vertices()
    n = verts.count()

    sampling_size = auto_sample_size(n, sampling_size, all_pairs, "betweenness")
    if sampling_size is not None and sampling_size < n:
        hashed = verts.withColumn("_h", F.xxhash64("id", F.lit(sampling_seed)))
        if strategy == "random_degree":
            deg = edges.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("_deg")
            )
            cand = hashed.join(deg, "id", "left").withColumn(
                "_deg", F.coalesce(F.col("_deg"), F.lit(0))
            )
            max_deg = cand.agg(F.max("_deg")).first()[0] or 1
            # uniform in [0,1) from the id hash; accept iff
            # u < degree/maxDegree — the reference's
            # probabilityFactor <= nodeDegree draw
            u = (F.pmod(F.col("_h"), F.lit(1 << 20)) + 0.5) / float(1 << 20)
            cand = cand.withColumn(
                "_acc", (u * float(max_deg) < F.col("_deg")).cast("int")
            )
            sources = (
                cand.orderBy(F.desc("_acc"), F.asc("_h"))
                .limit(sampling_size)
                .select("id")
            )
        elif strategy == "random":
            # deterministic uniform sample: smallest hash values win
            sources = hashed.orderBy("_h").limit(sampling_size).select("id")
        else:
            raise ValueError(f"unknown sampling strategy: {strategy!r}")
        scale = n / sampling_size
    else:
        sources = verts
        scale = 1.0

    # -- forward sweep: distances + shortest-path counts ------------------
    frontier = sources.select(
        F.col("id").alias("source"), F.col("id"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [frontier.withColumn("dist", F.lit(0))]
    visited = frontier.select("source", "id").localCheckpoint(eager=True)
    depth = 0
    while True:
        depth += 1
        nxt = (
            frontier.join(edges, frontier.id == edges.src)
            .groupBy("source", F.col("dst").alias("_id"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("_id", "id")
            .join(visited, ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt.withColumn("dist", F.lit(depth)))
        visited = visited.unionByName(nxt.select("source", "id")).repartition(
            "source", "id"
        ).localCheckpoint(eager=True)
        frontier = nxt

    bfs = levels[0]
    for lv in levels[1:]:
        bfs = bfs.unionByName(lv)
    bfs = bfs.repartition("source", "id").localCheckpoint(eager=True)
    max_depth = depth - 1

    # -- backward accumulation --------------------------------------------
    # tree edges: v->w with dist(w) = dist(v)+1 (both on a shortest path)
    delta = None  # (source, id, delta) for levels already processed
    acc = None  # accumulated per-vertex contributions
    for lvl in range(max_depth, 0, -1):
        w_nodes = bfs.where(F.col("dist") == lvl).select(
            "source", F.col("id").alias("_w"), F.col("sigma").alias("_sw")
        )
        if delta is not None:
            w_nodes = w_nodes.join(
                delta.select("source", F.col("id").alias("_w"), F.col("delta").alias("_dw")),
                ["source", "_w"],
                "left",
            ).select(
                "source", "_w", "_sw", F.coalesce(F.col("_dw"), F.lit(0.0)).alias("_dw")
            )
        else:
            w_nodes = w_nodes.withColumn("_dw", F.lit(0.0))
        v_nodes = bfs.where(F.col("dist") == lvl - 1).select(
            "source", F.col("id").alias("_v"), F.col("sigma").alias("_sv")
        )
        contrib = (
            edges.join(v_nodes, edges.src == v_nodes._v)
            .join(
                w_nodes,
                (edges.dst == w_nodes._w) & (v_nodes.source == w_nodes.source),
            )
            .select(
                v_nodes.source.alias("source"),
                F.col("_v").alias("id"),
                (F.col("_sv") / F.col("_sw") * (1.0 + F.col("_dw"))).alias("_c"),
            )
            .groupBy("source", "id")
            .agg(F.sum("_c").alias("delta"))
            .localCheckpoint(eager=True)
        )
        delta = contrib
        # vertices at lvl-1 contribute delta to their betweenness
        # (excluding the source itself)
        part = contrib.where(F.col("id") != F.col("source")).groupBy("id").agg(
            F.sum("delta").alias("_p")
        )
        acc = part if acc is None else (
            acc.unionByName(part).groupBy("id").agg(F.sum("_p").alias("_p"))
        )

    edges.unpersist()
    factor = scale * (0.5 if not directed else 1.0)
    meta = sampling_metadata(sampling_size, n)
    if acc is None:
        return verts.select("id", F.lit(0.0).alias("score", metadata=meta))
    return (
        verts.join(acc, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("_p"), F.lit(0.0)) * F.lit(factor)).alias(
                "score", metadata=meta
            ),
        )
    )
