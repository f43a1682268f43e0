"""Graph catalog metadata ops — gds.graph.list/density/degree-distribution.

Reference: /root/reference/proc/catalog/src/main/java/org/neo4j/gds/
catalog/Graph{List,Drop,Exists}Proc.java and the degree-distribution
histogram in GraphStoreCatalog.java:185-203 (HdrHistogram percentiles
p50/p75/p90/p95/p99/p999 + min/max/mean).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph

DEGREE_PERCENTILES = [0.5, 0.75, 0.9, 0.95, 0.99, 0.999]


def degree_distribution(graph: Graph) -> dict[str, Any]:
    """min/mean/max/p50..p999 of out-degree — GraphStoreCatalog.java:185-203."""
    deg = graph.degrees()
    row = (
        graph.vertices()
        .join(deg, "id", "left")
        .select(F.coalesce(F.col("degree"), F.lit(0)).alias("degree"))
        .agg(
            F.min("degree").alias("min"),
            F.max("degree").alias("max"),
            F.avg("degree").alias("mean"),
            F.percentile_approx("degree", DEGREE_PERCENTILES).alias("pcts"),
        )
        .collect()[0]
    )
    out = {"min": row["min"], "max": row["max"], "mean": row["mean"]}
    for p, v in zip(DEGREE_PERCENTILES, row["pcts"] or []):
        out[f"p{str(p)[2:]}"] = v
    return out


def validate_graph(edges, vertices) -> "DataFrame":
    """Edge-table referential-integrity report -> ONE row
    (n_vertices, n_edges, n_self_loops, n_parallel_edges,
    n_null_src, n_null_dst, n_orphan_src, n_orphan_dst).

    NULL endpoints are counted separately (n_null_*) AND excluded
    from the orphan counts — a null key and a dangling key are
    different ingest defects with different fixes.

    The ingest gate a link-graph pipeline runs before projection:
    self-loops and parallel edges quantify how much the canonical
    projection (orientation + parallel-edge aggregation,
    catalog.GraphCatalog.create) will collapse; orphan counts are
    edges whose endpoint is missing from the node table — the
    referential failure that silently drops mass in every
    algorithm downstream.

    100-TB shape: one combining aggregate over the edge table
    (loops + distinct-pair count) and two anti-joins keyed by the
    endpoint (AQE broadcasts the vertex side when it is small, else
    a plain shuffle join); the four one-row results cross-join
    broadcast into the report row. Nothing is collected.
    """
    from pyspark.sql import DataFrame  # noqa: F401  (type only)

    e = edges.select("src", "dst")
    v = vertices.select("id")
    base = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.coalesce(
            F.sum((F.col("src") == F.col("dst")).cast("long")), F.lit(0)
        ).alias("n_self_loops"),
        # count_distinct skips rows with a NULL endpoint, so restrict
        # the parallel-edge definition to fully-keyed edges
        (
            F.coalesce(
                F.sum(
                    (
                        F.col("src").isNotNull() & F.col("dst").isNotNull()
                    ).cast("long")
                ),
                F.lit(0),
            )
            - F.count_distinct(F.col("src"), F.col("dst"))
        )
        .cast("long")
        .alias("n_parallel_edges"),
        F.coalesce(F.sum(F.col("src").isNull().cast("long")), F.lit(0))
        .cast("long")
        .alias("n_null_src"),
        F.coalesce(F.sum(F.col("dst").isNull().cast("long")), F.lit(0))
        .cast("long")
        .alias("n_null_dst"),
    )
    nv = v.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    o_src = (
        e.where(F.col("src").isNotNull())
        .join(v, F.col("src") == v["id"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orphan_src"))
    )
    o_dst = (
        e.where(F.col("dst").isNotNull())
        .join(v, F.col("dst") == v["id"], "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orphan_dst"))
    )
    return (
        nv.crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(o_src))
        .crossJoin(F.broadcast(o_dst))
        .select(
            "n_vertices",
            "n_edges",
            "n_self_loops",
            "n_parallel_edges",
            "n_null_src",
            "n_null_dst",
            "n_orphan_src",
            "n_orphan_dst",
        )
    )


def k_core(edges, k: int = 2, rounds: int = 6) -> "DataFrame":
    """k-core peeling over the undirected view -> (id, degree):
    repeatedly drop vertices with degree < k, then report the
    survivors with their degree inside the surviving subgraph. The
    density-based curation cut a corpus link graph uses to separate
    the connected "core" (k-core membership) from peripheral spam
    chains; pairs with powerlaw_fit, which measures the tail this
    peels. (Beyond the reference suite — GDS of this era has no
    k-core — included for the curation toolkit.)

    Runs EXACTLY ``rounds`` peel rounds: the peel is a monotone
    fixpoint, so extra rounds are no-ops once converged, and a fixed
    round count makes the result reproducible in unrolled ANSI SQL at
    any parallelism. Choose rounds >= the graph's peel depth
    (bipartite invocation graphs converge in 2-3; long path-shaped
    chains peel O(length) and need more).

    100-TB shape: each round is one combining degree groupBy + one
    double semi-join keyed by the endpoints — the same exchanges a
    Pregel superstep pays, with AQE free to broadcast the shrinking
    alive set; no state ever collects to the driver.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )
    e = und
    for i in range(rounds):
        # each round embeds e TWICE (degree pass + the semi-join), so
        # the plan tree doubles per round — truncate the lineage every
        # round or both execution (2^rounds re-evaluation, measured
        # 148s vs 15s at sf0.01) and analysis (tree-walk OOM by round
        # 6) blow up. localCheckpoint is fine at this loop depth; use
        # util.Truncator's parquet cut for deep peels.
        e = e.localCheckpoint(eager=True)
        deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("_d"))
        alive = deg.where(F.col("_d") >= k).select(F.col("a").alias("id"))
        e = (
            e.join(alive, e["a"] == alive["id"], "left_semi")
            .join(alive, F.col("b") == alive["id"], "left_semi")
        )
    return (
        e.groupBy("a")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("a").alias("id"), "degree")
    )


def powerlaw_fit(degrees, d_min: int = 1) -> "DataFrame":
    """Continuous power-law MLE over the degree tail -> ONE row
    (alpha, d_min, n_tail): alpha = 1 + n / sum(ln(d / d_min)) over
    degrees >= d_min (Clauset, Shalizi & Newman 2009, eq. 3.1 — the
    Hill estimator). The scale-free-ness check a link-graph pipeline
    runs to size its skew handling: alpha near 2 means hub mass that
    demands the salted/split paths, alpha >> 3 means the plain plans
    win (see catalog.Graph.pregel_layout hub threshold).

    Determinism: each ln term is rounded to 9 dp and summed as
    DECIMAL (order-independent), alpha rounds to 6 dp — value-exact
    in ANSI SQL at any parallelism. NULL alpha when every tail degree
    equals d_min (the MLE diverges).

    100-TB shape: one filter + one combining aggregate over the
    degree table; nothing collected.
    """
    if d_min < 1:
        raise ValueError("d_min must be >= 1")
    t = degrees.where(F.col("degree") >= d_min).select(
        F.round(
            F.log(F.col("degree").cast("double") / F.lit(float(d_min))), 9
        )
        .cast("decimal(18,9)")
        .alias("_l")
    )
    s = F.sum("_l").cast("double")
    return t.agg(
        F.round(
            F.when(s > 0, 1.0 + F.count(F.lit(1)).cast("double") / s), 6
        ).alias("alpha"),
        F.lit(d_min).cast("long").alias("d_min"),
        F.count(F.lit(1)).cast("long").alias("n_tail"),
    )


def density(graph: Graph) -> float:
    """relationshipCount / (nodeCount * (nodeCount - 1)) — the
    reference's GraphInfo density formula."""
    n = graph.node_count()
    if n < 2:
        return 0.0
    return graph.edge_count() / (n * (n - 1))


def modularity(graph: Graph, communities, weighted: bool = False) -> float:
    """Modularity Q of a given (id, community) partition over the
    undirected view — the reference's gds.alpha.modularity metric
    (shares the formula with ModularityOptimization.java)."""
    from graph_data_science_spark.algorithms.louvain import (
        _modularity,
        _undirected_weighted,
    )
    from pyspark.sql import functions as F

    e = _undirected_weighted(graph)
    m2 = e.agg(F.sum("w")).collect()[0][0] or 0.0
    if m2 == 0:
        return 0.0
    return _modularity(e, communities, m2)


def export_graph(graph: Graph, path: str, fmt: str = "parquet") -> dict[str, Any]:
    """gds.graph.export analog — dump edges (+node properties) to a
    table directory (CSV export CsvGraphStoreExporter analog; here
    parquet/csv/json via the DataFrame writers)."""
    graph.edges.write.mode("overwrite").format(fmt).option("header", True).save(
        f"{path}/edges"
    )
    out = {"path": path, "relationships": graph.edge_count()}
    if graph.nodes is not None:
        graph.nodes.write.mode("overwrite").format(fmt).option("header", True).save(
            f"{path}/nodes"
        )
        out["nodes"] = graph.nodes.count()
    # metadata sidecar so import_graph restores the handle faithfully
    # (directedness is not recoverable from the edge table alone);
    # written through the DataFrame writer so any Hadoop-compatible
    # FS works, not just local disk
    spark = graph.edges.sparkSession
    meta = {
        "name": graph.name,
        "directed": graph.directed,
        "has_nodes": graph.nodes is not None,
        "fmt": fmt,
    }
    spark.createDataFrame(
        [tuple(meta.values())], " ".join(
            f"{k} {'string' if isinstance(v, str) else 'boolean'},"
            for k, v in meta.items()
        ).rstrip(",")
    ).coalesce(1).write.mode("overwrite").json(f"{path}/_graph_meta")
    return out


def import_graph(
    spark,
    catalog,
    name: str,
    path: str,
    fmt: str | None = None,
) -> Graph:
    """gds.graph.export round-trip — read an :func:`export_graph`
    layout back into a catalog entry (the CsvGraphStoreImporter
    analog, csv/.../CsvGraphStoreImporter.java:60: file-backed graph
    store -> in-catalog graph).

    ``fmt`` defaults to whatever the export recorded in its metadata
    sidecar. CSV edges are read with the canonical explicit schema
    (src/dst/rel_type/weight) — never inferSchema on the hot table,
    which would double-scan 100 TB; node property columns (schema
    unknown by design) do infer on CSV.
    """
    meta_rows = spark.read.json(f"{path}/_graph_meta").collect()
    meta = meta_rows[0].asDict() if meta_rows else {}
    fmt = fmt or meta.get("fmt", "parquet")
    directed = bool(meta.get("directed", True))

    edge_reader = spark.read.format(fmt).option("header", True)
    if fmt == "csv":
        edge_reader = edge_reader.schema(
            "src long, dst long, rel_type string, weight double"
        )
    edges = edge_reader.load(f"{path}/edges")

    nodes = None
    if meta.get("has_nodes"):
        node_reader = spark.read.format(fmt).option("header", True)
        if fmt == "csv":
            node_reader = node_reader.option("inferSchema", True)
        nodes = node_reader.load(f"{path}/nodes")

    # edges on disk are already canonical (post-orientation), so
    # re-register as NATURAL regardless of the original orientation
    # and restore directedness from the sidecar
    g = catalog.create(name, edges, nodes=nodes, orientation="NATURAL")
    g.directed = directed
    return g


def graph_info(graph: Graph) -> dict[str, Any]:
    """gds.graph.list row analog."""
    n = graph.node_count()
    m = graph.edge_count()
    rel_types = [r["rel_type"] for r in graph.edges.select("rel_type").distinct().collect()]
    return {
        "graphName": graph.name,
        "nodeCount": n,
        "relationshipCount": m,
        "relationshipTypes": sorted(rel_types),
        "directed": graph.directed,
        "density": (m / (n * (n - 1))) if n > 1 else 0.0,
        "degreeDistribution": degree_distribution(graph),
    }


def assortativity(edges) -> "DataFrame":
    """Degree assortativity coefficient -> ONE row (n_edges, r):
    Pearson correlation of endpoint degrees over the undirected edge
    list (Newman 2002, "Assortative mixing in networks", eq. 4). The
    structural complement to powerlaw_fit: r < 0 (hubs link to
    leaves, the usual web/link-graph shape) predicts that hub-split
    send paths dominate; r > 0 (hub-hub cores) predicts salted
    fan-in aggregation is the binding path.

    Both orientations of every edge enter the sums, which makes the
    estimator symmetric (j/k marginals identical) and reduces it to
    plain Pearson over endpoint-degree pairs. Determinism: degrees
    are integers, so all five moment sums (Σj, Σjk, Σj², M, and the
    shared marginal) are exact DECIMAL(38,0) integer sums — no
    floating point until the final ratio, rounded to 6 dp. NULL r
    when the variance is 0 (regular graphs).

    100-TB shape: one combining degree groupBy, two src/dst-keyed
    joins of the edge list against the degree table (AQE-planned),
    one scalar aggregate; nothing collected.
    """
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    both = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    pairs = (
        both.join(deg, "src")
        .withColumnRenamed("_d", "_j")
        .join(deg.select(F.col("src").alias("dst"), F.col("_d").alias("_k")), "dst")
        .select(
            F.col("_j").cast("decimal(38,0)").alias("_j"),
            F.col("_k").cast("decimal(38,0)").alias("_k"),
        )
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("_j").alias("_sj"),
        F.sum(F.col("_j") * F.col("_k")).alias("_sjk"),
        F.sum(F.col("_j") * F.col("_j")).alias("_sjj"),
    )
    m = F.col("m").cast("double")
    sj = F.col("_sj").cast("double")
    num = m * F.col("_sjk").cast("double") - sj * sj
    den = m * F.col("_sjj").cast("double") - sj * sj
    return agg.select(
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.when(den != 0, F.round(num / den, 6)).alias("r"),
    )


def reciprocity(edges) -> "DataFrame":
    """Directed-graph reciprocity -> ONE row (n_edges, n_reciprocal,
    r): the fraction of distinct non-loop directed edges whose
    reverse edge also exists. The directionality probe for a link
    graph — reply chains are purely feed-forward (r = 0), mention /
    collaboration graphs trend reciprocal (r -> 1); r drives whether
    the undirected projections (triangle count, node similarity)
    roughly double the edge volume or leave it unchanged.

    100-TB shape: one dedup + one self-join keyed by the reversed
    pair (left_semi, AQE-planned) + one scalar agg; exact integers,
    double division only in the final ratio (rounded 6 dp).
    """
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    out = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).crossJoin(
        recip.agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    )
    return out.select(
        "n_edges",
        "n_reciprocal",
        F.when(
            F.col("n_edges") > 0,
            F.round(
                F.col("n_reciprocal").cast("double")
                / F.col("n_edges").cast("double"),
                6,
            ),
        ).alias("r"),
    )


def size_of(graph: Graph) -> dict[str, Any]:
    """`gds.internal.graph.sizeOf` analog (GraphMemoryUsageProc):
    memory footprint of a catalog graph, decomposed like the
    reference's detail map. Estimation-based (Tungsten row widths
    from graph_data_science_spark.estimation) — the resident-bytes
    contract a reject-before-load guard needs, without scanning."""
    from graph_data_science_spark.estimation import ROW_OVERHEAD, WORD, _human

    n = graph.node_count()
    m = graph.edge_count()
    n_edge_cols = len(graph.edges.columns)
    node_cols = graph.nodes.columns if graph.nodes is not None else ["id"]
    edge_bytes = m * (ROW_OVERHEAD + WORD * n_edge_cols)
    node_bytes = n * (ROW_OVERHEAD + WORD * len(node_cols))
    total = edge_bytes + node_bytes
    return {
        "graphName": graph.name,
        "nodeCount": n,
        "relationshipCount": m,
        "totalBytes": total,
        "human": _human(total),
        "detail": {
            "relationships": edge_bytes,
            "nodes": node_bytes,
            "relationshipColumns": n_edge_cols,
            "nodeColumns": len(node_cols),
        },
    }
