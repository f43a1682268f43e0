"""Graph projection: derive canonical edge tables from relational inputs.

The reference projects a Neo4j store into an in-memory CSR graph
(/root/reference/proc/catalog/src/main/java/org/neo4j/gds/catalog/
GraphCreateProc.java:70-99). Here projection is a declarative
DataFrame plan over a source table — Catalyst handles column pruning
and predicate pushdown at the scan, which at 100 TB means only the
2-4 columns an edge rule touches are ever read from parquet/Iceberg.

Canonical edge schema: edges(src long, dst long, rel_type string,
weight double).

Orientation semantics: /root/reference/graph-projection-api/src/main/
java/org/neo4j/gds/Orientation.java:27-31 (NATURAL / REVERSE /
UNDIRECTED; UNDIRECTED materializes both directions so degrees count
both, matching the reference loader).

Parallel-edge aggregation semantics: /root/reference/graph-projection-
api/src/main/java/org/neo4j/gds/core/Aggregation.java:31-80
(NONE keeps parallels, SINGLE keeps an arbitrary-but-deterministic
one — we pick min weight for determinism — SUM/MIN/MAX/COUNT reduce).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ORIENTATIONS = ("NATURAL", "REVERSE", "UNDIRECTED")
AGGREGATIONS = ("NONE", "SINGLE", "SUM", "MIN", "MAX", "COUNT")

EDGE_COLS = ["src", "dst", "rel_type", "weight"]


def turn_vertex_id(conv_id: Column, turn_idx: Column) -> Column:
    """Stable 64-bit vertex id for a transcript turn.

    xxhash64 is a JVM-side codegen'd expression — no Python in the id
    path; ids are partition-independent and reproducible at any scale.
    """
    return F.xxhash64(conv_id, F.lit(":"), turn_idx.cast("string"))


def tool_vertex_id(tool: Column) -> Column:
    return F.xxhash64(F.lit("tool:"), tool)


def transcript_edges(transcripts: DataFrame) -> DataFrame:
    """Derive the link graph from a transcript table.

    Two edge rules (BASELINE.json north_star):
      * reply edges: (conv, turn i) -> (conv, turn i+1), rel_type
        'REPLY', via a lead() window over (conv_id, turn_idx) — one
        shuffle keyed by conv_id; conv_id cardinality is huge at scale
        so the shuffle is skew-free.
      * invocation edges: turn -> tool vertex for rows with a tool,
        rel_type 'INVOKES'. Tool vertices are the hub-skew source.
    """
    t = transcripts.select(
        turn_vertex_id(F.col("conv_id"), F.col("turn_idx")).alias("vid"),
        "conv_id",
        "turn_idx",
        "tool",
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    reply = (
        t.withColumn("next_vid", F.lead("vid").over(w))
        .where(F.col("next_vid").isNotNull())
        .select(
            F.col("vid").alias("src"),
            F.col("next_vid").alias("dst"),
            F.lit("REPLY").alias("rel_type"),
            F.lit(1.0).alias("weight"),
        )
    )
    invokes = t.where(F.col("tool").isNotNull()).select(
        F.col("vid").alias("src"),
        tool_vertex_id(F.col("tool")).alias("dst"),
        F.lit("INVOKES").alias("rel_type"),
        F.lit(1.0).alias("weight"),
    )
    return reply.unionByName(invokes)


def orient(edges: DataFrame, orientation: str = "NATURAL") -> DataFrame:
    """Apply edge orientation (Orientation.java:27-31 semantics)."""
    o = orientation.upper()
    if o not in ORIENTATIONS:
        raise ValueError(f"orientation must be one of {ORIENTATIONS}, got {orientation!r}")
    if o == "NATURAL":
        return edges
    flipped = edges.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        *[c for c in edges.columns if c not in ("src", "dst")],
    ).select(*edges.columns)
    if o == "REVERSE":
        return flipped
    return edges.unionByName(flipped)


def aggregate_parallel(edges: DataFrame, aggregation: str = "NONE") -> DataFrame:
    """Reduce parallel edges per (src, dst, rel_type).

    Map-side partial aggregation makes this a single skew-tolerant
    shuffle; SINGLE is made deterministic by taking min(weight)
    (the reference's SINGLE keeps an arbitrary edge, Aggregation.java:46).
    """
    a = aggregation.upper()
    if a not in AGGREGATIONS:
        raise ValueError(f"aggregation must be one of {AGGREGATIONS}, got {aggregation!r}")
    if a == "NONE":
        return edges
    agg = {
        "SINGLE": F.min("weight"),
        "SUM": F.sum("weight"),
        "MIN": F.min("weight"),
        "MAX": F.max("weight"),
        "COUNT": F.count(F.lit(1)).cast("double"),
    }[a]
    return edges.groupBy("src", "dst", "rel_type").agg(agg.alias("weight"))


def canonical_undirected(edges: DataFrame) -> DataFrame:
    """Simple undirected graph in canonical src<dst form, deduplicated.

    This is the input shape triangle counting requires (each
    undirected edge exactly once, src<dst — the reference's A<B<C
    emission guard, IntersectingTriangleCount.java:172-180, starts
    from the same canonicalization).
    """
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )


def degrees(edges: DataFrame, directed: bool = True) -> DataFrame:
    """Out-degree per vertex (directed) or full degree (undirected view).

    Mirrors the reference's degree precompute
    (PageRankAlgorithmFactory.java:137-157). One groupBy — Spark's
    partial aggregation is the distributed analog of the reference's
    per-thread degree accumulation.
    """
    e = edges if directed else orient(edges, "UNDIRECTED")
    return e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("degree"))


def weighted_degrees(edges: DataFrame) -> DataFrame:
    """Sum of positive edge weights per source (DegreeCentrality.java:79-160)."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.sum(F.when(F.col("weight") > 0, F.col("weight")).otherwise(0.0)).alias(
            "degree"
        )
    )


def vertices(edges: DataFrame) -> DataFrame:
    """Distinct vertex set of an edge table (id long)."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
