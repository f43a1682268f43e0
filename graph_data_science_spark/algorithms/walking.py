"""Path collapsing and relationship splitting utilities.

* collapse_path — contract A->B->C two-hop paths into a direct edge
  of a new relationship type (/root/reference/alpha/alpha-algo/src/
  main/java/org/neo4j/gds/impl/walking/CollapsePath.java): the
  per-node traversal loop becomes ONE self-join on the shared middle
  vertex.
* split_relationships — train/test edge holdout with negative
  sampling (/root/reference/alpha/alpha-algo/src/main/java/org/
  neo4j/gds/ml/splitting/EdgeSplitter.java): deterministic split by
  seeded hash (not randomSplit — reproducible at any parallelism),
  negatives sampled from non-edges via seeded hash pairing and
  anti-join against the real edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph


def collapse_path(
    spark: SparkSession,
    graph: Graph,
    rel_types: list[str],
    new_type: str = "COLLAPSED",
    allow_self_loops: bool = False,
) -> DataFrame:
    """Edges (src, dst, rel_type=new_type, weight=1.0) for every
    path matching a relationship-type template.

    ``rel_types`` is one template (``["T0", "T1", ...]``, any length
    >= 1) or several (``[["T0", "T1"], ["A", "B", "C"]]`` —
    CollapsePathConfig.pathTemplates); results union. Each template
    chains one equi-join per hop (CollapsePath.java:77-142 walks the
    fixed type sequence); Catalyst reorders/broadcasts per AQE.
    """
    templates: list[list[str]]
    if rel_types and isinstance(rel_types[0], (list, tuple)):
        templates = [list(t) for t in rel_types]
    else:
        templates = [list(rel_types)]
    if not templates or any(len(t) < 1 for t in templates):
        raise ValueError("each path template needs at least one relationship type")

    def one(template: list[str]) -> DataFrame:
        cur = graph.edges.where(F.col("rel_type") == template[0]).select(
            "src", "dst"
        )
        for t in template[1:]:
            nxt = graph.edges.where(F.col("rel_type") == t).select(
                F.col("src").alias("_mid"), F.col("dst").alias("_d")
            )
            cur = (
                cur.withColumnRenamed("dst", "_mid")
                .join(nxt, "_mid")
                .select("src", F.col("_d").alias("dst"))
            )
        return cur

    out = one(templates[0])
    for t in templates[1:]:
        out = out.unionByName(one(t))
    if not allow_self_loops:
        out = out.where(F.col("src") != F.col("dst"))
    return out.dropDuplicates(["src", "dst"]).select(
        "src", "dst", F.lit(new_type).alias("rel_type"), F.lit(1.0).alias("weight")
    )


def split_relationships(
    spark: SparkSession,
    graph: Graph,
    holdout_fraction: float = 0.2,
    negative_sampling_ratio: float = 1.0,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """{'train': edges, 'test': edges, 'test_negative': pairs}.

    Deterministic: an edge lands in the test set when
    pmod(xxhash64(src,dst,seed), 1e6) < holdout_fraction*1e6 —
    partition-independent, unlike randomSplit. Negative test pairs
    are hash-generated (src from test edges, dst pseudo-random
    vertex) minus real edges.
    """
    edges = graph.edges
    bucket = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(1_000_000))
    test = edges.where(bucket < int(holdout_fraction * 1_000_000))
    train = edges.where(bucket >= int(holdout_fraction * 1_000_000))

    verts = graph.vertices()
    n = verts.count()
    # vertex-scale contiguous index without a single-task global sort
    from graph_data_science_spark.util import global_rank

    idx = global_rank(verts.select("id"), ["id"], rank_col="_rn")
    n_neg = int(test.count() * negative_sampling_ratio)
    cand = (
        test.limit(n_neg)
        .select(
            "src",
            (F.pmod(F.xxhash64("src", "dst", F.lit(seed + 1)), F.lit(n)) + 1).alias("_rn"),
        )
        .join(idx, "_rn")
        .select("src", F.col("id").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    negatives = cand.join(
        edges.select("src", "dst"), ["src", "dst"], "left_anti"
    ).dropDuplicates(["src", "dst"])
    return {"train": train, "test": test, "test_negative": negatives}
