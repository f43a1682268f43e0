"""Node2Vec — p/q-biased walks + skip-gram embedding training.

Reference: /root/reference/algo/src/main/java/org/neo4j/gds/
embeddings/node2vec/Node2Vec.java (walks via RandomWalk.java, then
SGNS training in Node2VecModel.java, 235 LoC; defaults
Node2VecBaseConfig.java:34-77 — walksPerNode 10, walkLength 80,
returnFactor/inOutFactor 1.0, embeddingDimension 128, windowSize 10,
negativeSamplingRate 5, iterations 1).

Spark realization: the deterministic hash-seeded p/q walks come from
algorithms.randomwalk (pure column expressions); the skip-gram
training uses Spark ML's Word2Vec estimator over the walk corpus —
the distributed SGNS implementation Spark already ships (per-
partition Hogwild with driver-side averaging), exactly the "walks as
sentences" formulation of Grover & Leskovec. Determinism: walks are
fully deterministic; Word2Vec is deterministic for a fixed seed and
``num_partitions`` (averaging order is fixed per partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.catalog import Graph
from graph_data_science_spark.algorithms.randomwalk import random_walks


def node2vec(
    spark: SparkSession,
    graph: Graph,
    embedding_dim: int = 128,
    walk_length: int = 80,
    walks_per_node: int = 10,
    return_factor: float = 1.0,
    in_out_factor: float = 1.0,
    window_size: int = 10,
    iterations: int = 1,
    min_count: int = 0,
    num_partitions: int | None = None,
    deterministic: bool = False,
    seed: int = 42,
    start_nodes: DataFrame | None = None,
) -> DataFrame:
    """(id, embedding array<float>) — trained node2vec embeddings.

    Word2Vec training parallelism defaults to the session's
    ``spark.sql.shuffle.partitions`` — at scale the walk corpus is
    millions of sentences and a single training partition would
    funnel SGNS through one task. Pass ``deterministic=True`` (or
    ``num_partitions=1``) to pin one partition for a bit-reproducible
    embedding (Spark ML Word2Vec averages per-partition updates, so
    the averaging order — and hence the floats — depends on the
    partitioning).
    """
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    if deterministic:
        num_partitions = 1
    elif num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    walks = random_walks(
        spark,
        graph,
        walk_length=walk_length,
        walks_per_node=walks_per_node,
        return_factor=return_factor,
        in_out_factor=in_out_factor,
        seed=seed,
        start_nodes=start_nodes,
    )
    corpus = (
        walks.groupBy("walk_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("step", "id"))),
                lambda s: s["id"].cast("string"),
            ).alias("sentence")
        )
        .select("sentence")
    )
    model = Word2Vec(
        vectorSize=embedding_dim,
        windowSize=window_size,
        maxIter=iterations,
        minCount=min_count,
        numPartitions=num_partitions,
        seed=seed,
        inputCol="sentence",
        outputCol="_vec",
    ).fit(corpus)
    return model.getVectors().select(
        F.col("word").cast("long").alias("id"),
        vector_to_array(F.col("vector"), "float32").alias("embedding"),
    )
