"""HashGNN — binary node embeddings via min-hash message passing
(GDS 2.3 `gds.hashgnn`; the 2.0-era reference snapshot predates it,
its closest kin being FastRP's random-projection init,
algo/src/main/java/org/neo4j/gds/embeddings/fastrp/FastRP.java).

Semantics (HashGNN, Tan et al. 2023, as shipped by GDS):
- every node starts with a sparse BINARY feature vector
  (`generateFeatures` mode: `density` pseudo-random active bits out
  of `dimension`);
- each iteration draws `density` min-hash samples; for sample k the
  node picks the candidate bit with the smallest hash among its OWN
  active bits (hashed with one function) and its NEIGHBORS' active
  bits (hashed with another) — locality-sensitive neighborhood
  aggregation without floats;
- the selected bits form the next iteration's embedding.

All hashing here is the repo's closed-form LCG
(pmod(pmod(x, 2^31) * 2654435761, 2^31), the same reduce-then-
multiply guard as fastrp_exact / ann.lcg_plane), so the WHOLE
algorithm — feature generation, both hash families, argmin
tie-breaks — is reproducible bit-for-bit in ANSI SQL: the driver
oracle replays every iteration.

Spark plan: state is an exploded (id, bit) table; one iteration =
   own candidates:      state x sample-range, hashed
   neighbor candidates: edges join state (one shuffle), distinct,
                        x sample-range, hashed
   argmin per (id, k):  groupBy min(struct(hash, bit))
No Python UDFs anywhere — pure column expressions; the per-round
volume is |state| * density + |edges|-join, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph

M31 = 2_147_483_648
_A = 2654435761
_B1 = 1000003
_B2 = 7919


def _lcg(col):
    return F.pmod(F.pmod(col, F.lit(M31)) * F.lit(_A), F.lit(M31))


def hashgnn(
    spark: SparkSession,
    graph: Graph,
    dimension: int = 64,
    density: int = 2,
    iterations: int = 2,
    seed: int = 42,
    directed: bool = False,
) -> DataFrame:
    """(id, bit) exploded binary embedding — `density` rows per node
    per final sample (deduplicated; a node has 1..density bits)."""
    edges = graph.view()
    if not directed:
        edges = projection.orient(edges, "UNDIRECTED")
    edges = edges.select("src", "dst").distinct().persist()
    verts = graph.vertices().persist()

    ks = spark.range(density).select(F.col("id").alias("k"))
    js = spark.range(density).select(F.col("id").alias("j"))

    # generateFeatures: density pseudo-random bits per node
    state = (
        verts.crossJoin(F.broadcast(js))
        .select(
            "id",
            (
                _lcg(
                    F.pmod(F.col("id"), F.lit(M31)) * F.lit(31)
                    + F.col("j") * F.lit(_B2)
                    + F.lit(seed)
                )
                % F.lit(dimension)
            ).alias("bit"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    for _ in range(iterations):
        own = state.crossJoin(F.broadcast(ks)).select(
            "id",
            "k",
            "bit",
            _lcg(
                F.col("bit") * F.lit(_B1) + F.col("k") * F.lit(_B2) + F.lit(seed + 1)
            ).alias("h"),
        )
        nbits = (
            edges.join(state.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "bit")
            .distinct()
        )
        nbr = nbits.crossJoin(F.broadcast(ks)).select(
            "id",
            "k",
            "bit",
            _lcg(
                F.col("bit") * F.lit(_B1) + F.col("k") * F.lit(_B2) + F.lit(seed + 2)
            ).alias("h"),
        )
        sel = (
            own.unionByName(nbr)
            .groupBy("id", "k")
            .agg(F.min(F.struct("h", "bit")).alias("_m"))
            .select("id", F.col("_m.bit").alias("bit"))
            .distinct()
        )
        prev = state
        state = sel.localCheckpoint(eager=True)
        from graph_data_science_spark.pregel import _free_local_checkpoint

        _free_local_checkpoint(prev)
    edges.unpersist()
    verts.unpersist()
    return state


def hashgnn_dense(
    spark: SparkSession, graph: Graph, **kwargs
) -> DataFrame:
    """(id, embedding array<int>) densified sorted-bit form."""
    bits = hashgnn(spark, graph, **kwargs)
    return bits.groupBy("id").agg(
        F.sort_array(F.collect_list("bit")).alias("embedding")
    )
