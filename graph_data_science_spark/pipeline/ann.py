"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline: JVM-side
  zip_with/aggregate dot products (whole-stage codegen, no Python),
  grouped top-k window. O(Q x N) — fine when the query set is
  bounded or as the per-bucket kernel below.
* LSH-bucketed ANN — random-hyperplane signatures (deterministic
  md5-seeded hyperplanes) bucket the corpus; search only within the
  query's bucket(s). The scale path: shuffle keyed by bucket, each
  bucket a bounded brute-force.
* embedding cosine near-dup pairs for dedup pipelines.

Cosine here = dot(a,b) / (||a|| * ||b||) accumulated left-to-right in
float64 — deterministic and engine-portable (the DuckDB oracle
computes the identical expression).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _sum(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b)/(||a||*||b||) — left-to-right float64 fold."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def pearson_similarity(a: Column, b: Column) -> Column:
    """Pearson correlation of two vector columns
    (alpha similarity fn parity: /root/reference/alpha/alpha-algo/src/
    main/java/org/neo4j/gds/impl/similarity/ Pearson kernels) —
    (n*Σab - Σa*Σb) / (sqrt(n*Σa² - (Σa)²) * sqrt(n*Σb² - (Σb)²))."""
    n = F.size(a).cast("double")
    sa, sb = _sum(a), _sum(b)
    sab = _dot(a, b)
    saa, sbb = _dot(a, a), _dot(b, b)
    return (n * sab - sa * sb) / (
        F.sqrt(n * saa - sa * sa) * F.sqrt(n * sbb - sb * sb)
    )


def euclidean_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def euclidean_similarity(a: Column, b: Column) -> Column:
    """1 / (1 + distance) — the reference's distance->similarity map
    (alpha similarity fns)."""
    return 1.0 / (1.0 + euclidean_distance(a, b))


_METRICS = {
    "cosine": cosine_similarity,
    "pearson": pearson_similarity,
    "euclidean": euclidean_similarity,
}


def similarity_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
    out_col: str = "similarity",
) -> DataFrame:
    """(query_id, neighbor_id, <out_col>, rank) — exact brute force
    under any of the metric kernels (cosine / pearson / euclidean,
    the reference's alpha similarity functions).

    Ties broken by ascending neighbor id (explicit for parity).
    The corpus side is broadcast when small; for corpus >> memory use
    `lsh_topk` instead.
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {sorted(_METRICS)}, got {metric!r}")
    from graph_data_science_spark.util import widen_scan

    # widen the stream side: a single-file query table otherwise runs
    # the whole O(Q x N) kernel as one task (util.widen_scan)
    q = widen_scan(queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    pairs = q.crossJoin(c).where(F.col("query_id") != F.col("neighbor_id"))
    sim = _METRICS[metric](F.col("_qv"), F.col("_cv"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc(out_col), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn(out_col, sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(out_col, 6).alias(out_col),
            "rank",
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — exact brute force."""
    return similarity_topk(
        corpus, queries, k, id_col, vec_col, metric="cosine", out_col="cosine"
    )


def lcg_plane(plane: int, dim: int, seed: int = 42) -> list[float]:
    """Deterministic hyperplane weights in [-1, 1) from the same
    two-round 2^31 LCG as algorithms.fastrp.fastrp_exact — pure
    integer arithmetic, so an ANSI-SQL oracle reproduces every weight
    (and therefore every bucket assignment) bit-for-bit."""
    out = []
    for d in range(dim):
        # reduce k mod 2^31 before the multiply so a BIGINT oracle
        # (or ANSI Spark) never overflows even at plane*dim >~ 3.5e9;
        # congruence-preserving, so weights are unchanged
        k = (plane * dim + d) % 2**31
        h1 = (k * 2654435761 + seed) % 2**31
        h2 = (h1 * 1103515245 + 12345) % 2**31
        out.append(2.0 * h2 / 2**31 - 1.0)
    return out


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lcg",
) -> DataFrame:
    """(vec_id, bucket int) — sign pattern against n deterministic
    random hyperplanes.

    method='lcg' (default): closed-form LCG weights evaluated as pure
    JVM column folds — identical left-to-right float64 accumulation
    as a SQL oracle's list_sum, so signatures are value-exact across
    engines. method='numpy': seeded-gaussian planes in an
    Arrow-batched kernel (kept for wide-dim throughput comparisons;
    not SQL-reproducible).
    """
    from graph_data_science_spark.util import widen_scan

    df = widen_scan(df)  # n_planes x dim fused multiply-adds per row
    if method == "lcg":
        bucket = F.lit(0)
        for p in range(n_planes):
            w = F.array(*[F.lit(x) for x in lcg_plane(p, dim, seed)])
            bucket = bucket + F.when(
                _dot(F.col(vec_col), w) > 0, F.lit(1 << p)
            ).otherwise(F.lit(0))
        return df.select(
            F.col(id_col).alias("vec_id"), bucket.cast("int").alias("bucket")
        )
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float64)

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                yield pd.DataFrame({"vec_id": [], "bucket": []})
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (mat @ planes.T) > 0
            bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(), "bucket": bucket})

    return df.select(id_col, vec_col).mapInPandas(batch, "vec_id long, bucket int")


def _table_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int,
    n_tables: int,
    seed: int,
    id_col: str,
    vec_col: str,
    method: str,
    out_id: str,
) -> DataFrame:
    """(out_id, table, bucket) — one signature per hash table, each
    table seeded independently (multi-table LSH: a pair missed by one
    table's buckets gets another chance in the next — the standard
    recall-vs-cost knob alongside n_planes)."""
    sigs = None
    for t in range(n_tables):
        s = hyperplane_signatures(
            df, dim, n_planes, seed + 1_000_003 * t, id_col, vec_col, method
        ).select(
            F.col("vec_id").alias(out_id),
            F.lit(t).alias("table"),
            "bucket",
        )
        sigs = s if sigs is None else sigs.unionByName(s)
    return sigs


def _thin_hot_buckets(
    index: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    cap: int,
    op_name: str,
) -> DataFrame:
    """Thin every bucket of an ANN index to ~``cap`` member rows by
    deterministic hash-sampling: a member survives iff
    thin_hash(id, *bucket) % size < cap, i.e. with rate
    cap/size — so expected thinned size == cap, the decision is
    reproducible per (bucket, id), and the pass is one size aggregate
    plus one filter join (no per-bucket sort: the hot bucket never
    funnels into a single task the way a row_number window would).
    The hash is the repo's LCG recipe (NOT xxhash64) so the entire
    capped search replays value-exact in ANSI SQL. The thin is
    LOGGED, never silent (the dedup-family convention,
    pipeline/dedup.py ngram_jaccard_pairs)."""
    sizes = index.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("_bn"))
    hot = sizes.where(F.col("_bn") > cap)
    stats = hot.agg(
        F.count(F.lit(1)).alias("n_hot"),
        F.coalesce(F.sum(F.col("_bn") - cap), F.lit(0)).alias("n_over"),
        F.coalesce(F.max("_bn"), F.lit(0)).alias("max_bucket"),
    ).collect()[0]
    if stats["n_hot"] == 0:
        return index
    print(
        f"{op_name}: thinning {stats['n_hot']} hot buckets to "
        f"max_bucket_size={cap} (~{stats['n_over']} of their rows "
        f"hash-sampled out; hottest bucket held {stats['max_bucket']})"
    )
    keep = F.pmod(thin_hash(id_col, bucket_cols), F.col("_bn")) < F.lit(cap)
    return (
        index.join(sizes, bucket_cols)
        .where((F.col("_bn") <= cap) | keep)
        .drop("_bn")
    )


#: positional multipliers for thin_hash bucket columns — fixed so the
#: SQL oracle can replay the decision (see __spark_entry__ capped-LSH
#: oracle)
THIN_HASH_MULTS = (69069, 40503, 48271)


def thin_hash(id_col: str, bucket_cols: list[str]) -> Column:
    """((id % 2^31) * 2654435761 + sum(bucket_i * mult_i) + 12345)
    % 2^31 — 64-bit-safe integer arithmetic identical in Spark and
    ANSI SQL, so the hash-thinned index is exactly reproducible."""
    if len(bucket_cols) > len(THIN_HASH_MULTS):
        raise ValueError(
            f"thin_hash supports at most {len(THIN_HASH_MULTS)} bucket "
            f"columns (one fixed multiplier each, so SQL replays stay "
            f"exact); got {bucket_cols!r} — extend THIN_HASH_MULTS and "
            "every SQL oracle that replays it together"
        )
    expr = F.pmod(F.col(id_col).cast("long"), F.lit(2147483648)) * F.lit(2654435761)
    for c, m in zip(bucket_cols, THIN_HASH_MULTS):
        expr = expr + F.col(c).cast("long") * F.lit(m)
    return F.pmod(expr + F.lit(12345), F.lit(2147483648))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lcg",
    probe_hamming: int = 0,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s); per-bucket exact cosine + window top-k. Recall rises
    with fewer planes (bigger buckets), more tables (independent
    chances), or ``probe_hamming`` — the classic knobs.

    ``max_bucket_size`` caps the CORPUS side of each (table, bucket)
    list: at fixed n_planes bucket occupancy grows linearly with the
    corpus, so per-bucket candidate pairs grow quadratically — one
    hot bucket is one task at 100 TB. Hot lists are THINNED to ~cap
    rows by deterministic hash-sampling (keep iff
    thin_hash(id, table, bucket) % size < cap — the SQL-replayable
    LCG recipe, see thin_hash) rather than dropped
    whole, because for top-k search a query whose only bucket is hot
    must still see candidates (dedup's drop-the-bucket semantics —
    pipeline.dedup.minhash_lsh_candidates — would blind it); thinning
    is also one filter, no per-bucket sort funnel. The thin is
    logged, never silent; queries are never thinned. None disables.

    ``probe_hamming`` = multi-probe LSH: each query also probes every
    bucket within that Hamming distance of its signature (flipping
    <=h of the n_planes sign bits), trading C(n_planes, <=h) extra
    bucket lookups per query for the recall of that many extra
    tables WITHOUT re-hashing or replicating the corpus — the
    standard scale-path knob when the corpus side dominates (one
    signature pass + index over 100 TB, probes only multiply the
    query side)."""
    import itertools

    # pin the corpus signature table — it IS the LSH index (built
    # once over the corpus, reused by every probe; at scale this is
    # the n_tables x n_corpus row artifact you'd materialize anyway),
    # and without pinning the per-vector hyperplane dot products
    # recompute for every subplan that touches it
    csig = _table_signatures(
        corpus, dim, n_planes, n_tables, seed, id_col, vec_col, method, "neighbor_id"
    ).localCheckpoint(eager=True)
    if queries is corpus:
        # self-join case: the query signatures are the same index —
        # taken from the UNthinned index so a query in a hot bucket
        # still probes it
        qsig = csig.withColumnRenamed("neighbor_id", "query_id")
    else:
        qsig = _table_signatures(
            queries, dim, n_planes, n_tables, seed, id_col, vec_col, method, "query_id"
        )
    if max_bucket_size is not None:
        csig = _thin_hot_buckets(
            csig, ["table", "bucket"], "neighbor_id", max_bucket_size, "lsh_topk"
        )
    if probe_hamming > 0:
        masks = [0]
        for h in range(1, probe_hamming + 1):
            for bits in itertools.combinations(range(n_planes), h):
                masks.append(sum(1 << b for b in bits))
        qsig = qsig.withColumn(
            "bucket",
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
            ),
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).join(csig, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    ).join(qsig, "query_id")
    pairs = (
        q.join(c, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (
        _norm(F.col("_qv")) * _norm(F.col("_cv"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the
    other classic ANN scale path next to LSH:

    1. TRAIN a coarse quantizer: spherical k-means over L2-normalized
       vectors (Spark ML KMeans, distributed Lloyd iterations, fixed
       seed). The codebook is `n_centroids` rows — driver-tiny.
    2. ASSIGN every corpus vector to its nearest centroid (one
       model.transform — JVM-side) => the inverted lists, physically
       a `centroid` column the bucket join shuffles on.
    3. PROBE: each query scores all centroids (codebook broadcast as
       a literal array — no join, pure column math) and keeps its
       `n_probe` closest lists; exact cosine + window top-k inside
       the probed lists only.

    Scale shape: the expensive pass is one shuffle keyed by centroid
    id; per-list work is bounded by list size x n_probe, and skewed
    lists are AQE-split. recall rises with n_probe (probe all lists
    == exact search). ``max_bucket_size`` additionally caps any
    inverted list that k-means leaves degenerate (all data in one
    cluster) by deterministic hash-thinning — see lsh_topk; logged,
    never silent; None disables.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    unit = F.transform(
        F.col(vec_col), lambda x: x.cast("double") / _norm(F.col(vec_col))
    )
    c_norm = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        array_to_vector(unit).alias("_feat"),
    )
    km = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter,
        featuresCol="_feat", predictionCol="centroid",
    )
    model = km.fit(c_norm)
    inv = model.transform(c_norm).select("neighbor_id", "_cv", "centroid")
    if max_bucket_size is not None:
        inv = _thin_hot_buckets(
            inv, ["centroid"], "neighbor_id", max_bucket_size, "ivf_topk"
        )

    centers = [list(c) for c in model.clusterCenters()]
    codebook = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centers]
    )
    qu = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        unit.alias("_qu"),
    )
    # per-query centroid scores: dot(unit query, centroid c) for all c,
    # ranked descending; keep the n_probe best — all inside one row,
    # no join against the codebook
    scored = qu.withColumn(
        "_probes",
        F.slice(
            F.transform(
                F.array_sort(
                    F.transform(
                        codebook,
                        lambda cv, i: F.struct(
                            (-F.aggregate(
                                F.zip_with(F.col("_qu"), cv, lambda a, b: a * b),
                                F.lit(0.0),
                                lambda acc, x: acc + x,
                            )).alias("negdot"),
                            i.alias("cid"),
                        ),
                    )
                ),
                lambda s: s["cid"],
            ),
            1,
            n_probe,
        ),
    )
    probes = scored.select(
        "query_id", "_qv", F.explode("_probes").alias("centroid")
    )
    pairs = probes.join(inv, "centroid").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    sim = _dot(F.col("_qv"), F.col("_cv")) / (
        _norm(F.col("_qv")) * _norm(F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    # no dropDuplicates: every corpus vector lives in exactly ONE
    # inverted list and probed centroid ids are distinct, so
    # (query_id, neighbor_id) pairs are unique by construction —
    # dedup here would be a full extra shuffle for nothing
    return (
        pairs.withColumn("cosine", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def cosine_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lcg",
) -> DataFrame:
    """(id_a, id_b, cosine) — near-dup pairs above threshold, LSH-blocked."""
    sig = _table_signatures(
        df, dim, n_planes, n_tables, seed, id_col, vec_col, method, "_id"
    )
    v = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")).join(sig, "_id")
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "table", "bucket")
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "table", "bucket")
    pairs = (
        a.join(b, ["table", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    return (
        pairs.withColumn("cosine", F.round(sim, 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _dist2(a: Column, b: Column) -> Column:
    """Squared L2 distance — left-to-right float64 fold (identical
    sequential expression in the SQL oracle, so bit-reproducible)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic exact Lloyd k-means over an embedding column ->
    (vec_id, cluster, dist2) — the corpus-curation clustering pass
    (SemDeDup-style cluster-then-dedup, IVF codebook training) with a
    fully value-exact ANSI-SQL mirror, unlike Spark ML's sampled init.

    Determinism contract: init centroids are the vectors of the k
    smallest ids; components quantize to 6 dp doubles up front;
    per-centroid distances are sequential float64 folds (same
    expression in SQL); centroid means sum components as
    DECIMAL(18,6) (exact, order-independent) and re-round to 6 dp;
    argmin ties break by cluster id. Every step is reproducible at
    any parallelism and in the DuckDB oracle. An empty cluster keeps
    its previous centroid.

    100-TB shape: one assignment pass per iteration is a pure
    column-expression scan (k in-row folds, no join — the codebook
    rides in the plan as literals, exactly how the IVF probe
    broadcasts its codebook); the means are one posexplode +
    map-side-combining groupBy on (cluster, dim) — partials bounded
    by k x dim per partition regardless of row count. Driver holds
    only the k x dim codebook between iterations.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    q = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double"), 6)
        ).alias("v"),
    ).persist()
    init = q.orderBy("vec_id").limit(k).collect()
    cents: list[tuple[int, list[float]]] = [
        (i, list(row["v"])) for i, row in enumerate(init)
    ]
    assign = None
    for it in range(iterations):
        structs = [
            F.struct(
                _dist2(
                    F.col("v"), F.array(*[F.lit(float(c)) for c in vec])
                ).alias("d"),
                F.lit(cid).cast("int").alias("c"),
            )
            for cid, vec in cents
        ]
        assign = q.select(
            "vec_id", "v", F.array_min(F.array(*structs)).alias("_m")
        ).select(
            "vec_id",
            "v",
            F.col("_m.c").alias("cluster"),
            F.col("_m.d").alias("dist2"),
        )
        if it < iterations - 1:
            comp = assign.select(
                "cluster", F.posexplode("v").alias("i", "x")
            )
            means = comp.groupBy("cluster", "i").agg(
                F.round(
                    F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1)).cast("double"),
                    6,
                ).alias("m")
            )
            rows = (
                means.groupBy("cluster")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("i", "m"))
                    ).alias("a")
                )
                .collect()
            )  # k x dim codebook — bounded, driver-side by design
            new = {r["cluster"]: [s["m"] for s in r["a"]] for r in rows}
            cents = [(cid, new.get(cid, vec)) for cid, vec in cents]
    # q stays persisted: the returned plan still reads it (same
    # keep-cache-alive rule as verify_candidates' shingle cache)
    return assign.select(
        "vec_id", "cluster", F.round(F.col("dist2"), 6).alias("dist2")
    )


def semantic_dedup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lcg",
) -> DataFrame:
    """(vec_id, cluster_id, cluster_size, is_representative) —
    SemDeDup-style semantic deduplication of an embedding corpus
    (Abbas et al. 2023, arXiv:2303.09540): near-duplicate pairs by
    embedding cosine >= threshold (LSH-blocked, never all-pairs) ->
    connected components over the near-dup graph -> one
    representative (min id) kept per semantic cluster. Items with no
    near-dup form singleton clusters and keep themselves; downstream
    filters ``is_representative`` to drop semantic duplicates.

    The embedding-space analog of :func:`pipeline.dedup.dedup_clusters`
    (which blocks on MinHash of the raw text): same cluster/keep
    contract, different similarity channel, so a curation pipeline can
    run both and intersect the keep sets.

    100-TB shape: candidate pairs stay bucketed per (table, bucket)
    hyperplane signature — one shuffle keyed by bucket; the component
    sweep is WCC's min-label propagation with pointer jumping, whose
    round count is ~log2 of the near-dup-graph diameter (semantic-dup
    clusters are dense blobs, not long chains).
    """
    from graph_data_science_spark.algorithms.wcc import wcc
    from graph_data_science_spark.catalog import Graph

    spark = df.sparkSession
    pairs = cosine_near_duplicates(
        df, dim, threshold, n_planes, n_tables, seed, id_col, vec_col, method
    )
    g = Graph(
        name="semantic_dedup",
        edges=pairs.select(
            F.col("id_a").alias("src"),
            F.col("id_b").alias("dst"),
            F.lit(1.0).alias("weight"),
        ),
    )
    comp = wcc(spark, g).state.select(
        F.col("id").alias(id_col), F.col("component")
    )
    out = (
        df.select(F.col(id_col))
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_id"),
        )
    )
    sizes = out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return out.join(sizes, "cluster_id").select(
        id_col,
        "cluster_id",
        "cluster_size",
        # WCC component id = min vertex id in the component, so the
        # keep test is a column compare — no extra aggregation
        (F.col(id_col) == F.col("cluster_id")).alias("is_representative"),
    )


def jl_project(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection -> (vec_id,
    proj_0..proj_{out_dim-1}): y_j = (1/sqrt(out_dim)) * sum_i x_i *
    s_ij with s_ij in {-1, +1} (Achlioptas 2003 — the database-
    friendly JL transform: sign matrices preserve pairwise distances
    within (1 +- eps) at out_dim = O(ln n / eps^2), no Gaussians
    needed).

    The embedding-compression step of a 100-TB pipeline: 64-dim
    float32 -> out_dim doubles before an ANN index halves index build
    cost with bounded recall loss.

    Determinism/portability: signs come from the same closed-form
    2^31 LCG as the LSH hyperplanes (``lcg_plane`` sign bit), embedded
    as plan literals; each output is a left-to-right float64 fold, so
    an ANSI-SQL oracle with the same literal sign lists reproduces
    every value bit-for-bit. Pure JVM column exprs — codegen'd, no
    shuffle: the projection runs at scan speed.
    """
    if out_dim < 1:
        raise ValueError("out_dim must be >= 1")
    from graph_data_science_spark.util import widen_scan

    df = widen_scan(df)  # out_dim x in_dim fused multiply-adds per row
    inv = 1.0 / float(out_dim) ** 0.5
    cols = [F.col(id_col).alias("vec_id")]
    for j in range(out_dim):
        signs = jl_signs(j, in_dim, seed)
        w = F.array(*[F.lit(s) for s in signs])
        cols.append(
            F.round(_dot(F.col(vec_col), w) * F.lit(inv), 6).alias(f"proj_{j}")
        )
    return df.select(*cols)


def jl_signs(row: int, dim: int, seed: int = 42) -> list[float]:
    """The +-1.0 sign row for jl_project — sign bit of the lcg_plane
    weight, exposed so oracles/tests embed the identical literals."""
    return [1.0 if x > 0 else -1.0 for x in lcg_plane(row, dim, seed)]


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization of an embedding
    column -> (id, scale, q_csv, mse).

    The storage-compression step of a 100-TB embedding pipeline:
    scale = max|x| / qmax (qmax = 2^(bits-1) - 1, e.g. 127 for int8),
    q_i = clamp(round(x_i / scale), -qmax, qmax). `q_csv` is the
    quantized vector as a comma-joined string (engine-portable value
    representation), `mse` the reconstruction error
    mean((x - q*scale)^2), accumulated left-to-right in float64 so
    the DuckDB oracle reproduces it bit-for-bit. Zero vectors get
    scale 1.0 and all-zero codes. Pure JVM array exprs — codegen'd,
    no Python, no shuffle.
    """
    if not 2 <= bits <= 16:
        raise ValueError("bits must be in [2, 16]")
    qmax = float(2 ** (bits - 1) - 1)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(max_abs > 0, max_abs / F.lit(qmax)).otherwise(F.lit(1.0))
    q = F.transform(
        v,
        lambda x: F.least(
            F.greatest(F.round(x / scale, 0), F.lit(-qmax)), F.lit(qmax)
        ).cast("int"),
    )
    err = F.zip_with(
        v,
        q,
        lambda x, qi: (x - qi.cast("double") * scale)
        * (x - qi.cast("double") * scale),
    )
    mse = F.when(
        F.size(v) > 0,
        F.aggregate(err, F.lit(0.0), lambda acc, e: acc + e) / F.size(v),
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.round(scale, 8).alias("scale"),
        F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))).alias("q_csv"),
        F.round(mse, 10).alias("mse"),
    )


def hard_negatives(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    metric: str = "cosine",
) -> DataFrame:
    """Contrastive-training hard-negative mining -> (query_id,
    neighbor_id, query_label, neighbor_label, similarity, rank): for
    every vector, the top-k most-similar vectors with a DIFFERENT
    label — the standard negative-selection recipe for embedding /
    retrieval training (high-similarity, wrong-class examples carry
    the gradient signal).

    Exact brute force under the alpha metric kernels (cosine /
    pearson / euclidean), ties broken by ascending neighbor id. The
    corpus side is broadcast when small; at web scale block the pair
    stage with ``lsh_topk``/``ivf_topk`` buckets first and apply the
    same label-inequality predicate inside each bucket.
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {sorted(_METRICS)}, got {metric!r}")
    from graph_data_science_spark.util import widen_scan

    q = widen_scan(df).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col(label_col).alias("query_label"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col(label_col).alias("neighbor_label"),
    )
    pairs = q.crossJoin(c).where(
        (F.col("query_id") != F.col("neighbor_id"))
        & (~F.col("query_label").eqNullSafe(F.col("neighbor_label")))
    )
    from pyspark.sql import Window

    sim = _METRICS[metric](F.col("_qv"), F.col("_cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("similarity"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("similarity", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "query_label",
            "neighbor_label",
            F.round("similarity", 6).alias("similarity"),
            "rank",
        )
    )


def knn_label_agreement(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    metric: str = "cosine",
) -> DataFrame:
    """Label-noise detection by neighborhood agreement -> (vec_id,
    label, k_used, n_agree, agreement): for each vector, the fraction
    of its k nearest neighbors (by the chosen metric, ties by
    ascending id) sharing its label. The confident-learning-style
    screen for mislabeled training examples — rows with agreement
    near 0 sit inside a different class's cluster and are the first
    candidates for relabel/drop.

    Exact brute-force baseline (same envelope as similarity_topk);
    at web scale run it over ``lsh_topk``/``ivf_topk`` candidates
    instead. k_used < k only when fewer than k other vectors exist.
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {sorted(_METRICS)}, got {metric!r}")
    from graph_data_science_spark.util import widen_scan

    q = widen_scan(df).select(
        F.col(id_col).alias("_qid"),
        F.col(vec_col).alias("_qv"),
        F.col(label_col).alias("label"),
    )
    c = df.select(
        F.col(id_col).alias("_nid"),
        F.col(vec_col).alias("_cv"),
        F.col(label_col).alias("_nl"),
    )
    sim = _METRICS[metric](F.col("_qv"), F.col("_cv"))
    from pyspark.sql import Window

    w = Window.partitionBy("_qid").orderBy(F.desc("_s"), F.asc("_nid"))
    topk = (
        q.crossJoin(c)
        .where(F.col("_qid") != F.col("_nid"))
        .withColumn("_s", sim)
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
    )
    return (
        topk.groupBy(F.col("_qid").alias(id_col), "label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_used"),
            F.sum(
                F.when(F.col("_nl").eqNullSafe(F.col("label")), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_agree"),
        )
        .withColumn(
            "agreement",
            F.round(
                F.col("n_agree").cast("double") / F.col("k_used").cast("double"),
                6,
            ),
        )
    )
