"""Deduplication operators for web-scale corpora.

Five tiers, cheapest to richest, all deterministic:

* exact        — md5(text) group; keep the min doc_id per group.
* n-gram Jaccard — word n-gram shingle sets; pair Jaccard via a
                 shingle-join (candidate pairs share >= 1 shingle, so
                 disjoint docs never meet — no all-pairs blowup).
* MinHash+LSH  — H md5-derived min-hashes, banded; docs sharing a
                 band bucket are candidates; optional exact-Jaccard
                 verification of candidates.
* SimHash      — 64-bit token-hash majority fingerprint with banded
                 Hamming blocking (pandas-UDF kernel, Arrow batches).
* embedding cosine — near-duplicate pairs above a cosine threshold
                 (delegates to pipeline.ann kernels).

Scale notes: every operator is shuffle-bounded by (doc, shingle) or
(band, bucket) keys — no crossJoin anywhere. Stopword-like shingles
that would create quadratic buckets can be capped with
``max_bucket_size`` (drop pathological buckets, standard LSH
practice; the cap is logged, never silent).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.text import tokens


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, group_id, is_duplicate): group_id = min doc_id sharing
    identical text (by md5); is_duplicate marks non-representatives."""
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    groups = h.groupBy("_h").agg(F.min(id_col).alias("group_id"))
    return (
        h.join(groups, "_h")
        .select(
            F.col(id_col),
            "group_id",
            (F.col(id_col) != F.col("group_id")).alias("is_duplicate"),
        )
    )


def incremental_dedup(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingest-time dedup of a NEW batch against an existing corpus
    index -> (doc_id, is_new, is_batch_duplicate): the incremental
    form of exact_duplicates for a pipeline that ingests continuously
    and keeps a hash index (a table of md5 `h` values) of everything
    already accepted.

    is_new = the text's hash is absent from ``seen_hashes``;
    is_batch_duplicate = another doc with a smaller id in THIS batch
    has the same text (so exactly one row per novel text has
    is_new AND NOT is_batch_duplicate — the set to accept and append
    to the index).

    100-TB shape: one combining groupBy on the batch's hashes plus
    one left-semi-shaped join against the index keyed by the 16-byte
    hash (AQE broadcasts a small batch against a bucketed index, or
    shuffles both at comparable size — either way no row wider than
    (id, hash) moves). The index table can be bucketed by `h` so
    repeated ingests co-locate without reshuffling the index.
    """
    h = new_docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("h"))
    first = h.groupBy("h").agg(F.min(id_col).alias("_first"))
    seen = seen_hashes.select("h").distinct().withColumn("_seen", F.lit(True))
    return (
        h.join(first, "h")
        .join(seen, "h", "left")
        .select(
            F.col(id_col),
            F.col("_seen").isNull().alias("is_new"),
            (F.col(id_col) != F.col("_first")).alias("is_batch_duplicate"),
        )
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(doc_id, shingle) — distinct md5'd word n-grams per document.

    The input is widened to default parallelism first: the shingle
    explode + per-shingle hashing fused into the scan stage is the
    expensive pass of every dedup operator, and bytes-based input
    splits leave a few-MB corpus file on one core (util.widen_scan).
    """
    from graph_data_science_spark.util import widen_scan

    df = widen_scan(df)
    toks = tokens(F.col(text_col))
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
        ),
    ).otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_doc_freq: int | None = 100_000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with Jaccard >= threshold.

    Plan: shingle-set self-join on shingle -> per-pair intersection
    count -> |union| = |A|+|B|-|∩|. Only docs sharing a shingle ever
    pair up. The self-join is quadratic in the document frequency of
    the hottest shingle, so shingles appearing in more than
    ``max_shingle_doc_freq`` documents are dropped from the join
    (standard hot-key cap, same device as the minhash path's
    ``max_bucket_size``); the drop is logged, never silent. Doc sizes
    still count every shingle, so capped pairs only UNDER-estimate
    Jaccard (a stopword-shingle shared by >cap docs carries no
    near-dup signal anyway). ``None`` disables the cap.
    """
    sh = shingle_sets(df, text_col, id_col, n).persist()
    if max_shingle_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        hot = freq.where(F.col("_df") > max_shingle_doc_freq).persist()
        n_hot = hot.count()
        if n_hot:
            print(
                f"ngram_jaccard_pairs: dropping {n_hot} hot shingles "
                f"(doc freq > {max_shingle_doc_freq}) from the pair join"
            )
        join_sh = sh.join(hot, "shingle", "left_anti")
        hot.unpersist()
    else:
        join_sh = sh
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = join_sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = join_sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    n: int = 13,
    min_matched_ngrams: int = 1,
) -> DataFrame:
    """(doc_id, doc_ngrams, matched_ngrams, contamination,
    is_contaminated) — benchmark decontamination: flag training
    documents sharing word n-grams with an evaluation/benchmark set
    (the GPT-3-style 13-gram overlap filter; n configurable).

    contamination = matched_ngrams / doc_ngrams over the document's
    DISTINCT shingles; is_contaminated when matched_ngrams >=
    ``min_matched_ngrams``. Documents shorter than n tokens fall back
    to a whole-text shingle (same rule as :func:`shingle_sets`), so a
    short doc is contaminated only by exact text match.

    100-TB shape: the benchmark side is small by construction (eval
    sets, not corpora) — its distinct shingle set is broadcast, so
    the corpus is matched by a map-side semi-join; the only shuffled
    rows are the MATCHED shingles (groupBy doc_id) plus the per-doc
    size join. No corpus self-join anywhere.
    """
    toks = tokens(F.col(text_col))
    sh_arr = F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
            ),
        ).otherwise(F.array(F.md5(F.concat_ws(" ", toks))))
    )
    doc_tbl = docs.select(F.col(id_col).alias("doc_id"), sh_arr.alias("_sh"))
    # per-doc distinct-shingle count is row-local — no shuffle
    sizes = doc_tbl.select("doc_id", F.size("_sh").alias("doc_ngrams"))
    exploded = doc_tbl.select("doc_id", F.explode("_sh").alias("shingle"))
    bench_sh = (
        shingle_sets(
            benchmark,
            bench_text_col or text_col,
            bench_id_col or id_col,
            n,
        )
        .select("shingle")
        .distinct()
    )
    matched = (
        exploded.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("matched_ngrams"))
    )
    return (
        sizes.join(matched, "doc_id", "left")
        .na.fill({"matched_ngrams": 0})
        .select(
            "doc_id",
            "doc_ngrams",
            "matched_ngrams",
            F.round(
                F.col("matched_ngrams") / F.col("doc_ngrams").cast("double"), 6
            ).alias("contamination"),
            (F.col("matched_ngrams") >= F.lit(min_matched_ngrams)).alias(
                "is_contaminated"
            ),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(doc_id, sig array<string>) — sig[h] = min md5(h || '|' || shingle).

    md5 of a seeded shingle is a uniform permutation surrogate; the
    lexicographic min over hex strings is engine-independent (same
    result in Spark and any ANSI SQL oracle).
    """
    sh = shingle_sets(df, text_col, id_col, n)
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat(F.lit(f"{h}|"), F.col("shingle"))).alias(f"h{h}")
            for h in range(num_hashes)
        ],
    )
    agg = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{h}").alias(f"h{h}") for h in range(num_hashes)]
    )
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{h}") for h in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_bands) — candidate near-dup pairs sharing >= 1
    LSH band bucket; n_bands = how many buckets they co-occupy.

    bands * rows = num_hashes; a pair with Jaccard j collides in a
    band w.p. j^rows — the standard S-curve. Bucket key = md5 of the
    band's concatenated signature slice.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|", *[F.col("sig")[b * rows + r] for r in range(rows)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # the band table rides on the expensive shingle+minhash pass and
    # feeds BOTH self-join sides (plus the bucket-size filter): pin it
    # once instead of recomputing the signatures per subplan. Small —
    # `bands` rows per doc; lineage-truncated so the returned plan
    # stays O(1)
    band_rows = band_rows.localCheckpoint(eager=True)
    if max_bucket_size is not None:
        sizes = band_rows.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_n"))
        band_rows = band_rows.join(
            sizes.where(F.col("_n") <= max_bucket_size), ["band", "bucket"], "left_semi"
        )
    a = band_rows.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = band_rows.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size, is_representative) — the
    standard web-corpus fuzzy-dedup pipeline in one operator:
    MinHash-LSH candidate pairs -> connected components over the
    candidate graph -> min-doc_id representative per cluster.
    Documents with no candidate pair form singleton clusters and are
    their own representative; downstream keeps
    ``is_representative`` rows and drops the rest.

    100-TB shape: candidates stay banded/bucketed (no all-pairs);
    the component sweep is WCC's min-label propagation, whose round
    count is the candidate-graph diameter — near-dup clusters are
    short chains, not long paths.
    """
    from graph_data_science_spark.algorithms.wcc import wcc
    from graph_data_science_spark.catalog import Graph

    spark = df.sparkSession
    pairs = minhash_lsh_candidates(
        df, text_col, id_col, n, num_hashes, bands, max_bucket_size
    )
    g = Graph(
        name="dedup_clusters",
        edges=pairs.select(
            F.col("doc_a").alias("src"),
            F.col("doc_b").alias("dst"),
            F.lit(1.0).alias("weight"),
        ),
    )
    comp = wcc(spark, g).state.select(
        F.col("id").alias("doc_id"), F.col("component")
    )
    out = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        )
    )
    sizes = out.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return out.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        # WCC's component id = min vertex id, so the representative
        # test is a column compare, no extra aggregation
        (F.col("doc_id") == F.col("cluster_id")).alias("is_representative"),
    )


# ---------------------------------------------------------------- simhash


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash long) — 64-bit token-majority fingerprint.

    Kernel: Arrow-batched pandas UDF (no per-row Python at the Spark
    boundary; inside the batch it's vectorized numpy bit math over
    md5-derived token hashes).
    """
    from graph_data_science_spark.util import widen_scan

    tok_df = widen_scan(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).withColumn("tok_h", F.unhex(F.substring(F.md5("tok"), 1, 16)))

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                yield pd.DataFrame({"doc_id": [], "bit": [], "contrib": []})
                continue
            h = np.array(
                [int.from_bytes(x, "big") for x in pdf["tok_h"]], dtype=np.uint64
            )
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            contrib = np.where(bits == 1, 1, -1)
            out = pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), 64),
                    "bit": np.tile(np.arange(64), len(pdf)),
                    "contrib": contrib.reshape(-1),
                }
            )
            yield out.groupby(["doc_id", "bit"], as_index=False)["contrib"].sum()

    contribs = tok_df.mapInPandas(batch, "doc_id long, bit int, contrib long")
    bit_major = (
        contribs.groupBy("doc_id", "bit")
        .agg(F.sum("contrib").alias("c"))
        .withColumn("bitval", (F.col("c") > 0).cast("long"))
    )
    return bit_major.groupBy("doc_id").agg(
        F.sum(F.col("bitval") * F.expr("shiftleft(1L, bit)")).alias("simhash")
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs within Hamming distance via
    banded blocking: split the 64-bit fingerprint into ``bands``
    16-bit blocks; any pair within distance bands-1 shares an exact
    block (pigeonhole), so candidates = block-equality join."""
    sh = simhash(df, text_col, id_col).persist()
    width = 64 // bands
    blocks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("block"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.block").alias("block"))
    a = blocks.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "block")
    b = blocks.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "block")
    cand = (
        a.join(b, ["band", "block"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def verify_candidates(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """(doc_a, doc_b, jaccard, is_duplicate) — EXACT n-gram Jaccard
    for a candidate pair set (e.g. `minhash_lsh_candidates` output):
    the verify stage of the standard LSH -> verify fuzzy-dedup
    pipeline.

    Unlike `ngram_jaccard_pairs` (which joins the full shingle table
    against itself and is quadratic in hot-shingle doc frequency),
    this computes Jaccard ONLY for the supplied pairs: shingles are
    joined to the candidate list on each side and intersections
    counted per pair — cost O(|pairs| x shingles/doc), the 100-TB
    shape when candidates came from a banded/bucketed index. Pairs
    whose docs share no shingle verify at 0.0 (kept, flagged false),
    so the output has exactly one row per input pair.
    """
    sh = shingle_sets(df, text_col, id_col, n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_sz"))
    p = pairs.select("doc_a", "doc_b")
    inter = (
        p.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    out = (
        p.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("_sz", "_sa"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("_sz", "_sb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.coalesce(F.col("_inter"), F.lit(0)).cast("double")
                / (F.col("_sa") + F.col("_sb") - F.coalesce(F.col("_inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
        .withColumn("is_duplicate", F.col("jaccard") >= threshold)
    )
    # NOTE: sh stays persisted — the returned plan reads it three
    # times (sizes + both sides of the intersection join) and an
    # unpersist here would run BEFORE the caller's action, silently
    # discarding the cache (same convention as ngram_jaccard_pairs).
    return out


def dedup_spans(
    df: DataFrame,
    span_tokens: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_spans, n_spans_kept, deduped_text) — span-level
    exact dedup across the corpus (the window-hash approximation of
    suffix-array substring dedup, Lee et al. 2022): split every doc
    into NON-overlapping `span_tokens` windows, keep only the global
    FIRST occurrence of each distinct span (order: doc_id, position),
    and rebuild each document from its surviving spans in order.

    Catches copy-pasted passages shared across documents that
    doc-level dedup misses. Scale shape: one shuffle keyed by span
    hash for the first-occurrence window, one groupBy doc for the
    rebuild — no self-joins; span rows are bounded at ~span_tokens
    width regardless of document length.
    """
    from pyspark.sql import Window

    from graph_data_science_spark.pipeline.text import chunk_documents

    chunks = chunk_documents(
        df, max_tokens=span_tokens, overlap=0, text_col=text_col, id_col=id_col
    )
    w = Window.partitionBy(F.md5("chunk_text")).orderBy(id_col, "chunk_idx")
    marked = chunks.withColumn("_rn", F.row_number().over(w))
    rebuilt = (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_spans_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rn") == 1,
                                F.struct("chunk_idx", "chunk_text"),
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
            ).alias("deduped_text"),
        )
    )
    spine = df.select(F.col(id_col))
    return (
        spine.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.col("n_spans_kept"), F.lit(0))
            .cast("long")
            .alias("n_spans_kept"),
            F.coalesce(F.col("deduped_text"), F.lit("")).alias("deduped_text"),
        )
    )
