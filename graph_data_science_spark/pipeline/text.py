"""Text analysis kernels for training-data pipelines.

All pure JVM-side column expressions (whole-stage codegen, no
Python in the hot path): token counting, quality scoring, n-gram
language id, rolling document fingerprints. Deterministic and
SQL-expressible so every operator has a DuckDB oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic — deliberately small and hardcoded so the oracle SQL can
# replicate the exact decision function
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "es"],
}

_EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties dropped — JVM-side array expr."""
    return F.filter(F.split(text, r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


#: GPT-2-style pre-tokenizer pattern WITHOUT the lookahead clauses
#: (RE2-compatible so the DuckDB oracle can reproduce it): English
#: contraction suffixes, optional-space letter runs, optional-space
#: digit runs, optional-space punctuation runs. This is the standard
#: first pass of byte-pair encoding — counts track BPE token counts
#: closely enough for pipeline budgeting without shipping a merges
#: table.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count — size of the pre-tokenizer match list.
    Pure JVM regexp (codegen'd), no Python in the path."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def add_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(…, n_tokens, n_chars_measured, avg_token_len)."""
    t = tokens(F.col(text_col))
    return df.withColumn("n_tokens", F.size(t)).withColumn(
        "n_chars_measured", F.length(F.col(text_col))
    ).withColumn(
        "avg_token_len",
        F.round(
            F.when(
                F.size(t) > 0,
                F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)).cast(
                    "double"
                )
                / F.size(t),
            ).otherwise(F.lit(0.0)),
            4,
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic doc-quality features + composite score.

    Features: length band, alpha ratio, punctuation density, English
    stopword ratio. The composite is a fixed linear blend rounded to
    4 decimals — deterministic, SQL-replicable.
    """
    text = F.col(text_col)
    length = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    toks = tokens(F.lower(text))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(_EN_STOPWORDS)))
    n_toks = F.size(toks)
    alpha_ratio = F.when(length > 0, alpha.cast("double") / length).otherwise(0.0)
    punct_ratio = F.when(length > 0, punct.cast("double") / length).otherwise(0.0)
    stop_ratio = F.when(n_toks > 0, stop_hits.cast("double") / n_toks).otherwise(0.0)
    len_band = F.when((length >= 100) & (length <= 20000), 1.0).otherwise(0.0)
    score = (
        0.4 * alpha_ratio + 0.3 * stop_ratio + 0.2 * len_band - 0.1 * punct_ratio
    )
    return (
        df.withColumn("alpha_ratio", F.round(alpha_ratio, 4))
        .withColumn("punct_ratio", F.round(punct_ratio, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("quality_score", F.round(score, 4))
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language heuristic -> (…, lang_pred).

    Counts exact-token hits of each language's marker list; argmax
    with ties broken alphabetically; 'und' (undetermined) when no
    marker hits at all.
    """
    toks = tokens(F.lower(F.col(text_col)))
    hit_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        hits = F.size(F.filter(toks, lambda x: x.isin(markers)))
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax hits, tie -> alphabetically first = array order
    best = F.aggregate(
        F.array(*hit_cols),
        hit_cols[0],
        lambda acc, x: F.when(x["hits"] > acc["hits"], x).otherwise(acc),
    )
    return df.withColumn(
        "lang_pred", F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


#: PII patterns, applied in list order for redaction. RE2-compatible
#: (no lookarounds, ASCII \d / \b) so the DuckDB oracle reproduces
#: match-for-match. SSN before phone: the phone pattern's digit-group
#: shape (3-3-4 with separators) can't match an already-redacted SSN,
#: but keeping a fixed order makes the sequential-replace semantics
#: explicit and oracle-replicable.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"(?:\+?\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex PII detection + redaction -> (…, n_<kind>…, redacted).

    Per-kind match counts are taken on the ORIGINAL text (each pattern
    independent, non-overlapping left-to-right matches); `redacted`
    applies the replacements sequentially in PII_PATTERNS order. Pure
    JVM regexp (whole-stage codegen), no Python in the path — the
    standard pre-training scrub pass. Patterns are deliberately
    lookaround-free so the same strings run under Java regex (Spark)
    and RE2 (DuckDB oracle) with identical match sets.
    """
    text = F.col(text_col)
    out = df
    for kind, pat, _ in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", F.regexp_count(text, F.lit(pat)))
    red = text
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return out.withColumn("redacted", red)


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition features per document.

    (id, n_words, distinct_word_ratio, top_word_frac, top_bigram_frac):
    the fraction of tokens that are distinct, the coverage of the most
    frequent token, and the coverage of the most frequent word bigram
    (count / (n_words - 1)) — the core repetition signals of the
    Gopher quality rules (Rae et al. 2021 §A1.1). Zero-token docs get
    0.0 ratios; single-token docs get top_bigram_frac 0.0.

    Scale shape: explode -> two-level groupBy (map-side partial agg)
    rather than per-row O(distinct x tokens) array scans, so very long
    documents cost O(tokens) and the shuffle keys on (id, word) — no
    driver-side work, no Python.
    """
    from graph_data_science_spark.util import widen_scan

    toks = tokens(F.col(text_col))
    t = widen_scan(df).select(F.col(id_col), toks.alias("_toks"))
    words = t.select(id_col, F.explode("_toks").alias("_w"))
    word_agg = (
        words.groupBy(id_col, "_w")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("n_words"),
            F.count("*").alias("_distinct"),
            F.max("_c").alias("_top_w"),
        )
    )
    bigrams = t.select(
        id_col,
        F.explode(
            F.when(
                F.size("_toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("_toks", i), F.element_at("_toks", i + 1)
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_b"),
    )
    bigram_agg = (
        bigrams.groupBy(id_col, "_b")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top_b"))
    )
    spine = df.select(id_col)
    joined = spine.join(word_agg, id_col, "left").join(bigram_agg, id_col, "left")
    n_words = F.coalesce(F.col("n_words"), F.lit(0))
    return joined.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(
            F.when(n_words > 0, F.col("_distinct").cast("double") / n_words).otherwise(
                0.0
            ),
            4,
        ).alias("distinct_word_ratio"),
        F.round(
            F.when(n_words > 0, F.col("_top_w").cast("double") / n_words).otherwise(
                0.0
            ),
            4,
        ).alias("top_word_frac"),
        F.round(
            F.when(
                n_words >= 2,
                F.coalesce(F.col("_top_b"), F.lit(0)).cast("double") / (n_words - 1),
            ).otherwise(0.0),
            4,
        ).alias("top_bigram_frac"),
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token windows ->
    (id, chunk_idx, n_chunk_tokens, chunk_text).

    Chunk k covers tokens [k*stride+1, k*stride+max_tokens] (1-based,
    stride = max_tokens - overlap); the last chunk is the first one
    whose window reaches the end of the document, so every token lands
    in >=1 chunk and consecutive chunks share exactly `overlap` tokens
    (except a shorter final chunk). n_chunks is pure integer
    arithmetic — ((n - max_tokens + stride - 1) / stride) + 1 when the
    doc overflows one window — so the DuckDB oracle matches exactly.
    Zero-token docs produce zero chunks. All array exprs + one explode:
    JVM-side, codegen'd, and the explode fan-out keeps rows ~max_tokens
    sized regardless of input document length (the point at 100 TB:
    downstream shuffles see bounded row widths).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must be in [0, max_tokens)")
    stride = max_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.when(n <= max_tokens, F.lit(1)).otherwise(
            ((n - max_tokens + stride - 1) / stride).cast("int") + 1
        )
    )
    t = df.select(F.col(id_col), toks.alias("_toks"), n_chunks.alias("_nc"))
    chunk = t.select(
        id_col,
        F.explode(
            F.when(
                F.col("_nc") > 0, F.sequence(F.lit(0), F.col("_nc") - 1)
            ).otherwise(F.array().cast("array<int>"))
        ).alias("chunk_idx"),
        F.col("_toks"),
    )
    window = F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, max_tokens)
    return chunk.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(window).alias("n_chunk_tokens"),
        F.concat_ws(" ", window).alias("chunk_text"),
    )


def corpus_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 2000,
    min_alpha_ratio: float = 0.5,
    min_distinct_ratio: float = 0.3,
    min_stopword_hits: int = 2,
    mean_word_len_range: tuple[float, float] = (2.0, 12.0),
) -> DataFrame:
    """Gopher/C4-style heuristic corpus filter -> (doc_id, n_tokens,
    keep, reasons): apply the standard pretraining keep/drop rules and
    report every violated rule, not just the verdict.

    Rules (each a reason tag when violated): too_short / too_long
    (token-count band), low_alpha (alphabetic-character ratio),
    repetitive (distinct-token ratio — the cheap Gopher repetition
    gate; repetition_stats has the full top-k coverage variants),
    low_stopword (fewer than ``min_stopword_hits`` hits of the
    10-word English stopword list — Gopher's >=2-stopwords rule),
    bad_word_len (mean non-space word length outside the given band).
    ``reasons`` is a comma-joined string in fixed rule order, so the
    output is value-exact in SQL.

    100-TB shape: pure JVM column expressions fused into the scan
    (whole-stage codegen, no shuffle, no Python) — the filter runs at
    I/O speed and Catalyst pushes upstream column pruning through it.
    """
    lo, hi = mean_word_len_range
    text = F.col(text_col)
    toks = tokens(F.lower(text))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    length = F.length(text)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(_EN_STOPWORDS)))
    nonspace = F.length(F.regexp_replace(text, r"\s", ""))
    mean_wl = F.when(n > 0, nonspace.cast("double") / n.cast("double"))
    alpha_ratio = F.when(length > 0, alpha.cast("double") / length).otherwise(0.0)
    distinct_ratio = F.when(n > 0, nd.cast("double") / n.cast("double")).otherwise(
        0.0
    )
    rules = [
        ("too_short", n < min_tokens),
        ("too_long", n > max_tokens),
        ("low_alpha", alpha_ratio < min_alpha_ratio),
        ("repetitive", distinct_ratio < min_distinct_ratio),
        ("low_stopword", stop_hits < min_stopword_hits),
        ("bad_word_len", F.coalesce((mean_wl < lo) | (mean_wl > hi), F.lit(True))),
    ]
    reasons = F.array_join(
        F.filter(
            F.array(
                *[
                    F.when(cond, F.lit(tag)).otherwise(F.lit(None).cast("string"))
                    for tag, cond in rules
                ]
            ),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy next-fit packing of documents into fixed token-budget
    training sequences -> (doc_id, shard, bin_idx, n_tokens).

    The sequence-assembly pass of a pretraining pipeline: documents
    are dealt into ``n_shards`` independent shards (``pmod(doc_id,
    n_shards)`` — deterministic, so the SQL oracle reproduces the
    exact assignment), and within each shard, in doc_id order, each
    document joins the current bin if it still fits (``fill + w <=
    budget``) else opens the next bin. A document longer than the
    budget gets a bin of its own (standard practice; pre-split such
    docs with chunk_documents if that is unwanted).

    100-TB shape: the next-fit recurrence is inherently sequential, so
    it runs as ONE applyInPandas pass per shard over numpy arrays
    (Arrow batches, no per-row Python serialization); token counting
    stays JVM-side before the shuffle, so the exchange carries only
    (doc_id, shard, n_tokens). Shards bound the sequential extent AND
    the per-task memory (applyInPandas materializes one group): at
    100 TB set n_shards to the output training-shard count (thousands),
    so each task packs one bounded shard independently.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    import numpy as np
    import pandas as pd

    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        # null text -> 0 tokens (a NaN would poison the fill recurrence)
        F.coalesce(token_count(F.col(text_col)), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        w = pdf["n_tokens"].to_numpy()
        bins = np.zeros(len(w), dtype=np.int64)
        fill, b = 0, 0
        for i, x in enumerate(w):
            if i > 0 and fill + x > budget:
                b += 1
                fill = 0
            fill += x
            bins[i] = b
        pdf["bin_idx"] = bins
        return pdf[["doc_id", "shard", "bin_idx", "n_tokens"]]

    return base.groupBy("shard").applyInPandas(
        _pack, "doc_id long, shard int, bin_idx long, n_tokens long"
    )


def fingerprint(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """(…, fingerprint) — min md5 over word n-gram shingles.

    A deterministic rolling-hash style document fingerprint: identical
    for near-identical docs only when they share their minimal
    shingle; used as a cheap pre-cluster key.
    """
    from graph_data_science_spark.util import widen_scan

    df = widen_scan(df)  # one md5 per shingle — kernel-bound, not scan-bound
    toks = tokens(F.col(text_col))
    n_sh = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))),
    )
    return df.withColumn(
        "fingerprint",
        F.when(F.size(toks) >= n, F.array_min(shingles)).otherwise(
            F.md5(F.concat_ws(" ", toks))
        ),
    )


def tfidf_keywords(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """Top-k keywords per document by smoothed TF-IDF ->
    (id, rank, keyword, tf, score).

    score = tf * (ln((N + 1) / (df + 1)) + 1) with N = corpus size and
    df = number of docs containing the word (sklearn's smooth_idf
    formula); ties break on the lexicographically smaller word.

    Scale shape: explode -> (id, word) count (map-side partial agg),
    document frequencies as ONE word-keyed aggregate broadcast back
    onto the term table (the vocabulary is tiny relative to the
    corpus), top-k via a per-doc window — no global sort, no Python.
    """
    from graph_data_science_spark.util import widen_scan

    toks = tokens(F.lower(F.col(text_col)))
    terms = (
        widen_scan(df).select(F.col(id_col), F.explode(toks).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("tf"))
        # read twice (scores + doc frequencies) with DIFFERENT shuffle
        # keys, so no exchange reuse — persist to tokenize the corpus
        # once (MEMORY_AND_DISK default spills rather than recomputing
        # the full explode at scale)
        .persist()
    )
    doc_freq = terms.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        terms.join(F.broadcast(doc_freq), "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs").cast("double") + 1.0)
                        / (F.col("df").cast("double") + 1.0)
                    )
                    + 1.0
                ),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("word").alias("keyword"),
            F.col("tf").cast("long").alias("tf"),
            "score",
        )
    )


def vocab_coverage(
    df: DataFrame, text_col: str = "text", top_n: int = 100
) -> DataFrame:
    """(rank, token, n, share, cum_share) — the corpus's top-``top_n``
    vocabulary with cumulative coverage, the heavy-hitters pass of
    tokenizer/vocabulary construction (how much of the token mass do
    the first k vocab entries cover?).

    Ties break by token ascending, so ranks are deterministic. Shares
    divide exact integer counts, so values are parallelism-
    independent.

    100-TB shape: token counting is ONE map-side-combining groupBy
    over the exploded tokens; the global top-N is a distributed
    TakeOrdered (per-partition top-N, then merge — the full vocabulary
    is never sorted or collected); rank/cumulative windows run on the
    N surviving rows only. The corpus total rides along as a
    broadcast scalar, not a driver round-trip.
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("_tot"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(top_n)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    cum = Window.orderBy(F.desc("n"), F.asc("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "n",
            F.round(F.col("n").cast("double") / F.col("_tot"), 6).alias("share"),
            F.round(
                F.sum("n").over(cum).cast("double") / F.col("_tot"), 6
            ).alias("cum_share"),
        )
    )


def corpus_stats(
    df: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-group corpus rollup -> (group, n_docs, total_tokens,
    avg_tokens, p50_tokens, p90_tokens, p99_tokens).

    The "what's in this corpus" report of a training pipeline: doc
    counts, token mass, and the token-length distribution per
    language/source/domain. Percentiles are EXACT interpolated
    (percentile_cont semantics, matching DuckDB's quantile_cont
    bit-for-bit) so the oracle is value-identical; at 100 TB swap
    `F.percentile` for `F.percentile_approx` — same plan shape, one
    partial+final groupBy either way.
    """
    n = token_count(F.col(text_col))
    t = df.select(F.col(group_col), n.alias("_n"))
    return (
        t.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n").cast("long").alias("total_tokens"),
            F.round(
                F.sum("_n").cast("double") / F.count("*").cast("double"), 4
            ).alias("avg_tokens"),
            F.round(F.percentile("_n", F.lit(0.5)), 4).alias("p50_tokens"),
            F.round(F.percentile("_n", F.lit(0.9)), 4).alias("p90_tokens"),
            F.round(F.percentile("_n", F.lit(0.99)), 4).alias("p99_tokens"),
        )
        .withColumn("n_docs", F.col("n_docs").cast("long"))
    )


def lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Corpus-trained bigram-LM quality scoring -> (id, n_bigrams,
    avg_neg_logprob, perplexity), one row per document with >= 2
    tokens.

    The CCNet-style quality filter: train a bigram language model on
    the corpus itself, then score every document by how predictable
    it is under that model — boilerplate and templated spam score low
    perplexity, lorem-ipsum noise scores high, and the middle band is
    what you keep. The model is add-alpha smoothed MLE:

        p(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 .) + alpha * V)

    with c(w1 .) the count of w1 in bigram-first position and V the
    corpus unigram vocabulary size, so probabilities per history sum
    to 1 and alpha=1 keeps every ratio a ratio of integers.

    Determinism: each bigram's -ln p term is rounded to 9 dp and
    summed as DECIMAL (exact, order-independent), so the per-doc
    average is bit-identical at any parallelism and reproducible in
    ANSI SQL; avg_neg_logprob rounds to 6 dp and perplexity =
    exp(avg) to 6 dp.

    100-TB shape: two map-side-combining groupBys build the model
    (bigram counts keyed by the bigram, history counts keyed by the
    first word); scoring is one shuffle join of the exploded corpus
    against the model on the bigram key — AQE broadcasts the model
    when the vocabulary is small, falls back to a plain shuffle join
    when web-scale bigram types exceed memory. V rides along as a
    broadcast scalar. No Python in the hot path.
    """
    from graph_data_science_spark.util import widen_scan

    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    toks = tokens(F.col(text_col))
    base = widen_scan(df).select(F.col(id_col), toks.alias("_t"))
    # (id, w1, bigram) — one row per adjacent token pair
    big = base.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
    # read three ways (bigram counts, history counts, scoring) with
    # different shuffle keys — persist so the explode runs once
    big = big.persist()
    c_bg = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c_w1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    term = (
        big.join(c_bg, "bg")
        .join(c_w1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.round(
                -F.log(
                    (F.col("c12").cast("double") + F.lit(float(alpha)))
                    / (
                        F.col("c1").cast("double")
                        + F.lit(float(alpha)) * F.col("v").cast("double")
                    )
                ),
                9,
            )
            .cast("decimal(18,9)")
            .alias("_nlp"),
        )
    )
    out = (
        term.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum("_nlp").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_neg_logprob"),
        )
        .withColumn(
            "perplexity", F.round(F.exp(F.col("avg_neg_logprob")), 6)
        )
    )
    return out


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cut_lo: float = 1.0 / 3.0,
    cut_hi: float = 2.0 / 3.0,
) -> DataFrame:
    """CCNet head/middle/tail corpus split -> (id, perplexity,
    bucket): score every document with the corpus-trained bigram LM
    (lm_perplexity) and bucket by perplexity terciles — 'head' is the
    most predictable third (templated/boilerplate-leaning), 'tail'
    the least (noise-leaning), 'middle' what CCNet-style pipelines
    keep or upsample.

    Cut points are EXACT interpolated percentiles of the rounded
    perplexities (percentile_cont semantics), so bucket assignment is
    parallelism-independent and SQL-reproducible. Documents with < 2
    tokens have no bigrams and are excluded (as in lm_perplexity).

    100-TB shape: everything lm_perplexity does, plus one two-scalar
    global aggregate broadcast back onto the scored table — no extra
    shuffle of the corpus. At extreme scale swap F.percentile for
    percentile_approx: bucket edges move within sketch error, the
    plan shape is unchanged.
    """
    if not 0.0 < cut_lo < cut_hi < 1.0:
        raise ValueError("need 0 < cut_lo < cut_hi < 1")
    scored = lm_perplexity(df, text_col=text_col, id_col=id_col)
    cuts = scored.agg(
        F.percentile("perplexity", F.lit(cut_lo)).alias("_lo"),
        F.percentile("perplexity", F.lit(cut_hi)).alias("_hi"),
    )
    return scored.crossJoin(F.broadcast(cuts)).select(
        F.col(id_col),
        "perplexity",
        F.when(F.col("perplexity") <= F.col("_lo"), F.lit("head"))
        .when(F.col("perplexity") <= F.col("_hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """(rank, pair, n) — corpus-wide adjacent character-pair
    frequencies within whitespace tokens, the inner kernel of BPE
    tokenizer training (each merge round picks argmax-count pair,
    re-segments, repeats; this operator is that count pass, the part
    that touches all 100 TB — the merge bookkeeping is O(vocab) on
    the driver).

    Ties break by pair ascending so ranks are deterministic. Counts
    are exact integers.

    100-TB shape: one generate (substring enumeration, pure JVM
    column exprs inside whole-stage codegen) feeding one
    map-side-combining groupBy keyed by the pair; the global top-N is
    a distributed TakeOrdered (per-partition top-N then merge — the
    pair table is never globally sorted); the rank window runs on N
    surviving rows only.
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    from pyspark.sql import Window

    from graph_data_science_spark.util import widen_scan

    tok = F.explode(tokens(F.col(text_col))).alias("tok")
    pairs = (
        widen_scan(df)
        .select(tok)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("tok") - 1, F.lit(1))),
                    lambda i: F.substring(F.col("tok"), i, F.lit(2)),
                )
            ).alias("pair")
        )
        .where(F.length("pair") == 2)
    )
    counts = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), F.asc("pair")).limit(top_n)
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "pair", "n"
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document character-level Shannon entropy -> (id, n_chars,
    n_distinct_chars, entropy): H = -Σ_c p_c ln p_c over the doc's
    character distribution. The compression-ratio quality signal —
    near-zero entropy flags repeated-character/padding junk, and
    anomalously high entropy flags binary-in-text or encoding noise;
    both tails are standard corpus-filter cuts.

    Determinism: each -p ln p term is a function of two integer
    counts, rounded to 9 dp and summed as DECIMAL (exact,
    order-independent); entropy rounds to 6 dp. Docs with no
    characters get entropy 0 with n_chars 0.

    100-TB shape: widen_scan + one (id, char)-keyed combining groupBy
    and one id-keyed groupBy — the character alphabet keeps the first
    aggregation's map-side combine effective regardless of doc size.
    """
    from graph_data_science_spark.util import widen_scan

    chars = widen_scan(df).select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
        ).alias("_c"),
    )
    cc = chars.groupBy(id_col, "_c").agg(F.count(F.lit(1)).alias("_n"))
    tot = cc.groupBy(id_col).agg(
        F.sum("_n").alias("_t"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
    )
    p = F.col("_n").cast("double") / F.col("_t").cast("double")
    term = (
        cc.join(tot, id_col)
        .select(
            id_col,
            F.col("_t"),
            F.col("n_distinct_chars"),
            F.round(-p * F.log(p), 9).cast("decimal(18,9)").alias("_h"),
        )
        .groupBy(id_col)
        .agg(
            F.max("_t").cast("long").alias("n_chars"),
            F.max("n_distinct_chars").alias("n_distinct_chars"),
            F.round(F.sum("_h").cast("double"), 6).alias("entropy"),
        )
    )
    return (
        df.select(id_col)
        .join(term, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
            F.coalesce("n_distinct_chars", F.lit(0))
            .cast("long")
            .alias("n_distinct_chars"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
    )


def corpus_divergence(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence between two corpora's unigram
    distributions -> ONE row (n_tokens_a, n_tokens_b, vocab_union,
    kl_a_m, kl_b_m, jsd). The distribution-shift monitor a streaming
    ingest pipeline runs between corpus snapshots (or between a new
    source and the existing mix): JSD near 0 = same distribution,
    ln 2 = disjoint vocabularies.

        JSD = 1/2 KL(P || M) + 1/2 KL(Q || M),  M = (P + Q) / 2

    computed term-exactly: p_w/m_w = 2·c_a(w)·T_b / (c_a(w)·T_b +
    c_b(w)·T_a) is a ratio of exact integers, each word's
    contribution is rounded to 9 dp and DECIMAL-summed. Tokens
    absent from one side contribute only to the other's KL term
    (0·ln 0 = 0 by continuity).

    100-TB shape: one combining token-count groupBy per corpus
    (vocab-bounded), one full outer join of the two count tables
    keyed by token, one scalar aggregate; nothing collected.
    """
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(F.col(text_col))).alias("_w"))
            .groupBy("_w")
            .agg(F.count(F.lit(1)).alias(name))
        )

    ca = counts(a, "_ca")
    cb = counts(b, "_cb")
    joined = (
        ca.join(cb, "_w", "full")
        .select(
            F.coalesce("_ca", F.lit(0)).cast("long").alias("_ca"),
            F.coalesce("_cb", F.lit(0)).cast("long").alias("_cb"),
        )
    )
    tot = joined.agg(
        F.sum("_ca").cast("long").alias("ta"),
        F.sum("_cb").cast("long").alias("tb"),
        F.count(F.lit(1)).cast("long").alias("vocab_union"),
    )
    w = joined.crossJoin(F.broadcast(tot))
    ca_tb = F.col("_ca").cast("double") * F.col("tb").cast("double")
    cb_ta = F.col("_cb").cast("double") * F.col("ta").cast("double")
    pa = F.col("_ca").cast("double") / F.col("ta").cast("double")
    pb = F.col("_cb").cast("double") / F.col("tb").cast("double")
    term_a = F.when(
        F.col("_ca") > 0,
        F.round(pa * F.log(F.lit(2.0) * ca_tb / (ca_tb + cb_ta)), 9),
    ).otherwise(F.lit(0.0))
    term_b = F.when(
        F.col("_cb") > 0,
        F.round(pb * F.log(F.lit(2.0) * cb_ta / (ca_tb + cb_ta)), 9),
    ).otherwise(F.lit(0.0))
    agg = w.agg(
        F.max("ta").alias("n_tokens_a"),
        F.max("tb").alias("n_tokens_b"),
        F.max("vocab_union").alias("vocab_union"),
        F.sum(term_a.cast("decimal(20,9)")).alias("_ka"),
        F.sum(term_b.cast("decimal(20,9)")).alias("_kb"),
    )
    return agg.select(
        "n_tokens_a",
        "n_tokens_b",
        "vocab_union",
        F.round(F.col("_ka").cast("double"), 6).alias("kl_a_m"),
        F.round(F.col("_kb").cast("double"), 6).alias("kl_b_m"),
        F.round(
            (F.col("_ka") + F.col("_kb")).cast("double") / F.lit(2.0), 6
        ).alias("jsd"),
    )


def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Corpus n-gram diversity -> ONE row (total_1, distinct_1,
    ratio_1, ..., total_3, distinct_3, ratio_3): distinct-over-total
    ratios for unigrams/bigrams/trigrams — the distinct-N metric
    (Li et al. 2016) that screens synthetic/templated corpora: low
    ratios flag mode collapse and boilerplate, ratios near 1 flag
    noise. Ratios round to 6 dp; 0 totals give NULL ratios.

    100-TB shape: one explode per n and one combining
    count/count_distinct aggregate (distinct via the standard
    two-phase expand); no joins, nothing collected.
    """
    toks = tokens(F.col(text_col))
    out = None
    for n in (1, 2, 3):
        if n == 1:
            g = toks
        else:
            # n-gram strings by joining n consecutive tokens; guard
            # short docs (sequence(1, 0) DESCENDS and slice rejects 0)
            idx = F.when(
                F.size(toks) >= n,
                F.sequence(F.lit(1), F.size(toks) - n + 1),
            ).otherwise(F.array().cast("array<int>"))
            g = F.transform(
                idx,
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        one = (
            df.select(F.explode(g).alias("_g"))
            .agg(
                F.count(F.lit(1)).cast("long").alias(f"total_{n}"),
                F.count_distinct("_g").cast("long").alias(f"distinct_{n}"),
            )
        )
        out = one if out is None else out.crossJoin(one)
    for n in (1, 2, 3):
        out = out.withColumn(
            f"ratio_{n}",
            F.when(
                F.col(f"total_{n}") > 0,
                F.round(
                    F.col(f"distinct_{n}").cast("double")
                    / F.col(f"total_{n}").cast("double"),
                    6,
                ),
            ),
        )
    return out.select(
        *[
            c
            for n in (1, 2, 3)
            for c in (f"total_{n}", f"distinct_{n}", f"ratio_{n}")
        ]
    )


def freq_spectrum(
    df: DataFrame,
    text_col: str = "text",
    max_freq: int = 20,
) -> DataFrame:
    """Word frequency-of-frequencies -> (freq, n_types): how many
    distinct tokens occur exactly `freq` times in the corpus, for
    freq 1..max_freq plus one overflow row (freq = -1) counting types
    above max_freq. The Good-Turing smoothing input and the quick
    Zipf sanity check (n_types should fall roughly as freq^-2).

    100-TB shape: one combining token-count groupBy (vocab-bounded)
    + one tiny freq-keyed groupBy; nothing collected.
    """
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return (
        counts.select(
            F.when(F.col("_c") <= max_freq, F.col("_c"))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("freq")
        )
        .groupBy("freq")
        .agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    )


@dataclass
class BpeTrainResult:
    """Learned merge table + final word-type segmentation."""

    merges: list  # [(left, right, count), ...] in merge order
    merge_table: DataFrame  # (merge_rank, left, right, n)
    word_symbols: DataFrame  # (word, cnt, symbols)


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> BpeTrainResult:
    """Byte-pair-encoding tokenizer training (Sennrich et al. 2016),
    the word-type formulation: ONE corpus-wide pass builds the
    (word, count) vocabulary table; every merge round then works on
    word TYPES (each weighted by its corpus count), never re-reading
    the corpus — the 100-TB pass happens exactly once.

    Per round (all JVM column expressions, no Python in the data
    path): adjacent-symbol pair counts via slice+zip explode, a
    TakeOrdered argmax (count desc, pair lexicographic asc — the
    deterministic tie-break mirrored by the SQL oracle), and the
    merge applied with a pure `F.aggregate` left-fold that replaces
    adjacent (left, right) with the fused symbol greedily
    left-to-right (classic BPE application order). The driver holds
    only the O(n_merges) merge table.

    Stops early when the best pair's count falls below
    ``min_pair_count`` (GDS has no BPE; this is pipeline territory —
    HuggingFace tokenizers' BPE trainer is the behavioral model).
    """
    from graph_data_science_spark.util import Truncator, widen_scan

    spark = df.sparkSession
    words = (
        widen_scan(df)
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    state = words.select(
        "word",
        "cnt",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.substring(F.col("word"), i, F.lit(1)),
        ).alias("symbols"),
    )
    tr = Truncator(spark, every=1)
    state = tr.cut(state)

    merges: list = []
    for _ in range(n_merges):
        sz = F.size("symbols")
        pairs = (
            state.where(sz >= 2)
            .select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.slice("symbols", 1, sz - 1).alias("a"),
                        F.slice(F.col("symbols"), 2, sz - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .select("cnt", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not best or best[0]["n"] < min_pair_count:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((a, b, n))
        fused = a + b
        merged = F.aggregate(
            "symbols",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        state = tr.cut(state.select("word", "cnt", merged.alias("symbols")))

    table = spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)] or [],
        "merge_rank int, left string, right string, n long",
    )
    # detach word_symbols from the Truncator scratch dir before
    # removing it, so the returned DF outlives the temp parquet
    state = state.localCheckpoint(eager=True)
    tr.close()
    return BpeTrainResult(merges=merges, merge_table=table, word_symbols=state)


def bpe_encode(
    df: DataFrame,
    trained: BpeTrainResult,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, n_bpe_tokens) — tokenize with the learned merge
    table by joining each document's words against the word-type
    segmentation ``bpe_train`` already produced (the corpus was the
    training corpus, so every word type is present — the classic
    train-then-encode-the-training-set pass of tokenizer pipelines).
    n_tokens = whitespace words, n_bpe_tokens = post-merge symbols.

    Scale: one explode + one hash join keyed by word type + one
    per-document sum — no re-derivation of merges, no per-row
    Python. Out-of-vocabulary words (when encoding a DIFFERENT
    corpus) fall back to character count, the merge-free
    segmentation."""
    words = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("word")
    )
    seg = trained.word_symbols.select(
        "word", F.size("symbols").alias("_n_sym")
    )
    return (
        words.join(seg, "word", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.coalesce(F.col("_n_sym"), F.length("word"))
            ).alias("n_bpe_tokens"),
        )
    )
