"""Text analysis kernels for training-data pipelines.

All pure JVM-side column expressions (whole-stage codegen, no
Python in the hot path): token counting, quality scoring, n-gram
language id, rolling document fingerprints. Deterministic and
SQL-expressible so every operator has a DuckDB oracle.
"""

from __future__ import annotations

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


def fingerprint(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """(…, fingerprint) — min md5 over word n-gram shingles.

    A deterministic rolling-hash style document fingerprint: identical
    for near-identical docs only when they share their minimal
    shingle; used as a cheap pre-cluster key.
    """
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
