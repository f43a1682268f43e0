"""Model-based corpus filtering: hashed Naive-Bayes quality
classification and DSIR importance weighting.

No reference analog (GDS has no corpus tooling); both are the
standard published recipes for model-based training-data curation:

* ``nb_classifier`` — the fasttext-style linear quality filter used
  by GPT-3/CCNet-descended pipelines, here as a hashed-unigram
  multinomial Naive Bayes whose training IS counting, so the whole
  train+score pass is two combining groupBys plus one broadcast join
  (and is reproducible in ANSI SQL for the oracle gate).
* ``dsir_weights`` — Data Selection with Importance Resampling
  (Xie et al. 2023, arXiv:2302.03169): per-document importance
  log-weight ``Σ_f ln(p_target(f) / p_raw(f))`` under add-α smoothed
  hashed n-gram feature distributions; feed the weights into
  ``pipeline.sampling.weighted_sample`` / ``sample_token_budget``
  for the resampling step.

Determinism: every per-token term is a ratio of integer counts,
rounded to 9 dp and summed as DECIMAL (exact, order-independent, the
``lm_perplexity`` convention), so scores are bit-identical at any
parallelism and engine-portable. Token hashing is the repo's
md5-prefix idiom (``pipeline.sampling.group_split``): bucket =
int(first 8 hex chars of md5(token)) mod n_buckets — identical in
Spark and DuckDB.

100-TB shape: the model is at most ``n_buckets`` rows per class —
always broadcastable — so scoring is map-side; the only shuffles are
the count groupBys (combining, keyed by bucket) and the per-doc
score groupBy (keyed by id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.text import tokens
from graph_data_science_spark.util import widen_scan


def hash_bucket(tok: Column, n_buckets: int) -> Column:
    """int(first 8 md5 hex chars) mod n_buckets — engine-portable."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def _doc_buckets(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int, bigrams: bool
) -> DataFrame:
    """(id, bucket) — one row per token (and per bigram if asked)."""
    toks = tokens(F.lower(F.col(text_col)))
    base = widen_scan(df).select(F.col(id_col), toks.alias("_t"))
    feats = F.col("_t")
    if bigrams:
        pair = F.zip_with(
            F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
            F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        feats = F.concat(feats, pair)
    return base.select(
        id_col, F.explode(feats).alias("_f")
    ).select(id_col, hash_bucket(F.col("_f"), n_buckets).alias("bucket"))


def nb_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    bigrams: bool = False,
) -> DataFrame:
    """Train a hashed-unigram multinomial Naive Bayes on the rows
    whose ``label_col`` is non-null (1 = positive, 0 = negative) and
    score EVERY row -> (id, n_tokens, log_odds, pred).

        w(b) = ln((c_pos(b)+α)/(T_pos+αB)) − ln((c_neg(b)+α)/(T_neg+αB))
        log_odds(doc) = ln(N_pos/N_neg) + Σ_tokens w(bucket(tok))

    with c_cls(b) the class token count in bucket b, T_cls the class
    token total, N_cls the class document count, B = n_buckets.
    ``pred`` = log_odds > 0. Docs with no tokens score the prior.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    tb = _doc_buckets(df, text_col, id_col, n_buckets, bigrams=bigrams).persist()
    labels = df.select(id_col, F.col(label_col).cast("int").alias("_y")).where(
        F.col("_y").isNotNull()
    )
    lab_toks = tb.join(labels, id_col)
    counts = (
        lab_toks.groupBy("bucket")
        .agg(
            F.sum(F.col("_y")).cast("long").alias("c_pos"),
            F.sum(1 - F.col("_y")).cast("long").alias("c_neg"),
        )
    )
    tot = lab_toks.groupBy().agg(
        F.sum("_y").cast("long").alias("t_pos"),
        F.sum(1 - F.col("_y")).cast("long").alias("t_neg"),
    )
    ndocs = labels.groupBy().agg(
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("_y")).cast("long").alias("n_neg"),
    )
    a = float(alpha)
    b = float(n_buckets)
    weights = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("c_pos").cast("double") + F.lit(a))
                / (F.col("t_pos").cast("double") + F.lit(a * b))
            )
            - F.log(
                (F.col("c_neg").cast("double") + F.lit(a))
                / (F.col("t_neg").cast("double") + F.lit(a * b))
            ),
            9,
        )
        .cast("decimal(20,9)")
        .alias("_w"),
    )
    # unseen buckets fall back to the smoothing-only weight
    unseen = tot.select(
        F.round(
            F.log(F.lit(a) / (F.col("t_pos").cast("double") + F.lit(a * b)))
            - F.log(F.lit(a) / (F.col("t_neg").cast("double") + F.lit(a * b))),
            9,
        )
        .cast("decimal(20,9)")
        .alias("_w0")
    )
    prior = ndocs.select(
        F.round(
            F.log(F.col("n_pos").cast("double") / F.col("n_neg").cast("double")),
            9,
        )
        .cast("decimal(20,9)")
        .alias("_prior")
    )
    scored = (
        tb.join(F.broadcast(weights), "bucket", "left")
        .crossJoin(F.broadcast(unseen))
        .select(id_col, F.coalesce("_w", "_w0").alias("_w"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("_w").alias("_s"),
        )
    )
    out = (
        df.select(id_col)
        .join(scored, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(
                (
                    F.coalesce(F.col("_s"), F.lit(0).cast("decimal(20,9)"))
                    + F.col("_prior")
                ).cast("double"),
                6,
            ).alias("log_odds"),
        )
        .withColumn("pred", (F.col("log_odds") > 0).cast("int"))
    )
    return out


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> DataFrame:
    """DSIR importance log-weights -> (id, n_feats, log_weight): for
    each raw document, ``Σ_f ln(p_target(f)) − ln(p_raw(f))`` over
    hashed unigram(+bigram) features under add-α smoothed bucket
    distributions estimated from the target and raw corpora
    (arXiv:2302.03169 §2: importance resampling in the hashed n-gram
    feature space). Positive = looks like the target distribution.
    Docs with no features get log_weight 0.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    rb = _doc_buckets(raw, text_col, id_col, n_buckets, bigrams).persist()
    tgt = _doc_buckets(target, text_col, id_col, n_buckets, bigrams)
    c_raw = rb.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
    c_tgt = tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt"))
    t_raw = rb.groupBy().agg(F.count(F.lit(1)).alias("t_raw"))
    t_tgt = tgt.groupBy().agg(F.count(F.lit(1)).alias("t_tgt"))
    a = float(alpha)
    b = float(n_buckets)
    model = (
        c_raw.join(c_tgt, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("c_raw", F.lit(0)).alias("c_raw"),
            F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
        )
        .crossJoin(F.broadcast(t_raw))
        .crossJoin(F.broadcast(t_tgt))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.col("c_tgt").cast("double") + F.lit(a))
                    / (F.col("t_tgt").cast("double") + F.lit(a * b))
                )
                - F.log(
                    (F.col("c_raw").cast("double") + F.lit(a))
                    / (F.col("t_raw").cast("double") + F.lit(a * b))
                ),
                9,
            )
            .cast("decimal(20,9)")
            .alias("_w"),
        )
    )
    scored = (
        rb.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.round(F.sum("_w").cast("double"), 6).alias("log_weight"),
        )
    )
    return (
        raw.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )
