"""Classifier evaluation over score columns — exact, distributed.

No reference analog (GDS's ML pipelines report AUCPR via their own
estimator; see mlpipeline/pipelines.py for that path). These are the
corpus-curation evaluation kernels: given any score column (the NB
quality classifier's log_odds, DSIR log-weights, a heuristic), grade
it against a binary label exactly.

``binary_auc`` uses the Mann-Whitney identity with average-rank tie
correction, reduced to an all-integer numerator so the result is
bit-exact at any parallelism and in ANSI SQL:

    AUC = (Σ_s pos_s·(min_rank_s + max_rank_s) − n_pos·(n_pos+1))
          / (2·n_pos·n_neg)

where s ranges over DISTINCT scores and ranks come from the total
order by score (ascending; higher score = predicts positive). Ranks
within a tie group are contiguous, so (min+max) is twice the group's
average rank — no floating point until the final division.

100-TB shape: the global ranking is ``util.global_rank`` (two
balanced range shuffles + an O(parallelism) offset map, never a
single-task ``Window.orderBy`` funnel); everything after is one
combining groupBy per distinct score and a scalar agg with
DECIMAL(38,0) sums (rank sums at 10^12 rows overflow BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.util import global_rank


def binary_auc(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """ROC-AUC of ``score_col`` predicting ``label_col`` (0/1) ->
    one row (n_pos, n_neg, auc). Ties handled by average rank (the
    Mann-Whitney U convention); rows with a NULL score or label are
    ignored; auc is NULL when either class is empty."""
    s = df.select(
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
    ).where(F.col("_s").isNotNull() & F.col("_y").isNotNull())
    ranked = global_rank(s, ["_s"], rank_col="_r")
    per_score = ranked.groupBy("_s").agg(
        F.sum("_y").cast("long").alias("_pos"),
        F.count(F.lit(1)).cast("long").alias("_cnt"),
        (F.min("_r") + F.max("_r")).cast("decimal(38,0)").alias("_mm"),
    )
    agg = per_score.agg(
        F.sum("_pos").cast("long").alias("n_pos"),
        (F.sum("_cnt") - F.sum("_pos")).cast("long").alias("n_neg"),
        F.sum(F.col("_pos").cast("decimal(38,0)") * F.col("_mm")).alias("_rp"),
    )
    np_d = F.col("n_pos").cast("decimal(38,0)")
    nn_d = F.col("n_neg").cast("decimal(38,0)")
    num = (F.col("_rp") - np_d * (np_d + F.lit(1))).cast("double")
    den = (F.lit(2).cast("decimal(38,0)") * np_d * nn_d).cast("double")
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(num / den, 6),
        ).alias("auc"),
    )


def classification_report(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    threshold: float = 0.0,
) -> DataFrame:
    """Confusion counts and derived metrics of ``score > threshold``
    -> one row (tp, fp, tn, fn, precision, recall, f1, accuracy),
    each metric rounded to 6 dp; precision/recall/f1 NULL when their
    denominator is 0. Rows with NULL score or label are ignored."""
    s = df.select(
        (F.col(score_col) > F.lit(float(threshold))).cast("int").alias("_p"),
        F.col(label_col).cast("int").alias("_y"),
    ).where(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
    agg = s.agg(
        F.sum(F.col("_p") * F.col("_y")).cast("long").alias("tp"),
        F.sum(F.col("_p") * (1 - F.col("_y"))).cast("long").alias("fp"),
        F.sum((1 - F.col("_p")) * (1 - F.col("_y"))).cast("long").alias("tn"),
        F.sum((1 - F.col("_p")) * F.col("_y")).cast("long").alias("fn"),
    )
    prec = F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double")
    rec = F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double")
    return agg.select(
        "tp",
        "fp",
        "tn",
        "fn",
        F.when((F.col("tp") + F.col("fp")) > 0, F.round(prec, 6)).alias(
            "precision"
        ),
        F.when((F.col("tp") + F.col("fn")) > 0, F.round(rec, 6)).alias("recall"),
        F.when(
            (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
            F.round(
                F.lit(2)
                * F.col("tp").cast("double")
                / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast(
                    "double"
                ),
                6,
            ),
        ).alias("f1"),
        F.round(
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn")).cast(
                "double"
            ),
            6,
        ).alias("accuracy"),
    )
