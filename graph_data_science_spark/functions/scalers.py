"""Scalar property scalers — gds.alpha.scaleProperties analog.

Variants and formulas per /root/reference/algo-common/src/main/java/
org/neo4j/gds/scaling/ScalarScaler.java:54-116 and the concrete
scalers in the same package:

    NONE     x
    MAX      x / max|x|
    MINMAX   (x - min) / (max - min)          (0 when max == min)
    MEAN     (x - avg) / (max - min)          (0 when max == min)
    LOG      ln(x)
    STDSCORE (x - avg) / stddev_pop           (0 when stddev == 0)
    L1NORM   x / sum|x|
    L2NORM   x / sqrt(sum(x^2))
    CENTER   x - avg

One global aggregate + one projection — two jobs regardless of data
size; the aggregate is a partial+final reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VARIANTS = (
    "NONE",
    "MAX",
    "MINMAX",
    "MEAN",
    "LOG",
    "STDSCORE",
    "L1NORM",
    "L2NORM",
    "CENTER",
)


def scale_property(
    df: DataFrame, column: str, variant: str = "MINMAX", out_col: str | None = None
) -> DataFrame:
    v = variant.upper()
    if v not in VARIANTS:
        raise ValueError(f"variant must be one of {VARIANTS}, got {variant!r}")
    out = out_col or f"{column}_scaled"
    x = F.col(column).cast("double")
    if v == "NONE":
        return df.withColumn(out, x)
    if v == "LOG":
        return df.withColumn(out, F.log(x))

    stats = df.agg(
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
        F.avg(x).alias("avg"),
        F.stddev_pop(x).alias("sd"),
        F.sum(F.abs(x)).alias("l1"),
        F.sqrt(F.sum(x * x)).alias("l2"),
        F.max(F.abs(x)).alias("absmax"),
    ).collect()[0]
    mn, mx, avg, sd = stats["mn"], stats["mx"], stats["avg"], stats["sd"]
    l1, l2, absmax = stats["l1"], stats["l2"], stats["absmax"]

    if v == "MAX":
        expr = x / F.lit(absmax) if absmax else F.lit(0.0)
    elif v == "MINMAX":
        expr = (x - F.lit(mn)) / F.lit(mx - mn) if mx != mn else F.lit(0.0)
    elif v == "MEAN":
        expr = (x - F.lit(avg)) / F.lit(mx - mn) if mx != mn else F.lit(0.0)
    elif v == "STDSCORE":
        expr = (x - F.lit(avg)) / F.lit(sd) if sd else F.lit(0.0)
    elif v == "L1NORM":
        expr = x / F.lit(l1) if l1 else F.lit(0.0)
    elif v == "L2NORM":
        expr = x / F.lit(l2) if l2 else F.lit(0.0)
    else:  # CENTER
        expr = x - F.lit(avg)
    return df.withColumn(out, expr)
