"""Temporal join and rollup operators over event/transcript tables.

Spark has no native as-of join, interval-point (range) join, or
multi-resolution continuous-aggregate rollup; this module implements
all three as single-shuffle declarative DataFrame plans (no per-row
Python, no driver loops) so Catalyst/AQE plan the physical join and
whole-stage codegen runs the kernels:

* :func:`asof_join` — union-tag + one keyed window: tag left/right
  rows, sort within each ``by`` group by (time, side, payload), carry
  the last-seen right payload forward with
  ``last(..., ignorenulls=True)``. ONE shuffle on the ``by`` keys,
  regardless of table sizes — never a join-explosion. Semantics match
  DuckDB's ``ASOF JOIN`` / pandas ``merge_asof``: backward = greatest
  right time <= left time (inclusive), forward = least right time >=
  left time (inclusive); ties among right rows at the same timestamp
  resolve to the MAX right payload struct (deterministic).
* :func:`range_join` — bucketed interval-point join: points land in
  one time bucket, intervals explode into every bucket they overlap,
  the equi-join on (keys, bucket) replaces the quadratic
  theta-join; exact predicate re-checked after the join. Interval
  explosion is bounded by ``max_buckets_per_interval`` (non-silent).
* :func:`time_rollup` — hypertable-style continuous aggregate: one
  explode into (resolution, truncated bucket) pairs, then ONE
  partial+final groupBy for every resolution at once.

100-TB shape notes: asof_join's window partitions by the ``by`` keys
(per-user event streams — millions of small groups); range_join's
shuffle is keyed by (keys, bucket) so skew is bounded by events per
key-hour; time_rollup is a single map-side-combining aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(c: Column) -> Column:
    """Seconds-since-epoch as double for timestamp-ish or numeric cols."""
    return c.cast("timestamp").cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    right_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    columns (``prefix``-renamed, including the matched ``on`` time),
    or nulls when no right row qualifies.

    ``direction='backward'`` matches the latest right ``on`` <= left
    ``on``; ``'forward'`` the earliest right ``on`` >= left ``on``
    (both inclusive at equality, like DuckDB ASOF and pandas
    merge_asof). ``tolerance_sec`` nulls out matches farther than the
    given number of seconds. Ties among right rows sharing ``by`` +
    ``on`` resolve deterministically to the max right payload struct
    (pre-aggregate the right side to unique (by, on) when that
    matters). Right rows with a null ``on`` never match; with no
    ``by`` the window is a single global sort (document-scale only —
    pass keys at corpus scale).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if tolerance_sec is not None and tolerance_sec < 0:
        raise ValueError("tolerance_sec must be >= 0")
    keys = [by] if isinstance(by, str) else list(by or [])
    carry = right_cols or [c for c in right.columns if c not in keys and c != on]
    missing = [c for c in carry if c not in right.columns]
    if missing:
        raise ValueError(f"right_cols not in right: {missing}")

    rp = F.struct(F.col(on).alias("_on"), *[F.col(c).alias(c) for c in carry])
    lp = F.struct(*[F.col(c).alias(c) for c in left.columns])
    r_type = right.select(rp.alias("_r")).schema["_r"].dataType
    l_type = left.select(lp.alias("_l")).schema["_l"].dataType

    u = left.select(
        *keys,
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        lp.alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    ).unionByName(
        right.where(F.col(on).isNotNull()).select(
            *keys,
            F.col(on).alias("_t"),
            F.lit(0).alias("_side"),
            F.lit(None).cast(l_type).alias("_l"),
            rp.alias("_r"),
        )
    )
    # right rows (side 0) sort before left rows at the same time, so
    # equal timestamps match inclusively; among right ties the LAST
    # seen (max _r struct) wins in both directions
    order = (
        [F.asc("_t"), F.asc("_side"), F.asc("_r")]
        if direction == "backward"
        else [F.desc("_t"), F.asc("_side"), F.asc("_r")]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    if tolerance_sec is not None:
        gap = (
            _epoch(F.col("_t")) - _epoch(F.col("_m._on"))
            if direction == "backward"
            else _epoch(F.col("_m._on")) - _epoch(F.col("_t"))
        )
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_sec)), F.col("_m"))
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._on").alias(f"{prefix}{on}"))
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in carry]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: str | list[str] | None = None,
    bucket_sec: float = 3600.0,
    max_buckets_per_interval: int = 10_000,
    prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Interval-point join: left rows whose ``point_col`` falls in a
    right row's ``[start_col, end_col)`` half-open interval (sharing
    the ``by`` keys), with the right columns ``prefix``-renamed.

    The theta-join is rewritten as an equi-join: points hash into one
    ``bucket_sec``-wide time bucket; each interval explodes into every
    bucket it overlaps (``sequence`` of longs — JVM-side); join on
    (keys, bucket); re-check the exact predicate. A point matches an
    interval in exactly the bucket containing the point, so no
    dedup pass is needed. Intervals spanning more than
    ``max_buckets_per_interval`` buckets are rejected (raise) rather
    than silently exploded — widen ``bucket_sec`` for long intervals.
    ``how='left'`` keeps unmatched points with null right columns.
    """
    if bucket_sec <= 0:
        raise ValueError("bucket_sec must be > 0")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = [by] if isinstance(by, str) else list(by or [])
    carry = [c for c in right.columns if c not in keys]

    b = F.lit(float(bucket_sec))
    lt = left.withColumn("_bucket", F.floor(_epoch(F.col(point_col)) / b))
    span = F.floor(_epoch(F.col(end_col)) / b) - F.floor(_epoch(F.col(start_col)) / b)
    rt = right.where(
        F.col(start_col).isNotNull() & F.col(end_col).isNotNull()
    ).where(_epoch(F.col(end_col)) > _epoch(F.col(start_col)))
    n_over = rt.where(span > max_buckets_per_interval).limit(1).count()
    if n_over:
        raise ValueError(
            f"an interval spans > {max_buckets_per_interval} buckets of "
            f"{bucket_sec}s — raise bucket_sec or max_buckets_per_interval"
        )
    rt = rt.select(
        *keys,
        F.explode(
            F.sequence(
                F.floor(_epoch(F.col(start_col)) / b),
                # end is exclusive: a bucket-aligned end never holds the
                # point; greatest() guards sub-epsilon intervals from
                # producing a descending sequence
                F.greatest(
                    F.floor((_epoch(F.col(end_col)) - F.lit(1e-6)) / b),
                    F.floor(_epoch(F.col(start_col)) / b),
                ),
            )
        ).alias("_bucket"),
        *[F.col(c).alias(f"{prefix}{c}") for c in carry],
    )
    cond = (F.col(point_col) >= F.col(f"{prefix}{start_col}")) & (
        F.col(point_col) < F.col(f"{prefix}{end_col}")
    )
    joined = lt.join(rt, [*keys, "_bucket"], "inner").where(cond).drop("_bucket")
    if how == "inner":
        return joined
    # left outer: anti-join the unmatched points back with null right cols
    matched_keys = joined.select(*left.columns)
    unmatched = left.join(matched_keys, left.columns, "left_anti")
    for c in carry:
        unmatched = unmatched.withColumn(
            f"{prefix}{c}", F.lit(None).cast(right.schema[c].dataType)
        )
    return joined.unionByName(unmatched)


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    resolutions: tuple[str, ...] = ("minute", "hour", "day"),
    by: str | list[str] | None = None,
    sum_type: str = "decimal(28,9)",
) -> DataFrame:
    """Hypertable-style multi-resolution continuous aggregate:
    (resolution, bucket_start[, by...], n, sum/min/max/avg of
    ``value_col``) for every requested truncation level in ONE
    partial+final aggregation (rows explode into R (resolution,
    bucket) pairs map-side, then a single groupBy).

    ``resolutions`` are ``date_trunc`` units (minute/hour/day/week/
    month/year). Sums accumulate in ``sum_type`` decimal — exact
    integer arithmetic, so the result is bit-identical at ANY
    parallelism / shuffle order (float partial sums are not) — and
    are emitted as rounded doubles; avg derives from that exact sum.
    """
    allowed = {"second", "minute", "hour", "day", "week", "month", "quarter", "year"}
    bad = [r for r in resolutions if r not in allowed]
    if bad:
        raise ValueError(f"unsupported resolutions: {bad}")
    keys = [by] if isinstance(by, str) else list(by or [])
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("resolution"),
                F.date_trunc(r, F.col(ts_col).cast("timestamp")).alias(
                    "bucket_start"
                ),
            )
            for r in resolutions
        ]
    )
    v = F.col(value_col).cast("double")
    vx = F.col(value_col).cast(sum_type)
    exact_sum = F.sum("_vx").cast("double")
    return (
        df.select(*keys, v.alias("_v"), vx.alias("_vx"),
                  F.explode(pairs).alias("_rb"))
        .groupBy(F.col("_rb.resolution").alias("resolution"),
                 F.col("_rb.bucket_start").alias("bucket_start"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(exact_sum, 6).alias("sum_value"),
            F.round(F.min("_v"), 6).alias("min_value"),
            F.round(F.max("_v"), 6).alias("max_value"),
            F.round(exact_sum / F.count(F.lit(1)), 6).alias("avg_value"),
        )
    )
