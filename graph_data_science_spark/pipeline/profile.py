"""Table profiling — the schema-drift / data-quality report an
ingest pipeline runs before anything else touches a new drop of
data.

No reference analog (GDS profiles graphs, not tables; see
graph_ops.degree_distribution for that side); this is the
column-wise counterpart for the corpus/transcript tables.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
_TIME = (TimestampType, TimestampNTZType)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-wise profile -> one row per column:
    (column, dtype, n_rows, n_nulls, n_distinct, min_num, max_num,
    min_str, max_str).

    min/max dispatch on the column type so the values are
    deterministic and engine-portable: numerics report min_num /
    max_num as doubles rounded to 6 dp (string-casting a double is
    NOT portable across engines), timestamps report epoch
    microseconds in the numeric slots, strings report min_str /
    max_str; other types (arrays, structs) profile counts only.

    100-TB shape: ONE combining aggregate pass over the table
    computes every column's metrics (count-distincts expand
    map-side; at extreme cardinality swap for approx_count_distinct
    — same plan shape); the per-column report rows are C trivial
    selects over that single aggregated row, unioned. Nothing wider
    than one row ever moves.
    """
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    by_name = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).cast("long").alias("__rows")]
    for c in cols:
        dt = by_name[c]
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"{c}__distinct"))
        if isinstance(dt, _NUMERIC):
            num = F.col(c).cast("double")
        elif isinstance(dt, _TIME):
            num = F.unix_micros(F.col(c).cast("timestamp")).cast("double")
        else:
            num = F.lit(None).cast("double")
        aggs.append(F.round(F.min(num), 6).alias(f"{c}__min_num"))
        aggs.append(F.round(F.max(num), 6).alias(f"{c}__max_num"))
        s = F.col(c) if isinstance(dt, StringType) else F.lit(None).cast("string")
        aggs.append(F.min(s).alias(f"{c}__min_str"))
        aggs.append(F.max(s).alias(f"{c}__max_str"))
    row = df.agg(*aggs)
    parts = [
        row.select(
            F.lit(c).alias("column"),
            F.lit(by_name[c].simpleString()).alias("dtype"),
            F.col("__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min_num").alias("min_num"),
            F.col(f"{c}__max_num").alias("max_num"),
            F.col(f"{c}__min_str").alias("min_str"),
            F.col(f"{c}__max_str").alias("max_str"),
        )
        for c in cols
    ]
    return reduce(DataFrame.unionByName, parts)
