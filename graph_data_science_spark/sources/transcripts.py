"""Transcript-table source with table-format dispatch.

The north-rule input is an Iceberg table of multi-turn transcripts
``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``. On a real cluster an Iceberg table is
consumed through the session catalog — ``spark.read.table(
"catalog.db.transcripts")`` — and the table format (Iceberg, Delta,
Hive parquet) is owned by the catalog configuration, not the engine:
that is the Spark-native seam, and it is what this module
dispatches on. A filesystem path reads as parquet so the same entry
point serves the sandbox test data and any exported snapshot.

Reference analog: native projection's store scan
(`proc/catalog/src/main/java/org/neo4j/gds/catalog/GraphCreateProc.java:70-99`
reads whatever store the DBMS mounts); here Catalyst owns predicate
pushdown / column pruning / partition pruning into the source —
Iceberg's manifest-level file skipping composes with the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from graph_data_science_spark import projection
from graph_data_science_spark.catalog import Graph

#: the input_hint schema, for validation
TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Load a transcript table from a catalog table identifier
    (Iceberg/Delta/Hive — e.g. ``iceberg_cat.chat.transcripts``) or a
    filesystem path (parquet). Dispatch rule: anything with a path
    separator or a ``.parquet`` suffix is a path; otherwise it is a
    table identifier resolved by the session catalog."""
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        df = spark.read.table(source)
    missing = [c for c in TRANSCRIPT_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"transcript source `{source}` is missing columns {missing}; "
            f"expected {list(TRANSCRIPT_COLUMNS)}"
        )
    return df


def transcript_graph(
    spark: SparkSession, source: str, name: str = "transcripts"
) -> Graph:
    """Source -> canonical link graph in one call: REPLY edges
    (turn i -> turn i+1 per conversation) + INVOKES edges
    (turn -> tool vertex), via projection.transcript_edges."""
    return Graph(
        name=name,
        edges=projection.transcript_edges(read_transcripts(spark, source)),
        directed=True,
    )

def conversation_stats(df: DataFrame) -> DataFrame:
    """Per-conversation rollup over the canonical transcript table ->
    (conv_id, n_turns, n_user_turns, n_assistant_turns, n_tools,
    total_tokens, avg_turn_tokens, duration_us).

    The transcript-side "what's in this corpus" report: turn counts by
    role, distinct tools invoked, whitespace-token mass, and the
    conversation's wall-clock span in epoch microseconds.

    100-TB shape: ONE map-side-combining groupBy keyed by conv_id —
    token counting and role flags are pure JVM column exprs inside the
    scan, so the shuffle carries only partial aggregates. Distinct
    tools use a per-group exact count_distinct (two-phase under AQE);
    at extreme cardinality swap for approx_count_distinct with the
    same plan shape.
    """
    from pyspark.sql import functions as F

    from graph_data_science_spark.pipeline.text import token_count

    n_tok = F.when(
        F.col("text").isNotNull(), token_count(F.col("text"))
    ).otherwise(F.lit(0))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return (
        df.select(
            "conv_id",
            F.when(F.col("role") == "user", 1).otherwise(0).alias("_u"),
            F.when(F.col("role") == "assistant", 1).otherwise(0).alias("_a"),
            "tool",
            n_tok.alias("_t"),
            us.alias("_us"),
        )
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("_u").cast("long").alias("n_user_turns"),
            F.sum("_a").cast("long").alias("n_assistant_turns"),
            F.count_distinct("tool").cast("long").alias("n_tools"),
            F.sum("_t").cast("long").alias("total_tokens"),
            F.round(
                F.sum("_t").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_turn_tokens"),
            (F.max("_us") - F.min("_us")).cast("long").alias("duration_us"),
        )
    )
