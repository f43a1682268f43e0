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
