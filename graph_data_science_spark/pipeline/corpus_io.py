"""JSONL corpus export / import — the LLM-pipeline-native interchange
format (one JSON object per line; what tokenizer trainers, dataset
hubs, and annotation tools consume).

Reference analog: the CSV graph round-trip
(`csv/src/main/java/org/neo4j/gds/core/utils/io/file/CsvGraphStoreImporter.java:60`)
is GDS's only file interchange; a corpus engine additionally needs the
JSONL seam. Spark-first: `DataFrameWriter.json` already writes
line-delimited JSON part-files in parallel (one file per task — no
driver funnel, codec-splittable when uncompressed), and reads take an
EXPLICIT schema so re-ingest never pays the full inference scan at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(
    df: DataFrame, path: str, compression: str | None = None
) -> None:
    """Write one JSON object per row (JSONL). ``compression`` may be
    any Spark codec (gzip, zstd, …); None keeps files splittable."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Read JSONL with an explicit schema (mandatory: schema inference
    is a second full pass over the data — never pay it at scale).
    FAILFAST so silent row corruption cannot pass as nulls."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def jsonl_roundtrip_report(df: DataFrame, workdir: str) -> DataFrame:
    """Export ``df`` to JSONL and re-import it; return a single-row
    invariant report (row counts and the symmetric difference, which
    must be empty, plus schema preservation)."""
    spark = df.sparkSession
    write_jsonl(df, workdir)
    back = read_jsonl(spark, workdir, df.schema)
    n_orig = df.count()
    n_back = back.count()
    n_missing = df.subtract(back).count()
    n_extra = back.subtract(df).count()
    schema_preserved = back.schema == df.schema
    return spark.createDataFrame(
        [(n_orig, n_back, n_missing, n_extra, schema_preserved)],
        "n_rows bigint, n_reimported bigint, n_missing bigint, "
        "n_extra bigint, schema_preserved boolean",
    )
