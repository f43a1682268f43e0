"""Shared utilities: hard plan truncation for long iterative loops.

Empirical Spark 4.1 local-mode finding (first hit in Louvain, then
KNN): a chain of ~12+ `localCheckpoint` generations makes each
subsequent materialization drastically slower — constant logical
plan, constant rows, growing wall time — while a parquet round-trip
keeps per-iteration cost flat indefinitely. Algorithms whose driver
loops can exceed ~10 iterations therefore truncate through a
`Truncator`: every `cut()` writes the DF to a scratch parquet dir and
reads it back (a few hundred ms for superstep-sized state, and the
same device the Pregel runner already uses for durable checkpoints).

Use as a context manager so the scratch space is removed once the
caller has materialized its final result:

    with Truncator(spark) as tr:
        for i in range(100):
            state = tr.cut(transform(state))
        result = state.localCheckpoint(eager=True)  # outlives scratch
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


class Truncator:
    def __init__(self, spark: SparkSession, every: int = 1):
        self.spark = spark
        self.every = max(1, every)
        self._dir = tempfile.mkdtemp(prefix="gds_spark_trunc_")
        self._n = 0

    def cut(self, df: DataFrame) -> DataFrame:
        """Hard-truncate the plan via parquet; cheap localCheckpoint
        on the off-cycles when `every` > 1."""
        self._n += 1
        if self._n % self.every:
            return df.localCheckpoint(eager=True)
        path = os.path.join(self._dir, f"t{self._n}_{uuid.uuid4().hex[:6]}")
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def close(self) -> None:
        shutil.rmtree(self._dir, ignore_errors=True)

    def __enter__(self) -> "Truncator":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
