"""Append sink with additive schema evolution (S11/S12).

Reference: BigQuery load with WRITE_APPEND + ALLOW_FIELD_ADDITION
(main.py:136-142) and create-table-if-missing with a seed schema
(main.py:127-134).

Spark-first on plain parquet (no Delta in this environment, the
interface is Delta-shaped so a Delta/Iceberg backend can slot in):

- appends write NEW FILES only — never rewrite existing data,
- a column the sink lacks is simply present in newer files; readers
  union schemas (``mergeSchema``) and null-backfill older rows — the
  exact ALLOW_FIELD_ADDITION semantics,
- columns the batch lacks are null-filled before writing so required
  seed columns always exist.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..functions.names import sanitize_column_name


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        name.endswith(".parquet") for name in os.listdir(path)
    )


def create_if_not_exists(spark: SparkSession, path: str, seed_schema: StructType) -> bool:
    """S12 — probe the destination; seed an empty table when missing.

    Returns True when the table was created.
    """
    if _exists(path):
        return False
    empty = spark.createDataFrame([], seed_schema)
    empty.write.mode("overwrite").parquet(path)
    return True


def append_with_schema_evolution(df: DataFrame, path: str) -> None:
    """S11 — append a batch; new columns evolve the table additively.

    Column names are sanitized (P3) at the write boundary, mirroring the
    reference sanitizing immediately before load (main.py:121).
    """
    spark = df.sparkSession
    df = df.toDF(*[sanitize_column_name(c) for c in df.columns])
    if _exists(path):
        existing = spark.read.parquet(path).schema
        batch_cols = {c.lower() for c in df.columns}
        # null-fill seed/existing columns the batch lacks, so required
        # columns survive every append (reference main.py:85-87)
        for field in existing.fields:
            if field.name.lower() not in batch_cols:
                df = df.withColumn(field.name, F.lit(None).cast(field.dataType))
    df.write.mode("append").parquet(path)


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read the destination with schema union across file generations."""
    return spark.read.option("mergeSchema", "true").parquet(path)
