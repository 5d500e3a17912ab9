"""Partitioned destination table with partition-pruned MERGE (S13/T3 at
100 TB scale).

``merge_sink.merge_upsert`` rewrites the whole table — fine for a
demo-sized destination, unacceptable at 100 TB. This module is the scale
path: the sink is hive-partitioned on a value derived from an immutable
attribute of the row (e.g. ``p_month = date_format(createdAt, 'yyyy-MM')``
— a ticket's creation month never changes), so

- every update row knows which partition its target rows live in,
- the set of affected partitions is ``updates.select(p).distinct()``
  (metadata-sized; collected to the driver exactly like Delta collects
  its file-pruning predicate),
- ONLY those partition directories are read (partition-pruned scan),
  merged, and atomically swapped. Untouched partitions are never read,
  never rewritten, byte-identical after the merge.

This is precisely what Delta/Iceberg MERGE does with file-level pruning;
the interface matches ``merge_upsert`` so backends can be swapped.
"""

from __future__ import annotations

import os
import shutil
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """Append a batch to a hive-partitioned parquet sink."""
    df.write.mode("append").partitionBy(partition_col).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned sink (schema union across file generations)."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def _apply_updates(sink: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """UPDATE-all-matching column substitution (same semantics as
    merge_sink.merge_upsert: row identity preserved, overlapping columns
    overwritten, update-only columns added as evolution)."""
    set_cols = [c for c in updates.columns if c != key]
    u = updates.select(
        key,
        F.lit(True).alias("__matched"),
        *[F.col(c).alias(f"__u_{c}") for c in set_cols],
    )
    joined = sink.join(F.broadcast(u), key, "left")
    out_cols = [F.col(key)]
    for c in sink.columns:
        if c == key:
            continue
        if c in set_cols:
            out_cols.append(
                F.when(F.col("__matched"), F.col(f"__u_{c}")).otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    for c in set_cols:
        if c not in sink.columns:
            out_cols.append(F.when(F.col("__matched"), F.col(f"__u_{c}")).alias(c))
    return joined.select(*out_cols)


def merge_upsert_partitioned(
    spark: SparkSession,
    sink_path: str,
    updates: DataFrame,
    key: str,
    partition_col: str,
) -> int:
    """Partition-pruned MERGE: rewrite only partitions named by the
    updates' ``partition_col`` values. Returns update rows applied.

    ``updates`` MUST carry ``partition_col`` with the same derivation the
    sink was partitioned by — the contract that makes pruning sound.
    """
    updates = updates.dropDuplicates([key])
    n_updates = updates.count()

    affected = [
        r[0]
        for r in updates.select(partition_col).distinct().collect()
        if r[0] is not None
    ]
    if not affected:
        return 0

    sink = read_partitioned(spark, sink_path)
    # partition-pruned scan: only affected directories are listed/read
    subset = sink.filter(F.col(partition_col).isin(affected))
    merged = _apply_updates(subset, updates.drop(partition_col), key)

    staging = f"{sink_path}__staging_{_uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)

    for value in affected:
        part_dir = f"{partition_col}={value}"
        src = os.path.join(staging, part_dir)
        dst = os.path.join(sink_path, part_dir)
        if not os.path.isdir(src):
            continue  # all rows of that partition were dropped upstream
        old = f"{dst}__old_{_uuid.uuid4().hex[:8]}"
        if os.path.isdir(dst):
            os.rename(dst, old)
        os.rename(src, dst)
        if os.path.isdir(old):
            shutil.rmtree(old)
    shutil.rmtree(staging, ignore_errors=True)
    spark.catalog.refreshByPath(sink_path)
    return n_updates
