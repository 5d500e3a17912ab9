"""Physical data layout for scan efficiency at 100 TB: small-file
compaction, range clustering, and multi-column Z-order keys.

Why this matters at scale: parquet scans prune with (a) partition
directories and (b) per-row-group min/max statistics. Both only help if
the data LAYOUT is right — a table of a million 1 MB files (the natural
output of incremental appends, reference main.py:136-142's daily loads)
wastes the scheduler, and row-group stats on randomly-ordered data
never prune anything. These operators fix layout as a post-process,
exactly like warehouse OPTIMIZE / CLUSTER BY maintenance jobs.

All pure DataFrame/built-in-function code — the Z-order key is bitwise
column arithmetic (whole-stage codegen), not a UDF.
"""

from __future__ import annotations

import math
import os
import shutil
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "compact_small_files",
    "cluster_for_skipping",
    "zorder_key",
    "cluster_by_zorder",
    "write_bucketed",
]


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
) -> int:
    """Rewrite a parquet directory into ⌈rows/target⌉ equal-ish files.

    Returns the new file count. The rewrite goes to a sibling temp dir
    first and swaps in only after success, so a crash never leaves the
    table half-compacted (the reader contract is directory-atomic, same
    as the reference's load-job boundary, main.py:136-142).

    Scale: ``coalesce`` (not repartition) — merging files is a narrow
    repack of existing partitions, no shuffle. On a real cluster this
    runs per table partition, so parallelism is the partition count.
    """
    df = spark.read.parquet(path)
    n_rows = df.count()
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) catalog table.

    Bucketing pre-shuffles ONCE at write time: two tables bucketed by
    the same key into the same bucket count join with NO exchange at
    read time (and no sort either, when bucket-sorted) — the decisive
    layout for fact-to-fact joins repeated across many queries, where
    per-query shuffling of the big side would dominate at 100 TB.
    Aggregations on the bucket key equally skip their exchange.
    """
    w = df.write.format("parquet").bucketBy(num_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.mode("overwrite").saveAsTable(table)


def cluster_for_skipping(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int,
) -> DataFrame:
    """Range-cluster rows so each output file covers a narrow slice of
    ``cols`` — parquet min/max stats then prune single-dimension range
    predicates to ~1/num_files of the files.

    ``repartitionByRange`` samples quantiles, so files are equi-depth
    even under skew; the within-partition sort tightens row-group stats
    inside each file. One shuffle — the cost of any global re-layout.
    """
    cs = [F.col(c) for c in cols]
    return df.repartitionByRange(num_files, *cs).sortWithinPartitions(*cs)


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton (Z-order) interleave of non-negative ints, JVM-side.

    Bit j of column i lands at position j·n_cols + i, so the key
    preserves locality in EVERY input dimension at once — sorting by it
    gives multi-column data skipping where a lexicographic sort only
    helps its leading column. Inputs are clamped to [0, 2^bits); with
    n_cols·bits ≤ 63 the key fits a long.

    Columns must already be integer surrogates (dictionary codes, day
    numbers, bucket ids): mapping domain values to compact ints is the
    caller's (data-dependent) job — see cluster_by_zorder.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a long")
    cap = F.lit((1 << bits) - 1)
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = F.least(F.greatest(c.cast("long"), F.lit(0)), cap)
        for j in range(bits):
            bit = F.shiftright(v, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + i))
    return key


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int,
    bits: int = 16,
) -> DataFrame:
    """Cluster rows by the Z-order of ``cols`` (each rank-encoded to a
    dense integer first, so arbitrary orderable types work and skew
    cannot collapse the curve).

    The rank encoding is one window per column over the column order —
    at 100 TB you would precompute per-column quantile bins instead
    (equi-depth histogram, as operators/buckets.py does) and feed the
    bin ids straight into zorder_key; the dense-rank path here is the
    exact small-table variant of the same idea.
    """
    from pyspark.sql import Window

    work = df
    encoded = []
    for c in cols:
        enc = f"__z_{c}"
        work = work.withColumn(
            enc, F.dense_rank().over(Window.orderBy(F.col(c))) - 1
        )
        encoded.append(enc)
    work = work.withColumn("__zkey", zorder_key([F.col(e) for e in encoded], bits))
    return (
        work.repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *encoded)
    )
