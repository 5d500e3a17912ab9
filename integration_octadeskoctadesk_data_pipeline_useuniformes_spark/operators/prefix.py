"""Distributed exact global running totals (prefix sums).

``sum(x) OVER (ORDER BY ...)`` with no PARTITION BY forces Spark to move
every row into ONE window partition — a single-task global sort that
cannot scale (WindowExec even warns). The classic fix is the two-level
prefix sum:

1. range-partition by the global order (RangePartitioner's sampled
   boundaries are seed-stable, so re-evaluation reproduces them),
2. compute each partition's LOCAL running sum with a window keyed by
   ``spark_partition_id()`` — parallel across partitions,
3. cumulate the per-partition totals (one tiny P-row window — single
   partition is fine BECAUSE it runs after the reduction) into exclusive
   offsets, broadcast them back, and add.

The result equals the single-partition window bit-for-bit when the
value type has order-independent addition (BIGINT, DECIMAL) and
``order_cols`` is a TOTAL order (include a unique tiebreak column —
with ties, range partitioning may split equal keys and any consistent
extension of the partial order could be produced).

Scale: two narrow shuffles of the data (range + pid re-cluster) and a
P-row side plan, versus one shuffle into a single task for the naive
form — at 100 TB the naive form simply does not finish.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..query_scope import scoped_persist

__all__ = ["global_running_sum", "global_row_number"]


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value: Column,
    *,
    out_col: str = "running_total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``out_col`` = exact running total of ``value`` over the
    global ``order_cols`` order, without a single-partition window.

    ``value`` must have order-independent addition (integer/decimal);
    ``order_cols`` must be a total order (unique tiebreak included).
    """
    part = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    part = part.withColumn("__val", value).withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Both consumers (totals branch and the final join) must see the
    # SAME __pid assignment. Range-boundary sampling is seed-stable and
    # ReuseExchange dedupes the subtree today, but neither is a
    # contract — persist pins one materialization so a future plan
    # change (e.g. an AQE rule splitting the reused exchange) cannot
    # give the two branches different partition ids. Cost note: this IS
    # a row-grain cache (unlike the avoidable bm25 one) — it is the
    # price of pid-stability, read by both consumers, and comparable to
    # one extra shuffle spill of the already-range-exchanged input; the
    # only cheaper alternatives either re-derive __pid from data (a
    # second range-partitioner implementation) or trust plan-identity
    # across two evaluations, which is exactly the unprotected shape
    # the round-2 review flagged.
    local = scoped_persist(
        part.withColumn("__run_local", F.sum("__val").over(w_local))
    )
    totals = local.groupBy("__pid").agg(F.sum("__val").alias("__tot"))
    # exclusive prefix over P partition totals — post-reduction, tiny
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.sum("__tot").over(w_off).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__run_local") + F.coalesce(F.col("__off"), F.lit(0)))
        .drop("__pid", "__val", "__run_local", "__off")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    *,
    out_col: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach ``out_col`` = 1-based contiguous global row number in
    ``order_cols`` order — ``row_number() OVER (ORDER BY ...)`` without
    its single-partition window.

    The standard shard-building primitive (stable sample ids, training
    example numbering, deterministic splits). Same two-level shape as
    ``global_running_sum`` with count as the value: local row_number per
    range partition plus broadcast exclusive row-count offsets.
    ``order_cols`` must be a total order for a unique result.
    """
    return global_running_sum(
        df,
        order_cols,
        F.lit(1).cast("bigint"),
        out_col=out_col,
        num_partitions=num_partitions,
    )
