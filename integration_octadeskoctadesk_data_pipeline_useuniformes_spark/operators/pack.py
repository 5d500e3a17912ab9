"""Sequence packing — assign documents to fixed-budget training blocks.

Pretraining pipelines concatenate documents into fixed-size token
blocks; the cluster-friendly formulation is *sequential packing*: within
a shard (group), lay documents end-to-end in a deterministic order and
cut blocks every ``budget`` units. A document's block is then a pure
function of the cumulative size before it — one window over (group,
order), no driver state, no iterative bin-packing.

Deliberately NOT first-fit-decreasing: FFD needs a global mutable bin
state (inherently serial), while the sequential cut is one shuffle keyed
by the group and reproducible on any cluster size. Packing quality loss
vs FFD is bounded by one document per block boundary, which at
100 TB / 4 Ki-token blocks is noise.

Reference parity: none (the reference has no training-data surface,
SURVEY §2.5) — extension tier per BASELINE.json north-star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    budget: int,
    *,
    block_col: str = "block_id",
) -> DataFrame:
    """Add ``block_col``: the 0-based block index of each row.

    block = floor(cum_size_before_this_row / budget), cumulating in
    ``order_col`` order within ``group_col``. A row larger than the
    budget simply spans boundary math (the next row starts after it) —
    no row is ever split or dropped.

    Scale: one shuffle keyed by ``group_col``; the within-group sort is
    the per-partition sort of a running-sum window. Groups are
    independent, so parallelism = number of shards.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0).cast("long"))
    return df.withColumn(
        block_col, F.floor(cum_before / F.lit(float(budget))).cast("long")
    )
