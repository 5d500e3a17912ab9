"""Pareto skyline (dominance) operator — Spark-first, no nested loop.

A row is in the skyline iff no other row dominates it: better-or-equal
in every dimension and strictly better in at least one. The naive plan
is a dominance anti-join — a non-equi condition Spark can only execute
as BroadcastNestedLoopJoin (O(n²) compares, one broadcast side) — the
shape the EDBT'23 "Integration of Skyline Queries into Spark SQL" work
exists to avoid. This implementation is the distributed sweep instead:

1. project to DISTINCT (min_dim, max_dim) pairs — dominance is a pure
   function of the value pairs, and exact duplicates never dominate
   each other, so the sweep runs on the (usually far smaller) pair set;
2. range-partition the pairs by the minimized dimension, sort each
   partition by (min_dim asc, max_dim desc): every strictly-preceding
   pair in this total order has min_dim <= current, so a pair survives
   iff its max_dim exceeds EVERY preceding pair's — a running max;
3. the running max splits into a within-partition window plus a tiny
   per-partition prefix (one row per partition, window over partition
   ids) joined back broadcast — no global single-partition window;
4. semi-join the surviving pairs back to the input rows.

Cost: one distinct shuffle + one range exchange of the pair set + a
broadcast — linear in data, parallel in partitions; the quadratic
compare never materializes. Result is a pure function of the value
set, so it is invariant to input partitioning and range-bound sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
) -> DataFrame:
    """Rows not Pareto-dominated under (minimize ``minimize``,
    maximize ``maximize``). Other orientations: negate a column.
    Rows with a NULL in either dimension are excluded (dominance is
    undefined on missing values — same as the NOT EXISTS formulation).
    """
    rows = df.filter(F.col(minimize).isNotNull() & F.col(maximize).isNotNull())
    pairs = rows.select(minimize, maximize).distinct()

    # the range partitioning MUST order (min asc, max desc) — the same
    # total order the sweep uses. With the default (asc, asc) an
    # equal-minimize group splits across partitions with max ASCENDING,
    # so a dominating pair in a LATER partition could never suppress the
    # dominated pairs before it (prefix max only looks backwards).
    part = pairs.repartitionByRange(
        F.col(minimize).asc(), F.col(maximize).desc()
    ).withColumn("__pid", F.spark_partition_id())
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(F.col(minimize).asc(), F.col(maximize).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    part = part.withColumn("__run_max", F.max(maximize).over(w_in))

    # prefix max over EARLIER partitions: one row per partition, so the
    # unpartitioned window is over #partitions rows, not the data
    bounds = part.groupBy("__pid").agg(F.max(maximize).alias("__pmax"))
    w_pre = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    bounds = bounds.withColumn("__prefix_max", F.max("__pmax").over(w_pre))

    survivors = (
        part.join(F.broadcast(bounds.select("__pid", "__prefix_max")), "__pid")
        .withColumn(
            # greatest() skips NULLs (first partition / first row), and
            # is NULL only when both are — i.e. the global sweep head
            "__best_before",
            F.greatest(F.col("__run_max"), F.col("__prefix_max")),
        )
        .filter(
            F.col("__best_before").isNull()
            | (F.col(maximize) > F.col("__best_before"))
        )
        .select(minimize, maximize)
    )
    return rows.join(survivors, [minimize, maximize], "left_semi")
