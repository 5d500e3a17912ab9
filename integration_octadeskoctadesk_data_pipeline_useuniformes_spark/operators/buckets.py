"""Equi-depth (equal-frequency) bucketing — curriculum/quantile binning
without a global sort of the data.

The naive formulation (``ntile(k)`` over all rows) forces every row
through ONE window partition — a single-task global sort that cannot
scale. This operator instead works on the value HISTOGRAM:

1. ``groupBy(col).count()`` — partially aggregated map-side, the shuffle
   carries one row per distinct value per partition;
2. a cumulative sum over the histogram (tiny: |distinct values| rows,
   e.g. document lengths, quality scores — single partition is fine
   BECAUSE it runs after the reduction, not on the raw rows);
3. broadcast the value→bucket map back onto the data — no second
   shuffle of the big table.

All arithmetic is integer (``div``), so a DuckDB oracle using ``//``
matches bit-for-bit. Ties are never split: all rows sharing a value land
in the same bucket (the bucket of the value's FIRST row position), which
is the property curriculum bucketing actually wants — identical inputs
get identical treatment.

For truly continuous high-cardinality columns, pre-quantize (e.g.
``F.round(col, 3)``) so the histogram stays small; the reference has no
bucketing operator at all (§2.5 "no group-by" — extension tier).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["equi_depth_buckets"]


def equi_depth_buckets(
    df: DataFrame, col: str, k: int, *, bucket_col: str = "bucket"
) -> DataFrame:
    """Attach ``bucket_col`` ∈ [1, k]: equal-frequency bins over ``col``.

    bucket(v) = 1 + floor(rank_before(v) * k / N) where rank_before is
    the number of rows strictly below ``v`` — exact integer arithmetic,
    order/cluster-size independent.
    """
    hist = df.groupBy(col).agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = hist.select(
        F.col(col),
        ((F.sum("__cnt").over(w_cum) - F.col("__cnt")) * k).alias("__pos_k"),
        F.sum("__cnt").over(w_all).alias("__total"),
    )
    mapping = ranked.select(
        col, (F.expr("__pos_k div __total") + F.lit(1)).alias(bucket_col)
    )
    return df.join(F.broadcast(mapping), col)


def exact_quantile_disc(
    df: DataFrame,
    col: str,
    quantiles: "dict[str, tuple[int, int]]",
    group_by: "tuple[str, ...]" = (),
    count_col: "str | None" = None,
) -> DataFrame:
    """Exact discrete quantiles (SQL ``percentile_disc`` / DuckDB
    ``quantile_disc``) WITHOUT sorting the raw rows.

    ``quantiles`` maps output label -> (numerator, denominator), e.g.
    ``{"p50": (1, 2), "p90": (9, 10)}``. Same histogram trick as
    ``equi_depth_buckets``: reduce to per-value counts (one map-side-
    combined shuffle), cumulate over the tiny histogram, then pick the
    value at 1-based position ``ceil(q·N)`` per group — all integer
    arithmetic, so engines agree bit-for-bit. Every requested quantile
    reads the SAME histogram: one scan regardless of len(quantiles).

    Returns one row per group with a column per label.

    NULLs in ``col`` are ignored (SQL ``percentile_disc`` / DuckDB
    ``quantile_disc`` semantics): they contribute neither to N nor to
    the pick position. Without the filter, Spark would count a NULL
    histogram row in ``__total`` and sort it first in the cumulative
    window, shifting ceil(q·N) off DuckDB's answer. Groups whose values
    are ALL NULL still emit a row (with NULL quantiles), exactly like
    SQL GROUP BY: the group keys are captured before the NULL filter
    and re-attached with a left join on the (small, by the histogram
    assumption) distinct-key frame.

    ``count_col``: when the input is ALREADY a value histogram (one row
    per value carrying its multiplicity), name the multiplicity column
    here and each row counts that many observations — identical result
    to exploding the histogram back to raw rows, letting a caller that
    has reduced to the histogram grain anyway (e.g. for a rollup the
    quantiles gate) reuse it instead of re-running the corpus chain.
    Rows with a NULL/zero count contribute nothing, like absent rows.
    """
    keys = list(group_by)
    groups = df.select(*keys).distinct() if keys else None
    df = df.filter(F.col(col).isNotNull())
    # default path keeps the original count(1) aggregate (plan tests pin
    # its partial_count map-side combine); the weighted path sums the
    # caller's multiplicities instead
    cnt = (
        F.sum(F.coalesce(F.col(count_col), F.lit(0)))
        if count_col
        else F.count(F.lit(1))
    )
    hist = df.groupBy(*keys, col).agg(cnt.alias("__cnt"))
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*keys)
    cum = hist.select(
        *keys,
        F.col(col),
        F.col("__cnt"),
        F.sum("__cnt").over(w_cum).alias("__cum"),
        F.sum("__cnt").over(w_all).alias("__total"),
    )
    picks = []
    for label, (qn, qd) in quantiles.items():
        pos = F.expr(f"({qn} * __total + {qd} - 1) div {qd}")
        picks.append(
            F.max(
                F.when(
                    ((F.col("__cum") - F.col("__cnt")) < pos) & (pos <= F.col("__cum")),
                    F.col(col),
                )
            ).alias(label)
        )
    result = cum.groupBy(*keys).agg(*picks)
    if groups is not None:
        # Null-safe re-attach: a NULL group KEY is a legitimate group
        # under both Spark groupBy and SQL GROUP BY (only NULL *values*
        # of ``col`` are excluded above), so the join back onto the
        # distinct-key frame must use <=> — plain equality would drop
        # the NULL-keyed group's computed quantiles and emit NULLs for
        # a group that has real values.
        cond = functools.reduce(
            lambda a, b: a & b, [groups[k].eqNullSafe(result[k]) for k in keys]
        )
        result = groups.join(result, cond, "left").select(
            *[groups[k] for k in keys], *[result[label] for label in quantiles]
        )
    return result
