"""Skew mitigation: salted two-phase aggregation and replicated salted
joins.

AQE's skew-join splitting (on in session.RUNTIME_CONFS) handles most
runtime skew; these operators are for the cases AQE cannot fix:

- a groupBy where one key holds a large share of all rows (AQE splits
  *join* partitions, not aggregation partitions). Salting turns one
  hot reducer into ``salt_buckets`` parallel partials plus a cheap
  final merge — classic two-phase aggregation.
- a shuffle join against a modestly-sized-but-too-big-to-broadcast
  side with hot keys: replicate the small side per salt bucket and
  salt the big side deterministically, so a hot key spreads over
  ``salt_buckets`` tasks.

Salts are DETERMINISTIC (pmod over xxhash64 of a per-row expression),
never rand(): plans stay reproducible and oracle-comparable, and
re-executed tasks (speculation, retries) produce identical output —
a correctness requirement, not a style choice.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate name -> (partial fn, final fn) — algebraic aggs only
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_column(expr: Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from any per-row expression."""
    return F.pmod(F.xxhash64(expr), F.lit(buckets))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    salt_on: Column,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    ``aggs`` maps output column -> (agg_name, input column) with
    agg_name in {sum, count, min, max} (algebraic: a partial per salt
    bucket merges exactly). Phase 1 groups on (keys + salt) — the hot
    key's rows spread over ``salt_buckets`` reducers; phase 2 merges the
    tiny partials per key.
    """
    unknown = [a for a, _ in aggs.values() if a not in _ALGEBRAIC]
    if unknown:
        raise ValueError(f"non-algebraic aggregates cannot be salted: {unknown}")

    salted = df.withColumn("__salt", salt_column(salt_on, salt_buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[name][0](F.col(src)).alias(f"__p_{out}")
            for out, (name, src) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[name][1](F.col(f"__p_{out}")).alias(out)
            for out, (name, src) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_on: Column,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` is too large to
    broadcast: replicate ``small`` once per salt bucket (explode over a
    bucket sequence) and salt ``big`` deterministically, so each hot key
    lands on ``salt_buckets`` different reducers.

    ``how`` must be 'inner' or 'left' (the big side drives row
    multiplicity; replicating the small side preserves it).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (big side preserved)")
    big_s = big.withColumn("__salt", salt_column(salt_on, salt_buckets))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = big_s.join(small_s, [on, "__salt"], how)
    return out.drop("__salt")
