"""Dynamic long→wide pivot (SURVEY C13, chat.py:279-287, chat.py:106-113).

The reference grows columns from data values (event types, custom-field
names). Spark needs the output schema up front, so the dynamic variant is
two-pass:

  pass 1: distinct keys (a tiny aggregate — at 100 TB the key domain is
          what's small, not the data); collected to the driver as plan
          metadata, NOT data.
  pass 2: static pivot over that domain — one shuffle with map-side
          partial aggregation; Spark skips its own domain-discovery job
          when values are given explicitly.

When the domain is known ahead of time, call ``pivot_static`` directly
and pass 1 disappears.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.names import sanitize_column_name


def distinct_keys(df: DataFrame, key_col: str, max_keys: int = 10_000) -> list[str]:
    """Pass 1: collect the pivot domain (guarded against runaway width —
    the reference's additive schema drift is expected to be narrow)."""
    rows = (
        df.select(F.col(key_col).cast("string").alias("k"))
        .filter(F.col("k").isNotNull())
        .distinct()
        .limit(max_keys + 1)
        .collect()
    )
    keys = sorted(r["k"] for r in rows)
    if len(keys) > max_keys:
        raise ValueError(
            f"pivot domain of {key_col!r} exceeds {max_keys} distinct values; "
            "use a map-typed column instead of widening the schema"
        )
    return keys


def pivot_static(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    agg: Column,
    keys: Sequence[str],
    prefix: str = "evt_",
    fill=None,
) -> DataFrame:
    """Pass 2: pivot over an explicit domain; output columns sanitized
    ``{prefix}{key}`` in sorted key order."""
    pivoted = df.groupBy(*group_cols).pivot(key_col, list(keys)).agg(agg)
    out_cols = [F.col(c) for c in group_cols]
    for k in keys:
        name = sanitize_column_name(f"{prefix}{k}")
        col = F.col(f"`{k}`")
        out_cols.append((F.coalesce(col, F.lit(fill)) if fill is not None else col).alias(name))
    return pivoted.select(*out_cols)


def pivot_dynamic(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    agg: Column,
    prefix: str = "evt_",
    fill=None,
    max_keys: int = 10_000,
) -> DataFrame:
    """C13 — two-pass dynamic pivot: discover the domain, then pivot."""
    keys = distinct_keys(df, key_col, max_keys)
    return pivot_static(df, group_cols, key_col, agg, keys, prefix, fill)
