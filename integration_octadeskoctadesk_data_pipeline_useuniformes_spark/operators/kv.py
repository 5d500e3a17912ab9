"""Key/value custom-field operators (SURVEY C11/C12/F6, ticket.py:69-96).

The reference loops over a kv array per row building a dict then a frame
(ticket.py:78-94, a row-at-a-time pandas apply + positional concat J4).
Spark-first: array higher-order functions — filter → map_from_entries →
getItem — all JVM-side, whole-stage-codegen-able, zero UDFs, zero joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kv_filter_allowlist(array_col: Column | str, allowlist: Sequence[str]) -> Column:
    """F6 — keep kv entries whose key is in the allowlist (ticket.py:71-83)."""
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    allowed = F.array(*[F.lit(k) for k in allowlist])
    return F.filter(col, lambda x: F.array_contains(allowed, x["key"]))


def kv_to_map(array_col: Column | str, allowlist: Sequence[str] | None = None) -> Column:
    """C11 — kv array → map<string,string>, optionally allowlist-filtered.

    Duplicate keys: last wins (dict-comprehension semantics of
    ticket.py:78-83) — map_from_entries in Spark 3.5+/4 keeps the LAST
    entry under spark.sql.mapKeyDedupPolicy=LAST_WIN default.
    """
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    if allowlist is not None:
        col = kv_filter_allowlist(col, allowlist)
    return F.map_from_entries(col)


def kv_to_columns(
    df: DataFrame,
    array_col: str,
    keys: Sequence[str],
    prefix: str = "ticket_",
    allowlist: Sequence[str] | None = None,
) -> DataFrame:
    """C12 — static map → columns projection (ticket.py:85-89).

    Adds one ``{prefix}{key}`` string column per requested key; keys absent
    from a row's array come out NULL (the reference's backfill main.py:85-87).
    """
    m = kv_to_map(array_col, allowlist)
    out = df.withColumn("__kv_map", m)
    for k in keys:
        out = out.withColumn(f"{prefix}{k}", F.col("__kv_map").getItem(k))
    return out.drop("__kv_map")
