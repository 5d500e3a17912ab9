"""Column-name sanitization + duplicate pruning.

Re-implements the reference's BigQuery-legal identifier rules
(reference chat.py:21-31, operator P3) and duplicate-column pruning
(main.py:125, operator P4). Names are driver-side metadata, so this is
pure Python applied via ``DataFrame.toDF`` — no data movement, no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_ILLEGAL = re.compile(r"[^0-9A-Za-z_]")
_MAX_LEN = 300  # reference chat.py:26


def sanitize_column_name(name: str) -> str:
    """Map an arbitrary column name to a parquet/BigQuery-legal identifier.

    Rules (reference chat.py:23-26): replace every char outside
    [0-9A-Za-z_] with '_', prefix '_' if the result starts with a digit,
    truncate to 300 chars. Idempotent.
    """
    out = _ILLEGAL.sub("_", str(name))
    if out and out[0].isdigit():
        out = "_" + out
    return out[:_MAX_LEN]


def dedupe_column_names(names: list[str]) -> list[bool]:
    """Keep-mask for first occurrence of each name (reference main.py:125)."""
    seen: set[str] = set()
    mask: list[bool] = []
    for n in names:
        mask.append(n not in seen)
        seen.add(n)
    return mask


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Sanitize all column names, then drop duplicates keeping the first.

    Collisions *created by* sanitization (e.g. 'a b' and 'a.b' → 'a_b')
    are resolved the same way the reference resolves pre-existing
    duplicates: first occurrence wins.
    """
    new_names = [sanitize_column_name(c) for c in df.columns]
    keep = dedupe_column_names(new_names)
    renamed = df.toDF(*[n if k else f"__dup_{i}" for i, (n, k) in enumerate(zip(new_names, keep))])
    dropped = [f"__dup_{i}" for i, k in enumerate(keep) if not k]
    return renamed.drop(*dropped) if dropped else renamed
