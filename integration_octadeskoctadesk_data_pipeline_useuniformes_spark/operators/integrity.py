"""Order-independent content checksums — cheap anti-entropy for
pipeline sinks.

After a 100 TB copy/merge/backfill you want "does the destination hold
exactly the source rows?" WITHOUT sorting or shuffling either table
into a canonical order. The classic trick: hash each row to a fixed
width and combine with a commutative operation — here ``bit_xor`` over
a 60-bit md5 slice — so the aggregate is independent of row order,
partitioning and engine, and a grouped variant localizes any mismatch
to its group. The md5-slice arithmetic (``conv(substring(md5(x),1,15),
16,10)``) is reproducible in DuckDB as ``('0x'||substr(md5(x),1,15))
::BIGINT``, which is what makes the checksum an oracle-checkable
CONTRACT rather than an engine artifact.

XOR cancels duplicate rows pairwise, so the row count always rides
along; for multiset-sensitive checking at scale, pair the checksum
with the count per group (as `grouped_checksum` does) or include a
uniquifying column in ``cols``.

Serialization is explicit (caller-supplied string columns, NULL →
reserved sentinel) because engine-native casts of doubles/timestamps
differ textually between engines — normalize first (integer cents,
formatted timestamps), then checksum.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["row_digest", "grouped_checksum", "NULL_SENTINEL"]

NULL_SENTINEL = "␀"  # ␀ — cannot collide with real cell text


def row_digest(cols: Sequence[Column]) -> Column:
    """60-bit BIGINT digest of the canonical row serialization."""
    ser = F.concat_ws("|", *[F.coalesce(c.cast("string"), F.lit(NULL_SENTINEL)) for c in cols])
    return F.conv(F.substring(F.md5(ser), 1, 15), 16, 10).cast("bigint")


def grouped_checksum(
    df: DataFrame,
    cols: Sequence[Column],
    group_by: Sequence[str] = (),
) -> DataFrame:
    """(group_by..., n_rows, checksum) — one map-side-combined pass.

    ``bit_xor`` partials merge exactly, so the shuffle carries one
    (group, partial) row per mapper regardless of input size.
    """
    digested = df.withColumn("__digest", row_digest(cols))
    keys = [F.col(k) for k in group_by]
    return digested.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(__digest)").alias("checksum"),
    )
