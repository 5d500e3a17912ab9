"""Deterministic Bloom-filter build + probe for join pruning.

At 100 TB the classic use is pre-filtering a big-big join: build a
Bloom filter over the (much smaller, but not broadcast-small) set of
join keys that survive the selective side's predicate, broadcast the
filter's bitmap, and drop probe-side rows that cannot match BEFORE the
shuffle. Spark has a built-in runtime version (AQE runtime filters /
``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator is
the engine-level explicit variant whose bits are reproducible in any
SQL engine, so membership decisions are oracle-verifiable.

Design:

- ``n_hashes`` positions per key, ``pos_i = hex15(md5(seed_i || key))
  % m_bits`` — ``conv(substring(md5(x),1,15),16,10)`` in Spark equals
  ``('0x'||substr(md5(x),1,15))::BIGINT`` in DuckDB (15 hex digits
  < 2^60: no BIGINT overflow, no sign).
- The bitmap is a DataFrame of 32-bit lanes carried in BIGINTs
  (``lane = pos div 32``, ``bit = pos % 32``) — shifts never reach the
  sign bit, so ``bit_or``/``&``/``shiftleft`` behave identically in
  Spark and DuckDB. m_bits/32 rows total.
- Build: one map-side-combined ``groupBy(lane).agg(bit_or(mask))`` over
  the exploded positions.
- Probe: the positions are computed as N COLUMNS (no explode), each
  left-joined against the broadcast lane table — no shuffle of the
  probe side, no re-aggregation; membership is a pure AND of bit
  tests. A missing lane row means no bit set (coalesce 0).

No false negatives by construction; false-positive rate for n keys is
``(1 - exp(-n_hashes * n / m_bits)) ** n_hashes`` — size ``m_bits``
accordingly (tests pin both properties).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_probe", "DEFAULT_SEEDS"]

DEFAULT_SEEDS: tuple[str, ...] = ("bf1:", "bf2:", "bf3:")

_LANE_BITS = 32  # bits per BIGINT lane; keeps shifts clear of the sign bit


def _position(key: Column, seed: str, m_bits: int) -> Column:
    """Hash position in [0, m_bits): top-60-bit slice of md5, modulo m."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 15), 16, 10)
    return (h.cast("bigint") % m_bits).alias("__pos")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    *,
    m_bits: int = 4096,
    seeds: tuple[str, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """Aggregate ``keys[key_col]`` into a (lane, bits) bitmap table.

    One narrow shuffle of at most ``m_bits / 32`` partially-aggregated
    rows; duplicate keys cost nothing extra (bit_or is idempotent).
    """
    pos = keys.select(
        F.explode(
            F.array(*[_position(F.col(key_col), s, m_bits) for s in seeds])
        ).alias("__pos")
    )
    return (
        pos.select(
            F.expr(f"__pos div {_LANE_BITS}").alias("lane"),
            # pyspark's shiftleft() takes a literal bit count; a
            # column-valued shift needs the SQL form
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(__pos % {_LANE_BITS} as int))"
            ).alias("__mask"),
        )
        .groupBy("lane")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    m_bits: int = 4096,
    seeds: tuple[str, ...] = DEFAULT_SEEDS,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Attach ``out_col``: False ⇒ the key is definitely absent.

    Each hash's lane is a separate broadcast left join (no explode, no
    groupBy): the probe side is never shuffled, so this composes as a
    pre-shuffle filter in a larger join plan.
    """
    out = df
    checks: list[Column] = []
    for i, s in enumerate(seeds):
        pos = _position(F.col(key_col), s, m_bits)
        lane_tbl = F.broadcast(
            bloom.select(F.col("lane").alias(f"__l{i}"), F.col("bits").alias(f"__b{i}"))
        )
        out = (
            out.withColumn(f"__p{i}", pos)
            .join(
                lane_tbl,
                F.expr(f"__p{i} div {_LANE_BITS}") == F.col(f"__l{i}"),
                "left",
            )
            .drop(f"__l{i}")
        )
        mask = F.expr(f"shiftleft(cast(1 as bigint), cast(__p{i} % {_LANE_BITS} as int))")
        checks.append(F.coalesce(F.col(f"__b{i}"), F.lit(0)).bitwiseAND(mask) != 0)
    member = checks[0]
    for c in checks[1:]:
        member = member & c
    out = out.withColumn(out_col, member)
    return out.drop(*[f"__p{i}" for i in range(len(seeds))], *[f"__b{i}" for i in range(len(seeds))])
