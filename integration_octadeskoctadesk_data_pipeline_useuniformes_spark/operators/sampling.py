"""Deterministic sampling operators for training-data curation.

``df.sample()`` is seed-dependent per PARTITION: the selected rows
change whenever the partitioning, cluster size, or input order changes —
useless for reproducible dataset releases. Both operators here derive
the keep/drop decision from a hash of the row's stable id, so the same
corpus always yields the same sample, on any cluster, in any order, and
re-runs are incremental-friendly (a new row's fate doesn't disturb old
rows). Both are pure narrow projections/filters — no shuffle at all for
the stratified sample; one window shuffle (keyed by group, combinable)
for the per-group cap.

Reference parity: the reference has no sampling at all (SURVEY §2.5) —
extension tier for the 100 TB curation path, where "take 20 % of non-
English, 50 % of English, cap every source at N docs" is the everyday
shape of corpus mixing.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["stratified_sample", "cap_per_group", "proportional_resample"]


def _hash_hex4(id_col: Column, salt: str) -> Column:
    """First 4 hex chars of md5(salt || id) — a uniform draw with
    1/65536 granularity, identical in Spark and any md5-capable SQL
    engine (the oracle compares the same string)."""
    return F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 4)


def rate_threshold_hex(rate: float) -> str | None:
    """4-hex-char threshold such that P(hash < threshold) ≈ rate.

    Returns None for rate >= 1 (keep everything — a 5-char threshold
    would compare lexicographically wrong)."""
    if rate >= 1.0:
        return None
    return format(max(int(rate * 65536), 0), "04x")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: Mapping[str, float],
    default_rate: float,
    *,
    salt: str = "samp:",
) -> DataFrame:
    """Keep each row with a per-stratum probability, deterministically.

    ``rates`` maps stratum value → sampling rate; unmatched strata use
    ``default_rate``. Pure filter — no shuffle, fully pushdown-friendly,
    and the decision for a given (salt, id) never changes.
    """
    h = _hash_hex4(F.col(id_col), salt)
    thresh: Column = (
        F.lit(rate_threshold_hex(default_rate))
        if rate_threshold_hex(default_rate) is not None
        else F.lit(None)
    )
    expr = None
    for value, rate in rates.items():
        t = rate_threshold_hex(rate)
        branch = F.lit(t)
        expr = (expr if expr is not None else F).when(
            F.col(strata_col) == value, branch
        )
    thresh_col = expr.otherwise(thresh) if expr is not None else thresh
    # null threshold == rate >= 1 == keep
    return df.filter(thresh_col.isNull() | (h < thresh_col))


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    k: int,
    *,
    salt: str = "cap:",
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by hash order — a
    deterministic uniform-without-replacement draw (reservoir-sample
    semantics, reproducible across runs and cluster layouts).

    One keyed window (row_number over hash order); the hash tie-breaks
    on the id itself so the selection is a total order.
    """
    h = _hash_hex4(F.col(id_col), salt)
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _hash_u32(id_col: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt || id) as a uniform draw in
    [0, 2^32) — integer form so data-dependent rates can be compared
    exactly in-plan (hash · count < 2³² · target) with no float."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def proportional_resample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    *,
    salt: str = "mix:",
) -> DataFrame:
    """Rebalance strata to a uniform mixture, deterministically.

    Each stratum is downsampled to (approximately) the size of the
    smallest stratum: keep iff hash(id)·count(stratum) < 2³²·min_count.
    Unlike ``stratified_sample`` the rates are *data-dependent* — they
    are computed inside the plan (a tiny per-stratum count aggregate
    broadcast back onto the rows, plus a 1-row global min), so there is
    no collect, no recompile per corpus, and re-runs on a grown corpus
    keep/drop each old row consistently as rates drift.

    Scale: the counts aggregate is map-side combinable (one row per
    stratum); the join back is a broadcast; the filter itself is narrow.
    The only full pass over the data is the count.
    """
    cnt = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__cnt"))
    min_c = cnt.agg(F.min("__cnt").alias("__min_cnt"))
    h = _hash_u32(F.col(id_col), salt)
    return (
        df.join(F.broadcast(cnt), strata_col)
        .crossJoin(F.broadcast(min_c))
        .filter(h * F.col("__cnt") < F.lit(4294967296) * F.col("__min_cnt"))
        .drop("__cnt", "__min_cnt")
    )


def temperature_resample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    *,
    salt: str = "temp:",
) -> DataFrame:
    """Partial (temperature) rebalance: keep rate sqrt(min_count/count)
    per stratum — between full proportional flattening (rate min/c) and
    no resampling, the standard smoothing for multilingual/source
    mixing where flattening overweights tiny strata. Kept strata sizes
    become sqrt(c·min): still ordered by size, but compressed.

    The exponent is fixed at 0.5 because sqrt is an IEEE-exact
    operation computed identically in any engine — an arbitrary
    temperature would need pow(), whose last-bit behavior is
    library-specific and would break value parity. Same plan shape as
    proportional_resample: one map-combinable count, two broadcasts,
    narrow filter; decisions are per-(salt,id) deterministic."""
    cnt = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__cnt"))
    min_c = cnt.agg(F.min("__cnt").alias("__min_cnt"))
    h = _hash_u32(F.col(id_col), salt)
    return (
        df.join(F.broadcast(cnt), strata_col)
        .crossJoin(F.broadcast(min_c))
        .filter(
            h.cast("double") * F.sqrt(F.col("__cnt").cast("double"))
            < F.lit(4294967296.0) * F.sqrt(F.col("__min_cnt").cast("double"))
        )
        .drop("__cnt", "__min_cnt")
    )
