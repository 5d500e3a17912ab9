"""In-flight data-quality guards via ``Observation`` metrics.

A pipeline must refuse to publish a batch whose key columns went null or
whose volume collapsed — but a separate validation pass would scan the
data twice. ``df.observe`` piggybacks aggregate metrics on the WRITE
action itself: the metrics are collected by the same tasks that produce
the output, cost nothing extra, and are exact (unlike accumulators,
observed metrics are not double-counted on task retry).

Usage::

    guarded, obs = observe_quality(df, key_cols=["n_ticket"])
    guarded.write.parquet(dst)                 # one pass: data + metrics
    enforce_quality(obs, max_null_frac=0.01, min_rows=1)

At 100 TB this is the difference between a guard you can afford on every
batch and one you run weekly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class QualityViolation(RuntimeError):
    """A published-data invariant failed for this batch."""


def observe_quality(
    df: DataFrame,
    key_cols: Sequence[str],
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row-count and per-key-column null-count metrics to the
    next action on ``df``. Returns (df, observation)."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in key_cols:
        metrics.append(F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}"))
    return df.observe(obs, *metrics), obs


def enforce_quality(
    obs: Observation,
    max_null_frac: float = 0.0,
    min_rows: int = 1,
) -> dict:
    """Raise QualityViolation if the observed batch broke an invariant;
    returns the metrics dict otherwise. Call AFTER the action ran."""
    got = obs.get
    n = got["n_rows"]
    if n < min_rows:
        raise QualityViolation(f"batch has {n} rows < min_rows={min_rows}")
    for k, v in got.items():
        if k.startswith("n_null_") and n and (v or 0) / n > max_null_frac:
            raise QualityViolation(
                f"{k[len('n_null_'):]}: {v}/{n} null > max_null_frac={max_null_frac}"
            )
    return dict(got)
