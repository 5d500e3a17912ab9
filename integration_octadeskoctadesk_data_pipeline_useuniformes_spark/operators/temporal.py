"""Temporal relational operators Spark has no built-in for: as-of join,
interval (range) join, and batch sessionization.

These are the classic time-series primitives (kdb+ ``aj``, DuckDB
``ASOF JOIN``, Flink interval join). Spark's DataFrame API has no direct
operator, but each has a shuffle-efficient composition of built-ins — no
Python UDFs, no per-key collects, no quadratic blowup:

- **as-of join** — union the two tagged streams and run one
  ``last(..., ignorenulls=True)`` window per payload column. ONE shuffle
  (partition by key, sort by time within partition); at 100 TB this is a
  single repartition+sort, the same cost as any keyed window, and never
  materializes candidate pairs the way a naive ``t_left >= t_right``
  range join would (which Spark plans as a per-key cartesian).
- **interval join** — quantize time into fixed-width bins; an interval
  overlaps ``len/width + 1`` bins at most, so exploding intervals to
  their covered bins turns the inequality join into an EQUI-join on
  ``(key, bin)``. Shuffle is hash-partitioned and AQE-skew-splittable;
  the residual exact range predicate filters inside the join. Bounded
  duplication factor replaces an unbounded range-join fan-out.
- **sessionization** — gaps-and-islands with two windows over one sort:
  ``lag`` marks session starts, a running sum numbers them. Equivalent
  semantics to ``F.session_window`` aggregation but keeps the session id
  on every row, which the streaming variant
  (``streaming/sessionize.py``, applyInPandasWithState) also exposes.

Reference parity: the reference pipeline (main.py:89-125) never joins on
time — these cover SURVEY §2's extension tier ("operators a time-aware
pipeline needs") and mirror the update-path's "latest state at-or-before
now" semantics (update_tickets.py:4-8) generalized to any timestamp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["as_of_join", "binned_interval_join", "scd2_intervals", "sessionize"]


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    *,
    right_id_col: str,
    prefix: str = "asof_",
) -> DataFrame:
    """For each ``left`` row, attach the payload of the latest ``right``
    row with the same keys and ``right.ts <= left.ts`` (inclusive).

    Ties: a right row AT the left row's timestamp matches (at-or-before);
    among right rows sharing a timestamp the one with the greatest
    ``right_id_col`` wins, making the result deterministic.

    Plan shape: unionByName → single window (one shuffle on ``keys``,
    one sort on ``(ts, side, id)``) → filter back to left rows. Payload
    columns come back as ``{prefix}{col}``, null when no right row
    precedes the left row.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)

    # side flag: right=0 sorts before left=1 at equal ts -> inclusive match
    r = right.select(
        *keys,
        ts_col,
        F.col(right_id_col).alias("__rid"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    l = left.withColumn("__side", F.lit(1)).withColumn("__rid", F.lit(None).cast("long"))
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload_cols:
        u = u.withColumn(f"{prefix}{c}", F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop(
        "__side", "__rid", *[f"__p_{c}" for c in payload_cols]
    )


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    *,
    bin_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join each interval ``[start, end)`` to the points it contains,
    sharing ``keys`` — without a range-join cartesian.

    Both sides are quantized to ``bin_seconds``-wide bins; intervals
    explode to every bin they overlap (``sequence`` of bin ids), points
    map to exactly one bin, and the join becomes an equi-join on
    ``(keys..., bin)`` with the exact ``start <= ts < end`` predicate as
    a residual filter. Choose ``bin_seconds`` near the typical interval
    length: duplication is ``ceil(len/bin)+1`` per interval, and the
    shuffle stays hash-partitioned (AQE can split skewed bins).

    ``how="left"`` keeps intervals with no points (point columns null),
    implemented as the inner pair-join plus an anti-joined remainder —
    the left side of the equi-join cannot simply be outer because an
    interval appears once per overlapped bin.
    """
    keys = list(keys)
    # explicit aliases: both sides often derive from the same scan (a
    # self-join on events), which trips Spark's ambiguous-column check
    binned_pts = points.withColumn(
        "__bin", (F.unix_micros(F.col(point_ts).cast("timestamp")) / (bin_seconds * 1_000_000)).cast("long")
    ).alias("__pt")
    expl = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col).cast("timestamp")) / (bin_seconds * 1_000_000)).cast("long"),
                # end is exclusive, but a point in the end bin can still be < end
                (F.unix_micros(F.col(end_col).cast("timestamp")) / (bin_seconds * 1_000_000)).cast("long"),
            )
        ),
    ).alias("__iv")
    iv = lambda c: F.col(f"__iv.{c}")  # noqa: E731
    pt = lambda c: F.col(f"__pt.{c}")  # noqa: E731
    cond = [iv(k) == pt(k) for k in keys] + [
        iv("__bin") == pt("__bin"),
        pt(point_ts) >= iv(start_col),
        pt(point_ts) < iv(end_col),
    ]
    pair = expl.join(binned_pts, cond, "inner")
    # pick columns: all interval cols + point cols (point keys/ts deduped by caller)
    pair = pair.select(
        *[iv(c) for c in intervals.columns],
        *[pt(c).alias(c if c not in intervals.columns else f"pt_{c}") for c in points.columns],
    )
    if how == "inner":
        return pair
    if how != "left":
        raise ValueError(f"unsupported how={how!r}")
    matched = pair
    unmatched = intervals.join(
        matched.select(*intervals.columns).distinct(), intervals.columns, "left_anti"
    )
    for c in points.columns:
        out_name = c if c not in intervals.columns else f"pt_{c}"
        unmatched = unmatched.withColumn(out_name, F.lit(None).cast(dict(points.dtypes)[c]))
    return matched.unionByName(unmatched)


def scd2_intervals(
    log: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    state_col: str,
    *,
    tiebreak: str,
) -> DataFrame:
    """Collapse a change log into SCD-type-2 validity intervals: one row
    per (keys, state) RUN, with ``valid_from`` / ``valid_to`` (null =
    still current) and an ``is_current`` flag.

    This is the warehouse-side generalization of the reference's
    update-in-place path (ticket.py:173-184 UPDATEs the latest status,
    destroying history) — SCD2 keeps every state with its validity
    window instead.

    Plan: one partition+sort per key feeds both the run-collapse
    (``lag(state) IS DISTINCT FROM state`` marks run heads) and, after
    the filter, the ``lead`` that closes each interval. Two window
    stages over the same key — Catalyst reuses the hash partitioning;
    rows shrink to one per run between them. Consecutive equal states
    (including equal nulls, via null-safe comparison) merge into one
    interval.
    """
    keys = list(keys)
    order = [F.col(ts_col).asc(), F.col(tiebreak).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    heads = log.withColumn("__prev", F.lag(state_col).over(w)).filter(
        ~F.col("__prev").eqNullSafe(F.col(state_col))
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    out = heads.withColumn("valid_to", F.lead(ts_col).over(w2))
    return out.select(
        *keys,
        state_col,
        F.col(ts_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def sessionize(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    *,
    gap_seconds: int,
    order_tiebreak: str,
) -> DataFrame:
    """Assign a per-key session index: a new session starts when the gap
    from the previous event exceeds ``gap_seconds``.

    Two windows over ONE partition+sort (Catalyst reuses the exchange and
    the sort): ``lag`` flags session starts, a running ``sum`` turns the
    flags into 1-based session numbers. Every input row is preserved with
    a ``session_id`` column — aggregate downstream as needed.
    """
    keys = list(keys)
    order = [F.col(ts_col).asc(), F.col(order_tiebreak).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev.isNull()
        | (F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(prev.cast("timestamp"))
           > gap_seconds * 1_000_000)
    ).cast("long")
    running = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_id", F.sum(is_new).over(running))
