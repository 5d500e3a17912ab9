"""Time-window partition planning (S4, ticket.py:31-38) + adaptive
bisection (S3, ticket.py:41-67).

In the reference these drive a serial fetch loop; here they drive
``DataSourceReader.partitions()`` — every window is an independent Spark
task, so a 5-year backfill parallelizes across the cluster instead of
looping on one thread.
"""

from __future__ import annotations

from datetime import datetime, timedelta

MIN_SPLIT = timedelta(hours=1)  # recursion floor (ticket.py:43)


def split_windows(
    start: datetime, end: datetime, delta: timedelta
) -> list[tuple[datetime, datetime]]:
    """Split [start, end) into consecutive windows of at most ``delta``.

    Properties (used by the property tests): windows cover [start, end)
    exactly, are non-overlapping, ordered, and every window except
    possibly the last spans exactly ``delta``.
    """
    if delta <= timedelta(0):
        raise ValueError("delta must be positive")
    out: list[tuple[datetime, datetime]] = []
    cur = start
    while cur < end:
        nxt = min(cur + delta, end)
        out.append((cur, nxt))
        cur = nxt
    return out


def bisect_window(
    start: datetime, end: datetime, min_delta: timedelta = MIN_SPLIT
) -> tuple[tuple[datetime, datetime], tuple[datetime, datetime]] | None:
    """Halve a failing window (S3). None when the floor is reached —
    the caller skips the window and continues (T4 failure isolation)."""
    if end - start <= min_delta:
        return None
    mid = start + (end - start) / 2
    return (start, mid), (mid, end)
