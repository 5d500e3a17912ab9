"""Edge-case tests for operators/temporal.py (as-of join, binned
interval join, sessionization) on tiny constructed frames — the oracle
parity suite covers the fixture-scale behavior."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.temporal import (
    as_of_join,
    binned_interval_join,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def test_asof_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L1"), (1, _ts(5), "L2"), (2, _ts(10), "L3")],
        "k int, ts timestamp, lid string",
    )
    right = spark.createDataFrame(
        # two right rows at the exact left ts -> greatest rid wins;
        # key 2 has only a LATER right row -> null
        [(1, _ts(10), 7, "A"), (1, _ts(10), 9, "B"), (1, _ts(1), 3, "C"), (2, _ts(11), 5, "D")],
        "k int, ts timestamp, rid long, payload string",
    )
    out = as_of_join(
        left, right, keys=["k"], ts_col="ts", payload_cols=["payload"], right_id_col="rid"
    )
    got = {r["lid"]: r["asof_payload"] for r in out.collect()}
    assert got == {"L1": "B", "L2": "C", "L3": None}


def test_asof_never_looks_forward(spark):
    left = spark.createDataFrame([(1, _ts(0), "L")], "k int, ts timestamp, lid string")
    right = spark.createDataFrame(
        [(1, _ts(0.000001), 1, "future")], "k int, ts timestamp, rid long, payload string"
    )
    out = as_of_join(
        left, right, keys=["k"], ts_col="ts", payload_cols=["payload"], right_id_col="rid"
    )
    assert out.collect()[0]["asof_payload"] is None


def test_interval_join_spans_bins_and_excludes_end(spark):
    # 90-minute interval with 3600 s bins spans 3 bins; end exclusive
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(5400), "W")], "k int, s timestamp, e timestamp, wid string"
    )
    pts = spark.createDataFrame(
        [(1, _ts(-1), 0), (1, _ts(0), 1), (1, _ts(5399), 2), (1, _ts(5400), 3), (2, _ts(10), 4)],
        "k int, ts timestamp, pid int",
    )
    pair = binned_interval_join(
        pts, iv, keys=["k"], point_ts="ts", start_col="s", end_col="e", bin_seconds=3600
    )
    assert sorted(r["pid"] for r in pair.collect()) == [1, 2]  # start inclusive, end exclusive


def test_interval_join_left_keeps_empty_windows(spark):
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(60), "W1"), (2, _ts(0), _ts(60), "W2")],
        "k int, s timestamp, e timestamp, wid string",
    )
    pts = spark.createDataFrame([(1, _ts(30), 1)], "k int, ts timestamp, pid int")
    out = binned_interval_join(
        pts, iv, keys=["k"], point_ts="ts", start_col="s", end_col="e",
        bin_seconds=60, how="left",
    )
    rows = {r["wid"]: r["pid"] for r in out.collect()}
    assert rows == {"W1": 1, "W2": None}


def test_interval_join_rejects_unknown_how(spark):
    iv = spark.createDataFrame([(1, _ts(0), _ts(1), "W")], "k int, s timestamp, e timestamp, wid string")
    pts = spark.createDataFrame([(1, _ts(0), 1)], "k int, ts timestamp, pid int")
    with pytest.raises(ValueError):
        binned_interval_join(
            pts, iv, keys=["k"], point_ts="ts", start_col="s", end_col="e",
            bin_seconds=60, how="full",
        ).collect()


def test_sessionize_gap_boundary(spark):
    # gap EXACTLY equal to the threshold does NOT start a new session
    e = spark.createDataFrame(
        [(1, _ts(0), 1), (1, _ts(1800), 2), (1, _ts(3600.000001), 3), (2, _ts(0), 4)],
        "k int, ts timestamp, eid int",
    )
    out = sessionize(e, keys=["k"], ts_col="ts", gap_seconds=1800, order_tiebreak="eid")
    got = {r["eid"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_agrees_with_builtin_session_window(spark):
    """The composed gaps-and-islands sessionizer and Spark's built-in
    F.session_window produce the same per-user session-size multisets
    on real (microsecond-resolution) timestamps. Boundary semantics
    differ only when a gap is EXACTLY the threshold (ours: same
    session; session_window: new session) — measure-zero on this data.
    The composed form exists because it yields per-ROW session ids
    (joinable back to events); the built-in aggregates only."""
    from collections import Counter

    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.operators.temporal import (
        sessionize,
    )
    from integration_octadeskoctadesk_data_pipeline_useuniformes_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts", "event_id"
    )
    ours = (
        sessionize(e, ["user_id"], "ts", gap_seconds=3600, order_tiebreak="event_id")
        .groupBy("user_id", "session_id")
        .count()
        .collect()
    )
    builtin = (
        e.groupBy("user_id", F.session_window("ts", "1 hour"))
        .count()
        .collect()
    )
    ours_sizes = Counter((r.user_id, r["count"]) for r in ours)
    builtin_sizes = Counter((r.user_id, r["count"]) for r in builtin)
    assert ours_sizes == builtin_sizes
