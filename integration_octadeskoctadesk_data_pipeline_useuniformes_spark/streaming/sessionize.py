"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY §2.10 extension).

The reference groups chat events per chat eagerly (chat.py:274-287); the
streaming-native generalization is gap sessionization: events for a key
belong to one session until a silence longer than ``gap``; a session is
emitted when the event-time watermark guarantees no earlier event can
still arrive (state timeout), so output is final and state is bounded.

Scale shape: state lives per key in the state store, sharded by the
groupBy hash — 1000 executors each hold their keys' open sessions only;
the watermark evicts state for idle keys via EventTimeTimeout, so state
size tracks ACTIVE keys, not history.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

#: open-session state: (start_ms, end_ms, n_events)
STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)

_MS = 1_000


def _to_ms(ts) -> int:
    return int(ts.timestamp() * _MS)


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    gap_s: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions over a (streaming) event frame.

    Emits one row per CLOSED session: (key, session_start, session_end,
    n_events). A session closes when a same-key event arrives more than
    ``gap_s`` after its last event, or when the watermark passes
    session_end + gap (event-time timeout — covers keys that simply go
    quiet).
    """
    import pandas as pd

    gap_ms = gap_s * _MS

    def fn(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        def emit(start_ms: int, end_ms: int, n: int) -> "pd.DataFrame":
            return pd.DataFrame(
                {
                    "key": [str(key[0])],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield emit(start_ms, end_ms, n)
            return

        times: list[int] = []
        for pdf in pdfs:
            times.extend(_to_ms(t) for t in pdf[time_col])
        times.sort()

        cur = list(state.get) if state.exists else None
        for t in times:
            if cur is None:
                cur = [t, t, 0]
            elif t - cur[1] > gap_ms:
                yield emit(cur[0], cur[1], cur[2])
                cur = [t, t, 0]
            cur[1] = max(cur[1], t)
            cur[2] += 1

        if cur is not None:
            state.update(tuple(cur))
            # close once the watermark passes last-event + gap
            state.setTimeoutTimestamp(cur[1] + gap_ms)

    stream = events.withWatermark(time_col, watermark)
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
