"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch engine sessionizes with lag + cumulative sum
(operators/sessions.sessionize); a live event stream needs per-key state
that survives micro-batches. This is the one operator class Structured
Streaming's built-in aggregates can't express (a session's end depends on
the *absence* of events), so it uses the arbitrary-stateful-processing
API: per-user state = the open session, event-time timeout = the
inactivity gap, closed sessions are APPENDed downstream.

Scale shape: state is partitioned by user across executors (one shuffle
on the grouping key per micro-batch), each key holds O(1) state (four
numbers), and the watermark bounds both late data and state lifetime —
the standard production sessionizer layout on any cluster size.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# Open-session state: epoch-ms bounds + event count (ms keeps the state
# integer-typed and timezone-proof).
STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _session_func(gap_ms: int):
    def close_sessions(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            # Watermark passed start-of-gap silence: the open session is over.
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(last_ms, unit="ms")],
                    "n_events": [n],
                }
            )
            return

        ts = pd.concat([p["ts"] for p in pdfs]).sort_values()
        ms = (ts.astype("int64") // 1_000_000).to_numpy()
        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)

        closed: list[tuple[int, int, int]] = []
        for t in ms:
            if start_ms is None:
                start_ms, last_ms, n = int(t), int(t), 1
            elif t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = int(t), int(t), 1
            else:
                last_ms, n = int(t), n + 1
        state.update((start_ms, last_ms, n))
        # Close the open session once event time passes last event + gap.
        state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return close_sessions


def stateful_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 30 * 60,
    watermark: str = "1 hour",
) -> DataFrame:
    """readStream events -> stream of CLOSED sessions (append mode).

    A session closes when its user is silent for ``gap_seconds`` of event
    time — either because a later event arrives past the gap (emitted
    immediately) or because the watermark passes the gap (event-time
    timeout fires). State per user is O(1); the watermark evicts it.
    """
    prepared = events.select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_seconds * 1000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4's successor stateful API)
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("signup", "click", "purchase")
FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("stage", LongType()),
    ]
)


def streaming_funnel_stage(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Running per-user funnel stage via ``transformWithStateInPandas``
    (the Spark 4 arbitrary-state API that supersedes
    applyInPandasWithState: typed state handles, composable state
    variables, timers).

    State per user = the first-touch timestamp of each stage (3 longs in
    a ValueState). The emitted stage counts strictly-ordered first
    touches (operators/funnel.event_funnel semantics), computed from the
    timestamp mins — so the result is independent of ARRIVAL order and,
    after an availableNow pass, equals the batch funnel stage per user
    (asserted in tests/test_stateful_streaming.py).

    Scale shape: identical to the sessionizer — one shuffle on user per
    micro-batch, O(1) state per key.

    Requires ``protobuf`` (the transformWithState control channel is
    proto-based); environments without it should use the
    applyInPandasWithState operators above — the test for this path is
    skip-marked where the dependency is absent (COVERAGE.md
    optional-dependency policy, same as sentence-transformers/umap).
    """
    try:
        from google.protobuf import descriptor as _  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pip install protobuf); use stateful_sessionize/"
            "applyInPandasWithState where it is unavailable"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    stages = FUNNEL_STAGES

    class FunnelProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._touch = handle.getValueState(
                "first_touch", "t0 long, t1 long, t2 long"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._touch.exists():
                t = list(self._touch.get())
            else:
                t = [None, None, None]
            for pdf in rows:
                for ty, ts in zip(pdf[type_col], pdf[ts_col]):
                    if ty in stages:
                        i = stages.index(ty)
                        us = int(pd.Timestamp(ts).value // 1000)
                        if t[i] is None or us < t[i]:
                            t[i] = us
            self._touch.update(tuple(t))
            stage = 0
            prev = None
            for i in range(len(stages)):
                if t[i] is None:
                    break
                if i > 0 and not (t[i] > prev):
                    break
                prev = t[i]
                stage = i + 1
            yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

        def close(self) -> None:
            pass

    prepared = events.select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(type_col).alias(type_col),
        F.col(ts_col).cast("timestamp").alias(ts_col),
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FunnelProcessor(),
        outputStructType=FUNNEL_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
