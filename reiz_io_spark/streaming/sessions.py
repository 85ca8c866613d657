"""Stateful streaming sessionization (gap-based session windows) via
applyInPandasWithState.

The batch twin is __spark_entry__._sessionize (lag + running-sum over a
window); this is the same operator for unbounded input: per-user state
carries the OPEN session (last event time, session ordinal, running
count/sum) across micro-batches, a new session starts when the gap to
the previous event exceeds ``gap_s``, and output is UPDATE-mode — every
batch emits the current aggregate of each session it touched (sinks
upsert by (user_id, sess_no); the final emit for a session equals the
batch operator's row, which the test asserts across a micro-batch
boundary that splits sessions). An event-time timeout at
last_ts + gap (under the watermark) closes idle sessions and frees
their state, so state size is O(active users), not O(history).

The reference has no streaming at all; this implements the Structured
Streaming shape the task brief names (watermark + custom stateful
operator via applyInPandasWithState).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, sess_no int, n_events long, sess_value double, open boolean"
)
STATE_SCHEMA = "last_ts double, sess_no int, n_events long, sess_value double"


def _sessionize_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState, gap_s: float
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        last_ts, sess_no, n_ev, sval = state.get
        state.remove()
        yield pd.DataFrame(
            [(user_id, int(sess_no), int(n_ev), float(sval), False)],
            columns=["user_id", "sess_no", "n_events", "sess_value", "open"],
        )
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="stable")
    ts = rows["ts"].astype("int64").to_numpy() / 1e9  # epoch seconds
    vals = rows["value"].to_numpy()
    if state.exists:
        last_ts, sess_no, n_ev, sval = state.get
    else:
        last_ts, sess_no, n_ev, sval = float("-inf"), 0, 0, 0.0
    out: list[tuple] = []
    for i in range(len(rows)):
        if ts[i] - last_ts > gap_s:
            if sess_no > 0:  # close the previous session (final emit)
                out.append((user_id, sess_no, n_ev, sval, False))
            sess_no += 1
            n_ev, sval = 0, 0.0
        n_ev += 1
        sval += float(vals[i])
        last_ts = ts[i]
    out.append((user_id, sess_no, n_ev, sval, True))  # open session update
    state.update((float(last_ts), int(sess_no), int(n_ev), float(sval)))
    state.setTimeoutTimestamp(int((last_ts + gap_s) * 1000))
    yield pd.DataFrame(
        out, columns=["user_id", "sess_no", "n_events", "sess_value", "open"]
    )


def sessionize_stream(
    events: DataFrame, gap_s: float = 1800.0, watermark: str = "1 hour"
) -> DataFrame:
    """events stream (event_id, user_id, ts, value, ...) -> update-mode
    session aggregates (user_id, sess_no, n_events, sess_value, open)."""

    def fn(key, pdfs, state):
        yield from _sessionize_user(key, pdfs, state, gap_s)

    # watermarks need a session-tz timestamp; parquet TIMESTAMP_NTZ
    # columns arrive as timestamp_ntz, which withWatermark rejects
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
