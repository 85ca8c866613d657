"""Streaming backward as-of join — the online twin of
operators/asof.asof_join_backward: each LEFT event (e.g. purchase) is
joined to the latest RIGHT event (e.g. click) at or before it for the
same key, AS THE EVENTS ARRIVE, without re-scanning history per batch.

Shape: one stream carrying both sides (tagged by event type), keyed by
the join key into applyInPandasWithState. State per key is ONE row —
the latest right event seen (ts, id, payload) — updated as right rows
stream through; each left row is emitted immediately, joined against
the state at that moment. State size is O(active keys), independent of
history length (the trade that makes the operator viable on an
unbounded stream).

Ordering contract (the standard streaming as-of assumption — a Kafka
topic partitioned by the key delivers exactly this): each key's events
arrive in timestamp order ACROSS batches. Within a batch, rows are
sorted (ts asc, right-before-left at equal ts, id asc) before the
state walk, so the batch operator's tie rule holds exactly; under the
ordering contract the streamed output row-for-row equals
asof_join_backward run offline over the union of all batches
(pytest: time-split batches, full equality including never-matched
lefts). A right event arriving LATE (after a left it should have
matched was already emitted) cannot retroactively rewrite that left —
the batch operator remains the backfill path, same as every
streaming/batch lambda pair in this package.

Contract violations are MEASURED, not silently absorbed (r6): the
state carries the key's emitted-left high-water mark, and every
arrival that breaks the cross-batch order — a right at or before the
last emitted left (that left would have matched it), or a left before
the state's right (it now matches a right from its own future) — adds
to the caller-supplied accumulator (ooo_counter). Operators watch the
counter to know when the documented no-rewrite behavior has actually
lost matches and a batch backfill is required.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, ts timestamp_ntz, event_id long, right_value double, "
    "right_ts timestamp_ntz, right_id long"
)
_STATE_SCHEMA = (
    "right_ts long, right_id long, right_value double, max_left_ts long"
)


def _asof_kernel(ooo_counter=None):
    """Bind the (optional) out-of-order accumulator into the stateful
    kernel. The counter is a plain SparkContext accumulator: updates
    flow back from the Python workers per task, so violations are
    visible on the driver even in batches that emit no left rows."""

    def _asof_for_key(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        # batch-operator tie rule: right rows order before left rows at
        # equal ts; ties within a side break by id
        rows = rows.sort_values(
            ["ts", "_is_right", "event_id"], ascending=[True, False, True],
            kind="stable",
        )
        if state.exists:
            r_ts_us, r_id, r_val, max_left_us = state.get
            if max_left_us is not None and max_left_us < 0:
                max_left_us = None  # sentinel: no left emitted yet
        else:
            r_ts_us, r_id, r_val, max_left_us = None, None, None, None
        # violation detection compares THIS batch's arrivals against the
        # PRIOR batches' high-water marks (within a batch the sort above
        # restores order, so only cross-batch disorder loses matches)
        prior_left_us = max_left_us
        prior_right_us = r_ts_us
        ooo = 0

        out = {k: [] for k in (
            "user_id", "ts", "event_id", "right_value", "right_ts", "right_id"
        )}
        uid = int(key[0])
        for ts_v, is_r, eid, val in zip(
            rows["ts"], rows["_is_right"], rows["event_id"], rows["value"]
        ):
            ts_us = int(ts_v.value // 1_000)  # pandas ns -> micros
            if is_r == 1:
                # a right at/before the last emitted left: that left
                # would have matched it offline — match is lost
                if prior_left_us is not None and ts_us <= prior_left_us:
                    ooo += 1
                r_ts_us = ts_us
                r_id = int(eid)
                r_val = None if pd.isna(val) else float(val)
            else:
                # a left before the state's right: it now joins a right
                # from its own future — offline it would not
                if prior_right_us is not None and ts_us < prior_right_us:
                    ooo += 1
                max_left_us = ts_us if max_left_us is None else max(
                    max_left_us, ts_us
                )
                out["user_id"].append(uid)
                out["ts"].append(ts_v)
                out["event_id"].append(int(eid))
                out["right_value"].append(r_val)
                out["right_ts"].append(
                    None if r_ts_us is None
                    else pd.Timestamp(r_ts_us * 1_000)
                )
                out["right_id"].append(r_id)
        if ooo and ooo_counter is not None:
            ooo_counter.add(ooo)
        if r_ts_us is not None or max_left_us is not None:
            state.update((
                r_ts_us, r_id, r_val,
                -1 if max_left_us is None else max_left_us,
            ))
        yield pd.DataFrame({
            "user_id": pd.Series(out["user_id"], dtype="int64"),
            "ts": pd.Series(out["ts"], dtype="datetime64[ns]"),
            "event_id": pd.Series(out["event_id"], dtype="int64"),
            "right_value": pd.Series(out["right_value"], dtype="float64"),
            "right_ts": pd.Series(out["right_ts"], dtype="datetime64[ns]"),
            "right_id": pd.Series(out["right_id"], dtype="Int64"),
        })

    return _asof_for_key


def make_ooo_counter(spark):
    """An accumulator for asof_join_stream's ordering-contract
    violations. Read `counter.value` on the driver (e.g. alongside
    query.lastProgress) — a non-zero, growing value means late arrivals
    have lost matches and the batch operator should backfill."""
    return spark.sparkContext.accumulator(0)


def asof_join_stream(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    left_type: str = "purchase",
    right_type: str = "click",
    value_col: str = "value",
    ooo_counter=None,
) -> DataFrame:
    """events stream -> one row per LEFT event: (key, ts, id,
    right_value, right_ts, right_id), right_* null when no right event
    has arrived for the key yet. The stream's only shuffle is the key
    grouping. Pass ooo_counter=make_ooo_counter(spark) to count
    per-key ordering-contract violations (see module docstring)."""
    tagged = (
        events.filter(F.col("event_type").isin([left_type, right_type]))
        .select(
            F.col(key).alias("user_id"),
            F.col(ts).alias("ts"),
            F.col(id_col).alias("event_id"),
            F.col(value_col).alias("value"),
            F.when(F.col("event_type") == right_type, F.lit(1))
            .otherwise(F.lit(0)).alias("_is_right"),
        )
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _asof_kernel(ooo_counter),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_REORDER_STATE_SCHEMA = (
    "right_ts long, right_id long, right_value double, "
    "buf_ts array<long>, buf_id array<long>, buf_right array<int>, "
    "buf_val array<double>, prev_wm long"
)


def _asof_reorder_kernel(ooo_counter=None):
    """Watermark-bounded reorder buffer: every arrival parks in state
    until the event-time watermark passes its timestamp, then the ripe
    rows are processed in exact (ts, right-first, id) order — so ANY
    disorder within the watermark delay yields output identical to the
    offline batch operator, not just the per-batch-sorted approximation
    of the plain kernel. The price is bounded: emission lags the
    watermark delay, and state holds only each key's in-flight window.

    Rows arriving BEYOND the delay (ts at or under the previous
    watermark) are the residual contract violations: counted on
    ooo_counter and processed best-effort — a late right older than
    the carried right is SKIPPED (the newer carry is what every future
    left should match offline), a late left older than the carry emits
    a null right rather than fabricate a from-the-future match."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            (r_ts_us, r_id, r_val, buf_ts, buf_id, buf_right, buf_val,
             prev_wm) = state.get
        else:
            r_ts_us, r_id, r_val = None, None, None
            buf_ts, buf_id, buf_right, buf_val = [], [], [], []
            prev_wm = 0
        wm_us = state.getCurrentWatermarkMs() * 1_000
        ooo = 0

        pend = list(zip(buf_ts, buf_id, buf_right, buf_val))
        for ts_v, is_r, eid, val in zip(
            rows["ts"], rows["_is_right"], rows["event_id"], rows["value"]
        ):
            ts_us = int(ts_v.value // 1_000)
            if prev_wm and ts_us <= prev_wm:
                ooo += 1  # beyond the delay bound: disorder not absorbed
            pend.append((
                ts_us, int(eid), int(is_r),
                None if pd.isna(val) else float(val),
            ))
        # ripe = at/under the watermark: no earlier event can still
        # arrive inside the contract, so exact-order processing is safe
        ripe = sorted(
            (p for p in pend if p[0] <= wm_us),
            key=lambda p: (p[0], -p[2], p[1]),
        )
        keep = [p for p in pend if p[0] > wm_us]

        out = {k: [] for k in (
            "user_id", "ts", "event_id", "right_value", "right_ts", "right_id"
        )}
        uid = int(key[0])
        for ts_us, eid, is_r, val in ripe:
            if is_r == 1:
                if r_ts_us is not None and ts_us < r_ts_us:
                    continue  # late right older than the carry: skip
                r_ts_us, r_id, r_val = ts_us, eid, val
            else:
                if r_ts_us is not None and r_ts_us > ts_us:
                    # late left older than the carry — the right it
                    # would match offline is gone; emit unmatched
                    rv, rt, ri = None, None, None
                else:
                    rv = r_val
                    rt = (
                        None if r_ts_us is None
                        else pd.Timestamp(r_ts_us * 1_000)
                    )
                    ri = r_id
                out["user_id"].append(uid)
                out["ts"].append(pd.Timestamp(ts_us * 1_000))
                out["event_id"].append(eid)
                out["right_value"].append(rv)
                out["right_ts"].append(rt)
                out["right_id"].append(ri)
        if ooo and ooo_counter is not None:
            ooo_counter.add(ooo)
        state.update((
            r_ts_us, r_id, r_val,
            [p[0] for p in keep], [p[1] for p in keep],
            [p[2] for p in keep], [p[3] for p in keep],
            wm_us,
        ))
        yield pd.DataFrame({
            "user_id": pd.Series(out["user_id"], dtype="int64"),
            "ts": pd.Series(out["ts"], dtype="datetime64[ns]"),
            "event_id": pd.Series(out["event_id"], dtype="int64"),
            "right_value": pd.Series(out["right_value"], dtype="float64"),
            "right_ts": pd.Series(out["right_ts"], dtype="datetime64[ns]"),
            "right_id": pd.Series(out["right_id"], dtype="Int64"),
        })

    return fn


def asof_join_stream_reordered(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    left_type: str = "purchase",
    right_type: str = "click",
    value_col: str = "value",
    max_delay: str = "30 seconds",
    ooo_counter=None,
) -> DataFrame:
    """asof_join_stream with EXACT output under bounded disorder: rows
    buffer per key until the event-time watermark (max event ts seen
    minus max_delay) passes them, then process in offline order — so
    arrivals up to max_delay out of order still produce the batch
    operator's answer, row for row (pytest: shuffled batches ==
    asof_join_backward). Emission lags by the watermark delay; rows
    later than max_delay are counted on ooo_counter (see kernel).
    State per key is O(events inside the delay window) — bounded on an
    unbounded stream, the reorder analog of the one-row plain state."""
    tagged = (
        events.filter(F.col("event_type").isin([left_type, right_type]))
        .select(
            F.col(key).alias("user_id"),
            # watermarks require TIMESTAMP; session tz is pinned UTC so
            # the cast is a pure reinterpretation of the stored ntz value
            F.col(ts).cast("timestamp").alias("ts"),
            F.col(id_col).alias("event_id"),
            F.col(value_col).alias("value"),
            F.when(F.col("event_type") == right_type, F.lit(1))
            .otherwise(F.lit(0)).alias("_is_right"),
        )
        .withWatermark("ts", max_delay)
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _asof_reorder_kernel(ooo_counter),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_REORDER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
