"""Streaming interval (range) join — Spark's NATIVE watermarked
stream-stream join, no custom state: all (left, right) pairs with the
same key where right.ts ∈ [left.ts + lower_s, left.ts + upper_s],
emitted as both sides stream in.

This is the one events-tier streaming operator where the built-in
machinery already IS the scale answer (Structured Streaming's
stream-stream join keeps per-key state bounded by the watermark and
the time-range condition — exactly the bucketized-join bound the batch
operator `asof.range_join_bucketed` builds by hand), so the module is
deliberately thin: two watermarks + one time-conditioned equi-join.
State eviction: a right row is dropped once the watermark passes
right.ts + upper_s; a left row once it passes left.ts (+ the range),
per Spark's stream-stream outer/inner join semantics.

Equality contract (pytest): over time-split batches with a watermark
generous enough that no event is late, the streamed pairs equal the
batch `range_join_bucketed` output row for row. Tighter watermarks
trade completeness for state, the standard knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_COLS = ["user_id", "l_id", "l_ts", "r_id", "r_ts", "micros_between"]


def range_join_stream(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    lower_s: int = 0,
    upper_s: int = 300,
    watermark: str = "30 days",
) -> DataFrame:
    """Both inputs are streams carrying (key, ts, id_col). Output
    matches the batch operator's columns: (key, l_id, l_ts, r_id,
    r_ts, micros_between)."""
    if upper_s <= lower_s:
        raise ValueError("range_join_stream: upper_s must exceed lower_s")
    # NTZ -> TS is one uniform session-tz shift applied to BOTH sides,
    # so interval membership is unaffected (same reasoning as the
    # batch operator); watermarks require TimestampType.
    lt = (
        left_stream.select(
            F.col(key).alias("user_id"),
            F.col(ts).cast("timestamp").alias("l_wts"),
            F.col(ts).alias("l_ts"),
            F.col(id_col).alias("l_id"),
        )
        .withWatermark("l_wts", watermark)
    )
    rt = (
        right_stream.select(
            F.col(key).alias("r_user_id"),
            F.col(ts).cast("timestamp").alias("r_wts"),
            F.col(ts).alias("r_ts"),
            F.col(id_col).alias("r_id"),
        )
        .withWatermark("r_wts", watermark)
    )
    cond = (
        (lt["user_id"] == rt["r_user_id"])
        & (rt["r_wts"] >= lt["l_wts"] + F.expr(f"INTERVAL {lower_s} SECOND"))
        & (rt["r_wts"] <= lt["l_wts"] + F.expr(f"INTERVAL {upper_s} SECOND"))
    )
    return lt.join(rt, cond, "inner").select(
        "user_id",
        "l_id",
        "l_ts",
        "r_id",
        "r_ts",
        (F.unix_micros(F.col("r_wts")) - F.unix_micros(F.col("l_wts")))
        .alias("micros_between"),
    )
