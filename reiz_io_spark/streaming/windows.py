"""Streaming event-time windowed aggregation with a watermark — the
streaming twin of the batch `events_tumbling_window` driver entry (the
same F.window expression; the watermark bounds how late an event may
arrive and still update its window, and lets the state store expire
closed windows).

Late data inside the watermark UPDATES the already-emitted window
aggregate (update output mode; sinks upsert by (window_start,
event_type)); data later than the watermark is dropped by Spark. The
test streams shuffled micro-batches — so most events are "late"
relative to the running max event time — and asserts the final
aggregates equal the batch operator exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "24 hours"
) -> DataFrame:
    """events stream (ts, event_type, value, ...) -> update-mode rows
    (window_start, event_type, n_events, total_value)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
