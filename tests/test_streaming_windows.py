"""Streaming watermarked tumbling-window agg == the batch operator,
with late-arriving events updating already-emitted windows."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from reiz_io_spark.streaming.windows import tumbling_window_stream

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch_with_late_data(spark, tmp_path):
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    # split by event_id parity: the second micro-batch carries events
    # with OLD timestamps (late relative to batch 1's max event time)
    events.filter(F.pmod("event_id", F.lit(2)) == 0).coalesce(1).write.parquet(
        landing + "/c0"
    )
    time.sleep(1.1)
    events.filter(F.pmod("event_id", F.lit(2)) == 1).coalesce(1).write.parquet(
        landing + "/c1"
    )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    out = tumbling_window_stream(stream, window="1 hour", watermark="240 hours")

    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            emitted.append(
                (batch_id, r["window_start"], r["event_type"],
                 r["n_events"], r["total_value"])
            )

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    latest: dict[tuple, tuple] = {}
    for bid, ws, et, n, tv in sorted(emitted, key=lambda t: t[0]):
        latest[(ws, et)] = (n, round(tv, 6))
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in entrymod._tumbling(spark, SF_DIR).collect()
    }
    assert latest == batch

    # late data genuinely updated earlier windows: some (window, type)
    # key was emitted in BOTH micro-batches
    per_key_batches: dict[tuple, set] = {}
    for bid, ws, et, *_ in emitted:
        per_key_batches.setdefault((ws, et), set()).add(bid)
    assert any(len(b) > 1 for b in per_key_batches.values())
