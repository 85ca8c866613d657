"""Stateful streaming sessionization (applyInPandasWithState) must
agree with the batch window operator, including sessions that SPAN a
micro-batch boundary (the stateful part)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from reiz_io_spark.streaming.sessions import sessionize_stream

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sessions_match_batch(spark, tmp_path):
    events = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select("event_id", "user_id", "ts", "value")
    )
    cutoff = events.agg(
        F.percentile_approx("ts", 0.5).alias("m")
    ).collect()[0]["m"]

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    # two chunks split by event time -> sessions straddling the cutoff
    # arrive across two micro-batches and must be stitched by state
    events.filter(F.col("ts") <= F.lit(cutoff)).coalesce(1).write.parquet(
        landing + "/c0"
    )
    time.sleep(1.1)  # file-source ordering is by modification time
    events.filter(F.col("ts") > F.lit(cutoff)).coalesce(1).write.parquet(
        landing + "/c1"
    )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    out = sessionize_stream(stream, gap_s=1800.0)

    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            emitted.append(
                (batch_id, r["user_id"], r["sess_no"], r["n_events"],
                 r["sess_value"], r["open"])
            )

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # latest emit per (user, session) is the session's final aggregate
    latest: dict[tuple, tuple] = {}
    for batch_id, uid, sno, n, sval, is_open in sorted(emitted):
        latest[(uid, sno)] = (n, round(sval, 6))

    batch = {
        (r["user_id"], r["sess_no"]): (r["n_events"], r["sess_value"])
        for r in entrymod._sessionize(spark, SF_DIR).collect()
    }
    assert latest == batch

    # the stateful boundary was actually exercised: at least one session
    # was updated in more than one micro-batch
    seen_batches: dict[tuple, set] = {}
    for batch_id, uid, sno, *_ in emitted:
        seen_batches.setdefault((uid, sno), set()).add(batch_id)
    assert any(len(bs) > 1 for bs in seen_batches.values()), (
        "no session spanned a micro-batch boundary; test fixture too easy"
    )
