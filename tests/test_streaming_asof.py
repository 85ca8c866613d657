"""Streaming as-of join == batch asof_join_backward over the union,
when each key's events arrive in timestamp order across batches (the
partitioned-topic contract), including never-matched lefts and the
equal-ts tie rule."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from reiz_io_spark.operators.asof import asof_join_backward
from reiz_io_spark.streaming.asof import asof_join_stream

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_asof_equals_batch(spark, tmp_path):
    events = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select("event_id", "user_id", "ts", "event_type", "value")
        .cache()
    )
    # time-split into two micro-batches: per-user timestamp order holds
    # across batches (the operator's ordering contract)
    cutoff = events.agg(F.percentile_approx("ts", 0.5).alias("m")).first()["m"]
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    events.filter(F.col("ts") <= F.lit(cutoff)).coalesce(1).write.parquet(
        landing + "/c0"
    )
    time.sleep(1.1)
    events.filter(F.col("ts") > F.lit(cutoff)).coalesce(1).write.parquet(
        landing + "/c1"
    )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    got: list[tuple] = []

    def sink(batch_df, batch_id):
        got.extend(tuple(r) for r in batch_df.collect())

    q = (
        asof_join_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    purchases = events.filter(F.col("event_type") == "purchase")
    clicks = events.filter(F.col("event_type") == "click")
    want = [
        tuple(r)
        for r in asof_join_backward(
            purchases, clicks, key="user_id", ts="ts", id_col="event_id",
            right_payload=["value"],
        ).collect()
    ]
    assert sorted(got) == sorted(want)
    # the cross-batch stateful part really happened: some purchase in
    # batch 2 matched a click from batch 1
    cross = [
        g for g in got
        if g[1] > cutoff and g[4] is not None and g[4] <= cutoff
    ]
    assert cross, "no purchase matched an earlier-batch click"
    # and some purchases had no click yet (null right side preserved)
    assert any(g[4] is None for g in got)
