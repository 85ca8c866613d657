"""Native watermarked stream-stream interval join == the batch
bucketized range join over the union corpus, with members of a pair
arriving in different micro-batches."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from reiz_io_spark.operators.asof import range_join_bucketed
from reiz_io_spark.streaming.rangejoin import range_join_stream

SF_DIR = "/root/testdata/sf0.001"
LOWER_S, UPPER_S = 0, 300


def test_streaming_range_join_equals_batch(spark, tmp_path):
    events = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select("event_id", "user_id", "ts", "event_type")
        .cache()
    )
    views = events.filter(F.col("event_type") == "view")
    clicks = events.filter(F.col("event_type") == "click")

    # pick the cutoff FROM a real pair (view at or before, click
    # strictly after) so at least one pair is guaranteed to straddle
    # the micro-batch boundary
    want = [
        tuple(r)
        for r in range_join_bucketed(
            views, clicks, key="user_id", ts="ts", id_col="event_id",
            lower_s=LOWER_S, upper_s=UPPER_S,
        ).collect()
    ]
    assert want, "batch twin found no pairs — widen the window"
    split_pair = next(p for p in sorted(want) if p[2] < p[4])
    cutoff = split_pair[2]  # l_ts: its click lands in the later batch
    dirs = {}
    for name, df in (("views", views), ("clicks", clicks)):
        d = str(tmp_path / name)
        os.makedirs(d)
        df.filter(F.col("ts") <= F.lit(cutoff)).coalesce(1).write.parquet(
            d + "/c0"
        )
        time.sleep(1.1)
        df.filter(F.col("ts") > F.lit(cutoff)).coalesce(1).write.parquet(
            d + "/c1"
        )
        dirs[name] = d

    def stream_of(d):
        return (
            spark.readStream.schema(views.schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(d)
        )

    joined = range_join_stream(
        stream_of(dirs["views"]), stream_of(dirs["clicks"]),
        key="user_id", ts="ts", id_col="event_id",
        lower_s=LOWER_S, upper_s=UPPER_S,
    )
    got: list[tuple] = []

    def sink(batch_df, batch_id):
        got.extend(tuple(r) for r in batch_df.collect())

    q = (
        joined.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert sorted(got) == sorted(want)
    # the stream-stream state really joined ACROSS batches: some pair
    # has its view in batch 1 and its click in batch 2
    cross = [g for g in got if g[2] <= cutoff and g[4] > cutoff]
    assert cross, "no cross-batch pair (cutoff did not split any pair)"
