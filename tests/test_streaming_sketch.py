"""Streaming KMV == batch KMV over every stream prefix (the merge
property made observable): after each micro-batch, each group's
emitted sketch row equals kmv_sketch_by_group over the events seen so
far."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from reiz_io_spark.operators.sketch import kmv_sketch_by_group
from reiz_io_spark.streaming.sketch import kmv_stream

SF_DIR = "/root/testdata/sf0.001"
K = 4  # small k so the estimator path (not just exact degrade) runs


def test_streaming_kmv_equals_batch_prefixes(spark, tmp_path):
    events = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select("event_id", "user_id", "ts", "event_type")
        .cache()
    )
    cutoff = events.agg(F.percentile_approx("ts", 0.5).alias("m")).first()["m"]
    b0 = events.filter(F.col("ts") <= F.lit(cutoff))
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    b0.coalesce(1).write.parquet(landing + "/c0")
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
    snapshots: dict[int, dict[str, tuple]] = {}

    def sink(batch_df, batch_id):
        snapshots[batch_id] = {
            r["grp"]: (r["k_used"], r["kth_hash"], r["est_distinct"])
            for r in batch_df.collect()
        }

    q = (
        kmv_stream(stream, "event_type", "user_id", k=K)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(snapshots) == 2

    def batch_sketch(df):
        return {
            r["event_type"]: (r["k_used"], r["kth_hash"], r["est_distinct"])
            for r in kmv_sketch_by_group(df, "event_type", "user_id", K).collect()
        }

    # prefix 1: first micro-batch alone
    assert snapshots[0] == batch_sketch(b0)
    # prefix 2: whole stream; merge latest emission per group (a group
    # absent from batch 2 keeps its batch-1 sketch — state unchanged)
    latest = dict(snapshots[0])
    latest.update(snapshots[1])
    assert latest == batch_sketch(events)
    # the estimator path was exercised (some group saturated k)
    assert any(v[0] == K for v in latest.values())
