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


def test_out_of_order_counter_and_no_rewrite(spark, tmp_path):
    """A right event arriving AFTER a left it should have matched:
    the documented no-rewrite behavior holds (the emitted left keeps
    its at-emission match) and the ordering-contract counter
    increments, so operators know a batch backfill is due."""
    from datetime import datetime, timedelta

    from reiz_io_spark.streaming.asof import make_ooo_counter

    schema = "event_id long, user_id long, ts timestamp_ntz, event_type string, value double"
    t0 = datetime(2026, 1, 1)

    def ts(sec):
        return t0 + timedelta(seconds=sec)

    # batch 0: click@10, purchase@20 (matches click@10)
    b0 = [(1, 7, ts(10), "click", 1.0), (2, 7, ts(20), "purchase", None)]
    # batch 1: click@15 — LATE: purchase@20 should have matched it;
    # then purchase@30 (matches the late click, state is latest-right)
    b1 = [(3, 7, ts(15), "click", 2.0), (4, 7, ts(30), "purchase", None)]

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    spark.createDataFrame(b0, schema).coalesce(1).write.parquet(landing + "/c0")
    time.sleep(1.1)
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(landing + "/c1")

    stream = (
        spark.readStream.schema(
            spark.createDataFrame(b0, schema).schema
        )
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    counter = make_ooo_counter(spark)
    got = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got[r["event_id"]] = (r["right_id"], r["right_value"])

    q = (
        asof_join_stream(stream, ooo_counter=counter)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # no-rewrite: purchase@20 keeps its at-emission match (click@10)
    assert got[2] == (1, 1.0)
    # the late click IS the state for later lefts
    assert got[4] == (3, 2.0)
    # and the violation was counted exactly once
    assert counter.value == 1


def test_counter_stays_zero_under_contract(spark, tmp_path):
    """In-order arrival (the partitioned-topic contract): counter 0."""
    from datetime import datetime, timedelta

    from reiz_io_spark.streaming.asof import make_ooo_counter

    schema = "event_id long, user_id long, ts timestamp_ntz, event_type string, value double"
    t0 = datetime(2026, 1, 1)
    b0 = [(1, 7, t0 + timedelta(seconds=10), "purchase", None)]
    b1 = [
        (2, 7, t0 + timedelta(seconds=15), "click", 2.0),
        (3, 7, t0 + timedelta(seconds=20), "purchase", None),
    ]
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    spark.createDataFrame(b0, schema).coalesce(1).write.parquet(landing + "/c0")
    time.sleep(1.1)
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(landing + "/c1")
    stream = (
        spark.readStream.schema(spark.createDataFrame(b0, schema).schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    counter = make_ooo_counter(spark)
    rows = []

    def sink(batch_df, batch_id):
        rows.extend(batch_df.collect())

    q = (
        asof_join_stream(stream, ooo_counter=counter)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert counter.value == 0
    assert len(rows) == 2
