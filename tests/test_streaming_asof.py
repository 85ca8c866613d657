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


def _run_reordered(spark, tmp_path, batches, schema, max_delay, counter):
    from reiz_io_spark.streaming.asof import asof_join_stream_reordered

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            landing + f"/c{i}"
        )
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(spark.createDataFrame(batches[0], schema).schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    got = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got[r["event_id"]] = (r["right_id"], r["right_value"])

    q = (
        asof_join_stream_reordered(
            stream, max_delay=max_delay, ooo_counter=counter
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return got


def test_reordered_absorbs_disorder_within_delay(spark, tmp_path):
    """Cross-batch disorder INSIDE the watermark delay: the reorder
    buffer produces the offline answer (purchase@20 matches the
    click@15 that arrived one batch later), where the plain kernel
    would have emitted the stale click@10 match. Counter stays 0."""
    from datetime import datetime, timedelta

    from reiz_io_spark.streaming.asof import make_ooo_counter

    schema = "event_id long, user_id long, ts timestamp_ntz, event_type string, value double"
    t0 = datetime(2026, 1, 1)

    def ts(sec):
        return t0 + timedelta(seconds=sec)

    b0 = [(1, 7, ts(10), "click", 1.0), (2, 7, ts(20), "purchase", None)]
    b1 = [
        (3, 7, ts(15), "click", 2.0),      # out of order vs batch 0
        (4, 7, ts(40), "purchase", None),
        (5, 7, ts(90), "click", 3.0),      # advances the watermark
    ]
    b2 = [(6, 7, ts(95), "purchase", None)]
    counter = make_ooo_counter(spark)
    got = _run_reordered(
        spark, tmp_path, [b0, b1, b2], schema, "30 seconds", counter
    )
    # ripe at batch 2 (wm=60): both purchases match the reordered click@15
    assert got[2] == (3, 2.0)
    assert got[4] == (3, 2.0)
    # within-delay disorder is absorbed, not a violation
    assert counter.value == 0
    # unripe rows (ts > final watermark) are still buffered at shutdown
    assert 6 not in got


def test_reordered_counts_beyond_delay_and_guards_carry(spark, tmp_path):
    """Arrivals LATER than the delay are counted; a late right older
    than the carried right is skipped, so subsequent lefts still match
    what the offline operator would give them."""
    from datetime import datetime, timedelta

    from reiz_io_spark.streaming.asof import make_ooo_counter

    schema = "event_id long, user_id long, ts timestamp_ntz, event_type string, value double"
    t0 = datetime(2026, 1, 1)

    def ts(sec):
        return t0 + timedelta(seconds=sec)

    b0 = [
        (1, 7, ts(10), "click", 1.0),
        (2, 7, ts(20), "purchase", None),
        (3, 7, ts(200), "click", 3.0),   # watermark -> 170 after b0
    ]
    b1 = [(4, 7, ts(15), "click", 2.0)]  # 15 <= prev wm 170: beyond delay
    b2 = [
        (5, 7, ts(12), "click", 9.0),    # beyond delay AND older than carry
        (6, 7, ts(170), "purchase", None),
    ]
    counter = make_ooo_counter(spark)
    got = _run_reordered(
        spark, tmp_path, [b0, b1, b2], schema, "30 seconds", counter
    )
    # c@12 was skipped (carry stays c@15); offline latest click <= 170
    # is indeed c@15
    assert got[6] == (4, 2.0)
    assert counter.value == 2
