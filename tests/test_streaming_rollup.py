"""Streaming-maintained hourly rollup == the batch tumbling aggregate,
including buckets whose events arrive across micro-batch boundaries;
replaying a batch's partials is idempotent; compaction preserves
totals."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from reiz_io_spark.streaming.rollup import (
    compact_rollup,
    gc_rollup,
    read_rollup,
    rollup_partials,
    start_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_rollup_matches_batch(spark, tmp_path):
    events = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    # cutoff = a mid-hour instant of the BUSIEST hour, so that hour is
    # guaranteed to receive events from both micro-batches
    busiest = (
        events.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .count().orderBy(F.desc("count"), F.asc("h")).first()["h"]
    )
    in_hour = events.filter(F.date_trunc("hour", "ts") == F.lit(busiest))
    cutoff = in_hour.agg(
        F.percentile_approx("ts", 0.5).alias("m")
    ).collect()[0]["m"]

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
    rollup_dir = str(tmp_path / "rollup")
    q = start_rollup(stream, rollup_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    # batch twin: the driver's tumbling-window entry, reshaped to the
    # rollup's (date_trunc hour) bucket — same semantics
    batch = _rows(
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )
    got = _rows(read_rollup(spark, rollup_dir))
    assert got == batch

    # the hour at the cutoff was fed by BOTH micro-batches: partials for
    # that bucket exist under two batch_ids (the incremental part)
    partials = spark.read.parquet(os.path.join(rollup_dir, "partials"))
    n_src = (
        partials.filter(F.col("window_start") == F.lit(busiest))
        .select("batch_id").distinct().count()
    )
    assert n_src == 2

    # replaying batch 0's partials (foreachBatch replay contract) is a
    # partition overwrite -> totals unchanged
    b0 = spark.read.parquet(landing + "/c0")
    (
        rollup_partials(b0, 0)
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(rollup_dir, "partials"))
    )
    assert _rows(read_rollup(spark, rollup_dir)) == batch

    # compaction folds partials into one partition; totals unchanged.
    # Superseded inputs survive one cycle (in-flight-reader grace) and
    # are invisible to the reader; explicit GC then leaves only the
    # generation.
    compact_rollup(spark, rollup_dir)
    assert _rows(read_rollup(spark, rollup_dir)) == batch
    assert gc_rollup(rollup_dir)  # the folded inputs, grace expired
    post = spark.read.parquet(os.path.join(rollup_dir, "partials"))
    assert post.select("batch_id").distinct().count() == 1


def test_rollup_replay_after_compaction_no_double_count(spark, tmp_path):
    """foreachBatch is at-least-once: a batch re-delivered AFTER a
    compaction that already folded it must not change totals — its
    partition is below the compacted generation's watermark, so the
    reader ignores it. Subsequent compactions fold only live data."""
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    rollup_dir = str(tmp_path / "rollup")
    partials = os.path.join(rollup_dir, "partials")
    for df, bid in ((b0, 0), (b1, 1)):
        (
            rollup_partials(df, bid)
            .repartition(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(partials)
        )
    expect = _rows(read_rollup(spark, rollup_dir))

    compact_rollup(spark, rollup_dir)
    assert _rows(read_rollup(spark, rollup_dir)) == expect
    gc_rollup(rollup_dir)
    # compacted generation encodes its watermark: batches 0..1 -> -2
    post = {
        r["batch_id"]
        for r in spark.read.parquet(partials).select("batch_id").distinct().collect()
    }
    assert post == {-2}

    # crash-replay of batch 1 AFTER compaction: the raw partition
    # overwrite lands (simulating a foreachBatch re-delivery that
    # bypassed the skip), but the reader must not double-count it
    (
        rollup_partials(b1, 1)
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(partials)
    )
    assert _rows(read_rollup(spark, rollup_dir)) == expect

    # a second compaction folds ONLY live partitions (the replayed
    # below-watermark partition is dead data, GC'd not re-counted)
    compact_rollup(spark, rollup_dir)
    assert _rows(read_rollup(spark, rollup_dir)) == expect

    # new batch above the watermark IS live and compacts in
    b2 = rollup_partials(b0, 2)
    (
        b2.repartition(1)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(partials)
    )
    grown = _rows(read_rollup(spark, rollup_dir))
    assert grown != expect
    compact_rollup(spark, rollup_dir)
    assert _rows(read_rollup(spark, rollup_dir)) == grown
    gc_rollup(rollup_dir)
    post = {
        r["batch_id"]
        for r in spark.read.parquet(partials).select("batch_id").distinct().collect()
    }
    assert post == {-3}


def test_compaction_concurrent_append_not_double_counted(
    spark, tmp_path, monkeypatch
):
    """ADVICE r04: a batch the foreachBatch writer commits BETWEEN
    compaction's partition-listing snapshot and Spark's own file
    listing for the merge read must not be folded into a generation
    whose watermark doesn't cover it (that double-counts it forever).
    The merge clamp (batch_id <= W' from the snapshot) keeps it out;
    it stays live via batch_id > W'. Simulated deterministically by
    pinning the snapshot to a stale listing while the new batch's
    partition already exists on disk."""
    from reiz_io_spark.streaming import rollup as rollup_mod

    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    thirds = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]
    rollup_dir = str(tmp_path / "rollup")
    partials = os.path.join(rollup_dir, "partials")
    for bid, df in enumerate(thirds):
        (
            rollup_partials(df, bid)
            .repartition(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(partials)
        )
    expect = _rows(read_rollup(spark, rollup_dir))

    # compaction snapshots the listing BEFORE batch 2 landed; batch 2
    # is on disk by the time Spark lists files for the merge read
    real = rollup_mod._partition_ids
    monkeypatch.setattr(
        rollup_mod, "_partition_ids",
        lambda d: [i for i in real(d) if i < 2],
    )
    compact_rollup(spark, rollup_dir)
    monkeypatch.undo()

    # generation folded batches 0..1 only (watermark 1); batch 2 is
    # still live on its own — totals unchanged, nothing double-counted
    ids = {
        r["batch_id"]
        for r in spark.read.parquet(partials).select("batch_id").distinct().collect()
    }
    assert -2 in ids and 2 in ids
    assert _rows(read_rollup(spark, rollup_dir)) == expect

    # the next compaction folds batch 2 in normally
    compact_rollup(spark, rollup_dir)
    assert _rows(read_rollup(spark, rollup_dir)) == expect
