"""Incrementally-maintained time rollup — the hypertable
continuous-aggregate analog: an events stream keeps an (hour bucket x
event_type) aggregate table up to date without ever re-scanning
history.

Design (partial-aggregate table, the scale-correct shape):

- each micro-batch writes its OWN partial aggregate (count / sum per
  bucket) into a batch_id-partitioned parquet dir — an idempotent
  partition overwrite, so Structured Streaming's batch replay contract
  holds (a re-delivered batch overwrites its old partials, never
  double-counts);
- the serving view is a tiny final aggregation over the partials
  (sum of counts, sum of sums). Partials are O(batches x active
  buckets), never O(events); a periodic compaction (merge partials of
  closed hours into one row) bounds even that — same maintenance as an
  Iceberg rewrite.

Compare `streaming/windows.py` (watermarked in-memory windowed aggs —
answers land in the sink); this operator maintains a QUERYABLE TABLE on
shared storage, which is what a rollup/continuous aggregate is for:
any frontend can read it without holding streaming state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTIALS_SCHEMA = (
    "window_start timestamp_ntz, event_type string, n_events long, "
    "total_value double, batch_id long"
)


def rollup_partials(batch_df: DataFrame, batch_id: int) -> DataFrame:
    """One micro-batch -> its partial (hour, event_type) aggregate."""
    return (
        batch_df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .withColumn("batch_id", F.lit(batch_id))
    )


def start_rollup(events_stream: DataFrame, rollup_dir: str, checkpoint: str):
    """foreachBatch writer: per-batch partials land in
    rollup_dir/partials/batch_id=N (idempotent overwrite on replay)."""
    partials_dir = os.path.join(rollup_dir, "partials")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            rollup_partials(batch_df, batch_id)
            .repartition(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(partials_dir)
        )

    return (
        events_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """The continuous-aggregate view: final-aggregate the partials."""
    partials = spark.read.schema(PARTIALS_SCHEMA).parquet(
        os.path.join(rollup_dir, "partials")
    )
    return partials.groupBy("window_start", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("total_value"), 6).alias("total_value"),
    )


def compact_rollup(spark: SparkSession, rollup_dir: str) -> None:
    """Fold all existing partials into one batch_id=-1 partition (the
    closed-hours compaction). Readers see the same totals before and
    after; subsequent streaming batches keep appending new partials."""
    partials_dir = os.path.join(rollup_dir, "partials")
    merged = (
        spark.read.schema(PARTIALS_SCHEMA)
        .parquet(partials_dir)
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
        .withColumn("batch_id", F.lit(-1))
    )
    staging = os.path.join(rollup_dir, "partials_compacted")
    merged.repartition(1).write.mode("overwrite").partitionBy("batch_id").parquet(
        staging
    )
    import shutil

    old = os.path.join(rollup_dir, "partials_old")
    shutil.move(partials_dir, old)
    shutil.move(staging, partials_dir)
    shutil.rmtree(old, ignore_errors=True)
