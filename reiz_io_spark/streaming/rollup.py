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

Compaction correctness (the subtle part — foreachBatch is
at-least-once, and readers are concurrent):

- the compacted generation ENCODES ITS WATERMARK in its partition
  value: folding batches 0..W produces the partition
  ``batch_id = -(W+1)``. No side-channel watermark file — the commit
  point is one atomic os.rename of the staged partition dir INTO the
  live partials dir.
- readers resolve the state from the partition listing alone: the
  newest compacted generation is the MOST NEGATIVE batch_id C, its
  watermark is W = -C-1, and the live view is
  ``batch_id = C  OR  batch_id > W``. A batch replayed AFTER a
  compaction that already folded it (the at-least-once crash case)
  re-creates its batch_id=N <= W partition — which the read filter
  ignores, so nothing is double-counted.
- there is never a moment without a readable partials dir: compaction
  stages the merged partition outside the dir and renames it in
  (atomic). Superseded partitions are GC'd with a ONE-CYCLE grace
  (at the start of the next compaction, or explicit gc_rollup), so an
  in-flight reader planned against the previous generation can finish.
  A crash at ANY point leaves a consistent view — before the rename,
  nothing changed; after it, the new generation already shadows
  everything it folded (readers pick min(batch_id) as the newest
  generation, so uncollected older partitions are also consistent).
- the merge is CLAMPED to the partition-listing snapshot
  (watermark < batch_id <= W'), so compaction is safe concurrent with
  the appending stream: a batch committed mid-compaction has id > W'
  and stays live outside the new generation.

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


def _partition_ids(partials_dir: str) -> list[int]:
    try:
        names = os.listdir(partials_dir)
    except OSError:
        return []
    out = []
    for n in names:
        if n.startswith("batch_id="):
            try:
                out.append(int(n.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def compaction_state(rollup_dir: str) -> tuple[int | None, int]:
    """(newest compacted partition id C or None, watermark W).

    C is the most negative batch_id present; W = -C-1 is the highest
    streaming batch folded into that generation (-1 when never
    compacted). Derived purely from the partition listing, so it is
    always consistent with what a reader can actually see."""
    ids = _partition_ids(os.path.join(rollup_dir, "partials"))
    neg = [i for i in ids if i < 0]
    if not neg:
        return None, -1
    c = min(neg)
    return c, -c - 1


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
    rollup_dir/partials/batch_id=N (idempotent overwrite on replay).
    Batches at or below the compaction watermark are already folded
    into the compacted generation and are skipped — even if written
    they would be invisible to read_rollup, but skipping saves the
    write. A rollup_dir is bound to ONE checkpoint lineage: batch ids
    are monotonic under the same checkpoint (the Structured Streaming
    contract), which is what makes the watermark comparison sound."""
    partials_dir = os.path.join(rollup_dir, "partials")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _, watermark = compaction_state(rollup_dir)
        if batch_id <= watermark:
            return  # already folded into the compacted generation
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
    """The continuous-aggregate view: final-aggregate the live
    partials — the newest compacted generation plus every batch above
    its watermark. Superseded generations and replayed
    already-compacted batches are filtered out, never double-counted."""
    c, watermark = compaction_state(rollup_dir)
    partials = spark.read.schema(PARTIALS_SCHEMA).parquet(
        os.path.join(rollup_dir, "partials")
    )
    live = F.col("batch_id") > watermark
    if c is not None:
        live = live | (F.col("batch_id") == c)
    return partials.filter(live).groupBy("window_start", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.round(F.sum("total_value"), 6).alias("total_value"),
    )


def compact_rollup(spark: SparkSession, rollup_dir: str) -> None:
    """Fold the live partials (current compacted generation + batches
    above its watermark) into ONE new generation ``batch_id=-(W'+1)``
    where W' is the highest streaming batch folded. Readers see the
    same totals before, during, and after; a crash anywhere leaves a
    readable, non-double-counting state (see module docstring).

    Safe ALONGSIDE an appending stream: the merge is clamped to the
    partition-listing snapshot (``batch_id <= W'``), so a batch the
    concurrent foreachBatch writer commits between our snapshot and
    Spark's own file listing for the merge read is NEVER folded — its
    id exceeds W' (batch ids are monotonic under one checkpoint), it
    stays out of the generation and stays live via ``batch_id > W'``.
    Without the clamp it would be counted twice: once inside a
    generation whose encoded watermark doesn't cover it, once in its
    own still-present partition.

    GC is DEFERRED one compaction cycle: partitions superseded by this
    generation survive until the next ``compact_rollup`` (or an
    explicit :func:`gc_rollup`), so an in-flight reader that planned
    its scan against the previous generation never hits a
    FileNotFoundException mid-query. Readers ignore superseded
    partitions by construction, so keeping them costs storage only."""
    partials_dir = os.path.join(rollup_dir, "partials")
    # grace expired for anything the PREVIOUS compaction superseded
    gc_rollup(rollup_dir)
    c, watermark = compaction_state(rollup_dir)
    ids = _partition_ids(partials_dir)
    new_batches = [i for i in ids if i > watermark]
    if not new_batches:
        return  # nothing new since the last compaction
    new_wm = max(new_batches)

    # clamp to the snapshot: only LISTED streaming batches are folded
    live = (F.col("batch_id") > watermark) & (F.col("batch_id") <= new_wm)
    if c is not None:
        live = live | (F.col("batch_id") == c)
    merged = (
        spark.read.schema(PARTIALS_SCHEMA)
        .parquet(partials_dir)
        .filter(live)
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
    )
    # stage OUTSIDE the partials dir, then one atomic rename in: the
    # partition (with its watermark-encoding name) either exists fully
    # or not at all; no reader ever sees a half-written generation or a
    # missing partials dir.
    staging = os.path.join(rollup_dir, f"_compact_staging_{new_wm}")
    merged.repartition(1).write.mode("overwrite").parquet(staging)
    new_part = os.path.join(partials_dir, f"batch_id={-(new_wm + 1)}")
    import shutil

    shutil.rmtree(new_part, ignore_errors=True)  # stale crash leftover
    os.rename(staging, new_part)
    # superseded partitions are NOT deleted here — see docstring.


def gc_rollup(rollup_dir: str) -> list[int]:
    """Delete partitions superseded by the CURRENT compacted
    generation: older generations and streaming batches at or below
    the watermark. Called at the START of each compaction (one-cycle
    grace for in-flight readers, the snapshot-retention policy the
    fulltext index uses for its version dirs) or explicitly. Returns
    the deleted partition ids."""
    import shutil

    partials_dir = os.path.join(rollup_dir, "partials")
    c, watermark = compaction_state(rollup_dir)
    dead = [
        i for i in _partition_ids(partials_dir)
        if i != c and (i < 0 or i <= watermark)
    ]
    for i in dead:
        shutil.rmtree(
            os.path.join(partials_dir, f"batch_id={i}"), ignore_errors=True
        )
    return dead
