"""Streaming exact dedup must agree with the batch exact_dedup keeper
sets, including duplicates that arrive in a LATER micro-batch than
their keeper (the stateful part)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators import dedup
from reiz_io_spark.streaming.dedup import dedup_stream

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_dedup_matches_batch(spark, tmp_path):
    base = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .limit(60)
        .cache()
    )
    # plant duplicates: 20 docs re-delivered under new doc_ids
    copies = (
        base.orderBy("doc_id").limit(20)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    batch1 = base  # originals
    batch2 = copies.unionByName(  # cross-batch dups + fresh in-batch pair
        batch1.orderBy("doc_id").limit(1)
        .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
    )
    full = batch1.unionByName(batch2).cache()

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    batch1.coalesce(1).write.parquet(landing + "/c0")
    time.sleep(1.1)  # file source orders batches by modification time
    batch2.coalesce(1).write.parquet(landing + "/c1")

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    out = dedup_stream(stream)

    emitted: list[tuple] = []

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            emitted.append(
                (batch_id, r["doc_id"], r["text_sha"], r["keep_doc_id"],
                 r["is_duplicate"])
            )

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(emitted) == full.count()  # one decision per input row

    # batch twin over the SAME union: keeper = min doc_id per sha
    twin = {
        r["text_sha"]: r["keep_doc_id"]
        for r in dedup.exact_dedup(full).collect()
    }
    stream_keeper = {}
    dups = set()
    for _, doc_id, sha, keep, is_dup in emitted:
        stream_keeper.setdefault(sha, keep)
        assert keep == stream_keeper[sha]  # keeper never changes
        if is_dup:
            dups.add(doc_id)

    # batch1 precedes batch2, and batch1 holds the min doc_ids, so the
    # first-seen streaming keeper == the batch min-doc_id keeper
    assert stream_keeper == twin

    # exactly the planted re-deliveries are flagged duplicate
    planted = {r["doc_id"] for r in batch2.collect()}
    assert dups == planted

    # the stateful boundary was exercised: keepers came from batch 0,
    # their duplicates were flagged in batch 1
    first_batch_of_sha = {}
    for batch_id, doc_id, sha, keep, is_dup in sorted(emitted):
        first_batch_of_sha.setdefault(sha, batch_id)
    cross = [
        (batch_id, sha) for batch_id, _, sha, _, is_dup in emitted
        if is_dup and batch_id > first_batch_of_sha[sha]
    ]
    assert cross  # at least one duplicate detected across batches
