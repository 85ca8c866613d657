"""Streaming MinHash-LSH near-dup must flag cross-batch near-copies
the moment the second member arrives, and agree with the batch LSH
banding + estimator semantics computed offline over the union corpus."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators import dedup
from reiz_io_spark.streaming.neardup import neardup_stream

SF_DIR = "/root/testdata/sf0.001"
N_HASHES, BANDS, SHINGLE_N, THRESH = 64, 16, 3, 0.5


def _batch_twin_pairs(spark, docs):
    """Offline reference: same signatures, same banding, same
    estimator — pairs sharing >=1 band with est >= THRESH."""
    sigs = {
        r["doc_id"]: np.asarray(r["sig"], dtype=np.int64)
        for r in dedup.minhash_signatures(
            docs, n_hashes=N_HASHES, shingle_n=SHINGLE_N
        ).collect()
        if len(r["sig"])
    }
    r = N_HASHES // BANDS
    buckets: dict[tuple, list] = {}
    for did in sorted(sigs):
        sig = sigs[did]
        for b in range(BANDS):
            buckets.setdefault((b, tuple(sig[b * r:(b + 1) * r])), []).append(did)
    pairs = set()
    for members in buckets.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                est = float((sigs[a] == sigs[b]).mean())
                if est >= THRESH:
                    pairs.add((min(a, b), max(a, b)))
    return pairs


def test_streaming_neardup_cross_batch(spark, tmp_path):
    base = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
        .limit(50)
        .cache()
    )
    # plant near-copies arriving in a LATER batch: light tail edit
    edited = (
        base.orderBy("doc_id").limit(8)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat("text", F.lit(" tail edit")).alias("text"),
        )
    )
    batch1, batch2 = base, edited
    full = batch1.unionByName(batch2).cache()

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    batch1.coalesce(1).write.parquet(landing + "/c0")
    time.sleep(1.1)
    batch2.coalesce(1).write.parquet(landing + "/c1")

    stream = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    out = neardup_stream(
        stream, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N,
        threshold=THRESH,
    )
    emitted: set[tuple] = set()

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            emitted.add((r["doc_a"], r["doc_b"], round(r["est_jaccard"], 6)))

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got_pairs = {(a, b) for a, b, _ in emitted}
    want_pairs = _batch_twin_pairs(spark, full)
    # every planted (original, edited-copy) pair must be flagged — the
    # members arrived in DIFFERENT micro-batches (the stateful part)
    planted = {
        (r["doc_id"], r["doc_id"] + 1_000_000)
        for r in base.orderBy("doc_id").limit(8).collect()
    }
    planted_found = {p for p in planted if p in want_pairs}
    assert planted_found, "twin found no planted pairs — test corpus too noisy"
    assert planted_found <= got_pairs
    # full agreement with the offline banding+estimator semantics
    assert got_pairs == want_pairs
    # estimates are the unbiased MinHash estimator, identical offline
    sigs = {
        r["doc_id"]: np.asarray(r["sig"], dtype=np.int64)
        for r in dedup.minhash_signatures(
            full, n_hashes=N_HASHES, shingle_n=SHINGLE_N
        ).collect()
    }
    for a, b, est in emitted:
        assert est == round(float((sigs[a] == sigs[b]).mean()), 6)
