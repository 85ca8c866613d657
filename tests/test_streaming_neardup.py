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


def test_streaming_neardup_verified_tier(spark, tmp_path):
    """The exact-verify tier on a boilerplate-heavy stream: the
    estimate tier flags many band-colliding candidates (shared
    boilerplate dominates the signatures), the foreachBatch verify
    prunes those whose EXACT Jaccard is below threshold, and the
    upserted pairs table agrees with the batch operator
    (minhash_lsh_pairs) run offline over the union corpus —
    pair-for-pair, value-for-value. Candidate volume stays bounded by
    the boilerplate clique, nowhere near all-pairs."""
    from reiz_io_spark.streaming.neardup import (
        read_verified_pairs,
        start_neardup_verified,
    )

    boiler = (
        "licensed under the apache license version two point zero you may "
        "not use this file except in compliance with the license obtain a "
        "copy at the usual location unless required by applicable law or "
        "agreed to in writing software distributed under the license is "
        "distributed on an as is basis without warranties or conditions "
        "of any kind either express or implied see the license for the "
        "specific language governing permissions and limitations "
    )
    rows = []
    for i in range(24):
        # tails of increasing length: short-tail pairs pass the exact
        # gate, long-tail pairs are estimate-admitted but exact-pruned
        tail = " ".join(f"unique{i}word{j}" for j in range(2 + 7 * (i % 8)))
        rows.append((10_000 + i, boiler + tail))
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    normal = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text").limit(40)
    )
    full = planted.unionByName(normal).cache()
    b1 = full.filter(F.col("doc_id") % 2 == 0)
    b2 = full.filter(F.col("doc_id") % 2 == 1)

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    b1.coalesce(1).write.parquet(landing + "/c0")
    time.sleep(1.1)
    b2.coalesce(1).write.parquet(landing + "/c1")
    stream = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )

    pairs_dir = str(tmp_path / "pairs")
    q = start_neardup_verified(
        stream, full, pairs_dir, str(tmp_path / "ckpt"),
        n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N,
        threshold=THRESH,
    )
    q.awaitTermination(300)

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in read_verified_pairs(spark, pairs_dir).collect()
    }
    # every surviving pair is exact-verified at or above threshold
    assert got and all(j >= THRESH for j in got.values())

    # agreement with the batch operator over the union corpus
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            full, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N,
            threshold=THRESH,
        ).collect()
    }
    assert got == want

    # the estimate tier really over-admitted (the verify tier did
    # work): candidates at the prefilter floor outnumber survivors,
    # and stay far below all-pairs of the corpus
    est_floor = THRESH - 0.15
    cands = set()

    def cand_sink(batch_df, batch_id):
        for r in batch_df.collect():
            cands.add((r["doc_a"], r["doc_b"]))

    from reiz_io_spark.streaming.neardup import neardup_stream

    stream2 = (
        spark.readStream.schema(full.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(landing)
    )
    q2 = (
        neardup_stream(
            stream2, n_hashes=N_HASHES, bands=BANDS, shingle_n=SHINGLE_N,
            threshold=est_floor,
        )
        .writeStream.foreachBatch(cand_sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    n_docs = full.count()
    assert len(got) < len(cands)                      # verify pruned some
    assert len(cands) < 0.25 * n_docs * (n_docs - 1) / 2  # bounded clique
    assert set(got) <= cands                          # survivors ⊆ candidates
