"""Streaming MinHash-LSH near-duplicate detection — the online twin of
operators/dedup.minhash_lsh_pairs, for ingest pipelines that must flag
near-copies (crawler mirrors, boilerplate re-uploads, light edits) AS
THEY ARRIVE instead of re-running corpus-wide LSH per batch.

Shape:
- signatures are the SAME vectorized map-only kernel as the batch
  operator (_py_shingles + fnv1a64_batch + minhash_from_hashes — one
  Arrow pass, zero shuffles), so online and offline agree bit for bit;
- each doc explodes to its `bands` band-bucket keys (string key =
  band index + the band's signature slice), the stream's only shuffle;
- applyInPandasWithState keyed by bucket: state is the bucket's seen
  (doc_id, signature) members — every incoming doc is compared against
  them with the unbiased MinHash estimator mean(sig_a[k]==sig_b[k]),
  and pairs at or above `threshold` are emitted immediately. A doc
  joining a bucket in batch 7 pairs with a member from batch 2 without
  any rescan.

State per bucket is capped at `bucket_cap` members (FIFO by arrival,
deterministic): a hot bucket (boilerplate band) stops absorbing new
members past the cap, trading recall inside pathological buckets for
bounded state — the same hot-shingle philosophy as the batch
operator's MAX_SHINGLE_DF. State size <= buckets * cap * (n_hashes+1)
longs, RocksDB-backed at production scale.

Emission carries the ESTIMATED Jaccard (exact verification would need
text in state). The exact-verified tier is `start_neardup_verified`:
a foreachBatch sink that pipes each micro-batch's flagged pairs
through operators/dedup.jaccard_for_pairs (semi-join-pruned to the
candidate docs — cost ∝ candidates, never the corpus) and upserts
pairs at exact jaccard >= threshold into a batch_id-partitioned pairs
table (idempotent partition overwrite on replay, the rollup sink's
discipline; `read_verified_pairs` is the deduplicated view). The
estimate tier admits candidates down to threshold - prefilter_margin —
the same estimator prefilter the batch operator uses — so the verified
tier agrees with minhash_lsh_pairs run offline over the union corpus
(pytest: pair-for-pair, value-for-value).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_a long, doc_b long, band int, est_jaccard double"


def _state_schema() -> str:
    return "docs array<long>, sigs array<long>"


def _pairs_for_key(n_hashes: int, bucket_cap: int, threshold: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band = int(key[0].split(":", 1)[0])
        rows = pd.concat(list(pdfs), ignore_index=True)
        # deterministic arrival order inside the batch
        rows = rows.sort_values("doc_id", kind="stable")
        if state.exists:
            docs, flat = state.get
            docs = list(docs)
            sigs = np.asarray(flat, dtype=np.int64).reshape(-1, n_hashes)
        else:
            docs = []
            sigs = np.empty((0, n_hashes), dtype=np.int64)

        out_a, out_b, out_e = [], [], []
        for doc_id, sig in zip(rows["doc_id"], rows["sig"]):
            sig = np.asarray(sig, dtype=np.int64)
            if sigs.shape[0]:
                est = (sigs == sig).mean(axis=1)
                for j in np.flatnonzero(est >= threshold):
                    a, b = sorted((int(docs[j]), int(doc_id)))
                    if a == b:
                        continue
                    out_a.append(a)
                    out_b.append(b)
                    out_e.append(float(est[j]))
            if len(docs) < bucket_cap and int(doc_id) not in docs:
                docs.append(int(doc_id))
                sigs = np.vstack([sigs, sig[None, :]])
        state.update((docs, [int(x) for x in sigs.reshape(-1)]))
        yield pd.DataFrame({
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "band": pd.Series([band] * len(out_a), dtype="int32"),
            "est_jaccard": pd.Series(out_e, dtype="float64"),
        })

    return fn


def neardup_stream(
    documents: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    bucket_cap: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """documents stream (doc_id, text) -> (doc_a, doc_b, band,
    est_jaccard) rows for near-duplicate pairs at est >= threshold,
    emitted the moment the second member arrives."""
    from ..operators.dedup import (
        _flatten_shingle_lists,
        _minhash_params,
        _py_shingles,
        fnv1a64_batch,
        minhash_from_hashes,
    )
    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    if n_hashes % bands:
        raise ValueError("neardup_stream: bands must divide n_hashes")
    r = n_hashes // bands
    a_params, b_params = _minhash_params(n_hashes, seed)

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(texts: pd.Series) -> pd.Series:
        sh_lists = [_py_shingles(t or "", shingle_n) for t in texts]
        hs, offsets = _flatten_shingle_lists(sh_lists)
        sig = minhash_from_hashes(hs, offsets, a_params, b_params)
        empty = np.empty(0, dtype=np.int64)
        return pd.Series(
            [sig[i] if sh_lists[i] else empty for i in range(len(sh_lists))]
        )

    sigs = documents.select(
        "doc_id", sig_udf(F.col(text_col)).alias("sig")
    ).filter(F.size("sig") > 0)
    # bucket key: band index + that band's signature slice, one string
    # (the stream's only shuffle key; same banding rule as the batch
    # operator's bucket join)
    buckets = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.concat_ws(
                    ":",
                    b.cast("string"),
                    F.concat_ws("_", F.slice("sig", b * r + 1, r)),
                ),
            )
        ).alias("bucket"),
    )
    pairs = buckets.groupBy("bucket").applyInPandasWithState(
        _pairs_for_key(n_hashes, bucket_cap, threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_state_schema(),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return pairs.filter(F.col("est_jaccard") >= threshold)


VERIFIED_SCHEMA = "doc_a long, doc_b long, jaccard double, batch_id long"


def start_neardup_verified(
    documents_stream: DataFrame,
    docs_source: DataFrame,
    pairs_dir: str,
    checkpoint: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    bucket_cap: int = 64,
    text_col: str = "text",
    prefilter_margin: float | None = 0.15,
):
    """The exact-verified tier: estimate-tier candidates (emitted down
    to threshold - prefilter_margin, matching the batch operator's
    signature prefilter) -> exact Jaccard on JUST those pairs against
    `docs_source` (the canonical documents table the ingest sink
    maintains; jaccard_for_pairs semi-join-prunes it to candidate
    docs) -> pairs at exact jaccard >= threshold land in
    ``pairs_dir/batch_id=N``. Replayed batches overwrite their own
    partition; a pair re-flagged by a later band/batch is collapsed by
    the read view — together that is the upsert contract."""
    est_floor = max(0.0, threshold - (prefilter_margin or 0.0))
    flagged = neardup_stream(
        documents_stream, n_hashes=n_hashes, bands=bands,
        shingle_n=shingle_n, threshold=est_floor, seed=seed,
        bucket_cap=bucket_cap, text_col=text_col,
    )
    from ..operators.dedup import jaccard_for_pairs

    def verify_batch(batch_df: DataFrame, batch_id: int) -> None:
        cand = batch_df.select("doc_a", "doc_b").dropDuplicates(
            ["doc_a", "doc_b"]
        )
        if cand.isEmpty():
            return
        (
            jaccard_for_pairs(docs_source, cand, n=shingle_n)
            .filter(F.col("jaccard") >= threshold)
            .withColumn("batch_id", F.lit(batch_id))
            .repartition(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(pairs_dir)
        )

    return (
        flagged.writeStream.foreachBatch(verify_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_verified_pairs(spark, pairs_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard) — the deduplicated verified-pairs view
    (a pair verified in several batches appears once; the exact
    jaccard is a pure function of the two texts, so min==max)."""
    pairs = spark.read.schema(VERIFIED_SCHEMA).parquet(pairs_dir)
    return pairs.select("doc_a", "doc_b", "jaccard").dropDuplicates(
        ["doc_a", "doc_b"]
    )
