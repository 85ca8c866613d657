"""Structured Streaming front-end for incremental index maintenance.

The reference is batch-only (thread-pool ingest,
reiz/serialization/insert.py:105-120), but its DB-backed resume cache
(cache.py:8-25) is exactly a streaming contract: "skip what's already
in". Our lineage design generalizes it, so a streaming front-end is a
thin adapter:

    readStream(corpus dir) ──foreachBatch──▶ stage-1 of build_index
        (tokenize -> docs/runs/lineage for the batch's pending shards)
    ... then one merge (stages 2-3) when querying is needed.

Each micro-batch appends whole shards; the batch build's lineage
anti-join makes the pipeline idempotent under micro-batch replay
(exactly-once effect on the index from at-least-once delivery — shard
rows are only recorded after their data lands). ``finalize_index``
runs the deterministic merge + block encode over all runs, exactly the
batch path, so every correctness guarantee (rank identity, codec
round-trip, sha256 invariant) carries over unchanged.

At cluster scale the source would be an Iceberg CDC / file stream over
the landing zone; trigger=availableNow gives catch-up batch semantics,
a processing-time trigger gives continuous maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import CORPUS
from .. import BLOCK_SIZE, BM25_B, BM25_K1
from ..operators.build import FRAGMENT_POSTINGS, build_index, stage1_ingest


def stream_corpus_into_index(
    spark: SparkSession,
    corpus_stream_dir: str,
    out_dir: str,
    build_id: str = "stream-0",
    n_shards: int = 8,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Ingest a growing directory of corpus parquet files into the index
    tables (docs/runs/lineage) incrementally. Returns the query handle;
    call ``finalize_index`` afterwards to (re)build dictionary+blocks."""
    stream = (
        spark.readStream.schema(CORPUS)
        .option("maxFilesPerTrigger", "16")
        .parquet(corpus_stream_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        stage1_ingest(
            batch_df.sparkSession, batch_df, out_dir,
            build_id=f"{build_id}-b{batch_id}", n_shards=n_shards,
        )

    writer = stream.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def finalize_index(
    spark: SparkSession,
    out_dir: str,
    build_id: str = "stream-0",
    block_size: int = BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    fragment_postings: int = FRAGMENT_POSTINGS,
) -> dict:
    """Merge + block-encode everything ingested so far (batch stages 2-3
    over ALL runs — deterministic, so re-running after more batches just
    produces the superset index)."""
    from ..operators.build import merge_and_encode

    return merge_and_encode(
        spark, out_dir, build_id=build_id, block_size=block_size,
        k1=k1, b=b, fragment_postings=fragment_postings,
    )
