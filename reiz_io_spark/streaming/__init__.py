"""Streaming: intentionally N/A.

The reference is batch-only — ingest via a thread pool
(reiz/serialization/insert.py:105-120), queries via request/response
(reiz/web/api.py:71-99). There are no watermarks, windows, or stateful
streaming operators to reproduce (SURVEY.md §2.10 considered and marked
N/A, not skipped).

Incremental index maintenance is handled by the batch lineage design
instead (operators/build.py): new corpus shards are detected by the
lineage anti-join and tokenized incrementally; the merge + block stage
re-runs over all runs. A Structured Streaming front-end would drop
micro-batches of corpus rows into new shards and trigger the same merge
— the shard/lineage contract is the stream-batch boundary.
"""
