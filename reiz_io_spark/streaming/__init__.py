"""Structured Streaming operators (beyond the reference, which is
batch-only: thread-pool ingest reiz/serialization/insert.py:105-120,
request/response queries reiz/web/api.py:71-99).

- ``ingest.py`` — readStream -> foreachBatch(stage-1 ingest) with
  idempotent replay (per-batch partition overwrite + lineage anti-join
  + cross-batch doc_id anti-join); ``finalize_index`` is a full merge
  the first time and an INCREMENTAL merge afterwards
  (operators/build.merge_incremental: only new batches' runs are read,
  only affected terms' blocks re-encoded).
- ``sessions.py`` — gap-based session windows as a custom stateful
  operator (applyInPandasWithState): per-user open-session state across
  micro-batches, event-time timeout under a watermark, update-mode
  emits keyed by (user_id, sess_no).
"""
