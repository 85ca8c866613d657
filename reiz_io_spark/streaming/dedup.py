"""Streaming exact deduplication — the online twin of
operators/dedup.exact_dedup, for ingest pipelines that must drop
repeated payloads as they arrive (file re-sends, crawler revisits,
mirrored sources) instead of re-scanning the corpus per batch.

Shape: applyInPandasWithState keyed by content hash. State per key is
the keeper's doc_id, set by the FIRST micro-batch in which the hash
appears (within that batch, min(doc_id) — the batch operator's
deterministic keeper rule); every later occurrence in any batch emits
``is_duplicate=true`` with the original keeper. Update-mode emits one
row per input document, so the sink sees both keeps and drops (a
filter on is_duplicate gives the deduped stream).

State is O(distinct payloads), like the batch operator's groupBy — the
semantic is inherently global, exact dedup has no watermarkable
horizon. At 100-TB scale the state backend is RocksDB
(spark.sql.streaming.stateStore.providerClass), keyed by the 32-byte
sha — ~32 GB per 10^9 distinct documents, partitioned across the
cluster by the shuffle on the hash key; bounded-recall alternatives
(TTL'd state via timeouts) trade exactness for memory and belong to
the near-dup tier, not here.

The reference ingests via a filename cache with the same
skip-if-already-seen contract (reiz/serialization/cache.py:8-25) but
keyed by name, not content; content-keyed dedup is the stronger
training-data guarantee.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "doc_id long, text_sha string, keep_doc_id long, is_duplicate boolean"
STATE_SCHEMA = "keep_doc_id long"


def _dedup_key(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (text_sha,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    doc_ids = rows["doc_id"].sort_values(kind="stable").to_numpy()
    if state.exists:
        (keeper,) = state.get
        first_new = None
    else:
        keeper = int(doc_ids.min())
        state.update((keeper,))
        first_new = keeper
    out = pd.DataFrame({
        "doc_id": doc_ids,
        "text_sha": text_sha,
        "keep_doc_id": int(keeper),
        "is_duplicate": [int(d) != first_new for d in doc_ids],
    })
    yield out


def dedup_stream(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """documents stream -> per-row keep/drop decisions keyed by
    sha2(text). Works on any stream carrying (doc_id, text)."""
    hashed = documents.select(
        "doc_id", F.sha2(F.col(text_col), 256).alias("text_sha")
    )
    return hashed.groupBy("text_sha").applyInPandasWithState(
        _dedup_key,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
