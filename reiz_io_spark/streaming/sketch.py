"""Streaming KMV distinct-count sketch — continuous per-group
cardinality estimates over an unbounded stream, O(k) state per group.

The batch operator's map-side partial (operators/sketch.kmin_partials:
keep the k smallest distinct 60-bit hashes) IS the streaming state:
applyInPandasWithState keyed by group merges each micro-batch's hashes
into the running k-min set and emits the group's refreshed
(k_used, kth_hash, est_distinct) row. The KMV merge property makes
order irrelevant, so after any prefix of the stream the state — and
therefore the estimate — is IDENTICAL to the batch sketch over the
events seen so far (pytest: per-batch snapshots equal batch
kmv_sketch_by_group over each prefix).

Same determinism contract as the batch sketch: md5-derived hashes,
exact-count degrade below k, NULL values excluded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketch import TWO_60, _hash60

OUTPUT_SCHEMA = (
    "grp string, k_used int, kth_hash long, est_distinct double"
)


def _kmv_for_key(k: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            seen.update(int(h) for h in pdf["hv"])
        kmin = sorted(seen)[:k]
        state.update((kmin,))
        k_used = len(kmin)
        kth = kmin[-1] if kmin else None
        est = (
            float(k_used) if k_used < k
            else (k_used - 1) * TWO_60 / kth
        )
        yield pd.DataFrame({
            "grp": [str(key[0])],
            "k_used": pd.Series([k_used], dtype="int32"),
            "kth_hash": pd.Series([kth], dtype="Int64"),
            "est_distinct": [round(est, 6)],
        })

    return fn


def kmv_stream(
    events: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """events stream -> one refreshed sketch row per (group, batch):
    (grp, k_used, kth_hash, est_distinct). Update output mode."""
    hashed = events.select(
        F.col(group_col).cast("string").alias("grp"),
        _hash60(F.col(value_col)).alias("hv"),
    ).filter(F.col("hv").isNotNull())
    return hashed.groupBy("grp").applyInPandasWithState(
        _kmv_for_key(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="kmin array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
