"""Two-level grouped top-k — the tree-reduction idiom for window
top-k at scale, pure Catalyst.

A single `row_number() over (partition by g order by ...)` funnels
every scored row of group g through ONE reducer; for per-query/
per-group top-k over corpus-sized score sets that reducer is the
bottleneck at 10^9+ rows. The fix is the same shape as wand.py's
bucketed limit and pq.py's map-side pruning, expressed with two
windows:

1. local: rank within (group, bucket) — buckets = pmod(id, n), so the
   first exchange fans out to group x n_buckets reducers, each keeping
   <= k rows;
2. global: rank within (group) over the <= k * n_buckets survivors —
   a tiny exchange.

Selection uses the SAME total order at both levels, so the result is
row-identical to the single-window plan (per-bucket top-k composes to
global top-k under a total order) — every oracle/driver entry built on
this helper keeps its DuckDB twin unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

N_BUCKETS = 64


def two_level_topk(
    scored: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    k: int,
    bucket_on: str,
    rank_name: str = "rank",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Top-k rows per `part_cols` group under `order_cols`, with the
    two-level exchange shape. `bucket_on` is an id-ish column the local
    stage buckets by (deterministic, data-derived — stable under task
    retries). Output carries `rank_name` (1-based)."""
    bucket = F.pmod(F.col(bucket_on), F.lit(n_buckets))
    w_local = Window.partitionBy(*part_cols, "_tk_bucket").orderBy(*order_cols)
    w_global = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        scored.withColumn("_tk_bucket", bucket)
        .withColumn("_tk_lr", F.row_number().over(w_local))
        .filter(F.col("_tk_lr") <= k)
        .withColumn(rank_name, F.row_number().over(w_global))
        .filter(F.col(rank_name) <= k)
        .drop("_tk_bucket", "_tk_lr")
    )
