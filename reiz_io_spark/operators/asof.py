"""Backward as-of join — for each left event, the latest right event at
or before it within the same partition key (the time-series join every
event pipeline needs: purchase -> last click, trade -> last quote).

Scalable shape: NO range join (a naive l.ts >= r.ts theta-join is
O(|L| x |R|) per key and explodes on active keys). Both sides are
tagged and UNIONED, then ONE window sort per key carries the most
recent right-row attributes forward (`last(..., ignorenulls=True)` over
rows unbounded-preceding..current). Cost = one shuffle on the key +
one sort — the sort-merge as-of, linear in |L| + |R|.

Tie rule: a right row with ts equal to the left row's ts IS matched
(right rows order before left rows at equal ts; ties within a side
break by the id column). DuckDB twin uses the identical window
formulation, so results hash-match value for value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    right_payload: list[str],
) -> DataFrame:
    """Left columns pass through; each right payload column appears as
    ``right_<name>`` (null when no right row precedes). Both inputs
    must carry (key, ts, id_col)."""
    lt = left.select(
        key, ts, id_col,
        F.lit(0).alias("_is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"right_{c}")
          for c in right_payload],
        F.lit(None).cast(right.schema[ts].dataType).alias("right_ts"),
        F.lit(None).cast(right.schema[id_col].dataType).alias("right_id"),
    )
    rt = right.select(
        key, ts, id_col,
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"right_{c}") for c in right_payload],
        F.col(ts).alias("right_ts"),
        F.col(id_col).alias("right_id"),
    )
    u = lt.unionByName(rt)
    # right rows sort BEFORE left rows at equal ts (desc on the tag)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_right").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [
        F.last(F.when(F.col("_is_right") == 1, F.col(c)), ignorenulls=True)
        .over(w).alias(c)
        for c in ([f"right_{c}" for c in right_payload] + ["right_ts", "right_id"])
    ]
    return (
        u.select(key, ts, id_col, "_is_right", *carried)
        .filter(F.col("_is_right") == 0)
        .drop("_is_right")
    )


def purchases_last_click_sql() -> str:
    """DuckDB twin of the driver entry: every purchase joined to the
    user's latest click at-or-before it."""
    return """
WITH u AS (
  SELECT user_id, ts, event_id, 0 AS is_right,
         NULL::DOUBLE AS right_value,
         NULL::TIMESTAMP AS right_ts, NULL::BIGINT AS right_id
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS is_right,
         value AS right_value, ts AS right_ts, event_id AS right_id
  FROM events WHERE event_type = 'click'
),
c AS (
  SELECT user_id, ts, event_id, is_right,
         last_value(CASE WHEN is_right = 1 THEN right_value END IGNORE NULLS)
           OVER w AS right_value,
         last_value(CASE WHEN is_right = 1 THEN right_ts END IGNORE NULLS)
           OVER w AS right_ts,
         last_value(CASE WHEN is_right = 1 THEN right_id END IGNORE NULLS)
           OVER w AS right_id
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts ASC, is_right DESC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, ts, event_id,
       round(right_value, 6) AS right_value, right_ts, right_id,
       epoch_us(ts) - epoch_us(right_ts) AS micros_since
FROM c WHERE is_right = 0 AND right_ts IS NOT NULL
"""
