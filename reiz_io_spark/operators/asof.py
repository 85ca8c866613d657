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
    )
    rt = right.select(
        key, ts, id_col,
        F.lit(1).alias("_is_right"),
        *[F.col(c).alias(f"right_{c}") for c in right_payload],
    )
    u = lt.unionByName(rt)
    # right rows sort BEFORE left rows at equal ts (desc on the tag)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_right").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # All carries are PRIMITIVE last(ignorenulls) aggregates evaluated in
    # one Window operator (no struct construction per row — the struct
    # carry cost ~35% more wall time for identical output). One-matched-
    # row semantics are kept by a match-id guard instead: for each
    # payload column we also carry the id of the latest right row whose
    # payload was NON-NULL, and emit the payload only when that id
    # equals the matched right_id. A right row with a NULL payload
    # therefore yields NULL (never an older row's payload spliced under
    # a newer right_ts/right_id — the original splice bug stays dead;
    # regression-tested in test_asof).
    is_r = F.col("_is_right") == 1
    carries = [
        F.last(F.when(is_r, F.col(ts)), ignorenulls=True)
        .over(w).alias("right_ts"),
        F.last(F.when(is_r, F.col(id_col)), ignorenulls=True)
        .over(w).alias("right_id"),
    ]
    for c in right_payload:
        carries += [
            F.last(
                F.when(is_r & F.col(f"right_{c}").isNotNull(), F.col(id_col)),
                ignorenulls=True,
            ).over(w).alias(f"_nnid_{c}"),
            F.last(F.when(is_r, F.col(f"right_{c}")), ignorenulls=True)
            .over(w).alias(f"_nnval_{c}"),
        ]
    return (
        u.select(key, ts, id_col, "_is_right", *carries)
        .filter(F.col("_is_right") == 0)
        .select(
            key, ts, id_col,
            *[
                F.when(
                    F.col(f"_nnid_{c}") == F.col("right_id"),
                    F.col(f"_nnval_{c}"),
                ).alias(f"right_{c}")
                for c in right_payload
            ],
            "right_ts", "right_id",
        )
    )


def purchases_last_click_sql() -> str:
    """DuckDB twin of the driver entry: every purchase joined to the
    user's latest click at-or-before it. The twin keeps the
    single-struct carry (one last_value over a struct); the Spark
    operator now carries the same fields as separate primitive
    last(ignorenulls) columns guarded by a shared match id (r5 perf
    rework) — the one-matched-row SEMANTICS are identical engine to
    engine, and the results hash-match."""
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
         last_value(CASE WHEN is_right = 1 THEN struct_pack(
             right_value := right_value, right_ts := right_ts,
             right_id := right_id) END IGNORE NULLS)
           OVER w AS r
  FROM u
  WINDOW w AS (PARTITION BY user_id
               ORDER BY ts ASC, is_right DESC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, ts, event_id,
       round(r['right_value'], 6) AS right_value,
       r['right_ts'] AS right_ts, r['right_id'] AS right_id,
       epoch_us(ts) - epoch_us(r['right_ts']) AS micros_since
FROM c WHERE is_right = 0 AND r['right_ts'] IS NOT NULL
"""


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Interval/range join — all (left, right) pairs within the same
    key where right.ts ∈ [left.ts + lower_s, left.ts + upper_s].

    Scalable shape: a naive theta-join (r.ts BETWEEN ...) degenerates
    to a per-key cross product. Here both sides are BUCKETIZED into
    time bins of width (upper_s - lower_s): each right row lands in one
    bin, each left row explodes to the 2 bins its window can cover, and
    the join is a plain equi-join on (key, bin) followed by the exact
    interval filter. Join volume ∝ true pairs + one-bin slack, never
    |L| x |R| per key. (This is Spark's own interval-join strategy for
    stream-stream joins, applied to batch.)

    Output: key, l_id, l_ts, r_id, r_ts, micros_between (>= 0 when
    lower_s >= 0). Tie semantics: both interval ends inclusive.
    """
    if upper_s <= lower_s:
        raise ValueError("range_join: upper_s must exceed lower_s")
    width = upper_s - lower_s
    # NTZ -> TS applies one uniform session-tz shift; bins and the
    # exact filter both live in that shifted space, so membership is
    # unaffected.
    l_us = F.unix_micros(F.col(ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(ts).cast("timestamp"))
    w_us = width * 1_000_000
    lo_us, up_us = lower_s * 1_000_000, upper_s * 1_000_000

    lt = left.select(
        key,
        F.col(id_col).alias("l_id"),
        F.col(ts).alias("l_ts"),
        l_us.alias("_l_us"),
        F.explode(
            F.sequence(
                F.floor((l_us + lo_us) / w_us), F.floor((l_us + up_us) / w_us)
            )
        ).alias("_bin"),
    )
    rt = right.select(
        key,
        F.col(id_col).alias("r_id"),
        F.col(ts).alias("r_ts"),
        r_us.alias("_r_us"),
        F.floor(r_us / w_us).alias("_bin"),
    )
    return (
        lt.join(rt, [key, "_bin"])
        .filter(
            (F.col("_r_us") >= F.col("_l_us") + lo_us)
            & (F.col("_r_us") <= F.col("_l_us") + up_us)
        )
        .select(
            key, "l_id", "l_ts", "r_id", "r_ts",
            (F.col("_r_us") - F.col("_l_us")).alias("micros_between"),
        )
    )


def views_then_clicks_sql(lower_s: int, upper_s: int) -> str:
    """DuckDB twin of the driver entry: clicks within
    [view.ts + lower_s, view.ts + upper_s] per user (plain range join —
    the oracle does not need the bucketed shape, only the semantics)."""
    return f"""
SELECT v.user_id AS user_id,
       v.event_id AS l_id, v.ts AS l_ts,
       c.event_id AS r_id, c.ts AS r_ts,
       epoch_us(c.ts) - epoch_us(v.ts) AS micros_between
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND c.ts >= v.ts + INTERVAL {lower_s} SECOND
 AND c.ts <= v.ts + INTERVAL {upper_s} SECOND
WHERE v.event_type = 'view' AND c.event_type = 'click'
"""
