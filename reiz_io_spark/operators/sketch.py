"""KMV (k-minimum-values) distinct-count sketch — a DETERMINISTIC
sketch, so unlike HLL/approx_count_distinct the estimate is a pure
function of the data and has an exact DuckDB twin (the driver
hash-compare can verify the whole sketch pipeline value for value).

Theory (Bar-Yossef et al. 2002; Beyer et al. "Distinct-value synopses",
SIGMOD 2007): hash every value uniformly into (0, 1]; if the k-th
smallest distinct hash is R, the value count is ≈ (k-1)/R. Here the
hash is the first 15 hex digits of md5 (60 bits, < 2^60 so it fits a
BIGINT in both engines), normalized by 2^60.

Scale shape: per group, the sketch state is the k smallest distinct
hashes — a bounded top-k aggregation (window rank over hash asc), NO
full distinct materialization at 10^12 rows; sketches of partitions
merge by keeping the k smallest of the union (the standard KMV merge),
which is exactly what the partial/final window aggregation does.

When a group has fewer than k distinct values the sketch degrades to
the exact count (standard KMV convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TWO_60 = float(1 << 60)


def _hash60(col):
    """First 15 hex digits of md5 as a BIGINT — bit-identical to
    DuckDB's ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct_by_group(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(group, k_used, kth_hash, est_distinct, exact_distinct) per
    group value. exact_distinct rides along as the accuracy witness
    (at production scale you would drop it — it is the expensive thing
    the sketch replaces)."""
    from pyspark.sql.window import Window

    hashes = df.select(
        F.col(group_col).alias("grp"), _hash60(F.col(value_col)).alias("hv")
    ).distinct()
    w = Window.partitionBy("grp").orderBy(F.asc("hv"))
    smallest = hashes.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= k
    )
    agg = smallest.groupBy("grp").agg(
        F.count("*").alias("k_used"),
        F.max("hv").alias("kth_hash"),
    )
    exact = hashes.groupBy("grp").agg(F.count("*").alias("exact_distinct"))
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        (F.col("k_used") - 1).cast("double") * F.lit(TWO_60) / F.col("kth_hash")
    )
    return (
        agg.join(exact, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("k_used").cast("int").alias("k_used"),
            "kth_hash",
            F.round(est, 6).alias("est_distinct"),
            "exact_distinct",
        )
    )


def kmv_distinct_by_group_sql(
    table: str, group_col: str, value_col: str, k: int = 64
) -> str:
    """DuckDB twin (same hash, same window top-k, same estimator)."""
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_col} AS grp,
         ('0x' || substr(md5({value_col}::VARCHAR), 1, 15))::BIGINT AS hv
  FROM {table}
),
smallest AS (
  SELECT grp, hv FROM (
    SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv ASC) AS r
    FROM hashes
  ) WHERE r <= {k}
),
agg AS (
  SELECT grp, count(*) AS k_used, max(hv) AS kth_hash FROM smallest GROUP BY grp
),
exact AS (
  SELECT grp, count(*) AS exact_distinct FROM hashes GROUP BY grp
)
SELECT a.grp AS {group_col}, CAST(a.k_used AS INT) AS k_used, a.kth_hash,
       round(CASE WHEN a.k_used < {k} THEN a.k_used::DOUBLE
                  ELSE (a.k_used - 1)::DOUBLE * {TWO_60!r} / a.kth_hash
             END, 6) AS est_distinct,
       e.exact_distinct
FROM agg a JOIN exact e USING (grp)
"""
