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


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    k: int = 64,
) -> DataFrame:
    """Set-operation estimates between two groups' value sets from
    their KMV sketches (the theta-sketch use case: audience overlap,
    shared-user counts — without materializing either set).

    Method (Beyer et al. 2007): the union sketch is the k smallest of
    the two sketches' union, giving |A ∪ B| ≈ (k-1)/R as usual; the
    fraction rho of union-sketch members present in BOTH per-group
    sketches estimates Jaccard, and |A ∩ B| ≈ rho * |A ∪ B|.
    Deterministic — exact DuckDB twin; exact values ride along as the
    accuracy witness. One row: (k_used, union_est, inter_est,
    jaccard_est, union_exact, inter_exact)."""
    from pyspark.sql.window import Window

    hashes = (
        df.filter(F.col(group_col).isin([group_a, group_b]))
        .select(
            F.col(group_col).alias("grp"),
            _hash60(F.col(value_col)).alias("hv"),
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy(F.asc("hv"))
    sk = hashes.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    in_a = sk.filter(F.col("grp") == group_a).select("hv").withColumn(
        "in_a", F.lit(1)
    )
    in_b = sk.filter(F.col("grp") == group_b).select("hv").withColumn(
        "in_b", F.lit(1)
    )
    wu = Window.orderBy(F.asc("hv"))
    union_sk = (
        sk.select("hv").distinct()
        .withColumn("r", F.row_number().over(wu))
        .filter(F.col("r") <= k)
        .join(in_a, "hv", "left")
        .join(in_b, "hv", "left")
    )
    agg = union_sk.agg(
        F.count("*").alias("k_used"),
        F.max("hv").alias("kth"),
        F.sum(
            (F.coalesce(F.col("in_a"), F.lit(0)) * F.coalesce(F.col("in_b"), F.lit(0)))
        ).alias("n_both"),
    )
    # exact witness (the expensive thing the sketch replaces)
    ex = hashes.groupBy("hv").agg(
        F.max(F.when(F.col("grp") == group_a, 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("grp") == group_b, 1).otherwise(0)).alias("b"),
    ).agg(
        F.count("*").alias("union_exact"),
        F.sum(F.col("a") * F.col("b")).alias("inter_exact"),
    )
    union_est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise((F.col("k_used") - 1).cast("double") * F.lit(TWO_60) / F.col("kth"))
    rho = F.col("n_both").cast("double") / F.col("k_used")
    return agg.crossJoin(ex).select(
        F.col("k_used").cast("int").alias("k_used"),
        F.round(union_est, 6).alias("union_est"),
        F.round(rho * union_est, 6).alias("inter_est"),
        F.round(rho, 6).alias("jaccard_est"),
        "union_exact",
        F.col("inter_exact").cast("long").alias("inter_exact"),
    )


def kmv_set_ops_sql(
    table: str, group_col: str, value_col: str, group_a: str, group_b: str,
    k: int = 64,
) -> str:
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_col} AS grp,
         ('0x' || substr(md5({value_col}::VARCHAR), 1, 15))::BIGINT AS hv
  FROM {table} WHERE {group_col} IN ('{group_a}', '{group_b}')
),
sk AS (
  SELECT grp, hv FROM (
    SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv ASC) AS r
    FROM hashes
  ) WHERE r <= {k}
),
u AS (
  SELECT hv FROM (
    SELECT hv, row_number() OVER (ORDER BY hv ASC) AS r
    FROM (SELECT DISTINCT hv FROM sk)
  ) WHERE r <= {k}
),
flags AS (
  SELECT u.hv,
         CASE WHEN a.hv IS NOT NULL THEN 1 ELSE 0 END AS in_a,
         CASE WHEN b.hv IS NOT NULL THEN 1 ELSE 0 END AS in_b
  FROM u
  LEFT JOIN (SELECT hv FROM sk WHERE grp = '{group_a}') a ON u.hv = a.hv
  LEFT JOIN (SELECT hv FROM sk WHERE grp = '{group_b}') b ON u.hv = b.hv
),
agg AS (
  SELECT count(*) AS k_used, max(hv) AS kth,
         sum(in_a * in_b) AS n_both
  FROM flags
),
ex AS (
  SELECT count(*) AS union_exact,
         CAST(sum(a * b) AS BIGINT) AS inter_exact
  FROM (
    SELECT hv,
           max(CASE WHEN grp = '{group_a}' THEN 1 ELSE 0 END) AS a,
           max(CASE WHEN grp = '{group_b}' THEN 1 ELSE 0 END) AS b
    FROM hashes GROUP BY hv
  )
)
SELECT CAST(a.k_used AS INT) AS k_used,
       round(CASE WHEN a.k_used < {k} THEN a.k_used::DOUBLE
                  ELSE (a.k_used - 1)::DOUBLE * {TWO_60!r} / a.kth END, 6)
         AS union_est,
       round((a.n_both::DOUBLE / a.k_used) *
             CASE WHEN a.k_used < {k} THEN a.k_used::DOUBLE
                  ELSE (a.k_used - 1)::DOUBLE * {TWO_60!r} / a.kth END, 6)
         AS inter_est,
       round(a.n_both::DOUBLE / a.k_used, 6) AS jaccard_est,
       e.union_exact, e.inter_exact
FROM agg a, ex e
"""
