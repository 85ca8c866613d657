"""KMV (k-minimum-values) distinct-count sketch — a DETERMINISTIC
sketch, so unlike HLL/approx_count_distinct the estimate is a pure
function of the data and has an exact DuckDB twin (the driver
hash-compare can verify the whole sketch pipeline value for value).

Theory (Bar-Yossef et al. 2002; Beyer et al. "Distinct-value synopses",
SIGMOD 2007): hash every value uniformly into (0, 1]; if the k-th
smallest distinct hash is R, the value count is ≈ (k-1)/R. Here the
hash is the first 15 hex digits of md5 (60 bits, < 2^60 so it fits a
BIGINT in both engines), normalized by 2^60.

Scale shape — true bounded state, the KMV merge property made literal:

- map side: one pass over each input partition keeps, per group, the k
  smallest DISTINCT hashes seen in that partition (an O(k) running
  state, pruned as it streams). Output is <= k rows per
  (partition, group) — never the distinct set.
- reduce side: sketches merge by keeping the k smallest of their union
  (array_sort + slice over <= n_partitions * k values per group).

No corpus-sized `.distinct()` and no global window over all distinct
hashes anywhere in the sketch path (the r03 shape did both; at 10^12
rows that materializes the full distinct set the sketch exists to
avoid). The driver-entry wrapper joins an `exact_distinct` WITNESS
column for the hash gate — that witness is the expensive computation
the sketch replaces and is the only full-distinct scan left; drop it
at production scale.

When a group has fewer than k distinct values the sketch degrades to
the exact count (standard KMV convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_60 = float(1 << 60)


def _hash60(col) -> Column:
    """First 15 hex digits of md5 as a BIGINT — bit-identical to
    DuckDB's ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmin_partials(
    df: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """Map-side KMV state: (grp, hv) with <= k rows per (input
    partition, group) — the bounded partial every merge consumes."""
    import pandas as pd

    # NULL values are excluded up front (COUNT DISTINCT semantics; a
    # NULL hv would also turn the Arrow long column into float64/NaN in
    # the pandas partial and crash int()) — the DuckDB twins filter
    # identically.
    hashed = df.select(
        F.col(group_col).cast("string").alias("grp"),
        _hash60(F.col(value_col)).alias("hv"),
    ).filter(F.col("hv").isNotNull())

    def partial(batches):
        state: dict[str, set[int]] = {}
        for pdf in batches:
            for grp, sub in pdf.groupby("grp"):
                s = state.setdefault(grp, set())
                s.update(int(h) for h in sub["hv"].unique())
                if len(s) > 4 * k:  # stream-prune: keep the k smallest
                    state[grp] = set(sorted(s)[:k])
        grps, hvs = [], []
        for grp, s in state.items():
            for hv in sorted(s)[:k]:
                grps.append(grp)
                hvs.append(hv)
        yield pd.DataFrame({"grp": grps, "hv": hvs})

    return hashed.mapInPandas(partial, "grp string, hv long")


def _merge_sketch(partials: DataFrame, k: int) -> DataFrame:
    """(grp, sketch array<long>) — the KMV merge: k smallest of the
    union of the per-partition partials (<= n_partitions * k values
    per group reach this aggregation)."""
    return partials.groupBy("grp").agg(
        F.slice(F.array_sort(F.collect_set("hv")), 1, k).alias("sketch")
    )


def _estimate(k: int) -> Column:
    """(k-1)/R scaled to the 60-bit hash space; exact-count degrade
    below k. Identical expression to the DuckDB twin."""
    return F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        (F.col("k_used") - 1).cast("double") * F.lit(TWO_60) / F.col("kth_hash")
    )


def kmv_sketch_by_group(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(group, k_used, kth_hash, est_distinct) per group — the pure
    bounded-state sketch (the production path: no full-distinct scan
    anywhere in its plan)."""
    merged = _merge_sketch(kmin_partials(df, group_col, value_col, k), k)
    return merged.select(
        F.col("grp").alias(group_col),
        F.size("sketch").cast("int").alias("k_used"),
        F.element_at("sketch", F.size("sketch")).alias("kth_hash"),
    ).select(
        group_col,
        "k_used",
        "kth_hash",
        F.round(_estimate(k), 6).alias("est_distinct"),
    )


def kmv_distinct_by_group(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Driver-entry variant: the bounded sketch + an `exact_distinct`
    accuracy WITNESS column (a full distinct count — the expensive
    thing the sketch replaces; it exists so the driver's hash gate can
    verify the estimate, and is dropped at production scale)."""
    sk = kmv_sketch_by_group(df, group_col, value_col, k)
    exact = (
        df.select(
            F.col(group_col).cast("string").alias(group_col),
            _hash60(F.col(value_col)).alias("hv"),
        )
        .filter(F.col("hv").isNotNull())
        .distinct()
        .groupBy(group_col)
        .agg(F.count("*").alias("exact_distinct"))
    )
    return sk.join(exact, group_col).select(
        group_col, "k_used", "kth_hash", "est_distinct", "exact_distinct"
    )


def kmv_distinct_by_group_sql(
    table: str, group_col: str, value_col: str, k: int = 64
) -> str:
    """DuckDB twin (same hash, same k-smallest-distinct selection, same
    estimator — the twin states the DEFINITION; the Spark side computes
    it with bounded partials, which the KMV merge property makes
    equal)."""
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_col} AS grp,
         ('0x' || substr(md5({value_col}::VARCHAR), 1, 15))::BIGINT AS hv
  FROM {table} WHERE {value_col} IS NOT NULL
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

    Scale shape: the per-group sketches come from the same bounded
    kmin_partials pipeline (map-side k-min, no distinct); the set
    algebra then runs on two k-length ARRAYS in a single row — pure
    Catalyst array functions, no joins, no windows. Deterministic —
    exact DuckDB twin; exact values ride along as the accuracy
    witness (the full-distinct scan the sketch replaces — drop it at
    production scale). One row: (k_used, union_est, inter_est,
    jaccard_est, union_exact, inter_exact)."""
    sub = df.filter(F.col(group_col).isin([group_a, group_b]))
    partials = kmin_partials(sub, group_col, value_col, k)
    one = partials.agg(
        F.slice(
            F.array_sort(
                F.collect_set(F.when(F.col("grp") == group_a, F.col("hv")))
            ), 1, k,
        ).alias("a"),
        F.slice(
            F.array_sort(
                F.collect_set(F.when(F.col("grp") == group_b, F.col("hv")))
            ), 1, k,
        ).alias("b"),
    )
    u = F.slice(F.array_sort(F.array_union("a", "b")), 1, k)
    one = one.select(
        "a", "b", u.alias("u")
    ).select(
        F.size("u").cast("int").alias("k_used"),
        F.when(F.size("u") > 0, F.element_at("u", F.size("u"))).alias("kth_hash"),
        F.size(F.array_intersect(F.array_intersect("u", "a"), "b"))
        .cast("long").alias("n_both"),
    )
    # exact witness (the expensive thing the sketch replaces)
    hashes = sub.select(
        F.col(group_col).alias("grp"), _hash60(F.col(value_col)).alias("hv")
    ).filter(F.col("hv").isNotNull()).distinct()
    ex = hashes.groupBy("hv").agg(
        F.max(F.when(F.col("grp") == group_a, 1).otherwise(0)).alias("a"),
        F.max(F.when(F.col("grp") == group_b, 1).otherwise(0)).alias("b"),
    ).agg(
        F.count("*").alias("union_exact"),
        F.sum(F.col("a") * F.col("b")).alias("inter_exact"),
    )
    union_est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        (F.col("k_used") - 1).cast("double") * F.lit(TWO_60) / F.col("kth_hash")
    )
    rho = F.col("n_both").cast("double") / F.col("k_used")
    return one.crossJoin(ex).select(
        "k_used",
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
  FROM {table}
  WHERE {group_col} IN ('{group_a}', '{group_b}')
    AND {value_col} IS NOT NULL
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
