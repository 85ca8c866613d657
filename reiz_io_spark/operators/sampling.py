"""Deterministic dataset splitting & sampling for training-data
pipelines: content-stable train/test/val assignment and per-stratum
sampling, as pure hash arithmetic — no RNG state, no `.sample()`
(Spark's sample is partition-order-dependent and irreproducible under
repartitioning; these are pure functions of the row id, stable across
cluster size, retries, and engines).

The hash is the md5-prefix-to-BIGINT trick shared with
dedup_checkable/sketch (60 bits, normalized by 2^60), so every operator
here has an exact DuckDB twin and the driver hash-compare verifies the
actual split/sample membership, row for row.

Scale shape: one map-only pass, zero shuffles; the split column is a
pure projection, so the assignment can also be computed on the fly at
read time (no materialized split table needed) — at 10^12 rows that is
the difference between a metadata decision and a second copy of the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TWO_60 = float(1 << 60)


def _unit_hash(col, salt: str):
    """Deterministic value in [0, 1): md5(salt || id) -> 60-bit int /
    2^60. Identical expression in the DuckDB twins."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return h / F.lit(TWO_60)


def _unit_hash_sql(expr: str, salt: str) -> str:
    return (
        f"(('0x' || substr(md5('{salt}' || ({expr})::VARCHAR), 1, 15))::BIGINT"
        f" / {TWO_60!r})"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights —
    (id_col, split). Deterministic in (id, salt); weights must sum to
    ~1. A row's split never changes when the corpus grows (the property
    a training pipeline needs: no test-set leakage on re-ingest)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights sum to {total}, expected 1.0")
    u = _unit_hash(F.col(id_col), salt)
    expr = None
    acc = 0.0
    *head, (last_name, _) = list(weights.items())
    for name, w in head:
        acc += w
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(last_name) if expr is None else expr.otherwise(last_name)
    return df.select(F.col(id_col), split.alias("split"))


def hash_split_sql(
    table: str, id_col: str, weights: dict[str, float], salt: str = "split"
) -> str:
    u = _unit_hash_sql(id_col, salt)
    acc = 0.0
    cases = []
    *head, (last_name, _) = list(weights.items())
    for name, w in head:
        acc += w
        cases.append(f"WHEN {u} < {acc!r} THEN '{name}'")
    body = " ".join(cases)
    return f"""
SELECT {id_col}, CASE {body} ELSE '{last_name}' END AS split FROM {table}
"""


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~fraction sample WITHIN each stratum —
    (id_col, strata_col). Per-stratum rates stay equal by construction
    (the hash is uniform within every stratum), unlike a global sample
    which under-represents small strata by chance."""
    u = _unit_hash(F.col(id_col), salt)
    return df.filter(u < F.lit(fraction)).select(id_col, strata_col)


def stratified_sample_sql(
    table: str, id_col: str, strata_col: str, fraction: float,
    salt: str = "sample",
) -> str:
    u = _unit_hash_sql(id_col, salt)
    return f"""
SELECT {id_col}, {strata_col} FROM {table} WHERE {u} < {fraction!r}
"""
