"""Bucketized range join (== naive theta join, micro boundary cases)
and the deterministic KMV distinct sketch (exact small-group path,
error bound, DuckDB twin parity)."""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reiz_io_spark.operators.asof import range_join_bucketed
from reiz_io_spark.operators.sketch import (
    kmv_distinct_by_group,
    kmv_distinct_by_group_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def test_range_join_micro_boundaries(spark):
    left = spark.createDataFrame([Row(user_id=1, ts=_ts(100), event_id=1)])
    right = spark.createDataFrame([
        Row(user_id=1, ts=_ts(100), event_id=10),   # at lower bound (0) - in
        Row(user_id=1, ts=_ts(160), event_id=11),   # at upper bound (60) - in
        Row(user_id=1, ts=_ts(161), event_id=12),   # 1s past upper - out
        Row(user_id=1, ts=_ts(99), event_id=13),    # before lower - out
        Row(user_id=2, ts=_ts(120), event_id=14),   # other key - out
    ])
    got = sorted(
        r["r_id"]
        for r in range_join_bucketed(
            left, right, "user_id", "ts", "event_id", 0, 60
        ).collect()
    )
    assert got == [10, 11]


def test_range_join_matches_naive_theta(spark):
    """Bucketized shape == the naive interval theta-join on real data
    (the correctness proof that bin coverage loses no pairs)."""
    e = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    views = e.filter(F.col("event_type") == "view")
    clicks = e.filter(F.col("event_type") == "click")
    fast = sorted(
        (r["l_id"], r["r_id"])
        for r in range_join_bucketed(
            views, clicks, "user_id", "ts", "event_id", 0, 14400
        ).collect()
    )
    v = views.select("user_id", F.col("event_id").alias("l_id"), F.col("ts").alias("l_ts"))
    c = clicks.select("user_id", F.col("event_id").alias("r_id"), F.col("ts").alias("r_ts"))
    naive = sorted(
        (r["l_id"], r["r_id"])
        for r in v.join(c, "user_id")
        .filter(
            (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 14400 SECONDS"))
        )
        .collect()
    )
    assert fast == naive
    assert len(fast) > 0


def test_kmv_small_group_is_exact(spark):
    """Groups with fewer than k distinct values fall back to the exact
    count (standard KMV convention)."""
    df = spark.createDataFrame(
        [Row(g="a", v=i % 5) for i in range(50)]
        + [Row(g="b", v=i) for i in range(200)]
    )
    got = {r["g"]: r for r in kmv_distinct_by_group(df, "g", "v", k=64).collect()}
    assert got["a"]["est_distinct"] == 5.0      # 5 < k -> exact
    assert got["a"]["exact_distinct"] == 5
    assert got["b"]["k_used"] == 64             # sketch path engaged
    rel_err = abs(got["b"]["est_distinct"] - 200) / 200
    assert rel_err < 0.5                        # k=64 -> ~1/8 std err


def test_kmv_error_bound_many_values(spark):
    """At n=2000 distinct, k=256, the estimate lands within 3 standard
    errors (3/sqrt(k) ≈ 19%). Deterministic — this is a fixed assertion,
    not a flaky statistical test."""
    df = spark.createDataFrame([Row(g="x", v=i) for i in range(2000)])
    r = kmv_distinct_by_group(df, "g", "v", k=256).collect()[0]
    assert abs(r["est_distinct"] - 2000) / 2000 < 3 / (256 ** 0.5)


def test_kmv_matches_duckdb(spark):
    e = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    a = sorted(tuple(r) for r in kmv_distinct_by_group(
        e, "event_type", "user_id", k=32).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    b = sorted(tuple(r) for r in con.execute(
        kmv_distinct_by_group_sql("events", "event_type", "user_id", k=32)
    ).fetchall())
    assert a == b


def test_kmv_set_ops_planted_overlap(spark):
    """Two groups with known 50% overlap: 300 values each, 150 shared.
    Estimates land near truth; small-k exact path kicks in below k."""
    rows = (
        [Row(g="a", v=i) for i in range(300)]           # a: 0..299
        + [Row(g="b", v=i) for i in range(150, 450)]    # b: 150..449
    )
    df = spark.createDataFrame(rows)
    from reiz_io_spark.operators.sketch import kmv_set_ops

    r = kmv_set_ops(df, "g", "v", "a", "b", k=128).collect()[0]
    assert r["union_exact"] == 450 and r["inter_exact"] == 150
    assert abs(r["union_est"] - 450) / 450 < 3 / (128 ** 0.5)
    assert abs(r["jaccard_est"] - 150 / 450) < 0.15
    assert abs(r["inter_est"] - 150) / 150 < 0.5

    # tiny groups -> exact path (k_used < k)
    tiny = spark.createDataFrame(
        [Row(g="a", v=i) for i in range(5)] + [Row(g="b", v=i) for i in range(3, 8)]
    )
    t = kmv_set_ops(tiny, "g", "v", "a", "b", k=64).collect()[0]
    assert t["union_est"] == t["union_exact"] == 8
    assert t["inter_est"] == t["inter_exact"] == 2


def test_kmv_set_ops_matches_duckdb(spark):
    import duckdb as _d

    e = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    from reiz_io_spark.operators.sketch import kmv_set_ops, kmv_set_ops_sql

    a = [tuple(r) for r in kmv_set_ops(
        e, "event_type", "user_id", "click", "view", k=32).collect()]
    con = _d.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    b = [tuple(r) for r in con.execute(
        kmv_set_ops_sql("events", "event_type", "user_id", "click", "view", k=32)
    ).fetchall()]
    assert a == b


def test_kmv_partials_bounded_and_plan_has_no_distinct(spark):
    """The sketch path's bounded-state contract: the map-side partial
    emits <= k rows per (partition, group), and the production sketch
    plan contains NO full-distinct aggregation and NO window — the
    only shuffle is the k-length-partial merge."""
    from reiz_io_spark.operators.sketch import kmin_partials, kmv_sketch_by_group

    df = spark.range(0, 20_000, 1, 8).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 5000).alias("v"),
    )
    k = 32
    partials = kmin_partials(df, "g", "v", k)
    assert partials.count() <= 8 * 3 * k
    # partials really are the k smallest per (partition, group): merged
    # sketch == the definition computed the expensive way
    sk = {r["g"]: r for r in kmv_sketch_by_group(df, "g", "v", k=k).collect()}
    from pyspark.sql.window import Window

    w = Window.partitionBy("g").orderBy("hv")
    from reiz_io_spark.operators.sketch import _hash60

    ref = (
        df.select(F.col("g"), _hash60(F.col("v")).alias("hv")).distinct()
        .withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
        .groupBy("g").agg(F.count("*").alias("k_used"), F.max("hv").alias("kth"))
    )
    for r in ref.collect():
        assert sk[r["g"]]["k_used"] == r["k_used"]
        assert sk[r["g"]]["kth_hash"] == r["kth"]
    plan = kmv_sketch_by_group(df, "g", "v", k=k)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # the only aggregate keys allowed are the merge's (grp) — a
    # (grp, hv) keyed aggregate would be the full distinct
    import re

    for m in re.finditer(r"HashAggregate\(keys=\[([^\]]*)\]", plan):
        assert "hv" not in m.group(1), plan


def test_kmv_null_values_tolerated_and_excluded(spark):
    """ADVICE r04: a nullable value column must not crash the
    map-side partial (NULL hv -> float64/NaN in pandas -> int() blew
    up) and NULLs are excluded with COUNT DISTINCT semantics — the
    estimate/exact columns see only real values."""
    from reiz_io_spark.operators import sketch

    rows = (
        [("a", f"v{i}") for i in range(40)]
        + [("a", None)] * 5
        + [("b", None)] * 3          # all-NULL group: no output row
        + [("c", "x"), ("c", None)]
    )
    df = spark.createDataFrame(rows, "grp string, val string")
    got = {
        r["grp"]: r
        for r in sketch.kmv_distinct_by_group(df, "grp", "val", k=64).collect()
    }
    assert set(got) == {"a", "c"}
    assert got["a"]["exact_distinct"] == 40
    assert got["a"]["est_distinct"] == 40.0  # < k -> exact degrade
    assert got["c"]["exact_distinct"] == 1
