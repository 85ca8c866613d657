"""Backward as-of join: hand-computed micro cases (tie at equal ts,
unmatched lefts keep NULLs, per-key isolation) + the union/window shape
agrees with a naive per-row argmax reference on real events data."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reiz_io_spark.operators.asof import asof_join_backward

SF_DIR = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def micro(spark):
    left = spark.createDataFrame([
        Row(user_id=1, ts=_ts(10), event_id=100),   # matches click@5
        Row(user_id=1, ts=_ts(20), event_id=101),   # matches click@20 (tie)
        Row(user_id=1, ts=_ts(3), event_id=102),    # before any click -> NULL
        Row(user_id=2, ts=_ts(30), event_id=103),   # other key's clicks invisible
    ])
    right = spark.createDataFrame([
        Row(user_id=1, ts=_ts(5), event_id=200, value=1.0),
        Row(user_id=1, ts=_ts(20), event_id=201, value=2.0),  # equal-ts match
        Row(user_id=1, ts=_ts(25), event_id=202, value=3.0),  # after all lefts
    ])
    return left, right


def test_asof_micro(micro):
    left, right = micro
    got = {
        r["event_id"]: (r["right_id"], r["right_value"])
        for r in asof_join_backward(
            left, right, key="user_id", ts="ts", id_col="event_id",
            right_payload=["value"],
        ).collect()
    }
    assert got[100] == (200, 1.0)      # latest click before ts=10 is ts=5
    assert got[101] == (201, 2.0)      # equal ts matches (right sorts first)
    assert got[102] == (None, None)    # nothing precedes -> NULLs preserved
    assert got[103] == (None, None)    # user 2 has no clicks at all
    assert len(got) == 4               # every left row survives (outer)


def test_asof_matches_naive_reference(spark):
    """Union+window result == the O(L*R) per-key naive computation on
    a real slice of the events table."""
    e = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .select("event_id", "user_id", "ts", "value", "event_type")
    )
    left = e.filter(F.col("event_type") == "purchase").drop("event_type")
    right = e.filter(F.col("event_type") == "click").drop("event_type")
    got = {
        r["event_id"]: r["right_id"]
        for r in asof_join_backward(
            left, right, key="user_id", ts="ts", id_col="event_id",
            right_payload=["value"],
        ).collect()
    }

    rights = {}
    for r in right.collect():
        rights.setdefault(r["user_id"], []).append(r)
    want = {}
    for l in left.collect():
        best = None
        for r in rights.get(l["user_id"], []):
            if r["ts"] <= l["ts"]:
                k = (r["ts"], r["event_id"])
                if best is None or k > (best["ts"], best["event_id"]):
                    best = r
        want[l["event_id"]] = best["event_id"] if best else None
    assert got == want
    assert any(v is not None for v in want.values())
