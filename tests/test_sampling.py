"""Deterministic split/sample: stability under corpus growth (no
test-set leakage), weight accuracy, per-stratum rate uniformity, and
DuckDB twin parity."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.sampling import (
    hash_split,
    hash_split_sql,
    stratified_sample,
    stratified_sample_sql,
)

SF_DIR = "/root/testdata/sf0.001"
WEIGHTS = {"train": 0.8, "test": 0.1, "val": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()


def test_split_stable_under_growth(spark, docs):
    """A doc's split assignment must not change when more docs arrive."""
    small = docs.limit(100)
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", WEIGHTS).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", WEIGHTS).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_split_weights_and_totality(spark, docs):
    rows = hash_split(docs, "doc_id", WEIGHTS).collect()
    n = len(rows)
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert sum(counts.values()) == n          # every row assigned once
    assert abs(counts["train"] / n - 0.8) < 0.08
    assert abs(counts.get("test", 0) / n - 0.1) < 0.06
    assert abs(counts.get("val", 0) / n - 0.1) < 0.06


def test_bad_weights_raise(docs):
    with pytest.raises(ValueError, match="sum"):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.6})


def test_stratified_rates_per_stratum(spark, docs):
    got = stratified_sample(docs, "doc_id", "lang", 0.3).collect()
    tot = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    by_lang = {}
    for r in got:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    for lang, n in tot.items():
        rate = by_lang.get(lang, 0) / n
        # uniform hash within each stratum: rate ≈ 0.3 even for small strata
        assert abs(rate - 0.3) < 0.18, (lang, rate, n)


def test_split_and_sample_match_duckdb(spark, docs):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    a = sorted(tuple(r) for r in hash_split(docs, "doc_id", WEIGHTS).collect())
    b = sorted(tuple(r) for r in con.execute(
        hash_split_sql("documents", "doc_id", WEIGHTS)).fetchall())
    assert a == b
    a2 = sorted(tuple(r) for r in stratified_sample(
        docs, "doc_id", "lang", 0.3).collect())
    b2 = sorted(tuple(r) for r in con.execute(
        stratified_sample_sql("documents", "doc_id", "lang", 0.3)).fetchall())
    assert a2 == b2
