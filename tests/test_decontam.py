"""Benchmark decontamination (n-gram overlap) and PII scrubbing:
hand-built positives/negatives, scrub-order semantics, and DuckDB twin
parity on real documents."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import Row

from reiz_io_spark.operators import decontam

SF_DIR = "/root/testdata/sf0.001"


def test_contamination_micro(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta gamma delta"),       # hits bench 3-gram
        Row(doc_id=2, text="beta gamma epsilon"),           # no 3-gram overlap
        Row(doc_id=3, text="x alpha beta gamma y"),         # same hit mid-doc
        Row(doc_id=4, text="totally unrelated words here"),
    ])
    bench = spark.createDataFrame([
        Row(bench_id=1, text="question: alpha beta gamma?"),
    ])
    got = {r["doc_id"]: r["n_hits"]
           for r in decontam.contaminated_docs(docs, bench, n=3).collect()}
    assert got == {1: 1, 3: 1}


def test_contamination_counts_distinct_ngrams(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="a b c d e"),  # shares "a b c", "b c d", "c d e"
    ])
    bench = spark.createDataFrame([Row(bench_id=1, text="a b c d e f")])
    r = decontam.contaminated_docs(docs, bench, n=3).collect()[0]
    assert r["n_hits"] == 3
    assert r["first_hit"] == "a_b_c"


def test_scrub_pii_micro(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="mail me at a.user+x@test.org or 10.0.0.1 acct 1234567890"),
        Row(doc_id=2, text="clean text, no pii"),
    ])
    got = {r["doc_id"]: r for r in decontam.scrub_pii(docs).collect()}
    r1 = got[1]
    assert (r1["n_emails"], r1["n_ips"], r1["n_digit_runs"]) == (1, 1, 1)
    assert r1["scrubbed"] == "mail me at [EMAIL] or [IP] acct [NUM]"
    r2 = got[2]
    assert (r2["n_emails"], r2["n_ips"], r2["n_digit_runs"]) == (0, 0, 0)
    assert r2["scrubbed"] == "clean text, no pii"


def test_decontam_matches_duckdb(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bench_rows = [(1, "spark stream vector table"), (2, "batch hash join")]
    bench = spark.createDataFrame(
        [Row(bench_id=b, text=t) for b, t in bench_rows]
    )
    a = sorted(tuple(r) for r in decontam.contaminated_docs(docs, bench, n=3).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    b = sorted(tuple(r) for r in con.execute(
        decontam.contaminated_docs_sql(bench_rows, n=3)).fetchall())
    assert a == b


def test_scrub_matches_duckdb(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    a = sorted(tuple(r) for r in decontam.scrub_pii(docs).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    b = sorted(tuple(r) for r in con.execute(decontam.scrub_pii_sql()).fetchall())
    assert a == b
