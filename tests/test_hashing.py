"""Bit-parity of the pure-Python xxh64 with Spark's xxhash64 expression
(doc identity + bucket pruning both depend on it)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from reiz_io_spark.functions.hashing import spark_xxhash64, term_bucket_of
from reiz_io_spark.operators.build import N_TERM_BUCKETS


def test_known_vector():
    from reiz_io_spark.functions.hashing import xxh64

    assert xxh64(b"", 0) == 0xEF46DB3751D8E999  # published XXH64 vector


def test_spark_parity_strings(spark):
    cases = [
        ("",),
        ("a",),
        ("ab",),
        ("abc",),
        ("abcd",),
        ("abcdefgh",),
        ("x" * 31,),
        ("x" * 32,),
        ("x" * 33,),
        ("x" * 100,),
        ("répo/ünicode—⚡",),
        ("synth/repo001", "pkg/mod.py"),
        ("a", "b", "c"),
    ]
    exprs = [F.xxhash64(*[F.lit(x) for x in c]).alias(f"h{i}") for i, c in enumerate(cases)]
    row = spark.range(1).select(*exprs).collect()[0]
    for i, c in enumerate(cases):
        assert row[f"h{i}"] == spark_xxhash64(*c), c


def test_spark_parity_longs(spark):
    vals = [0, 1, -1, 2**62, -(2**62), 123456789]
    exprs = [
        F.xxhash64(F.lit(v).cast("long")).alias(f"h{i}") for i, v in enumerate(vals)
    ]
    row = spark.range(1).select(*exprs).collect()[0]
    for i, v in enumerate(vals):
        assert row[f"h{i}"] == spark_xxhash64(v), v


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_hash_is_stable_and_64bit(s):
    h = spark_xxhash64(s)
    assert -(2**63) <= h < 2**63
    assert h == spark_xxhash64(s)


def test_bucket_matches_writer(spark):
    terms = ["node:Call", "id:self", "lit:42", "in:Call.func", ""]
    exprs = [
        F.pmod(F.xxhash64(F.lit(t)), F.lit(N_TERM_BUCKETS)).alias(f"b{i}")
        for i, t in enumerate(terms)
    ]
    row = spark.range(1).select(*exprs).collect()[0]
    for i, t in enumerate(terms):
        assert row[f"b{i}"] == term_bucket_of(t, N_TERM_BUCKETS)
