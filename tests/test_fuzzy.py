"""SymSpell deletion-neighborhood fuzzy term lookup: the join shape
must equal the brute levenshtein filter for every edit kind, and the
DuckDB twin agrees."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reiz_io_spark.operators import fulltext

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def _brute(docs, q, max_edits=1):
    d = fulltext.dictionary(docs).select("term", "df")
    return sorted(
        tuple(r)
        for r in d.withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
        .filter(F.col("dist") <= max_edits)
        .select("term", "df", F.col("dist").cast("int").alias("dist"))
        .collect()
    )


def test_each_edit_kind(spark):
    """Substitution, insertion (query has an extra char), deletion
    (query dropped a char), and exact — all reachable via the
    delete-neighborhood identity."""
    df = spark.createDataFrame([Row(doc_id=1, text="stream spark table")])
    for q, want_terms in [
        ("straam", ["stream"]),   # substitution
        ("streams", ["stream"]),  # query has extra char (deletion on query)
        ("strem", ["stream"]),    # query missing a char (insertion on query)
        ("stream", ["stream"]),   # exact (dist 0)
        ("xyzzy", []),            # nothing close
    ]:
        got = [r["term"] for r in fulltext.fuzzy_term_matches(df, q).collect()]
        assert sorted(got) == want_terms, (q, got)


def test_symspell_equals_brute(spark, docs):
    for q in ("strem", "tble", "sprak", "vectr", "joinn"):
        got = sorted(tuple(r) for r in fulltext.fuzzy_term_matches(docs, q).collect())
        assert got == _brute(docs, q), q


def test_fuzzy_matches_duckdb(spark, docs):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    q = "strem"
    a = sorted(tuple(r) for r in fulltext.fuzzy_term_matches(docs, q).collect())
    b = sorted(tuple(r) for r in con.execute(
        fulltext.fuzzy_term_matches_sql(q)).fetchall())
    assert a == b
