"""Corpus-stats memo invalidation (r6): the memo key must observe an
in-place overwrite of the corpus at the SAME path.

Spark's InMemoryFileIndex hashes/equals by rootPaths only, so the
analyzed plan's semanticHash is identical for two reads of the same
path even when the files underneath changed — the r5 memo keyed on the
semantic hash alone would serve the OLD corpus's (n_docs, avgdl)
forever in a long-lived serving process. The r6 key adds the resolved
file-listing fingerprint (df.inputFiles()), which any parquet rewrite
changes (part files carry write-UUID names)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators import fulltext


def _write_docs(spark, path: str, texts: list[str]) -> None:
    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(path)


def test_same_path_overwrite_refreshes_stats(spark, tmp_path):
    path = str(tmp_path / "docs")
    _write_docs(spark, path, ["alpha beta", "gamma delta epsilon"])

    df1 = spark.read.parquet(path)
    n1, avg1 = fulltext.corpus_stats(df1)
    assert (n1, avg1) == (2, 2.5)

    # same-path, same-application overwrite — the failure mode ADVICE
    # flagged: semanticHash(df1) == semanticHash(df2) here
    _write_docs(
        spark, path, ["a b c d", "e f", "g h i j k l", "m", "n o"]
    )
    df2 = spark.read.parquet(path)
    n2, avg2 = fulltext.corpus_stats(df2)
    assert n2 == 5
    assert avg2 == pytest.approx(15 / 5)


def test_memo_hits_on_unchanged_corpus(spark, tmp_path):
    path = str(tmp_path / "docs")
    _write_docs(spark, path, ["one two", "three"])
    df = spark.read.parquet(path)
    k1 = fulltext._stats_key(df)
    assert k1 is not None
    fulltext.corpus_stats(df)
    assert k1 in fulltext._STATS_CACHE
    # a FRESH read of the unchanged path resolves the same key — the
    # memo still saves the tokenize pass across reads
    k2 = fulltext._stats_key(spark.read.parquet(path))
    assert k2 == k1


def test_explicit_invalidation_hook(spark, tmp_path):
    path = str(tmp_path / "docs")
    _write_docs(spark, path, ["x y z"])
    df = spark.read.parquet(path)
    fulltext.corpus_stats(df)
    assert fulltext._STATS_CACHE
    fulltext.invalidate_corpus_stats()
    assert not fulltext._STATS_CACHE


def test_in_memory_relation_still_memoizes(spark):
    # no file listing -> empty fingerprint; localRelation's semantic
    # hash covers the data, so the memo stays sound there
    df = spark.createDataFrame(
        [(0, "p q"), (1, "r s t")], "doc_id long, text string"
    )
    n, avg = fulltext.corpus_stats(df)
    assert (n, avg) == (2, 2.5)
    df2 = spark.createDataFrame(
        [(0, "p q"), (1, "r s t u v")], "doc_id long, text string"
    )
    n2, avg2 = fulltext.corpus_stats(df2)
    assert (n2, avg2) == (2, 3.5)
