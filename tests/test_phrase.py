"""Positional postings / phrase match / proximity — semantics pinned
three ways: (1) Spark inverted-postings shape vs a direct per-doc
array-scan reference expression, (2) Spark vs the DuckDB twin SQL,
(3) hand-built micro-corpus with known phrase positions."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reiz_io_spark.operators import phrase

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _duck(con, sql):
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


# --- micro-corpus with hand-computed expectations --------------------------


@pytest.fixture(scope="module")
def micro(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c a b c"),      # "a b": starts 0,3
            Row(doc_id=2, text="a a b b"),          # "a b": start 1
            Row(doc_id=3, text="b a"),              # "a b": none
            Row(doc_id=4, text="a b"),              # "a b": start 0
            Row(doc_id=5, text="c! C, a-b"),        # punctuation splits: c c a b
        ]
    )


def test_phrase_micro_counts(micro):
    got = {r["doc_id"]: r["phrase_tf"] for r in phrase.phrase_match(micro, ["a", "b"]).collect()}
    assert got == {1: 2, 2: 1, 4: 1, 5: 1}


def test_phrase_micro_trigram(micro):
    got = {r["doc_id"]: r["phrase_tf"] for r in phrase.phrase_match(micro, ["a", "b", "c"]).collect()}
    assert got == {1: 2}


def test_phrase_repeated_term(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x x x y")])
    got = {r["doc_id"]: r["phrase_tf"] for r in phrase.phrase_match(df, ["x", "x"]).collect()}
    assert got == {1: 2}  # overlapping starts 0 and 1


def test_proximity_micro(micro):
    got = {r["doc_id"]: r["min_dist"] for r in phrase.proximity_match(micro, "a", "c", 2).collect()}
    # doc1: a@0,3 c@2,5 -> min 1; doc5: c@0,1 a@2 -> min 1
    assert got == {1: 1, 5: 1}
    none = phrase.proximity_match(micro, "a", "c", 0).collect()
    assert none == []


def test_positional_postings_roundtrip(micro):
    # positions reassemble the token stream exactly
    p = phrase.positional_postings(micro).filter(F.col("doc_id") == 1)
    toks = [r["term"] for r in p.orderBy("pos").collect()]
    assert toks == ["a", "b", "c", "a", "b", "c"]


# --- Spark inverted shape vs direct array-scan expression ------------------


def test_phrase_matches_array_scan(docs):
    ph = ["table", "hash"]
    inverted = _rows(phrase.phrase_match(docs, ph))
    toks = phrase.tokens(docs)
    n = len(ph)
    conds = None
    for i, t in enumerate(ph):
        c = F.col("toks")[F.col("i") + i] == t
        conds = c if conds is None else (conds & c)
    direct = (
        toks.select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(0), F.size("toks") - n)).alias("i"),
        )
        .filter(F.size("toks") >= n)
        .filter(conds)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("phrase_tf"))
    )
    assert inverted == _rows(direct)
    assert len(inverted) > 0  # non-vacuous at sf0.001


# --- Spark vs DuckDB twins --------------------------------------------------


def test_phrase_match_oracle(docs, duck):
    ph = ["table", "hash"]
    assert _rows(phrase.phrase_match(docs, ph)) == _duck(
        duck, phrase.phrase_match_sql(ph)
    )


def test_phrase_topk_oracle(docs, duck):
    ph = ["table", "hash"]
    assert _rows(phrase.phrase_topk(docs, ph, k=10)) == _duck(
        duck, phrase.phrase_topk_sql(ph, k=10)
    )


def test_proximity_oracle(docs, duck):
    got = _rows(phrase.proximity_match(docs, "spark", "stream", 3))
    assert got == _duck(duck, phrase.proximity_match_sql("spark", "stream", 3))
    assert len(got) > 0


# --- snippets (result rendering) -------------------------------------------


def test_snippets_clipping(spark):
    from reiz_io_spark.operators import fulltext

    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c TARGET d e f g"),   # middle hit
        Row(doc_id=2, text="TARGET x y z"),           # hit at start (clip left)
        Row(doc_id=3, text="p q r s TARGET"),         # hit at end (clip right)
        Row(doc_id=4, text="no match here"),          # filtered out
    ])
    got = {r["doc_id"]: (r["first_pos"], r["snippet"])
           for r in fulltext.snippets(df, ["target"], window=2).collect()}
    assert got == {
        1: (4, "b c target d e"),
        2: (1, "target x y z"),
        3: (5, "r s target"),
    }


def test_snippets_first_of_any_term(spark):
    from reiz_io_spark.operators import fulltext

    df = spark.createDataFrame([Row(doc_id=1, text="zz bbb zz aaa zz")])
    got = fulltext.snippets(df, ["aaa", "bbb"], window=1).collect()[0]
    assert got["first_pos"] == 2          # bbb comes first
    assert got["snippet"] == "zz bbb zz"


def test_snippets_oracle(docs, duck):
    from reiz_io_spark.operators import fulltext

    terms = ["spark", "vector"]
    assert _rows(fulltext.snippets(docs, terms)) == _duck(
        duck, fulltext.snippets_sql(terms)
    )


# --- randomized property check vs a pure-Python reference ------------------


def _py_tokens(text):
    import re as _re

    return [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]


def _py_phrase_tf(toks, ph):
    n = len(ph)
    return sum(
        1 for i in range(len(toks) - n + 1) if toks[i:i + n] == ph
    )


def _py_min_dist(toks, a, b):
    pa = [i for i, t in enumerate(toks) if t == a]
    pb = [i for i, t in enumerate(toks) if t == b]
    if not pa or not pb:
        return None
    return min(abs(x - y) for x in pa for y in pb)


def test_phrase_random_corpus_property(spark):
    """200 seeded random docs over a tiny vocabulary (dense phrase
    collisions), 8 random phrases + 5 proximity pairs — engine output
    equals the obvious per-doc Python computation."""
    import random

    rng = random.Random(1234)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [
        Row(doc_id=i, text=" ".join(rng.choice(vocab)
                                    for _ in range(rng.randint(0, 30))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows).cache()
    texts = {r.doc_id: _py_tokens(r.text) for r in rows}

    for _ in range(8):
        ph = [rng.choice(vocab) for _ in range(rng.randint(2, 4))]
        want = {
            d: tf
            for d, toks in texts.items()
            if (tf := _py_phrase_tf(toks, ph)) > 0
        }
        got = {r["doc_id"]: r["phrase_tf"]
               for r in phrase.phrase_match(docs, ph).collect()}
        assert got == want, ph

    for _ in range(5):
        a, b = rng.sample(vocab, 2)
        slop = rng.randint(0, 4)
        want = {
            d: md
            for d, toks in texts.items()
            if (md := _py_min_dist(toks, a, b)) is not None and md <= slop
        }
        got = {r["doc_id"]: r["min_dist"]
               for r in phrase.proximity_match(docs, a, b, slop).collect()}
        assert got == want, (a, b, slop)
