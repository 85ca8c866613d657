"""Rank-identity golden tests: the 27 reference queries, engine vs oracle.

The analog of the reference's golden end-to-end harness
(tests/runner.py:204-226): exact set equality there becomes exact
(doc_id, score) sequence equality here — docIDs AND BM25 scores,
rank for rank (north rule)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.score import IndexReader, naive_bm25_topk
from reiz_io_spark.operators.wand import wand_topk
from reiz_io_spark.oracle import build_oracle_index, oracle_topk
from reiz_io_spark.plans.queries import lowered_reference_queries

K = 10


@pytest.fixture(scope="module")
def oracle_index(spark, small_corpus, built_index):
    out, _ = built_index
    # oracle gets (doc_id, content): doc ids from the docs table (hashing
    # is Spark's xxhash64; determinism is asserted separately), contents
    # from the source corpus — the oracle tokenizes independently.
    docs = spark.read.parquet(out + "/docs").select("doc_id", "repo", "path")
    src = small_corpus.filter(F.col("lang") == "python")
    rows = docs.join(src, ["repo", "path"]).select("doc_id", "content").collect()
    return build_oracle_index([(r["doc_id"], r["content"]) for r in rows])


@pytest.fixture(scope="module")
def reader(spark, built_index):
    return IndexReader(spark, built_index[0])


QUERIES = lowered_reference_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_naive_rank_identity(name, reader, oracle_index):
    golden = oracle_topk(oracle_index, QUERIES[name], k=K)
    got = [
        (r["doc_id"], r["score"])
        for r in naive_bm25_topk(reader, QUERIES[name], k=K).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in golden], f"{name}: docID order"
    for (gd, gs), (od, os_) in zip(got, golden):
        assert gs == pytest.approx(os_, rel=0, abs=1e-12), f"{name}: score {gd}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_wand_rank_identity(name, reader, oracle_index):
    golden = oracle_topk(oracle_index, QUERIES[name], k=K)
    got = [
        (r["doc_id"], r["score"])
        for r in wand_topk(reader, QUERIES[name], k=K).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in golden], f"{name}: docID order"
    for (gd, gs), (od, os_) in zip(got, golden):
        assert gs == pytest.approx(os_, rel=0, abs=1e-12), f"{name}: score {gd}"


def test_golden_files_are_retrieved(reader, oracle_index):
    """Every query's golden snippet must appear in its oracle results —
    the lowering is recall-complete on the paired file (the corpus-design
    analog of pairing queries with dataset files, runner.py:187-197)."""
    from reiz_io_spark.sources.corpus import GOLDEN_REPO

    docs = reader.docs().filter(F.col("repo") == GOLDEN_REPO).collect()
    by_path = {r["path"]: r["doc_id"] for r in docs}
    missing = []
    for name, q in QUERIES.items():
        path = "dataset/" + name + ".py"
        target = by_path[path]
        ranked = oracle_topk(oracle_index, q, k=10_000)
        if target not in [d for d, _ in ranked]:
            missing.append(name)
    assert not missing, f"queries missing their golden file: {missing}"
