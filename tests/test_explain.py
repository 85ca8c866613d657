"""score.explain_score: per-term BM25 contribution breakdown.

The contract: for any doc the query ranks, sum(contrib) over that
doc's explain rows reproduces its WAND/naive score bit-for-bit (same
arithmetic, ordered term-ascending fold); docs the query doesn't
touch produce no rows; pending-deleted docs produce no rows (every
read path must agree on tombstones).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.score import IndexReader, explain_score
from reiz_io_spark.operators.wand import wand_topk
from reiz_io_spark.plans.lower import lower_query

QUERIES = [
    ("flagship", "Call(Name('len'))"),
    ("classdef", "ClassDef(body=[FunctionDef()])"),
]


@pytest.fixture(scope="module")
def reader(spark, built_index):
    return IndexReader(spark, built_index[0])


@pytest.mark.parametrize("name,src", QUERIES)
def test_explain_sums_to_score(name, src, reader):
    q = lower_query(name, src)
    top = wand_topk(reader, q, k=5).collect()
    assert top
    ids = [int(r["doc_id"]) for r in top]
    rows = explain_score(reader, q, ids).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r["doc_id"]), []).append(r)
    for t in top:
        parts = sorted(by_doc[int(t["doc_id"])], key=lambda r: r["term"])
        # ordered term-ascending fold — the scoring paths' exact order
        acc = 0.0
        for p in parts:
            acc += p["contrib"]
        assert acc == pytest.approx(float(t["score"]), abs=1e-12)
        # every group of the conjunction is witnessed by some row
        terms = {p["term"] for p in parts}
        assert all(any(t in terms for t in g) for g in
                   (tuple(g.terms) if hasattr(g, "terms") else tuple(g)
                    for g in q.groups))
        for p in parts:
            assert p["tf"] >= 1 and p["df"] >= 1
            assert p["weight"] == 1.0
            assert math.isfinite(p["idf"]) and math.isfinite(p["contrib"])


def test_explain_untouched_doc_yields_no_rows(reader):
    q = lower_query("flagship", "Call(Name('len'))")
    rows = explain_score(reader, q, [123456789]).collect()
    assert rows == []


def test_explain_excludes_pending_deleted(spark, built_index, tmp_path):
    import shutil

    from reiz_io_spark.operators.deletes import delete_docs

    src, _ = built_index
    dst = str(tmp_path / "ix_del")
    shutil.copytree(src, dst)
    r0 = IndexReader(spark, dst)
    q = lower_query("flagship", "Call(Name('len'))")
    top = wand_topk(r0, q, k=1).collect()
    assert top
    victim = int(top[0]["doc_id"])
    repo = [
        r["repo"] for r in r0.docs().filter(f"doc_id = {victim}").collect()
    ][0]
    delete_docs(spark, dst, F.col("repo") == repo)
    r1 = IndexReader(spark, dst)
    assert explain_score(r1, q, [victim]).collect() == []
