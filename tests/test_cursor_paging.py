"""Cursor (search_after) pagination: pages fetched by keyset cursor
tile the full ranking exactly — page N+1 == rows N*k+1..N*k+k — at
both the batch tier (score.bm25_topk_after) and the serving tier
(QueryService.query_after)."""

from __future__ import annotations

import pytest

from reiz_io_spark.operators.score import (
    IndexReader,
    bm25_topk_after,
    naive_bm25_topk,
)
from reiz_io_spark.plans.lower import lower_query

Q = lower_query("flagship", "Call(Name('len'))")


@pytest.fixture(scope="module")
def reader(spark, built_index):
    return IndexReader(spark, built_index[0])


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_cursor_pages_tile_the_full_ranking(reader):
    k = 7
    full = _rows(naive_bm25_topk(reader, Q, k=100))
    assert len(full) > 3 * k
    pages, cursor = [], None
    for _ in range(3):
        if cursor is None:
            page = full[:k]
        else:
            page = _rows(bm25_topk_after(reader, Q, cursor, k=k))
        assert page
        pages.extend(page)
        cursor = (page[-1][1], page[-1][0])
    assert pages == full[: 3 * k]


def test_cursor_past_the_end_is_empty(reader):
    full = _rows(naive_bm25_topk(reader, Q, k=1 << 20))
    last = full[-1]
    assert _rows(bm25_topk_after(reader, Q, (last[1], last[0]), k=5)) == []


def test_serving_query_after_equals_batch(spark, built_index):
    from reiz_io_spark.serve import QueryService

    svc = QueryService(IndexReader(spark, built_index[0]))
    k = 5
    page1 = svc.query_topk(Q, k=k)
    cursor = (page1[-1]["score"], page1[-1]["doc_id"])
    got = [(r["doc_id"], r["score"]) for r in svc.query_after(Q, cursor, k=k)]
    reader = IndexReader(spark, built_index[0])
    want = _rows(bm25_topk_after(reader, Q, cursor, k=k))
    assert got == want and got
    # and equals the offset window of the service's own full ranking
    assert got == [
        (r["doc_id"], r["score"]) for r in svc.query_topk(Q, k=2 * k)[k:]
    ]
