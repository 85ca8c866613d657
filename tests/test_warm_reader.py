"""Warm (cached) reader must be result-identical to a cold reader."""

from __future__ import annotations

from reiz_io_spark.operators.score import IndexReader
from reiz_io_spark.operators.wand import wand_topk
from reiz_io_spark.plans.lower import lower_query


def test_warm_equals_cold(spark, built_index):
    q = lower_query("t", "Call(Name('len'))")
    cold = [
        (r["doc_id"], r["score"])
        for r in wand_topk(IndexReader(spark, built_index[0]), q, k=10).collect()
    ]
    warm_reader = IndexReader(spark, built_index[0]).warm()
    warm = [
        (r["doc_id"], r["score"]) for r in wand_topk(warm_reader, q, k=10).collect()
    ]
    assert warm == cold
    for name in ("dictionary", "blocks"):
        warm_reader._cached[name].unpersist()
