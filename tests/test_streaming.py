"""Structured Streaming ingest: micro-batched corpus -> identical index.

The streaming front-end (streaming/ingest.py) reuses stage1_ingest per
micro-batch and the deterministic merge, so the streamed index must be
content-identical to a one-shot batch build over the same corpus."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.build import build_index
from reiz_io_spark.operators.score import IndexReader
from reiz_io_spark.operators.wand import wand_topk
from reiz_io_spark.plans.lower import lower_query
from reiz_io_spark.schema import CORPUS
from reiz_io_spark.sources.corpus import synth_corpus
from reiz_io_spark.streaming.ingest import finalize_index, stream_corpus_into_index
from tests.test_resume import _decoded_index


def test_streamed_index_equals_batch_index(spark, tmp_path):
    corpus = synth_corpus(spark, n_filler=80, seed=7)

    # batch reference build
    batch_dir = str(tmp_path / "batch")
    build_index(spark, corpus, batch_dir, build_id="ref", n_shards=4)

    # stream source: the same corpus landed as two parquet chunks
    stream_src = str(tmp_path / "landing")
    corpus.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 0).write.parquet(
        stream_src, mode="append"
    )
    corpus.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 1).write.parquet(
        stream_src, mode="append"
    )

    out_dir = str(tmp_path / "streamed")
    q = stream_corpus_into_index(
        spark,
        stream_src,
        out_dir,
        build_id="s",
        n_shards=4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)
    meta = finalize_index(spark, out_dir, build_id="s")

    got_postings, got_docs, got_dict = _decoded_index(spark, out_dir)
    want_postings, want_docs, want_dict = _decoded_index(spark, batch_dir)
    assert got_postings == want_postings
    assert got_dict == want_dict
    assert got_docs == want_docs
    assert meta["n_docs"] > 0

    # and the streamed index answers queries identically
    qy = lower_query("t", "Call(Name('len'))")
    a = [(r["doc_id"], r["score"]) for r in wand_topk(IndexReader(spark, out_dir), qy, 10).collect()]
    b = [(r["doc_id"], r["score"]) for r in wand_topk(IndexReader(spark, batch_dir), qy, 10).collect()]
    assert a == b
