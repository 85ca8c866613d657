"""Streaming CDC upserts (streaming/ingest.stream_upserts_into_index):
micro-batches of changed files applied as one update_docs commit each.

Gates: the streamed upsert result equals applying the same updates
through the batch API (and, after compaction, a fresh build over the
final corpus); full redelivery with a fresh checkpoint is a no-op
(exactly-once effect from at-least-once delivery without sink-side
batch_id memory); multi-version batches resolve deterministically by
order_col (latest wins) and refuse without one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.build import build_index
from reiz_io_spark.operators.deletes import compact_deletes
from reiz_io_spark.operators.score import IndexReader
from reiz_io_spark.operators.updates import update_docs
from reiz_io_spark.operators.wand import wand_topk
from reiz_io_spark.plans.lower import lower_query
from reiz_io_spark.sources.corpus import synth_corpus
from reiz_io_spark.streaming.ingest import stream_upserts_into_index

Q = lower_query("flagship", "Call(Name('len'))")
SUF1 = "\n\ndef upsert_probe_v2(seq):\n    return len(seq)\n"
SUF2 = "\n\ndef upsert_probe_v3(seq):\n    return len(list(seq))\n"


def _topk(spark, d, k=30):
    return [
        (r["doc_id"], r["score"])
        for r in wand_topk(IndexReader(spark, d), Q, k=k).collect()
    ]


def _mutate(corpus, repo, suffix):
    return corpus.filter(F.col("repo") == repo).withColumn(
        "content", F.concat(F.col("content"), F.lit(suffix))
    )


def test_streamed_upserts_equal_batch_updates(spark, tmp_path):
    corpus = synth_corpus(spark, n_filler=40, seed=13).cache()
    repos = sorted(
        r["repo"] for r in corpus.select("repo").distinct().collect()
    )
    rA, rB = repos[0], repos[1]

    streamed = str(tmp_path / "streamed")
    batch = str(tmp_path / "batch")
    build_index(spark, corpus, streamed, build_id="b0", n_shards=2,
                fragment_postings=64)
    build_index(spark, corpus, batch, build_id="b0", n_shards=2,
                fragment_postings=64)

    upd1 = _mutate(corpus, rA, SUF1)   # change repo A
    upd2 = _mutate(corpus, rB, SUF2)   # change repo B

    landing = str(tmp_path / "landing")
    upd1.write.parquet(landing, mode="append")
    upd2.write.parquet(landing, mode="append")

    q = stream_upserts_into_index(
        spark, landing, streamed,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)

    update_docs(spark, batch, upd1)
    update_docs(spark, batch, upd2)
    assert _topk(spark, streamed) == _topk(spark, batch)

    # after compaction both equal a fresh build over the final corpus
    compact_deletes(spark, streamed)
    compact_deletes(spark, batch)
    final_corpus = corpus.withColumn(
        "content",
        F.when(F.col("repo") == rA, F.concat(F.col("content"), F.lit(SUF1)))
        .when(F.col("repo") == rB, F.concat(F.col("content"), F.lit(SUF2)))
        .otherwise(F.col("content")),
    )
    fresh = str(tmp_path / "fresh")
    build_index(spark, final_corpus, fresh, build_id="b0", n_shards=2,
                fragment_postings=64)

    def _rpps(d):
        r = IndexReader(spark, d)
        from reiz_io_spark.operators.score import attach_doc_metadata

        rows = attach_doc_metadata(r, wand_topk(r, Q, k=10_000)).select(
            "repo", "path", F.round("score", 9).alias("score")
        ).collect()
        return sorted((x["repo"], x["path"], x["score"]) for x in rows)

    assert _rpps(streamed) == _rpps(batch) == _rpps(fresh)

    # full redelivery (fresh checkpoint, same landing dir): every row
    # re-classifies as unchanged -> the index version must not move
    v_before = int(IndexReader(spark, streamed).meta["version"])
    q2 = stream_upserts_into_index(
        spark, landing, streamed,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        available_now=True,
    )
    q2.awaitTermination(300)
    assert int(IndexReader(spark, streamed).meta["version"]) == v_before
    assert _topk(spark, streamed) == _topk(spark, batch)


def test_multi_version_batch_latest_wins(spark, tmp_path):
    corpus = synth_corpus(spark, n_filler=20, seed=5).cache()
    repo = sorted(
        r["repo"] for r in corpus.select("repo").distinct().collect()
    )[0]
    out = str(tmp_path / "ix")
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)

    # one micro-batch carrying BOTH versions (commit is the order col)
    v2 = _mutate(corpus, repo, SUF1).withColumn("commit", F.lit("c2"))
    v3 = _mutate(corpus, repo, SUF2).withColumn("commit", F.lit("c3"))
    landing = str(tmp_path / "landing")
    v2.unionByName(v3).coalesce(1).write.parquet(landing, mode="append")

    q = stream_upserts_into_index(
        spark, landing, out, order_col="commit",
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True, max_files_per_trigger=64,
    )
    q.awaitTermination(300)

    # latest (c3 = SUF2) won
    ref = str(tmp_path / "ref")
    build_index(spark, corpus, ref, build_id="b0", n_shards=2,
                fragment_postings=64)
    update_docs(spark, ref, _mutate(corpus, repo, SUF2))
    assert _topk(spark, out) == _topk(spark, ref)


def test_multi_version_batch_refuses_without_order(spark, tmp_path):
    corpus = synth_corpus(spark, n_filler=20, seed=5).cache()
    repo = sorted(
        r["repo"] for r in corpus.select("repo").distinct().collect()
    )[0]
    out = str(tmp_path / "ix")
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    both = _mutate(corpus, repo, SUF1).unionByName(
        _mutate(corpus, repo, SUF2)
    )
    with pytest.raises(ValueError, match="more than once"):
        update_docs(spark, out, both)
