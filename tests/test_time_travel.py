"""Snapshot time travel: every build/merge commit drops an immutable
meta_v{N}.json; IndexReader(at_version=N) reproduces that snapshot's
results exactly (dictionary, blocks, AND collection stats), reads
within the GC retention window work, expired snapshots fail loudly,
and build.snapshots() lists the commit log."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.build import (
    merge_and_encode,
    merge_incremental,
    snapshots,
    stage1_ingest,
)
from reiz_io_spark.operators.score import IndexReader
from reiz_io_spark.operators.wand import wand_topk
from reiz_io_spark.plans.lower import lower_query
from reiz_io_spark.sources.corpus import synth_corpus


def _topk(reader, pattern, k=10):
    q = lower_query("tt", pattern)
    return sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in wand_topk(reader, q, k=k).collect()
    )


@pytest.fixture(scope="module")
def versioned_index(spark, tmp_path_factory):
    """v1 = batch a alone; v2 = a+b via incremental merge. Returns
    (out_dir, v1_results, v2_results) for Call(Name('len'))."""
    out = str(tmp_path_factory.mktemp("tt") / "ix")
    corpus = synth_corpus(spark, n_filler=80, seed=23).cache()
    a = corpus.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 0)
    b = corpus.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 1)

    stage1_ingest(spark, a, out, build_id="b0", n_shards=4)
    merge_and_encode(spark, out, build_id="b0")
    r1 = IndexReader(spark, out)
    v1 = int(r1.meta["version"])
    res_v1 = _topk(r1, "Call(Name('len'))")

    stage1_ingest(spark, b, out, build_id="b1", n_shards=4)
    merge_incremental(spark, out)
    r2 = IndexReader(spark, out)
    res_v2 = _topk(r2, "Call(Name('len'))")
    return out, v1, res_v1, int(r2.meta["version"]), res_v2


def test_time_travel_reproduces_old_snapshot(spark, versioned_index):
    out, v1, res_v1, v2, res_v2 = versioned_index
    assert v2 == v1 + 1
    assert res_v1 != res_v2  # the merge actually changed results
    # fresh reader pinned to v1 — identical doc set AND scores (stats
    # n_docs/avgdl come from the snapshot meta, not the current one)
    old = IndexReader(spark, out, at_version=v1)
    assert _topk(old, "Call(Name('len'))") == res_v1
    assert int(old.meta["version"]) == v1
    # default reader still reads the head
    head = IndexReader(spark, out)
    assert _topk(head, "Call(Name('len'))") == res_v2


def test_snapshot_log(versioned_index):
    out, v1, _, v2, _ = versioned_index
    log = snapshots(out)
    assert [s["version"] for s in log] == [v1, v2]
    assert all(s["readable"] for s in log)  # retention = current + prev
    assert log[0]["merged_batches"] == ["b0"]
    assert log[1]["merged_batches"] == ["b0", "b1"]
    # n_docs grew with the second batch
    assert log[1]["n_docs"] > log[0]["n_docs"]


def test_missing_version_raises(spark, versioned_index):
    out, v1, *_ = versioned_index
    with pytest.raises(FileNotFoundError, match="no committed snapshot"):
        IndexReader(spark, out, at_version=99)


def test_expired_version_raises(spark, versioned_index, tmp_path):
    """A third commit expires v1's data dirs (retention keeps 2); the
    history file remains but reads fail with the expiry error."""
    out, v1, _, v2, res_v2 = versioned_index
    # distinct repo names -> distinct doc_ids (the cross-batch anti-join
    # would otherwise drop re-delivered paths and skip the merge)
    spark_df = (
        synth_corpus(spark, n_filler=10, seed=99).limit(20)
        .withColumn("repo", F.concat(F.lit("b2-"), F.col("repo")))
    )
    stage1_ingest(spark, spark_df, out, build_id="b2", n_shards=2)
    merge_incremental(spark, out)
    log = snapshots(out)
    assert [s["version"] for s in log] == [v1, v2, v2 + 1]
    assert [s["readable"] for s in log] == [False, True, True]
    with pytest.raises(FileNotFoundError, match="expired"):
        IndexReader(spark, out, at_version=v1)
    # v2 is the retained previous snapshot — still time-travelable
    assert _topk(IndexReader(spark, out, at_version=v2),
                 "Call(Name('len'))") == res_v2
