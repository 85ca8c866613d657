"""Snapshot export/clone (operators/snapshot.py): the clone answers
bit-identically to the exported snapshot, is independent of later
source mutations, carries the delete ledger and trigram sidecar, and
time-travels with at_version."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators import regexsearch as rx
from reiz_io_spark.operators.build import build_index, merge_incremental
from reiz_io_spark.operators.deletes import delete_docs
from reiz_io_spark.operators.score import IndexReader
from reiz_io_spark.operators.snapshot import (
    ExportRacesWriter,
    export_snapshot,
)
from reiz_io_spark.operators.wand import wand_topk
from reiz_io_spark.plans.lower import lower_query
from reiz_io_spark.sources.corpus import synth_corpus

Q = lower_query("flagship", "Call(Name('len'))")
GREP_PAT = r"def [a-z_]+\("


def _rows(spark, d, q=Q, k=25):
    return [
        (r["doc_id"], r["score"])
        for r in wand_topk(IndexReader(spark, d), q, k=k).collect()
    ]


@pytest.fixture(scope="module")
def src_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("snap") / "src")
    corpus = synth_corpus(spark, n_filler=40, seed=11)
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    rx.build_trigram_index(spark, out)
    return out


def test_clone_is_bit_identical_and_independent(spark, src_index, tmp_path):
    dest = str(tmp_path / "clone")
    meta = export_snapshot(spark, src_index, dest)
    assert meta["version"] == json.load(
        open(os.path.join(dest, "meta.json"))
    )["version"]
    want = _rows(spark, src_index)
    assert _rows(spark, dest) == want and want
    # sidecar carried: grep answers equal, no rebuild
    g_src = sorted(
        map(tuple, rx.grep_index(spark, src_index, GREP_PAT).collect())
    )
    g_dst = sorted(map(tuple, rx.grep_index(spark, dest, GREP_PAT).collect()))
    assert g_dst == g_src
    # mutate the SOURCE: the clone must not move. Victim = the top-1
    # doc's repo, so the source ranking observably changes (pending
    # deletes keep survivors' scores bit-identical by design).
    r0 = IndexReader(spark, src_index)
    top_doc = want[0][0]
    victim = r0.docs().filter(F.col("doc_id") == top_doc).first()["repo"]
    delete_docs(spark, src_index, F.col("repo") == victim)
    assert _rows(spark, dest) == want  # clone unchanged
    assert _rows(spark, src_index) != want  # source moved


def test_clone_carries_pending_deletes(spark, src_index, tmp_path):
    staged = str(tmp_path / "staged")
    shutil.copytree(src_index, staged)
    victim = IndexReader(spark, staged).docs().select("repo").first()["repo"]
    delete_docs(spark, staged, F.col("repo") == victim)
    want = _rows(spark, staged)
    dest = str(tmp_path / "clone_del")
    export_snapshot(spark, staged, dest)
    assert _rows(spark, dest) == want
    assert victim not in {
        r["repo"]
        for r in IndexReader(spark, dest).docs().join(
            wand_topk(IndexReader(spark, dest), Q, k=100)
            .select("doc_id"), "doc_id",
        ).collect()
    }


def test_export_refuses_held_writer_lock(spark, src_index, tmp_path):
    lock = os.path.join(src_index, "deletes.lock")
    open(lock, "w").close()
    try:
        with pytest.raises(ExportRacesWriter):
            export_snapshot(spark, src_index, str(tmp_path / "never"))
    finally:
        os.remove(lock)


def test_export_refuses_nonempty_dest(spark, src_index, tmp_path):
    dest = str(tmp_path / "occupied")
    export_snapshot(spark, src_index, dest)
    with pytest.raises(RuntimeError, match="already holds"):
        export_snapshot(spark, src_index, dest)


def test_export_at_version_time_travel(spark, tmp_path):
    out = str(tmp_path / "tt_src")
    build_index(spark, synth_corpus(spark, n_filler=20, seed=3), out,
                build_id="b0", n_shards=2, fragment_postings=64)
    v1_rows = _rows(spark, out)
    v1 = json.load(open(os.path.join(out, "meta.json")))["version"]
    # second commit: ingest more docs and merge
    build_index(spark, synth_corpus(spark, n_filler=35, seed=3), out,
                build_id="b1", n_shards=2, fragment_postings=64)
    assert _rows(spark, out) != v1_rows
    dest = str(tmp_path / "tt_clone")
    meta = export_snapshot(spark, out, dest, at_version=v1)
    assert meta["version"] == v1
    assert _rows(spark, dest) == v1_rows
