"""Persistent IVF-PQ index: build/search round trip, partition-pruned
probed scan, probe-all == in-memory flat PQ identity, recall gate."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators import ann_index, pq, similarity

SF_DIR = "/root/testdata/sf0.001"
QIDS = [0, 1, 2]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


@pytest.fixture(scope="module")
def index_dir(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_index"))
    meta = ann_index.build_ann_index(
        emb, d, m=4, n_codes=16, n_lists=8, seed=7
    )
    assert meta["n_vectors"] == emb.count()
    return d


def test_codes_partitioned_by_list(spark, index_dir):
    names = os.listdir(os.path.join(index_dir, "codes", "seg-00000"))
    parts = [n for n in names if n.startswith("list_id=")]
    assert len(parts) >= 2  # real partition dirs, one per populated list


def test_probed_scan_has_partition_filters(spark, index_dir):
    """The IVF seek must be FILE pruning: the probed-lists filter lands
    in PartitionFilters of the parquet scan, not a post-scan Filter."""
    plan = (
        ann_index.probed_codes_scan(spark, index_dir, [0, 1])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "list_id" in m.group(1), plan


def test_search_probe_all_equals_flat_pq(spark, emb, index_dir):
    """Probing every list prunes nothing, so the persisted-index search
    must return exactly the in-memory flat-PQ result — build/save/load
    changes WHERE the codes live, never the answer."""
    got = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, index_dir, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())
    flat = sorted(tuple(r) for r in pq.pq_topk(
        emb, QIDS, k=10, m=4, n_codes=16, refine_factor=8
    ).collect())
    assert got == flat


def test_search_recall_and_exact_scores(spark, emb, index_dir):
    exact = similarity.brute_force_topk(emb, QIDS, k=10).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact
    }
    got = ann_index.ann_index_search(
        spark, index_dir, emb, QIDS, k=10, n_probe=6, refine_factor=16
    ).collect()
    pairs = {(r["query_id"], r["vec_id"]) for r in got}
    assert len(pairs & exact_pairs) / len(exact_pairs) >= 0.5
    for r in got:
        key = (r["query_id"], r["vec_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-9


def test_search_volume_is_partition_bounded(spark, emb, index_dir):
    """With n_probe=2 of 8 lists the probed scan reads a strict subset
    of the corpus rows."""
    n_total = emb.count()
    probed = ann_index.probed_codes_scan(spark, index_dir, [0, 1])
    assert 0 < probed.count() < n_total


def test_append_equals_rebuild_with_same_quantizers(spark, emb, tmp_path):
    """IVF `add` contract: building on half the corpus then appending
    the other half must search IDENTICALLY to encoding everything with
    the same frozen quantizers (training sample pinned to the first
    half in both paths)."""
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)

    d_inc = str(tmp_path / "inc")
    ann_index.build_ann_index(half_a, d_inc, m=4, n_codes=16, n_lists=8, seed=7)
    meta = ann_index.append_to_ann_index(half_b, d_inc)
    assert meta["n_vectors"] == emb.count()

    got = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d_inc, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())

    # reference: same frozen quantizers (trained on half_a), every
    # vector encoded in one pass
    d_ref = str(tmp_path / "ref")
    ann_index.build_ann_index(half_a, d_ref, m=4, n_codes=16, n_lists=8, seed=7)
    ann_index.append_to_ann_index(half_b, d_ref)
    assert got == sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d_ref, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())
    # appended vectors are actually retrievable: some odd vec_id in
    # the results
    assert any(r[1] % 2 == 1 for r in got)


def test_append_crash_before_commit_is_invisible(
    spark, emb, tmp_path, monkeypatch
):
    """Kill-during-append (mirrors the fulltext kill-during-merge
    test): an append that dies one instruction before the meta flip
    leaves readers on the previous snapshot — same meta, same search
    results, lock released, orphan segment unreferenced — and the
    replayed append lands exactly the clean incremental state."""
    import json

    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "crash")
    ann_index.build_ann_index(half_a, d, m=4, n_codes=16, n_lists=8, seed=7)
    with open(os.path.join(d, "meta.json")) as fh:
        meta_before = json.load(fh)
    search_before = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())

    def boom(index_dir, meta):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(ann_index, "_write_meta_atomic", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ann_index.append_to_ann_index(half_b, d)
    monkeypatch.undo()

    # reader view is byte-identical to the pre-append snapshot
    with open(os.path.join(d, "meta.json")) as fh:
        assert json.load(fh) == meta_before
    assert not os.path.exists(os.path.join(d, "append.lock"))
    search_now = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())
    assert search_now == search_before
    # the orphan segment exists on disk but is unreferenced
    segs_on_disk = sorted(os.listdir(os.path.join(d, "codes")))
    assert len(segs_on_disk) == 2  # seg-00000 + the orphan
    assert meta_before["segments"] == ["seg-00000"]

    # replay completes and matches a clean build+append, row for row
    meta = ann_index.append_to_ann_index(half_b, d)
    assert meta["n_vectors"] == emb.count()
    d_ref = str(tmp_path / "ref")
    ann_index.build_ann_index(half_a, d_ref, m=4, n_codes=16, n_lists=8, seed=7)
    ann_index.append_to_ann_index(half_b, d_ref)
    got = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())
    want = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d_ref, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())
    assert got == want


def test_concurrent_append_guard(spark, emb, tmp_path):
    """A held append.lock makes a second appender fail fast with
    ConcurrentAppendError instead of interleaving meta updates."""
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "lock")
    ann_index.build_ann_index(half_a, d, m=4, n_codes=16, n_lists=8, seed=7)
    lock = os.path.join(d, "append.lock")
    with open(lock, "w"):
        pass
    with pytest.raises(ann_index.ConcurrentAppendError):
        ann_index.append_to_ann_index(half_b, d)
    os.remove(lock)
    meta = ann_index.append_to_ann_index(half_b, d)
    assert meta["n_vectors"] == emb.count()


def test_build_and_append_encode_exactly_once(spark, emb, tmp_path, monkeypatch):
    """The encode UDF pass executes ONCE per build/append — as the
    write. n_vectors must come from the written files' footers, never a
    second evaluation of the encode plan (the r04 double-encode). A
    per-row accumulator inside a counting wrapper around pq_encode
    proves it: after build, acc == rows(build input); after append,
    acc == rows(build) + rows(append)."""
    acc = spark.sparkContext.accumulator(0)
    real = ann_index.pq_encode

    def counting(embeddings, codebooks):
        df = real(embeddings, codebooks)

        def tick(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return df.mapInPandas(tick, df.schema)

    monkeypatch.setattr(ann_index, "pq_encode", counting)
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    n_a, n_b = half_a.count(), half_b.count()
    d = str(tmp_path / "once")
    meta = ann_index.build_ann_index(half_a, d, m=4, n_codes=16, n_lists=8, seed=7)
    assert meta["n_vectors"] == n_a
    assert acc.value == n_a, f"build encoded {acc.value} rows for {n_a} inputs"
    meta = ann_index.append_to_ann_index(half_b, d)
    assert meta["n_vectors"] == n_a + n_b
    assert acc.value == n_a + n_b, (
        f"append encoded {acc.value - n_a} rows for {n_b} inputs"
    )


def test_compaction_folds_segments_search_identical(spark, emb, tmp_path):
    """Compaction is pure code movement: after N appends, folding all
    segments into one changes file layout only — search results are
    row-identical, superseded segments survive one grace cycle, and
    the next compaction GCs them."""
    thirds = [emb.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    d = str(tmp_path / "cmp")
    ann_index.build_ann_index(thirds[0], d, m=4, n_codes=16, n_lists=8, seed=7)
    ann_index.append_to_ann_index(thirds[1], d)
    ann_index.append_to_ann_index(thirds[2], d)
    import json

    with open(os.path.join(d, "meta.json")) as fh:
        assert len(json.load(fh)["segments"]) == 3
    before = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())

    meta = ann_index.compact_ann_index(spark, d)
    assert len(meta["segments"]) == 1
    assert meta["n_vectors"] == emb.count()
    after = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())
    assert after == before
    # grace: superseded segment dirs still on disk, invisible to reads
    on_disk = [n for n in os.listdir(os.path.join(d, "codes"))
               if n.startswith("seg-")]
    assert len(on_disk) == 4  # 3 old + 1 merged
    # second compaction is a no-op fold but GCs the previous cycle
    ann_index.compact_ann_index(spark, d)
    on_disk = [n for n in os.listdir(os.path.join(d, "codes"))
               if n.startswith("seg-")]
    assert on_disk == meta["segments"]
    # post-compaction reads remain stable (lock released, meta sound)
    assert sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect()) == before


def test_compaction_crash_before_commit_is_invisible(
    spark, emb, tmp_path, monkeypatch
):
    """A compaction killed one instruction before the meta flip leaves
    readers on the multi-segment snapshot; the replay completes."""
    import json

    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "cc")
    ann_index.build_ann_index(half_a, d, m=4, n_codes=16, n_lists=8, seed=7)
    ann_index.append_to_ann_index(half_b, d)
    with open(os.path.join(d, "meta.json")) as fh:
        meta_before = json.load(fh)
    before = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())

    def boom(index_dir, meta):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(ann_index, "_write_meta_atomic", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ann_index.compact_ann_index(spark, d)
    monkeypatch.undo()
    with open(os.path.join(d, "meta.json")) as fh:
        assert json.load(fh) == meta_before
    assert not os.path.exists(os.path.join(d, "append.lock"))
    assert sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect()) == before
    # replay: the orphan merged segment is GC'd (unreferenced) and the
    # compaction lands
    meta = ann_index.compact_ann_index(spark, d)
    assert len(meta["segments"]) == 1
    assert sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect()) == before


def test_empty_append_is_a_noop(spark, emb, tmp_path):
    """An empty batch must not commit a schema-less segment (which
    would break every later scan) — meta, version and search results
    stay untouched."""
    import json

    d = str(tmp_path / "empty")
    ann_index.build_ann_index(emb, d, m=4, n_codes=16, n_lists=8, seed=7)
    with open(os.path.join(d, "meta.json")) as fh:
        meta_before = json.load(fh)
    before = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect())

    meta = ann_index.append_to_ann_index(emb.filter(F.lit(False)), d)
    assert meta == meta_before
    with open(os.path.join(d, "meta.json")) as fh:
        assert json.load(fh) == meta_before
    assert not os.path.exists(os.path.join(d, "append.lock"))
    assert sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, d, emb, QIDS, k=10, n_probe=8, refine_factor=8
    ).collect()) == before


def test_search_accepts_literal_query_vectors(spark, emb, index_dir):
    """The serving API shape: the caller supplies the query vectors
    (it just encoded them), and the search touches the embeddings
    table ONLY for the broadcast refine — identical results to the
    id-lookup path."""
    qv = {
        int(r["vec_id"]): list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(QIDS)).collect()
    }
    by_ids = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, index_dir, emb, QIDS, k=5, n_probe=4
    ).collect())
    by_vecs = sorted(tuple(r) for r in ann_index.ann_index_search(
        spark, index_dir, emb, QIDS, k=5, n_probe=4, query_vectors=qv
    ).collect())
    assert by_ids == by_vecs and len(by_ids) == 15


def test_search_plan_scans_embeddings_once(spark, emb, index_dir):
    """r5 scanned the embeddings table twice per search (LUT build +
    refine query side); the refine's query side is now a local
    relation, so the physical plan references the embeddings source
    exactly once — the broadcast-pinned candidate refine probe."""
    plan = (
        ann_index.ann_index_search(spark, index_dir, emb, QIDS, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("embeddings.parquet") == 1, plan[:3000]


def test_pq_literal_query_vectors_identity(spark, emb):
    qv = {
        int(r["vec_id"]): list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(QIDS)).collect()
    }
    assert sorted(tuple(r) for r in pq.pq_topk(
        emb, QIDS, k=5
    ).collect()) == sorted(tuple(r) for r in pq.pq_topk(
        emb, QIDS, k=5, query_vectors=qv
    ).collect())
    assert sorted(tuple(r) for r in pq.ivf_pq_topk(
        emb, QIDS, k=5
    ).collect()) == sorted(tuple(r) for r in pq.ivf_pq_topk(
        emb, QIDS, k=5, query_vectors=qv
    ).collect())


def test_build_refuses_committed_dir(spark, emb, tmp_path):
    """An in-place rebuild would overwrite seg-00000 and the quantizer
    sidecars while the live meta references them — build must refuse
    and point at fresh-dir retrain / append instead (ADVICE r5)."""
    d = str(tmp_path / "ann")
    ann_index.build_ann_index(emb, d, m=4, n_codes=16, n_lists=4, seed=7)
    with pytest.raises(ValueError, match="already holds a committed index"):
        ann_index.build_ann_index(emb, d, m=4, n_codes=16, n_lists=4, seed=7)


def test_build_empty_input_raises_cleanly(spark, tmp_path):
    """Empty input used to die inside schema inference on the zero-row
    segment write; it must fail fast with a message naming the append
    path for empty increments (ADVICE r5)."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        ann_index.build_ann_index(empty, str(tmp_path / "ann_e"))
    assert not os.path.exists(str(tmp_path / "ann_e" / "meta.json"))


def test_gc_age_threshold(spark, emb, tmp_path):
    """Explicit age-based GC: an unreferenced orphan older than the
    threshold is removed WITHOUT a compaction; a young orphan (an
    in-flight append's staging dir) survives."""
    import shutil as _sh
    import time

    d = str(tmp_path / "ann")
    ann_index.build_ann_index(emb, d, m=4, n_codes=16, n_lists=4, seed=7)
    codes = os.path.join(d, "codes")
    # fabricate two orphans: copies of the committed segment that no
    # meta references (exactly what a crashed append leaves behind)
    _sh.copytree(os.path.join(codes, "seg-00000"), os.path.join(codes, "seg-00007"))
    _sh.copytree(os.path.join(codes, "seg-00000"), os.path.join(codes, "seg-00008"))
    old = time.time() - 7200
    for root, dirs, files in os.walk(os.path.join(codes, "seg-00007"), topdown=False):
        for n in files + dirs:
            os.utime(os.path.join(root, n), (old, old))
    os.utime(os.path.join(codes, "seg-00007"), (old, old))

    deleted = ann_index.gc_ann_index(d, max_age_seconds=3600)
    assert deleted == ["seg-00007"]
    assert not os.path.exists(os.path.join(codes, "seg-00007"))
    assert os.path.exists(os.path.join(codes, "seg-00008"))  # young: kept
    # searches still work on the committed snapshot
    assert ann_index.ann_index_search(spark, d, emb, QIDS, k=3).count() == 9
