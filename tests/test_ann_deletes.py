"""ANN vector deletion: tombstones + compaction over the persistent
IVF-PQ index (operators/ann_index.py delete tier).

Gates: a deleted vector vanishes from every search immediately while
survivors' exact scores are unchanged; undelete restores pending
tombstones bit-identically; compact_ann_deletes makes the index
content-identical to one built without the deleted vectors, clears
the ledger, and re-appending a previously-deleted id works; the
append lock serializes writers; re-deletes are idempotent (no version
churn)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators import ann_index

SF_DIR = "/root/testdata/sf0.001"
QIDS = [0, 1, 2]
SEARCH = dict(k=10, n_probe=8, refine_factor=8)  # probe-all: exact candidates


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


@pytest.fixture(scope="module")
def del_ix(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ann_del"))
    ann_index.build_ann_index(emb, d, m=4, n_codes=16, n_lists=8, seed=7)
    base = sorted(
        tuple(r) for r in ann_index.ann_index_search(
            spark, d, emb, QIDS, **SEARCH
        ).collect()
    )
    # victims: two vectors that actually appear in the baseline top-k
    victims = sorted({r[1] for r in base})[:2]
    return {"dir": d, "base": base, "victims": victims}


def test_delete_excludes_immediately_scores_unchanged(spark, emb, del_ix):
    d, victims = del_ix["dir"], del_ix["victims"]
    meta = ann_index.delete_vectors(d, victims)
    assert int(meta["n_deleted_pending"]) == len(victims)
    got = sorted(
        tuple(r) for r in ann_index.ann_index_search(
            spark, d, emb, QIDS, **SEARCH
        ).collect()
    )
    got_ids = {r[1] for r in got}
    assert not (got_ids & set(victims))
    # survivors kept their exact scores (rows present in both runs)
    base_by = {(r[0], r[1]): r[2] for r in del_ix["base"]}
    for qid, vid, score in got:
        if (qid, vid) in base_by:
            assert score == base_by[(qid, vid)]
    # idempotent re-delete: no version churn
    v = int(meta["version"])
    assert int(ann_index.delete_vectors(d, victims)["version"]) == v


def test_undelete_restores_bit_identical(spark, emb, del_ix):
    d = del_ix["dir"]
    ann_index.undelete_vectors(d, del_ix["victims"])
    got = sorted(
        tuple(r) for r in ann_index.ann_index_search(
            spark, d, emb, QIDS, **SEARCH
        ).collect()
    )
    assert got == del_ix["base"]
    # back to deleted state for the compaction test below
    ann_index.delete_vectors(d, del_ix["victims"])


def test_compact_folds_and_allows_readd(spark, emb, del_ix, tmp_path_factory):
    d, victims = del_ix["dir"], del_ix["victims"]
    meta = ann_index.compact_ann_deletes(spark, d)
    assert meta.get("n_deleted_pending", 0) == 0
    assert "ann_tombstones" not in meta
    assert int(meta["n_vectors"]) == emb.count() - len(victims)
    # content-identical to an index built WITHOUT the victims (same
    # quantizer seed; probe-all search compared row for row)
    fresh = str(tmp_path_factory.mktemp("ann_fresh"))
    ann_index.build_ann_index(
        emb.filter(~F.col("vec_id").isin([int(v) for v in victims])),
        fresh, m=4, n_codes=16, n_lists=8, seed=7,
    )
    got = sorted(
        tuple(r) for r in ann_index.ann_index_search(
            spark, d, emb, QIDS, **SEARCH
        ).collect()
    )
    want = sorted(
        tuple(r) for r in ann_index.ann_index_search(
            spark, fresh, emb, QIDS, **SEARCH
        ).collect()
    )
    assert got == want
    # the ledger is cleared -> a previously-deleted id may be re-added
    ann_index.append_to_ann_index(
        emb.filter(F.col("vec_id") == int(victims[0])), d
    )
    back = sorted(
        tuple(r) for r in ann_index.ann_index_search(
            spark, d, emb, QIDS, **SEARCH
        ).collect()
    )
    back_ids = {r[1] for r in back}
    assert int(victims[0]) in back_ids


def test_delete_lock_serializes(spark, del_ix):
    d = del_ix["dir"]
    lock = os.path.join(d, "append.lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    try:
        with pytest.raises(ann_index.ConcurrentAppendError):
            ann_index.delete_vectors(d, [999])
        with pytest.raises(ann_index.ConcurrentAppendError):
            ann_index.compact_ann_deletes(spark, d)
    finally:
        os.remove(lock)


def test_pending_cap_refuses(spark, del_ix, monkeypatch):
    monkeypatch.setattr(ann_index, "ANN_MAX_PENDING", 1)
    ann_index.delete_vectors(del_ix["dir"], [111, 222])
    with pytest.raises(RuntimeError, match="compact_ann_deletes"):
        ann_index.pending_vector_ids(del_ix["dir"])
    monkeypatch.undo()
    ann_index.undelete_vectors(del_ix["dir"], [111, 222])


def test_append_refuses_pending_deleted_id(spark, emb, tmp_path_factory):
    """Re-appending a PENDING-deleted vec_id would be silently masked —
    the append refuses with guidance (compact first, or undelete)."""
    d = str(tmp_path_factory.mktemp("ann_guard"))
    ann_index.build_ann_index(
        emb.filter(F.col("vec_id") < 400), d, m=4, n_codes=16, n_lists=8,
        seed=7,
    )
    ann_index.delete_vectors(d, [5])
    with pytest.raises(RuntimeError, match="PENDING"):
        ann_index.append_to_ann_index(emb.filter(F.col("vec_id") == 5), d)
    # fresh ids still append fine under the same ledger
    meta = ann_index.append_to_ann_index(
        emb.filter(F.col("vec_id") == 450), d
    )
    assert int(meta["n_vectors"]) == 401


def test_fsck_ann_green_and_detects_tamper(spark, emb, tmp_path_factory):
    import json as _json
    import os as _os
    import shutil

    from reiz_io_spark.operators.fsck import fsck_ann_index

    d = str(tmp_path_factory.mktemp("ann_fsck"))
    ann_index.build_ann_index(emb, d, m=4, n_codes=16, n_lists=8, seed=7)
    ann_index.delete_vectors(d, [1, 2])
    report = fsck_ann_index(spark, d, deep=True)
    bad = {k: v for k, v in report.items() if not v["ok"]}
    assert not bad, bad
    # tamper: meta claims one more vector than the segments hold
    bad_dir = str(tmp_path_factory.mktemp("ann_fsck_bad")) + "/ix"
    shutil.copytree(d, bad_dir)
    mp = _os.path.join(bad_dir, "meta.json")
    with open(mp) as fh:
        meta = _json.load(fh)
    meta["n_vectors"] = int(meta["n_vectors"]) + 1
    with open(mp, "w") as fh:
        _json.dump(meta, fh)
    report = fsck_ann_index(spark, bad_dir)
    assert not report["n_vectors_matches_segments"]["ok"]
