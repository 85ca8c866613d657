"""Document update: delete-then-add with one commit (operators/updates.py).

Contract under test (the Lucene updateDocument semantics over the
versioned-snapshot index):
- an updated (repo, path)'s OLD version vanishes from queries and the
  NEW version appears, both at the SAME commit (one meta flip — the
  intermediate staged state is invisible);
- unchanged-content re-delivery is a no-op (idempotent, same contract
  as the ingest cache);
- a revert to a PENDING-tombstoned version restores the doc without
  re-encoding (ledger row dropped; postings were never touched), and
  after compaction the index is result-identical to the pre-update
  state;
- update + compact_deletes is result- and stats-identical to a
  from-scratch build over the updated corpus (compared on
  (repo, path, score): updated docs carry version-qualified doc_ids
  by design);
- updating a DELETED path refuses (resurrection needs an explicit
  undelete), and a revert matching a FOLDED version refuses (its
  postings are physically gone).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.build import build_index, merge_incremental
from reiz_io_spark.operators.deletes import compact_deletes, delete_docs
from reiz_io_spark.operators.score import IndexReader, attach_doc_metadata
from reiz_io_spark.operators.updates import update_docs
from reiz_io_spark.functions.hashing import spark_xxhash64
from reiz_io_spark.operators.wand import wand_topk
from reiz_io_spark.plans.lower import lower_query
from reiz_io_spark.sources.corpus import synth_corpus

Q = lower_query("flagship", "Call(Name('len'))")

# appended to each victim doc: valid Python that adds one more len()
# call site, so the flagship query sees the content change
UPDATED_SUFFIX = "\n\ndef updated_probe(seq):\n    return len(seq)\n"


def _topk(reader, k=10):
    return [(r["doc_id"], r["score"]) for r in wand_topk(reader, Q, k=k).collect()]


def _ranked_rpps(spark, index_dir, k=10_000):
    """Every matching doc as (repo, path, score) sorted content-first —
    doc_id-free, so indexes whose updated docs carry version-qualified
    ids compare equal to a from-scratch build."""
    reader = IndexReader(spark, index_dir)
    rows = attach_doc_metadata(reader, wand_topk(reader, Q, k=k)).select(
        "repo", "path", F.round("score", 9).alias("score")
    ).collect()
    return sorted((r["repo"], r["path"], r["score"]) for r in rows)


@pytest.fixture(scope="module")
def upd_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("upd_index"))
    corpus = synth_corpus(spark, n_filler=60, seed=42).cache()
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    reader = IndexReader(spark, out)
    pre = _topk(reader)
    victim = (
        reader.docs().filter(F.col("doc_id").isin([d for d, _ in pre]))
        .select("repo").distinct().orderBy("repo").collect()[0]["repo"]
    )
    victim_ids = {
        r["doc_id"]
        for r in reader.docs().filter(F.col("repo") == victim)
        .select("doc_id").collect()
    }
    return {
        "dir": out, "corpus": corpus, "victim": victim,
        "victim_ids": victim_ids, "pre": pre,
        "pre_version": int(reader.meta["version"]),
    }


def _update_batch(ix):
    return ix["corpus"].filter(F.col("repo") == ix["victim"]).withColumn(
        "content", F.concat(F.col("content"), F.lit(UPDATED_SUFFIX))
    )


@pytest.fixture(scope="module")
def updated(spark, upd_index):
    return update_docs(spark, upd_index["dir"], _update_batch(upd_index))


def test_update_swaps_versions_atomically(spark, upd_index, updated):
    r = IndexReader(spark, upd_index["dir"])
    post = _topk(r, k=50)
    post_ids = {d for d, _ in post}
    assert not (post_ids & upd_index["victim_ids"]), "old versions leaked"
    new_ids = {
        row["doc_id"]
        for row in r.docs().filter(
            (F.col("repo") == upd_index["victim"])
            & ~F.col("doc_id").isin(list(upd_index["victim_ids"]))
        ).select("doc_id").collect()
    }
    assert new_ids and (post_ids & new_ids), "new versions not ranked"
    # ONE commit: exactly one version bump for stage+tombstone+merge
    assert int(updated["version"]) == upd_index["pre_version"] + 1
    assert int(updated["n_tombstones_pending"]) == len(upd_index["victim_ids"])


def test_updated_content_is_served(spark, upd_index, updated):
    r = IndexReader(spark, upd_index["dir"])
    live_victims = r.docs().filter(
        (F.col("repo") == upd_index["victim"])
        & ~F.col("doc_id").isin(list(upd_index["victim_ids"]))
    ).select("doc_id")
    content = spark.read.parquet(f"{upd_index['dir']}/content").join(
        live_victims, "doc_id", "left_semi"
    )
    n = content.count()
    assert n == len(upd_index["victim_ids"])
    assert content.filter(
        F.col("content").endswith(UPDATED_SUFFIX)
    ).count() == n


def test_time_travel_pre_update_sees_old_version(spark, upd_index, updated):
    r = IndexReader(spark, upd_index["dir"],
                    at_version=upd_index["pre_version"])
    assert {d for d, _ in _topk(r)} == {d for d, _ in upd_index["pre"]}


def test_unchanged_redelivery_is_noop(spark, upd_index, updated):
    before = _topk(IndexReader(spark, upd_index["dir"]))
    meta = update_docs(spark, upd_index["dir"], _update_batch(upd_index))
    assert int(meta["version"]) == int(updated["version"])
    assert _topk(IndexReader(spark, upd_index["dir"])) == before


def test_update_then_compact_equals_fresh_build(
    spark, upd_index, updated, tmp_path_factory
):
    compact_deletes(spark, upd_index["dir"])
    fresh = str(tmp_path_factory.mktemp("fresh_updated"))
    updated_corpus = upd_index["corpus"].withColumn(
        "content",
        F.when(
            F.col("repo") == upd_index["victim"],
            F.concat(F.col("content"), F.lit(UPDATED_SUFFIX)),
        ).otherwise(F.col("content")),
    )
    build_index(spark, updated_corpus, fresh, build_id="b0", n_shards=2,
                fragment_postings=64)
    assert _ranked_rpps(spark, upd_index["dir"]) == _ranked_rpps(spark, fresh)
    m_upd = IndexReader(spark, upd_index["dir"]).meta
    m_fresh = IndexReader(spark, fresh).meta
    assert int(m_upd["n_docs"]) == int(m_fresh["n_docs"])
    assert float(m_upd["avgdl"]) == float(m_fresh["avgdl"])


def test_folded_revert_refuses(spark, upd_index, updated):
    # after the compaction above, the original versions are FOLDED —
    # reverting to their exact bytes must refuse with guidance
    with pytest.raises(RuntimeError, match="FOLDED"):
        update_docs(
            spark, upd_index["dir"],
            upd_index["corpus"].filter(F.col("repo") == upd_index["victim"]),
        )


def test_revert_restores_and_compact_roundtrips(spark, tmp_path_factory):
    """v1 -> update to v2 -> revert to v1 (pending untombstone, zero
    re-encode) -> compact: results bit-identical to the pre-update
    index."""
    out = str(tmp_path_factory.mktemp("revert_index"))
    corpus = synth_corpus(spark, n_filler=30, seed=7).cache()
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    pre = _topk(IndexReader(spark, out), k=50)
    victim = corpus.select("repo").distinct().orderBy("repo").collect()[0]["repo"]
    v2 = corpus.filter(F.col("repo") == victim).withColumn(
        "content", F.concat(F.col("content"), F.lit(UPDATED_SUFFIX))
    )
    update_docs(spark, out, v2)
    assert _topk(IndexReader(spark, out), k=50) != pre
    # revert: same bytes as v1 -> untombstone, no new ingest
    meta = update_docs(spark, out, corpus.filter(F.col("repo") == victim))
    r = IndexReader(spark, out)
    assert {d for d, _ in _topk(r, k=50)} == {d for d, _ in pre}
    # v2's postings still count toward stats until folded
    assert int(meta["n_tombstones_pending"]) > 0
    compact_deletes(spark, out)
    assert _topk(IndexReader(spark, out), k=50) == pre


def test_update_deleted_path_refuses(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("upd_deleted"))
    corpus = synth_corpus(spark, n_filler=20, seed=3).cache()
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    victim = corpus.select("repo").distinct().orderBy("repo").collect()[0]["repo"]
    delete_docs(spark, out, F.col("repo") == victim)
    with pytest.raises(RuntimeError, match="deleted"):
        update_docs(
            spark, out,
            corpus.filter(F.col("repo") == victim).withColumn(
                "content", F.concat(F.col("content"), F.lit(UPDATED_SUFFIX))
            ),
        )


def test_update_new_path_is_plain_add(spark, upd_index):
    new = spark.createDataFrame(
        [("synth/brandnew", "pkg/new_mod.py", "c0",
          "def fresh_fn(x):\n    return len(x)\n", "python")],
        "repo string, path string, commit string, content string, lang string",
    )
    before_pending = int(
        IndexReader(spark, upd_index["dir"]).meta.get(
            "n_tombstones_pending", 0
        )
    )
    meta = update_docs(spark, upd_index["dir"], new)
    assert int(meta.get("n_tombstones_pending", 0)) == before_pending
    r = IndexReader(spark, upd_index["dir"])
    assert r.docs().filter(F.col("repo") == "synth/brandnew").count() == 1


def test_staged_update_is_invisible_until_merge(spark, tmp_path_factory):
    """The one-commit property, observed from the middle: stage the
    batch + sidecar exactly as update_docs does but stop before the
    merge — every query still sees the OLD state; the merge then flips
    tombstones and new postings together."""
    import os

    from reiz_io_spark.operators.build import stage1_ingest

    out = str(tmp_path_factory.mktemp("staged_upd"))
    corpus = synth_corpus(spark, n_filler=20, seed=11).cache()
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    pre = _topk(IndexReader(spark, out), k=50)
    victim = corpus.select("repo").distinct().orderBy("repo").collect()[0]["repo"]
    old_ids = [
        r["doc_id"]
        for r in IndexReader(spark, out).docs()
        .filter(F.col("repo") == victim).select("doc_id").collect()
    ]
    batch = corpus.filter(F.col("repo") == victim).withColumn(
        "content", F.concat(F.col("content"), F.lit(UPDATED_SUFFIX))
    )
    prepared = batch.withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    ).withColumn(
        "doc_id", F.xxhash64("repo", "path", "content_sha256")
    ).select("repo", "path", "commit", "content", "lang", "doc_id")
    ix = IndexReader(spark, out)
    docs_tbl = ix.docs()
    sidecar = docs_tbl.filter(F.col("doc_id").isin(old_ids)).select(
        "doc_id", "doclen", "parse_ok", F.lit("tombstone").alias("action")
    )
    bdir = os.path.join(out, "update_ledger", "batch=update-crashsim")
    sidecar.coalesce(1).write.mode("overwrite").parquet(bdir)
    stage1_ingest(spark, prepared, out, build_id="update-crashsim", n_shards=2)
    # staged but uncommitted: WAND results and ledger are untouched
    assert _topk(IndexReader(spark, out), k=50) == pre
    assert IndexReader(spark, out).meta.get("n_tombstones_pending", 0) == 0
    merge_incremental(spark, out)
    r = IndexReader(spark, out)
    post_ids = {d for d, _ in _topk(r, k=50)}
    assert not (post_ids & set(old_ids))
    assert int(r.meta["n_tombstones_pending"]) == len(old_ids)
    assert not os.path.isdir(bdir), "applied sidecar not consumed"


def test_serving_tier_refresh_picks_up_update(spark, tmp_path_factory):
    """QueryService pins its snapshot; refresh_if_stale rebinds after
    an update commit; auto_refresh_s=0 does it transparently per query."""
    from reiz_io_spark.serve import QueryService

    out = str(tmp_path_factory.mktemp("serve_upd"))
    corpus = synth_corpus(spark, n_filler=20, seed=9).cache()
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    victim = corpus.select("repo").distinct().orderBy("repo").collect()[0]["repo"]

    pinned = QueryService(IndexReader(spark, out))
    auto = QueryService(IndexReader(spark, out), auto_refresh_s=0.0)
    before = [(r["doc_id"], r["score"]) for r in pinned.query_topk(Q, k=10)]
    assert [(r["doc_id"], r["score"]) for r in auto.query_topk(Q, k=10)] == before
    assert pinned.refresh_if_stale() is False  # no commit yet

    update_docs(
        spark, out,
        corpus.filter(F.col("repo") == victim).withColumn(
            "content", F.concat(F.col("content"), F.lit(UPDATED_SUFFIX))
        ),
    )
    want = _topk(IndexReader(spark, out))

    # pinned: still the old snapshot until an explicit refresh
    assert [(r["doc_id"], r["score"]) for r in pinned.query_topk(Q, k=10)] == before
    assert pinned.refresh_if_stale() is True
    assert [(r["doc_id"], r["score"]) for r in pinned.query_topk(Q, k=10)] == want
    assert pinned.refresh_if_stale() is False  # idempotent

    # auto: next query transparently serves the new snapshot
    assert [(r["doc_id"], r["score"]) for r in auto.query_topk(Q, k=10)] == want


def test_grep_sidecar_follows_update(spark, tmp_path_factory):
    """Update tier x regex tier: an update commit adds a content batch,
    so the trigram sidecar refuses as stale; update_trigram_index folds
    ONLY the new batch; grep then finds the new content and never
    returns the replaced version (ledger-filtered candidates)."""
    from reiz_io_spark.operators.regexsearch import (
        StaleTrigramIndex,
        build_trigram_index,
        grep_index,
        update_trigram_index,
    )

    out = str(tmp_path_factory.mktemp("upd_grep"))
    corpus = synth_corpus(spark, n_filler=20, seed=21).cache()
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    build_trigram_index(spark, out)
    probe = "zz_updated_grep_probe"
    assert grep_index(spark, out, probe).count() == 0

    victim = corpus.select("repo").distinct().orderBy("repo").collect()[0]["repo"]
    update_docs(
        spark, out,
        corpus.filter(F.col("repo") == victim).withColumn(
            "content",
            F.concat(
                F.col("content"),
                F.lit(f"\n\ndef {probe}(x):\n    return len(x)\n"),
            ),
        ),
    )
    with pytest.raises(StaleTrigramIndex):
        grep_index(spark, out, probe).collect()
    update_trigram_index(spark, out)
    hits = grep_index(spark, out, probe)
    n_victim = corpus.filter(F.col("repo") == victim).count()
    assert hits.count() == n_victim
    assert {r["repo"] for r in hits.select("repo").collect()} == {victim}
    # the replaced versions' doc_ids never surface
    old_ids = {
        spark_xxhash64(r["repo"], r["path"])
        for r in corpus.filter(F.col("repo") == victim)
        .select("repo", "path").collect()
    }
    assert not ({r["doc_id"] for r in hits.collect()} & old_ids)


def test_update_crash_at_commit_point_then_replay(spark, tmp_path_factory, monkeypatch):
    """Kill the update's ONE commit (the merge's meta flip): nothing is
    visible — ranked results, version, and ledger all unchanged — and a
    replayed update_docs resumes under the same deterministic batch id
    and completes to exactly the state a clean run produces."""
    import reiz_io_spark.operators.build as B

    out = str(tmp_path_factory.mktemp("upd_crash"))
    corpus = synth_corpus(spark, n_filler=20, seed=17).cache()
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    r0 = IndexReader(spark, out)
    pre = _topk(r0, k=30)
    pre_version = int(r0.meta["version"])
    victim = corpus.select("repo").distinct().orderBy("repo").collect()[0]["repo"]
    batch = corpus.filter(F.col("repo") == victim).withColumn(
        "content", F.concat(F.col("content"), F.lit(UPDATED_SUFFIX))
    )

    real = B._write_meta_atomic

    def boom(path, meta):
        raise RuntimeError("simulated crash at the commit point")

    monkeypatch.setattr(B, "_write_meta_atomic", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        update_docs(spark, out, batch)
    monkeypatch.setattr(B, "_write_meta_atomic", real)

    r1 = IndexReader(spark, out)
    assert int(r1.meta["version"]) == pre_version
    assert int(r1.meta.get("n_tombstones_pending", 0)) == 0
    assert _topk(r1, k=30) == pre, "crashed update leaked state"

    # replay completes (lineage resume + sidecar overwrite + merge)
    meta = update_docs(spark, out, batch)
    assert int(meta["version"]) == pre_version + 1
    r2 = IndexReader(spark, out)
    old_ids = {
        r["doc_id"]
        for r in r2.docs().filter(
            (F.col("repo") == victim) & F.col("doc_id").isin(
                [spark_xxhash64(victim, row["path"])
                 for row in corpus.filter(F.col("repo") == victim)
                 .select("path").collect()]
            )
        ).select("doc_id").collect()
    }
    post_ids = {d for d, _ in _topk(r2, k=30)}
    assert not (post_ids & old_ids)
    assert int(meta["n_tombstones_pending"]) == len(old_ids)
