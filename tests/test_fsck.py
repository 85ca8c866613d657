"""Index integrity checker (operators/fsck.py): green on healthy
indexes through the full mutation lifecycle; red on injected damage."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.build import build_index
from reiz_io_spark.operators.deletes import compact_deletes, delete_docs
from reiz_io_spark.operators.fsck import fsck_index
from reiz_io_spark.operators.updates import update_docs
from reiz_io_spark.sources.corpus import synth_corpus


def _all_ok(report):
    bad = {k: v for k, v in report.items() if not v["ok"]}
    assert not bad, bad


@pytest.fixture(scope="module")
def lifecycle_ix(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fsck_ix"))
    corpus = synth_corpus(spark, n_filler=20, seed=23).cache()
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    return {"dir": out, "corpus": corpus}


def test_fsck_green_through_lifecycle(spark, lifecycle_ix):
    out, corpus = lifecycle_ix["dir"], lifecycle_ix["corpus"]
    _all_ok(fsck_index(spark, out, deep=True))

    repos = sorted(r["repo"] for r in corpus.select("repo").distinct().collect())
    update_docs(
        spark, out,
        corpus.filter(F.col("repo") == repos[0]).withColumn(
            "content",
            F.concat(F.col("content"),
                     F.lit("\n\ndef fsck_probe(x):\n    return len(x)\n")),
        ),
    )
    _all_ok(fsck_index(spark, out, deep=True))  # pending tombstones state

    delete_docs(spark, out, F.col("repo") == repos[1])
    _all_ok(fsck_index(spark, out, deep=True))

    compact_deletes(spark, out)
    _all_ok(fsck_index(spark, out, deep=True))  # folded state


def test_fsck_detects_tampered_stats(spark, lifecycle_ix, tmp_path_factory):
    import shutil

    bad = str(tmp_path_factory.mktemp("fsck_bad")) + "/ix"
    shutil.copytree(lifecycle_ix["dir"], bad)
    mp = os.path.join(bad, "meta.json")
    with open(mp) as fh:
        meta = json.load(fh)
    meta["n_docs"] = int(meta["n_docs"]) + 1
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    report = fsck_index(spark, bad)
    assert not report["stats_match_lineage"]["ok"]


def test_fsck_detects_gcd_ledger(spark, lifecycle_ix, tmp_path_factory):
    import shutil

    bad = str(tmp_path_factory.mktemp("fsck_bad2")) + "/ix"
    shutil.copytree(lifecycle_ix["dir"], bad)
    with open(os.path.join(bad, "meta.json")) as fh:
        meta = json.load(fh)
    tdir = meta.get("tombstones_dir")
    assert tdir, "lifecycle fixture should have a ledger"
    shutil.rmtree(os.path.join(bad, tdir))
    report = fsck_index(spark, bad)
    assert not report["ledger_resolves"]["ok"]


def test_fsck_detects_corrupt_docs_fingerprint(
    spark, lifecycle_ix, tmp_path_factory
):
    """Deep tier: flipping one doc's recorded content hash breaks the
    per-(batch, shard) xor fingerprint."""
    import shutil

    bad = str(tmp_path_factory.mktemp("fsck_bad3")) + "/ix"
    shutil.copytree(lifecycle_ix["dir"], bad)
    from reiz_io_spark.schema import DOCS_ON_DISK

    docs_dir = os.path.join(bad, "docs")
    docs = spark.read.schema(DOCS_ON_DISK).parquet(docs_dir)
    # rewrite ONE batch partition with a corrupted sha
    victim_batch = docs.select("batch").distinct().orderBy("batch").collect()[0]["batch"]
    part = docs.filter(F.col("batch") == victim_batch)
    corrupted = part.withColumn(
        "content_sha256",
        F.when(
            F.col("doc_id") == part.select("doc_id").orderBy("doc_id").limit(1)
            .collect()[0]["doc_id"],
            F.lit("deadbeef" * 8),
        ).otherwise(F.col("content_sha256")),
    )
    tmp_out = str(tmp_path_factory.mktemp("fsck_rewrite"))
    cols = [f.name for f in DOCS_ON_DISK.fields]
    corrupted.select(*cols).write.mode("overwrite").partitionBy(
        "batch", "shard"
    ).parquet(tmp_out)
    shutil.rmtree(docs_dir)
    shutil.move(tmp_out, docs_dir)
    report = fsck_index(spark, bad, deep=True)
    assert not report["lineage_fingerprints"]["ok"]


# --------------------------------------------------------------------------
# trigram-sidecar fsck (fsck_trigrams, VERDICT r06 #8)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tg_ix(spark, tmp_path_factory):
    from reiz_io_spark.operators.regexsearch import build_trigram_index

    out = str(tmp_path_factory.mktemp("fsck_tg"))
    corpus = synth_corpus(spark, n_filler=16, seed=31).cache()
    build_index(spark, corpus, out, build_id="b0", n_shards=2,
                fragment_postings=64)
    build_trigram_index(spark, out)
    return out


def test_fsck_trigrams_green_fresh_and_after_update(spark, tg_ix):
    from reiz_io_spark.operators.build import stage1_ingest, merge_incremental
    from reiz_io_spark.operators.fsck import fsck_trigrams
    from reiz_io_spark.operators.regexsearch import update_trigram_index

    _all_ok(fsck_trigrams(spark, tg_ix, deep=True))
    # fold a second generation, stays green (multi-generation df sums)
    extra = synth_corpus(spark, n_filler=5, seed=32).withColumn(
        "repo", F.concat(F.lit("tgx/"), F.col("repo"))
    )
    stage1_ingest(spark, extra, tg_ix, build_id="b1", n_shards=2)
    merge_incremental(spark, tg_ix)
    update_trigram_index(spark, tg_ix)
    rep = fsck_trigrams(spark, tg_ix, deep=True)
    _all_ok(rep)
    assert rep["tg_staleness"]["detail"] == "fresh"


def test_fsck_trigrams_reports_staleness_not_failure(spark, tg_ix):
    """A landed-but-unfolded content batch: grep refuses (unless
    allow_stale) so fsck REPORTS staleness without failing."""
    from reiz_io_spark.operators.build import stage1_ingest, merge_incremental
    from reiz_io_spark.operators.fsck import fsck_trigrams
    from reiz_io_spark.operators.regexsearch import update_trigram_index

    extra = synth_corpus(spark, n_filler=4, seed=33).withColumn(
        "repo", F.concat(F.lit("tgy/"), F.col("repo"))
    )
    stage1_ingest(spark, extra, tg_ix, build_id="b2", n_shards=2)
    merge_incremental(spark, tg_ix)
    rep = fsck_trigrams(spark, tg_ix, deep=False)
    _all_ok(rep)
    assert "STALE" in rep["tg_staleness"]["detail"]
    update_trigram_index(spark, tg_ix)  # restore freshness for siblings
    _all_ok(fsck_trigrams(spark, tg_ix, deep=True))


def test_fsck_trigrams_detects_tampered_dictionary(spark, tg_ix, tmp_path):
    """Corrupt one generation's dictionary df: deep fsck flags both the
    fragment-sum check and the content recount."""
    import shutil

    from reiz_io_spark.operators.fsck import fsck_trigrams
    from reiz_io_spark.operators.regexsearch import _gen_dictionary, _tg_paths

    p = _tg_paths(tg_ix)
    with open(p["meta"]) as fh:
        gen = json.load(fh)["generations"][0]
    gdir = _gen_dictionary(p["base"], gen)
    backup = str(tmp_path / "dict_backup")
    shutil.copytree(gdir, backup)
    try:
        d = spark.read.schema("tg long, df long").parquet(gdir)
        tampered = d.withColumn(
            "df",
            F.when(F.col("tg") == d.orderBy("tg").first()["tg"],
                   F.col("df") + 7).otherwise(F.col("df")),
        )
        rows = tampered.collect()
        shutil.rmtree(gdir)
        spark.createDataFrame(rows, "tg long, df long").coalesce(
            1
        ).write.mode("overwrite").parquet(gdir)
        rep = fsck_trigrams(spark, tg_ix, deep=True)
        assert not rep["tg_dictionary_matches_fragments"]["ok"]
        assert not rep["tg_df_matches_content_recount"]["ok"]
    finally:
        shutil.rmtree(gdir, ignore_errors=True)
        shutil.copytree(backup, gdir)
    _all_ok(fsck_trigrams(spark, tg_ix, deep=True))


def test_fsck_trigrams_detects_lost_generation(spark, tg_ix):
    """Rename a committed generation away: light fsck fails fast."""
    from reiz_io_spark.operators.fsck import fsck_trigrams
    from reiz_io_spark.operators.regexsearch import _tg_paths

    p = _tg_paths(tg_ix)
    with open(p["meta"]) as fh:
        gen = json.load(fh)["generations"][0]
    src = os.path.join(p["base"], gen)
    moved = src + ".away"
    os.rename(src, moved)
    try:
        rep = fsck_trigrams(spark, tg_ix, deep=False)
        assert not rep["tg_generations_resolve"]["ok"]
    finally:
        os.rename(moved, src)
    _all_ok(fsck_trigrams(spark, tg_ix, deep=False))
