"""`table:` corpus source — real spark.read.table() against the
session catalog, Iceberg snapshot pinning when the runtime jar is
present (documented skip otherwise: this sandbox has no
iceberg-spark-runtime and no network to fetch it)."""

from __future__ import annotations

import pytest

from reiz_io_spark.sources.corpus import parse_table_ref, read_corpus, synth_corpus


def test_parse_table_ref():
    assert parse_table_ref("db.corpus") == ("db.corpus", {})
    assert parse_table_ref("ice.db.t@snapshot=123456") == (
        "ice.db.t", {"snapshot-id": "123456"}
    )
    assert parse_table_ref("t@ts=1700000000000") == (
        "t", {"as-of-timestamp": "1700000000000"}
    )
    with pytest.raises(ValueError):
        parse_table_ref("@snapshot=1")
    with pytest.raises(ValueError):
        parse_table_ref("t@version=9")  # unknown pin kind


def test_table_read_via_session_catalog(spark):
    """table:<name> goes through spark.read.table() — exercised against
    a catalog-managed table (same API surface an Iceberg catalog
    serves), not a parquet-path fallback."""
    corpus = synth_corpus(spark, n_filler=5, seed=42)
    spark.sql("DROP TABLE IF EXISTS corpus_t")
    corpus.write.saveAsTable("corpus_t")
    try:
        got = read_corpus(spark, "table:corpus_t")
        assert got.count() == corpus.count()
        assert set(got.columns) == set(corpus.columns)
        # pin options are inert on a non-Iceberg table, not an error
        pinned = read_corpus(spark, "table:corpus_t@snapshot=42")
        assert pinned.count() == corpus.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_t")


def test_iceberg_snapshot_pinned_read(spark, tmp_path):
    """Snapshot-pinned time travel against a local Hadoop-catalog
    Iceberg table. SKIPPED in this sandbox: pyspark ships no
    iceberg-spark-runtime jar and the container has no network to
    fetch one — the adapter's option wiring (snapshot-id /
    as-of-timestamp) is still covered above and in parse tests."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        pytest.skip("iceberg-spark-runtime jar not available in sandbox")
    warehouse = str(tmp_path / "wh")
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", warehouse)
    corpus = synth_corpus(spark, n_filler=5, seed=42)
    corpus.write.saveAsTable("ice.db.corpus_t")
    n1 = corpus.count()
    snap = spark.sql(
        "SELECT snapshot_id FROM ice.db.corpus_t.snapshots ORDER BY committed_at DESC"
    ).first()["snapshot_id"]
    corpus.limit(3).write.mode("append").saveAsTable("ice.db.corpus_t")
    pinned = read_corpus(spark, f"table:ice.db.corpus_t@snapshot={snap}")
    assert pinned.count() == n1  # time travel: pre-append snapshot
    assert read_corpus(spark, "table:ice.db.corpus_t").count() == n1 + 3
