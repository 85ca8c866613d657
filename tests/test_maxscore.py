"""MaxScore / block-max admission: the disjunctive (single wide
OR-group) path must skip block decodes while staying rank-identical to
the naive exhaustive scorer (VERDICT r01 item 3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from reiz_io_spark.functions.hashing import spark_xxhash64
from reiz_io_spark.operators.score import IndexReader, naive_bm25_topk
from reiz_io_spark.operators.wand import (
    _adaptive_shift,
    score_bucket_kernel,
    wand_topk,
)
from reiz_io_spark.plans.lower import Group, LoweredQuery

HOT_OR_TERMS = (
    "id:self", "id:data", "id:value", "id:result",
    "id:name", "id:obj", "id:items", "id:key",
)


def _disj_query() -> LoweredQuery:
    q = LoweredQuery(name="hot_or", source="<synthetic OR>")
    q.groups = [Group(HOT_OR_TERMS)]
    return q


@pytest.fixture(scope="module")
def reader(spark, built_index):
    return IndexReader(spark, built_index[0])


@pytest.fixture(scope="module")
def fine_reader(spark, small_corpus, tmp_path_factory):
    """Index with tiny blocks (block_size=8) so per-term posting lists
    split into many narrow doc-range blocks — the shape where block
    skipping is observable at test scale."""
    from reiz_io_spark.operators.build import build_index

    out = str(tmp_path_factory.mktemp("fine_index"))
    build_index(
        spark, small_corpus, out, build_id="fine", n_shards=4,
        block_size=8, fragment_postings=64,
    )
    return IndexReader(spark, out)


def test_disjunctive_rank_identity(spark, reader):
    """Full Spark path: MaxScore result == naive exhaustive result,
    docIDs and scores, rank for rank."""
    q = _disj_query()
    for k in (1, 3, 10):
        wand = [(r["doc_id"], r["score"]) for r in wand_topk(reader, q, k=k).collect()]
        naive = [
            (r["doc_id"], r["score"]) for r in naive_bm25_topk(reader, q, k=k).collect()
        ]
        assert wand == naive, f"k={k}"


def _bucket_frames(spark, reader, terms, shift):
    tid_of = {t: spark_xxhash64(t) for t in terms}
    blk = (
        reader.blocks()
        .filter(F.col("term_bucket").isin(reader.term_buckets(list(terms))))
        .filter(F.col("term_id").isin(list(tid_of.values())))
        .withColumn(
            "qb",
            F.explode(
                F.sequence(
                    F.shiftright("first_doc_id", shift),
                    F.shiftright("last_doc_id", shift),
                )
            ),
        )
    )
    pdf = blk.toPandas()
    return tid_of, {qb: g.reset_index(drop=True) for qb, g in pdf.groupby("qb")}


def test_kernel_skips_blocks_and_matches_naive(spark, fine_reader):
    """Kernel-level: run score_bucket_kernel per bucket with stats and
    assert (a) the admission gate fired, (b) whole blocks were skipped,
    (c) the merged result equals the naive path exactly."""
    reader = fine_reader
    q = _disj_query()
    k = 1
    meta = reader.meta
    tmeta = reader.term_meta(list(HOT_OR_TERMS))
    idf = {t: float(m["idf"]) for t, m in tmeta.items()}
    dfb = {t: int(m["df"]) for t, m in tmeta.items()}
    shift = _adaptive_shift(int(meta["n_docs"]))
    tid_of, frames = _bucket_frames(spark, reader, HOT_OR_TERMS, shift)

    stats = {"blocks_skipped": 0, "blocks_decoded": 0}
    parts = []
    for qb, pdf in frames.items():
        parts.append(
            score_bucket_kernel(
                pdf, [tuple(HOT_OR_TERMS)], tid_of, idf, dfb,
                shift, k, float(meta["avgdl"]), float(meta["k1"]),
                float(meta["b"]), stats=stats,
            )
        )
    merged = pd.concat(parts).sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(k)
    naive = [
        (r["doc_id"], r["score"]) for r in naive_bm25_topk(reader, q, k=k).collect()
    ]
    got = list(zip(merged["doc_id"].astype(np.int64), merged["score"]))
    assert got == naive
    assert "admit_stopped_at_term" in stats, stats
    assert stats["blocks_skipped"] > 0, stats
    assert stats["blocks_decoded"] > 0, stats


def test_conjunctive_block_skip_counted(spark, fine_reader):
    """The conjunctive path's candidate-presence skip is live too: a
    2-group query whose rare group confines candidates must skip at
    least one block of the hot term."""
    reader = fine_reader
    meta = reader.meta
    q = LoweredQuery(name="conj", source="<synthetic AND>")
    q.groups = [Group(("node:ClassDef",)), Group(("id:self",))]
    tmeta = reader.term_meta(["node:ClassDef", "id:self"])
    if len(tmeta) < 2:
        pytest.skip("terms missing at this corpus size")
    idf = {t: float(m["idf"]) for t, m in tmeta.items()}
    dfb = {t: int(m["df"]) for t, m in tmeta.items()}
    shift = _adaptive_shift(int(meta["n_docs"]))
    tid_of, frames = _bucket_frames(spark, reader, ["node:ClassDef", "id:self"], shift)
    stats = {"blocks_skipped": 0, "blocks_decoded": 0}
    parts = []
    for qb, pdf in frames.items():
        parts.append(
            score_bucket_kernel(
                pdf, [("node:ClassDef",), ("id:self",)], tid_of, idf, dfb,
                shift, 10, float(meta["avgdl"]), float(meta["k1"]),
                float(meta["b"]), stats=stats,
            )
        )
    merged = pd.concat(parts).sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(10)
    naive = [
        (r["doc_id"], r["score"])
        for r in naive_bm25_topk(reader, q, k=10).collect()
    ]
    got = list(zip(merged["doc_id"].astype(np.int64), merged["score"]))
    assert got == naive
    assert stats["blocks_decoded"] > 0


def test_batched_queries_rank_identical(spark, reader):
    """wand_topk_batch (27 queries, ONE job) must equal the per-query
    path rank for rank, including queries with empty results."""
    from reiz_io_spark.operators.wand import wand_topk, wand_topk_batch
    from reiz_io_spark.plans.queries import lowered_reference_queries

    queries = lowered_reference_queries()
    batched = wand_topk_batch(reader, queries, k=10).collect()
    by_q: dict[str, list] = {}
    for r in sorted(batched, key=lambda r: (r["query_name"], r["rank"])):
        by_q.setdefault(r["query_name"], []).append((r["doc_id"], r["score"]))
    for name, q in sorted(queries.items()):
        want = [
            (r["doc_id"], r["score"]) for r in wand_topk(reader, q, k=10).collect()
        ]
        assert by_q.get(name, []) == want, name
