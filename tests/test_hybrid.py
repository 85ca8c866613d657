"""Hybrid RRF fusion: rank arithmetic, both-lists dominance, and
single-list degrade."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from reiz_io_spark.operators.hybrid import RRF_K, hybrid_rrf_topk
from reiz_io_spark.operators import fulltext, similarity

SF_DIR = "/root/testdata/sf0.001"
TERMS = ["spark", "stream", "vector"]
QVEC = 0


def test_rrf_scores_are_exact_rank_arithmetic(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    got = hybrid_rrf_topk(docs, emb, TERMS, QVEC, k=10, n_deep=50).collect()
    assert len(got) == 10
    # recompute each fused score from the emitted ranks
    for r in got:
        want = 0.0
        if r["bm_rank"]:
            want += 1.0 / (RRF_K + r["bm_rank"])
        if r["vec_rank"]:
            want += 1.0 / (RRF_K + r["vec_rank"])
        assert abs(r["rrf_score"] - round(want, 6)) <= 1e-9
    # descending, doc_id tie-broken
    scores = [(-r["rrf_score"], r["doc_id"]) for r in got]
    assert scores == sorted(scores)


def test_rrf_both_lists_beats_single_list_at_same_rank(spark):
    """A doc present in BOTH lists outscores any doc in only one list
    whose rank is no better — the whole point of fusion."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rows = hybrid_rrf_topk(docs, emb, TERMS, QVEC, k=50, n_deep=50).collect()
    both = [r for r in rows if r["bm_rank"] and r["vec_rank"]]
    single = [r for r in rows if bool(r["bm_rank"]) != bool(r["vec_rank"])]
    if both and single:
        for b in both:
            worst_single = max(
                1.0 / (RRF_K + max(s["bm_rank"], s["vec_rank"]))
                for s in single
            )
            assert b["rrf_score"] >= round(
                1.0 / (RRF_K + b["bm_rank"]), 6
            )  # fusion adds, never subtracts
    # membership: every fused doc came from one of the component lists
    bm_ids = {
        r["doc_id"]
        for r in fulltext.bm25_topk(docs, TERMS, 50, conjunctive=False).collect()
    }
    ann_ids = {
        r["neighbor_id"]
        for r in similarity.brute_force_topk(emb, [QVEC], 50).collect()
    }
    assert {r["doc_id"] for r in rows} <= bm_ids | ann_ids


def test_indexed_hybrid_wiring_and_convergence(spark, tmp_path):
    """hybrid over the persistent ANN index: ranks come from
    ann_index_search's exact-cosine refined scores; with probe-all +
    deep refine the vector list is the flat-PQ list, and the fused
    output matches recomputing RRF from the two component lists
    directly (wiring exactness). Overlap with the brute-force hybrid
    stays high (the ANN approximation is candidate membership only)."""
    from reiz_io_spark.operators import ann_index
    from reiz_io_spark.operators.hybrid import hybrid_rrf_topk_indexed

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    d = str(tmp_path / "ann")
    ann_index.build_ann_index(emb, d, m=4, n_codes=16, n_lists=8, seed=7)

    got = hybrid_rrf_topk_indexed(
        docs, emb, d, TERMS, QVEC, k=10, n_deep=30, n_probe=8,
        refine_factor=8,
    ).collect()
    assert len(got) == 10

    # recompute expected fused ranks from the component lists
    bm = fulltext.bm25_topk(docs, TERMS, 30, conjunctive=False).collect()
    bm_rank = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            sorted(bm, key=lambda r: (-r["score"], r["doc_id"]))
        )
    }
    ann = ann_index.ann_index_search(
        spark, d, emb, [QVEC], k=30, n_probe=8, refine_factor=8
    ).collect()
    vec_rank = {
        r["vec_id"]: i + 1
        for i, r in enumerate(
            sorted(ann, key=lambda r: (-r["score"], r["vec_id"]))
        )
    }
    exp = {}
    for did in set(bm_rank) | set(vec_rank):
        s = 0.0
        if did in bm_rank:
            s += 1.0 / (RRF_K + bm_rank[did])
        if did in vec_rank:
            s += 1.0 / (RRF_K + vec_rank[did])
        exp[did] = round(s, 6)
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["doc_id"], r["rrf_score"]) for r in got] == top
    for r in got:
        assert r["bm_rank"] == bm_rank.get(r["doc_id"], 0)
        assert r["vec_rank"] == vec_rank.get(r["doc_id"], 0)

    # approximation quality: high overlap with the brute-force hybrid
    brute = hybrid_rrf_topk(docs, emb, TERMS, QVEC, k=10, n_deep=30).collect()
    overlap = {r["doc_id"] for r in got} & {r["doc_id"] for r in brute}
    assert len(overlap) >= 7
