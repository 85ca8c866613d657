"""Hybrid retrieval — lexical BM25 and embedding-cosine candidate
lists fused with Reciprocal Rank Fusion:

    rrf(d) = sum over lists r containing d of 1 / (K + rank_r(d))

(Cormack, Clarke, Buettcher, "Reciprocal rank fusion outperforms
Condorcet and individual rank learning methods", SIGIR 2009 — K=60 is
the paper's constant). The reference engine is lexical-only
(reiz/index textsearch); hybrid fusion is part of this repo's
beyond-reference retrieval surface, and the de-facto serving shape for
a fulltext index that also owns an ANN tier.

Scale shape: each input list is an independently scale-safe top-n_deep
(bm25_topk and brute_force_topk both carry the two-level window — the
corpus-sized work happens there, plan-asserted in test_plans). The
fusion itself touches <= 2 * n_deep rows: a full-outer join of two
tiny frames plus one global sort of <= 2 * n_deep rows — constant cost
at any corpus size, no new shuffle over the data.

Determinism: both engines rank over the ROUNDED (6 dp) component
scores with doc_id tie-breaks, so list membership and ranks — and
therefore the fused scores — are bit-stable across Spark and the
DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .fulltext import bm25_topk, bm25_topk_sql
from .similarity import brute_force_topk, brute_force_topk_sql

RRF_K = 60


def hybrid_rrf_topk(
    documents: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    n_deep: int = 50,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """(doc_id, rrf_score, bm_rank, vec_rank) top-k: BM25 (disjunctive)
    top-n_deep fused with the query vector's cosine top-n_deep.
    doc_id and vec_id identify the same document. A rank of 0 means
    "absent from that list's top n_deep" (contributes nothing)."""
    bm = bm25_topk(documents, query_terms, n_deep, conjunctive=False)
    # global rank over <= n_deep rows; the constant partition key only
    # silences Spark's single-partition warning — the data IS tiny here
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc("doc_id"))
    bmr = bm.select("doc_id", F.row_number().over(w).alias("bm_rank"))
    annr = brute_force_topk(embeddings, [query_vec_id], n_deep).select(
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("vec_rank"),
    )
    fused = bmr.join(annr, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("bm_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            F.round(rrf, 6).alias("rrf_score"),
            F.coalesce("bm_rank", F.lit(0)).cast("int").alias("bm_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("int").alias("vec_rank"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )


def hybrid_rrf_topk_sql(
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    n_deep: int = 50,
    rrf_k: int = RRF_K,
) -> str:
    """DuckDB twin — composes the two component twins verbatim, so any
    divergence in a component would surface in its own driver entry
    before it could hide here."""
    bm_sql = bm25_topk_sql(query_terms, n_deep, conjunctive=False)
    ann_sql = brute_force_topk_sql([query_vec_id], n_deep)
    return f"""
WITH bm AS (SELECT * FROM ({bm_sql})),
bmr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS bm_rank
  FROM bm
),
annr AS (
  SELECT neighbor_id AS doc_id, rank AS vec_rank FROM ({ann_sql})
),
fused AS (
  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id, b.bm_rank, a.vec_rank
  FROM bmr b FULL OUTER JOIN annr a ON b.doc_id = a.doc_id
)
SELECT doc_id,
       round(coalesce(1.0 / ({rrf_k} + bm_rank), 0)
             + coalesce(1.0 / ({rrf_k} + vec_rank), 0), 6) AS rrf_score,
       CAST(coalesce(bm_rank, 0) AS INT) AS bm_rank,
       CAST(coalesce(vec_rank, 0) AS INT) AS vec_rank
FROM fused
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {k}
"""


def hybrid_rrf_topk_indexed(
    documents: DataFrame,
    embeddings: DataFrame,
    ann_index_dir: str | list[str],
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    n_deep: int = 50,
    n_probe: int = 4,
    refine_factor: int = 4,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """The scale path for hybrid retrieval: the vector list comes from
    the persistent IVF-PQ index (partition-pruned probe + broadcast
    refine — ann_index.ann_index_search) instead of the brute-force
    corpus scan, so the fused query's cost is index-seek-shaped on
    BOTH lists. Same output contract as hybrid_rrf_topk; the vector
    list's membership is the ANN approximation (probe-all + deep
    refine converges it to the flat-PQ list — pytest).

    ``ann_index_dir`` may be a LIST of shard dirs: the vector list then
    comes from federation.federated_ann_search (per-shard pruned scans,
    one global merge) — the same fused deployment over a sharded ANN
    tier (VERDICT r06 #6)."""
    from .ann_index import ann_index_search
    from .federation import federated_ann_search

    bm = bm25_topk(documents, query_terms, n_deep, conjunctive=False)
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc("doc_id"))
    bmr = bm.select("doc_id", F.row_number().over(w).alias("bm_rank"))
    if isinstance(ann_index_dir, (list, tuple)):
        ann = federated_ann_search(
            documents.sparkSession, list(ann_index_dir), embeddings,
            [query_vec_id], k=n_deep, n_probe=n_probe,
            refine_factor=refine_factor,
        )
    else:
        ann = ann_index_search(
            documents.sparkSession, ann_index_dir, embeddings,
            [query_vec_id], k=n_deep, n_probe=n_probe,
            refine_factor=refine_factor,
        )
    wv = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("score"), F.asc("vec_id")
    )
    annr = ann.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wv).alias("vec_rank"),
    )
    fused = bmr.join(annr, "doc_id", "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("bm_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)
    )
    return (
        fused.select(
            "doc_id",
            F.round(rrf, 6).alias("rrf_score"),
            F.coalesce("bm_rank", F.lit(0)).cast("int").alias("bm_rank"),
            F.coalesce("vec_rank", F.lit(0)).cast("int").alias("vec_rank"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )
