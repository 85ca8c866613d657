"""IVF-PQ ANN: deterministic training/encoding, kernel parity with the
scalar definition, and recall vs the exact brute-force baseline."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators import pq, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).cache()


def test_encode_matches_scalar_definition(spark, emb):
    """Vectorized encoder == per-vector nearest-centroid by the plain
    L2 definition, for every vector in the table."""
    books = pq.pq_train(emb, m=4, n_codes=16)
    got = {r["vec_id"]: list(r["codes"]) for r in pq.pq_encode(emb, books).collect()}
    rows = emb.collect()
    m, _, sub = books.shape
    for r in rows:
        v = np.asarray(r["embedding"], dtype="float64")
        v = v / max(float(np.linalg.norm(v)), 1e-12)
        want = [
            int(((books[j] - v[j * sub:(j + 1) * sub]) ** 2).sum(axis=1).argmin())
            for j in range(m)
        ]
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_train_deterministic(emb):
    b1 = pq.pq_train(emb, m=4, n_codes=16, seed=7)
    b2 = pq.pq_train(emb, m=4, n_codes=16, seed=7)
    assert np.array_equal(b1, b2)


def test_dim_not_divisible_raises(emb):
    d = similarity.embedding_dim(emb)
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train(emb, m=d - 1 if d > 2 else 3)


def test_recall_vs_brute_force(spark, emb):
    """Recall@10 over random embeddings is the hard case for any ANN
    (no cluster structure); PQ with a generous refine factor must still
    recover most of the exact top-10, and scores of returned pairs are
    EXACT (refine recomputes true cosine)."""
    qids = [0, 1, 2]
    exact = similarity.brute_force_topk(emb, qids, k=10).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}

    got = pq.pq_topk(emb, qids, k=10, m=4, n_codes=16, refine_factor=16).collect()
    got_pairs = {(r["query_id"], r["vec_id"]) for r in got}
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.6, recall
    for r in got:
        key = (r["query_id"], r["vec_id"])
        if key in exact_scores:
            assert abs(r["score"] - exact_scores[key]) < 1e-9


def test_ivf_pq_probe_all_equals_flat(spark, emb):
    """With n_probe == n_lists the coarse stage prunes nothing, so true
    IVF-PQ must return exactly the flat-PQ result — proves the IVF
    stage only PRUNES, never alters scoring."""
    qids = [0, 1, 2]
    flat = sorted(tuple(r) for r in pq.pq_topk(
        emb, qids, k=10, m=4, n_codes=16, refine_factor=8).collect())
    ivf = sorted(tuple(r) for r in pq.ivf_pq_topk(
        emb, qids, k=10, m=4, n_codes=16, n_lists=8, n_probe=8,
        refine_factor=8).collect())
    assert flat == ivf


def test_ivf_pq_pruned_recall(spark, emb):
    """Probing half the lists on structureless random data must still
    recover a useful fraction of the exact top-10, with exact scores
    on whatever it returns."""
    qids = [0, 1, 2]
    exact = similarity.brute_force_topk(emb, qids, k=10).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = pq.ivf_pq_topk(
        emb, qids, k=10, m=4, n_codes=16, n_lists=8, n_probe=4,
        refine_factor=16,
    ).collect()
    got_pairs = {(r["query_id"], r["vec_id"]) for r in got}
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.3, recall  # random vectors spread across lists
    scores = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    for r in got:
        key = (r["query_id"], r["vec_id"])
        if key in scores:
            assert abs(r["score"] - scores[key]) < 1e-9


def test_pq_checkable_matches_duckdb(spark, emb):
    """The LCG-formula PQ twin (driver entry ann_pq_topk) is exact
    value-for-value against its DuckDB SQL."""
    import duckdb

    from reiz_io_spark.operators import ann_checkable as ac

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{SF_DIR}/embeddings.parquet'"
    )
    a = sorted(tuple(r) for r in ac.pq_topk_checkable(emb, [0, 1, 2], k=10).collect())
    b = sorted(tuple(r) for r in con.execute(
        ac.pq_topk_checkable_sql([0, 1, 2], k=10)).fetchall())
    assert a == b
    assert len(a) == 30


def test_codes_compress(emb):
    """The whole point: m int codes per vector instead of d floats."""
    books = pq.pq_train(emb, m=4, n_codes=16)
    row = pq.pq_encode(emb, books).first()
    d = similarity.embedding_dim(emb)
    assert len(row["codes"]) == 4 < d
    assert all(0 <= c < 16 for c in row["codes"])


def test_local_topk_matches_full_sort():
    """Map-side pruning selects by the exact global order (approx desc,
    vec_id asc), including boundary ties — bit-identical to sorting the
    whole batch."""
    rng = np.random.RandomState(11)
    for n, n_cand in ((1000, 40), (50, 64), (200, 10)):
        ids = rng.permutation(n).astype("int64")
        # quantized scores -> plenty of exact ties at the boundary
        approx = rng.randint(0, 17, size=n).astype("float64")
        got = pq._local_topk(7, ids, approx, n_cand)
        full = sorted(zip(-approx, ids))[:n_cand]
        want = [(int(i), float(-a)) for a, i in full]
        assert list(zip(got["vec_id"], got["approx"])) == want


def test_candidate_volume_bounded(spark, emb, monkeypatch):
    """The exchange below the per-query window carries at most
    n_queries * n_cand rows per scan batch — never the full scored
    corpus (the 100-TB shape: local top-k before the shuffle)."""
    captured = {}
    orig = pq._global_topk_candidates

    def spy(approx, n_cand):
        captured["rows"] = approx.count()
        captured["n_cand"] = n_cand
        return orig(approx, n_cand)

    monkeypatch.setattr(pq, "_global_topk_candidates", spy)
    qids = [0, 1, 2]
    got = pq.pq_topk(emb, qids, k=10, m=4, n_codes=16, refine_factor=4).collect()
    assert len(got) > 0
    n_vecs = emb.count()
    n_batches = emb.rdd.getNumPartitions() * 2  # Arrow may split batches
    assert captured["rows"] <= len(qids) * captured["n_cand"] * n_batches
    assert captured["rows"] < len(qids) * n_vecs  # strictly pruned
