"""Driver-table pipeline operators vs DuckDB oracle (subset of
scripts/check_oracle.py kept in the suite) + rows-only op sanity."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# fast, representative subset (full sweep lives in scripts/check_oracle.py)
CHECK = [
    "ft_doc_stats",
    "ft_bm25_topk_conj",
    "ft_bm25_topk_disj",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "text_fingerprint",
    "events_sessionization",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else format(v, ".6f")
    return str(v)


@pytest.mark.parametrize("name", CHECK)
def test_matches_duckdb_oracle(name, spark, duck):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR)
    srows = sorted(
        tuple(_norm(r[c]) for c in sorted(sdf.columns))
        for r in (row.asDict() for row in sdf.collect())
    )
    ddf = duck.sql(osql[name]).df()
    drows = sorted(
        tuple(_norm(v) for v in row)
        for row in ddf[sorted(ddf.columns)].itertuples(index=False)
    )
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert srows == drows


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"doc_id", "score", "lang", "source"} <= set(df.columns)


def test_minhash_lsh_recall(spark):
    """LSH candidates must recover a high share of the exact pairs at
    t=0.5 with 16 bands x 4 rows (S-curve: P(cand | j=0.5) ~ 0.65/band
    -> overall >0.99)."""
    from reiz_io_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, 3, 0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs, 64, 16, 3, 0.5).collect()
    }
    assert lsh <= exact  # verified candidates: precision 1.0
    assert len(lsh) >= 0.9 * len(exact)


def test_simhash_near_dups_close_in_hamming(spark):
    from pyspark.sql import functions as F

    from reiz_io_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    pairs = dedup.ngram_jaccard_pairs(docs, 3, 0.8).collect()
    if not pairs:
        pytest.skip("no strong near-dups at this sf")
    sims = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs, 2).collect()}
    for p in pairs:
        ham = bin((sims[p["doc_a"]] ^ sims[p["doc_b"]]) & (2**64 - 1)).count("1")
        assert ham <= 16, f"near-dup pair with hamming {ham}"


def test_lsh_ann_is_subset_of_bruteforce_candidates(spark):
    from reiz_io_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    bf = similarity.brute_force_topk(emb, [0, 1, 2], k=50).collect()
    bf_pairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in bf}
    lsh = similarity.lsh_bucketed_topk(emb, [0, 1, 2], k=10).collect()
    assert len(lsh) > 0
    # every LSH hit's similarity must equal the brute-force value
    for r in lsh:
        key = (r["query_id"], r["neighbor_id"])
        if key in bf_pairs:
            assert abs(r["cos_sim"] - bf_pairs[key]) < 1e-9


def test_multimodal_decode_deterministic(spark):
    from reiz_io_spark.operators import multimodal

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(50)
    a = multimodal.extract_media_features(multimodal.to_media_table(docs)).collect()
    b = multimodal.extract_media_features(multimodal.to_media_table(docs)).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
        map(tuple, b), key=lambda t: t[0]
    )
    for r in a:
        assert 64 <= r["fake_width"] < 256 and 64 <= r["fake_height"] < 256
        assert r["n_bytes"] > 0
