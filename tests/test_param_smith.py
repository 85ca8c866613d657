"""Parameter smith for the documents/events tier — the driver's hash
gate checks every oracle at ONE fixed parameter point; this sweep
drives each parameterized operator against its DuckDB twin at ~30
seeded-random parameter points (terms sampled from the live corpus
vocabulary, random k / thresholds / windows / weights), using the same
order-insensitive sorted-column value compare as the driver. A twin
that only agrees at its registry point would fail here.
"""

from __future__ import annotations

import math
import os
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators import (
    dedup,
    fulltext,
    phrase,
    sampling,
    similarity,
    sketch,
)
from reiz_io_spark.operators.asof import range_join_bucketed, views_then_clicks_sql
from reiz_io_spark.operators.hybrid import hybrid_rrf_topk, hybrid_rrf_topk_sql

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["documents", "embeddings", "events"]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return format(round(v, 6), ".6f")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def vocab(spark):
    """Corpus terms with df >= 2 (non-trivial hits), deterministic."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rows = (
        fulltext.dictionary(docs)
        .filter(F.col("df") >= 2)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(200)
        .collect()
    )
    return [r["term"] for r in rows]


def _compare(name, sdf, con, sql):
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(_norm(row[c]) for c in scols) for row in sdf.collect()
    )
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    assert sorted(dcols) == scols, f"{name}: columns {sorted(dcols)} != {scols}"
    drows = sorted(
        tuple(_norm(row[i]) for i in order) for row in res.fetchall()
    )
    assert srows == drows, (
        f"{name}: {len(srows)} spark rows vs {len(drows)} duck rows; "
        f"first diff: {next((a, b) for a, b in zip(srows, drows) if a != b) if srows and drows else (srows[:1], drows[:1])}"
    )
    return len(srows)


def test_bm25_param_sweep(spark, con, vocab):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rng = random.Random(1305)
    nonempty = 0
    for i in range(8):
        terms = rng.sample(vocab, rng.randint(1, 4))
        if i == 7:
            terms.append("zzzunseen")  # unknown term mixed in
        k = rng.randint(3, 20)
        conj = rng.random() < 0.5
        n = _compare(
            f"bm25[{i}] terms={terms} k={k} conj={conj}",
            fulltext.bm25_topk(docs, terms, k, conj),
            con,
            fulltext.bm25_topk_sql(terms, k, conj),
        )
        nonempty += n > 0
    assert nonempty >= 4  # the sweep exercised real matches


def test_grouped_and_hybrid_param_sweep(spark, con, vocab):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rng = random.Random(1306)
    for i in range(4):
        terms = rng.sample(vocab, rng.randint(2, 4))
        kpg = rng.randint(1, 4)
        _compare(
            f"bm25_by_group[{i}]",
            fulltext.bm25_topk_by_group(docs, terms, "lang", kpg),
            con,
            fulltext.bm25_topk_by_group_sql(terms, "lang", kpg),
        )
    for i in range(4):
        terms = rng.sample(vocab, rng.randint(1, 3))
        qvec = rng.randint(0, 499)
        k, n_deep = rng.randint(3, 15), rng.choice([20, 50, 80])
        n = _compare(
            f"hybrid[{i}] terms={terms} qvec={qvec}",
            hybrid_rrf_topk(docs, emb, terms, qvec, k=k, n_deep=n_deep),
            con,
            hybrid_rrf_topk_sql(terms, qvec, k=k, n_deep=n_deep),
        )
        assert n == k  # vector list alone always fills the fused top-k


def test_phrase_proximity_snippets_param_sweep(spark, con, vocab):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rng = random.Random(1307)
    # real bigrams from the corpus so phrase queries actually hit
    toks = [
        r["toks"]
        for r in fulltext.tokens(docs).limit(30).collect()
        if len(r["toks"]) >= 3
    ]
    hits = 0
    for i in range(5):
        doc_toks = rng.choice(toks)
        start = rng.randint(0, len(doc_toks) - 2)
        ph = list(doc_toks[start:start + rng.choice([2, 3])])
        k = rng.randint(3, 10)
        n = _compare(
            f"phrase_topk[{i}] {ph}",
            phrase.phrase_topk(docs, ph, k=k),
            con,
            phrase.phrase_topk_sql(ph, k=k),
        )
        hits += n > 0
    assert hits >= 3
    for i in range(4):
        a, b = rng.sample(vocab, 2)
        slop = rng.randint(1, 6)
        _compare(
            f"proximity[{i}] {a}~{b}/{slop}",
            phrase.proximity_match(docs, a, b, slop),
            con,
            phrase.proximity_match_sql(a, b, slop),
        )
    for i in range(3):
        terms = rng.sample(vocab, rng.randint(1, 3))
        w = rng.randint(2, 5)
        _compare(
            f"snippets[{i}]",
            fulltext.snippets(docs, terms, window=w),
            con,
            fulltext.snippets_sql(terms, window=w),
        )


def test_dedup_sampling_sketch_param_sweep(spark, con):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    rng = random.Random(1308)
    for i in range(3):
        n = rng.randint(2, 4)
        t = rng.choice([0.3, 0.5, 0.7])
        _compare(
            f"ngram_jaccard[{i}] n={n} t={t}",
            dedup.ngram_jaccard_pairs(docs, n=n, threshold=t),
            con,
            dedup.ngram_jaccard_pairs_sql(n=n, threshold=t),
        )
    for w in (8, 16):
        _compare(
            f"chunk_dedup w={w}",
            dedup.chunk_dedup(docs, w=w),
            con,
            dedup.chunk_dedup_sql(w=w),
        )
    for i in range(3):
        ws = {"a": rng.uniform(0.2, 0.6), "b": rng.uniform(0.1, 0.3)}
        ws["c"] = 1.0 - sum(ws.values())
        _compare(
            f"hash_split[{i}]",
            sampling.hash_split(docs, "doc_id", ws),
            con,
            sampling.hash_split_sql("documents", "doc_id", ws),
        )
        frac = rng.choice([0.1, 0.25, 0.5])
        _compare(
            f"stratified[{i}] f={frac}",
            sampling.stratified_sample(docs, "doc_id", "lang", frac),
            con,
            sampling.stratified_sample_sql("documents", "doc_id", "lang", frac),
        )
    for k in (8, 32, 128):
        _compare(
            f"kmv k={k}",
            sketch.kmv_distinct_by_group(events, "event_type", "user_id", k),
            con,
            sketch.kmv_distinct_by_group_sql("events", "event_type", "user_id", k),
        )


def test_range_join_and_ann_param_sweep(spark, con):
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    rng = random.Random(1309)
    views = events.filter(F.col("event_type") == "view")
    clicks = events.filter(F.col("event_type") == "click")
    for i in range(3):
        lo = rng.choice([0, 30, 120])
        hi = lo + rng.choice([60, 300, 900])
        _compare(
            f"range_join[{i}] [{lo},{hi}]",
            range_join_bucketed(
                views, clicks, key="user_id", ts="ts", id_col="event_id",
                lower_s=lo, upper_s=hi,
            ),
            con,
            views_then_clicks_sql(lo, hi),
        )
    for i in range(3):
        qids = rng.sample(range(500), rng.randint(1, 4))
        k = rng.randint(3, 15)
        _compare(
            f"brute_force[{i}] q={qids} k={k}",
            similarity.brute_force_topk(emb, qids, k),
            con,
            similarity.brute_force_topk_sql(qids, k),
        )
