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
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert r["n_bytes"] > 0


def test_vectorized_hash_kernels_bit_identical():
    """The batch NumPy kernels must equal the scalar definitions
    bit-for-bit (VERDICT r01 item 4: no per-row/per-byte Python, same
    outputs)."""
    import numpy as np

    from reiz_io_spark.operators.dedup import (
        _MAX_HASH,
        _MERSENNE,
        _fnv1a64,
        _minhash_params,
        fnv1a64_batch,
        minhash_from_hashes,
        modmul_p61,
        simhash_from_hashes,
    )

    strs = ["", "a", "hello_world_foo", "x" * 100, "unicode_ü_ß", "self_data"]
    assert list(fnv1a64_batch(strs)) == [_fnv1a64(s) for s in strs]

    rng = np.random.RandomState(1)
    xs = rng.randint(0, 2**63, size=2000).astype(np.uint64) * np.uint64(2) + (
        rng.randint(0, 2, 2000)
    ).astype(np.uint64)
    xs = np.concatenate(
        [xs, np.array([0, 1, 2**64 - 1, 2**61 - 1, 2**61], dtype=np.uint64)]
    )
    for a in [1, _MERSENNE - 1, 0x123456789ABCDEF, int(rng.randint(1, _MERSENNE))]:
        exp = np.array([(a * int(x)) % _MERSENNE for x in xs], dtype=np.uint64)
        assert (modmul_p61(a, xs) == exp).all()

    a_p, b_p = _minhash_params(8, seed=42)
    docs = [["a_b_c", "c_d_e", "x_y_z"], [], ["hello_a_b"], ["a_b_c"] * 3]
    flat = [s for d in docs for s in d]
    hs = fnv1a64_batch(flat)
    offs = np.concatenate(([0], np.cumsum([len(d) for d in docs])))
    sig = minhash_from_hashes(hs, offs, a_p, b_p)
    for di, d in enumerate(docs):
        if not d:
            exp = [int(_MAX_HASH)] * 8
        else:
            hh = [_fnv1a64(s) for s in d]
            exp = [
                min(((int(a_p[k]) * h + int(b_p[k])) % _MERSENNE) % (1 << 32) for h in hh)
                for k in range(8)
            ]
        assert list(sig[di]) == exp
    sh = simhash_from_hashes(hs, offs)
    assert sh[1] == 0 and sh.dtype == np.int64


def test_jaccard_for_pairs_matches_full_join(spark):
    """Candidate-only Jaccard (the LSH verify path) must agree with the
    uncapped exhaustive shingle self-join on those pairs."""
    from reiz_io_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, 3, 0.3, max_shingle_df=None
        ).collect()
    }
    assert full, "fixture needs at least one near-dup pair"
    pairs = spark.createDataFrame(
        [(a, b) for a, b in full], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_for_pairs(docs, pairs, n=3).collect()
    }
    assert got == full


def test_hot_shingle_cap_matches_duckdb(spark, duck):
    """With a stop-phrase present, the capped engine must equal the
    capped SQL twin (cap applied identically on both sides)."""
    from reiz_io_spark.operators import dedup

    stop = "the quick brown fox jumps"
    rows = [(i, f"{stop} doc {i} unique tail {i*7}") for i in range(40)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon eta")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    sdf.createOrReplaceTempView("capdocs")
    duck.execute("CREATE OR REPLACE TABLE capdocs AS SELECT * FROM (VALUES "
                 + ",".join(f"({i}, '{t}')" for i, t in rows)
                 + ") AS t(doc_id, text)")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(sdf, 2, 0.3, max_shingle_df=10).collect()
    )
    sql = dedup.ngram_jaccard_pairs_sql(2, 0.3, max_shingle_df=10).replace(
        "FROM documents", "FROM capdocs"
    )
    exp = sorted(tuple(row) for row in duck.sql(sql).fetchall())
    assert got == [(a, b, float(j)) for a, b, j in exp]
    # the stop-phrase shingles are capped out: the 40 stop docs share no
    # other 2-gram, so no pair among them survives
    assert all(a >= 100 for a, _, _ in got)


def test_ann_lsh_dim32_multiprobe(spark):
    """LSH ANN must work at a non-64 embedding dim and return k rows per
    query via multi-probe (VERDICT r01 item 7)."""
    import numpy as np

    from reiz_io_spark.operators import similarity

    rng = np.random.RandomState(3)
    rows = [(int(i), [float(x) for x in rng.standard_normal(32)], 0)
            for i in range(400)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    assert similarity.embedding_dim(emb) == 32
    got = similarity.lsh_bucketed_topk(emb, [0, 1], k=5, n_planes=6).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for q, rs in by_q.items():
        assert len(rs) == 5, f"query {q} returned {len(rs)} rows"
    # similarities must equal brute force values for the same pairs
    bf = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.brute_force_topk(emb, [0, 1], k=400).collect()
    }
    for r in got:
        assert abs(r["cos_sim"] - bf[(r["query_id"], r["neighbor_id"])]) < 1e-9


def test_ivf_ann_recall_and_parity(spark):
    """IVF: k rows per query, similarity values equal brute force, and
    recall@10 over the probed lists is high on the test embeddings."""
    from reiz_io_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    got = similarity.ivf_topk(emb, [0, 1, 2], k=10, n_lists=16, n_probe=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1, 2}
    bf = similarity.brute_force_topk(emb, [0, 1, 2], k=10).collect()
    bf_pairs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in bf}
    bf_all = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.brute_force_topk(emb, [0, 1, 2], k=10_000).collect()
    }
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        assert abs(r["cos_sim"] - bf_all[key]) < 1e-9
    hits = sum(1 for key in bf_pairs if key in {
        (r["query_id"], r["neighbor_id"]) for r in got})
    assert hits >= 0.5 * len(bf_pairs), f"IVF recall too low: {hits}/{len(bf_pairs)}"


def test_ivf_assignments_deterministic(spark):
    from reiz_io_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    _, a1 = similarity.ivf_assignments(emb, n_lists=8)
    _, a2 = similarity.ivf_assignments(emb, n_lists=8)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_frame_sample_matches_duckdb(spark, duck):
    from reiz_io_spark.operators import multimodal

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = sorted(
        (r["doc_id"], r["frame_no"], r["frame_offset"], r["frame_len"])
        for r in multimodal.sample_frames(
            multimodal.to_media_table(docs), every_n=4
        ).collect()
    )
    exp = sorted(tuple(row) for row in duck.sql(
        multimodal.frame_sample_sql(every_n=4)).fetchall())
    assert got == exp
    # frame digests are deterministic and frame_len-consistent
    rows = multimodal.sample_frames(
        multimodal.to_media_table(docs.limit(20)), every_n=2
    ).collect()
    assert all(len(r["frame_sha256"]) == 64 for r in rows)


def test_resize_stub_deterministic_shape(spark):
    from reiz_io_spark.operators import multimodal

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(10)
    a = multimodal.resize_stub(multimodal.to_media_table(docs), 16, 8).collect()
    b = multimodal.resize_stub(multimodal.to_media_table(docs), 16, 8).collect()
    assert sorted((r["doc_id"], bytes(r["payload"])) for r in a) == sorted(
        (r["doc_id"], bytes(r["payload"])) for r in b
    )
    for r in a:
        assert len(bytes(r["payload"])) == 16 * 8
        assert (r["width"], r["height"]) == (16, 8)


def test_dup_clusters_match_duckdb(spark, duck):
    """Connected components over the near-dup graph == recursive-CTE
    oracle, full table."""
    from reiz_io_spark.operators import dedup

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in dedup.dup_clusters(docs, 3, 0.5).collect()
    )
    exp = sorted(tuple(r) for r in duck.sql(dedup.dup_clusters_sql(3, 0.5)).fetchall())
    assert got == exp


def test_dup_clusters_transitive(spark):
    """A~B and B~C (but A!~C directly) must land in ONE cluster —
    the propagation is transitive, not pairwise."""
    from reiz_io_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    toks = base.split()
    a = " ".join(toks)
    b = " ".join(toks[:8] + ["mu", "nu"])          # close to a
    c = " ".join(toks[:6] + ["mu", "nu", "xi", "om"])  # close to b, less to a
    rows = [(1, a), (2, b), (3, c), (9, "totally different text entirely here")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.ngram_jaccard_pairs(sdf, 2, 0.4).collect()}
    clusters = {r["doc_id"]: r["cluster_id"]
                for r in dedup.dup_clusters(sdf, 2, 0.4).collect()}
    if (1, 2) in pairs and (2, 3) in pairs and (1, 3) not in pairs:
        assert clusters[1] == clusters[2] == clusters[3] == 1
    assert clusters[9] == 9


def test_embedding_dup_exact_matches_duckdb(spark, duck):
    from reiz_io_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    got = sorted(
        (r["vec_a"], r["vec_b"], format(r["cos_sim"], ".6f"))
        for r in similarity.embedding_dup_pairs_exact(emb, 0.25).collect()
    )
    exp = sorted(
        (a, b, format(c, ".6f"))
        for a, b, c in duck.sql(
            similarity.embedding_dup_pairs_exact_sql(0.25)
        ).fetchall()
    )
    assert got == exp
    assert got, "fixture should contain at least one pair at this threshold"


def test_embedding_dup_lsh_recall_on_planted_near_dups(spark):
    """LSH near-dup detection on data that HAS near-dups: plant noisy
    copies (cos ~0.99); verified pairs are a subset of exact with high
    recall, and none of the random-vector noise pairs appear."""
    import numpy as np

    from reiz_io_spark.operators import similarity

    rng = np.random.RandomState(11)
    base = rng.standard_normal((120, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
        if i % 3 == 0:  # planted near-dup: tiny additive noise
            noisy = v + 0.05 * rng.standard_normal(32)
            rows.append((1000 + i, [float(x) for x in noisy], 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_dup_pairs_exact(emb, 0.95).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_dup_pairs_lsh(emb, 0.95, n_planes=10).collect()
    }
    assert exact, "planted near-dups must exist at cos >= 0.95"
    assert lsh <= exact
    assert len(lsh) >= 0.9 * len(exact), (len(lsh), len(exact))


def test_media_decode_probe_paths():
    """Decode is probed at import: PIL -> real decode (tested with a
    generated PNG when PIL exists), otherwise the deterministic stub;
    unparseable bytes always fall back to the stub so mixed corpora
    never kill the stage."""
    from reiz_io_spark.operators import multimodal as mm

    payload = b"definitely not an image"
    assert mm.default_decoder()(payload) == mm._stub_decode(payload)
    if not mm.HAVE_PIL:
        pytest.skip("PIL not in this container — stub path asserted above")
    import io

    from PIL import Image

    img = Image.new("L", (20, 10), color=128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    w, h, luma = mm._pil_decode(buf.getvalue())
    assert (w, h) == (20, 10)
    assert abs(luma - 128 / 255.0) < 1e-6


def test_ann_checkable_exact_rerank_and_coverage(spark):
    """The oracle-checkable ANN variants (LCG-formula projections) are
    real ANN: every returned similarity equals the brute-force value
    (exact re-rank over a candidate subset) and multi-probe/IVF probing
    returns a full k rows per query. (No recall gate here: the sf
    fixtures' embeddings are RANDOM, so true neighbors are arbitrary —
    even Gaussian-plane LSH measures ~0.07 recall@10 on them; recall is
    a property of data locality, exactness is the engine's contract,
    and engine-vs-oracle identity is the driver's hash gate.)"""
    from reiz_io_spark.operators import ann_checkable as ac
    from reiz_io_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    qids = [0, 1, 2]
    bf_all = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.brute_force_topk(emb, qids, k=10**6).collect()
    }
    for name, got in [
        ("lsh", ac.lsh_topk_checkable(emb, qids, k=10).collect()),
        ("ivf", ac.ivf_topk_checkable(emb, qids, k=10).collect()),
    ]:
        assert got, name
        per_q: dict[int, int] = {}
        for r in got:
            key = (r["query_id"], r["neighbor_id"])
            assert r["cos_sim"] == bf_all[key], (name, key)  # exact re-rank
            per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
        # every query returns k rows (multi-probe / n_probe coverage)
        assert all(per_q.get(q, 0) == 10 for q in qids), (name, per_q)


def test_dedup_checkable_md5_hash_parity(spark):
    """The cross-engine hash primitive: Spark's conv(substr(md5)) must
    equal python hashlib (and therefore DuckDB's ('0x'||...)::BIGINT,
    which the oracle compare exercises end to end)."""
    import hashlib

    from pyspark.sql import functions as F

    from reiz_io_spark.operators.dedup_checkable import _md5_48

    words = ["hello_world_x", "a", "0", "token_like_this", "zz9"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["h"] for r in df.select("w", _md5_48(F.col("w")).alias("h")).collect()}
    for w in words:
        assert got[w] == int(hashlib.md5(w.encode()).hexdigest()[:12], 16)


def test_dedup_checkable_lsh_precision_and_recall(spark):
    """Checkable-LSH pairs carry EXACT Jaccard (precision 1.0 vs the
    exact n-gram path) and the 8x2 banding recovers the exact pair set
    at this corpus."""
    from reiz_io_spark.operators import dedup, dedup_checkable

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, 3, 0.5, max_shingle_df=None).collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_checkable.minhash_lsh_checkable(docs, 3, 0.5).collect()
    }
    assert set(got) <= set(exact)  # verified candidates: precision 1.0
    for pair, j in got.items():
        assert abs(j - exact[pair]) < 1e-9  # exact Jaccard, not estimated
    assert len(got) >= 0.9 * len(exact)


def test_dedup_checkable_simhash_votes(spark):
    """Checkable simhash matches a scalar re-derivation (md5 token
    hashes, tf-weighted bit majority) on a handful of docs."""
    import hashlib
    import re
    from collections import Counter

    from reiz_io_spark.operators import dedup_checkable

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).limit(5)
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup_checkable.simhash_checkable(docs).collect()
    }
    for row in docs.collect():
        toks = [t for t in re.split("[^a-z0-9]+", row["text"].lower()) if t]
        tf = Counter(toks)
        sig = 0
        for j in range(32):
            w = sum(
                (n if (int(hashlib.md5(t.encode()).hexdigest()[:12], 16) >> j) & 1 else -n)
                for t, n in tf.items()
            )
            if w > 0:
                sig |= 1 << j
        assert got[row["doc_id"]] == sig


def test_chunk_dedup_planted_boilerplate(spark):
    """A 12-token boilerplate block planted in three otherwise-distinct
    docs is caught at chunk granularity (whole-doc dedup misses it);
    chunking arithmetic covers the ragged tail chunk."""
    from reiz_io_spark.operators.dedup import chunk_dedup

    boiler = " ".join(f"b{i}" for i in range(12))
    rows = [
        (1, boiler + " unique one tail"),
        (2, boiler + " other words entirely different here"),
        (3, "prefix " + " ".join(f"x{i}" for i in range(10)) + " " + boiler),
        (4, "completely unrelated text with no repeats at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["chunk_md5"]: r for r in chunk_dedup(df, w=12).collect()}
    # docs 1 and 2 share the aligned first chunk (the boilerplate);
    # doc 3's copy is NOT window-aligned, so exact chunking misses it —
    # that is the documented limitation near-dup (MinHash) covers
    assert len(got) == 1
    (rec,) = got.values()
    assert rec["n_copies"] == 2 and rec["n_docs"] == 2
    assert rec["keep_doc_id"] == 1
    # whole-doc dedup finds nothing here
    from reiz_io_spark.operators.dedup import exact_dedup

    assert exact_dedup(df).filter("n_copies > 1").count() == 0


def test_chunk_documents_boundaries(spark):
    """Sliding-window chunking: stride-spaced starts, full windows in
    the body, one short tail window, overlap = window - stride, and
    the chunks reconstruct the document."""
    from reiz_io_spark.operators.textstats import chunk_documents

    text = " ".join(f"t{i:03d}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, window=4, stride=3).collect()
    )
    by_doc = {}
    for d, c, n, t in rows:
        by_doc.setdefault(d, []).append((c, n, t))
    assert 3 not in by_doc  # empty doc -> no chunks
    assert by_doc[2] == [(0, 1, "solo")]
    # doc 1: starts 0,3,6,9 -> windows of 4,4,4,1
    assert [c for c, _, _ in by_doc[1]] == [0, 1, 2, 3]
    assert [n for _, n, _ in by_doc[1]] == [4, 4, 4, 1]
    assert by_doc[1][0][2] == "t000 t001 t002 t003"
    assert by_doc[1][1][2] == "t003 t004 t005 t006"  # 1-token overlap
    assert by_doc[1][3][2] == "t009"
    # non-overlapping reconstruction: first `stride` tokens per chunk
    rebuilt = " ".join(
        " ".join(t.split()[:3]) for _, _, t in by_doc[1]
    ).split()
    assert rebuilt == text.split()


def test_pack_offsets_invariants(spark):
    """Concat-and-split packing metadata: offsets are the exact running
    token count in doc_id order, sequence spans cover each doc, and a
    doc crossing a boundary reports the right first/last sequence."""
    from reiz_io_spark.operators.textstats import pack_offsets

    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * 5)), (2, ""), (3, " ".join(["b"] * 6)),
         (4, "c"), (5, " ".join(["d"] * 9))],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pack_offsets(docs, seq_len=8).collect()}
    assert 2 not in rows  # empty doc occupies no tokens
    assert (rows[1]["tok_offset"], rows[1]["seq_first"], rows[1]["seq_last"],
            rows[1]["offset_in_seq"]) == (0, 0, 0, 0)
    # doc 3: tokens 5..10 -> crosses the 8-token boundary
    assert (rows[3]["tok_offset"], rows[3]["seq_first"],
            rows[3]["seq_last"]) == (5, 0, 1)
    assert rows[4]["tok_offset"] == 11 and rows[4]["seq_first"] == 1
    # doc 5: tokens 12..20 -> sequences 1..2, offset 4 into seq 1
    assert (rows[5]["seq_first"], rows[5]["seq_last"],
            rows[5]["offset_in_seq"]) == (1, 2, 4)
    # global invariant: offsets are a prefix sum (no gaps, no overlaps)
    ordered = sorted(rows.values(), key=lambda r: r["doc_id"])
    acc = 0
    for r in ordered:
        assert r["tok_offset"] == acc
        acc += r["n_tokens"]
