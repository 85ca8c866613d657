"""Explicit StructTypes for every table the engine reads or writes.

The reference's schema is fixed, machine-generated from an ASDL grammar
(/root/reference/static/Python-reiz.asdl, compiled by
reiz/schema/builders/esdl.py:210-237). Ours is fixed too — no schema
inference anywhere; every scan and sink names its StructType here so
Catalyst can prune columns and push filters against a known shape.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Source corpus (BASELINE.json input_hint): one row per source file.
# repo ≈ project.name (reference reiz/sampling/data.py:8-14),
# path ≈ Module.filename — unique with repo (static/Python-reiz.asdl:2),
# commit ≈ git_revision (reiz/sampling/fetch_dataset.py:36-39).
CORPUS = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("content", StringType(), True),
    ]
)

# Tokenizer output: per-document term frequencies, aggregated map-side
# inside the pandas UDF (zero shuffle for tf). parse_ok=False mirrors the
# reference's Insertion.SKIPPED for files failing ast.parse
# (reiz/serialization/statistics.py:7-12, sanitize_dataset.py:15-25).
TOKENIZED = StructType(
    [
        StructField("terms", MapType(StringType(), LongType()), True),
        StructField("n_terms", LongType(), True),
        StructField("parse_ok", BooleanType(), False),
    ]
)

# Document stats + identity. doc_id = xxhash64(repo, path) — deterministic
# under retries (no row_number over unordered data). content_sha256 is the
# per-row invariant vs. the source table.
DOCS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), True),
        StructField("content_sha256", StringType(), False),
        StructField("doclen", LongType(), False),
        StructField("parse_ok", BooleanType(), False),
    ]
)

# Posting runs: the (term, docID, tf) triples the north rule names.
POSTINGS = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", LongType(), False),
    ]
)

# Term dictionary with collection stats; idf = Lucene BM25 idf.
DICTIONARY = StructType(
    [
        StructField("term", StringType(), False),
        StructField("term_id", LongType(), False),
        StructField("df", LongType(), False),
        StructField("cf", LongType(), False),
        StructField("idf", DoubleType(), False),
        StructField("max_score", DoubleType(), False),
    ]
)

# Compressed index blocks: sorted (doc_id, tf) runs per term, chunked into
# <= BLOCK_SIZE entries, delta+varint encoded, with per-block max-score
# metadata for block-max WAND. first/last doc_id enable block skipping.
# Terms are carried as term_id = xxhash64(term) (8 bytes) so the big
# shuffle never ships strings; the dictionary maps term <-> term_id
# (collisions are astronomically unlikely below ~10^9 terms and are
# detected by the dictionary-stage invariant countDistinct(term) per
# term_id == 1, surfaced in build metrics).
# block_max_tfnorm is the idf-free upper bound max(tf*(1+k1)/denom);
# the query side multiplies by idf — bounds only gate block skipping,
# exact scores are always recomputed from decoded (tf, dl).
BLOCKS = StructType(
    [
        StructField("term_id", LongType(), False),
        StructField("block_no", IntegerType(), False),
        StructField("first_doc_id", LongType(), False),
        StructField("last_doc_id", LongType(), False),
        StructField("n_docs", IntegerType(), False),
        StructField("max_tf", LongType(), False),
        StructField("block_max_tfnorm", DoubleType(), False),
        StructField("doc_deltas", BinaryType(), False),
        StructField("tfs", BinaryType(), False),
        StructField("dls", BinaryType(), False),
    ]
)

# Per-partition lineage for checkpoint-resume (the analog of the
# reference's DB-backed ingest cache, reiz/serialization/cache.py:8-25):
# a shard is done iff its lineage row says so; resume anti-joins.
LINEAGE = StructType(
    [
        StructField("build_id", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("n_files", LongType(), False),
        StructField("n_parse_failed", LongType(), False),
        StructField("n_terms", LongType(), False),
        StructField("content_sha_xor", StringType(), False),
        StructField("wall_ms", LongType(), False),
    ]
)

# Query results (the reference's fixed projection, reiz/fetch.py:14-29).
RESULTS = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("score", DoubleType(), False),
        StructField("rank", IntegerType(), False),
    ]
)

# Encoder output: BLOCKS plus the write-partitioning column (kept out of
# BLOCKS because readers see term_bucket as a hive partition column).
BLOCKS_WITH_BUCKET = StructType(
    list(BLOCKS.fields) + [StructField("term_bucket", IntegerType(), False)]
)

TERMS_ARRAY = ArrayType(StringType())
