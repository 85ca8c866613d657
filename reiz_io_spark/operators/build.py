"""Inverted-index build: corpus -> docs / postings runs / dictionary /
compressed blocks / lineage, checkpoint-resumable.

This one columnar pipeline replaces the reference's per-AST-node INSERT
ingest (reiz/serialization/insert.py:18-51, serializer.py:88-97 — one
network round trip per node, ~17.5M objects for 53k files) with:

    corpus ──filter(lang)──▶ tokenize UDF (map-side tf) ──▶ docs + runs
    runs ──join(dictionary: df, idf)──▶ salt = pmod(xxhash64(doc_id), S(term))
         ──repartition(term, salt)  [the north rule's salted re-shuffle]
         ──sortWithinPartitions(term, salt, doc_id)  [external merge:
            Spark's sort-based shuffle spills + merges runs on disk]
         ──mapInPandas(encode)──▶ delta+varint blocks w/ block-max scores

Scale design notes (100 TB / 10^12 files):
- tf aggregation happens INSIDE the tokenizer UDF (one row per doc), so
  the only full-data shuffle is the block-encode repartition.
- S(term) = ceil(df / FRAGMENT_POSTINGS): hot terms (id:self, node:Name —
  Zipfian corpora) fan out across S fragments, each encoded
  independently; no single task ever owns a whole hot posting list.
  AQE skew handling covers joins, not groupBy fan-in — hence explicit
  salting (SURVEY.md §4.3).
- blocks/dictionary written partitioned by term_bucket =
  pmod(xxhash64(term), N_TERM_BUCKETS): query-time partition pruning
  reads only the buckets of the query's terms.
- resume: per-shard lineage rows (shard = pmod(xxhash64(repo), n_shards))
  written only after that shard's docs+runs land; a re-run anti-joins
  pending shards against lineage — the analog of the reference's
  DB-backed ingest cache (reiz/serialization/cache.py:8-25,
  context.py:105-109).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from .. import BLOCK_SIZE, BM25_B, BM25_K1
from ..functions import codec
from ..functions.tokenizer import with_tokens
from ..schema import BLOCKS, LINEAGE

FRAGMENT_POSTINGS = 262_144  # target postings per salted fragment
N_TERM_BUCKETS = 32


def _paths(out_dir: str) -> dict[str, str]:
    return {
        "docs": os.path.join(out_dir, "docs"),
        "runs": os.path.join(out_dir, "runs"),
        "dictionary": os.path.join(out_dir, "dictionary"),
        "blocks": os.path.join(out_dir, "blocks"),
        "lineage": os.path.join(out_dir, "lineage"),
        "meta": os.path.join(out_dir, "meta.json"),
    }


from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def _np_log1p(x: pd.Series) -> pd.Series:
    """Lucene idf via numpy log — bit-identical to the oracle's
    np.log(1 + x) (JVM Math.log may differ by ulps; SURVEY.md §7.4)."""
    import numpy as np

    return pd.Series(np.log(1.0 + x.to_numpy(dtype="float64")))


def prepare_docs(corpus: DataFrame, n_shards: int) -> DataFrame:
    """corpus -> sanitized + identified + tokenized rows.

    Sanitize filter ≈ reference sanitize_dataset.py:15-25; rows that fail
    ast.parse keep parse_ok=False (Insertion.SKIPPED,
    statistics.py:7-12). doc_id/shard are content-independent hashes —
    deterministic under task retries (no row_number over unordered data).
    """
    df = corpus.filter(F.col("lang") == "python")
    df = df.withColumn("doc_id", F.xxhash64("repo", "path"))
    df = df.withColumn("shard", F.pmod(F.xxhash64("repo"), F.lit(n_shards)).cast("int"))
    df = df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    return with_tokens(df)


def completed_shards(spark: SparkSession, lineage_path: str, build_id: str) -> DataFrame:
    try:
        lin = spark.read.schema(LINEAGE).parquet(lineage_path)
    except Exception:
        return spark.createDataFrame([], "shard int")
    return (
        lin.filter((F.col("build_id") == build_id) & (F.col("status") == "done"))
        .select("shard")
        .distinct()
    )


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    build_id: str = "build-0",
    n_shards: int = 8,
    block_size: int = BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    fragment_postings: int = FRAGMENT_POSTINGS,
) -> dict:
    """Full build. Returns metrics dict. Safe to re-run after a crash:
    completed shards are skipped via the lineage anti-join; the merge +
    block stage is deterministic given the runs tables."""
    p = _paths(out_dir)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t0 = time.perf_counter()

    # ---- stage 1: per-shard tokenize -> docs + runs (resumable) ----------
    done = completed_shards(spark, p["lineage"], build_id)
    prepared = prepare_docs(corpus, n_shards)
    pending = prepared.join(done, "shard", "left_anti")

    docs = pending.select(
        "doc_id",
        "repo",
        "path",
        "commit",
        "content_sha256",
        F.col("n_terms").alias("doclen"),
        "parse_ok",
        "shard",
    )
    docs.write.mode("overwrite").partitionBy("shard").parquet(p["docs"])

    # runs: one explode of the per-doc tf map; dl rides along -> the query
    # path never joins back to docs for lengths.
    runs = (
        pending.filter(F.col("parse_ok"))
        .select(
            "shard",
            "doc_id",
            F.col("n_terms").alias("dl"),
            F.explode("terms").alias("term", "tf"),
        )
        .select("shard", "term", "doc_id", "tf", "dl")
    )
    runs.sortWithinPartitions("term", "doc_id").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(p["runs"])

    # lineage rows for the shards we just processed (atomic append AFTER
    # the shard data landed — crash before this line ⇒ shard re-runs).
    stage1_ms = int((time.perf_counter() - t0) * 1000)
    lineage_rows = (
        spark.read.parquet(p["docs"])
        .join(done, "shard", "left_anti")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(F.when(~F.col("parse_ok"), 1).otherwise(0)).alias("n_parse_failed"),
            F.sum("doclen").alias("n_terms"),
            F.format_string(
                "%016x", F.expr("bit_xor(xxhash64(content_sha256))")
            ).alias("content_sha_xor"),
        )
        .select(
            F.lit(build_id).alias("build_id"),
            "shard",
            F.lit("done").alias("status"),
            "n_files",
            "n_parse_failed",
            "n_terms",
            "content_sha_xor",
            F.lit(stage1_ms).alias("wall_ms"),
        )
    )
    lineage_rows.write.mode("append").parquet(p["lineage"])

    # ---- stage 2: collection stats + dictionary ---------------------------
    t1 = time.perf_counter()
    all_runs = spark.read.parquet(p["runs"])
    all_docs = spark.read.parquet(p["docs"]).filter(F.col("parse_ok"))
    stats = all_docs.agg(
        F.count("*").alias("n_docs"), F.sum("doclen").alias("total_dl")
    ).collect()[0]
    n_docs, total_dl = int(stats["n_docs"]), int(stats["total_dl"] or 0)
    avgdl = total_dl / n_docs if n_docs else 0.0

    # Materialize the base dictionary once (parquet, not .persist(): at
    # 10^9 terms a cache would not fit; a columnar roundtrip always scales).
    dict_base_path = os.path.join(out_dir, "_dictionary_base")
    (
        all_runs.groupBy("term")  # built-in partial+final hash agg — skew-safe
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
        .withColumn(
            "idf",
            _np_log1p(
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn("term_id", F.xxhash64("term"))
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int")
        )
        .write.mode("overwrite")
        .parquet(dict_base_path)
    )
    dictionary = spark.read.parquet(dict_base_path)

    # ---- stage 3: salted re-shuffle + external merge + block encode -------
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    salted = (
        all_runs.join(dictionary.select("term", "df", "idf"), "term")
        .withColumn(
            "n_frag",
            F.greatest(
                F.lit(1), F.ceil(F.col("df") / F.lit(fragment_postings))
            ).cast("int"),
        )
        .withColumn("salt", F.pmod(F.xxhash64("doc_id"), F.col("n_frag")).cast("int"))
    )
    encode = _make_block_encoder(avgdl, k1, b, block_size)
    blocks = (
        salted.repartition(n_part, "term", "salt")
        .sortWithinPartitions("term", "salt", "doc_id")
        .select("term", "salt", "doc_id", "tf", "dl", "idf")
        .mapInPandas(encode, schema=BLOCKS)
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)).cast("int")
        )
    )
    blocks.write.mode("overwrite").partitionBy("term_bucket").parquet(p["blocks"])

    blocks_df = spark.read.parquet(p["blocks"])
    max_scores = blocks_df.groupBy("term").agg(
        F.max("block_max_score").alias("max_score")
    )
    dictionary.join(max_scores, "term", "left").na.fill(
        {"max_score": 0.0}
    ).write.mode("overwrite").partitionBy("term_bucket").parquet(p["dictionary"])

    meta = {
        "build_id": build_id,
        "n_docs": n_docs,
        "total_dl": total_dl,
        "avgdl": avgdl,
        "k1": k1,
        "b": b,
        "block_size": block_size,
        "n_shards": n_shards,
        "n_term_buckets": N_TERM_BUCKETS,
        "stage1_ms": stage1_ms,
        "stage23_ms": int((time.perf_counter() - t1) * 1000),
    }
    with open(p["meta"], "w") as fh:
        json.dump(meta, fh, indent=2)
    return meta


def _make_block_encoder(avgdl: float, k1: float, b: float, block_size: int):
    """mapInPandas encoder: rows sorted by (term, salt, doc_id) within the
    partition -> block rows. Buffers across Arrow batches so a fragment
    spanning batch boundaries encodes as one run; memory is bounded by
    the fragment target (FRAGMENT_POSTINGS), not the posting list."""
    import numpy as np

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[pd.DataFrame] = []
        cur_key: tuple | None = None

        def flush() -> pd.DataFrame | None:
            if not buf:
                return None
            pdf = pd.concat(buf, ignore_index=True) if len(buf) > 1 else buf[0]
            buf.clear()
            rows = codec.encode_term_blocks(
                pdf["doc_id"].to_numpy(np.int64),
                pdf["tf"].to_numpy(np.int64),
                pdf["dl"].to_numpy(np.int64),
                float(pdf["idf"].iloc[0]),
                avgdl,
                k1,
                b,
                block_size,
            )
            out = pd.DataFrame(rows)
            out.insert(0, "term", cur_key[0])
            return out

        for pdf in batches:
            if pdf.empty:
                continue
            # split batch at fragment boundaries
            keys = pdf[["term", "salt"]].apply(tuple, axis=1)
            boundaries = keys.ne(keys.shift()).to_numpy().nonzero()[0]
            for i, start in enumerate(boundaries):
                end = boundaries[i + 1] if i + 1 < len(boundaries) else len(pdf)
                chunk = pdf.iloc[start:end]
                key = (chunk["term"].iloc[0], chunk["salt"].iloc[0])
                if key != cur_key:
                    flushed = flush()
                    if flushed is not None:
                        yield flushed
                    cur_key = key
                buf.append(chunk)
        flushed = flush()
        if flushed is not None:
            yield flushed

    return encode
