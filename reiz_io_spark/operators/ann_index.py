"""Persistent IVF-PQ ANN index — the on-disk form of the pq.py
pipeline, laid out so a 10^9-vector search engine actually works as a
TABLE, not a per-query recomputation:

- codes table: (vec_id, codes array<int>) parquet, PARTITIONED BY
  list_id (the IVF coarse assignment). A query probing n_probe of
  n_lists lists prunes to those PARTITION DIRECTORIES at the file
  level — the scan never opens the other lists' files (asserted in
  test_ann_index: PartitionFilters on list_id in the physical plan).
  This is the Spark-native equivalent of FAISS's IndexIVFPQ inverted
  lists: file pruning plays the posting-list seek.
- sidecar: centroids + codebooks as .npy plus a meta.json (atomic
  write-tmp+rename, same commit discipline as the fulltext index) —
  tiny driver-side artifacts shipped in UDF closures at query time.
- raw vectors stay in the SOURCE embeddings table; the exact-cosine
  refine is a point-lookup join of ~k*refine survivor ids against it
  (at scale: a bucketed/Z-ordered join on vec_id).

build once -> search many: the build is one training sample + two
map-only passes (assign, encode) + one partitioned write; each search
reads only probed partitions, ADC-scans m-byte codes with local top-k
pruning (pq._local_topk), and refines exactly.

Citation: Jegou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011 (IVFADC layout). Reference repo has no
ANN tier; this is part of the beyond-reference pipeline surface.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pq import _global_topk_candidates, _local_topk, pq_encode, pq_train
from .similarity import _dot, _norm, ivf_assignments


def build_ann_index(
    embeddings: DataFrame,
    out_dir: str,
    m: int = 4,
    n_codes: int = 16,
    n_lists: int = 16,
    seed: int = 7,
) -> dict:
    """Train + encode + write. Returns the committed meta dict."""
    centroids, assigned = ivf_assignments(embeddings, n_lists=n_lists, seed=seed)
    codebooks = pq_train(embeddings, m=m, n_codes=n_codes, seed=seed)
    codes = pq_encode(embeddings, codebooks).join(assigned, "vec_id")

    os.makedirs(out_dir, exist_ok=True)
    codes_dir = os.path.join(out_dir, "codes")
    codes.write.mode("overwrite").partitionBy("list_id").parquet(codes_dir)

    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    np.save(os.path.join(out_dir, "codebooks.npy"), codebooks)
    meta = {
        "m": m,
        "n_codes": n_codes,
        "n_lists": int(centroids.shape[0]),
        "dim": int(centroids.shape[1]),
        "seed": seed,
        "n_vectors": codes.count(),
    }
    tmp = os.path.join(out_dir, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=2)
    os.replace(tmp, os.path.join(out_dir, "meta.json"))
    return meta


def append_to_ann_index(
    embeddings_batch: DataFrame, index_dir: str
) -> dict:
    """Fold NEW vectors into an existing index WITHOUT retraining:
    assign + encode the batch with the saved centroids/codebooks (two
    map-only passes) and append its codes into the list_id partitions.
    This is the standard IVF ingestion contract (FAISS `add`): the
    quantizers are frozen at train time, so an appended vector lands
    exactly where a from-scratch encode with the same quantizers would
    put it — searches see old and new vectors identically (pytest:
    append == rebuild-with-same-quantizers, row for row).

    Cost ∝ batch size; the existing codes are never read or moved.
    Re-train (a fresh build) only when drift degrades recall — same
    maintenance trigger as any IVF deployment."""
    meta, centroids, codebooks = _load(index_dir)

    from pyspark.sql.pandas.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def assign_udf(embs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(e, dtype="float64") for e in embs])
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        return pd.Series((mat @ centroids.T).argmax(axis=1).astype("int64"))

    assigned = embeddings_batch.select(
        "vec_id", assign_udf("embedding").alias("list_id")
    )
    codes = pq_encode(embeddings_batch, codebooks).join(assigned, "vec_id")
    n_new = codes.count()
    codes.write.mode("append").partitionBy("list_id").parquet(
        os.path.join(index_dir, "codes")
    )
    meta["n_vectors"] = int(meta["n_vectors"]) + n_new
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=2)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))
    return meta


def _load(index_dir: str) -> tuple[dict, np.ndarray, np.ndarray]:
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    codebooks = np.load(os.path.join(index_dir, "codebooks.npy"))
    return meta, centroids, codebooks


def ann_index_search(
    spark: SparkSession,
    index_dir: str,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 4,
    refine_factor: int = 4,
) -> DataFrame:
    """(query_id, vec_id, score) top-k per query — ADC scan over the
    PROBED PARTITIONS ONLY of the persisted codes table, exact-cosine
    refine against the source embeddings. Same output contract as
    pq.ivf_pq_topk (scores exact, approximation picks candidates)."""
    meta, centroids, codebooks = _load(index_dir)
    m = int(meta["m"])
    sub = codebooks.shape[2]

    qrows = embeddings.filter(F.col("vec_id").isin(query_ids)).collect()
    luts: dict[int, np.ndarray] = {}
    probe_lists: dict[int, set] = {}
    for r in qrows:
        q = np.asarray(r["embedding"], dtype="float64")
        q = q / max(float(np.linalg.norm(q)), 1e-12)
        qid = int(r["vec_id"])
        luts[qid] = np.stack(
            [codebooks[j] @ q[j * sub:(j + 1) * sub] for j in range(m)]
        )
        probe_lists[qid] = {
            int(l) for l in np.argsort(-(centroids @ q))[:n_probe]
        }
    all_probed = sorted(set().union(*probe_lists.values())) if probe_lists else []

    n_cand = k * refine_factor
    pruned = probed_codes_scan(spark, index_dir, all_probed)

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            code_mat = np.array(list(pdf["codes"]), dtype="int64")
            vec_ids = pdf["vec_id"].to_numpy()
            list_ids = pdf["list_id"].to_numpy()
            outs = []
            for qid, lut in luts.items():
                keep = np.isin(list_ids, sorted(probe_lists[qid])) & (
                    vec_ids != qid
                )
                if not keep.any():
                    continue
                approx = lut[np.arange(m)[:, None], code_mat[keep].T].sum(axis=0)
                outs.append(_local_topk(qid, vec_ids[keep], approx, n_cand))
            if outs:
                yield pd.concat(outs)

    approx = pruned.mapInPandas(scan, "query_id long, vec_id long, approx double")
    cands = _global_topk_candidates(approx, n_cand)

    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    joined = cands.join(embeddings, "vec_id").join(F.broadcast(q), "query_id")
    sim = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        joined.select("query_id", "vec_id", F.round(sim, 6).alias("score"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "vec_id", "score")
    )


def probed_codes_scan(
    spark: SparkSession, index_dir: str, probed: list[int]
) -> DataFrame:
    """The pruned codes read — isolated so tests can assert the
    physical plan carries PartitionFilters on list_id (file-level
    pruning, the IVF seek)."""
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    return codes.filter(F.col("list_id").isin([int(p) for p in probed]))
