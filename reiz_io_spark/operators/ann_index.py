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
- codes live in SEGMENT directories (codes/seg-00000, seg-00001, ...),
  one per build/append batch, each list_id-partitioned inside. A
  segment is visible to readers ONLY once listed in meta.json, and the
  meta flip is write-tmp + os.replace — the same snapshot-commit
  discipline as the fulltext index (build.py:89-111). An append that
  dies mid-write leaves an unreferenced directory, never a torn read;
  a concurrent-append guard (O_EXCL lock file) serializes writers.
- sidecar: centroids + codebooks as .npy plus the meta.json — tiny
  driver-side artifacts shipped in UDF closures at query time.
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
    """Train + encode + write. Returns the committed meta dict.

    The encode pipeline executes exactly ONCE — as the segment write.
    n_vectors comes from the written parquet's footer metadata (a
    count over committed files is metadata-only), never from a second
    evaluation of the encode DataFrame (the r04 layout paid the whole
    UDF pass twice: once for the write, once for .count())."""
    centroids, assigned = ivf_assignments(embeddings, n_lists=n_lists, seed=seed)
    codebooks = pq_train(embeddings, m=m, n_codes=n_codes, seed=seed)
    codes = pq_encode(embeddings, codebooks).join(assigned, "vec_id")

    os.makedirs(os.path.join(out_dir, "codes"), exist_ok=True)
    seg = "seg-00000"
    seg_dir = os.path.join(out_dir, "codes", seg)
    codes.write.mode("overwrite").partitionBy("list_id").parquet(seg_dir)
    n_vectors = embeddings.sparkSession.read.parquet(seg_dir).count()

    np.save(os.path.join(out_dir, "centroids.npy"), centroids)
    np.save(os.path.join(out_dir, "codebooks.npy"), codebooks)
    meta = {
        "version": 1,
        "m": m,
        "n_codes": n_codes,
        "n_lists": int(centroids.shape[0]),
        "dim": int(centroids.shape[1]),
        "seed": seed,
        "n_vectors": n_vectors,
        "segments": [seg],
    }
    _write_meta_atomic(index_dir=out_dir, meta=meta)
    return meta


def _write_meta_atomic(index_dir: str, meta: dict) -> None:
    """The commit point — write-tmp + os.replace, the same atomic-flip
    pattern as the fulltext index (build.py:89-111). Isolated so the
    crash tests can kill the append one instruction before commit."""
    tmp = os.path.join(index_dir, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=2)
    os.replace(tmp, os.path.join(index_dir, "meta.json"))


class ConcurrentAppendError(RuntimeError):
    """A second appender found the index's append lock held."""


def append_to_ann_index(
    embeddings_batch: DataFrame, index_dir: str
) -> dict:
    """Fold NEW vectors into an existing index WITHOUT retraining:
    assign + encode the batch with the saved centroids/codebooks (two
    map-only passes) written as a NEW segment directory. This is the
    standard IVF ingestion contract (FAISS `add`): the quantizers are
    frozen at train time, so an appended vector lands exactly where a
    from-scratch encode with the same quantizers would put it —
    searches see old and new vectors identically (pytest:
    append == rebuild-with-same-quantizers, row for row).

    Commit discipline: the segment is written FIRST, to a directory no
    reader references; only then is meta.json flipped (atomic
    os.replace) to list it and bump the version. A crash at any point
    before the flip leaves readers on the previous snapshot — the
    orphan segment directory is invisible (kill-during-append test).
    An O_EXCL lock file serializes concurrent appenders
    (ConcurrentAppendError rather than interleaved meta updates).

    Cost ∝ batch size; the existing codes are never read or moved.
    n_vectors comes from the written files' footers — the encode
    executes once, as the write. Re-train (a fresh build) only when
    drift degrades recall — same maintenance trigger as any IVF
    deployment."""
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

    lock = os.path.join(index_dir, "append.lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise ConcurrentAppendError(
            f"append already in progress on {index_dir} ({lock} held); "
            "retry when it completes, or remove the lock if its owner "
            "crashed"
        ) from None
    try:
        # re-read meta under the lock: another append may have committed
        # between our _load and the lock acquisition
        with open(os.path.join(index_dir, "meta.json")) as fh:
            meta = json.load(fh)
        segs = meta.get("segments", [])
        nums = [int(s.split("-")[1]) for s in segs if s.startswith("seg-")]
        seg = f"seg-{(max(nums) + 1 if nums else len(segs)):05d}"
        seg_dir = os.path.join(index_dir, "codes", seg)
        codes.write.mode("overwrite").partitionBy("list_id").parquet(seg_dir)
        # explicit schema: an EMPTY batch writes a part-file-less dir
        # whose schema can't be inferred — with the schema the count is
        # simply 0 and the segment is dropped instead of committed (a
        # schema-less dir in meta would break every later scan)
        n_new = (
            embeddings_batch.sparkSession.read
            .schema("vec_id long, codes array<int>, list_id int")
            .parquet(seg_dir).count()
        )
        if n_new == 0:
            import shutil

            shutil.rmtree(seg_dir, ignore_errors=True)
            return meta  # nothing to commit; meta/version unchanged
        meta["n_vectors"] = int(meta["n_vectors"]) + n_new
        meta["segments"] = segs + [seg]
        meta["version"] = int(meta.get("version", 1)) + 1
        _write_meta_atomic(index_dir=index_dir, meta=meta)
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass
    return meta


def _load(index_dir: str) -> tuple[dict, np.ndarray, np.ndarray]:
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    centroids = np.load(os.path.join(index_dir, "centroids.npy"))
    codebooks = np.load(os.path.join(index_dir, "codebooks.npy"))
    return meta, centroids, codebooks


def _segment_dirs(index_dir: str, meta: dict) -> list[str]:
    """Committed code directories for this meta snapshot. A pre-segment
    (r04) index has no `segments` key and stores codes flat under
    codes/ — still readable."""
    segs = meta.get("segments")
    if segs is None:
        return [os.path.join(index_dir, "codes")]
    return [os.path.join(index_dir, "codes", s) for s in segs]


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
    # candidate set is k*refine_factor*|queries| rows — BROADCAST it
    # so the (possibly 10^9-row) embeddings table is probed in place,
    # never shuffled for the refine (plan-asserted in test_plans)
    joined = (
        F.broadcast(cands)
        .join(embeddings, "vec_id")
        .join(F.broadcast(q), "query_id")
    )
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
    pruning, the IVF seek). Reads ONLY the segments committed in the
    current meta snapshot (union of per-segment scans — each scan gets
    its own partition discovery + PartitionFilters; an in-flight
    append's staging directory is invisible here by construction)."""
    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    probe_ids = [int(p) for p in probed]
    out = None
    for seg_dir in _segment_dirs(index_dir, meta):
        df = spark.read.parquet(seg_dir).filter(
            F.col("list_id").isin(probe_ids)
        )
        out = df if out is None else out.unionByName(df)
    return out


def compact_ann_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold all committed segments into ONE (the maintenance move after
    many appends: per-search file-listing cost is O(segments), and
    small append segments fragment the list_id partition layout).

    Pure code movement — rows are copied, nothing is re-encoded (the
    quantizers are frozen, so the codes are already final). Commit
    discipline mirrors append: merged segment written to an
    unreferenced directory, meta flipped atomically to reference only
    it; the superseded segments are GC'd with a ONE-CYCLE grace (at
    the start of the next compaction) so in-flight readers planned
    against the previous snapshot can finish — the same
    deferred-GC policy as the streaming rollup. Serializes with
    appenders via the same O_EXCL lock, so a concurrent append's
    not-yet-committed segment can never be folded or GC'd mid-write."""
    lock = os.path.join(index_dir, "append.lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise ConcurrentAppendError(
            f"append/compaction already in progress on {index_dir}"
        ) from None
    try:
        gc_ann_index(index_dir)  # grace expired for the previous cycle
        with open(os.path.join(index_dir, "meta.json")) as fh:
            meta = json.load(fh)
        segs = meta.get("segments")
        if segs is None or len(segs) <= 1:
            return meta  # legacy layout or already compact
        merged = None
        for seg_dir in _segment_dirs(index_dir, meta):
            df = spark.read.parquet(seg_dir)
            merged = df if merged is None else merged.unionByName(df)
        nums = [int(s.split("-")[1]) for s in segs if s.startswith("seg-")]
        new_seg = f"seg-{max(nums) + 1:05d}"
        new_dir = os.path.join(index_dir, "codes", new_seg)
        (
            merged.withColumn("list_id", F.col("list_id").cast("int"))
            .write.mode("overwrite").partitionBy("list_id").parquet(new_dir)
        )
        meta["segments"] = [new_seg]
        meta["version"] = int(meta.get("version", 1)) + 1
        _write_meta_atomic(index_dir=index_dir, meta=meta)
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass
    return meta


def gc_ann_index(index_dir: str) -> list[str]:
    """Delete code segment directories not referenced by the current
    meta snapshot — superseded generations from a past compaction and
    orphans from crashed appends. Called under the append lock (from
    compact_ann_index) or explicitly when no writer is active.
    Returns the deleted directory names."""
    import shutil

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    segs = meta.get("segments")
    if segs is None:
        return []  # legacy flat layout: nothing segment-shaped to GC
    codes_dir = os.path.join(index_dir, "codes")
    try:
        on_disk = [n for n in os.listdir(codes_dir) if n.startswith("seg-")]
    except OSError:
        return []
    dead = sorted(set(on_disk) - set(segs))
    for n in dead:
        shutil.rmtree(os.path.join(codes_dir, n), ignore_errors=True)
    return dead
