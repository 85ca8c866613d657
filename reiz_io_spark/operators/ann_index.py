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
    """Train + encode + write a FRESH index. Returns the committed meta.

    Commit discipline (r6): build refuses a directory that already has
    a committed meta.json — a rebuild there would overwrite
    codes/seg-00000 and the quantizer sidecars IN PLACE, segments and
    files the live meta references, so concurrent readers could see
    torn scans or a codes/codebook mismatch (the append/compact paths
    never do this; they write unreferenced directories and flip meta
    atomically). Re-train into a fresh directory and swap the path —
    or grow an existing index with append_to_ann_index (frozen
    quantizers). Sidecars are written write-tmp + os.replace so even
    the fresh-dir build has no torn-file window.

    The encode pipeline executes exactly ONCE — as the segment write.
    n_vectors comes from the written parquet's footer metadata (a
    count over committed files is metadata-only), never from a second
    evaluation of the encode DataFrame (the r04 layout paid the whole
    UDF pass twice: once for the write, once for .count())."""
    if os.path.exists(os.path.join(out_dir, "meta.json")):
        raise ValueError(
            f"build_ann_index: {out_dir} already holds a committed index "
            "(meta.json present). Re-train into a FRESH directory (an "
            "in-place rebuild would tear concurrent readers), or use "
            "append_to_ann_index to add vectors under the frozen "
            "quantizers."
        )
    if embeddings.isEmpty():
        raise ValueError(
            "build_ann_index: embeddings input is empty — an IVF-PQ "
            "index trains its quantizers from the data. Build from a "
            "non-empty batch; later increments (including empty ones, "
            "which no-op) go through append_to_ann_index."
        )
    centroids, assigned = ivf_assignments(embeddings, n_lists=n_lists, seed=seed)
    codebooks = pq_train(embeddings, m=m, n_codes=n_codes, seed=seed)
    codes = pq_encode(embeddings, codebooks).join(assigned, "vec_id")

    os.makedirs(os.path.join(out_dir, "codes"), exist_ok=True)
    seg = "seg-00000"
    seg_dir = os.path.join(out_dir, "codes", seg)
    codes.write.mode("overwrite").partitionBy("list_id").parquet(seg_dir)
    # explicit schema, same as the append path: metadata-only count
    # that cannot trip over schema inference edge cases
    n_vectors = (
        embeddings.sparkSession.read
        .schema("vec_id long, codes array<int>, list_id int")
        .parquet(seg_dir).count()
    )

    _save_sidecar_atomic(os.path.join(out_dir, "centroids.npy"), centroids)
    _save_sidecar_atomic(os.path.join(out_dir, "codebooks.npy"), codebooks)
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


def _save_sidecar_atomic(path: str, arr: np.ndarray) -> None:
    """np.save via write-tmp + os.replace: a concurrent _load never
    reads a torn .npy (np.save writes in place and is not atomic)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.save(fh, arr)
    os.replace(tmp, path)


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
        # a vec_id with a PENDING tombstone must not be re-appended: the
        # scan masks the id, so the new codes would be silently
        # invisible (and after a later compaction BOTH rows would be
        # dropped). Re-embedding a vector = delete_vectors ->
        # compact_ann_deletes -> append; the error says so.
        pending = pending_vector_ids(index_dir, meta)
        if pending is not None and pending.size:
            dead = embeddings_batch.select("vec_id").join(
                embeddings_batch.sparkSession.createDataFrame(
                    [(int(v),) for v in pending.tolist()], "vec_id long"
                ),
                "vec_id", "left_semi",
            ).take(1)
            if dead:
                raise RuntimeError(
                    f"append_to_ann_index: batch contains vec_ids with "
                    f"PENDING tombstones (e.g. {dead[0]['vec_id']}) — "
                    f"their new codes would be masked by the ledger; "
                    f"run compact_ann_deletes first (clears the ledger), "
                    f"or undelete_vectors if the delete was a mistake"
                )
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
    query_vectors: dict[int, list[float]] | None = None,
) -> DataFrame:
    """(query_id, vec_id, score) top-k per query — ADC scan over the
    PROBED PARTITIONS ONLY of the persisted codes table, exact-cosine
    refine against the source embeddings. Same output contract as
    pq.ivf_pq_topk (scores exact, approximation picks candidates).

    Query vectors resolve with AT MOST ONE embeddings pass per call —
    pass `query_vectors` (the serving case: the caller just encoded
    the query) and the call touches the embeddings table only for the
    broadcast-pinned candidate refine; with ids only, one point-lookup
    is collected and reused for both the LUT build and the refine's
    query side (the r5 layout scanned twice — pq.resolve_query_vectors)."""
    from .pq import query_frame, resolve_query_vectors

    meta, centroids, codebooks = _load(index_dir)
    m = int(meta["m"])
    sub = codebooks.shape[2]

    qvecs = resolve_query_vectors(embeddings, query_ids, query_vectors)
    luts: dict[int, np.ndarray] = {}
    probe_lists: dict[int, set] = {}
    for qid, raw in qvecs.items():
        q = raw / max(float(np.linalg.norm(raw)), 1e-12)
        luts[qid] = np.stack(
            [codebooks[j] @ q[j * sub:(j + 1) * sub] for j in range(m)]
        )
        probe_lists[qid] = {
            int(l) for l in np.argsort(-(centroids @ q))[:n_probe]
        }
    all_probed = sorted(set().union(*probe_lists.values())) if probe_lists else []

    n_cand = k * refine_factor
    pruned = probed_codes_scan(spark, index_dir, all_probed)
    # pending vector deletes (delete_vectors): masked inside the ADC
    # scan, so tombstoned vectors never become candidates and the exact
    # refine (downstream of the candidates) is delete-free too
    excl = pending_vector_ids(index_dir, meta)

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            code_mat = np.array(list(pdf["codes"]), dtype="int64")
            vec_ids = pdf["vec_id"].to_numpy()
            list_ids = pdf["list_id"].to_numpy()
            live = None
            if excl is not None and excl.size:
                pos = np.searchsorted(excl, vec_ids)
                pos[pos == excl.size] = 0
                live = excl[pos] != vec_ids
            outs = []
            for qid, lut in luts.items():
                keep = np.isin(list_ids, sorted(probe_lists[qid])) & (
                    vec_ids != qid
                )
                if live is not None:
                    keep &= live
                if not keep.any():
                    continue
                approx = lut[np.arange(m)[:, None], code_mat[keep].T].sum(axis=0)
                outs.append(_local_topk(qid, vec_ids[keep], approx, n_cand))
            if outs:
                yield pd.concat(outs)

    approx = pruned.mapInPandas(scan, "query_id long, vec_id long, approx double")
    cands = _global_topk_candidates(approx, n_cand)

    q = query_frame(spark, qvecs)
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


def gc_ann_index(
    index_dir: str, max_age_seconds: float | None = None
) -> list[str]:
    """Delete code segment directories not referenced by the current
    meta snapshot — superseded generations from a past compaction and
    orphans from crashed appends. Returns the deleted directory names.

    Two modes:
    - max_age_seconds=None (compaction path): delete every
      unreferenced segment. Safe ONLY under the append lock (a live
      append's staging directory is unreferenced too) — this is how
      compact_ann_index calls it, with grace already expired.
    - max_age_seconds=N (explicit `gc-ann` CLI, any time): delete only
      unreferenced segments whose newest file is older than N seconds.
      An in-flight append's staging dir is young by construction, so
      this bounds orphan retention in WALL TIME without waiting for
      the next compaction (the one-cycle grace alone was unbounded —
      a crashed append's orphan lived until someone compacted)."""
    import shutil
    import time

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
    if max_age_seconds is not None:
        now = time.time()
        old_enough = []
        for n in dead:
            p = os.path.join(codes_dir, n)
            try:
                # newest mtime under the whole tree: a writer touching
                # ANY file inside keeps the segment alive
                mt = _newest_mtime(p)
            except OSError:
                continue
            if now - mt > max_age_seconds:
                old_enough.append(n)
        dead = old_enough
    for n in dead:
        shutil.rmtree(os.path.join(codes_dir, n), ignore_errors=True)
    return dead


def _newest_mtime(path: str) -> float:
    """Newest mtime of the directory tree (dir entries + files)."""
    newest = os.path.getmtime(path)
    for root, dirs, files in os.walk(path):
        for name in dirs + files:
            try:
                newest = max(
                    newest, os.path.getmtime(os.path.join(root, name))
                )
            except OSError:
                pass
    return newest


# -- vector deletion: tombstones + compaction (the fulltext tier's ----------
# -- live-docs discipline, adapted to the segment layout) -------------------

ANN_MAX_PENDING = 4_000_000  # same closure-size pragmatics as deletes.py


def _ann_tombstones_path(index_dir: str, meta: dict) -> str | None:
    name = meta.get("ann_tombstones")
    return os.path.join(index_dir, name) if name else None


def pending_vector_ids(index_dir: str, meta: dict | None = None) -> np.ndarray | None:
    """Sorted int64 array of tombstoned vec_ids for the scan-time mask,
    or None. Unlike the fulltext ledger there is no folded tier: ANN
    compaction physically removes the code rows AND the ledger (codes
    are self-contained — nothing append-only can resurrect them), so a
    deleted vec_id can later be legitimately re-appended."""
    if meta is None:
        with open(os.path.join(index_dir, "meta.json")) as fh:
            meta = json.load(fh)
    p = _ann_tombstones_path(index_dir, meta)
    if p is None:
        return None
    arr = np.load(p)
    if arr.size > ANN_MAX_PENDING:
        raise RuntimeError(
            f"{arr.size} pending vector deletes exceed the scan-closure "
            f"budget ({ANN_MAX_PENDING}) — run compact_ann_deletes"
        )
    return arr


def delete_vectors(index_dir: str, vec_ids: list[int]) -> dict:
    """Tombstone vectors: committed as a sorted .npy ledger + atomic
    meta flip under the append lock (serializes with append/compact).
    Deleted vectors vanish from every search immediately; surviving
    scores are unchanged (the ADC scan just skips them; the exact
    refine only sees surviving candidates). Idempotent: re-deleting
    already-pending ids changes nothing."""
    lock = os.path.join(index_dir, "append.lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise ConcurrentAppendError(
            f"append/compaction in progress on {index_dir}"
        ) from None
    try:
        with open(os.path.join(index_dir, "meta.json")) as fh:
            meta = json.load(fh)
        old = pending_vector_ids(index_dir, meta)
        ids = np.array(sorted(set(int(v) for v in vec_ids)), dtype=np.int64)
        merged = (
            np.union1d(old, ids) if old is not None else ids
        )
        if old is not None and merged.size == old.size:
            return meta  # nothing new — no version churn
        version = int(meta.get("version", 1)) + 1
        name = f"ann_tombstones_v{version}.npy"
        _save_sidecar_atomic(os.path.join(index_dir, name), merged)
        prev = meta.get("ann_tombstones")
        meta["ann_tombstones"] = name
        meta["n_deleted_pending"] = int(merged.size)
        meta["version"] = version
        _write_meta_atomic(index_dir=index_dir, meta=meta)
        _gc_ann_tombstones(index_dir, keep={name} | ({prev} if prev else set()))
        return meta
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


def undelete_vectors(index_dir: str, vec_ids: list[int]) -> dict:
    """Drop PENDING tombstones — the vectors reappear immediately
    (their codes were never touched). After compact_ann_deletes the
    rows are physically gone; restoring then means re-appending the
    embeddings (append_to_ann_index), which works because the ledger
    is cleared at compaction."""
    lock = os.path.join(index_dir, "append.lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise ConcurrentAppendError(
            f"append/compaction in progress on {index_dir}"
        ) from None
    try:
        with open(os.path.join(index_dir, "meta.json")) as fh:
            meta = json.load(fh)
        old = pending_vector_ids(index_dir, meta)
        if old is None:
            return meta
        drop = np.array(sorted(set(int(v) for v in vec_ids)), dtype=np.int64)
        merged = np.setdiff1d(old, drop)
        if merged.size == old.size:
            return meta
        version = int(meta.get("version", 1)) + 1
        prev = meta.get("ann_tombstones")
        if merged.size:
            name = f"ann_tombstones_v{version}.npy"
            _save_sidecar_atomic(os.path.join(index_dir, name), merged)
            meta["ann_tombstones"] = name
        else:
            name = None
            meta.pop("ann_tombstones", None)
        meta["n_deleted_pending"] = int(merged.size)
        meta["version"] = version
        _write_meta_atomic(index_dir=index_dir, meta=meta)
        keep = {prev} if prev else set()
        if name:
            keep.add(name)
        _gc_ann_tombstones(index_dir, keep=keep)
        return meta
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass


def _gc_ann_tombstones(index_dir: str, keep: set) -> None:
    import re

    pat = re.compile(r"^ann_tombstones_v\d+\.npy$")
    for nm in os.listdir(index_dir):
        if pat.match(nm) and nm not in keep:
            try:
                os.remove(os.path.join(index_dir, nm))
            except OSError:
                pass


def compact_ann_deletes(spark: SparkSession, index_dir: str) -> dict:
    """Physically fold pending vector deletes: all committed segments
    rewritten as ONE segment minus the tombstoned rows, ledger cleared,
    n_vectors recounted — after this the index is content-identical to
    one built without the deleted vectors (pytest-gated), and deleted
    vec_ids may be re-appended. Same commit discipline as
    compact_ann_index (new unreferenced segment, one meta flip,
    one-cycle deferred GC of superseded segments)."""
    lock = os.path.join(index_dir, "append.lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
    except FileExistsError:
        raise ConcurrentAppendError(
            f"append/compaction in progress on {index_dir}"
        ) from None
    try:
        with open(os.path.join(index_dir, "meta.json")) as fh:
            meta = json.load(fh)
        pending = pending_vector_ids(index_dir, meta)
        if pending is None or pending.size == 0:
            return meta
        merged = None
        for seg_dir in _segment_dirs(index_dir, meta):
            df = spark.read.schema(
                "vec_id long, codes array<int>, list_id int"
            ).parquet(seg_dir)
            merged = df if merged is None else merged.unionByName(df)
        dead = spark.createDataFrame(
            [(int(v),) for v in pending.tolist()], "vec_id long"
        )
        survivors = merged.join(F.broadcast(dead), "vec_id", "left_anti")
        segs = meta.get("segments", [])
        nums = [int(s.split("-")[1]) for s in segs if s.startswith("seg-")]
        new_seg = f"seg-{(max(nums) + 1 if nums else 0):05d}"
        new_dir = os.path.join(index_dir, "codes", new_seg)
        (
            survivors.withColumn("list_id", F.col("list_id").cast("int"))
            .write.mode("overwrite").partitionBy("list_id").parquet(new_dir)
        )
        n_live = (
            spark.read.schema("vec_id long, codes array<int>, list_id int")
            .parquet(new_dir).count()
        )
        prev_ledger = meta.get("ann_tombstones")
        meta["segments"] = [new_seg]
        meta["n_vectors"] = int(n_live)
        meta.pop("ann_tombstones", None)
        meta["n_deleted_pending"] = 0
        meta["version"] = int(meta.get("version", 1)) + 1
        _write_meta_atomic(index_dir=index_dir, meta=meta)
        if prev_ledger:
            # ledger GC: keep nothing (cleared); superseded segments get
            # the usual one-cycle grace via the next gc/compact
            _gc_ann_tombstones(index_dir, keep=set())
        return meta
    finally:
        try:
            os.remove(lock)
        except OSError:
            pass
