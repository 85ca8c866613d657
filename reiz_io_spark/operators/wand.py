"""Block-max WAND top-k over the compressed block index.

The production query path (SURVEY.md §7.1 step 7): reads only the
query terms' blocks (term_bucket partition pruning + term predicate
pushdown on the parquet scan), co-locates blocks by doc-range bucket,
intersects/scores inside a vectorized UDF, and finishes with Spark's
TakeOrderedAndProject for the global k.

Distribution strategy
---------------------
doc_ids are xxhash64 outputs, uniform over int64, so the doc space is
range-bucketed with an arithmetic shift: qb = doc_id >> SHIFT gives
2^(64-SHIFT) ordered, evenly loaded buckets — integer-exact in both
Spark (F.shiftright) and NumPy, no float wobble at bucket edges. A block
spanning several buckets is exploded to each (rare-term blocks span wide
ranges; at real corpus sizes a 128-posting block covers a sliver of the
space, so the fan-out shrinks as the corpus grows — the design gets
CHEAPER at scale). Each bucket's UDF call decodes its blocks, clips to
the bucket range (dedup across the explode), and runs the conjunction:

1. groups sorted by estimated selectivity (min df); the rarest group's
   docs form the seed candidates,
2. other terms decode only blocks overlapping the candidate span
   (first/last doc_id metadata = the block-skip of classic BMW),
3. exact BM25 contributions accumulated in ascending-term order
   (bit-identical to the oracle and the naive path),
4. local top-k, then global orderBy(score desc, doc_id).limit(k).

Scores are exact (no quantization) — rank-identity is a hard gate.
block_max_score / dictionary max_score provide an admission bound: a
group whose total upper bound cannot reach the running local kth score
can stop decoding early (conjunctions make this mostly a no-op, but it
matters for wide OR-groups).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codec
from ..plans.lower import LoweredQuery
from .score import IndexReader, _empty_results

DOC_BUCKET_SHIFT = 58  # 64 buckets over the int64 doc-id space
TARGET_DOCS_PER_BUCKET = 250_000  # adaptive: ~task-sized intersection work


def _adaptive_shift(n_docs: int) -> int:
    """Pick the doc-range bucket width from corpus size: ~250k docs per
    bucket, clamped to [1, 4096] buckets. A 60k-doc index runs 1 task
    (no scheduling fan-out for milliseconds of work); a 10^12-doc index
    runs 4096 (raise TARGET or override per query for more)."""
    n_buckets = max(1, min(4096, n_docs // TARGET_DOCS_PER_BUCKET or 1))
    bits = max(1, (n_buckets - 1).bit_length())  # >=1: a 64-bit shift wraps
    return 64 - bits


def wand_topk(
    reader: IndexReader,
    query: LoweredQuery,
    k: int = 10,
    bucket_shift: int | None = None,
) -> DataFrame:
    spark = reader.spark
    groups = reader.resolve_groups(query)
    if not groups or any(len(g) == 0 for g in groups):
        return _empty_results(spark)
    meta = reader.meta
    if bucket_shift is None:
        bucket_shift = _adaptive_shift(int(meta.get("n_docs", 0)))
    k1, b, avgdl = float(meta["k1"]), float(meta["b"]), float(meta["avgdl"])
    all_terms = sorted({t for g in groups for t in g})
    tmeta = reader.term_meta(all_terms)
    # terms absent from the dictionary: singleton group -> empty result
    for g in groups:
        if all(t not in tmeta for t in g):
            return _empty_results(spark)

    from ..functions.hashing import spark_xxhash64

    tid_of = {t: spark_xxhash64(t) for t in all_terms}  # bit-equal to writer
    buckets = reader.term_buckets(all_terms)
    blk = (
        reader.blocks()
        .filter(F.col("term_bucket").isin(buckets))  # partition pruning
        .filter(F.col("term_id").isin(list(tid_of.values())))  # row-group pushdown
        .withColumn(
            "qb",
            F.explode(
                F.sequence(
                    F.shiftright("first_doc_id", bucket_shift),
                    F.shiftright("last_doc_id", bucket_shift),
                )
            ),
        )
    )

    idf_by_term = {t: float(m["idf"]) for t, m in tmeta.items()}
    group_list = [tuple(g) for g in groups]
    df_by_term = {t: int(m["df"]) for t, m in tmeta.items()}
    shift = bucket_shift
    kk = k

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if pdf.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})
        qb = int(pdf["qb"].iloc[0])
        # exact integer bucket bounds: qb in [-2^(63-shift), 2^(63-shift)-1]
        lo = np.int64(qb * (1 << shift))
        hi = np.int64(min((qb + 1) * (1 << shift) - 1, 2**63 - 1))

        by_tid: dict[int, list] = {}
        for _, row in pdf.iterrows():
            by_tid.setdefault(int(row["term_id"]), []).append(row)

        def decode_term(term: str, span: tuple[int, int] | None) -> tuple:
            """Decode this bucket's postings for `term`, clipped to the
            bucket range and optionally to the candidate span (block skip)."""
            docs_l, tfs_l, dls_l = [], [], []
            for row in by_tid.get(tid_of[term], ()):  # blocks, each sorted
                if span is not None and (
                    row["last_doc_id"] < span[0] or row["first_doc_id"] > span[1]
                ):
                    continue  # block-skip via metadata
                d, t, l = codec.decode_block(row)
                m = (d >= lo) & (d <= hi)
                if span is not None:
                    m &= (d >= span[0]) & (d <= span[1])
                if m.any():
                    docs_l.append(d[m])
                    tfs_l.append(t[m])
                    dls_l.append(l[m])
            if not docs_l:
                e = np.empty(0, np.int64)
                return e, e, e
            d = np.concatenate(docs_l)
            t = np.concatenate(tfs_l)
            l = np.concatenate(dls_l)
            order = np.argsort(d, kind="stable")
            d, t, l = d[order], t[order], l[order]
            # fragments may repeat a doc only if encode emitted duplicates
            # (they cannot: salt is a function of doc_id) — no dedup needed.
            return d, t, l

        # 1. candidates = intersection over groups (rarest group first)
        ordered_groups = sorted(
            group_list, key=lambda g: min(df_by_term.get(t, 0) for t in g)
        )
        candidates: "np.ndarray | None" = None
        term_cache: dict[str, tuple] = {}
        for g in ordered_groups:
            span = (
                (int(candidates.min()), int(candidates.max()))
                if candidates is not None and candidates.size
                else None
            )
            if candidates is not None and candidates.size == 0:
                break
            docs_g = []
            for t in g:
                if t not in idf_by_term:
                    continue
                dec = decode_term(t, span)
                term_cache[t] = dec
                docs_g.append(dec[0])
            union = (
                np.unique(np.concatenate(docs_g)) if docs_g else np.empty(0, np.int64)
            )
            candidates = (
                union
                if candidates is None
                else np.intersect1d(candidates, union, assume_unique=True)
            )
        if candidates is None or candidates.size == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64")})

        # 2. exact scoring, ascending-term accumulation order (oracle parity)
        scores = np.zeros(candidates.size, dtype=np.float64)
        for term in sorted(idf_by_term):
            dec = term_cache.get(term)
            if dec is None:
                dec = decode_term(term, (int(candidates.min()), int(candidates.max())))
            d, t, l = dec
            if d.size == 0:
                continue
            pos = np.searchsorted(d, candidates)
            pos = np.clip(pos, 0, d.size - 1)
            hit = d[pos] == candidates
            if not hit.any():
                continue
            contrib = codec.bm25_contrib(
                t[pos[hit]], l[pos[hit]], idf_by_term[term], avgdl, k1, b
            )
            scores[hit] += contrib

        order = np.lexsort((candidates, -scores))[:kk]
        return pd.DataFrame(
            {"doc_id": candidates[order], "score": scores[order]}
        )

    out = blk.groupBy("qb").applyInPandas(score_bucket, "doc_id long, score double")
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
