"""Posting-list block codec: delta + varint (LEB128), pure NumPy.

The reference has no index codec (storage is delegated to EdgeDB /
PostgreSQL, reiz/database.py:5-11); the north rule requires
"delta-encoded with varint/PForDelta-style block compression plus
per-block max-score metadata". Everything here is vectorized byte-math
on arrays (shift/mask matrices) — zero per-row Python, per SURVEY.md
§7.4 — because this runs inside Arrow-batched UDFs on the hot path of a
10^12-file index build.

Layout per block (<= BLOCK_SIZE postings of one term, sorted by doc_id):
- metadata columns: first_doc_id, last_doc_id, n_docs, max_tf,
  block_max_score (exact BM25 upper bound for the block)
- ``doc_deltas``: varint(delta(doc_ids)[1:]) — first doc is metadata
- ``tfs``:        varint(tf)
- ``dls``:        varint(doclen) — carried per posting so query-time
  scoring is join-free (no 10^12-row docs-table lookup per candidate)

doc_ids are signed int64 (xxhash64 output); deltas of a signed-sorted
sequence are computed in uint64 (mod-2^64 wraparound), which round-trips
exactly via cumulative sum + int64 reinterpretation.
"""

from __future__ import annotations

import numpy as np

_U7 = np.uint64(7)
_MASK = np.uint64(0x7F)
_CONT = np.uint8(0x80)
_MAXB = 10  # ceil(64/7)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64/int64 array (vectorized, no Python loop
    over elements — the constant 10-iteration loop is over byte slots)."""
    v = np.ascontiguousarray(values).view(np.uint64) if values.dtype == np.int64 else values.astype(np.uint64, copy=False)
    n = v.size
    if n == 0:
        return b""
    parts = np.empty((n, _MAXB), dtype=np.uint8)
    tmp = v.copy()
    for i in range(_MAXB):
        parts[:, i] = (tmp & _MASK).astype(np.uint8)
        tmp >>= _U7
    nonzero = parts != 0
    lengths = np.where(v == 0, 1, _MAXB - np.argmax(nonzero[:, ::-1], axis=1))
    cont_mask = np.arange(_MAXB) < (lengths - 1)[:, None]
    parts = parts | (cont_mask.astype(np.uint8) << 7)
    keep = np.arange(_MAXB) < lengths[:, None]
    return parts[keep].tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 stream to uint64 (vectorized via reduceat)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    value_id = np.cumsum(is_last) - is_last  # 0-based id of value each byte belongs to
    pos = np.arange(b.size) - starts[value_id]
    shifted = (b & 0x7F).astype(np.uint64) << (pos.astype(np.uint64) * _U7)
    return np.bitwise_or.reduceat(shifted, starts)


def delta_encode_docids(doc_ids: np.ndarray) -> bytes:
    """Sorted int64 doc_ids -> varint bytes of the gaps (first omitted)."""
    u = doc_ids.astype(np.int64).view(np.uint64)
    return varint_encode(np.diff(u))


def delta_decode_docids(first_doc_id: int, buf: bytes, n_docs: int) -> np.ndarray:
    out = np.empty(n_docs, dtype=np.uint64)
    out[0] = np.array([first_doc_id], dtype=np.int64).view(np.uint64)[0]
    if n_docs > 1:
        out[1:] = varint_decode(buf)
        out = np.cumsum(out, dtype=np.uint64)
    return out.view(np.int64)


def bm25_contrib(
    tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float, k1: float, b: float
) -> np.ndarray:
    """Exact per-posting BM25 contribution, float64, fixed expression
    order (identical to the oracle's — rank-identity depends on bitwise
    agreement, SURVEY.md §7.4)."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (1.0 + k1)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def encode_term_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    idf: float,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int,
) -> list[dict]:
    """Chunk one term's sorted postings into compressed blocks."""
    n = doc_ids.size
    blocks = []
    for start in range(0, n, block_size):
        end = min(start + block_size, n)
        d = doc_ids[start:end]
        t = tfs[start:end]
        l = dls[start:end]
        scores = bm25_contrib(t, l, idf, avgdl, k1, b)
        blocks.append(
            {
                "block_no": start // block_size,
                "first_doc_id": int(d[0]),
                "last_doc_id": int(d[-1]),
                "n_docs": int(end - start),
                "max_tf": int(t.max()),
                "block_max_score": float(scores.max()),
                "doc_deltas": delta_encode_docids(d),
                "tfs": varint_encode(t.astype(np.uint64)),
                "dls": varint_encode(l.astype(np.uint64)),
            }
        )
    return blocks


def decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """blocks-table row -> (doc_ids int64, tfs int64, dls int64)."""
    n = int(row["n_docs"])
    docs = delta_decode_docids(int(row["first_doc_id"]), row["doc_deltas"], n)
    tfs = varint_decode(row["tfs"]).view(np.int64)
    dls = varint_decode(row["dls"]).view(np.int64)
    return docs, tfs, dls
