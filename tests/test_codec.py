"""Codec round-trip: property-based (the query-smith analog, SURVEY §5.2)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from reiz_io_spark.functions import codec


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(codec.varint_decode(codec.varint_encode(arr)), arr)


@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=500,
        unique=True,
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(doc_ids):
    arr = np.sort(np.array(doc_ids, dtype=np.int64))
    buf = codec.delta_encode_docids(arr)
    out = codec.delta_decode_docids(int(arr[0]), buf, len(arr))
    assert np.array_equal(out, arr)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.integers(min_value=1, max_value=10_000),
            st.integers(min_value=1, max_value=100_000),
        ),
        min_size=1,
        max_size=600,
    ),
    st.integers(min_value=1, max_value=128),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(postings, block_size):
    postings = sorted({p[0]: p for p in postings}.values())
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    dls = np.array([p[2] for p in postings], dtype=np.int64)
    blocks = codec.encode_term_blocks(docs, tfs, dls, block_size)
    got_docs, got_tfs, got_dls = [], [], []
    for blk in blocks:
        assert blk["n_docs"] <= block_size
        d, t, l = codec.decode_block(blk)
        assert blk["first_doc_id"] == d[0] and blk["last_doc_id"] == d[-1]
        assert blk["max_tf"] == t.max()
        assert blk["min_dl"] == l.min()
        # query-side bound must dominate every posting's contribution
        bound = codec.block_bound(blk["max_tf"], blk["min_dl"], 1.3, 80.0, 1.2, 0.75)
        contribs = codec.bm25_contrib(t, l, 1.3, 80.0, 1.2, 0.75)
        assert float(bound) >= contribs.max() - 1e-12
        got_docs.append(d)
        got_tfs.append(t)
        got_dls.append(l)
    assert np.array_equal(np.concatenate(got_docs), docs)
    assert np.array_equal(np.concatenate(got_tfs), tfs)
    assert np.array_equal(np.concatenate(got_dls), dls)


def test_varint_empty():
    assert codec.varint_encode(np.empty(0, np.uint64)) == b""
    assert codec.varint_decode(b"").size == 0
