"""Property-based fuzz of the bucket scoring kernel: random posting
lists -> score_bucket_kernel must equal a brute-force Python BM25 over
the same postings, for both the conjunctive and the MaxScore paths,
across ties, tiny k, skewed dfs, and block boundaries. No Spark — the
kernel is pure (pandas in, pandas out)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from reiz_io_spark.functions import codec
from reiz_io_spark.operators.wand import score_bucket_kernel

K1, B, AVGDL = 1.2, 0.75, 25.0


def _build_blocks(term_postings: dict[str, list], block_size: int) -> pd.DataFrame:
    rows = []
    for term, postings in term_postings.items():
        postings = sorted(set(postings))
        if not postings:
            continue
        docs = np.array([p[0] for p in postings], dtype=np.int64)
        # dedup doc ids within a term (a doc appears once per term)
        uniq, idx = np.unique(docs, return_index=True)
        tfs = np.array([postings[i][1] for i in idx], dtype=np.int64)
        dls = np.array([postings[i][2] for i in idx], dtype=np.int64)
        for blk in codec.encode_term_blocks(uniq, tfs, dls, block_size):
            blk["term_id"] = _tid(term)
            rows.append(blk)
    pdf = pd.DataFrame(rows)
    pdf["qb"] = 0
    return pdf


def _tid(term: str) -> int:
    return hash(term) & 0x7FFFFFFFFFFFFFF  # stable within one process


def _idf(df: int, n_docs: int = 100) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def _brute_force(term_postings, groups, idf_by_term, k):
    by_term = {
        t: {d: (tf, dl) for d, tf, dl in sorted(set(ps))}
        for t, ps in term_postings.items()
    }
    # candidates: every group satisfied
    all_docs = set()
    for ps in by_term.values():
        all_docs.update(ps)
    out = []
    for d in all_docs:
        ok = all(any(d in by_term.get(t, {}) for t in g) for g in groups)
        if not ok:
            continue
        score = 0.0
        for t in sorted(idf_by_term):
            if d in by_term.get(t, {}):
                tf, dl = by_term[t][d]
                score += float(
                    codec.bm25_contrib(
                        np.array([tf]), np.array([dl]), idf_by_term[t],
                        AVGDL, K1, B,
                    )[0]
                )
        out.append((d, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


posting = st.tuples(
    st.integers(min_value=-(2**40), max_value=2**40),  # doc_id
    st.integers(min_value=1, max_value=9),  # tf
    st.integers(min_value=1, max_value=200),  # dl
)
term_lists = st.dictionaries(
    st.sampled_from(["ta", "tb", "tc", "td", "te"]),
    st.lists(posting, min_size=0, max_size=60),
    min_size=1,
    max_size=5,
)


@given(
    term_postings=term_lists,
    k=st.integers(min_value=1, max_value=8),
    block_size=st.sampled_from([2, 5, 128]),
    mode=st.sampled_from(["or", "and", "cnf"]),
)
@settings(max_examples=150, deadline=None)
def test_kernel_matches_brute_force(term_postings, k, block_size, mode):
    # normalize: one (tf, dl) per (term, doc) — a doc occurs once per
    # posting list; keep the lexicographically smallest entry
    term_postings = {
        t: [(d, tf, dl) for (d, (tf, dl)) in sorted(
            {p[0]: (p[1], p[2]) for p in sorted(ps, reverse=True)}.items()
        )]
        for t, ps in term_postings.items()
    }
    terms = sorted(term_postings)
    if mode == "or" or len(terms) == 1:
        groups = [tuple(terms)]
    elif mode == "and":
        groups = [(t,) for t in terms]
    else:  # mixed CNF: first two OR'd, rest conjunctive
        groups = [tuple(terms[:2])] + [(t,) for t in terms[2:]]
    pdf = _build_blocks(term_postings, block_size)
    dfs = {t: len({p[0] for p in ps}) for t, ps in term_postings.items()}
    idf_by_term = {t: _idf(max(df, 1)) for t, df in dfs.items() if df > 0}
    groups = [tuple(t for t in g) for g in groups]
    tid_of = {t: _tid(t) for t in terms}

    want = _brute_force(term_postings, groups, idf_by_term, k)
    if pdf.empty:
        assert want == []
        return
    got_df = score_bucket_kernel(
        pdf, groups, tid_of, idf_by_term, dfs, 63, k, AVGDL, K1, B
    )
    got = list(zip(got_df["doc_id"].astype(np.int64), got_df["score"]))
    # shift=63 -> bucket qb=0 covers doc_ids >= 0 only; restrict brute
    # force accordingly? No: qb=0 with shift 63 covers [0, 2^63-1]; our
    # doc_ids include negatives (bucket qb=-1). Run the kernel for both
    # buckets and merge, exactly like the Spark groupBy does.
    neg = pdf.copy()
    neg["qb"] = -1
    got_neg_df = score_bucket_kernel(
        neg, groups, tid_of, idf_by_term, dfs, 63, k, AVGDL, K1, B
    )
    got_all = got + list(
        zip(got_neg_df["doc_id"].astype(np.int64), got_neg_df["score"])
    )
    got_all.sort(key=lambda x: (-x[1], x[0]))
    got_all = got_all[:k]
    assert [(int(d), round(s, 12)) for d, s in got_all] == [
        (int(d), round(s, 12)) for d, s in want
    ]
