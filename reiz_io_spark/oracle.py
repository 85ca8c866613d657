"""Single-node golden BM25 oracle (tests only — never runs on Spark).

The analog of the reference's golden-output harness
(/root/reference/tests/runner.py:204-226): an independent, exhaustive
implementation that the distributed engine must match rank-for-rank,
score-for-score.

Float determinism contract shared with the engine (SURVEY.md §7.4):
- idf = np.log(1 + (N - df + 0.5)/(df + 0.5)) — numpy log in BOTH paths
  (JVM Math.log can differ from libm by ulps).
- avgdl = total_dl / N with INTEGER sums, divided once in float64.
- per-posting contribution evaluated with the exact expression
  idf * (tf * (1+k1)) / (tf + k1 * (1 - b + b * (dl / avgdl)))
- per-doc score accumulated in ascending-term order, float64.
- ties broken by ascending doc_id.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass

import numpy as np

from . import BM25_B, BM25_K1
from .functions.tokenizer import tokenize_source
from .plans.lower import LoweredQuery, expand_groups


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]]  # term -> {doc_id: tf}
    doclen: dict[int, int]
    n_docs: int
    total_dl: int

    @property
    def avgdl(self) -> float:
        return self.total_dl / self.n_docs

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))


def build_oracle_index(docs: list[tuple[int, str]]) -> OracleIndex:
    """docs: [(doc_id, content)] — python files only (pre-sanitized)."""
    postings: dict[str, dict[int, int]] = {}
    doclen: dict[int, int] = {}
    n_docs = 0
    total_dl = 0
    for doc_id, content in docs:
        bag, ok = tokenize_source(content)
        if not ok:
            continue
        dl = int(sum(bag.values()))
        n_docs += 1
        total_dl += dl
        doclen[doc_id] = dl
        for term, tf in bag.items():
            postings.setdefault(term, {})[doc_id] = int(tf)
    return OracleIndex(postings=postings, doclen=doclen, n_docs=n_docs, total_dl=total_dl)


def oracle_dictionary_terms_for(index: OracleIndex, namespace: str, regex: str) -> list[str]:
    rx = re.compile(regex)
    prefix = namespace + ":"
    return sorted(
        t for t in index.postings if t.startswith(prefix) and rx.match(t[len(prefix):])
    )


def oracle_topk(
    index: OracleIndex,
    query: LoweredQuery,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> list[tuple[int, float]]:
    """Exhaustive scoring -> top-k [(doc_id, score)], rank order."""
    groups = expand_groups(
        query, lambda ns, rx: oracle_dictionary_terms_for(index, ns, rx)
    )
    if any(len(g) == 0 for g in groups):
        return []
    all_terms = sorted({t for g in groups for t in g})
    # candidates: every group satisfied
    candidates: set[int] | None = None
    for g in groups:
        docs_g: set[int] = set()
        for t in g:
            docs_g.update(index.postings.get(t, ()))
        candidates = docs_g if candidates is None else candidates & docs_g
        if not candidates:
            return []
    avgdl = index.avgdl
    scores: dict[int, float] = dict.fromkeys(candidates, 0.0)
    for term in all_terms:  # ascending-term accumulation order
        plist = index.postings.get(term)
        if not plist:
            continue
        idf = index.idf(term)
        for doc_id in candidates:
            tf = plist.get(doc_id)
            if tf is None:
                continue
            dl = index.doclen[doc_id]
            contrib = idf * (tf * (1.0 + k1)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
            scores[doc_id] += contrib
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
