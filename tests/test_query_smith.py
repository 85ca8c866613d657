"""Grammar-complete query fuzzing via the ASDL-derived smith
(plans/smith.py — the reference scripts/query_smith.py analog).

Unlike tests/test_fuzz.py's hand-listed node types, the smith covers
EVERY constructor in the grammar (107 on 3.11) as both root and nested
value, so constructor/field combinations nobody thought to list are
exercised against the full stack. Invariants, per generated query:

1. lowering is total: well-formed CNF groups or a clean
   SyntaxError/ValueError — never a crash, never an empty group;
2. the structural matcher is total over every (query, doc) pair;
3. RECALL SUPERSET: a structural match implies the doc's term bag
   satisfies every lowered group (index retrieval can never miss a
   true match);
4. ENGINE == BRUTE FORCE: the engine pipeline (term-bag candidate
   retrieval -> matcher verification, the exact semantics
   structural_topk distributes) returns the same doc set as running
   the matcher over every doc directly.
"""

from __future__ import annotations

import re

import pytest

from reiz_io_spark.functions.tokenizer import tokenize_source
from reiz_io_spark.plans.lower import Like, lower_query
from reiz_io_spark.plans.matcher import match_lines
from reiz_io_spark.plans.smith import QuerySmith, grammar_db
from reiz_io_spark.sources.corpus import synth_corpus_rows

N_QUERIES = 540
SEED = 20260817


@pytest.fixture(scope="module")
def corpus():
    rows = synth_corpus_rows(n_filler=40, seed=7)
    out = []
    for repo, path, commit, lang, content in rows:
        if lang != "python":
            continue
        bag, ok = tokenize_source(content)
        if not ok:
            continue
        out.append((path, content, set(bag)))
    assert len(out) > 30
    return out


def _group_satisfied(group, doc_terms: set[str]) -> bool:
    for t in group.terms:
        if isinstance(t, Like):
            prefix = t.namespace + ":"
            rx = re.compile(t.regex())
            if any(
                term.startswith(prefix) and rx.match(term[len(prefix):])
                for term in doc_terms
            ):
                return True
        elif t in doc_terms:
            return True
    return False


def test_smith_covers_whole_grammar():
    db = grammar_db()
    assert len(db) >= 100  # the full 3.11 grammar, not a hand list
    for known in ("Call", "MatchStar", "NamedExpr", "comprehension",
                  "withitem", "TryStar", "Load", "Add"):
        assert known in db, known


def test_smithed_queries_full_stack_agreement(corpus):
    db = grammar_db()
    smith = QuerySmith(seed=SEED)
    roots = sorted(db) * (N_QUERIES // len(db) + 1)
    n_lowered = n_engine_hits = 0
    for qi in range(N_QUERIES):
        src = smith.query_for_root(roots[qi])
        try:
            q = lower_query(f"smith{qi}", src)
        except (SyntaxError, ValueError):
            continue  # clean rejection is allowed; crashes are not
        n_lowered += 1
        for g in q.groups:
            assert g.terms, f"empty group lowered from {src}"

        brute: set[str] = set()
        candidates: set[str] = set()
        for path, content, doc_terms in corpus:
            lines = match_lines(content, src)  # totality (inv. 2)
            is_cand = all(_group_satisfied(g, doc_terms) for g in q.groups)
            if lines:
                brute.add(path)
                # recall superset (inv. 3)
                assert is_cand, (
                    f"matcher matched {path} but index would prune it: {src}"
                )
            if is_cand:
                candidates.add(path)
        # engine == brute force (inv. 4): verify stage over candidates
        verified = {
            path for path, content, _ in corpus
            if path in candidates and match_lines(content, src)
        }
        assert verified == brute, src
        n_engine_hits += len(brute)
    # the sweep must be substantive, not vacuous
    assert n_lowered >= N_QUERIES * 0.5, n_lowered
    assert n_engine_hits > 100, n_engine_hits
