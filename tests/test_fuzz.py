"""Seeded ReizQL fuzzing — the analog of the reference's query smith
(scripts/query_smith.py:68-111, which generates random queries from the
ASDL grammar). Ours generates from Python's own ast introspection and
asserts the three contracts that tie the stack together:

1. lowering never crashes and produces well-formed CNF groups,
2. the structural matcher never crashes on any (query, file) pair,
3. RECALL SUPERSET: if the matcher structurally matches a file, the
   file's term bag satisfies every lowered group (so index retrieval
   can never miss a true structural match).
"""

from __future__ import annotations

import ast
import random
import re

import pytest

from reiz_io_spark.functions.tokenizer import IDENTIFIER_FIELDS, tokenize_source
from reiz_io_spark.plans.lower import Like, lower_query
from reiz_io_spark.plans.matcher import match_lines
from reiz_io_spark.sources.corpus import synth_corpus_rows

N_QUERIES = 300
MAX_DEPTH = 3

_STMT_TYPES = [
    "FunctionDef", "AsyncFunctionDef", "ClassDef", "Return", "Assign",
    "If", "For", "While", "Try", "With", "Expr", "Pass", "Continue",
]
_EXPR_TYPES = [
    "Call", "Name", "Attribute", "Constant", "BinOp", "Tuple", "List",
    "Compare", "Lambda",
]
_IDENTS = ["self", "data", "value", "result", "foo", "len", "open", "x"]


def _gen_value(rng: random.Random, owner: str, fld: str, depth: int) -> str:
    """A field value for matcher `owner`.`fld`."""
    ident_field = fld in IDENTIFIER_FIELDS.get(owner, ())
    roll = rng.random()
    if ident_field:
        name = rng.choice(_IDENTS)
        return rng.choice(
            [
                f"'{name}'",
                f'f"{name[:2]}%"',
                f'I(f"{name[:2].upper()}%")',
                f'f"_{name[1:3]}%"',
            ]
        )
    if depth >= MAX_DEPTH or roll < 0.10:
        return "..."
    if roll < 0.18:
        return "None"
    if roll < 0.26:
        # parenthesized: `not` binds looser than the | / & combinators
        return "(not " + _gen_value(rng, owner, fld, depth + 1) + ")"
    if roll < 0.32:
        return "~ref%d" % rng.randrange(2)
    if roll < 0.40:
        a = _gen_value(rng, owner, fld, depth + 1)
        b = _gen_value(rng, owner, fld, depth + 1)
        op = rng.choice(["|", "&"])
        return f"({a} {op} {b})"
    if roll < 0.50:
        n = rng.randrange(0, 3)
        elts = [_gen_value(rng, owner, fld, depth + 1) for _ in range(n)]
        if rng.random() < 0.5:
            elts.insert(rng.randrange(len(elts) + 1), "*...")
        return "[" + ", ".join(elts) + "]"
    if roll < 0.56:
        lo, hi = sorted((rng.randrange(0, 4), rng.randrange(0, 6)))
        return f"LEN(min={lo}, max={hi})"
    if roll < 0.62 and owner == "Constant" and fld == "value":
        return repr(rng.choice([0, 1, 42, "x", None, True]))
    return _gen_matcher(rng, depth + 1)


def _gen_matcher(rng: random.Random, depth: int = 0) -> str:
    name = rng.choice(_STMT_TYPES + _EXPR_TYPES)
    cls = getattr(ast, name)
    fields = list(cls._fields)
    rng.shuffle(fields)
    n_fields = rng.randrange(0, min(len(fields), 3) + 1) if fields else 0
    parts = [
        f"{f}={_gen_value(rng, name, f, depth)}" for f in fields[:n_fields]
    ]
    if depth == 0 and rng.random() < 0.25:
        parts.append("__metadata__=META(parent=%s())" % rng.choice(_STMT_TYPES))
    return f"{name}({', '.join(parts)})"


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


@pytest.fixture(scope="module")
def corpus():
    rows = synth_corpus_rows(n_filler=60, seed=99)
    out = []
    for repo, path, commit, lang, content in rows:
        if lang != "python":
            continue
        bag, ok = tokenize_source(content)
        if not ok:
            continue
        out.append((path, content, set(bag)))
    assert len(out) > 40
    return out


def test_fuzzed_queries_lower_match_and_stay_recall_complete(corpus):
    rng = random.Random(20260816)
    n_lowered = n_matched_pairs = 0
    for qi in range(N_QUERIES):
        src = _gen_matcher(rng)
        try:
            q = lower_query(f"fuzz{qi}", src)
        except ValueError:
            continue  # root not a matcher (can't happen) — tolerated
        n_lowered += 1
        for g in q.groups:
            assert g.terms, f"empty group lowered from {src}"
            for t in g.terms:
                assert isinstance(t, (str, Like)), (src, t)
        for path, content, doc_terms in corpus:
            lines = match_lines(content, src)  # must never crash
            if not lines:
                continue
            n_matched_pairs += 1
            for g in q.groups:
                assert _group_satisfied(g, doc_terms), (
                    f"RECALL VIOLATION: query {src} structurally matches "
                    f"{path} (lines {sorted(lines)}) but group {g.terms} "
                    "is unsatisfied by the doc's term bag"
                )
    assert n_lowered >= N_QUERIES * 0.9
    assert n_matched_pairs > 50  # the fuzz actually exercises matches
