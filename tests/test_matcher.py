"""Structural matcher golden tests — the full analog of the reference's
`# reiz: tp` line-number harness (tests/runner.py:204-226), pure Python."""

from __future__ import annotations

import pytest

from reiz_io_spark.plans.matcher import Matcher, annotated_tp_lines, match_lines
from reiz_io_spark.plans.queries import REFERENCE_QUERIES
from reiz_io_spark.sources.corpus import GOLDEN_FILES


@pytest.mark.parametrize("name", sorted(REFERENCE_QUERIES))
def test_golden_line_numbers(name):
    """Exact set equality of matched lines — false positives and misses
    both fail, like the reference runner."""
    content = GOLDEN_FILES[name + ".py"]
    got = match_lines(content, REFERENCE_QUERIES[name])
    want = annotated_tp_lines(content)
    assert got == want, f"{name}: got {sorted(got)} want {sorted(want)}"


def test_ref_variable_binds_structurally():
    # same call expression twice -> ~ref matches
    src = "def f():\n    g(1)\n    return g(1)\n"
    q = "FunctionDef(body=[Expr(~c), Return(~c)])"
    assert match_lines(src, q) == {1}
    # different args -> no match (structural tag differs)
    src2 = "def f():\n    g(1)\n    return g(2)\n"
    assert match_lines(src2, q) == set()


def test_ref_variable_string_equality():
    q = "FunctionDef(~n, body=[*..., Return(Call(Name(~n)))])"
    assert match_lines("def echo():\n    return echo()\n", q) == {1}
    assert match_lines("def echo():\n    return other()\n", q) == set()


def test_len_bounds():
    assert match_lines("if x:\n    a = 1\n    b = 2\n", "If(body=LEN(2, 2))") == {1}
    assert match_lines("if x:\n    a = 1\n", "If(body=LEN(2, 2))") == set()


def test_sequence_gap_backtracking():
    q = "ClassDef(body=[FunctionDef(), *..., FunctionDef()])"
    src = "class C:\n    def a(self): ...\n    x = 1\n    def b(self): ...\n"
    assert match_lines(src, q) == {1}


def test_not_and_none():
    assert match_lines("def f(): ...\n", "FunctionDef(returns=None)") == {1}
    assert match_lines("def f() -> int: ...\n", "FunctionDef(returns=None)") == set()
    assert match_lines("return_stub = 0\nx = 1\n", "Assign(value=not Constant())") == set()


def test_caseless_and_wildcards():
    assert match_lines("def A_Foo_x(): ...\n", 'FunctionDef(name=I(f"a_foo%"))') == {1}
    assert match_lines("def b_foo(): ...\n", 'FunctionDef(name=I(f"a_foo%"))') == set()
    # `_` single-char wildcard, `\_` escaped literal
    assert match_lines("def xy_fooz(): ...\n", 'FunctionDef(name=f"__\\_foo%")') == {1}


def test_meta_parent():
    q = "Call(Name('g'), __metadata__=META(parent=If(test=...)))"
    assert match_lines("if g():\n    pass\n", q) == {1}
    assert match_lines("if x:\n    g()\n", q) == set()  # g() is under If.body


def test_structural_matches_are_bm25_recall_subset():
    """Every structurally matching golden file must satisfy the lowered
    conjunction — the lowering is a recall-complete superset (SURVEY §7.4)."""
    import re

    from reiz_io_spark.functions.tokenizer import tokenize_source
    from reiz_io_spark.plans.lower import Like
    from reiz_io_spark.plans.queries import lowered_reference_queries

    lowered = lowered_reference_queries()
    for name, q in lowered.items():
        content = GOLDEN_FILES[name + ".py"]
        if not match_lines(content, REFERENCE_QUERIES[name]):
            continue  # true-negative fixture
        bag, ok = tokenize_source(content)
        assert ok
        for g in q.groups:
            sat = False
            for t in g.terms:
                if isinstance(t, Like):
                    rx = re.compile(t.regex())
                    pre = t.namespace + ":"
                    sat = sat or any(
                        k.startswith(pre) and rx.match(k[len(pre):]) for k in bag
                    )
                else:
                    sat = sat or bool(bag.get(t))
            assert sat, f"{name}: structural match but unsat group {g.terms}"
