"""Tokenizer contract (FIXTURES.md §4) against hand-tokenized snippets."""

from __future__ import annotations

from reiz_io_spark.functions.tokenizer import tokenize_source


def test_basic_vocabulary():
    bag, ok = tokenize_source("def run(x):\n    return len(x) + 1\n")
    assert ok
    assert bag["node:FunctionDef"] == 1
    assert bag["node:Return"] == 1
    assert bag["node:Call"] == 1
    assert bag["id:run"] == 1
    assert bag["id:len"] == 1
    assert bag["id:x"] == 2  # arg + Name use
    assert bag["lit:1"] == 1
    assert bag["node:Add"] == 1  # enum members are node terms
    # parent-context terms (reference _parent_types, transformers.py:144-151)
    assert bag["in:Call.func"] >= 1
    assert bag["in:FunctionDef.body"] >= 1
    # case-folded identifier namespace for ILIKE
    assert bag["idci:run"] == 1


def test_parse_failure_is_skipped_not_fatal():
    bag, ok = tokenize_source("def broken(:\n")
    assert not ok
    assert not bag


def test_constant_repr_canonicalization():
    # reference stores repr(value) (transformers.py:172-174)
    bag, ok = tokenize_source("x = 'hi'\ny = 2.5\nz = True\n")
    assert ok
    assert bag["lit:'hi'"] == 1
    assert bag["lit:2.5"] == 1
    assert bag["lit:True"] == 1


def test_ancestor_terms_cover_all_levels():
    bag, ok = tokenize_source("def f():\n    if g():\n        return 1\n")
    assert ok
    # the Constant(1) is under Return<-If<-FunctionDef
    assert bag["in:Return.value"] == 1
    assert bag["in:If.body"] >= 1
    assert bag["in:FunctionDef.body"] >= 1


def test_global_nonlocal_names():
    bag, ok = tokenize_source("def f():\n    global a, b\n")
    assert ok
    assert bag["id:a"] == 1 and bag["id:b"] == 1
    assert bag["node:Global"] == 1


def test_doclen_is_total_terms():
    bag, ok = tokenize_source("a = 1\n")
    assert ok
    assert sum(bag.values()) == len(list(bag.elements()))
