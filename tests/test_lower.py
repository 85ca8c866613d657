"""Lowering of the 27 reference queries to term conjunctions."""

from __future__ import annotations

from reiz_io_spark.plans.lower import Group, Like, lower_query
from reiz_io_spark.plans.queries import REFERENCE_QUERIES, lowered_reference_queries


def terms_of(q):
    return {t for g in q.groups for t in g.terms}


def test_all_27_queries_lower():
    lowered = lowered_reference_queries()
    assert len(lowered) == 27
    for name, q in lowered.items():
        assert q.groups, f"{name} lowered to nothing"


def test_simple_call():
    q = lower_query("call", REFERENCE_QUERIES["simple/call"])
    ts = terms_of(q)
    assert {"node:Expr", "node:Call", "node:Name", "node:keyword",
            "id:foo", "id:bar"} <= ts
    assert "in:Call.args" in ts and "in:Expr.value" in ts


def test_type_or_produces_or_group():
    q = lower_query("type_or", REFERENCE_QUERIES["simple/type_or"])
    or_groups = [g for g in q.groups if len(g.terms) > 1]
    assert any(
        set(g.terms) == {"node:Name", "node:Tuple"} for g in or_groups
    )
    assert Group(("node:Return",)) in q.groups


def test_or_of_constants():
    q = lower_query("ignore_expr", REFERENCE_QUERIES["complex/ignore_expr"])
    ts = terms_of(q)
    assert "node:BinOp" in ts and "node:Add" in ts and "node:Call" in ts
    assert any(set(g.terms) == {"lit:2", "lit:4"} for g in q.groups)
    # node:Constant common to both alternatives -> required singleton
    assert Group(("node:Constant",)) in q.groups


def test_match_strings_become_like_markers():
    q = lower_query("fmt", REFERENCE_QUERIES["simple/simple_formatted_name_match"])
    markers = q.like_markers()
    assert len(markers) == 1
    assert markers[0].namespace == "id"
    # `__\_foo%`: two `_` wildcards, escaped literal underscore, suffix
    assert markers[0].regex() == "^.._foo.*$"

    qi = lower_query("ci", REFERENCE_QUERIES["simple/caseless_match"])
    mi = qi.like_markers()
    assert mi[0].namespace == "idci"
    assert mi[0].regex() == "^a.foo.*$"  # `_` is a single-char wildcard


def test_negative_and_ref_matchers_drop_terms():
    q = lower_query("not_constant", REFERENCE_QUERIES["simple/not_constant"])
    assert terms_of(q) == {"node:Return"}

    q2 = lower_query("ref", REFERENCE_QUERIES["complex/single_top_level_reference"])
    ts = terms_of(q2)
    # ~name yields no term; nested Return(Call(Name)) does
    assert {"node:FunctionDef", "node:Return", "node:Call", "node:Name"} <= ts
    assert "in:Return.value" in ts


def test_meta_parent_lowering():
    q = lower_query("meta", REFERENCE_QUERIES["complex/metadata_parent"])
    ts = terms_of(q)
    assert "in:If.test" in ts and "node:If" in ts
    assert "id:something" in ts and "node:Call" in ts


def test_positional_field_mapping():
    # FunctionDef first positional -> name (identifier field)
    q = lower_query("pos", "FunctionDef('frob')")
    assert "id:frob" in terms_of(q)
    # Call first positional -> func
    q2 = lower_query("pos2", "Call(Name('g'))")
    assert "in:Call.func" in terms_of(q2)
