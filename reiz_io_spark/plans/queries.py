"""The 27-query reference set (reiz.io tests/queries/{simple,complex}).

Query texts reproduce the reference's golden query fixtures verbatim —
they are the specification of WHAT to answer (each is a one-expression
ReizQL pattern; /root/reference/tests/queries/**.reizql). Lowering to
term conjunctions is ours (plans/lower.py).
"""

from __future__ import annotations

from .lower import LoweredQuery, lower_query

REFERENCE_QUERIES: dict[str, str] = {
    "simple/and_matcher": "If(body=[Assign(), *..., Return()] & LEN(max=5))",
    "simple/annotated_functions": "FunctionDef(returns=not None)",
    "simple/any_number_of_stmts": "FunctionDef(body=[*...])",
    "simple/arguments": (
        "FunctionDef(args=arguments(posonlyargs=[arg('bar')], args=[arg('baz')]))"
    ),
    "simple/call": "Expr(Call(args=[Name('foo')], keywords=[keyword(arg='bar')]))",
    "simple/caseless_match": 'FunctionDef(name = I(f"a_foo%"))',
    "simple/classmethod": 'FunctionDef(decorator_list=[Name("classmethod"), *...])',
    "simple/extended_list_matcher": "For(body=[Continue() | Pass(), not Expr()])",
    "simple/len_matcher": "If(body = LEN(2, 2))",
    "simple/len_range_matcher": "If(body = LEN(min=2, max=4))",
    "simple/not_constant": "Return(not Constant())",
    "simple/simple_formatted_name_match": 'FunctionDef(name = f"__\\_foo%")',
    "simple/simple_name_match": "Name()",
    "simple/try_except": "Try(handlers=[*..., ExceptHandler(type=None)])",
    "simple/type_or": "Return(Name() | Tuple())",
    "complex/ast_parse": (
        "With(items=[withitem(context_expr=Call(func=Name(id='open'), args=[...],"
        " keywords=[]), optional_vars=~stream)], body=[Assign(targets=[Name(id='tree')],"
        " value=Call(func=Attribute(value=Name(id='ast'), attr='parse'),"
        " args=[Call(func=Attribute(value=~stream, attr='read'), args=[], keywords=[])],"
        " keywords=[]))])"
    ),
    "complex/complex_lists": (
        "FunctionDef(decorator_list=[Name()], body=[FunctionDef(decorator_list=["
        "Call(args=[Call(args=[Name()]), Name()])]), If(body=[For(body=[Return("
        "Call(args=[]))])])])"
    ),
    "complex/does_not_return_name_tuple": (
        "FunctionDef(body=[*..., Return(Tuple(not ALL(Name())))])"
    ),
    "complex/expression_reference": (
        "FunctionDef(body=[Expr(~some_call), *..., Return(~some_call)])"
    ),
    "complex/ignore_expr": (
        "BinOp(left=Call(args=[..., ...]), right=Constant(2) | Constant(4), op=Add())"
    ),
    "complex/metadata_parent": (
        "Call(Name('something'), __metadata__=META(parent=If(test=...)))"
    ),
    "complex/metadata_parent_on_sequence": (
        "Call(Name('func'), __metadata__=META(parent=If(body=...)))"
    ),
    "complex/nested_list": (
        "ClassDef(body=[FunctionDef(decorator_list=[Name('classmethod')]), *...])"
    ),
    "complex/nested_reference_query": (
        "ClassDef(body=[FunctionDef(~name, body=[*..., Expr(Call(Name(~name)))]), *...])"
    ),
    "complex/nested_sub_level_reference": (
        "FunctionDef(body=[If(test=Name(~name), body=[Return(Name(~name))]), *...])"
    ),
    "complex/nonlocal_access": (
        "FunctionDef(name=~name, decorator_list=[Name(~name)], body=[Call(Name(~name)),"
        " If(body=[Expr(~some_expr)]), Return(~some_expr)])"
    ),
    "complex/single_top_level_reference": (
        "FunctionDef(~name, body=[*..., Return(Call(Name(~name)))])"
    ),
}


def lowered_reference_queries() -> dict[str, LoweredQuery]:
    return {name: lower_query(name, src) for name, src in REFERENCE_QUERIES.items()}
