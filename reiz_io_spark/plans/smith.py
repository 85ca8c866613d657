"""Grammar-driven ReizQL query smith — the analog of the reference's
ASDL random-query generator (/root/reference/scripts/query_smith.py:
68-111, which parses Python-reiz.asdl and emits random matcher trees
from the constructor/field tables).

Instead of parsing an .asdl file, the constructor/field database is
derived from Python's own ``ast`` module — the RUNTIME form of the
exact same ASDL grammar (every Sum constructor is an ast.AST subclass
and its ``_fields`` tuple is the ASDL field list). That makes the
generator complete over the grammar by construction: every constructor
CPython knows, including ones no hand-maintained list ever mentioned
(MatchStar, TypeAlias, NamedExpr, comprehension, withitem, ...), shows
up as a root and as a nested value.

Field KINDS (sequence vs identifier vs node) are not introspectable on
3.11, so the smith classifies by the grammar's own naming conventions:
- identifier fields come from the tokenizer's IDENTIFIER_FIELDS table
  (the single source of truth the index uses for id:/idci: terms);
- sequence fields are the ASDL's * -qualified names (body, elts, ...),
  a fixed public list of the grammar's plural fields.
A misclassified field only makes a query that matches nothing — the
invariants under test (lowering well-formedness, matcher totality,
recall-supersetness, engine == brute-force agreement) must hold for
EVERY well-formed query, matching or not, so the fuzz stays sound.

Generated surface: constructor matchers with nested values, sequence
matchers with ``*...`` wildcards, LEN(min,max), `...` ignores, None
absence, ``not`` / ``|`` / ``&`` combinators, ``~ref`` bindings,
string/f-string/I() match-strings on identifier fields, and
META(parent=...) — the full ReizQL surface SURVEY §2.3-2.5 claims.
"""

from __future__ import annotations

import ast
import random

from ..functions.tokenizer import IDENTIFIER_FIELDS

# ASDL *-qualified (sequence) fields of the Python grammar, by name —
# public CPython grammar knowledge (Parser/Python.asdl field names).
SEQUENCE_FIELDS = frozenset({
    "body", "orelse", "finalbody", "handlers", "targets", "elts", "keys",
    "values", "comparators", "ops", "decorator_list", "bases", "keywords",
    "items", "names", "generators", "ifs", "args", "dims", "patterns",
    "kwd_patterns", "cases", "type_params", "defaults", "kw_defaults",
    "kwonlyargs", "posonlyargs",
})
# fields whose values are primitives the smith should treat as constants
CONST_FIELDS = frozenset({
    "value", "n", "s", "level", "conversion", "is_async", "simple", "lineno",
})

_IDENT_POOL = ["self", "data", "value", "result", "foo", "len", "open", "x",
               "items", "key"]
_CONST_POOL = [0, 1, 42, "x", "", None, True, False]


# pre-3.12 deprecated aliases (Num subclasses Constant, etc.) — not
# grammar constructors, never emitted by the tokenizer
_DEPRECATED = frozenset({
    "Num", "Str", "Bytes", "NameConstant", "Ellipsis", "Index", "ExtSlice",
    "Suite", "AugLoad", "AugStore", "Param", "slice",
})


def grammar_db() -> dict[str, tuple[str, ...]]:
    """Every concrete ast constructor -> its ASDL field tuple.

    Concrete = a non-abstract grammar node: abstract Sum bases (stmt,
    expr, mod, pattern, ...) are direct ast.AST subclasses with EMPTY
    _fields; Product types (arguments, comprehension, ...) are direct
    subclasses WITH fields; Sum constructors subclass an abstract base.
    Field-less leaf constructors (Load, Add, Eq, ...) are included —
    they are real grammar members the tokenizer emits node: terms
    for."""
    out: dict[str, tuple[str, ...]] = {}
    for name in dir(ast):
        cls = getattr(ast, name)
        if not (isinstance(cls, type) and issubclass(cls, ast.AST)):
            continue
        if cls is ast.AST or name in _DEPRECATED:
            continue
        abstract_sum = cls.__base__ is ast.AST and not cls._fields
        if abstract_sum:
            continue
        out[name] = tuple(cls._fields)
    return out


class QuerySmith:
    def __init__(self, seed: int = 0, max_depth: int = 3):
        self.rng = random.Random(seed)
        self.max_depth = max_depth
        self.db = grammar_db()
        self.roots = sorted(self.db)

    # -- public surface ----------------------------------------------------
    def query(self) -> str:
        return self.query_for_root(self.rng.choice(self.roots))

    def query_for_root(self, root: str) -> str:
        src = self._matcher(root, depth=0)
        if self.rng.random() < 0.15:
            parent = self.rng.choice(self.roots)
            src = src[:-1] + (", " if src[-2] != "(" else "") + (
                f"__metadata__=META(parent={parent}())" + ")"
            )
        return src

    # -- generation --------------------------------------------------------
    def _matcher(self, name: str, depth: int) -> str:
        fields = list(self.db.get(name, ()))
        self.rng.shuffle(fields)
        n = 0 if not fields else self.rng.randrange(
            0, min(len(fields), 3) + 1
        )
        parts = [
            f"{f}={self._value(name, f, depth)}" for f in fields[:n]
        ]
        return f"{name}({', '.join(parts)})"

    def _value(self, owner: str, fld: str, depth: int) -> str:
        rng = self.rng
        if fld in IDENTIFIER_FIELDS.get(owner, ()):
            name = rng.choice(_IDENT_POOL)
            return rng.choice([
                f"'{name}'",
                f'f"{name[:2]}%"',
                f'I(f"{name[:2].upper()}%")',
                f'f"_{name[1:3]}%"',
            ])
        if depth >= self.max_depth:
            return "..."
        roll = rng.random()
        if roll < 0.10:
            return "..."
        if roll < 0.16:
            return "None"
        if roll < 0.22:
            return "(not " + self._value(owner, fld, depth + 1) + ")"
        if roll < 0.28:
            return "~ref%d" % rng.randrange(2)
        if roll < 0.36:
            a = self._value(owner, fld, depth + 1)
            b = self._value(owner, fld, depth + 1)
            return f"({a} {rng.choice(['|', '&'])} {b})"
        if fld in SEQUENCE_FIELDS:
            if roll < 0.5:
                lo, hi = sorted((rng.randrange(0, 4), rng.randrange(0, 6)))
                return f"LEN(min={lo}, max={hi})"
            n = rng.randrange(0, 3)
            elts = [self._value(owner, fld, depth + 1) for _ in range(n)]
            if rng.random() < 0.5:
                elts.insert(rng.randrange(len(elts) + 1), "*...")
            return "[" + ", ".join(elts) + "]"
        if fld in CONST_FIELDS and roll < 0.55:
            return repr(rng.choice(_CONST_POOL))
        return self._matcher(rng.choice(self.roots), depth + 1)
