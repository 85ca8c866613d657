"""Lower ReizQL patterns to CNF term-group conjunctions.

ReizQL is a Python-expression DSL; like the reference front-end we parse
it with Python's own ``ast.parse`` and walk the tree
(reiz/reizql/parser/parse.py:147-165). But where the reference compiles
to EdgeQL filters (reiz/reizql/compiler/codegen.py:14-201), we lower to
a conjunction of OR-groups over the index vocabulary:

- matcher ``T(...)``        -> term ``node:T``  (codegen.py:20-49)
- identifier field value    -> term ``id:<v>``  (codegen.py:58-67)
- ``Constant(v)``           -> term ``lit:<repr(v)>`` (codegen.py:62-66)
- nested matcher in field f of P, and every ancestor edge above it
                            -> term ``in:P.f``  (the `_parent_types`
  annotation, transformers.py:144-151; also carries META(parent=...),
  functions.py:97-110)
- ``A | B``                 -> OR-group (CNF product with subsumption)
  (parse.py:82-97, codegen.py:81-95)
- match strings f"x%"/I(..) -> LIKE/ILIKE dictionary expansion markers
  (parse.py:133-144, functions.py:59-65)
- ``not``, ``None``, ``...``, ``~ref``, LEN/ALL/ANY -> no positive terms
  (recall-complete superset; SURVEY.md §7.4). The structural matcher
  (plans/matcher.py) covers these exactly on the oracle side.

The lowering is shared verbatim by the Spark engine and the pure-Python
oracle, so BM25 rank-identity is well-defined.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass, field

# Builtin matcher names (reiz/reizql/parser/parse.py:21-23, grammar.py).
_BUILTINS = {"LEN", "ALL", "ANY", "META", "I"}

# Identifier-typed fields per matcher type — must agree with
# functions/tokenizer.py IDENTIFIER_FIELDS.
from ..functions.tokenizer import IDENTIFIER_FIELDS

# A term is either a plain vocabulary string or a Like marker expanded
# against the live dictionary at query time.


@dataclass(frozen=True)
class Like:
    namespace: str  # "id" (LIKE) or "idci" (ILIKE)
    pattern: str  # SQL LIKE pattern: % _ wildcards, backslash escapes

    def regex(self) -> str:
        """LIKE pattern -> anchored regex on the term suffix."""
        out, i = [], 0
        pat = self.pattern
        while i < len(pat):
            c = pat[i]
            if c == "\\" and i + 1 < len(pat):
                out.append(re.escape(pat[i + 1]))
                i += 2
                continue
            if c == "%":
                out.append(".*")
            elif c == "_":
                out.append(".")
            else:
                out.append(re.escape(c))
            i += 1
        return "^" + "".join(out) + "$"


Term = "str | Like"


@dataclass(frozen=True)
class Group:
    """One CNF clause: the document must contain >=1 of these terms."""

    terms: tuple


@dataclass
class LoweredQuery:
    name: str
    source: str
    groups: list[Group] = field(default_factory=list)

    def plain_terms(self) -> list[str]:
        return sorted(
            {t for g in self.groups for t in g.terms if isinstance(t, str)}
        )

    def like_markers(self) -> list[Like]:
        seen = []
        for g in self.groups:
            for t in g.terms:
                if isinstance(t, Like) and t not in seen:
                    seen.append(t)
        return seen


# --- DNF lowering -----------------------------------------------------------
# A matcher lowers to a DNF: list of alternative term-sets (frozensets).

_DNF = "list[frozenset]"


def _dnf_and(a: _DNF, b: _DNF) -> _DNF:
    return [x | y for x in a for y in b]


def _dnf_or(a: _DNF, b: _DNF) -> _DNF:
    return list(a) + list(b)


_EMPTY: _DNF = [frozenset()]


def _is_matcher(node: ast.AST) -> bool:
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Name)
        and node.func.id not in _BUILTINS
    )


def _match_string(node: ast.AST) -> str | None:
    """f-string match pattern -> raw pattern text (parse.py:133-144)."""
    if isinstance(node, ast.JoinedStr):
        parts = []
        for v in node.values:
            if isinstance(v, ast.Constant) and isinstance(v.value, str):
                parts.append(v.value)
            else:  # FormattedValue inside a match string -> wildcard
                parts.append("%")
        return "".join(parts)
    return None


def _field_names(type_name: str) -> tuple[str, ...]:
    cls = getattr(ast, type_name, None)
    if cls is not None and issubclass(cls, ast.AST):
        return cls._fields
    return ()


def _ancestor_terms(ancestors: tuple[tuple[str, str], ...]) -> frozenset:
    return frozenset("in:%s.%s" % (p, f) for p, f in set(ancestors))


def _lower_value(node: ast.AST, owner: str, fld: str, ancestors) -> _DNF:
    """Lower a field value of matcher `owner`."""
    # Ignore / absence / negation / refs: no positive terms
    if isinstance(node, ast.Constant) and node.value is Ellipsis:
        return _EMPTY
    if isinstance(node, ast.Constant) and node.value is None:
        return _EMPTY
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, (ast.Not, ast.USub)):
        return _EMPTY
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Invert):
        return _EMPTY  # ~ref (codegen.py:98-116) — oracle-side only
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.BitOr):
        return _dnf_or(
            _lower_value(node.left, owner, fld, ancestors),
            _lower_value(node.right, owner, fld, ancestors),
        )
    if isinstance(node, ast.BinOp) and isinstance(node.op, ast.BitAnd):
        return _dnf_and(
            _lower_value(node.left, owner, fld, ancestors),
            _lower_value(node.right, owner, fld, ancestors),
        )
    if isinstance(node, (ast.List, ast.Tuple)):
        dnf = _EMPTY
        for el in node.elts:
            if isinstance(el, ast.Starred):  # *... sequence wildcard
                continue
            dnf = _dnf_and(dnf, _lower_value(el, owner, fld, ancestors))
        return dnf
    # Scalar field values (identifier strings, literals, match strings):
    # NOT AST child nodes — the tokenizer emits no `in:` edge for them
    # (the owning matcher already carries its own ancestor terms), so the
    # lowered group is just the value term.
    ms = _match_string(node)
    if ms is not None:
        if fld in IDENTIFIER_FIELDS.get(owner, ()):
            return [frozenset({Like("id", ms)})]
        return _EMPTY
    if isinstance(node, ast.Constant):
        if owner == "Constant" and fld == "value":
            return [frozenset({"lit:" + repr(node.value)})]
        if isinstance(node.value, str) and fld in IDENTIFIER_FIELDS.get(owner, ()):
            return [frozenset({"id:" + node.value})]
        return _EMPTY
    if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
        name = node.func.id
        if name == "I":  # caseless match (functions.py:59-65)
            if node.args:
                ms = _match_string(node.args[0])
                if ms is not None and fld in IDENTIFIER_FIELDS.get(owner, ()):
                    return [frozenset({Like("idci", ms.lower())})]
            return _EMPTY
        if name in ("LEN", "ALL", "ANY"):
            # quantifiers/length (functions.py:68-94): structural only
            return _EMPTY
        if name == "META":
            return _EMPTY  # handled at the matcher level (keyword __metadata__)
        return _lower_matcher(node, ancestors)
    return _EMPTY


def _lower_meta(node: ast.Call) -> _DNF:
    """META(parent=P(field=...)) -> {node:P, in:P.field} (functions.py:97-110)."""
    out = frozenset()
    for kw in node.keywords:
        if kw.arg == "parent" and _is_matcher(kw.value):
            p = kw.value.func.id
            out |= {"node:" + p}
            for pkw in kw.value.keywords:
                if pkw.arg:
                    out |= {"in:%s.%s" % (p, pkw.arg)}
    return [out]


def _lower_matcher(node: ast.Call, ancestors) -> _DNF:
    type_name = node.func.id
    dnf: _DNF = [frozenset({"node:" + type_name}) | _ancestor_terms(ancestors)]
    fields = _field_names(type_name)
    for i, arg in enumerate(node.args):
        fld = fields[i] if i < len(fields) else "arg%d" % i
        dnf = _dnf_and(
            dnf, _lower_value(arg, type_name, fld, ancestors + ((type_name, fld),))
        )
    for kw in node.keywords:
        if kw.arg == "__metadata__":
            if isinstance(kw.value, ast.Call) and isinstance(kw.value.func, ast.Name):
                if kw.value.func.id == "META":
                    dnf = _dnf_and(dnf, _lower_meta(kw.value))
            continue
        if kw.arg is None:
            continue
        dnf = _dnf_and(
            dnf,
            _lower_value(
                kw.value, type_name, kw.arg, ancestors + ((type_name, kw.arg),)
            ),
        )
    return dnf


def _cnf_groups(dnf: _DNF) -> list[Group]:
    """DNF -> CNF clauses (cartesian product) with subsumption pruning."""
    dnf = [alt for alt in dnf if True]
    if not dnf:
        return []
    if len(dnf) == 1:
        return [Group((t,)) for t in _sorted_terms(dnf[0])]
    import itertools

    clauses: set[frozenset] = set()
    for picks in itertools.product(*[_sorted_terms(alt) for alt in dnf]):
        clauses.add(frozenset(picks))
    pruned = [
        c for c in clauses if not any(o < c for o in clauses)
    ]  # drop supersets (subsumption)
    return [Group(tuple(_sorted_terms(c))) for c in sorted(pruned, key=_clause_key)]


def _sorted_terms(s) -> list:
    return sorted(s, key=lambda t: (1, t.namespace, t.pattern) if isinstance(t, Like) else (0, t))


def _clause_key(c):
    return tuple(str(t) for t in _sorted_terms(c))


def lower_query(name: str, source: str) -> LoweredQuery:
    tree = ast.parse(source.strip(), mode="eval").body
    if not _is_matcher(tree):
        raise ValueError("root must be a matcher: %s" % name)
    dnf = _lower_matcher(tree, ())
    groups = _cnf_groups(dnf)
    # dedupe identical groups, preserve deterministic order
    seen, uniq = set(), []
    for g in groups:
        key = tuple(str(t) for t in g.terms)
        if key not in seen:
            seen.add(key)
            uniq.append(g)
    return LoweredQuery(name=name, source=source, groups=uniq)


def expand_groups(
    query: LoweredQuery, dictionary_terms_for: "callable"
) -> list[tuple[str, ...]]:
    """Resolve Like markers against the live dictionary.

    ``dictionary_terms_for(namespace, regex)`` must return the matching
    vocabulary terms (full `ns:value` strings). Engine and oracle expand
    against the same dictionary, so rank-identity is preserved.
    A Like marker with zero matches yields an unsatisfiable group ().
    """
    out: list[tuple[str, ...]] = []
    for g in query.groups:
        terms: list[str] = []
        for t in g.terms:
            if isinstance(t, Like):
                terms.extend(dictionary_terms_for(t.namespace, t.regex()))
            else:
                terms.append(t)
        out.append(tuple(sorted(set(terms))))
    return out
