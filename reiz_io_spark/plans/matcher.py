"""Pure-Python structural ReizQL matcher (test oracle, never on Spark).

Implements the reference's matcher semantics over Python ASTs —
the behaviors reiz.io compiles to EdgeQL
(reiz/reizql/compiler/codegen.py:14-201) evaluated directly:

- type match (codegen.py:20-49), field equality (58-67),
- match strings with %/_ wildcards and backslash escapes, I() caseless
  (parse.py:133-144, functions.py:59-65),
- not / None absence / `not None` presence (codegen.py:76-78,188-190),
- & / | combinators (codegen.py:81-95),
- sequence matchers incl. `*...` gaps (codegen.py:139-185),
- LEN / ALL / ANY builtins (functions.py:68-94),
- `~ref` reference variables: strings compare by value, expressions by
  structural tag (codegen.py:98-116, analysis.py:9-75),
- META(parent=...) ancestor constraint over (ancestor type, field)
  pairs (functions.py:97-110, transformers.py:144-151),
- decorated def position widening: a matched FunctionDef/AsyncFunctionDef/
  ClassDef with decorators reports the first decorator's line
  (transformers.py:161-170).

Used by tests to assert the `# tp: N` golden line annotations in the
synthetic corpus — the analog of the reference's `# reiz: tp` harness
(tests/runner.py:152-178,204-226) — and to verify that BM25 conjunction
retrieval is a recall superset of structural matches.
"""

from __future__ import annotations

import ast
import re

from ..functions.tokenizer import structural_tag

_BUILTINS = {"LEN", "ALL", "ANY", "META", "I"}


class _NoMatch(Exception):
    pass


def _pattern_regex(pat: str, case_insensitive: bool = False) -> re.Pattern:
    out, i = [], 0
    while i < len(pat):
        c = pat[i]
        if c == "\\" and i + 1 < len(pat):
            out.append(re.escape(pat[i + 1]))
            i += 2
            continue
        out.append(".*" if c == "%" else "." if c == "_" else re.escape(c))
        i += 1
    return re.compile("".join(out) + r"\Z", re.IGNORECASE if case_insensitive else 0)


def _match_string_text(node: ast.AST) -> str | None:
    if isinstance(node, ast.JoinedStr):
        parts = []
        for v in node.values:
            parts.append(v.value if isinstance(v, ast.Constant) else "%")
        return "".join(parts)
    return None


class Matcher:
    """Compiled query; ``match(node, ancestors)`` -> bool with ~ref scope."""

    def __init__(self, source: str):
        self.tree = ast.parse(source.strip(), mode="eval").body
        if not isinstance(self.tree, ast.Call):
            raise ValueError("root must be a matcher call")

    def match(self, node: ast.AST, ancestors: tuple = ()) -> bool:
        try:
            self._value(self.tree, node, {}, ancestors)
            return True
        except _NoMatch:
            return False

    # -- dispatch -------------------------------------------------------------

    def _value(self, pattern: ast.AST, value, refs: dict, ancestors) -> None:
        # Ignore
        if isinstance(pattern, ast.Constant) and pattern.value is Ellipsis:
            return
        # None absence (NOT EXISTS, codegen.py:188-190)
        if isinstance(pattern, ast.Constant) and pattern.value is None:
            if value is None:
                return
            raise _NoMatch
        # not P
        if isinstance(pattern, ast.UnaryOp) and isinstance(pattern.op, ast.Not):
            try:
                self._value(pattern.operand, value, refs, ancestors)
            except _NoMatch:
                return
            raise _NoMatch
        # ~ref (codegen.py:98-116): bind or compare structurally
        if isinstance(pattern, ast.UnaryOp) and isinstance(pattern.op, ast.Invert):
            name = pattern.operand.id  # type: ignore[attr-defined]
            key = _ref_key(value)
            if name in refs:
                if refs[name] != key:
                    raise _NoMatch
                return
            refs[name] = key
            return
        # A | B, A & B
        if isinstance(pattern, ast.BinOp) and isinstance(pattern.op, ast.BitOr):
            snapshot = dict(refs)
            try:
                self._value(pattern.left, value, refs, ancestors)
                return
            except _NoMatch:
                refs.clear()
                refs.update(snapshot)
                self._value(pattern.right, value, refs, ancestors)
                return
        if isinstance(pattern, ast.BinOp) and isinstance(pattern.op, ast.BitAnd):
            self._value(pattern.left, value, refs, ancestors)
            self._value(pattern.right, value, refs, ancestors)
            return
        # sequence matcher
        if isinstance(pattern, ast.List):
            if not isinstance(value, list):
                raise _NoMatch
            self._sequence(pattern.elts, value, refs, ancestors)
            return
        # match string
        ms = _match_string_text(pattern)
        if ms is not None:
            if not isinstance(value, str) or not _pattern_regex(ms).match(value):
                raise _NoMatch
            return
        # literal equality (repr-canonical like the reference,
        # codegen.py:62-66 / transformers.py:172-174)
        if isinstance(pattern, ast.Constant):
            if isinstance(value, ast.Constant):
                value = value.value  # Constant('x') positional against a node
            if repr(value) != repr(pattern.value):
                raise _NoMatch
            return
        if isinstance(pattern, ast.Call) and isinstance(pattern.func, ast.Name):
            name = pattern.func.id
            if name == "I":
                ms = _match_string_text(pattern.args[0]) if pattern.args else None
                if (
                    ms is None
                    or not isinstance(value, str)
                    or not _pattern_regex(ms, case_insensitive=True).match(value)
                ):
                    raise _NoMatch
                return
            if name == "LEN":
                self._len(pattern, value)
                return
            if name in ("ALL", "ANY"):
                if not isinstance(value, list):
                    raise _NoMatch
                inner = pattern.args[0]
                results = []
                for item in value:
                    try:
                        self._value(inner, item, refs, ancestors)
                        results.append(True)
                    except _NoMatch:
                        results.append(False)
                ok = all(results) if name == "ALL" else any(results)
                if not ok:
                    raise _NoMatch
                return
            # type matcher
            self._matcher(pattern, value, refs, ancestors)
            return
        raise _NoMatch

    def _len(self, pattern: ast.Call, value) -> None:
        if not isinstance(value, list):
            raise _NoMatch
        lo, hi = None, None
        args = [a.value for a in pattern.args if isinstance(a, ast.Constant)]
        if len(args) >= 1:
            lo = args[0]
        if len(args) >= 2:
            hi = args[1]
        for kw in pattern.keywords:
            if isinstance(kw.value, ast.Constant):
                if kw.arg == "min":
                    lo = kw.value.value
                elif kw.arg == "max":
                    hi = kw.value.value
        n = len(value)
        if lo is not None and n < lo:
            raise _NoMatch
        if hi is not None and n > hi:
            raise _NoMatch

    def _matcher(self, pattern: ast.Call, value, refs: dict, ancestors) -> None:
        type_name = pattern.func.id
        if not isinstance(value, ast.AST) or type(value).__name__ != type_name:
            raise _NoMatch
        fields = type(value)._fields
        for i, arg in enumerate(pattern.args):
            if i >= len(fields):
                raise _NoMatch
            self._field(value, fields[i], arg, refs, ancestors)
        for kw in pattern.keywords:
            if kw.arg == "__metadata__":
                self._meta(kw.value, ancestors)
                continue
            if kw.arg is None:
                continue
            self._field(value, kw.arg, kw.value, refs, ancestors)

    def _field(self, node: ast.AST, fld: str, pattern, refs, ancestors) -> None:
        if not hasattr(node, fld):
            raise _NoMatch
        self._value(pattern, getattr(node, fld), refs, ancestors)

    def _meta(self, pattern, ancestors) -> None:
        """META(parent=P(field=...)): some ancestor edge is (P, field);
        with no field, any edge from a P ancestor (functions.py:97-110)."""
        if not (isinstance(pattern, ast.Call) and pattern.func.id == "META"):  # type: ignore[union-attr]
            raise _NoMatch
        for kw in pattern.keywords:
            if kw.arg != "parent" or not isinstance(kw.value, ast.Call):
                continue
            p = kw.value.func.id  # type: ignore[union-attr]
            wanted_fields = [k.arg for k in kw.value.keywords if k.arg]
            ok = any(
                anc == p and (not wanted_fields or fld in wanted_fields)
                for anc, fld in ancestors
            )
            if not ok:
                raise _NoMatch

    def _sequence(self, patterns: list, values: list, refs, ancestors) -> None:
        """Positional list match with `*...` gaps (codegen.py:139-185),
        with backtracking (gaps may absorb 0..n items)."""

        def rec(pi: int, vi: int, refs: dict) -> bool:
            if pi == len(patterns):
                return vi == len(values)
            pat = patterns[pi]
            if isinstance(pat, ast.Starred):  # *...
                for skip in range(len(values) - vi + 1):
                    trial = dict(refs)
                    if rec(pi + 1, vi + skip, trial):
                        refs.clear()
                        refs.update(trial)
                        return True
                return False
            if vi >= len(values):
                return False
            trial = dict(refs)
            try:
                self._value(pat, values[vi], trial, ancestors)
            except _NoMatch:
                return False
            if rec(pi + 1, vi + 1, trial):
                refs.clear()
                refs.update(trial)
                return True
            return False

        if not rec(0, 0, refs):
            raise _NoMatch


def _ref_key(value):
    """~ref equality: strings by value, AST nodes by structural tag
    (codegen.py:108-114, transformers.py:48-69)."""
    if isinstance(value, ast.AST):
        return ("tag", structural_tag(value))
    return ("val", repr(value))


class _Span(ast.AST):
    """Bare position carrier for ast.get_source_segment (the reference
    builds the same shim, reiz/fetch.py:40-41 LocationNode)."""

    _attributes = ("lineno", "col_offset", "end_lineno", "end_col_offset")


def match_spans(source: str, query_source: str) -> list[tuple]:
    """Every structural match as (lineno, col_offset, end_lineno,
    end_col_offset, segment) — the reference's result projection
    (reiz/fetch.py:14-29 selects exactly these positions;
    fetch.py:63-67 slices the stored source with
    ast.get_source_segment(..., padded=True)). Decorated defs carry the
    reference's position widening (transformers.py:161-165): lineno =
    the first decorator's line and col_offset = the column of its '@',
    so the reported segment includes the decorators."""
    tree = ast.parse(source)
    matcher = Matcher(query_source)
    hits: list[tuple] = []
    seen: set[tuple] = set()
    stack: list[tuple[ast.AST, tuple]] = [(tree, ())]
    while stack:
        node, ancestors = stack.pop()
        if hasattr(node, "lineno") and matcher.match(node, ancestors):
            lineno = node.lineno
            col = node.col_offset
            deco = getattr(node, "decorator_list", None)
            if deco:
                lineno = deco[0].lineno
                col = max(deco[0].col_offset - 1, 0)  # the '@'
            end_lineno = getattr(node, "end_lineno", node.lineno) or node.lineno
            key = (lineno, col, end_lineno,
                   getattr(node, "end_col_offset", 0) or 0)
            if key in seen:
                continue
            seen.add(key)
            segment = ast.get_source_segment(
                source,
                _Span(lineno=key[0], col_offset=key[1],
                      end_lineno=key[2], end_col_offset=key[3]),
                padded=True,
            )
            hits.append((*key, segment))
        name = type(node).__name__
        for fld, value in ast.iter_fields(node):
            children = value if isinstance(value, list) else [value]
            for child in children:
                if isinstance(child, ast.AST):
                    stack.append((child, ancestors + ((name, fld),)))
    return sorted(hits)


def match_lines(source: str, query_source: str) -> set[int]:
    """All line numbers where the query structurally matches, with the
    reference's decorated-def position widening (transformers.py:161-170)."""
    return {h[0] for h in match_spans(source, query_source)}


def annotated_tp_lines(source: str) -> set[int]:
    """Collect `# tp: N` golden annotations (the `# reiz: tp` analog)."""
    hits: set[int] = set()
    for line in source.splitlines():
        if "# tp:" in line:
            hits.add(int(line.split("# tp:")[1].strip().split()[0]))
    return hits
