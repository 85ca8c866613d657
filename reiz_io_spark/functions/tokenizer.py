"""AST tokenizer: Python source -> bag of structural terms.

Reproduces the reference's structural vocabulary — every AST node of a
file becomes searchable (reference stores one EdgeDB object per node,
reiz/serialization/serializer.py:88-97; we flatten to terms):

- ``node:<Constructor>``  for every AST node, including operator/context
  enum members (Add, Load, ...) which the reference models as enum types
  (static/Python-reiz.asdl:108-116).
- ``id:<name>``           for identifier-typed fields (Name.id,
  FunctionDef.name, Attribute.attr, arg.arg, keyword.arg, alias.name, ...)
  mirroring the ASDL identifier fields (static/Python-reiz.asdl:51-104).
- ``idci:<lower(name)>``  case-folded identifier terms backing the
  reference's ILIKE / I(f"...") matcher (reiz/reizql/compiler/functions.py:59-65).
- ``lit:<repr(value)>``   for Constant.value, repr-canonicalized exactly
  as the reference stores constants (reiz/serialization/transformers.py:172-174).
- ``in:<Ancestor>.<field>`` one term per distinct (ancestor type, field)
  edge over ALL ancestors of each node — the flattened `_parent_types`
  annotation (reiz/serialization/transformers.py:144-151) that backs
  META(parent=...) queries (reiz/reizql/compiler/functions.py:97-110).

Files that fail ast.parse yield zero terms but are still counted
(parse_ok=False), mirroring Insertion.SKIPPED
(reiz/serialization/statistics.py:7-12, sanitize_dataset.py:15-25).

The same pure-Python ``tokenize_source`` feeds both the Spark pandas UDF
(batched via Arrow — no per-row Python at the Spark API surface) and the
single-node oracle, so rank-identity is anchored to one tokenizer.
"""

from __future__ import annotations

import ast
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf

from ..schema import TOKENIZED

# Identifier-typed ASDL fields (static/Python-reiz.asdl:51-104).
IDENTIFIER_FIELDS: dict[str, tuple[str, ...]] = {
    "Name": ("id",),
    "FunctionDef": ("name",),
    "AsyncFunctionDef": ("name",),
    "ClassDef": ("name",),
    "Attribute": ("attr",),
    "arg": ("arg",),
    "keyword": ("arg",),
    "alias": ("name", "asname"),
    "ImportFrom": ("module",),
    "Global": ("names",),
    "Nonlocal": ("names",),
    "ExceptHandler": ("name",),
}

# Fields excluded from the structural tag, mirroring tag_exclusions
# (static/Python-reiz.asdl:3). Still tokenized as node:/in: terms.
TAG_EXCLUSIONS = frozenset({"ctx", "type_comment", "simple"})


def tokenize_source(content: str) -> tuple[Counter[str], bool]:
    """Tokenize one Python source file. Returns (term->tf bag, parse_ok)."""
    try:
        tree = ast.parse(content)
    except (SyntaxError, ValueError, MemoryError, RecursionError):
        return Counter(), False
    # Iterative DFS carrying the ancestor-edge set per node (the reference
    # computes the same set recursively, transformers.py:144-151).
    # Hot-path notes: ancestor sets carry pre-rendered "in:P.f" strings
    # (rendered once per distinct edge via edge_str); the child set is
    # built once per FIELD, not per child — siblings share it; and terms
    # are appended to a flat list counted ONCE at the end (C-speed
    # Counter(list) beats per-term dict increments).
    out: list[str] = []
    ap = out.append
    edge_str: dict[tuple[str, str], str] = {}
    stack: list[tuple[ast.AST, frozenset[str]]] = [(tree, frozenset())]
    while stack:
        node, ancestors = stack.pop()
        name = type(node).__name__
        ap("node:" + name)
        out.extend(ancestors)
        ident_fields = IDENTIFIER_FIELDS.get(name)
        if ident_fields:
            for fld in ident_fields:
                val = getattr(node, fld, None)
                if isinstance(val, str):
                    ap("id:" + val)
                    ap("idci:" + val.lower())
                elif isinstance(val, list):  # Global/Nonlocal.names
                    for v in val:
                        if isinstance(v, str):
                            ap("id:" + v)
                            ap("idci:" + v.lower())
        if name == "Constant":
            ap("lit:" + repr(node.value))
        for fld, value in ast.iter_fields(node):
            if isinstance(value, ast.AST):
                children = (value,)
            elif isinstance(value, list):
                children = tuple(c for c in value if isinstance(c, ast.AST))
                if not children:
                    continue
            else:
                continue
            edge = (name, fld)
            s = edge_str.get(edge)
            if s is None:
                s = edge_str[edge] = "in:" + name + "." + fld
            child_anc = ancestors if s in ancestors else ancestors | {s}
            for child in children:
                stack.append((child, child_anc))
    return Counter(out), True


def structural_tag(node: ast.AST) -> int:
    """Deterministic 63-bit structural hash of a node — the reference's
    ``_tag`` (reiz/serialization/transformers.py:48-69,143) but with a
    stable hash: Python's builtin hash() is process-salted, which would
    break cross-partition ~ref equality (SURVEY.md §7.4)."""
    import hashlib

    def canonical(n: object) -> object:
        if isinstance(n, ast.AST):
            fields = []
            for fld, value in ast.iter_fields(n):
                if fld in TAG_EXCLUSIONS:
                    continue
                fields.append((fld, canonical(value)))
            return (type(n).__name__, tuple(fields))
        if isinstance(n, list):
            return tuple(canonical(x) for x in n)
        return repr(n)

    blob = repr(canonical(node)).encode("utf-8")
    return int.from_bytes(hashlib.sha256(blob).digest()[:8], "big") >> 1


@pandas_udf(TOKENIZED)
def tokenize_udf(content: pd.Series) -> pd.DataFrame:
    """Arrow-batched scalar pandas UDF: content -> {terms, n_terms, parse_ok}.

    Aggregating tf per document INSIDE the UDF is the map-side combine for
    the whole pipeline: the (term, doc, tf) triples leave the scan already
    reduced, so the only shuffle the index build needs is the final
    repartition-by-term-range. At 10^12 files this removes the
    explode->groupBy(term, doc) shuffle entirely.
    """
    out_terms: list[dict[str, int]] = []
    out_n: list[int] = []
    out_ok: list[bool] = []
    for text in content:
        bag, ok = tokenize_source(text if isinstance(text, str) else "")
        out_terms.append(dict(bag))
        out_n.append(int(sum(bag.values())))
        out_ok.append(ok)
    return pd.DataFrame({"terms": out_terms, "n_terms": out_n, "parse_ok": out_ok})


def with_tokens(df, content_col: str = "content"):
    """corpus df -> df + (terms, n_terms, parse_ok) columns."""
    tok = tokenize_udf(F.col(content_col))
    return (
        df.withColumn("_tok", tok)
        .withColumn("terms", F.col("_tok.terms"))
        .withColumn("n_terms", F.col("_tok.n_terms"))
        .withColumn("parse_ok", F.col("_tok.parse_ok"))
        .drop("_tok")
    )
