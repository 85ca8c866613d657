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


# Per-AST-class static info, filled lazily: (pre-rendered "node:<T>"
# term, identifier-field tuple or None, is_Constant, _fields tuple).
# One dict lookup replaces type-name rendering, IDENTIFIER_FIELDS
# probing and ast.iter_fields' generator machinery per node (r8: the
# walk, not ast.parse, was ~2/3 of tokenizer time at ~1.2k nodes/file).
_TYPE_INFO: dict[type, tuple[str, tuple[str, ...] | None, bool, tuple[str, ...]]] = {}


def tokenize_source(content: str) -> tuple[Counter[str], bool]:
    """Tokenize one Python source file. Returns (term->tf bag, parse_ok)."""
    try:
        tree = ast.parse(content)
    except (SyntaxError, ValueError, MemoryError, RecursionError):
        return Counter(), False
    # Iterative DFS carrying the ancestor-edge set per node (the reference
    # computes the same set recursively, transformers.py:144-151).
    # Hot-path notes (r8 rewrite, same output multiset):
    # - per-type info is cached in _TYPE_INFO: one dict lookup replaces
    #   type-name rendering + IDENTIFIER_FIELDS probe + the
    #   ast.iter_fields generator per node, and leaf enum nodes (Load,
    #   Add, ... — roughly half of all nodes) exit via the no-fields
    #   fast path;
    # - ancestor terms go through out.extend(frozenset) — C-speed
    #   iteration (an id-keyed per-set usage-counting variant was
    #   measured 10% SLOWER: set sharing across bodies is too low to
    #   beat extend);
    # - terms append to a flat list counted once at the end (C-speed
    #   Counter(list) beats per-term dict increments).
    out: list[str] = []
    ap = out.append
    ext = out.extend
    edge_str: dict[tuple[str, str], str] = {}
    empty: frozenset[str] = frozenset()
    stack: list[tuple[ast.AST, frozenset[str]]] = [(tree, empty)]
    pop = stack.pop
    push = stack.append
    tinfo = _TYPE_INFO
    isinst = isinstance
    AST = ast.AST
    while stack:
        node, ancestors = pop()
        cls = node.__class__
        info = tinfo.get(cls)
        if info is None:
            nm = cls.__name__
            info = tinfo[cls] = (
                "node:" + nm,
                IDENTIFIER_FIELDS.get(nm),
                nm == "Constant",
                cls._fields,
            )
        node_term, ident_fields, is_const, fields = info
        ap(node_term)
        if ancestors:
            ext(ancestors)
        if not fields:
            continue  # leaf enum node (Load, Store, Add, ...)
        if ident_fields:
            for fld in ident_fields:
                val = getattr(node, fld, None)
                if isinst(val, str):
                    ap("id:" + val)
                    ap("idci:" + val.lower())
                elif isinst(val, list):  # Global/Nonlocal.names
                    for v in val:
                        if isinst(v, str):
                            ap("id:" + v)
                            ap("idci:" + v.lower())
        if is_const:
            ap("lit:" + repr(node.value))
        name = node_term[5:]
        for fld in fields:
            value = getattr(node, fld, None)
            if isinst(value, AST):
                children = (value,)
            elif isinst(value, list):
                children = [c for c in value if isinst(c, AST)]
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
                push((child, child_anc))
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


def _tokenize_batches(content_col: str):
    """mapInArrow kernel: tokenize each batch, building the terms MAP
    column from flat key/value/offset arrays (one MapArray.from_arrays
    call per batch) instead of a pandas Series of Python dicts — the
    dict-per-row -> Arrow map conversion was the single biggest
    non-tokenize cost of the build's docs phase (r8 probe: the
    pandas_udf path spent ~2x tokenize_source's own time in the
    boundary). The content column is consumed here and NOT emitted —
    the docs table never carries it, so the raw bytes cross the
    boundary once, inbound only (guide §4.1/§4.2)."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            keys: list[str] = []
            vals: list[int] = []
            offsets = [0]
            n_terms: list[int] = []
            ok_list: list[bool] = []
            for v in batch.column(content_col):
                s = v.as_py()
                bag, ok = tokenize_source(s if isinstance(s, str) else "")
                keys.extend(bag.keys())
                vals.extend(bag.values())
                offsets.append(len(keys))
                n_terms.append(sum(bag.values()))
                ok_list.append(ok)
            cols = {
                name: batch.column(name)
                for name in batch.schema.names
                if name != content_col
            }
            cols["terms"] = pa.MapArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(keys, pa.string()),
                pa.array(vals, pa.int64()),
            )
            cols["n_terms"] = pa.array(n_terms, pa.int64())
            cols["parse_ok"] = pa.array(ok_list, pa.bool_())
            yield pa.RecordBatch.from_pydict(cols)

    return run

def with_tokens(df, content_col: str = "content"):
    """corpus df -> df + (terms, n_terms, parse_ok) columns; the
    content column itself is dropped (no current caller keeps it, and
    emitting it would ship the corpus bytes back out of Python)."""
    from pyspark.sql.types import (
        BooleanType, LongType, MapType, StringType, StructField, StructType,
    )

    out_fields = [
        f for f in df.schema.fields if f.name != content_col
    ] + [
        StructField("terms", MapType(StringType(), LongType())),
        StructField("n_terms", LongType()),
        StructField("parse_ok", BooleanType()),
    ]
    return df.mapInArrow(
        _tokenize_batches(content_col), StructType(out_fields)
    )
