"""Deterministic synthetic source-code corpus (seed-fixed, no external data).

Mirrors the reference's test strategy: an annotated golden dataset
ingested as one fake project (reference tests/runner.py:116-122) plus
filler. Golden files are OUR OWN snippets, one per reference query
(paths mirror tests/queries/{simple,complex}/<name>), each crafted so
the query's lowered term conjunction matches it; `# tp: N` comments
document the structurally-matching line numbers asserted by the
structural-matcher tests (the analog of `# reiz: tp`,
tests/runner.py:152-178).

Filler files draw identifiers from a Zipfian vocabulary so hot terms
(`id:self`, `node:Name`, ...) dominate — this is what exercises the
skew-salting path at bench scale. A slice of filler rows fails
ast.parse and a slice is lang != "python", exercising the sanitize /
SKIPPED paths (reference sanitize_dataset.py:15-25,
serialization/statistics.py:7-12).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from ..schema import CORPUS

# --- golden snippets -------------------------------------------------------
# One per reference query (tests/queries/**). Written from scratch; the
# `# tp: ...` markers annotate lines the ReizQL pattern structurally
# matches (verified by plans/matcher.py in tests).

GOLDEN_FILES: dict[str, str] = {
    "simple/and_matcher.py": '''\
def shim(flag):
    if flag:  # tp: 2
        total = 1
        extra = total + 1
        return extra
    while flag:
        other = 2
''',
    "simple/annotated_functions.py": '''\
def plain_helper(x):
    return x

def typed_helper(x) -> int:  # tp: 4
    return x + 1
''',
    "simple/any_number_of_stmts.py": '''\
def tiny():  # tp: 1
    pass
''',
    "simple/arguments.py": '''\
def mixed(bar, /, baz):  # tp: 1
    return bar + baz

def other(qux):
    return qux
''',
    "simple/call.py": '''\
def runner(foo):
    handle(foo, bar=3)  # tp: 2
    handle(foo)
''',
    "simple/caseless_match.py": '''\
def A_FOO_shim():  # tp: 1
    return 0

def unrelated():
    return 1
''',
    "simple/classmethod.py": '''\
class Widget:
    @classmethod
    def build(cls):  # tp: 2
        return cls()

    def plain(self):
        return self
''',
    "simple/extended_list_matcher.py": '''\
def walker(items):
    for item in items:  # tp: 2
        continue
        total = item
''',
    "simple/len_matcher.py": '''\
def gate(flag):
    if flag:  # tp: 2
        first = 1
        second = first
''',
    "simple/len_range_matcher.py": '''\
def gate(flag):
    if flag:  # tp: 2
        first = 1
        second = first
        third = second
''',
    "simple/not_constant.py": '''\
def fetch(source):
    return source  # tp: 2

def fixed():
    return 42
''',
    "simple/simple_formatted_name_match.py": '''\
def ___foo_helper():  # tp: 1
    return None

def foo_helper():
    return None
''',
    "simple/simple_name_match.py": '''\
value = compute  # tp: 1
''',
    "simple/try_except.py": '''\
def guarded(job):
    try:  # tp: 2
        job()
    except ValueError:
        raise
    except:
        pass
''',
    "simple/type_or.py": '''\
def picker(a, b):
    return a  # tp: 2

def tupler(a, b):
    return (a, b)  # tp: 5

def caller(a):
    return a()
''',
    "complex/ast_parse.py": '''\
import ast

def load_tree(path):
    with open(path) as stream:  # tp: 4
        tree = ast.parse(stream.read())
    return tree
''',
    "complex/complex_lists.py": '''\
@outer
def orchestrate(flag, rows):  # tp: 1
    @wrap(make(builder), helper)
    def inner():
        return 0
    if flag:
        for row in rows:
            return fetch()
''',
    "complex/does_not_return_name_tuple.py": '''\
def splitter(a, b):  # tp: 1
    total = a + b
    return (a, total + 1)

def clean(a, b):
    return (a, b)
''',
    "complex/expression_reference.py": '''\
def cycle(job):
    job()  # tp: 1
    marker = 1
    return job()
''',
    "complex/ignore_expr.py": '''\
def adder(make, x, y):
    return make(x, y) + 2  # tp: 2

def skewed(make, x):
    return make(x) + 9
''',
    "complex/metadata_parent.py": '''\
def gate(flag):
    if something():  # tp: 2
        return 1
    something()
''',
    "complex/metadata_parent_on_sequence.py": '''\
def gate(flag):
    if flag:
        func()  # tp: 3
    return func
''',
    "complex/nested_list.py": '''\
class Service:  # tp: 1
    @classmethod
    def create(cls):
        return cls()

    def use(self):
        return self
''',
    "complex/nested_reference_query.py": '''\
class Runner:  # tp: 1
    def loop(self):
        setup = 1
        loop(self)

    def other(self):
        return self
''',
    # true-negative fixture (like the reference's): a bare Call matcher in
    # a body list can never match an Expr statement — zero tp lines.
    "complex/nonlocal_access.py": '''\
@tick
def tick():
    tick(marker)
    if marker:
        probe()
    return probe()
''',
    "complex/nested_sub_level_reference.py": '''\
def chooser(value):  # tp: 1
    if value:
        return value
    marker = 1
''',
    "complex/single_top_level_reference.py": '''\
def echo():  # tp: 1
    marker = 1
    return echo()
''',
}

GOLDEN_REPO = "synth/golden"

# Zipfian identifier vocabulary for filler files: `self`, `data`, ... are
# the hot terms; the tail is generated.
_HOT_IDENTS = ["self", "data", "value", "result", "name", "obj", "items", "key"]
_FUNC_TEMPLATES = [
    "def {fn}({a}, {b}):\n    {c} = {a} + {b}\n    return {c}\n",
    "def {fn}({a}):\n    if {a}:\n        return {a}\n    return None\n",
    "class {cls}:\n    def {fn}(self, {a}):\n        self.{b} = {a}\n        return self.{b}\n",
    "def {fn}({a}):\n    try:\n        return {b}({a})\n    except ValueError:\n        return None\n",
    "def {fn}({a}):\n    for {b} in {a}:\n        {c}({b})\n    return len({a})\n",
    "@{d}\ndef {fn}({a}) -> int:\n    return {b}({a}, {a})\n",
    "def {fn}():\n    with open({a!r}) as fh:\n        return fh.read()\n",
    "def {fn}({a}, {b}=2):\n    return {a} * {b} + 1\n",
]


def _zipf_vocab(rng: random.Random, size: int = 400) -> list[str]:
    tail = [f"ident_{i:04d}" for i in range(size)]
    return _HOT_IDENTS + tail


def _zipf_pick(rng: random.Random, vocab: list[str]) -> str:
    # Zipf-ish: rank r with p ∝ 1/(r+1); inverse-CDF via power of uniform.
    r = int(len(vocab) * (rng.random() ** 3.0))
    return vocab[min(r, len(vocab) - 1)]


def synth_filler_file(rng: random.Random, vocab: list[str], n_defs: int) -> str:
    parts = []
    for _ in range(n_defs):
        tpl = rng.choice(_FUNC_TEMPLATES)
        parts.append(
            tpl.format(
                fn=_zipf_pick(rng, vocab) + "_" + format(rng.randrange(16**4), "04x"),
                cls="C" + format(rng.randrange(16**4), "04x"),
                a=_zipf_pick(rng, vocab),
                b=_zipf_pick(rng, vocab),
                c=_zipf_pick(rng, vocab),
                d=_zipf_pick(rng, vocab),
            )
        )
    return "\n".join(parts)


def synth_corpus_rows(
    n_filler: int = 200,
    seed: int = 42,
    broken_every: int = 23,
    nonpython_every: int = 31,
    include_golden: bool = True,
) -> list[tuple[str, str, str, str, str]]:
    """Deterministic corpus rows (repo, path, commit, lang, content)."""
    rng = random.Random(seed)
    vocab = _zipf_vocab(rng)
    rows: list[tuple[str, str, str, str, str]] = []
    if include_golden:
        for path, content in sorted(GOLDEN_FILES.items()):
            commit = format(rng.getrandbits(160), "040x")
            rows.append((GOLDEN_REPO, "dataset/" + path, commit, "python", content))
    for i in range(n_filler):
        repo = f"synth/repo{i % 17:03d}"
        path = f"pkg_{i // 17:03d}/mod_{i:05d}.py"
        commit = format(rng.getrandbits(160), "040x")
        content = synth_filler_file(rng, vocab, n_defs=1 + rng.randrange(6))
        lang = "python"
        if nonpython_every and i % nonpython_every == 7:
            lang = "text"
        elif broken_every and i % broken_every == 11:
            content = content + "\ndef broken(:\n  ???\n"
        rows.append((repo, path, commit, lang, content))
    return rows


def synth_corpus(spark: SparkSession, n_filler: int = 200, seed: int = 42, **kw) -> DataFrame:
    rows = synth_corpus_rows(n_filler=n_filler, seed=seed, **kw)
    return spark.createDataFrame(rows, CORPUS)


def synth_corpus_distributed(
    spark: SparkSession,
    n_files: int,
    seed: int = 42,
    defs_low: int = 10,
    defs_high: int = 40,
    n_partitions: int | None = None,
) -> DataFrame:
    """Executor-side deterministic corpus generation for bench scale:
    each file is generated from rng(seed, file_index), so the corpus is
    identical at any parallelism level — the scaling-bench requirement —
    without driver-side string building or a 100-TB upload."""
    import pandas as pd

    n_partitions = n_partitions or max(32, n_files // 2000)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = random.Random((seed << 20) ^ int(i))
                vocab = _HOT_IDENTS + [f"ident_{rng.randrange(400):04d}" for _ in range(8)]
                content = synth_filler_file(
                    rng, vocab, n_defs=defs_low + rng.randrange(defs_high - defs_low + 1)
                )
                rows.append(
                    (
                        f"synth/repo{int(i) % 257:03d}",
                        f"pkg_{int(i) // 257:04d}/mod_{int(i):07d}.py",
                        format(rng.getrandbits(160), "040x"),
                        "python",
                        content,
                    )
                )
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return (
        spark.range(n_files)
        .repartition(n_partitions)
        .mapInPandas(gen, schema=CORPUS)
    )


def parse_table_ref(ref: str) -> tuple[str, dict[str, str]]:
    """``<catalog.db.name>[@snapshot=<id> | @ts=<millis>]`` ->
    (table name, Iceberg read options). The option names are Iceberg's
    own (`snapshot-id`, `as-of-timestamp`); non-Iceberg sources ignore
    them, so the same code path serves both."""
    name, _, pin = ref.partition("@")
    if not name:
        raise ValueError(f"empty table name in table:{ref!r}")
    opts: dict[str, str] = {}
    if pin:
        key, _, val = pin.partition("=")
        if key == "snapshot" and val:
            opts["snapshot-id"] = val
        elif key == "ts" and val:
            opts["as-of-timestamp"] = val
        else:
            raise ValueError(
                f"bad table pin {pin!r} (want @snapshot=<id> or @ts=<millis>)"
            )
    return name, opts


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a corpus table. Parquet path, or ``table:<name>`` for a
    catalog table — when the session is configured with an Iceberg
    catalog (spark.sql.catalog.<name> = o.a.iceberg.spark.SparkCatalog)
    this is a real Iceberg read, and ``@snapshot=<id>`` /
    ``@ts=<millis>`` pin the snapshot (Iceberg time travel). Against
    the plain session catalog the same call reads the table's current
    state and the pin options are inert — one code path, no fallback
    branch to drift."""
    if path.startswith("table:"):
        name, opts = parse_table_ref(path[len("table:"):])
        reader = spark.read
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.table(name)
    return spark.read.schema(CORPUS).parquet(path)
