"""Regex search: factor analyzer guarantees, one-shot path vs the
DuckDB twin, trigram-sidecar grep vs the defining brute-force scan.

Reference parity: the reference reaches content patterns only via LIKE
markers (reiz/ir/backends/edgeql.py:105-108); grep-grade regex over raw
sources is the remaining fulltext-index-tier capability, built here in
the Google-Code-Search / Zoekt shape (literal-factor prefilter +
trigram posting intersection + verify)."""

from __future__ import annotations

import json
import os
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators import regexsearch as rx

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# factor analyzer
# --------------------------------------------------------------------------

def _alts(pattern):
    dnf, _ = rx.analyze(pattern)
    return None if dnf is None else sorted(sorted(a) for a in dnf)


def test_analyze_literal():
    assert _alts("spark") == [["spark"]]


def test_analyze_concat_breaks_on_class():
    # class contributes nothing; both literal runs required
    assert _alts(r"def [a-z]+_handler") == [["_handler", "def "]]


def test_analyze_alternation():
    assert _alts(r"(join|window)") == [["join"], ["window"]]


def test_analyze_alternation_distributes():
    assert _alts(r"spark (join|window)") == [
        ["join", "spark "],
        ["spark ", "window"],
    ]


def test_analyze_unconstrained_branch_poisons_or():
    # `.*` branch can match with no literal evidence
    assert _alts(r"(join|.*)") is None


def test_analyze_star_contributes_nothing_plus_does():
    assert _alts(r"(foo)*bar") == [["bar"]]
    assert _alts(r"(foo)+bar") == [["bar", "foo"]]


def test_analyze_short_factors_dropped():
    assert _alts(r"ab") is None  # shorter than a trigram
    assert _alts(r"ab|xyz") is None  # one branch unconstrained -> None


def test_analyze_case_insensitive_folds():
    dnf, fold = rx.analyze(r"(?i)Spark")
    assert fold is True
    assert sorted(sorted(a) for a in dnf) == [["spark"]]


def test_analyze_invalid_pattern_raises():
    with pytest.raises(re.error):
        rx.analyze("(unclosed")


@pytest.mark.parametrize(
    "pattern",
    [
        r"spark",
        r"def [a-z]+_handler",
        r"(join|window) function",
        r"import (numpy|pandas)",
        r"(?i)Spark SQL",
        r"wind(ow)+s?",
        r"^from \w+ import",
    ],
)
def test_analyze_factors_are_necessary(pattern):
    """Soundness: any string matching the pattern contains every factor
    of at least one alternative (the analyzer's one guarantee)."""
    dnf, fold = rx.analyze(pattern)
    if dnf is None:
        return
    samples = [
        "spark join function over windows",
        "def on_click_handler(x): pass",
        "import pandas as pd",
        "from collections import deque",
        "SPARK SQL window function",
        "windowowows",
    ]
    creg = re.compile(pattern)
    for s in samples:
        if creg.search(s):
            probe = s.lower() if fold else s
            assert any(all(f in probe for f in alt) for alt in dnf), (
                pattern,
                s,
            )


# --------------------------------------------------------------------------
# one-shot path over documents (vs brute rlike and vs the DuckDB twin)
# --------------------------------------------------------------------------

PATTERNS = [
    r"the [a-z]+ of",
    r"(data|model) training",
    r"quick.*fox",  # factors on both sides of .*
    r"[0-9]{4}",  # no factors -> full-scan fallback
    r"lorem ipsum",
]


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()
    )


@pytest.mark.parametrize("pattern", PATTERNS)
def test_regex_search_equals_brute(spark, docs, pattern):
    got = rx.regex_search(docs, pattern).orderBy("doc_id").collect()
    want = (
        docs.filter(F.col("text").rlike(pattern))
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(pattern), F.lit(0))
            ).alias("n_matches"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_regex_search_matches_duckdb(spark, docs, pattern):
    got = [tuple(r) for r in rx.regex_search(docs, pattern).orderBy("doc_id").collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    want = con.execute(rx.regex_search_sql(pattern)).fetchall()
    assert got == [(int(a), int(b)) for a, b in want]


def test_regex_search_prefilter_is_jvm_pushed(spark, docs, pattern=r"lorem ipsum"):
    """Factors must reach the scan as data filters (StringContains),
    and the verify rlike must not add any Python stage."""
    plan = rx.regex_search(docs, pattern)._jdf.queryExecution().executedPlan().toString()
    assert "Contains" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------------------------------------
# trigram sidecar over the code index
# --------------------------------------------------------------------------

GREP_PATTERNS = [
    r"def [a-z_]+\(",  # factor 'def ' — hot trigram, salted
    r"return (None|self)",
    r"class \w+:",
    r"(?i)IMPORT",  # caseless -> case-variant trigram groups
    r"(?i)Class [A-Z]\w+",  # caseless two-factor, mixed-case corpus hits
    r"[0-9]+",  # no factors -> brute fallback path inside grep_index
]


@pytest.fixture(scope="module")
def trigram_index(spark, built_index):
    index_dir, _ = built_index
    tmeta = rx.build_trigram_index(spark, index_dir)
    return index_dir, tmeta


def test_sidecar_meta_records_index_version(trigram_index):
    index_dir, tmeta = trigram_index
    with open(os.path.join(index_dir, "meta.json")) as fh:
        assert tmeta["index_version"] == json.load(fh)["version"]


@pytest.mark.parametrize("decode_max", [rx.DRIVER_DECODE_MAX, 0])
@pytest.mark.parametrize("pattern", GREP_PATTERNS)
def test_grep_index_equals_bruteforce(spark, trigram_index, pattern, decode_max):
    """Both candidate paths (driver-side numpy intersect and the
    distributed decode, forced via decode_max=0) equal the defining
    full scan row-for-row."""
    index_dir, _ = trigram_index
    got = sorted(
        tuple(r)
        for r in rx.grep_index(
            spark, index_dir, pattern, driver_decode_max=decode_max
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in rx.grep_bruteforce(spark, index_dir, pattern).collect()
    )
    assert got == want
    assert len(want) > 0 or pattern == GREP_PATTERNS[-1]


def test_case_variants_expansion():
    """'abc' -> 8 variants; digits/punct bytes stay fixed; folded input
    invariance (variants of any variant's fold == same group)."""
    tg = rx.trigrams_of("abc")[0]
    vs = rx._case_variants(tg)
    assert len(vs) == 8 and tg in vs
    assert rx.trigrams_of("ABC")[0] in vs
    assert rx.trigrams_of("aBc")[0] in vs
    tg2 = rx.trigrams_of("a_1")[0]
    vs2 = rx._case_variants(tg2)
    assert vs2 == tuple(sorted([tg2, rx.trigrams_of("A_1")[0]]))


def test_grep_index_caseless_uses_sidecar(spark, trigram_index):
    """A caseless selective grep must go through the sidecar (candidate
    IN filter in the plan, not a full content scan) and still equal the
    brute scan — the case-variant group expansion at work."""
    index_dir, _ = trigram_index
    pat = r"(?i)def a_foo"
    df = rx.grep_index(spark, index_dir, pat)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a 1-element candidate set compiles to EqualTo instead of INSET
    assert (
        "INSET" in plan
        or "In(doc_id" in plan
        or "EqualTo(doc_id" in plan
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(
        map(tuple, rx.grep_bruteforce(spark, index_dir, pat).collect())
    )
    assert got == want and len(want) > 0


def test_grep_index_absent_trigram_answers_empty_cheaply(spark, trigram_index):
    """A required trigram in no document proves 0 rows — the plan never
    touches the content table."""
    index_dir, _ = trigram_index
    df = rx.grep_index(spark, index_dir, r"zqxjkvbnzzz")
    assert df.count() == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


def test_grep_index_postings_scan_prunes_buckets(spark, trigram_index):
    """Distributed path (forced): the postings read must carry bucket
    partition filters and a tg pushdown — a selective grep reads
    fragments, not the sidecar."""
    index_dir, _ = trigram_index
    df = rx.grep_index(
        spark, index_dir, r"def [a-z_]+_helper", driver_decode_max=0
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_grep_index_driver_path_pushes_isin_filter(spark, trigram_index):
    """Serving shape: postings decoded driver-side and the candidate
    set pushed into the content scan as an IN filter — the final plan
    holds NO postings scan and NO semi join, just filter + verify +
    metadata join."""
    index_dir, _ = trigram_index
    df = rx.grep_index(spark, index_dir, r"def [a-z_]+_helper")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "trigrams" not in plan  # postings were consumed pre-plan
    assert "LeftSemi" not in plan
    assert "INSET" in plan or "In(doc_id" in plan


def test_grep_index_posting_cache_serves_repeat_queries(spark, trigram_index):
    """Second identical grep resolves its trigram postings from the
    warm cache (no new entries added) and returns the same rows."""
    index_dir, _ = trigram_index
    pat = r"class [A-Za-z_]+:"
    first = sorted(map(tuple, rx.grep_index(spark, index_dir, pat).collect()))
    n_entries = len(rx._POSTING_CACHE)
    again = sorted(map(tuple, rx.grep_index(spark, index_dir, pat).collect()))
    assert again == first
    assert len(rx._POSTING_CACHE) == n_entries


def test_grep_index_refuses_stale_sidecar(spark, trigram_index):
    """Staleness = content batches the sidecar has not folded. A bare
    snapshot-version bump (what a delete/compact commit does) adds no
    content and must NOT invalidate the sidecar (r6 deletes tier)."""
    index_dir, _ = trigram_index
    meta_path = os.path.join(index_dir, "meta.json")
    tg_meta_path = os.path.join(index_dir, "trigrams", "meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    with open(tg_meta_path) as fh:
        tmeta = json.load(fh)

    # 1) version drift WITHOUT content drift: still fresh
    bumped = dict(meta, version=str(meta["version"]) + "-newer")
    with open(meta_path, "w") as fh:
        json.dump(bumped, fh)
    try:
        rx.grep_index(spark, index_dir, r"def main").count()  # no raise
    finally:
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)

    # 2) content drift (sidecar covers fewer batches than the index
    # has on disk): refused; allow_stale searches the stale snapshot
    lagging = dict(tmeta, covered_batches=[])
    with open(tg_meta_path, "w") as fh:
        json.dump(lagging, fh)
    try:
        with pytest.raises(rx.StaleTrigramIndex):
            rx.grep_index(spark, index_dir, r"def main")
        rx.grep_index(
            spark, index_dir, r"def [a-z_]+\(", allow_stale=True
        ).count()
    finally:
        with open(tg_meta_path, "w") as fh:
            json.dump(tmeta, fh)


def test_trigram_fragments_respect_salt_bound(spark, trigram_index):
    """No fragment may exceed TG_FRAGMENT postings (the Zipf-hot-key
    defense: 'def'/'    ' style trigrams appear in ~every file)."""
    index_dir, tmeta = trigram_index
    for gen in tmeta["generations"]:
        posts = spark.read.parquet(
            os.path.join(index_dir, "trigrams", gen, "postings")
        )
        assert posts.filter(F.col("n_docs") > rx.TG_FRAGMENT).count() == 0


def test_build_refuses_committed_sidecar(spark, trigram_index):
    """An in-place rebuild over a committed sidecar would tear readers
    mid-scan (the ADVICE ann_index finding, applied here from day one)."""
    index_dir, _ = trigram_index
    with pytest.raises(RuntimeError, match="committed sidecar"):
        rx.build_trigram_index(spark, index_dir)


def test_sidecar_lock_serializes_writers(spark, trigram_index):
    index_dir, _ = trigram_index
    lock = os.path.join(index_dir, "trigrams", "update.lock")
    open(lock, "w").close()
    try:
        with pytest.raises(rx.ConcurrentSidecarUpdate):
            rx.update_trigram_index(spark, index_dir)
    finally:
        os.remove(lock)


@pytest.mark.parametrize(
    "pattern",
    [
        r"def [a-z_]+\(",  # selective, sidecar-seeded
        r"(?i)return",  # caseless groups
        r"[0-9]+",  # no factors -> full per-line scan fallback
    ],
)
def test_grep_lines_equals_per_line_scan(spark, trigram_index, pattern):
    """grep -n: one row per matching line with its 1-based lineno;
    the sidecar-seeded result equals the defining full per-line scan."""
    from reiz_io_spark.schema import CONTENT_ON_DISK, DOCS_ON_DISK

    index_dir, _ = trigram_index
    got = sorted(
        map(tuple, rx.grep_lines(spark, index_dir, pattern).collect())
    )
    content = spark.read.schema(CONTENT_ON_DISK).parquet(
        os.path.join(index_dir, "content")
    )
    docs = spark.read.schema(DOCS_ON_DISK).parquet(
        os.path.join(index_dir, "docs")
    )
    want = sorted(
        map(
            tuple,
            content.select(
                "doc_id",
                F.posexplode(F.split(F.col("content"), "\n")).alias(
                    "pos", "line"
                ),
            )
            .filter(F.col("line").rlike(pattern))
            .select(
                "doc_id",
                (F.col("pos") + 1).cast("int").alias("lineno"),
                "line",
            )
            .join(docs.select("doc_id", "repo", "path"), "doc_id")
            .select("doc_id", "repo", "path", "lineno", "line")
            .collect(),
        )
    )
    assert got == want and len(want) > 0


def test_grep_lines_absent_trigram_empty_without_content(spark, trigram_index):
    index_dir, _ = trigram_index
    df = rx.grep_lines(spark, index_dir, r"zqxjkvbnzzz")
    assert df.count() == 0
    assert "content" not in (
        df._jdf.queryExecution().executedPlan().toString()
    )


# --------------------------------------------------------------------------
# generational incremental update
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def grown_index(spark, tmp_path_factory):
    """Index built from batch A, sidecar committed, then batch B merged
    in and the sidecar incrementally updated."""
    from reiz_io_spark.operators.build import (
        merge_and_encode,
        merge_incremental,
        stage1_ingest,
    )
    from reiz_io_spark.sources.corpus import synth_corpus

    corpus = synth_corpus(spark, n_filler=80, seed=23).cache()
    a = corpus.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 0)
    b = corpus.filter(F.pmod(F.xxhash64("path"), F.lit(2)) == 1)
    inc_dir = str(tmp_path_factory.mktemp("inc_tg"))
    stage1_ingest(spark, a, inc_dir, build_id="b0", n_shards=4)
    merge_and_encode(spark, inc_dir, build_id="b0", fragment_postings=64)
    t0 = rx.build_trigram_index(spark, inc_dir)
    stage1_ingest(spark, b, inc_dir, build_id="b1", n_shards=4)
    merge_incremental(spark, inc_dir)
    return inc_dir, t0


def test_update_folds_new_batch_into_new_generation(spark, grown_index):
    """After an index merge the sidecar is stale; update_trigram_index
    appends a generation covering ONLY the new batch (committed
    generation files untouched), and grep over the merged corpus equals
    the defining brute scan again."""
    inc_dir, t0 = grown_index
    with pytest.raises(rx.StaleTrigramIndex):
        rx.grep_index(spark, inc_dir, r"def [a-z_]+\(")
    import glob

    gen0_files = sorted(
        glob.glob(
            os.path.join(inc_dir, "trigrams", t0["generations"][0], "**", "*"),
            recursive=True,
        )
    )
    mtimes = {f: os.path.getmtime(f) for f in gen0_files}
    t1 = rx.update_trigram_index(spark, inc_dir)
    assert len(t1["generations"]) == 2
    assert t1["generations"][0] == t0["generations"][0]
    assert t1["commit"] == t0["commit"] + 1
    assert {f: os.path.getmtime(f) for f in gen0_files} == mtimes
    for pat in (r"def [a-z_]+\(", r"return (None|self)"):
        got = sorted(
            map(tuple, rx.grep_index(spark, inc_dir, pat).collect())
        )
        want = sorted(
            map(tuple, rx.grep_bruteforce(spark, inc_dir, pat).collect())
        )
        assert got == want and len(want) > 0


def test_update_noop_when_no_new_batches(spark, grown_index):
    inc_dir, _ = grown_index
    before = rx.update_trigram_index(spark, inc_dir)  # idempotent entry
    after = rx.update_trigram_index(spark, inc_dir)
    assert after["generations"] == before["generations"]
    assert after["covered_batches"] == before["covered_batches"]


# --------------------------------------------------------------------------
# adaptive seek-vs-scan routing (GREP_SEEK_MAX_FRACTION)
# --------------------------------------------------------------------------

def test_hot_pattern_routes_to_scan_without_posting_reads(
    spark, trigram_index, monkeypatch
):
    """When the dictionary's rarest-trigram df bound says the seek
    cannot be selective, grep must answer from the factor-prefiltered
    scan WITHOUT reading a single posting fragment — and still equal
    the brute scan row-for-row."""
    index_dir, _ = trigram_index
    pattern = GREP_PATTERNS[0]  # hot: 'def ' occurs in ~every file
    want = sorted(
        tuple(r)
        for r in rx.grep_bruteforce(spark, index_dir, pattern).collect()
    )
    assert want
    monkeypatch.setattr(rx, "ISIN_CAND_MAX", 1)
    monkeypatch.setattr(rx, "GREP_SEEK_MAX_FRACTION", 0.0)

    def _boom(*a, **k):
        raise AssertionError("posting read on the scan route")

    monkeypatch.setattr(rx, "_read_postings", _boom)
    got = sorted(
        tuple(r) for r in rx.grep_index(spark, index_dir, pattern).collect()
    )
    assert got == want


def test_selective_pattern_keeps_the_seek(spark, trigram_index):
    """A pattern whose rarest trigram is rare stays under the default
    routing threshold (the scan route only binds on hot patterns):
    check the bound arithmetic on the real dictionary, then the
    end-to-end equality."""
    index_dir, _ = trigram_index
    pattern = r"A_FOO[A-Za-z_]*\("  # golden caseless_match ident, rare
    dnf, fold = rx.analyze(pattern)
    assert dnf is not None and not fold
    p = rx._tg_paths(index_dir)
    with open(p["meta"]) as fh:
        tmeta = json.load(fh)
    tgs, dfs = rx._load_dictionary(spark, p, tmeta)
    df_of = rx._df_lookup(tgs, dfs, sorted(
        {t for alt in dnf for fac in alt for t in rx.trigrams_of(fac)}
    ))
    est = min(v for v in df_of.values())  # rarest-trigram bound
    assert est <= max(
        rx.ISIN_CAND_MAX, int(rx.GREP_SEEK_MAX_FRACTION * int(dfs.max()))
    )
    rows = rx.grep_index(spark, index_dir, pattern).collect()
    want = rx.grep_bruteforce(spark, index_dir, pattern).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, want))
    assert rows  # the golden file matches
