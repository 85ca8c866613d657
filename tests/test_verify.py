"""End-to-end structural verification: the ENGINE's final output (not
just the test-oracle matcher) must return the exact structurally
matching docs with exact `# tp:` line sets for all 27 reference queries
— the analog of the reference's golden harness run against
reiz/fetch.py output (tests/runner.py:204-226)."""

from __future__ import annotations

import ast

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.score import IndexReader
from reiz_io_spark.operators.verify import structural_topk
from reiz_io_spark.plans.matcher import annotated_tp_lines, match_lines
from reiz_io_spark.plans.queries import REFERENCE_QUERIES, lowered_reference_queries
from reiz_io_spark.sources.corpus import GOLDEN_REPO

K_ALL = 500  # > corpus size: retrieves every verified match


@pytest.fixture(scope="module")
def reader(spark, built_index):
    return IndexReader(spark, built_index[0])


@pytest.fixture(scope="module")
def corpus_sources(small_corpus):
    rows = small_corpus.filter(F.col("lang") == "python").collect()
    out = {}
    for r in rows:
        try:
            ast.parse(r["content"])
        except SyntaxError:
            continue
        out[(r["repo"], r["path"])] = r["content"]
    return out


@pytest.mark.parametrize("name", sorted(REFERENCE_QUERIES))
def test_engine_positions_match_golden(name, spark, reader, corpus_sources):
    query = lowered_reference_queries()[name]
    got = structural_topk(reader, query, k=K_ALL).collect()
    got_by_file: dict[tuple, set[int]] = {}
    for r in got:
        got_by_file.setdefault((r["repo"], r["path"]), set()).add(r["lineno"])

    # 1. completeness + exactness vs an independent full-corpus sweep:
    #    the engine must return EXACTLY the structurally matching files
    #    with EXACTLY the matching lines (false positives from not/None/
    #    ~ref/sequence lowering must be gone).
    expected = {}
    for (repo, path), content in corpus_sources.items():
        lines = match_lines(content, REFERENCE_QUERIES[name])
        if lines:
            expected[(repo, path)] = lines
    assert got_by_file == expected

    # 2. the golden file's annotated `# tp:` lines are the engine output
    golden_key = (GOLDEN_REPO, f"dataset/{name}.py")
    golden_src = corpus_sources[golden_key]
    want = annotated_tp_lines(golden_src)
    assert got_by_file.get(golden_key, set()) == want


def test_offset_paging(spark, reader):
    """LIMIT/OFFSET over verified docs (reiz/fetch.py:10,71-81)."""
    query = lowered_reference_queries()["simple/simple_name_match"]
    full = structural_topk(reader, query, k=6).collect()
    page = structural_topk(reader, query, k=3, offset=3).collect()
    full_docs = list(dict.fromkeys(r["doc_id"] for r in full))
    page_docs = list(dict.fromkeys(r["doc_id"] for r in page))
    assert page_docs == full_docs[3:6]


def test_scores_match_wand(spark, reader):
    """Verified rows carry the retrieval's exact BM25 scores."""
    from reiz_io_spark.operators.wand import wand_scores

    query = lowered_reference_queries()["simple/classmethod"]
    got = structural_topk(reader, query, k=K_ALL).collect()
    cand = {
        r["doc_id"]: r["score"]
        for r in wand_scores(reader, query, k=None).collect()
    }
    assert got
    for r in got:
        assert r["score"] == cand[r["doc_id"]]


def test_hot_query_escalation_route_identical(spark, reader):
    """Forcing the budget to 0 routes retrieval through ranked wand_topk
    prefixes; results must equal the materialize-all route exactly."""
    for name in ("simple/simple_name_match", "simple/classmethod",
                 "simple/not_constant"):
        query = lowered_reference_queries()[name]
        a = [
            (r["doc_id"], r["lineno"], r["score"])
            for r in structural_topk(reader, query, k=7).collect()
        ]
        b = [
            (r["doc_id"], r["lineno"], r["score"])
            for r in structural_topk(
                reader, query, k=7, candidate_budget=0
            ).collect()
        ]
        assert a == b, name


def test_positions_carry_spans_and_segments(spark, reader, corpus_sources):
    """fetch.py:14-29,63-67 projection parity: every returned row
    carries the node's col_offset / end_lineno, and the segment is the
    exact ast.get_source_segment(..., padded=True) slice the reference
    serves (column-accurate, not whole lines)."""
    import ast as _ast

    query = lowered_reference_queries()["simple/classmethod"]
    rows = structural_topk(reader, query, k=K_ALL).collect()
    assert rows
    for r in rows:
        src = corpus_sources[(r["repo"], r["path"])]
        lines = src.splitlines()
        assert 1 <= r["lineno"] <= r["end_lineno"] <= len(lines)
        assert r["col_offset"] >= 0
        from reiz_io_spark.plans.matcher import _Span

        want = _ast.get_source_segment(
            src,
            _Span(lineno=r["lineno"], col_offset=r["col_offset"],
                  end_lineno=r["end_lineno"],
                  end_col_offset=r["end_col_offset"]),
            padded=True,
        )
        assert r["segment"] == want
        # the match is a decorated def: the widened span starts at the
        # decorator's '@' and still contains the def itself
        assert "def " in r["segment"] or "class " in r["segment"]
        assert r["github_link"].startswith("https://github.com/")
        assert f"#L{r['lineno']}-L{r['end_lineno']}" in r["github_link"]
        assert r["username"] == r["repo"].split("/")[0]


def test_unsatisfiable_query_empty_everywhere(spark, reader):
    """Unknown identifiers: empty results, no crash, on all routes."""
    from reiz_io_spark.plans.lower import lower_query
    from reiz_io_spark.serve import QueryService

    q = lower_query("none", "Call(Name('zz_no_such_identifier_zz'))")
    assert structural_topk(reader, q, k=5).count() == 0
    assert structural_topk(reader, q, k=5, candidate_budget=0).count() == 0
    svc = QueryService(reader)
    assert svc.query_topk(q, k=5) == []
    assert svc.query_positions(q, k=5) == []
