"""BM25F field-weighted scoring (wand.field_weight_of + the
field_weights params on wand_topk / naive_bm25_topk).

The design claim under test: a per-namespace weight folds EXACTLY into
idf, so the unmodified WAND kernels stay exact — block upper bounds
scale with the same factor (still upper bounds) and the rescore uses
the same scaled dict. Gates: all-1.0 weights degenerate to the plain
path bit-for-bit; at several weight settings the weighted WAND is
rank- AND score-identical to the independent weighted naive path; a
pure-Python recomputation over the runs table agrees.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from reiz_io_spark.operators.score import IndexReader, naive_bm25_topk
from reiz_io_spark.operators.wand import field_weight_of, wand_topk
from reiz_io_spark.plans.lower import lower_query

Q = lower_query("flagship", "Call(Name('len'))")

WEIGHT_SETTINGS = [
    {"id": 2.0, "node": 0.5, "in": 1.25},
    {"id": 0.25},
    {"node": 3.0, "in": 0.0},  # zero-weight: field contributes nothing
]


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_field_weight_of():
    w = {"id": 2.0, "node": 0.5}
    assert field_weight_of("id:len", w) == 2.0
    assert field_weight_of("node:Call", w) == 0.5
    assert field_weight_of("in:Call.func", w) == 1.0  # default
    assert field_weight_of("noprefix", w) == 1.0


def test_all_ones_degenerates_to_plain(spark, built_index):
    out, _ = built_index
    reader = IndexReader(spark, out)
    plain = _rows(wand_topk(reader, Q, k=10))
    ones = _rows(wand_topk(
        reader, Q, k=10, field_weights={"id": 1.0, "node": 1.0, "in": 1.0}
    ))
    assert ones == plain


@pytest.mark.parametrize("weights", WEIGHT_SETTINGS)
def test_weighted_wand_equals_weighted_naive(spark, built_index, weights):
    out, _ = built_index
    reader = IndexReader(spark, out)
    wand = _rows(wand_topk(reader, Q, k=10, field_weights=weights))
    naive = _rows(naive_bm25_topk(reader, Q, k=10, field_weights=weights))
    assert wand == naive
    assert len(wand) == 10


def test_weighted_scores_match_python_recompute(spark, built_index):
    """Ground truth from the runs table: per-term BM25 contribution *
    namespace weight, same ascending-term accumulation order as the
    engine."""
    weights = {"id": 2.0, "node": 0.5, "in": 1.25}
    out, _ = built_index
    reader = IndexReader(spark, out)
    got = _rows(wand_topk(reader, Q, k=5, field_weights=weights))

    meta = reader.meta
    k1, b, avgdl = float(meta["k1"]), float(meta["b"]), float(meta["avgdl"])
    groups = reader.resolve_groups(Q)
    terms = sorted({t for g in groups for t in g})
    tmeta = reader.term_meta(terms)
    rows = (
        reader.runs().filter(F.col("term").isin(terms))
        .select("term", "doc_id", "tf", "dl").collect()
    )
    by_doc: dict[int, dict[str, tuple]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["term"]] = (r["tf"], r["dl"])
    for doc_id, score in got:
        hits = by_doc[doc_id]
        assert set(hits) == set(terms)  # conjunction satisfied
        acc = 0.0
        for t in sorted(hits):  # engine accumulation order
            tf, dl = hits[t]
            idf = float(tmeta[t]["idf"]) * field_weight_of(t, weights)
            acc += idf * (tf * (1.0 + k1)) / (
                tf + k1 * ((1.0 - b) + b * (dl / avgdl))
            )
        assert math.isclose(acc, score, rel_tol=0, abs_tol=1e-12)


def test_serving_tier_weighted_matches_wand(spark, built_index):
    """QueryService scores from its weight-independent postings cache;
    the weight applies at score time — results must equal the
    distributed weighted WAND, and the SAME warm cache must serve a
    different weighting correctly."""
    from reiz_io_spark.serve import QueryService

    out, _ = built_index
    reader = IndexReader(spark, out)
    svc = QueryService(reader)
    for weights in ({"id": 2.0, "node": 0.5}, {"id": 0.25}, None):
        served = [
            (r["doc_id"], r["score"])
            for r in svc.query_topk(Q, k=10, field_weights=weights)
        ]
        assert served == _rows(
            wand_topk(reader, Q, k=10, field_weights=weights)
        )


def test_boost_changes_ranking_directionally(spark, built_index):
    """Damping node-type terms to ~0 must rank purely by the
    identifier term — docs ordered by their id:len contribution."""
    out, _ = built_index
    reader = IndexReader(spark, out)
    only_id = _rows(wand_topk(
        reader, Q, k=10,
        field_weights={"node": 1e-9, "in": 1e-9, "id": 1.0},
    ))
    single = lower_query("just_len", "Call(Name('len'))")
    # same candidates; verify scores are ~ the id-term-only contribution
    meta = reader.meta
    k1, b, avgdl = float(meta["k1"]), float(meta["b"]), float(meta["avgdl"])
    idf = float(reader.term_meta(["id:len"])["id:len"]["idf"])
    rows = {
        r["doc_id"]: (r["tf"], r["dl"])
        for r in reader.runs().filter(F.col("term") == "id:len")
        .select("doc_id", "tf", "dl").collect()
    }
    for doc_id, score in only_id:
        tf, dl = rows[doc_id]
        expect = idf * (tf * (1.0 + k1)) / (
            tf + k1 * ((1.0 - b) + b * (dl / avgdl))
        )
        assert math.isclose(score, expect, rel_tol=1e-6)
