"""Composed hygiene pipeline: gate semantics (each survivor passes all
three gates; each non-survivor fails at least one) and plan shape."""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F

from reiz_io_spark.operators import decontam, dedup, sampling, textstats
from reiz_io_spark.operators.pipeline import clean_corpus

SF_DIR = "/root/testdata/sf0.001"
BENCH = [(1, "spark stream vector table"), (2, "batch hash join")]


def test_clean_corpus_gates_exactly(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).cache()
    bench = spark.createDataFrame([Row(bench_id=b, text=t) for b, t in BENCH])
    qmin = 0.5
    out = clean_corpus(docs, bench, quality_min=qmin, n=3).cache()
    survivors = {r["doc_id"]: r for r in out.collect()}
    assert 0 < len(survivors) < docs.count()

    keepers = {
        r["keep_doc_id"] for r in dedup.exact_dedup(docs).collect()
    }
    quality = {
        r["doc_id"]: r["quality"]
        for r in textstats.quality_score(docs).collect()
    }
    contaminated = {
        r["doc_id"]
        for r in decontam.contaminated_docs(docs, bench, n=3).collect()
    }
    splits = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(docs, "doc_id",
                                     {"train": 0.8, "test": 0.1, "val": 0.1}
                                     ).collect()
    }
    # survivors pass every gate, with the right labels riding along
    for did, r in survivors.items():
        assert did in keepers
        assert quality[did] >= qmin and r["quality"] == quality[did]
        assert did not in contaminated
        assert r["split"] == splits[did]
    # non-survivors fail at least one gate
    for did in {r["doc_id"] for r in docs.collect()} - set(survivors):
        assert (
            did not in keepers
            or quality.get(did, -1.0) < qmin
            or did in contaminated
        )


def test_clean_corpus_plan_shape(spark):
    """The decontam gate's doc_id exclusion is an ANTI join and the
    eval-set side of the shingle probe is BROADCAST — corpus text
    never shuffles for decontamination."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    bench = spark.createDataFrame([Row(bench_id=b, text=t) for b, t in BENCH])
    plan = (
        clean_corpus(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
