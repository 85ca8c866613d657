from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reiz_io_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="reiz_io_spark-tests",
        master=os.environ.get("SPARK_TEST_MASTER", "local[8]"),
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def small_corpus(spark):
    from reiz_io_spark.sources.corpus import synth_corpus

    return synth_corpus(spark, n_filler=120, seed=42).cache()


@pytest.fixture(scope="session")
def built_index(spark, small_corpus, tmp_path_factory):
    from reiz_io_spark.operators.build import build_index

    out = str(tmp_path_factory.mktemp("index"))
    meta = build_index(
        spark, small_corpus, out, build_id="t", n_shards=4, fragment_postings=64
    )
    return out, meta
