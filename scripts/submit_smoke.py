"""spark-submit smoke driver — the north-rule invocation, verbatim:

    python scripts/make_pyfiles.py
    spark-submit --master local[4] --py-files dist/reiz_io_spark.zip \\
        scripts/submit_smoke.py

Run from ANY cwd with no PYTHONPATH: the package must arrive via
--py-files alone (which is exactly how a multi-executor cluster gets
it). Builds a small index end-to-end and runs a ranked query; prints
one OK line with the top doc_id.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> None:
    spark = SparkSession.builder.getOrCreate()
    # imports AFTER the session exists, resolved from the --py-files zip
    from reiz_io_spark.operators.build import build_index
    from reiz_io_spark.operators.score import IndexReader, attach_doc_metadata
    from reiz_io_spark.operators.wand import wand_topk
    from reiz_io_spark.plans.lower import lower_query
    from reiz_io_spark.sources.corpus import synth_corpus

    out = tempfile.mkdtemp(prefix="submit_smoke_ix_")
    try:
        corpus = synth_corpus(spark, n_filler=60, seed=42)
        meta = build_index(spark, corpus, out, build_id="smoke", n_shards=4)
        reader = IndexReader(spark, out)
        q = lower_query("smoke", "Call(Name('len'))")
        rows = attach_doc_metadata(reader, wand_topk(reader, q, k=3)).collect()
        assert rows, "query returned no rows"
        assert meta["n_docs"] > 0
        print(f"SUBMIT_SMOKE_OK n_docs={meta['n_docs']} "
              f"top={rows[0]['doc_id']} score={rows[0]['score']:.4f}")
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
