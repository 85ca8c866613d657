"""Capacity-scale datapoint: 1M-file index build + the 27-query batch
suite over the result, re-run each round so capacity-scale regressions
get the same round-over-round visibility as the sf0.1 bench
(VERDICT r5 'Next round #8' — the r04 numbers had gone stale).

Workload (identical to the r04 capacity datapoint): deterministic
1M-file synthetic corpus (seed 42), full index build (salted shuffle,
map-side tf, delta/varint blocks), then the whole lowered reference
query set as ONE Spark job (wand_topk_batch — the bulk/offline shape).

Usage: python scripts/capacity_probe.py [n_files]   (default 1_000_000)
Prints one JSON line: build seconds, files/sec, batch27 seconds.
Append the row to BENCH/BASELINE.md's capacity table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from reiz_io_spark.operators.build import build_index
    from reiz_io_spark.operators.score import IndexReader
    from reiz_io_spark.operators.wand import wand_topk_batch
    from reiz_io_spark.plans.queries import lowered_reference_queries
    from reiz_io_spark.session import get_spark
    from reiz_io_spark.sources.corpus import synth_corpus_distributed

    spark = get_spark(
        app_name="capacity-probe", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth_corpus_distributed(spark, n_files, seed=42)
    index_dir = tempfile.mkdtemp(prefix="capacity_index_")
    try:
        t0 = time.perf_counter()
        build_index(spark, corpus, index_dir, build_id="cap",
                    n_shards=cpus)
        build_s = time.perf_counter() - t0

        reader = IndexReader(spark, index_dir).warm()
        qs = lowered_reference_queries()
        # one untimed warm-up then min-of-3 (bench.py protocol since
        # r05). batch27 at 1M is heap-state-sensitive — back-to-back
        # identical-code passes have spanned 8-31 s (BENCH/BASELINE.md
        # r06 addendum) — so a single timed pass cannot support a
        # cross-round comparison; raw passes are disclosed.
        wand_topk_batch(reader, qs, k=10).collect()
        passes = []
        for _ in range(3):
            t1 = time.perf_counter()
            rows = wand_topk_batch(reader, qs, k=10).collect()
            passes.append(round(time.perf_counter() - t1, 2))
        print(json.dumps({
            "n_files": n_files,
            "build_sec": round(build_s, 1),
            "files_per_sec": round(n_files / build_s, 1),
            "batch27_sec": min(passes),
            "batch27_passes": passes,
            "batch27_rows": len(rows),
            "cpus": cpus,
        }))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
