"""Frontend concurrency-scaling VARIANCE study (VERDICT r03 item 7).

The r03 record showed frontend scaling efficiency 1.101 / 0.407 / 0.953
across three full scaling_bench runs — median above the 0.8 bar but
with an outlier too wide to wave off. This harness isolates the
variance question: build the index ONCE, then repeat the
frontend-throughput measurement N times at both parallelism levels
(1 x 2-core frontend vs 4 x 2-core frontends over the same on-disk
index, each frontend a subprocess pinned to its own core slice —
scripts/scaling_bench.py's exact deployment shape) and report the full
efficiency distribution.

Usage: python scripts/concurrency_variance.py [n_files] [n_rounds]
Prints one JSON line; paste-ready table in stdout tail.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import _run_frontends  # noqa: E402


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from reiz_io_spark.operators.build import build_index
    from reiz_io_spark.session import get_spark
    from reiz_io_spark.sources.corpus import synth_corpus_distributed

    spark = get_spark(
        app_name="conc-variance-build", master="local[32]",
        shuffle_partitions=32,
    )
    index_dir = tempfile.mkdtemp(prefix="conc_var_ix_")
    try:
        corpus = synth_corpus_distributed(spark, n_files, seed=42)
        build_index(spark, corpus, index_dir, build_id="cv", n_shards=32)
        spark.stop()

        effs, lows, highs = [], [], []
        for r in range(n_rounds):
            t0 = time.perf_counter()
            lo = _run_frontends(2, index_dir)   # 1 frontend, cores 0-2
            hi = _run_frontends(8, index_dir)   # 4 frontends, cores 0-8
            eff = round(hi / (4 * lo), 3)
            effs.append(eff)
            lows.append(lo)
            highs.append(hi)
            print(f"round {r}: low={lo} qps high={hi} qps eff={eff} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        out = {
            "n_files": n_files,
            "rounds": n_rounds,
            "low_qps": lows,
            "high_qps": highs,
            "efficiency": effs,
            "eff_min": min(effs),
            "eff_median": round(statistics.median(effs), 3),
            "eff_max": max(effs),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
