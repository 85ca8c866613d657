"""Concurrency deep-dive: serving-tier scaling + host-contention probe.

Two questions the r04 distributed-tier variance study left open:

1. Does the PRODUCTION query path (warm QueryService — the tier the
   reference's published latencies measure and the reference scales
   with sanic workers) scale across share-nothing frontends? The
   distributed tier's per-query cost is dominated by per-job driver
   scheduling (~0.5 s), which makes it a host-noise antenna at sandbox
   corpus sizes.
2. Is the distributed tier's sub-0.8 ratio engine coupling or plain
   host-shared-resource contention? Control experiment: run ONE
   pinned 2-core frontend (a) on an otherwise idle host and (b) with
   pure-python busy-loop burners pinned to cores 2-8 (the cores the
   other 3 frontends would occupy). The burners share NOTHING with the
   frontend but the physical host — no Spark, no files, no locks. Any
   slowdown in (b) is host-level (memory bandwidth / LLC / frequency),
   not engine coupling.

Usage: python scripts/concurrency_study.py [n_files] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_bench import _run_frontends  # noqa: E402

BURNER = (
    "import os,sys;os.sched_setaffinity(0,{int(sys.argv[1]),int(sys.argv[1])+1});"
    "x=1\nwhile True: x=(x*1103515245+12345)%(2**31)"
)


def contention_probe(index_dir: str) -> dict:
    """1 dist frontend pinned 0-2: alone vs with busy burners on 2-8."""
    out = {}
    out["alone_qps"] = _run_frontends(2, index_dir, rounds=4, tier="dist")
    burners = [
        subprocess.Popen([sys.executable, "-c", BURNER, str(c)])
        for c in (2, 4, 6)
    ]
    try:
        time.sleep(1.0)
        out["with_burners_qps"] = _run_frontends(
            2, index_dir, rounds=4, tier="dist"
        )
    finally:
        for b in burners:
            b.kill()
    out["slowdown_pct"] = round(
        100.0 * (1 - out["with_burners_qps"] / out["alone_qps"]), 1
    )
    return out


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from reiz_io_spark.operators.build import build_index
    from reiz_io_spark.session import get_spark
    from reiz_io_spark.sources.corpus import synth_corpus_distributed

    spark = get_spark(
        app_name="conc-study-build", master="local[32]", shuffle_partitions=32
    )
    index_dir = tempfile.mkdtemp(prefix="conc_study_ix_")
    try:
        corpus = synth_corpus_distributed(spark, n_files, seed=42)
        build_index(spark, corpus, index_dir, build_id="cs", n_shards=32)
        spark.stop()

        serve_effs = []
        for r in range(n_rounds):
            lo = _run_frontends(2, index_dir, rounds=100, tier="serve")
            hi = _run_frontends(8, index_dir, rounds=100, tier="serve")
            eff = round(hi / (4 * lo), 3)
            serve_effs.append(eff)
            print(f"serve round {r}: low={lo} high={hi} eff={eff}", flush=True)

        probe = contention_probe(index_dir)
        print(f"contention probe: {probe}", flush=True)

        print(json.dumps({
            "n_files": n_files,
            "serve_efficiency": serve_effs,
            "serve_eff_min": min(serve_effs),
            "serve_eff_median": round(statistics.median(serve_effs), 3),
            "contention_probe": probe,
        }))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
