"""Scaling-law decomposition for the TRIGRAM SIDECAR build (round-6
tier) — the same marginal-efficiency method as build_scaling_law.py,
applied to the sidecar encode: T(c, F) = S + w*F/c, measured at two
pinned core counts x two corpus sizes; the marginal efficiency
deltaT(2c) / (4 x deltaT(8c)) cancels the fixed cost S exactly, so it
is the number that governs sidecar throughput at 100-TB scale.

Per cell: the INDEX is built once (unpinned, any cores — it is the
input, not the thing measured), then build_trigram_index runs
`repeats` times under hard cpu affinity with the trigrams dir removed
between runs; min-of-repeats absorbs co-tenant noise.

Usage: python scripts/trigram_scaling.py [F1] [F2] [repeats]
Appends a section to BENCH/SCALING_LAW.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _child(cores: int, n_files: int, repeats: int) -> None:
    from reiz_io_spark.operators.build import build_index
    from reiz_io_spark.operators.regexsearch import build_trigram_index
    from reiz_io_spark.session import get_spark
    from reiz_io_spark.sources.corpus import synth_corpus_distributed

    out = tempfile.mkdtemp(prefix=f"tglaw_{cores}_{n_files}_")
    best = float("inf")
    try:
        # index build: unpinned (input preparation, not the measurement)
        spark = get_spark(
            app_name=f"tglaw-prep-{n_files}",
            master="local[32]",
            shuffle_partitions=32,
        )
        corpus = synth_corpus_distributed(
            spark, n_files, seed=42, n_partitions=64
        )
        build_index(spark, corpus, out, build_id="law", n_shards=32)
        spark.stop()

        # sidecar build: pinned cores, fresh session at local[cores]
        os.sched_setaffinity(0, set(range(cores)))
        spark = get_spark(
            app_name=f"tglaw-{cores}-{n_files}",
            master=f"local[{cores}]",
            shuffle_partitions=32,
        )
        for _ in range(repeats):
            shutil.rmtree(os.path.join(out, "trigrams"), ignore_errors=True)
            t0 = time.perf_counter()
            build_trigram_index(spark, out)
            best = min(best, time.perf_counter() - t0)
        spark.stop()
    finally:
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cores": cores, "n_files": n_files, "tg_s": round(best, 2)}))


def main() -> None:
    if sys.argv[1:2] == ["--cell"]:
        _child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    f1 = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    f2 = int(sys.argv[2]) if len(sys.argv) > 2 else 180_000
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    cells: dict[tuple[int, int], float] = {}
    for cores in (2, 8):
        for n_files in (f1, f2):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cell",
                 str(cores), str(n_files), str(repeats)],
                capture_output=True, text=True, check=True,
            )
            row = json.loads(out.stdout.strip().splitlines()[-1])
            cells[(cores, n_files)] = row["tg_s"]
            print(f"cell cores={cores} files={n_files}: {row['tg_s']}s",
                  file=sys.stderr)

    d2 = cells[(2, f2)] - cells[(2, f1)]
    d8 = cells[(8, f2)] - cells[(8, f1)]
    marginal_eff = d2 / (4 * d8)
    w2 = 2 * d2 / (f2 - f1)
    w8 = 8 * d8 / (f2 - f1)
    s2 = cells[(2, f1)] - w2 * f1 / 2
    s8 = cells[(8, f1)] - w8 * f1 / 8

    summary = {
        "tier": "trigram_sidecar_build",
        "cells": {f"{c}c_{f}f": t for (c, f), t in cells.items()},
        "marginal_scaling_efficiency": round(marginal_eff, 3),
        "per_file_core_ms_2c": round(w2 * 1000, 3),
        "per_file_core_ms_8c": round(w8 * 1000, 3),
        "fixed_cost_s_2c": round(s2, 1),
        "fixed_cost_s_8c": round(s8, 1),
    }

    section = f"""

## Trigram sidecar build (round-6 tier), same decomposition

Four pinned cells (min of {repeats} repeats; index prebuilt unpinned —
only the sidecar encode is timed):

| cores | files | sidecar s |
|---|---|---|
| 2 | {f1} | {cells[(2, f1)]} |
| 2 | {f2} | {cells[(2, f2)]} |
| 8 | {f1} | {cells[(8, f1)]} |
| 8 | {f2} | {cells[(8, f2)]} |

- **marginal scaling efficiency: {summary['marginal_scaling_efficiency']}**
  over the added {f2 - f1} files.
- per-file work: {summary['per_file_core_ms_2c']} core-ms (2c) vs
  {summary['per_file_core_ms_8c']} core-ms (8c).
- fixed cost S: ~{summary['fixed_cost_s_2c']}s (2c) /
  ~{summary['fixed_cost_s_8c']}s (8c).
"""
    with open("BENCH/SCALING_LAW.md", "a") as fh:
        fh.write(section)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
