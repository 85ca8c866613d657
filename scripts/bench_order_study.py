"""Arbitrate the r05 gate-flagged doc-section regressions (VERDICT r5
'What's wrong #1'): dedup_ngram_jaccard +28.8%, text_quality +25.3%,
dedup_minhash_lsh +10.5% on UNCHANGED code after the bench moved the
docs section first (fresh-JVM position).

Hypothesis under test: min-of-3 on a freshly started JVM never reaches
JIT/codegen steady state for these shuffle/UDF-heavy entries — the
first executions of each distinct plan carry compilation cost that the
r04 ordering (docs AFTER a full index build) had already paid.

Design: two subprocess modes on the same box, interleaved A,B,A,B so
slow co-tenant drift cancels:
  A  = the r05 protocol verbatim (session-level warm-up only,
       min-of-3 per entry)
  B  = A + one UNTIMED per-entry warm-up run (same fn) before the
       timed repeats — position-independent by construction
If B recovers the r04 levels while A reproduces the inflated ones,
the delta is attributed to warm-up state, not code or host.

Usage: python scripts/bench_order_study.py [rounds]   (default 2)
Prints one JSON line; also meant to be quoted in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from reiz_io_spark.operators import dedup, fulltext, textstats
from reiz_io_spark.session import get_spark

mode = sys.argv[1]
sf_dir = {sf_dir!r}
spark = get_spark(app_name="bench-order-study", master="local[{cpus}]",
                  shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
docs.count()
# the r05 session-level warm-up, verbatim (bench.py:96-97)
fulltext.bm25_topk(docs, ["batch"], 3, True).collect()
dedup.minhash_signatures(docs, 8, 3).count()

entries = {{
    "dedup_ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(
        docs, 3, 0.5).collect(),
    "dedup_minhash_lsh": lambda: dedup.minhash_lsh_pairs(
        docs, 64, 16, 3, 0.5).collect(),
    "text_quality": lambda: textstats.quality_score(docs).collect(),
}}
out = {{}}
for name, fn in entries.items():
    if mode == "B":
        fn()  # untimed per-entry warm-up
    lat = []
    for _ in range(3):
        t = time.perf_counter()
        fn()
        lat.append(time.perf_counter() - t)
    out[name] = {{"min3": round(min(lat), 3),
                  "raw": [round(x, 3) for x in lat]}}
print("RESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    child = _CHILD.format(repo=repo, sf_dir=sf_dir, cpus=cpus)

    runs: dict[str, list[dict]] = {"A": [], "B": []}
    for _ in range(rounds):
        for mode in ("A", "B"):
            proc = subprocess.run(
                [sys.executable, "-c", child, mode],
                capture_output=True, text=True, timeout=900,
            )
            line = [
                ln for ln in proc.stdout.splitlines()
                if ln.startswith("RESULT ")
            ]
            if not line:
                print(proc.stdout[-2000:], file=sys.stderr)
                print(proc.stderr[-2000:], file=sys.stderr)
                raise RuntimeError(f"mode {mode} child failed")
            runs[mode].append(json.loads(line[-1][len("RESULT "):]))

    summary = {}
    for name in ("dedup_ngram_jaccard", "dedup_minhash_lsh", "text_quality"):
        a = min(r[name]["min3"] for r in runs["A"])
        b = min(r[name]["min3"] for r in runs["B"])
        summary[name] = {
            "A_r05_protocol_min": a,
            "B_warmed_min": b,
            "warmup_effect_pct": round(100.0 * (a - b) / a, 1),
            "A_raw": [r[name]["raw"] for r in runs["A"]],
            "B_raw": [r[name]["raw"] for r in runs["B"]],
        }
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "rounds": rounds,
                      "summary": summary}))


if __name__ == "__main__":
    main()
