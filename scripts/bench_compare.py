"""Benchmark regression compare — the analog of the reference's
benchmark_e2e tool (±10% threshold, scripts/benchmark_e2e.py:13,58-70).

Usage: python scripts/bench_compare.py BASE.json NEW.json [threshold]
Exits 1 if any shared query regressed by more than the threshold.
"""

from __future__ import annotations

import json
import sys

THRESHOLD = 0.10


def _load(path: str) -> dict:
    """Accept either a raw bench.py line or the driver's BENCH_rN.json
    wrapper (bench line under 'parsed')."""
    d = json.load(open(path))
    return d.get("parsed", d)


def main() -> int:
    base = _load(sys.argv[1])
    new = _load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else THRESHOLD
    regressions = []
    for name, base_s in sorted(base.get("queries", {}).items()):
        new_s = new.get("queries", {}).get(name)
        if new_s is None or base_s <= 0:
            continue
        delta = (new_s - base_s) / base_s
        flag = " REGRESSION" if delta > threshold else ""
        print(f"{name:28s} {base_s:9.3f}s -> {new_s:9.3f}s  {delta:+6.1%}{flag}")
        if delta > threshold:
            regressions.append(name)
    print(f"\n{len(regressions)} regression(s) over {threshold:.0%}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
