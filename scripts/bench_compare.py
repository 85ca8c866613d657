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


def _calib(d: dict) -> float | None:
    """Worst (slowest) calibration sample of a run — the honest bound
    on how contended the host was at any point in the suite."""
    ex = d.get("extra", {})
    vals = [ex[k] for k in ("calib_start_s", "calib_end_s") if k in ex]
    return max(vals) if vals else None


def main() -> int:
    base = _load(sys.argv[1])
    new = _load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else THRESHOLD
    # calibration sentinel (bench.py times a fixed CPU kernel at suite
    # start and end): when the two rounds ran on measurably different
    # box speeds (>1.3x), per-entry flags are ANNOTATED as suspect —
    # they describe the host, not the code. Annotation only, never a
    # gate: a real regression on a contended box still prints.
    cb, cn = _calib(base), _calib(new)
    suspect = ""
    if cb and cn and (cn / cb > 1.3 or cb / cn > 1.3):
        suspect = " [host-speed differs: see calibration]"
        print(
            f"calibration {cb:.3f}s -> {cn:.3f}s "
            f"({cn / cb:+.2f}x): rounds ran on different effective box "
            f"speeds; treat per-entry flags as host noise unless they "
            f"survive a quiet-box re-run"
        )
    regressions = []
    for name, base_s in sorted(base.get("queries", {}).items()):
        new_s = new.get("queries", {}).get(name)
        if new_s is None or base_s <= 0:
            continue
        delta = (new_s - base_s) / base_s
        flag = f" REGRESSION{suspect}" if delta > threshold else ""
        print(f"{name:28s} {base_s:9.3f}s -> {new_s:9.3f}s  {delta:+6.1%}{flag}")
        if delta > threshold:
            regressions.append(name)
    print(f"\n{len(regressions)} regression(s) over {threshold:.0%}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
