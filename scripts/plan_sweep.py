"""Round-8 plan audit: build every __spark_entry__.queries() DataFrame
against an sf dir and record anti-pattern counters from
.explain('formatted') — row-at-a-time Python evals (BatchEvalPython),
cartesian products, exchange counts, and nested-loop joins. No
execution (planning only) except entries that materialize helper
indexes. Prints one line per entry + a JSON summary.

Usage: python scripts/plan_sweep.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from reiz_io_spark.session import get_spark

    spark = get_spark(app_name="plan-sweep", master="local[8]",
                      shuffle_partitions=8)
    out = {}
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:
            out[name] = {"error": f"{type(e).__name__}: {e}"[:120]}
            print(f"{name:28s} ERROR {e}", flush=True)
            continue
        rec = {
            "exchanges": plan.count("Exchange ("),
            "pickled_python": plan.count("BatchEvalPython"),
            "arrow_python": plan.count("ArrowEvalPython")
            + plan.count("MapInArrow") + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
            "cartesian": plan.count("CartesianProduct"),
            "bnl_join": plan.count("BroadcastNestedLoopJoin"),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
        }
        out[name] = rec
        flags = []
        if rec["pickled_python"]:
            flags.append("PICKLED-UDF")
        if rec["cartesian"]:
            flags.append("CARTESIAN")
        if rec["bnl_join"]:
            flags.append("BNL")
        print(f"{name:28s} exch={rec['exchanges']:2d} "
              f"arrowPy={rec['arrow_python']} smj={rec['smj']} "
              f"bhj={rec['bhj']} {' '.join(flags)}", flush=True)
    n_flag = sum(1 for r in out.values()
                 if r.get("pickled_python") or r.get("cartesian")
                 or r.get("bnl_join"))
    print("SUMMARY " + json.dumps({"entries": len(out), "flagged": n_flag}))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "plans", "r08",
            "plan_sweep.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
