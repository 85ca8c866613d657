"""Round-8 optimization probe (guide §1.4): per-entry isolation for the
docs-section bench entries. For each entry, times
  - collect: exactly what bench.py measures (compute + driver transfer)
  - noop:    df.write.format('noop') — the computation alone
and dumps .explain('formatted') to plans/r08/<name>_<tag>.txt.

bench.py itself is FROZEN for measurement; this file carries the
isolation numbers cited in OPTIMIZATION_r08.md.

Usage: python bench_extra.py [--tag before|after] [--entries a,b,...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPEATS = 3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default=None, help="suffix for plan files; no plans dumped if unset")
    ap.add_argument("--entries", default=None)
    ap.add_argument("--no-noop", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from reiz_io_spark.operators import (
        dedup, fulltext, phrase, regexsearch, similarity, textstats,
    )
    from reiz_io_spark.operators.asof import asof_join_backward
    from reiz_io_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
    docs.count()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    emb.count()
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    purchases = events.filter(events.event_type == "purchase")
    clicks = events.filter(events.event_type == "click")

    # same untimed session warm-up bench.py does
    fulltext.bm25_topk(docs, ["batch"], 3, True).collect()
    dedup.minhash_signatures(docs, 8, 3).count()

    entries = {
        "ft_bm25_conj": lambda: fulltext.bm25_topk(
            docs, ["batch", "hash", "join"], 10, True),
        "ft_bm25_disj": lambda: fulltext.bm25_topk(
            docs, ["spark", "stream", "vector"], 10, False),
        "dedup_ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(docs, 3, 0.5),
        "dedup_minhash_lsh": lambda: dedup.minhash_lsh_pairs(
            docs, 64, 16, 3, 0.5),
        "ann_cosine_topk": lambda: similarity.brute_force_topk(
            emb, [0, 1, 2], 10),
        "text_quality": lambda: textstats.quality_score(docs),
        "ft_phrase_topk": lambda: phrase.phrase_topk(
            docs, ["table", "hash"], 10),
        "regex_factors_scan": lambda: regexsearch.regex_search(
            docs, r"spark\s+(join|window)"),
        "events_asof_join": lambda: asof_join_backward(
            purchases, clicks, key="user_id", ts="ts", id_col="event_id",
            right_payload=["value"]),
    }
    only = set(args.entries.split(",")) if args.entries else None
    out: dict[str, dict] = {}
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "plans", "r08")
    if args.tag:
        os.makedirs(plans_dir, exist_ok=True)

    def mintime(fn):
        fn()
        lat = []
        for _ in range(REPEATS):
            t = time.perf_counter()
            fn()
            lat.append(time.perf_counter() - t)
        return round(min(lat), 3)

    for name, mk in entries.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df = mk()
        rec: dict = {}
        rec["collect"] = mintime(lambda: mk().collect())
        if not args.no_noop:
            rec["noop"] = mintime(
                lambda: mk().write.format("noop").mode("overwrite").save())
        rec["rows"] = df.count()
        if args.tag:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
            rec["exchanges"] = plan.count("Exchange")
            rec["python_evals"] = (
                plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
            )
        out[name] = rec
        print(name, json.dumps(rec), flush=True)
    print("RESULT " + json.dumps({"sf_dir": sf_dir, "entries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
