"""Round-8 measurement harness (guide §1): per-entry timing with the
bench's exact shape (.collect()) AND noop-sink isolation (computation
only, §1.4), plus .explain('formatted') capture for plans/r08/.

Does NOT replace bench.py (frozen). Usage:
    python scripts/bench_phases.py [--sf-dir /root/testdata/sf1.0] \
        [--entries ft_bm25_conj,...] [--plans-tag before] [--repeats 3]

Prints one JSON line: {"entry": {"collect_s": .., "noop_s": ..}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--entries", default="")
    ap.add_argument("--plans-tag", default="")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from reiz_io_spark.operators import (
        dedup, fulltext, phrase, regexsearch, similarity, textstats,
    )
    from reiz_io_spark.operators.asof import asof_join_backward
    from reiz_io_spark.session import get_spark

    spark = get_spark(
        app_name="bench_phases",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    sc = spark.sparkContext
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).cache()
    docs.count()
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet")).cache()
    emb.count()
    events = spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
    purchases = events.filter(events.event_type == "purchase")
    clicks = events.filter(events.event_type == "click")

    # same fns as bench.py (same args), returning the DataFrame
    entries = {
        "ft_bm25_conj": lambda: fulltext.bm25_topk(
            docs, ["batch", "hash", "join"], 10, True),
        "ft_bm25_disj": lambda: fulltext.bm25_topk(
            docs, ["spark", "stream", "vector"], 10, False),
        "dedup_ngram_jaccard": lambda: dedup.ngram_jaccard_pairs(docs, 3, 0.5),
        "dedup_minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs, 64, 16, 3, 0.5),
        "ann_cosine_topk": lambda: similarity.brute_force_topk(emb, [0, 1, 2], 10),
        "text_quality": lambda: textstats.quality_score(docs),
        "ft_phrase_topk": lambda: phrase.phrase_topk(docs, ["table", "hash"], 10),
        "regex_factors_scan": lambda: regexsearch.regex_search(
            docs, r"spark\s+(join|window)"),
        "events_asof_join": lambda: asof_join_backward(
            purchases, clicks, key="user_id", ts="ts", id_col="event_id",
            right_payload=["value"]),
    }
    wanted = [e for e in args.entries.split(",") if e] or list(entries)
    out: dict[str, dict] = {}
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    for name in wanted:
        fn = entries[name]
        if args.plans_tag:
            with open(os.path.join(
                    plans_dir, f"{name}_{args.plans_tag}.txt"), "w") as fh:
                fh.write(fn()._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))
        rec: dict[str, float] = {}
        for mode in ("collect", "noop"):
            sc.setJobDescription(f"{name}:{mode}")
            def run():
                df = fn()
                if mode == "collect":
                    df.collect()
                else:
                    df.write.format("noop").mode("overwrite").save()
            run()  # untimed warm-up (bench protocol)
            lat = []
            for _ in range(args.repeats):
                t = time.perf_counter()
                run()
                lat.append(time.perf_counter() - t)
            rec[f"{mode}_s"] = round(min(lat), 3)
            rec[f"{mode}_max"] = round(max(lat), 3)
        out[name] = rec
        print(f"## {name}: {rec}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": args.sf_dir, "entries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
