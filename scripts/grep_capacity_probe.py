"""Trigram-grep crossover probe (VERDICT r06 #2): at sf0.1 (20k files)
the sidecar seek LOSES to the brute rlike scan (speedup 0.65-0.71) —
expected at tiny corpora where the scan is trivially cheap and the seek
pays fixed job overhead. The tier's entire reason is scale, so this
probe measures grep_index vs grep_bruteforce at capacity scale (240k /
1M files) across three pattern selectivities, min-of-3 warmed each.

Economy: grep touches only content/docs/meta + the sidecar, so the
probe builds a CONTENT-ONLY index layout (the stage1 table shapes
without the ast tokenize, which dominates full-build cost and buys
nothing for a content-scan benchmark). The sidecar build itself is
timed too — it is the tier's ingest cost.

Usage: python scripts/grep_capacity_probe.py [n_files]  (default 240_000)
Prints ONE JSON line; append the row to BENCH/BASELINE.md's capacity
section. Run on a QUIET box (any concurrent Spark job poisons it).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = 3
PATTERNS = {
    # ~25M defs / 16^4 suffixes -> a few hundred files at 1M files
    "sel": r"def [a-z]+_00ff\(",
    # any one ident_NNNN appears in ~2% of filler files
    "med": r"ident_0123\(",
    # template 4 puts "except ValueError" in most files
    "hot": r"except ValueError",
}


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from reiz_io_spark.operators import regexsearch
    from reiz_io_spark.session import get_spark
    from reiz_io_spark.sources.corpus import synth_corpus_distributed

    spark = get_spark(
        app_name="grep-capacity-probe", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth_corpus_distributed(spark, n_files, seed=42)
    index_dir = tempfile.mkdtemp(prefix="grep_capacity_")
    out: dict = {"n_files": n_files, "cpus": cpus}
    try:
        # ---- content-only index layout (stage1 shapes, no tokenize) ----
        n_shards = cpus
        base = corpus.select(
            F.xxhash64("repo", "path").alias("doc_id"),
            "repo", "path", "commit",
            F.sha2(F.col("content"), 256).alias("content_sha256"),
            "content",
            F.lit("cap").alias("batch"),
            F.pmod(F.xxhash64("repo"), F.lit(n_shards)).cast("int").alias(
                "shard"
            ),
        )
        t0 = time.perf_counter()
        base.repartition("shard").write.mode("overwrite").partitionBy(
            "batch", "shard"
        ).parquet(os.path.join(index_dir, "content"))
        content = spark.read.parquet(os.path.join(index_dir, "content"))
        content.select(
            "doc_id", "repo", "path", "commit", "content_sha256",
            F.lit(0).cast("long").alias("doclen"),
            F.lit(True).alias("parse_ok"),
            F.lit(None).cast("map<string,long>").alias("terms"),
            "batch", "shard",
        ).write.mode("overwrite").partitionBy("batch", "shard").parquet(
            os.path.join(index_dir, "docs")
        )
        with open(os.path.join(index_dir, "meta.json"), "w") as fh:
            json.dump({"version": 1}, fh)
        out["content_write_s"] = round(time.perf_counter() - t0, 1)

        t0 = time.perf_counter()
        regexsearch.build_trigram_index(spark, index_dir)
        out["sidecar_build_s"] = round(time.perf_counter() - t0, 1)

        def timed(fn):
            fn()  # untimed warm-up (bench.py protocol)
            lat = []
            for _ in range(REPEATS):
                t = time.perf_counter()
                n = fn()
                lat.append(time.perf_counter() - t)
            return round(min(lat), 3), n

        for name, pat in PATTERNS.items():
            ix_s, ix_n = timed(
                lambda: regexsearch.grep_index(spark, index_dir, pat).count()
            )
            br_s, br_n = timed(
                lambda: regexsearch.grep_bruteforce(
                    spark, index_dir, pat
                ).count()
            )
            assert ix_n == br_n, (name, ix_n, br_n)
            out[f"grep_{name}_index_s"] = ix_s
            out[f"grep_{name}_brute_s"] = br_s
            out[f"grep_{name}_rows"] = int(ix_n)
            out[f"grep_{name}_speedup"] = round(br_s / ix_s, 2) if ix_s else 0
        print(json.dumps(out))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
