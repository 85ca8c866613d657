"""Benchmark harness — prints ONE JSON line for the driver.

Headline workload:
- code_index_build:   full inverted-index build (tokenize -> salted
  shuffle -> external merge -> delta/varint blocks) over a deterministic
  synthetic Python-source corpus scaled by SF; reports files/sec.
- code_query_p50:     p50 latency of the 27-query reference set on the
  SERVING path (warm QueryService — the tier the reference's published
  25-287 ms numbers measure: prepared queries + Redis,
  reiz/web/api.py:50-63). extra carries the distributed-path p50
  (code_query_dist_p50: one Spark job per query, the cold/large-scan
  route) and code_query_disj (hot 8-term OR via MaxScore).
- documents-table ops at $SPARK_GRAFT_SF_DIR: BM25 top-k (conj + disj),
  exact n-gram-Jaccard dedup, MinHash-LSH dedup, brute-force cosine
  top-k, quality scoring.

Noise protocol: every steady-state entry is timed 3x and the MIN is
reported (the reference uses mean-of-5, scripts/benchmark_doc.py:22-34;
min rejects host noise hardest for a warm single-node run). The index
build — the headline files/sec metric — runs as TWO full passes into
fresh dirs with the min reported and both raw passes disclosed in
extra.build_passes, so a co-tenant load spike during one pass can no
longer silently become the round's number (r04 lesson: 402 vs 1078 f/s
for identical code on two boxes, unarbitrable from a single pass).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    from reiz_io_spark.operators import dedup, fulltext, similarity, textstats
    from reiz_io_spark.operators.build import build_index
    from reiz_io_spark.operators.score import IndexReader
    from reiz_io_spark.operators.wand import wand_topk
    from reiz_io_spark.plans.queries import lowered_reference_queries
    from reiz_io_spark.session import get_spark
    from reiz_io_spark.sources.corpus import synth_corpus

    spark = get_spark(
        app_name="reiz_io_spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    # Benign-noise hygiene for the bench-of-record: DAGScheduler logs a
    # scary "Failed to update accumulator ... non-existent accumulator"
    # ERROR when a broadcast-exchange job's last task reports after the
    # main job's cleanup (a known harmless race; rc stays 0, results
    # complete). Real failures surface as Python exceptions, so the
    # logger line is pure signal pollution in the captured tail.
    try:
        jvm = spark._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.FATAL,
        )
    except Exception:
        pass  # log4j2 core not reachable -> keep default logging
    queries: dict[str, float] = {}
    extra: dict[str, float] = {}
    # Noise protocol: every steady-state entry is timed REPEATS times
    # and reports the MIN (the reference uses mean-of-5,
    # scripts/benchmark_doc.py:22-34; min is the standard
    # noise-rejecting statistic for a warm single-node run). The index
    # build runs two full passes (see below) for the same reason.
    REPEATS = 3

    def _calibrate() -> float:
        # Box-speed sentinel: a fixed CPU-bound kernel (numpy FMA sweep
        # + sha256 over 40 MB), min-of-3, timed at suite start AND end.
        # The r05/r06 driver rounds each re-litigated 1.5-5x swings on
        # code-unchanged entries because nothing in the JSON disclosed
        # host speed; with calib_start_s/calib_end_s a contended round
        # is self-identifying, and scripts/bench_compare.py ANNOTATES
        # (never gates) entries when calibration differs >1.3x between
        # the rounds being compared.
        import hashlib

        import numpy as np

        a = np.arange(2_000_000, dtype=np.float64)
        buf = b"x" * 1_000_000
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            x = a.copy()
            for _ in range(25):
                x = x * 1.0000001 + 0.5
            h = hashlib.sha256()
            for _ in range(40):
                h.update(buf)
            h.digest()
            best = min(best, time.perf_counter() - t)
        return round(best, 4)

    extra["calib_start_s"] = _calibrate()

    # --- documents-table pipeline ops ---------------------------------------
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
    docs.count()
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    emb.count()
    # untimed warm-up: the first Arrow/pandas-UDF stage absorbs the fork
    # of the per-core Python workers (~2-3 s once per session; reused
    # afterwards — spark.python.worker.reuse). Timed numbers below are
    # steady-state op latencies on a warm session. This section runs
    # BEFORE the index build: two full build passes churn the JVM old
    # gen, and doc entries timed after them measured 50%+ slower (r05)
    # for identical code.
    fulltext.bm25_topk(docs, ["batch"], 3, True).collect()
    dedup.minhash_signatures(docs, 8, 3).count()

    def timed(name, fn):
        # one UNTIMED warm-up execution of the exact entry before the
        # timed repeats: the first runs of a distinct plan on a fresh
        # JVM carry JIT/codegen cost that min-of-3 provably does not
        # amortize (r06 arbitration, scripts/bench_order_study.py —
        # dedup_ngram_jaccard raw [10.9, 6.3, 4.4] cold vs
        # [2.67, 2.47, 2.72] warmed on the same box). With the warm-up,
        # entry timings are independent of section ordering — the
        # mechanism behind the r05 gate-flagged 'regressions' on
        # unchanged code (docs section moved to fresh-JVM position).
        fn()
        lat = []
        for _ in range(REPEATS):
            t = time.perf_counter()
            fn()
            lat.append(time.perf_counter() - t)
        queries[name] = round(min(lat), 3)

    timed("ft_bm25_conj", lambda: fulltext.bm25_topk(
        docs, ["batch", "hash", "join"], 10, True).collect())
    timed("ft_bm25_disj", lambda: fulltext.bm25_topk(
        docs, ["spark", "stream", "vector"], 10, False).collect())
    timed("dedup_ngram_jaccard", lambda: dedup.ngram_jaccard_pairs(
        docs, 3, 0.5).collect())
    timed("dedup_minhash_lsh", lambda: dedup.minhash_lsh_pairs(
        docs, 64, 16, 3, 0.5).collect())
    timed("ann_cosine_topk", lambda: similarity.brute_force_topk(
        emb, [0, 1, 2], 10).collect())
    timed("text_quality", lambda: textstats.quality_score(docs).collect())

    # round-3 ops (new keys — bench_compare treats missing-in-old as new)
    from reiz_io_spark.operators import phrase
    from reiz_io_spark.operators.asof import asof_join_backward

    timed("ft_phrase_topk", lambda: phrase.phrase_topk(
        docs, ["table", "hash"], 10).collect())
    # regex tier, one-shot path: literal-factor Contains prefilter
    # (scan-pushed) + rlike verify on survivors only
    from reiz_io_spark.operators import regexsearch

    timed("regex_factors_scan", lambda: regexsearch.regex_search(
        docs, r"spark\s+(join|window)").collect())
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    purchases = events.filter(events.event_type == "purchase")
    clicks = events.filter(events.event_type == "click")
    timed("events_asof_join", lambda: asof_join_backward(
        purchases, clicks, key="user_id", ts="ts", id_col="event_id",
        right_payload=["value"]).collect())

    # release the documents-section caches before the build section: the
    # double build churns the old gen, and (measured r05) UDF-heavy doc
    # entries timed AFTER it pay 50%+ GC tax a fresh JVM doesn't —
    # light steady-state ops are measured first, the heavy build last.
    docs.unpersist()
    emb.unpersist()
    spark.catalog.clearCache()

    # --- code engine: index build + query p50 -------------------------------
    # corpus sized so throughput reflects capacity, not Spark fixed cost
    from reiz_io_spark.sources.corpus import synth_corpus_distributed

    n_target = max(2_000, int(200_000 * sf))
    corpus = synth_corpus_distributed(spark, n_target, seed=42).cache()
    n_files = corpus.count()
    index_dir = tempfile.mkdtemp(prefix="bench_index_")
    try:
        # The build is the one headline entry a single cold pass can't
        # protect from co-tenant load (r04: 402 f/s driver vs 1078 f/s
        # builder box, unarbitrable). Two full builds into fresh dirs;
        # report the MIN and disclose both raw passes in build_passes.
        build_passes = []
        for p in range(2):
            pass_dir = index_dir if p == 0 else tempfile.mkdtemp(
                prefix="bench_index_p2_")
            t0 = time.perf_counter()
            build_index(spark, corpus, pass_dir, build_id="bench",
                        n_shards=max(cpus, 8))
            build_passes.append(round(time.perf_counter() - t0, 3))
            if p > 0:
                shutil.rmtree(pass_dir, ignore_errors=True)
        build_s = min(build_passes)
        queries["code_index_build"] = round(build_s, 3)
        extra["files_per_sec"] = round(n_files / build_s, 2)
        extra["n_files"] = n_files
        extra["build_passes"] = build_passes

        reader = IndexReader(spark, index_dir).warm()

        # distributed path: one Spark job per query (cold / big-scan route)
        lat = []
        for name, q in sorted(lowered_reference_queries().items()):
            t1 = time.perf_counter()
            wand_topk(reader, q, k=10).collect()
            lat.append(time.perf_counter() - t1)
        extra["code_query_dist_p50"] = round(statistics.median(lat), 3)
        extra["code_query_dist_p90"] = round(sorted(lat)[int(0.9 * (len(lat) - 1))], 3)
        extra["code_query_total"] = round(sum(lat), 3)

        # serving path: warm QueryService (the reference's benchmark tier).
        # Warm = the 27 queries' terms cached once (like its prepared
        # queries); the timed pass is the steady-state latency.
        from reiz_io_spark.serve import QueryService

        service = QueryService(reader)
        for name, q in sorted(lowered_reference_queries().items()):
            service.query_topk(q, k=10)  # warm term/posting caches
        # per-query min over REPEATS passes (a 3 ms measurement jitters
        # by 10%+ pass to pass; min-of-N makes the p50 comparable
        # across rounds like every other entry)
        best: dict[str, float] = {}
        for _ in range(REPEATS):
            for name, q in sorted(lowered_reference_queries().items()):
                t1 = time.perf_counter()
                service.query_topk(q, k=10)
                dt = time.perf_counter() - t1
                best[name] = min(best.get(name, float("inf")), dt)
        slat = sorted(best.values())
        queries["code_query_p50"] = round(statistics.median(slat), 4)
        extra["code_query_p90"] = round(slat[int(0.9 * (len(slat) - 1))], 4)

        # the whole 27-query suite as ONE Spark job (bulk/offline shape)
        from reiz_io_spark.operators.wand import wand_topk_batch

        batch_lat = []
        for _ in range(REPEATS):
            t1 = time.perf_counter()
            wand_topk_batch(reader, lowered_reference_queries(), k=10).collect()
            batch_lat.append(time.perf_counter() - t1)
        extra["code_query_batch27"] = round(min(batch_lat), 3)

        # hot disjunction (single 8-term OR group): the MaxScore path
        from reiz_io_spark.plans.lower import Group, LoweredQuery

        disj = LoweredQuery(name="hot_or", source="<bench OR>")
        disj.groups = [Group((
            "id:self", "id:data", "id:value", "id:result",
            "id:name", "id:obj", "id:items", "id:key",
        ))]
        disj_lat = []
        for _ in range(REPEATS):
            t1 = time.perf_counter()
            wand_topk(reader, disj, k=10).collect()
            disj_lat.append(time.perf_counter() - t1)
        queries["code_query_disj"] = round(min(disj_lat), 3)

        # regex tier, index-seek path: trigram sidecar build over the
        # bench index, then a selective grep (rarest-trigram posting
        # seek + verify) vs the defining brute rlike full scan
        t1 = time.perf_counter()
        regexsearch.build_trigram_index(spark, index_dir)
        extra["trigram_sidecar_build"] = round(time.perf_counter() - t1, 3)
        grep_pat = r"ident_0042\("  # ~2% of filler files hold any one ident
        timed("code_grep_index", lambda: regexsearch.grep_index(
            spark, index_dir, grep_pat).collect())
        # grep -n twin: same sidecar seek, render = per-line posexplode
        timed("code_grep_lines", lambda: regexsearch.grep_lines(
            spark, index_dir, grep_pat).collect())
        # caseless seek (case-variant trigram groups, not a full scan)
        timed("code_grep_caseless", lambda: regexsearch.grep_index(
            spark, index_dir, r"(?i)IDENT_0042\(").collect())
        # brute baseline lives in extra (not queries): it is the
        # deliberately-slow defining scan, not a suite entry — keeping
        # it out of `total` keeps round-over-round totals comparable
        regexsearch.grep_bruteforce(spark, index_dir, grep_pat).collect()
        brute_lat = []
        for _ in range(REPEATS):
            t1 = time.perf_counter()
            regexsearch.grep_bruteforce(spark, index_dir, grep_pat).collect()
            brute_lat.append(time.perf_counter() - t1)
        extra["code_grep_brute"] = round(min(brute_lat), 3)
        if queries["code_grep_index"] > 0:
            extra["grep_index_speedup"] = round(
                extra["code_grep_brute"] / queries["code_grep_index"], 2
            )

        # update tier (LAST: it mutates the bench index and its new
        # content batch staleness-invalidates the grep sidecar above).
        # One update commit over ~1% of files (delete-then-add folded
        # into one merge flip) + the compaction folding the replaced
        # versions — single cold passes: each is a real state mutation
        # (a second pass would be an unchanged-content no-op), so the
        # numbers carry co-tenant noise like any cold entry; cost is
        # proportional to the changed fraction, not the corpus.
        from pyspark.sql import functions as SF

        from reiz_io_spark.operators.deletes import compact_deletes
        from reiz_io_spark.operators.updates import update_docs

        upd_repo = (
            corpus.select("repo").distinct().orderBy("repo").limit(1)
            .collect()[0]["repo"]
        )
        upd_batch = corpus.filter(SF.col("repo") == upd_repo).withColumn(
            "content",
            SF.concat(
                SF.col("content"),
                SF.lit("\n\ndef bench_update_probe(x):\n    return len(x)\n"),
            ),
        )
        # recorded in extra, not queries: single-pass state mutations
        # (a repeat would be a no-op), so they don't belong in the
        # min-of-N steady-state total — same placement rationale as
        # code_grep_brute, keeping `value` comparable across rounds
        n_upd = upd_batch.count()
        t1 = time.perf_counter()
        update_docs(spark, index_dir, upd_batch)
        extra["code_update_commit"] = round(time.perf_counter() - t1, 3)
        t1 = time.perf_counter()
        compact_deletes(spark, index_dir)
        extra["code_update_compact"] = round(time.perf_counter() - t1, 3)
        extra["n_updated_docs"] = n_upd
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)

    extra["calib_end_s"] = _calibrate()
    total = round(sum(queries.values()), 3)
    extra["bench_protocol"] = (
        f"per-entry untimed warm-up then min-of-{REPEATS} (position-"
        f"independent; see scripts/bench_order_study.py); docs section "
        f"first, build last (min-of-2 full passes, raw passes in "
        f"build_passes)"
    )
    print(json.dumps({
        "metric": "index-build + query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "extra": extra,
        "cpus": cpus,
    }))
    spark.stop()


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


if __name__ == "__main__":
    main()
