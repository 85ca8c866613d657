"""Fulltext pipeline over a generic text table (driver `documents` shape).

The same index/BM25 semantics as the code-corpus engine, expressed with
built-in Catalyst expressions only (zero UDFs — whole-stage codegen end
to end) so every step has an exact ANSI-SQL twin for the DuckDB oracle.

Tokenization contract (shared verbatim with the oracle SQL):
    tokens = non-empty pieces of regexp_split(lower(text), '[^a-z0-9]+')

All scoring constants and formulas match the code engine
(k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5))); floats surfaced to
the driver compare are rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1

TOKEN_SPLIT = "[^a-z0-9]+"


def spread_parallelism(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism guard (r8, guide §2.2/§2.5): when the
    input resolves to FEWER partitions than the cluster has slots (a
    single-row-group parquet file locally — the scan cannot be split
    below one row group), round-robin repartition so per-row-heavy
    stages (tokenize, regex, array lambdas) use every core instead of
    one or two. On real multi-file corpora the partition count already
    exceeds defaultParallelism and this is a NO-OP — no shuffle is
    added at scale. Row-content-independent: results of every keyed
    agg/join/window downstream are partitioning-invariant."""
    try:
        par = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            return df.repartition(par)
    except Exception:
        pass
    return df


def tokens(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """doc_id, toks array<string> — lowercased alnum tokens."""
    return documents.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda x: x != ""
        ).alias("toks"),
    )


def doc_stats(documents: DataFrame) -> DataFrame:
    """doc_id, doclen, sha256 — identity + length invariants."""
    t = tokens(documents)
    return (
        documents.join(t, "doc_id")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("doclen"),
            F.sha2(F.col("text"), 256).alias("content_sha256"),
        )
    )


def postings(documents: DataFrame) -> DataFrame:
    """(term, doc_id, tf, dl) — explode + partial/final hash agg."""
    t = tokens(documents).select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        F.explode("toks").alias("term"),
    )
    return t.groupBy("term", "doc_id", "dl").agg(F.count("*").alias("tf"))


def _postings_for_terms(documents: DataFrame, query_terms: list[str]) -> DataFrame:
    """``postings(documents).filter(term.isin(query_terms))`` computed
    without exploding the corpus (r8, guide §2.3/§4) — and, when every
    query term is a possible token ([a-z0-9]+), without tokenizing it
    either: per-term tf is ONE compiled whole-token regex count per
    term ('(?<![a-z0-9])t(?![a-z0-9])' — the boundary lookarounds make
    "substring match" == "token equality"), dl is the token-run count,
    and the (term, doc_id, tf, dl) rows come from a 3-element literal
    array explode — so the corpus-sized explode AND its
    (term, doc_id, dl) aggregation exchange are both gone; the rows
    leave the scan already aggregated. A JVM substring prefilter
    (lower(text) contains ANY term) is pushed to the scan and skips
    full scoring for docs that cannot hold a matching token; ANY-term
    even for conjunctive queries so per-term df counts stay exact.
    Row-identical to the filtered-postings formulation."""
    import re as _re

    tset = sorted(set(query_terms))
    probe = F.lower(F.col("text"))
    pre = None
    for t in tset:
        c = probe.contains(t)
        pre = c if pre is None else (pre | c)
    documents = spread_parallelism(documents)
    filtered = documents.filter(pre) if pre is not None else documents
    if tset and all(_re.fullmatch("[a-z0-9]+", t) for t in tset):
        s1 = filtered.select("doc_id", F.lower(F.col("text")).alias("_lt"))
        tf_cols = [
            F.regexp_count(
                F.col("_lt"), F.lit("(?<![a-z0-9])%s(?![a-z0-9])" % t)
            ).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(tset)
        ]
        s2 = s1.select(
            "doc_id",
            F.regexp_count(F.col("_lt"), F.lit("[a-z0-9]+"))
            .cast("long").alias("dl"),
            *tf_cols,
        )
        entries = F.array(*[
            F.struct(
                F.lit(t).alias("term"), F.col(f"_tf{i}").alias("tf")
            )
            for i, t in enumerate(tset)
        ])
        return (
            s2.select("doc_id", "dl", F.explode(entries).alias("e"))
            .select("doc_id", "dl", "e.term", "e.tf")
            .filter(F.col("tf") > 0)
            .select("term", "doc_id", "dl", "tf")
        )
    # defining fallback (a term that is not [a-z0-9]+ can only be
    # handled by real tokenization; it can never match, so the filtered
    # explode yields no rows for it — same as the regex path's absence)
    t = tokens(filtered).select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        F.explode(F.filter("toks", lambda x: x.isin(tset))).alias("term"),
    )
    return t.groupBy("term", "doc_id", "dl").agg(F.count("*").alias("tf"))


def dictionary(documents: DataFrame) -> DataFrame:
    """(term, df, cf, idf) with collection-level constants folded in."""
    n_docs = documents.count()  # scalar; the oracle SQL inlines the same
    p = postings(documents)
    return p.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    ).withColumn(
        "idf",
        F.log(
            1.0
            + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ),
    )


_STATS_CACHE: dict[tuple, tuple[int, float]] = {}


def invalidate_corpus_stats() -> None:
    """Explicit bust hook for long-lived serving processes that know a
    corpus changed out from under them (e.g. an external writer they
    cannot observe through the listing)."""
    _STATS_CACHE.clear()


def _stats_key(documents: DataFrame):
    """Memo key = (appId, plan semantic hash, file-listing fingerprint).

    The semantic hash alone is NOT enough for path-based sources:
    Spark's InMemoryFileIndex hashes/equals by rootPaths only, so a
    corpus OVERWRITTEN at the same path and freshly re-read in the same
    application would produce the same semantic hash — and silently
    serve the old corpus's (n_docs, avgdl). inputFiles() pins the key
    to the resolved file listing instead (parquet part files carry
    write-UUID names, so any rewrite changes the listing); a source
    with no listing (pure in-memory relation) contributes an empty
    fingerprint and relies on the semantic hash, which IS sound there
    (localRelation hashes its data)."""
    try:
        sem = int(documents._jdf.queryExecution().analyzed().semanticHash())
        files = tuple(sorted(documents.inputFiles()))
        import hashlib

        fp = hashlib.sha256("\x00".join(files).encode()).hexdigest()
        return (
            documents.sparkSession.sparkContext.applicationId, sem, fp,
        )
    except Exception:
        return None


def corpus_stats(documents: DataFrame) -> tuple[int, float]:
    """(n_docs, avgdl) with a per-application memo: repeat queries over
    the same corpus snapshot skip the full tokenize pass the stats need
    (half the index-free query's scan work). The memo key includes the
    resolved file listing (see _stats_key), so an in-place overwrite at
    the same path is observed by the next fresh read; a long-lived
    process can also call invalidate_corpus_stats() explicitly. Falls
    back to computing when the key is unavailable; the memo is
    process-local and tiny (one entry per distinct corpus snapshot)."""
    key = _stats_key(documents)
    if key is not None and key in _STATS_CACHE:
        return _STATS_CACHE[key]
    stats = tokens(spread_parallelism(documents)).agg(
        F.sum(F.size("toks")).alias("s"), F.count("*").alias("n")
    ).collect()[0]
    n_docs = int(stats["n"])
    avgdl = int(stats["s"] or 0) / n_docs
    if key is not None:
        _STATS_CACHE[key] = (n_docs, avgdl)
    return n_docs, avgdl


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 10,
    conjunctive: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k with conjunctive (every term) or disjunctive (any term)
    semantics; deterministic tie-break (score desc, doc_id asc).

    This is the index-free, DuckDB-checkable twin — one scoring job,
    plus a stats job memoized per corpus snapshot (corpus_stats). The
    SERVING path is the code-engine index (IndexReader/QueryService);
    never route interactive traffic here."""
    n_docs, avgdl = corpus_stats(documents)

    # the matched-postings relation feeds BOTH the df aggregation (the
    # broadcast build job) and the scoring join; without materialization
    # the corpus scan + per-term tf pass executes once per consumer
    # (r8 probe: 2x the whole scan). The matched set is query-sized
    # (docs holding >= 1 term x |terms|), so the cache is tiny; persist
    # (not localCheckpoint) so the blocks are freed promptly instead of
    # lingering past the query (bench-sequence heap hygiene).
    p = _postings_for_terms(documents, query_terms).persist()
    d = (
        p.groupBy("term").agg(F.count("*").alias("df"))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    j = p.join(F.broadcast(d), "term")
    contrib = (
        F.col("idf")
        * (F.col("tf") * F.lit(1.0 + k1))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.lit(avgdl)))
        )
    )
    scored = (
        j.withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 6).alias("score"),
            F.countDistinct("term").alias("n_matched"),
        )
    )
    if conjunctive:
        scored = scored.filter(F.col("n_matched") == len(set(query_terms)))
    return (
        scored.select("doc_id", "score", "n_matched")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk_sql(
    query_terms: list[str],
    k: int = 10,
    conjunctive: bool = True,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """The DuckDB oracle twin of bm25_topk (documents view)."""
    terms = ", ".join("'%s'" % t for t in sorted(set(query_terms)))
    having = (
        f"HAVING count(DISTINCT term) = {len(set(query_terms))}" if conjunctive else ""
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS toks
  FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs,
         (SELECT sum(len(toks)) FROM toks)::DOUBLE / count(*) AS avgdl
  FROM toks
),
p AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks
),
tf AS (
  SELECT term, doc_id, dl, count(*) AS tf FROM p
  WHERE term IN ({terms})
  GROUP BY term, doc_id, dl
),
d AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)
SELECT tf.doc_id AS doc_id,
       round(sum(
         ln(1.0 + ((SELECT n_docs FROM stats) - d.df + 0.5) / (d.df + 0.5))
         * (tf.tf * {1.0 + k1}) /
           (tf.tf + {k1} * ({1.0 - b} + {b} * (tf.dl / (SELECT avgdl FROM stats))))
       ), 6) AS score,
       count(DISTINCT tf.term) AS n_matched
FROM tf JOIN d USING (term)
GROUP BY tf.doc_id
{having}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_by_group(
    documents: DataFrame,
    query_terms: list[str],
    group_col: str,
    k_per_group: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Faceted retrieval: the disjunctive BM25 top-k WITHIN each value
    of ``group_col`` (top matches per language, per source, per
    license...). One scoring pass + one window rank per group — the
    grouped-top-k shape that a global LIMIT cannot express.

    Same scoring contract as bm25_topk; deterministic tie-break
    (score desc, doc_id asc) inside each group."""
    from pyspark.sql.window import Window

    n_docs, avgdl = corpus_stats(documents)

    p = _postings_for_terms(documents, query_terms)
    d = (
        p.groupBy("term").agg(F.count("*").alias("df"))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    contrib = (
        F.col("idf")
        * (F.col("tf") * F.lit(1.0 + k1))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / F.lit(avgdl)))
        )
    )
    scored = (
        p.join(F.broadcast(d), "term")
        .withColumn("contrib", contrib)
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
        .join(documents.select("doc_id", group_col), "doc_id")
    )
    # two-level top-k (operators/topk.py): per-group scored sets are
    # df-driven and unbounded for hot terms — never one reducer/group
    from .topk import two_level_topk

    return two_level_topk(
        scored, [group_col], [F.desc("score"), F.asc("doc_id")],
        k_per_group, bucket_on="doc_id", rank_name="rnk",
    ).select(
        group_col, "doc_id", "score", F.col("rnk").cast("int").alias("rnk")
    )


def bm25_topk_by_group_sql(
    query_terms: list[str],
    group_col: str,
    k_per_group: int = 3,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of bm25_topk_by_group (documents view)."""
    terms = ", ".join("'%s'" % t for t in sorted(set(query_terms)))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS toks
  FROM documents
),
stats AS (
  SELECT count(*)::DOUBLE AS n_docs,
         (SELECT sum(len(toks)) FROM toks)::DOUBLE / count(*) AS avgdl
  FROM toks
),
p AS (
  SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks
),
tf AS (
  SELECT term, doc_id, dl, count(*) AS tf FROM p
  WHERE term IN ({terms})
  GROUP BY term, doc_id, dl
),
d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id AS doc_id,
         round(sum(
           ln(1.0 + ((SELECT n_docs FROM stats) - d.df + 0.5) / (d.df + 0.5))
           * (tf.tf * {1.0 + k1}) /
             (tf.tf + {k1} * ({1.0 - b} + {b} * (tf.dl / (SELECT avgdl FROM stats))))
         ), 6) AS score
  FROM tf JOIN d USING (term) GROUP BY tf.doc_id
),
ranked AS (
  SELECT doc.{group_col} AS {group_col}, s.doc_id, s.score,
         row_number() OVER (PARTITION BY doc.{group_col}
                            ORDER BY s.score DESC, s.doc_id ASC) AS rnk
  FROM scored s JOIN documents doc USING (doc_id)
)
SELECT {group_col}, doc_id, score, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= {k_per_group}
"""


def snippets(
    documents: DataFrame, query_terms: list[str], window: int = 3
) -> DataFrame:
    """Result rendering for the documents tier: for every doc matching
    ANY query term, the token window around the FIRST match —
    (doc_id, first_pos 1-based, snippet). The documents-table analog of
    the code engine's source segments (fetch.py renders a source slice
    per match). Zero-UDF: array_position / slice / array_join.

    Deterministic: first_pos = min over terms of each term's first
    occurrence; window is clipped at both ends."""
    t = tokens(documents)
    positions = F.array(
        *[F.array_position("toks", F.lit(term)) for term in query_terms]
    )
    hit = F.array_min(F.filter(positions, lambda p: p > 0))
    start = F.greatest(hit - window, F.lit(1))
    return (
        t.select("doc_id", "toks", hit.alias("first_pos"))
        .filter(F.col("first_pos").isNotNull())
        .select(
            "doc_id",
            "first_pos",
            F.array_join(
                F.slice("toks", start, 2 * window + 1), " "
            ).alias("snippet"),
        )
    )


def snippets_sql(query_terms: list[str], window: int = 3) -> str:
    """DuckDB twin of snippets (documents view)."""
    pos_list = ", ".join(
        f"coalesce(list_position(toks, '{t}'), 0)" for t in query_terms
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS toks
  FROM documents
),
hits AS (
  SELECT doc_id, toks,
         list_min(list_filter([{pos_list}], p -> p > 0)) AS first_pos
  FROM toks
)
SELECT doc_id, CAST(first_pos AS BIGINT) AS first_pos,
       array_to_string(
         toks[greatest(first_pos - {window}, 1) :
              greatest(first_pos - {window}, 1) + {2 * window}],
         ' ') AS snippet
FROM hits WHERE first_pos IS NOT NULL
"""


def fuzzy_term_matches(
    documents: DataFrame, query_term: str, max_edits: int = 1
) -> DataFrame:
    """Typo-tolerant term lookup ("did you mean"): dictionary terms
    within edit distance <= max_edits of query_term, with their df —
    (term, df, dist). Only max_edits=1 is supported (the SymSpell
    deletion-neighborhood identity below is distance-1).

    SCALE SHAPE (SymSpell, symmetric-delete): dist(a,b) <= 1 iff
    a == b, or b ∈ del1(a), or a ∈ del1(b), or del1(a) ∩ del1(b) != ∅.
    The dictionary explodes once into its delete-1 variants (|term|+1
    rows per term — a one-time index, incrementally maintainable), the
    QUERY's tiny variant set broadcasts, and candidates come from an
    equi-join on the variant string — never a corpus-wide levenshtein
    scan. A final levenshtein on the CANDIDATES only (hundreds, not
    10^9) both verifies and grades. The driver oracle is the brute
    levenshtein filter; tests/test_fuzzy pins equality of the two
    shapes.
    """
    if max_edits != 1:
        raise ValueError("fuzzy_term_matches: only max_edits=1 supported")
    d = dictionary(documents).select("term", "df")

    q = query_term
    q_variants = {q} | {q[:i] + q[i + 1:] for i in range(len(q))}
    spark = documents.sparkSession
    qv = spark.createDataFrame(
        [(v,) for v in sorted(q_variants)], "variant string"
    )

    # dictionary side: term -> {term} ∪ del1(term), one explode
    dv = d.select(
        "term",
        "df",
        F.explode(
            F.array_union(
                F.array(F.col("term")),
                F.transform(
                    F.sequence(F.lit(1), F.length("term")),
                    lambda i: F.concat(
                        F.substring(F.col("term"), F.lit(1), i - 1),
                        F.col("term").substr(i + 1, F.length("term")),
                    ),
                ),
            )
        ).alias("variant"),
    )
    cand = (
        dv.join(F.broadcast(qv), "variant")
        .select("term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein(F.col("term"), F.lit(q)))
        .filter(F.col("dist") <= max_edits)
    )
    return cand.select("term", "df", F.col("dist").cast("int").alias("dist"))


def fuzzy_term_matches_sql(query_term: str, max_edits: int = 1) -> str:
    """DuckDB twin: brute levenshtein over the dictionary (the oracle
    need not scale; it defines the semantics)."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS toks
  FROM documents
),
p AS (SELECT doc_id, unnest(toks) AS term FROM toks),
d AS (SELECT term, count(DISTINCT doc_id) AS df FROM p GROUP BY term)
SELECT term, df, CAST(levenshtein(term, '{query_term}') AS INT) AS dist
FROM d WHERE levenshtein(term, '{query_term}') <= {max_edits}
"""
