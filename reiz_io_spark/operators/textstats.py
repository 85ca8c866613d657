"""Text-analysis operators for training-data pipelines over `documents`.

All pure built-in expressions (whole-stage codegen; exact DuckDB twins):

- language-ID: stopword-hit-ratio heuristic against small per-language
  stopword lists (deterministic n-gram-free variant — the corpus is
  synthetic, the mechanism is the point),
- quality scoring: length / punctuation-ratio / stopword-ratio /
  mean-token-length features combined into one score,
- token counting: whitespace tokens + a BPE-ish subword estimate
  (ceil(chars/4) per token, the common GPT-ish heuristic),
- fingerprinting: 64-bit polynomial rolling hash of the normalized
  token stream (content-defined, whitespace-insensitive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fulltext import TOKEN_SPLIT

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "es": ["el", "la", "los", "y", "de"],
    "fr": ["le", "la", "les", "et", "de"],
}


def _toks(text_col="text"):
    return F.filter(F.split(F.lower(text_col), TOKEN_SPLIT), lambda x: x != "")


def language_id(documents: DataFrame) -> DataFrame:
    """doc_id, pred_lang: argmax stopword-hit count; tie/zero -> 'und'."""
    toks = _toks()
    langs = sorted(STOPWORDS)
    counts = [
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang]))).alias(f"c_{lang}")
        for lang in langs
    ]
    df = documents.select("doc_id", *counts)
    best = F.greatest(*[F.col(f"c_{lang}") for lang in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first-wins tie-break in fixed lang order
        pred = pred.when(F.col(f"c_{lang}") == best, F.lit(lang))
    return df.select("doc_id", pred.alias("pred_lang"))


def language_id_sql() -> str:
    langs = sorted(STOPWORDS)
    count_exprs = ",\n  ".join(
        "len(list_filter(toks, t -> t IN ({lst}))) AS c_{lang}".format(
            lst=", ".join("'%s'" % w for w in STOPWORDS[lang]), lang=lang
        )
        for lang in langs
    )
    best = "greatest({})".format(", ".join(f"c_{lang}" for lang in langs))
    case = "CASE WHEN {best} <= 0 THEN 'und' ".format(best=best)
    for lang in langs:
        case += f"WHEN c_{lang} = {best} THEN '{lang}' "
    case += "END"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id,
  {count_exprs}
  FROM toks
)
SELECT doc_id, {case} AS pred_lang FROM c
"""


def quality_score(documents: DataFrame) -> DataFrame:
    """doc_id + interpretable quality features + combined score.

    r8 (guide §1.2 per-task work): the r7 formulation evaluated three
    higher-order array lambdas (filter/isin, aggregate) per doc — HOFs
    are CodegenFallback, interpreted per element — and re-tokenized in
    its own row filter. Every feature is a function of the token
    MULTISET's counts/lengths, so each is re-expressed as one compiled
    JVM regexp over the lowered text (whole-stage codegen, single
    pass, no array materialization):

    - n_tokens: count of maximal [a-z0-9]+ runs == count of split
      tokens (regexp_count);
    - stop hits: tokens are space-bounded after collapsing separator
      runs to ' ' (with sentinel spaces at both ends), so whole-token
      stopword matches are ' (w1|...|wk)(?= )' — the lookahead leaves
      the trailing space for the NEXT token's leading match, so
      adjacent stopwords all count (non-overlap would otherwise eat
      the shared separator);
    - mean token length: sum(len(tok)) == count of alnum chars in the
      lowered text (strip separators, take length). The old fold
      added integer lengths in float64 — exact for these magnitudes —
      so integer-sum/n is bit-identical.

    Counts are integers equal to the r7 expressions' values, and the
    ratio/rounding arithmetic is unchanged, so scores hash-match
    (oracle-gated: text_quality, pipeline_clean_corpus)."""
    from .fulltext import spread_parallelism

    documents = spread_parallelism(documents)
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    lower_az = "abcdefghijklmnopqrstuvwxyz0123456789"
    both_az = " abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    # row filter FIRST: n_toks > 0 iff ANY alnum char exists; rlike
    # short-circuits at the first match, so the predicate the optimizer
    # pushes below the parallelism exchange (into the possibly
    # single-partition scan stage) is O(prefix) per row instead of the
    # full tokenize regex — which the r8 probe showed running 1-core
    # for the whole corpus. length(text) > 0 is implied by the match;
    # keeping it preserves the exact r7 filter semantics for free.
    filtered = documents.filter(
        (F.length("text") > 0) & F.lower(F.col("text")).rlike("[a-z0-9]")
    )
    # staged projections: lower(text) and the token-count regex are each
    # referenced by several features; CollapseProject does NOT inline a
    # multiply-referenced non-cheap alias, so each is evaluated ONCE per
    # row (the single-projection form re-ran the tokenize regex 3x and
    # lower() 3x — measured 2.3 s vs 0.4 s at 50k docs).
    s1 = filtered.select("doc_id", "text", F.lower(F.col("text")).alias("_lt"))
    s2 = s1.select(
        "doc_id", "text", "_lt",
        F.regexp_count(F.col("_lt"), F.lit("[a-z0-9]+")).alias("_nt"),
    )
    # punct chars: length(text) minus [a-zA-Z0-9 ] chars — translate is
    # a char-map delete (no regex); identical count to the r7
    # regexp_replace('[a-zA-Z0-9 ]','') length.
    punct_ratio = (
        F.length(F.translate(F.col("text"), both_az, "")) / F.length("text")
    )
    # whole-token stopword hits in ONE non-consuming pass: a token
    # equals w iff w appears bounded by non-[a-z0-9] (or string edge) on
    # both sides; lookarounds don't consume separators, so adjacent
    # stopword tokens all match (same count as the r7 per-token isin).
    stop_hits = F.regexp_count(
        F.col("_lt"),
        F.lit("(?<![a-z0-9])(%s)(?![a-z0-9])" % "|".join(all_stop)),
    )
    # sum of token lengths == count of [a-z0-9] chars in the lowered
    # text; the r7 fold added integer lengths in float64 (exact at
    # these magnitudes), so the integer-difference sum is bit-identical.
    sum_tok_len = F.length("_lt") - F.length(
        F.translate(F.col("_lt"), lower_az, "")
    )
    df = s2.select(
        "doc_id",
        F.col("_nt").cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_hits / F.col("_nt"), 6).alias("stop_ratio"),
        F.round(sum_tok_len.cast("double") / F.col("_nt"), 6).alias(
            "mean_token_len"
        ),
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
        + F.least(F.col("stop_ratio") * 10.0, F.lit(1.0)) * 0.3
    )
    return df.withColumn("quality", F.round(score, 6))


def quality_score_sql() -> str:
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    lst = ", ".join("'%s'" % w for w in all_stop)
    return f"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS toks
  FROM documents WHERE len(text) > 0
    AND len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '')) > 0
),
feat AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         round(len(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE / len(text), 6) AS punct_ratio,
         round(len(list_filter(toks, t -> t IN ({lst})))::DOUBLE / len(toks), 6) AS stop_ratio,
         round(list_sum(list_transform(toks, t -> len(t)::DOUBLE)) / len(toks), 6) AS mean_token_len
  FROM base
)
SELECT *,
       round(least(n_tokens / 100.0, 1.0) * 0.4
             + (1.0 - least(punct_ratio * 5.0, 1.0)) * 0.3
             + least(stop_ratio * 10.0, 1.0) * 0.3, 6) AS quality
FROM feat
"""


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens, alnum tokens, and a BPE-ish subword estimate."""
    ws = F.size(F.filter(F.split("text", "\\s+"), lambda x: x != ""))
    alnum = F.size(_toks())
    bpe_est = F.aggregate(
        _toks(),
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
    )
    return documents.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        alnum.cast("long").alias("alnum_tokens"),
        bpe_est.alias("bpe_est_tokens"),
    )


def token_counts_sql() -> str:
    return f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS ws_tokens,
       len(list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '')) AS alnum_tokens,
       CAST(COALESCE(list_sum(list_transform(
            list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> ''),
            t -> ceil(len(t) / 4.0))), 0) AS BIGINT) AS bpe_est_tokens
FROM documents
"""


FP_BASE = 1_000_003
FP_MOD = (1 << 31) - 1  # Mersenne; keeps acc*base + x < 2^51, no int64 overflow


def fingerprint(documents: DataFrame) -> DataFrame:
    """Polynomial rolling hash over the normalized token stream:
    h = fold(acc * BASE + tokhash) mod 2^31-1, with tokhash the same
    fold over the token's character codes — whitespace/punctuation-
    insensitive content fingerprint with an exact SQL twin. Characters
    are addressed via substring(i) (not split-by-empty, whose trailing
    element differs between regex engines)."""
    def tok_hash(t):
        chars = F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.ascii(t.substr(i, F.lit(1))),
        )
        return F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda acc, ch: F.pmod(acc * F.lit(131) + ch, F.lit(FP_MOD)),
        )

    doc_hash = F.aggregate(
        F.transform(_toks(), tok_hash),
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * F.lit(FP_BASE) + h, F.lit(FP_MOD)),
    )
    return documents.select("doc_id", doc_hash.alias("fingerprint"))


def fingerprint_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS toks
  FROM documents
),
tok_hashes AS (
  SELECT doc_id,
         list_transform(toks,
           t -> list_reduce(
                  list_prepend(0::BIGINT,
                    list_transform(range(1, len(t) + 1), i -> ascii(substr(t, i::INT, 1))::BIGINT)),
                  (acc, ch) -> (acc * 131 + ch) % {FP_MOD})) AS hs
  FROM toks
)
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, hs),
                   (acc, h) -> (acc * {FP_BASE} + h) % {FP_MOD}) AS fingerprint
FROM tok_hashes
"""


def chunk_documents(
    documents: DataFrame, window: int = 64, stride: int = 48
) -> DataFrame:
    """Sliding context-window chunking — the training-data prep step
    that turns documents into fixed-budget model inputs (stride <
    window gives overlapping windows so no boundary context is lost).

    Whitespace tokens (the token_counts convention, case preserved);
    chunk i covers tokens [i*stride, i*stride + window); starts run
    while start < n_tokens, so the tail emits one final (possibly
    short) window. All JVM built-ins: one split, one sequence-explode,
    one slice — map-only, no shuffle, scale-free."""
    if stride <= 0 or window <= 0:
        raise ValueError("chunk_documents: window and stride must be >= 1")
    toks = F.filter(F.split("text", "\\s+"), lambda x: x != "")
    with_toks = documents.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    starts = F.sequence(
        F.lit(0), F.size("toks") - 1, F.lit(stride)
    )
    return (
        with_toks.select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / F.lit(stride)).cast("long").alias("chunk_id"),
            F.slice("toks", F.col("start") + 1, window).alias("w"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("w").cast("long").alias("n_tokens"),
            F.array_join("w", " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(window: int = 64, stride: int = 48) -> str:
    """DuckDB twin: same whitespace split, generate_series starts,
    1-based inclusive list slice."""
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
s AS (
  -- range(0, n, k) is a scalar list function (generate_series can't
  -- take lateral column bounds); excludes n, so starts match Spark's
  -- sequence(0, n-1, k) exactly
  SELECT doc_id, toks, unnest(range(0, len(toks), {stride})) AS start
  FROM t
  WHERE len(toks) > 0
)
SELECT doc_id,
       (start // {stride})::BIGINT AS chunk_id,
       len(toks[start + 1 : start + {window}])::BIGINT AS n_tokens,
       array_to_string(toks[start + 1 : start + {window}], ' ') AS chunk_text
FROM s
"""


def pack_offsets(documents: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Concat-and-split sequence packing, as METADATA: the standard LLM
    pretraining packing (documents concatenated in a deterministic
    order, the stream split every ``seq_len`` tokens) reduced to one
    window cumsum — for each doc: its global token offset, the first
    and last training sequence it lands in, and its offset inside the
    first one. A data loader materializes sequences from this without
    the engine ever shuffling token-level rows (the token stream is
    10^12 rows at scale; this plan is one doc-level ordered window).

    Deterministic order = doc_id ascending (ties impossible: ids are
    unique). Empty docs occupy zero tokens and are dropped."""
    if seq_len <= 0:
        raise ValueError("pack_offsets: seq_len must be >= 1")
    from pyspark.sql.window import Window

    n_toks = F.size(F.filter(F.split("text", "\\s+"), lambda x: x != ""))
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sized = documents.select(
        "doc_id", n_toks.cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    return sized.select(
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tok_offset"),
    ).select(
        "doc_id",
        "n_tokens",
        "tok_offset",
        (F.col("tok_offset") / F.lit(seq_len)).cast("long").alias("seq_first"),
        (
            (F.col("tok_offset") + F.col("n_tokens") - 1) / F.lit(seq_len)
        ).cast("long").alias("seq_last"),
        (F.col("tok_offset") % F.lit(seq_len)).alias("offset_in_seq"),
    )


def pack_offsets_sql(seq_len: int = 2048) -> str:
    return f"""
WITH sized AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'),
             x -> x <> ''))::BIGINT AS n_tokens
  FROM documents
),
off AS (
  SELECT doc_id, n_tokens,
         (SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens)::BIGINT
           AS tok_offset
  FROM sized
  WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, tok_offset,
       (tok_offset // {seq_len})::BIGINT AS seq_first,
       ((tok_offset + n_tokens - 1) // {seq_len})::BIGINT AS seq_last,
       (tok_offset % {seq_len})::BIGINT AS offset_in_seq
FROM off
"""
