"""Benchmark decontamination + PII scrubbing — the two hygiene passes
every LLM training pipeline runs before anything else.

Decontamination (n-gram overlap, the GPT-3/PaLM appendix method): a
document is contaminated if it shares any word n-gram with a benchmark
text. The benchmark side is tiny (eval sets), so its shingle set
BROADCASTS; the corpus side reuses the dedup shingle machinery — one
explode + a broadcast semi-join, no shuffle of corpus text. Output per
contaminated doc: how many distinct benchmark n-grams it hit and the
first offending n-gram (for auditability).

PII scrub: regexp_replace chains for emails / IPv4s / long digit runs
(phone/card shaped), all JVM-side, identical regex semantics in the
DuckDB twins. Returns the scrubbed text plus per-kind hit counts so a
pipeline can route high-PII docs to quarantine instead of training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles

# one regex vocabulary, shared verbatim with the SQL twins
EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
IPV4_RE = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
DIGITS_RE = "\\b[0-9]{9,16}\\b"


def contaminated_docs(
    documents: DataFrame, benchmark: DataFrame, n: int = 3
) -> DataFrame:
    """(doc_id, n_hits, first_hit): docs sharing >=1 word n-gram with
    any benchmark text. `benchmark` is any DataFrame with (bench_id,
    text) — eval-set sized, broadcast."""
    bench_shingles = (
        word_shingles(
            benchmark.select(
                F.col("bench_id").alias("doc_id"), "text"
            ),
            n=n,
        )
        .select("shingle")
        .distinct()
    )
    doc_shingles = word_shingles(documents, n=n)
    hits = doc_shingles.join(F.broadcast(bench_shingles), "shingle")
    return hits.groupBy("doc_id").agg(
        F.countDistinct("shingle").alias("n_hits"),
        F.min("shingle").alias("first_hit"),
    )


def contaminated_docs_sql(bench_rows: list[tuple[int, str]], n: int = 3) -> str:
    """DuckDB twin; the benchmark set is inlined as VALUES (it is
    eval-set sized by definition). Shingle construction is verbatim the
    dedup twin's proven formulation."""
    from .dedup import TOKEN_SPLIT

    values = ", ".join(
        "(%d, '%s')" % (bid, text.replace("'", "''"))
        for bid, text in bench_rows
    )
    return f"""
WITH bench(bench_id, text) AS (VALUES {values}),
btoks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS t
  FROM bench
),
bs AS (
  SELECT DISTINCT array_to_string(t[i+1:i+{n}], '_') AS shingle
  FROM btoks, unnest(range(0, len(t) - {n} + 1)) AS u(i)
  WHERE len(t) >= {n}
),
dtoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS t
  FROM documents
),
ds AS (
  SELECT DISTINCT doc_id, array_to_string(t[i+1:i+{n}], '_') AS shingle
  FROM dtoks, unnest(range(0, len(t) - {n} + 1)) AS u(i)
  WHERE len(t) >= {n}
)
SELECT doc_id, count(DISTINCT ds.shingle) AS n_hits, min(ds.shingle) AS first_hit
FROM ds JOIN bs ON ds.shingle = bs.shingle
GROUP BY doc_id
"""


def scrub_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_digit_runs, scrubbed) — counts per
    PII kind and the redacted text ([EMAIL]/[IP]/[NUM] placeholders).
    Map-only, zero shuffles, whole-stage codegen."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    scrub1 = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    n_ips = F.size(F.regexp_extract_all(scrub1, F.lit(IPV4_RE), F.lit(0)))
    scrub2 = F.regexp_replace(scrub1, IPV4_RE, "[IP]")
    n_digits = F.size(F.regexp_extract_all(scrub2, F.lit(DIGITS_RE), F.lit(0)))
    scrub3 = F.regexp_replace(scrub2, DIGITS_RE, "[NUM]")
    return documents.select(
        "doc_id",
        n_emails.cast("int").alias("n_emails"),
        n_ips.cast("int").alias("n_ips"),
        n_digits.cast("int").alias("n_digit_runs"),
        scrub3.alias("scrubbed"),
    )


def scrub_pii_sql() -> str:
    """DuckDB twin — same regexes, same sequential scrub order (each
    count runs against the previous stage's output, exactly like the
    Spark expression chain)."""
    return f"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
         regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g') AS t1
  FROM documents
),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{IPV4_RE}')) AS n_ips,
         regexp_replace(t1, '{IPV4_RE}', '[IP]', 'g') AS t2
  FROM s1
)
SELECT doc_id, CAST(n_emails AS INT) AS n_emails, CAST(n_ips AS INT) AS n_ips,
       CAST(len(regexp_extract_all(t2, '{DIGITS_RE}')) AS INT) AS n_digit_runs,
       regexp_replace(t2, '{DIGITS_RE}', '[NUM]', 'g') AS scrubbed
FROM s2
"""
