"""Composed training-data hygiene pipeline — the operators are built
to CHAIN, and this module is the proof: one declarative DataFrame job
running the standard pre-training corpus prep,

    exact dedup -> quality gate -> benchmark decontamination -> split

(the C4/RefinedWeb-style cleanup sequence). Catalyst sees the whole
chain at once: the map-only stages (quality features, split hash)
fuse into the scans, the dedup keeper set semi-joins on doc_id, the
benchmark shingle set stays broadcast inside the decontam anti-join —
no stage materializes an intermediate corpus copy.

Scale shape per gate (each is the already-plan-audited operator):
- dedup: one shuffle on the content hash, then a doc_id semi-join;
- quality: whole-stage-codegen expressions, zero shuffles;
- decontam: doc shingles vs a BROADCAST eval-set shingle table, then a
  doc_id anti-join — corpus text never shuffles;
- split: pure hash arithmetic, zero shuffles, growth-stable.

The DuckDB twin composes the component twins verbatim, so the chained
entry would expose any composition bug (join key drift, gate ordering)
that the per-operator entries cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import contaminated_docs, contaminated_docs_sql
from .dedup import exact_dedup
from .sampling import hash_split, hash_split_sql
from .textstats import quality_score, quality_score_sql


def clean_corpus(
    documents: DataFrame,
    benchmark: DataFrame,
    quality_min: float = 0.5,
    n: int = 3,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """(doc_id, lang, quality, split) for every document that survives
    all three gates: is its duplicate-group keeper, scores at least
    `quality_min`, and shares no word n-gram with the benchmark set."""
    weights = weights or {"train": 0.8, "test": 0.1, "val": 0.1}
    keepers = exact_dedup(documents).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    quality = quality_score(documents).select("doc_id", "quality")
    contaminated = contaminated_docs(documents, benchmark, n=n).select("doc_id")
    splits = hash_split(documents, "doc_id", weights)
    return (
        documents.select("doc_id", "lang")
        .join(keepers, "doc_id", "left_semi")
        .join(quality, "doc_id")
        .filter(F.col("quality") >= quality_min)
        .join(contaminated, "doc_id", "left_anti")
        .join(splits, "doc_id")
        .select("doc_id", "lang", "quality", "split")
    )


def clean_corpus_sql(
    bench_rows: list[tuple[int, str]],
    quality_min: float = 0.5,
    n: int = 3,
    weights: dict[str, float] | None = None,
) -> str:
    weights = weights or {"train": 0.8, "test": 0.1, "val": 0.1}
    return f"""
WITH q AS (SELECT doc_id, quality FROM ({quality_score_sql()})),
keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
contam AS (
  SELECT DISTINCT doc_id FROM ({contaminated_docs_sql(bench_rows, n=n)})
),
s AS (SELECT doc_id, split FROM ({hash_split_sql('documents', 'doc_id', weights)}))
SELECT d.doc_id, d.lang, q.quality, s.split
FROM documents d
JOIN keepers k ON d.doc_id = k.doc_id
JOIN q ON d.doc_id = q.doc_id
JOIN s ON d.doc_id = s.doc_id
WHERE q.quality >= {quality_min}
  AND d.doc_id NOT IN (SELECT doc_id FROM contam)
"""
