"""Deduplication operators for training-data pipelines over `documents`.

Four tiers, all distributed:

- exact_dedup: sha256(text) hash-groupBy — one shuffle, scales linearly.
- ngram_jaccard_pairs: EXACT word-n-gram Jaccard via a shingle
  inverted-index self-join — the candidate join is on shingle hash, so
  only documents sharing a shingle ever meet (no O(n^2) cross join).
- minhash_lsh_pairs: MinHash signatures + banded LSH bucketing — the
  sublinear-candidate scale path; candidates are verified with exact
  Jaccard so output precision is exact (recall is probabilistic, as
  published: Broder '97 resemblance sketches).
- simhash64: 64-bit SimHash fingerprints (Charikar '02) for
  hamming-distance near-dup detection.

Exact variants are pure built-ins (oracle-SQL twins exist); MinHash and
SimHash use vectorized pandas UDFs (hash mixing isn't expressible in
portable SQL) and are covered by rows-only driver checks + pytest.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from .fulltext import TOKEN_SPLIT


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Canonical doc per identical text: min doc_id wins.
    (term: the reference has no dedup; this is pipeline tooling.)"""
    return (
        documents.select("doc_id", F.sha2("text", 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def word_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """doc_id, shingle (distinct word n-grams, '_'-joined)."""
    toks = documents.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), TOKEN_SPLIT), lambda x: x != "").alias("t"),
    )
    idx = F.sequence(F.lit(0), F.size("t") - F.lit(n))
    sh = toks.filter(F.size("t") >= n).select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws("_", F.slice("t", i + 1, n)),
            )
        ).alias("shingle"),
    )
    return sh.distinct()


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via shingle-join.

    |A ∩ B| from the inverted shingle index; |A ∪ B| = |A|+|B|-|A∩B|.
    Shuffles: one explode+distinct, one self-join keyed on shingle
    (co-partitioned, no broadcast of the big side), one pair-agg.
    """
    sh = word_shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(n: int = 3, threshold: float = 0.5) -> str:
    """DuckDB oracle twin of ngram_jaccard_pairs."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT}'), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(t[i+1:i+{n}], '_') AS shingle
  FROM toks, unnest(range(0, len(t) - {n} + 1)) AS u(i)
  WHERE len(t) >= {n}
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 6) >= {threshold}
"""


# --- MinHash + LSH -----------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def _minhash_params(n_hashes: int, seed: int = 42):
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64).astype(object)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64).astype(object)
    return a, b


def minhash_signatures(
    documents: DataFrame, n_hashes: int = 64, shingle_n: int = 3, seed: int = 42
) -> DataFrame:
    """doc_id, sig array<long> — (a*x+b mod p) permutation minima over
    shingle hashes; NumPy-vectorized inside an Arrow batch."""
    a_params, b_params = _minhash_params(n_hashes, seed)

    @pandas_udf(ArrayType(LongType()))
    def sig_udf(shingle_lists: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for shingles in shingle_lists:
            if shingles is None or len(shingles) == 0:
                out.append([int(_MAX_HASH)] * n_hashes)
                continue
            # stable 64-bit shingle hashes (FNV-1a), vectorized per doc
            hs = np.array(
                [_fnv1a64(s) for s in shingles], dtype=np.uint64
            ).astype(object)
            mins = []
            for i in range(n_hashes):
                vals = (int(a_params[i]) * hs + int(b_params[i])) % _MERSENNE
                mins.append(int((vals % (_MAX_HASH + 1)).min()))
            out.append(mins)
        return pd.Series(out)

    sh = word_shingles(documents, shingle_n)
    grouped = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shingles"))
    return grouped.select("doc_id", sig_udf("shingles").alias("sig"))


def _fnv1a64(s: str) -> int:
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def minhash_lsh_pairs(
    documents: DataFrame,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """LSH candidates (band-bucket join) verified with exact Jaccard.

    Scale path: band explode is n_docs*bands rows; the bucket self-join
    only pairs docs agreeing on a whole band. Output: exact-verified
    pairs (doc_a, doc_b, jaccard) — precision 1.0, recall ~ S-curve
    1-(1-t^r)^b."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(documents, n_hashes, shingle_n, seed)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.xxhash64(
                    F.slice("sig", bi * rows_per_band + 1, rows_per_band).cast(
                        "string"
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    exact = ngram_jaccard_pairs(documents, n=shingle_n, threshold=threshold)
    return candidates.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "jaccard"
    )


# --- SimHash -----------------------------------------------------------------


def simhash64(documents: DataFrame, shingle_n: int = 2) -> DataFrame:
    """doc_id, simhash (64-bit, as signed long) over word shingles."""

    @pandas_udf(LongType())
    def sim_udf(shingle_lists: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for shingles in shingle_lists:
            if shingles is None or len(shingles) == 0:
                out.append(0)
                continue
            hs = np.array([_fnv1a64(s) for s in shingles], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                np.int64
            )
            acc = (2 * bits - 1).sum(axis=0)
            val = np.uint64(0)
            for i in range(64):
                if acc[i] > 0:
                    val |= np.uint64(1) << np.uint64(i)
            out.append(int(np.int64(val)))
        return pd.Series(out, dtype="int64")

    sh = word_shingles(documents, shingle_n)
    grouped = sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("shingles"))
    return grouped.select("doc_id", sim_udf("shingles").alias("simhash"))
