"""Similarity search over an embedding column (`embeddings` table shape:
vec_id long, embedding array<float>, label int).

- brute_force_topk: exact cosine top-k per query vector, pure built-ins
  (zip_with + aggregate fold — JVM-side, no UDF), broadcast of the tiny
  query set. Scales as one pass over the corpus per query batch: the
  right baseline for recall evaluation at any size.
- lsh_bucketed_topk: random-hyperplane LSH (sign-bit bucketing) as one
  scale path — candidates only from matching buckets (hamming-1
  multi-probe so sparse buckets still return k).
- ivf_topk: IVF (inverted-file) ANN — seeded driver-side k-means over a
  deterministic sample builds the coarse centroids; every vector is
  assigned to its nearest list (one map-only pass); a query scans only
  its n_probe nearest lists. The standard trade: recall grows with
  n_probe, cost ∝ n_probe/n_lists of the corpus.

Floats: embeddings are float32 on disk; all arithmetic is done in
float64 with an ordered fold (aggregate over zip_with), and scores are
rounded to 6 dp for the driver's value-hash compare.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def brute_force_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """For each query vec_id: top-k nearest by cosine among all OTHER
    vectors. Returns (query_id, neighbor_id, cos_sim, rank)."""
    # r8: hoist both norms out of the scored row (guide §1.2 per-task
    # work). The corpus-side norm was re-folded once per (row, query)
    # pair — len(query_ids)x the needed work — and the query-side norm
    # once per corpus row; computing each BEFORE the crossJoin evaluates
    # them exactly once per vector. Bit-identical scores: the same
    # ordered float64 fold over the same values, same multiply order.
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        _norm(F.col("embedding")).alias("_qn"),
    )
    from .fulltext import spread_parallelism

    e = spread_parallelism(embeddings).select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("_en")
    )
    joined = e.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = (_dot(F.col("embedding"), F.col("qv")) / (
        F.col("_en") * F.col("_qn")
    ))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(sim, 6).alias("cos_sim"),
    )
    # two-level top-k (operators/topk.py): the per-query candidate set
    # is the WHOLE corpus here, so a single global window would funnel
    # n_vectors rows through one reducer per query
    from .topk import two_level_topk

    return two_level_topk(
        scored, ["query_id"], [F.desc("cos_sim"), F.asc("neighbor_id")],
        k, bucket_on="neighbor_id",
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


def brute_force_topk_sql(query_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(i) for i in sorted(query_ids))
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id IN ({ids})
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(
           list_sum(list_transform(list_zip(e.embedding, q.qv),
                    p -> p[1]::DOUBLE * p[2]::DOUBLE))
           / (sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))),
           6) AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def embedding_dim(embeddings: DataFrame) -> int:
    """Embedding width from one row (cheap: LIMIT 1 scan of one column)."""
    row = embeddings.select(F.size("embedding").alias("d")).limit(1).collect()
    if not row:
        raise ValueError("embeddings table is empty")
    return int(row[0]["d"])


def hyperplane_buckets(
    embeddings: DataFrame,
    n_planes: int = 12,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """vec_id, bucket — sign-bit LSH over fixed random hyperplanes.
    The plane matrix is seeded/deterministic and broadcast via closure;
    its width comes from the table itself (or the ``dim`` override), so
    any embedding dimensionality works."""
    import numpy as np

    if dim is None:
        dim = embedding_dim(embeddings)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim)).astype("float64")

    @pandas_udf(LongType())
    def bucket_udf(embs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(e, dtype="float64") for e in embs])
        signs = (mat @ planes.T) > 0
        vals = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.Series(vals.astype("int64"))

    return embeddings.select("vec_id", bucket_udf("embedding").alias("bucket"))


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 1 + 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine within LSH bucket matches only.

    Multi-probe: each query probes its own bucket plus the ``n_probes-1``
    single-bit-flip neighbors (the standard multi-probe LSH fallback —
    a vector on the wrong side of ONE hyperplane is still found), so a
    sparse bucket can't silently return < k rows. The candidate join is
    (probe bucket == vector bucket); at 10^9+ vectors the bucket join
    replaces the full scan. Recall vs brute force is tested in pytest at
    two different embedding dims."""
    if dim is None:
        dim = embedding_dim(embeddings)
    n_probes = max(1, min(n_probes, n_planes + 1))
    buckets = hyperplane_buckets(embeddings, n_planes, dim=dim)
    e = embeddings.join(buckets, "vec_id")
    # probe set per query: own bucket + hamming-1 neighbors (bit flips)
    flips = F.array(*[F.lit(0)] + [F.lit(1 << i) for i in range(n_probes - 1)])
    q = (
        e.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.explode(
                F.transform(flips, lambda m: F.col("bucket").bitwiseXOR(m))
            ).alias("qb"),
        )
    )
    joined = e.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qb")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        joined.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 6).alias("cos_sim"),
        )
        # no dedup needed: probe values are distinct per query, and a
        # vector has one bucket, so it matches at most one probe
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --- IVF -----------------------------------------------------------------------


def _kmeans_centroids(sample: "np.ndarray", n_lists: int, iters: int, seed: int):
    """Tiny deterministic k-means on the driver sample (cosine space:
    rows are L2-normalized; centroids renormalized per iteration)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    idx = rng.permutation(x.shape[0])[:n_lists]
    c = x[idx].copy()
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(n_lists):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                c[j] = v / max(float(np.linalg.norm(v)), 1e-12)
    return c


def ivf_assignments(
    embeddings: DataFrame,
    n_lists: int = 16,
    seed: int = 5,
    sample_step: int = 7,
    max_sample: int = 4096,
    iters: int = 8,
):
    """(centroids ndarray, DataFrame[vec_id, list_id]). The training
    sample is deterministic (every `sample_step`-th vec_id, capped), so
    the index is reproducible at any parallelism. Assignment is one
    map-only pass (vectorized pandas UDF, centroid matrix in closure)."""
    import numpy as np

    rows = (
        embeddings.filter(F.pmod("vec_id", F.lit(sample_step)) == 0)
        .orderBy("vec_id")
        .limit(max_sample)
        .select("embedding")
        .collect()
    )
    if len(rows) < n_lists:
        # stepped sample came back (nearly) empty — hashed/sparse/odd-only
        # vec_ids may contain no multiples of sample_step. Fall back to a
        # deterministic LIMIT scan so a non-empty table always trains.
        rows = (
            embeddings.orderBy("vec_id")
            .limit(max_sample)
            .select("embedding")
            .collect()
        )
    if not rows:
        raise ValueError("ivf_assignments: embeddings table is empty")
    sample = np.array([np.asarray(r["embedding"], dtype="float64") for r in rows])
    centroids = _kmeans_centroids(sample, n_lists, iters, seed)

    @pandas_udf(LongType())
    def assign_udf(embs: pd.Series) -> pd.Series:
        import numpy as np

        mat = np.array([np.asarray(e, dtype="float64") for e in embs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ centroids.T).argmax(axis=1).astype("int64"))

    return centroids, embeddings.select(
        "vec_id", assign_udf("embedding").alias("list_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 5,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's n_probe
    nearest inverted lists. At 10^9 vectors each query touches
    ~n_probe/n_lists of the corpus instead of all of it; recall vs
    brute force is pytest-gated."""
    import numpy as np

    centroids, assigned = ivf_assignments(embeddings, n_lists, seed)
    e = embeddings.join(assigned, "vec_id")

    qrows = embeddings.filter(F.col("vec_id").isin(query_ids)).collect()
    probes = []
    for r in qrows:
        v = np.asarray(r["embedding"], dtype="float64")
        v = v / max(float(np.linalg.norm(v)), 1e-12)
        near = np.argsort(-(centroids @ v))[:n_probe]
        for lid in near:
            probes.append((int(r["vec_id"]), int(lid)))
    spark = embeddings.sparkSession
    qp = spark.createDataFrame(probes, "query_id long, list_id long")
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    joined = (
        e.join(F.broadcast(qp), "list_id")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    sim = _dot(F.col("embedding"), F.col("qv")) / (
        _norm(F.col("embedding")) * _norm(F.col("qv"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        joined.select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(sim, 6).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --- embedding-cosine near-dup (dedup over the embeddings table) ---------------


def embedding_dup_pairs_exact(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """Exact cosine near-dup pairs (vec_a < vec_b, cos >= threshold):
    the O(n^2) baseline — correct at any size, affordable for recall
    evaluation on samples; the LSH variant is the scale path."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    sim = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(sim, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_dup_pairs_exact_sql(threshold: float = 0.95) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  p -> p[1]::DOUBLE * p[2]::DOUBLE))
         / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))),
         6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(
         list_sum(list_transform(list_zip(a.embedding, b.embedding),
                  p -> p[1]::DOUBLE * p[2]::DOUBLE))
         / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))),
         6) >= {threshold}
"""


def embedding_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Scale path: candidate pairs share a hyperplane-LSH bucket (or a
    hamming-1 neighbor — near-identical vectors disagree on at most a
    plane or two), then exact cosine verifies. Candidate count ~
    n_docs^2 / 2^planes per bucket family instead of n^2; precision is
    exact, recall is the LSH S-curve (pytest-gated vs the exact pairs)."""
    if dim is None:
        dim = embedding_dim(embeddings)
    buckets = hyperplane_buckets(embeddings, n_planes, dim=dim)
    e = embeddings.join(buckets, "vec_id")
    # probe set: own bucket + single-bit flips (symmetric, so generate
    # flips on one side only)
    flips = F.array(*[F.lit(0)] + [F.lit(1 << i) for i in range(n_planes)])
    probed = e.select(
        "vec_id",
        F.explode(
            F.transform(flips, lambda m: F.col("bucket").bitwiseXOR(m))
        ).alias("pb"),
    )
    cand = (
        probed.alias("a")
        .join(
            e.select("vec_id", "bucket").alias("b"),
            (F.col("a.pb") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    ea = embeddings.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = embeddings.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    sim = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", F.round(sim, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
