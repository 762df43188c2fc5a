"""Similarity search over embedding columns (north-star extension §2.13).

- ``cosine``: expression-level cosine over two array<float/double>
  columns — zip_with product + aggregate sum in DOUBLE, JVM-side.
- ``brute_force_topk``: exact top-k neighbors for a (small) query set:
  broadcast the queries, one narrow pass over the corpus, then a
  partitioned window keeps k per query. Scales as corpus_size x
  n_queries with NO shuffle of the corpus (only of the k survivors).
- ``lsh_bucketed_topk``: random-hyperplane (sign) LSH scale path:
  corpus hashed once into buckets (narrow), queries probe only their
  bucket — the join is on the bucket key, so the candidate set is a
  tiny fraction of the corpus. Hyperplanes are generated from a fixed
  seed at plan-build time (deterministic, reproducible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries`` is broadcast (it must be the small side); the cosine is
    computed corpus-side in one codegen'd pass; a window partitioned by
    query id ranks candidates. Returns (query_id, neighbor_id, cos_sim,
    rank).
    """
    from pyspark.sql.window import Window

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qvec"), F.col("_cvec")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (fixed seed)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (dot >= 0)."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(float(x)) for x in plane]))
        sig = sig + F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    With 8 planes the corpus splits into ~256 buckets; each query scans
    ~corpus/256 candidates. Recall is tunable via n_planes (fewer planes
    = bigger buckets = higher recall, more work). At 100 TB the bucket
    id would also be the table's partition key so a probe prunes
    partitions.
    """
    from pyspark.sql.window import Window

    planes = _hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        lsh_signature(F.col(vec_col), planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        lsh_signature(F.col(vec_col), planes).alias("_bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "_bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("_qvec"), F.col("_cvec")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
