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

import numpy as np
import pandas as pd
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


def _spread(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition a compact table across all cores.

    The per-pair cosine passes below are CPU-bound interpreted folds; if
    the corpus parquet arrives as one split (typical for a small table,
    and exactly what the driver's testdata does), a broadcast join pins
    the whole pass to ONE task. At 100 TB the table has thousands of
    splits and this is a no-op-cost guard (only fires when partitions <
    cores); at test scale it is the difference between 1 and 32 cores.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(id_col))
    return df


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

    # Norms are hoisted to one pass per ROW (below the join, so Catalyst
    # cannot inline them into the per-pair projection); the per-pair work
    # is a single dot fold. dot/(qnorm*cnorm) is the exact same float
    # expression cosine() evaluates, so oracle parity is unchanged.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        norm(F.col(vec_col)).alias("_qnorm"),
    )
    c = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        norm(F.col(vec_col)).alias("_cnorm"),
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnorm") * F.col("_cnorm")), 4
            ).alias("cos_sim"),
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
    c = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        norm(F.col(vec_col)).alias("_cnorm"),
        lsh_signature(F.col(vec_col), planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        norm(F.col(vec_col)).alias("_qnorm"),
        lsh_signature(F.col(vec_col), planes).alias("_bucket"),
    )
    sims = (
        c.join(F.broadcast(q), "_bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnorm") * F.col("_cnorm")), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — the k-means-cell scale path for ANN.
# ---------------------------------------------------------------------------
def _centroid_rows(df, k: int, id_col: str, vec_col: str) -> list[list[float]]:
    """Deterministic seeds: the k lowest-id vectors (no RNG)."""
    rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    return [[float(x) for x in r[vec_col]] for r in rows]


def _nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2), ties -> lowest index.

    Flat plan-time unrolling: one dot-product chain per centroid over
    the vector ATTRIBUTE (cheap to reference), min via lexicographic
    array_min over (distance, index) structs — no HOF-over-expression
    nesting (see operators/dedup.py docstring for why that matters).
    NOTE: do NOT unroll the dot into a flat getItem multiply-add chain:
    a 16x64-term expression tree blows past codegen limits and falls
    back to per-node interpreted eval (measured 7x SLOWER than the HOF
    fold).
    """
    dists = []
    for i, c in enumerate(centroids):
        # |v|^2 is constant per row — omitted; argmin over
        # -2<v,c> + |c|^2 is identical and saves k extra dot passes.
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = -2 * dot(vec, lit) + sum(x * x for x in c)
        dists.append(F.struct(d.alias("dist"), F.lit(i).alias("idx")))
    return F.array_min(F.array(*dists)).getField("idx")


def _nearest_centroid_pd(centroids: list[list[float]]):
    """Arrow-batched nearest-centroid assignment (the hot IVF path).

    One numpy matmul per Arrow batch against the (dim x k) centroid
    matrix replaces k interpreted HOF dot-folds per row — the canonical
    "vectorized Pandas UDF when built-ins can't express it efficiently"
    pattern. Ties break to the lowest centroid index (np.argmin), same
    as the expression variant ``_nearest_centroid``. Used for the
    rows-only IVF surface; oracle-checked queries stay JVM-side.
    """
    from pyspark.sql.functions import pandas_udf

    M = np.asarray(centroids, dtype=np.float64).T  # (dim, k)
    c2 = (M * M).sum(axis=0)  # |c|^2 per centroid

    @pandas_udf("int")
    def nearest(v: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v], dtype=np.float64)
        d = -2.0 * (X @ M) + c2  # |v|^2 constant per row — omitted
        return pd.Series(d.argmin(axis=1), dtype="int32")

    return nearest


def ivf_build_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic mini k-means: seed with the k lowest-id vectors,
    then `iters` Lloyd steps. Each step is one distributed assignment
    pass + a per-dimension mean (posexplode -> groupBy(cell, pos) avg);
    only the k centroid vectors ever reach the driver.
    """
    cents = _centroid_rows(corpus, k, id_col, vec_col)
    corpus = _spread(corpus, id_col)
    for _ in range(iters):
        assigned = corpus.select(
            F.col(vec_col).alias("_v"), _nearest_centroid_pd(cents)(F.col(vec_col)).alias("_cell")
        )
        means = (
            assigned.select("_cell", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("_cell", "_pos")
            .agg(F.avg("_x").alias("_m"))
            .groupBy("_cell")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_pm"))
            .select("_cell", F.transform("_pm", lambda s: s.getField("_m")).alias("_centroid"))
            .collect()
        )
        by_cell = {r["_cell"]: [float(x) for x in r["_centroid"]] for r in means}
        # empty cells keep their previous centroid
        cents = [by_cell.get(i, cents[i]) for i in range(k)]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe: each query scans only its `nprobe` nearest cells.

    The corpus is assigned to cells once (at 100 TB the cell id is the
    table's partition column, so a probe prunes partitions); queries
    fan out to nprobe cells; exact cosine ranks within the candidate
    set. Recall/cost tunes via k (cells) and nprobe.
    """
    from pyspark.sql.window import Window

    cells = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        norm(F.col(vec_col)).alias("_cnorm"),
        _nearest_centroid_pd(centroids)(F.col(vec_col)).alias("_cell"),
    )
    # nprobe nearest cells per query: lexicographic array_sort of
    # (distance, idx) structs, then slice.
    probe_structs = []
    for i, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = -2 * dot(F.col(vec_col), lit) + sum(x * x for x in c)
        probe_structs.append(F.struct(d.alias("dist"), F.lit(i).alias("idx")))
    probes = F.slice(F.array_sort(F.array(*probe_structs)), 1, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        norm(F.col(vec_col)).alias("_qnorm"),
        F.explode(F.transform(probes, lambda s: s.getField("idx"))).alias("_cell"),
    )
    sims = (
        cells.join(F.broadcast(q), "_cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnorm") * F.col("_cnorm")), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return sims.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
