"""Similarity-search queries over the embeddings table (§2.13).

Float discipline: DuckDB's list_cosine_similarity accumulates in
float32 while the Spark expression accumulates in double; both are
rounded to 4 decimals, which absorbs the ~1e-7 divergence (verified
empirically). Ranking ties break on neighbor_id in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.operators.similarity import (
    _spread,
    brute_force_topk,
    dot,
    lsh_bucketed_topk,
    norm,
)
from crypto_etl_pipeline_spark.queries.base import register
from crypto_etl_pipeline_spark.sources.tables import load_table

N_QUERIES = 10
TOP_K = 10


@register(
    "ann_brute_force_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
    sims AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(cast(list_cosine_similarity(q.qv, e.embedding) AS DOUBLE), 4) AS cos_sim
      FROM q JOIN embeddings e ON e.vec_id != q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {TOP_K}
    """,
    description="Exact cosine top-k via broadcast queries + partitioned window",
    tags=("similarity",),
)
def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return brute_force_topk(emb, queries, k=TOP_K)


@register(
    "embedding_cosine_near_dup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(cast(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40
    """,
    description="Embedding-cosine high-similarity pairs (label-blocked; near-dup shape)",
    tags=("similarity", "dedup"),
)
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Threshold 0.40: the synthetic embeddings top out at cosine ~0.47
    # within a label, so a conventional near-dup cutoff (0.9+) would
    # match zero pairs — a vacuous oracle. The operator shape (blocked
    # self-join + cosine filter) is what's under test.
    emb = load_table(spark, sf_dir, "embeddings")
    # Norm hoisted to one pass per row (below the self-join); the
    # per-pair cost is a single dot fold, and dot/(norm_a*norm_b) is the
    # identical float expression cosine() builds — parity-safe.
    withn = _spread(emb, "vec_id").select(
        "vec_id", "label", "embedding", norm(F.col("embedding")).alias("_n")
    )
    a, b = withn.alias("a"), withn.alias("b")
    sim = dot(F.col("a.embedding"), F.col("b.embedding")) / (F.col("a._n") * F.col("b._n"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("_sim", sim)
        .where(F.col("_sim") >= 0.40)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(F.col("_sim"), 4).alias("cos_sim"),
        )
    )


@register(
    "ann_lsh_bucketed_topk",
    oracle=None,  # bucket membership depends on seeded hyperplanes — rows-only
    description="Sign-LSH bucketed approximate top-k (the 100 TB scale path)",
    tags=("similarity", "rows-only"),
)
def ann_lsh_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return lsh_bucketed_topk(emb, queries, k=TOP_K, n_planes=6)


@register(
    "ann_ivf_topk",
    oracle=None,  # centroid geometry is data-derived; recall checked in tests
    description="IVF-cell approximate top-k (deterministic mini k-means, nprobe probing)",
    tags=("similarity", "rows-only"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.operators.similarity import ivf_build_centroids, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_build_centroids(emb, k=16, iters=1)
    queries = emb.where(F.col("vec_id") < N_QUERIES)
    return ivf_topk(emb, queries, cents, k=TOP_K, nprobe=4)
