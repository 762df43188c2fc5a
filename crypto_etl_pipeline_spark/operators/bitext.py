"""Bitext / parallel-pair mining — margin-based cosine scoring.

Artetxe & Schwenk 2019 ("Margin-based Parallel Corpus Mining with
Multilingual Sentence Embeddings", arXiv:1811.01136): a raw cosine
threshold cannot separate translations from topically-similar
neighbors because cosine scale varies by region of the embedding
space; the fix is to score each candidate pair by its cosine RELATIVE
to each side's k-NN neighborhood:

    margin(x, y) = cos(x, y) / ((avg_k cos(x, NN_k(x, Y))
                                 + avg_k cos(y, NN_k(y, X))) / 2)

("ratio" variant). A true translation scores well above its
neighborhood average (margin > 1); a hub vector that is close to
everything does not.

Scale shape: the source side is the BOUNDED side (a structural
``limit`` upstream, the ANN-family query contract), so the pair feed
is |src| x |tgt| with |src| capped — the same broadcast-queries shape
as brute_force_topk; both k-NN means and the final ranking ride
windows over that bounded pair frame. At 100 TB the tgt side stays
partitioned and the src batch streams through it; for unbounded BOTH
sides, pre-bucket with the IVF/LSH machinery and feed each bucket
through this operator (the cap/spill-audit discipline of the dedup
family applies unchanged).

Reference: no embedding or multilingual surface in the reference at
all (SURVEY §1.2) — north-star extension (VERDICT r12 "worth
adding" #2).

Float discipline (matches queries/vector.py): per-pair cosine is
rounded to 4 decimals FIRST; the k-NN means and the margin derive
from the rounded values in both engines, so the only cross-engine
float hazard (accumulation order inside the cosine) is absorbed
before any downstream arithmetic.

Relationship to the REGISTERED queries (queries/vector.py): this
module is the DataFrame-level API (float avg over the ACTUAL
neighborhood) used by callers and the planted-fixture tests; the
registered bitext_* queries re-express the same scoring in the
integer-exact oracle contract — margin = (ks+kt)*ci/(si+ti) over
quantized cosines — which equals cos / mean-of-neighborhood-means
whenever both sides have full neighborhoods and, like here, divides
by the actual counts when they don't. The two formulations rank
identically up to the 1e-4 quantization; the semantics (actual-count
neighborhoods, positive-cosine candidacy) are the same by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crypto_etl_pipeline_spark.operators.similarity import _spread, pair_cosine_pd


def bitext_margin_pairs(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (src, tgt) pairs with cosine and ratio-margin scores.

    ``src`` must be the bounded side (it is broadcast). Returns
    (src_id, tgt_id, cos_sim, margin) with cos_sim rounded to 4
    decimals and margin to 4 decimals computed from rounded cosines
    and the two k-NN means."""
    s = src.select(F.col(id_col).alias("src_id"), F.col(vec_col).alias("_svec"))
    t = _spread(tgt, id_col).select(
        F.col(id_col).alias("tgt_id"), F.col(vec_col).alias("_tvec")
    )
    pairs = (
        t.crossJoin(F.broadcast(s))
        .select(
            "src_id",
            "tgt_id",
            F.round(pair_cosine_pd()(F.col("_svec"), F.col("_tvec")), 4).alias(
                "cos_sim"
            ),
        )
        .localCheckpoint(eager=False)
        # candidacy requires POSITIVE similarity — keeps every k-NN
        # neighborhood mean positive so the ratio margin is always
        # well-defined (a cell/slice of mutually-negative cosines has
        # no mineable pairs by contract)
        .where(F.col("cos_sim") > 0)
    )
    w_s = Window.partitionBy("src_id").orderBy(F.desc("cos_sim"), F.asc("tgt_id"))
    nn_s = (
        pairs.withColumn("_r", F.row_number().over(w_s))
        .where(F.col("_r") <= k)
        .groupBy("src_id")
        .agg(F.avg("cos_sim").alias("_nn_src"))
    )
    w_t = Window.partitionBy("tgt_id").orderBy(F.desc("cos_sim"), F.asc("src_id"))
    nn_t = (
        pairs.withColumn("_r", F.row_number().over(w_t))
        .where(F.col("_r") <= k)
        .groupBy("tgt_id")
        .agg(F.avg("cos_sim").alias("_nn_tgt"))
    )
    return (
        pairs.join(F.broadcast(nn_s), "src_id")
        .join(nn_t, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cos_sim",
            F.round(
                F.col("cos_sim")
                / ((F.col("_nn_src") + F.col("_nn_tgt")) / F.lit(2.0)),
                4,
            ).alias("margin"),
        )
    )


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Forward mining: the best (highest-margin) tgt candidate per src
    vector — (src_id, tgt_id, cos_sim, margin). Thresholding is the
    caller's policy (the registered bitext_margin_threshold_sweep
    query demonstrates the sweep over its own integer-exact twin of
    this scoring — see the module header)."""
    scored = bitext_margin_pairs(src, tgt, k=k, id_col=id_col, vec_col=vec_col)
    w = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.desc("cos_sim"), F.asc("tgt_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
