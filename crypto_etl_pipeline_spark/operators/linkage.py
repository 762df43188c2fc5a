"""Record linkage: blocked fuzzy matching (entity resolution).

The classic two-stage shape: a cheap BLOCKING key (prefix, phonetic
code, sorted-neighborhood bucket) turns the quadratic all-pairs
comparison into a per-block join, then an edit-distance filter + rank
picks the best candidate. Cost scales with BLOCK SIZES — which means
it is only sub-quadratic if the key actually splits the corpus. On a
name distribution the key degenerates on (TPC-H 'Supplier#%09d' names
share one prefix-14 for the first 10 M keys), the "blocked" join IS
the all-pairs join: measured round 10, 4.0 s at sf0.1 collapsing to a
single-task >590 s at sf1.0 — comparisons grew 100x and all landed on
one block key. The guard is the same count-cap discipline as the
shingle/simhash/LSH pair feeds: ``block_cap`` bounds the RIGHT side
per block via a deterministic QUALIFY-replayable window, and
``fuzzy_block_spill`` reports every comparison the cap absorbed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_text: str,
    block,
    max_dist: int = 2,
    top_k: int = 1,
    block_cap: int | None = None,
) -> DataFrame:
    """Best fuzzy matches per left row within shared blocks.

    ``block`` is a callable Column -> Column applied to BOTH text
    columns (e.g. ``lambda c: F.substring(c, 1, 12)``). Candidates rank
    per ``left_id`` by (distance, right text) — fully deterministic.

    ``block_cap`` bounds the comparisons when the blocking key
    degenerates (module docstring): the right side keeps only the
    first ``block_cap`` rows per block in deterministic
    ``right_text`` order (row_number window — the DuckDB twin is
    ``QUALIFY row_number() OVER (PARTITION BY block ORDER BY name)
    <= cap``), so per-block work is |left_block| * cap instead of
    |left_block| * |right_block|. Matches whose true candidate ranks
    past the cap are LOST — pair the capped join with a
    fuzzy-block-spill audit so the loss is counted, never silent."""
    lb = left.withColumn("_block", block(F.col(left_text)))
    rb = right.withColumn("_block", block(F.col(right_text)))
    if block_cap is not None:
        wb = Window.partitionBy("_block").orderBy(F.asc(right_text))
        rb = (
            rb.withColumn("_occ", F.row_number().over(wb))
            .where(F.col("_occ") <= block_cap)
            .drop("_occ")
        )
    cand = lb.join(rb, "_block").withColumn(
        "dist", F.levenshtein(F.col(left_text), F.col(right_text))
    )
    w = Window.partitionBy(left_id).orderBy(
        F.asc("dist"), F.asc(right_text)
    )
    return (
        cand.where(F.col("dist") <= max_dist)
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_k)
        .drop("_block", "_rk")
    )


def fuzzy_block_spill(
    left: DataFrame,
    right: DataFrame,
    left_text: str,
    right_text: str,
    block,
    block_cap: int,
) -> DataFrame:
    """The audit half of ``block_cap``: per block, both side sizes, how
    many right rows the cap keeps, and the comparison count the cap
    absorbed (n_left * (n_right - kept)). Always one row per occupied
    block — non-vacuous even when nothing spills (the round-3 vacuity
    lint), and the absorbed count is exact integer arithmetic."""
    lb = (
        left.select(block(F.col(left_text)).alias("block"))
        .groupBy("block")
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    rb = (
        right.select(block(F.col(right_text)).alias("block"))
        .groupBy("block")
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    kept = F.least(F.col("n_right"), F.lit(block_cap).cast("long"))
    return lb.join(rb, "block", "full").select(
        "block",
        F.coalesce("n_left", F.lit(0)).alias("n_left"),
        F.coalesce("n_right", F.lit(0)).alias("n_right"),
        F.coalesce(kept, F.lit(0)).alias("kept_right"),
        (
            F.coalesce("n_left", F.lit(0))
            * (F.coalesce("n_right", F.lit(0)) - F.coalesce(kept, F.lit(0)))
        ).alias("skipped_comparisons"),
    )
