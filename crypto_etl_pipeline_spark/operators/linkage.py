"""Record linkage: blocked fuzzy matching (entity resolution).

The classic two-stage shape: a cheap BLOCKING key (prefix, phonetic
code, sorted-neighborhood bucket) turns the quadratic all-pairs
comparison into a per-block join, then an edit-distance filter + rank
picks the best candidate. At 100 TB the join shuffles on the block key
only — cost scales with block sizes, never n^2 — and skewed blocks are
exactly the salting/AQE-skew case operators/skew.py handles.
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
) -> DataFrame:
    """Best fuzzy matches per left row within shared blocks.

    ``block`` is a callable Column -> Column applied to BOTH text
    columns (e.g. ``lambda c: F.substring(c, 1, 12)``). Candidates rank
    per ``left_id`` by (distance, right text) — fully deterministic.
    """
    lb = left.withColumn("_block", block(F.col(left_text)))
    rb = right.withColumn("_block", block(F.col(right_text)))
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
