"""Deterministic hash-based sampling and dataset splitting.

Corpus-mixing and train/val/test assignment for training-data
pipelines. Everything keys off ``md5`` of the stable row key plus a
salt, NOT ``df.sample()``/``rand()``: RNG sampling depends on partition
layout, so re-running on a repartitioned 100 TB corpus silently changes
the sample; hash gating is reproducible across runs, engines (DuckDB
oracle included), and cluster sizes, and a resampled-with-new-salt run
is one constant change. All map-only — the gate is a pushable filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.operators.phash import md5_long

#: hash gate resolution (fraction granularity = 1/GATE)
GATE = 1_000_000


def hash_gate(key: Column, salt: str) -> Column:
    """Uniform [0, GATE) integer from the row key + salt."""
    return md5_long(F.concat(key.cast("string"), F.lit(salt)), 15) % GATE


def hash_bernoulli_sample(
    df: DataFrame,
    key_col: str,
    rate: Column | float,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep each row with probability ``rate`` (a float or a per-row
    rate column, e.g. joined per-group mixing weights)."""
    r = F.lit(rate) if isinstance(rate, float) else rate
    return df.where(hash_gate(F.col(key_col), salt) < (r * GATE).cast("long"))


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    salt: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by cumulative hash ranges.

    ``weights`` must sum to 1.0 (validated); iteration order defines
    the range layout, so pass an explicit dict literal and keep it
    stable across runs.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    gate = hash_gate(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = gate < int(round(acc * GATE))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))
    return df.withColumn(split_col, expr)
