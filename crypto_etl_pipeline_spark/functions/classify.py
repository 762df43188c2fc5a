"""Trend classification — the reference's 5-way threshold classifier.

Reference: ``classify_trend`` row-UDF (crypto_etl_pipeline.py:218-234;
colab variant crypto_etl_colab.py:93-111). Re-expressed as a chained
``when/otherwise`` CASE — codegen'd JVM-side, no Python row loop.

Boundary semantics (authoritative from code, not README prose):
x = pct/100; x >= .05 strong-up (inclusive), x > .01 moderate-up
(exclusive at exactly 1%), x <= -.05 strong-down (inclusive),
x < -.01 moderate-down (exclusive at exactly -1%), else stable.
Null pct -> every comparison null -> falls to ``otherwise`` ->
"estable", matching pandas NaN comparisons all-False.

Label casing follows the colab flow (C:99-108) because the shipped
golden artifact uses it (SURVEY.md §2.9 divergence #2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TREND_LABELS = {
    "strong_up": "Tendencia fuerte alcista",
    "moderate_up": "Tendencia moderada alcista",
    "stable": "Tendencia estable",
    "moderate_down": "Tendencia moderada bajista",
    "strong_down": "Tendencia fuerte bajista",
}


def classify_trend(pct_change: Column | str) -> Column:
    """5-way CASE over a percent-units column (e.g. 3.2 == +3.2%)."""
    c = F.col(pct_change) if isinstance(pct_change, str) else pct_change
    x = c / F.lit(100)
    return (
        F.when(x >= 0.05, TREND_LABELS["strong_up"])
        .when(x > 0.01, TREND_LABELS["moderate_up"])
        .when(x <= -0.05, TREND_LABELS["strong_down"])
        .when(x < -0.01, TREND_LABELS["moderate_down"])
        .otherwise(TREND_LABELS["stable"])
    )


def classify_trend_sql(pct_expr: str) -> str:
    """The same classifier as ANSI SQL CASE text (for DuckDB oracles).

    Kept adjacent to :func:`classify_trend` so the two can never drift.
    """
    return f"""CASE
        WHEN ({pct_expr}) / 100 >= 0.05 THEN '{TREND_LABELS["strong_up"]}'
        WHEN ({pct_expr}) / 100 > 0.01 THEN '{TREND_LABELS["moderate_up"]}'
        WHEN ({pct_expr}) / 100 <= -0.05 THEN '{TREND_LABELS["strong_down"]}'
        WHEN ({pct_expr}) / 100 < -0.01 THEN '{TREND_LABELS["moderate_down"]}'
        ELSE '{TREND_LABELS["stable"]}'
    END"""
