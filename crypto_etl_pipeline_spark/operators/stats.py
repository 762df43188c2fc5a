"""Statistics / aggregation layer (SURVEY.md §2.4 A1-A9, F10, P6).

Design rules for scale:
- All per-column statistics for a table are computed in ONE ``agg``
  pass (partial + final tree aggregation) — never a per-column loop of
  separate jobs (the reference's pandas loop, crypto_etl_pipeline.py:202-205,
  does one full pass per column).
- Scalar statistics are broadcast back via ``crossJoin(broadcast(...))``
  — never an unpartitioned window, which would funnel every row through
  a single task (fatal at 100 TB; SURVEY.md §2.5).
- Exact interpolated ``percentile`` (not ``approx_percentile``) where
  oracle/golden parity matters; callers can opt into the approximate
  sketch for cheap scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def numeric_columns(df: DataFrame) -> list[str]:
    """P5 — dtype-filtered column list (reference crypto_etl_pipeline.py:202)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]


def null_counts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A3 — per-column null counts in one pass (reference C:72-76)."""
    cols = cols or df.columns
    return df.agg(*[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols])


def medians(df: DataFrame, cols: list[str] | None = None) -> dict[str, float]:
    """A2 — exact medians of all numeric columns in ONE agg pass."""
    cols = cols or numeric_columns(df)
    row = df.agg(
        *[F.percentile(F.col(c), F.lit(0.5)).alias(c) for c in cols]
    ).first()
    return {c: row[c] for c in cols}


def impute_median(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """F10 — fill nulls in numeric columns with their exact medians.

    Reference semantics (crypto_etl_pipeline.py:201-205): per-column
    median over non-null values, then fillna. One stats pass + one fill
    pass. (pyspark.ml Imputer uses approxQuantile; this is the exact
    variant required for golden parity.)
    """
    cols = cols or numeric_columns(df)
    med = medians(df, cols)
    return df.na.fill({c: m for c, m in med.items() if m is not None})


def iqr_bounds(df: DataFrame, col: str, k: float = 1.5) -> tuple[float, float]:
    """A1 — exact q1/q3 -> (lower, upper) Tukey fence bounds."""
    row = df.agg(
        F.percentile(F.col(col), F.lit(0.25)).alias("q1"),
        F.percentile(F.col(col), F.lit(0.75)).alias("q3"),
    ).first()
    q1, q3 = row["q1"], row["q3"]
    iqr = q3 - q1
    return q1 - k * iqr, q3 + k * iqr


def flag_outliers_iqr(df: DataFrame, col: str, flag_col: str = "is_outlier", k: float = 1.5) -> DataFrame:
    """P6+F11 — add boolean IQR outlier flag (rows kept, never dropped).

    Reference: crypto_etl_pipeline.py:193-199 / colab C:267-277 —
    outliers are *flagged*, not removed (data_dictionary.txt:20).
    Null values flag True, matching pandas ``~s.between(...)``
    (NaN -> False -> ~False -> True) rather than SQL three-valued null.
    """
    lower, upper = iqr_bounds(df, col, k)
    return df.withColumn(
        flag_col,
        F.coalesce(~F.col(col).between(F.lit(lower), F.lit(upper)), F.lit(True)),
    )


def describe_exact(df: DataFrame, cols: list[str] | None = None, group_by: list[str] | None = None) -> DataFrame:
    """A4/A5 — describe() with EXACT interpolated percentiles.

    One agg pass; optional grouping (the reference's only group-by,
    colab C:132).
    """
    cols = cols or numeric_columns(df)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.avg(col).alias(f"{c}_mean"),
            F.stddev(col).alias(f"{c}_std"),
            F.min(col).alias(f"{c}_min"),
            F.percentile(col, F.lit(0.25)).alias(f"{c}_q1"),
            F.percentile(col, F.lit(0.5)).alias(f"{c}_median"),
            F.percentile(col, F.lit(0.75)).alias(f"{c}_q3"),
            F.max(col).alias(f"{c}_max"),
        ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def duplicate_row_count(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A7 — count of duplicate rows over a projection (colab C:259)."""
    cols = cols or df.columns
    return df.agg(
        (F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols])).alias("n_duplicate_rows")
    )
