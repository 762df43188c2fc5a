"""Cleaning expression library — pure Column builders, no I/O.

Re-expresses the reference's pandas cleaning cascade (SURVEY.md §2.8
F1-F7, F9-F12; reference crypto_etl_pipeline.py:130-210) as native
Spark SQL expressions. Everything here stays inside whole-stage
codegen — no Python UDFs in the hot path; Catalyst fuses the whole
cascade into a single scan pass.

Null discipline (SURVEY.md §1.2): missing is SQL ``null``, never float
NaN. ``try_cast`` yields null on unparseable tokens (``"-"``, ``"$-"``,
``""``), exactly where pandas ``to_numeric(errors="coerce")`` yields
NaN — and null comparisons fall through CASE chains the same way
pandas NaN comparisons evaluate False.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def coerce_double(c: Column | str) -> Column:
    """F4 — coercing numeric parse: unparseable -> null.

    pandas: ``pd.to_numeric(s, errors="coerce")`` (reference
    crypto_etl_pipeline.py:162-164).
    """
    return _as_col(c).try_cast("double")


def parse_grouped_number(c: Column | str) -> Column:
    """F1+F4 — remove ',' thousands separators, then coerce to double.

    pandas: ``s.str.replace(",", "")`` then coerce (reference
    crypto_etl_pipeline.py:159-164, 182-187).
    """
    return coerce_double(F.translate(_as_col(c), ",", ""))


def parse_money(c: Column | str) -> Column:
    """F2+F4 — strip ``[$, ]`` (incl. interior spaces), coerce to double.

    pandas: ``s.str.replace(r"[$, ]", "", regex=True)`` then coerce
    (reference crypto_etl_pipeline.py:174-179). Tokens like ``"$-"``
    reduce to ``"-"`` -> null.
    """
    return coerce_double(F.regexp_replace(_as_col(c), r"[$, ]", ""))


def parse_percent(c: Column | str) -> Column:
    """F6 — remove '%', coerce, divide by 100.

    pandas: ``to_numeric(s.str.replace("%",""), errors="coerce") / 100``
    (reference crypto_etl_pipeline.py:167-171). ``"-"`` -> null.
    """
    return coerce_double(F.regexp_replace(_as_col(c), "%", "")) / F.lit(100)


def parse_unit_suffix(c: Column | str) -> Column:
    """F5 — unit-suffix numeric parse ('21 Million', '88.3 Billion') -> long.

    Mirrors the reference's ``clean_total_supply`` UDF (reference
    crypto_etl_pipeline.py:100-127) as pure expressions:

    - strip ``[,$ ]`` -> base
    - null / "" / "-"            -> null
    - contains "Billion"         -> number * 1e9
    - contains "Million"         -> number * 1e6
    - else                       -> try_cast(base)
    - final ``try_cast(long)`` truncates toward zero, matching Python
      ``int()`` (so "88.3 Billion" -> 88_300_000_000, "1.5" -> 1).

    Any unparseable remainder -> null (``try_cast``), matching the
    UDF's ``except ValueError -> pd.NA``. Deviation: values beyond
    int64 range -> null (Python ints are unbounded; a columnar engine
    stores int64, and ANSI mode would otherwise raise on overflow).
    """
    col = _as_col(c)
    base = F.regexp_replace(col, r"[,$ ]", "")
    num = F.regexp_replace(base, "Billion|Million", "").try_cast("double")
    return (
        F.when(col.isNull() | base.isin("", "-"), F.lit(None).cast("double"))
        .when(base.contains("Billion"), num * F.lit(1e9))
        .when(base.contains("Million"), num * F.lit(1e6))
        .otherwise(base.try_cast("double"))
        .try_cast("long")
    )


def normalize_headers(df: DataFrame) -> DataFrame:
    """P4 — strip whitespace from all column names.

    pandas: ``df.columns = df.columns.str.strip()`` (reference
    crypto_etl_pipeline.py:144). Driver-side schema rewrite; no data op.
    """
    return df.toDF(*[c.strip() for c in df.columns])
