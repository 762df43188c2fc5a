"""Golden-file parity: run the rebuilt pipelines on the reference's own
raw inputs and compare row-for-row with its shipped output artifacts
(SURVEY.md §5.2 strategy #2).

Inputs/outputs are read from /root/reference (read-only, data only —
no code is imported from there):
- CryptocurrencyData.csv          raw dirty input (4,150 rows)
- cleaned_cryptocurrency_data_final.csv   golden EP3 output (C-order)
- api_cryptocurrency_data_final.csv       golden EP2 output
"""

from __future__ import annotations

import csv
import math
import os

import pytest

REF = "/root/reference"
RAW_CSV = f"{REF}/CryptocurrencyData.csv"
GOLDEN_CLEAN = f"{REF}/cleaned_cryptocurrency_data_final.csv"
GOLDEN_API = f"{REF}/api_cryptocurrency_data_final.csv"

needs_reference = pytest.mark.skipif(
    not os.path.exists(RAW_CSV), reason="reference data not present"
)


def _read_csv(path):
    with open(path, newline="", encoding="utf-8") as f:
        r = csv.DictReader(f)
        return list(r)


def _f(s):
    """Golden CSV cell -> float or None ('' means pandas NaN)."""
    return None if s == "" else float(s)


def _close(a, b, tol=1e-9):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and math.isnan(a):
        return b is None or (isinstance(b, float) and math.isnan(b))
    return math.isclose(a, b, rel_tol=tol, abs_tol=tol)


@needs_reference
def test_historical_clean_matches_golden(spark):
    """EP3 on the real raw file == shipped cleaned artifact, row-for-row."""
    from crypto_etl_pipeline_spark.plans.historical import OUTPUT_COLS, clean_historical
    from crypto_etl_pipeline_spark.sources.csv import read_dirty_csv

    raw = read_dirty_csv(spark, RAW_CSV)
    out = clean_historical(raw, order="C")
    got = [r.asDict() for r in out.collect()]
    want = _read_csv(GOLDEN_CLEAN)

    assert len(got) == len(want) == 4150
    assert list(OUTPUT_COLS) == list(want[0].keys())

    # Key rows by (coin, symbol) — Rank order is not carried through
    # Spark. 4148/4150 keys are unique; the two duplicate pairs are
    # matched greedily within their group. Floats compare with relative
    # tolerance: the golden file carries 1-ulp noise from pandas
    # read_csv's fast (not correctly-rounded) float parser, e.g.
    # "450,774,334,853,161,000,000,000" -> 0x1.7dd21a45f0a9bp+78 in the
    # golden vs the correctly rounded 0x...a9c from Java/Python.
    FLOAT_COLS = ("current_price", "1h", "24h", "7d", "30d", "24h_volume",
                  "circulating_supply", "market_cap")

    def row_matches(g, w):
        for c in FLOAT_COLS:
            if not _close(g[c], _f(w[c])):
                return f"col {c}: spark={g[c]} golden={w[c]}"
        if g["total_supply"] != int(float(w["total_supply"])):
            return f"total_supply: spark={g['total_supply']} golden={w['total_supply']}"
        if g["is_outlier"] != (w["is_outlier"] == "True"):
            return f"is_outlier: {g['is_outlier']} vs {w['is_outlier']}"
        return None

    got_groups: dict[tuple, list] = {}
    for r in got:
        got_groups.setdefault((r["coin"], r["symbol"]), []).append(r)

    n_outliers = 0
    for w in want:
        k = (w["coin"], w["symbol"])
        group = got_groups.get(k)
        assert group, f"missing row for {k}"
        errs = [row_matches(g, w) for g in group]
        matched = next((i for i, e in enumerate(errs) if e is None), None)
        assert matched is not None, f"{k}: no candidate matched; errors={errs}"
        group.pop(matched)
        n_outliers += w["is_outlier"] == "True"

    assert n_outliers == 861  # BASELINE.md outlier yield


@needs_reference
def test_historical_clean_order_p(spark):
    """Production-DAG order (flag-then-impute, crypto_etl_pipeline.py:193-205):
    quantiles come from the 2,424 non-null prices and every null price
    flags True (pandas ~between turns NaN into True) — the flag is never
    null, and no nulls survive imputation."""
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.plans.historical import clean_historical, parse_historical
    from crypto_etl_pipeline_spark.sources.csv import read_dirty_csv

    raw = read_dirty_csv(spark, RAW_CSV)
    n_null_prices = (
        parse_historical(raw).where(F.col("current_price").isNull()).count()
    )
    assert n_null_prices == 1726  # SURVEY.md §2.9 divergence #1

    out = clean_historical(raw, order="P")
    assert out.where(F.col("is_outlier").isNull()).count() == 0
    # every null-price row flagged True => flagged count >= 1726
    n_flagged = out.where(F.col("is_outlier")).count()
    assert n_flagged >= 1726, f"null prices must flag True (got {n_flagged})"
    # imputation still ran after flagging
    assert out.where(F.col("current_price").isNull()).count() == 0


@needs_reference
def test_api_classification_matches_golden(spark):
    """EP2 classifier on the golden API rows reproduces its tendencia
    column and the shipped 51/34/11/4 distribution."""
    from crypto_etl_pipeline_spark.plans.api import classify_api_table
    from crypto_etl_pipeline_spark.sources.rest import API_SCHEMA

    rows = _read_csv(GOLDEN_API)
    data = [
        tuple(
            r[f.name] if f.name == "symbol" else _f(r[f.name])
            for f in API_SCHEMA.fields
        )
        for r in rows
    ]
    api_df = spark.createDataFrame(data, API_SCHEMA)
    out = classify_api_table(api_df).collect()

    by_symbol = {r["symbol"]: r["tendencia"] for r in out}
    assert len(out) == 100
    for r in rows:
        assert by_symbol[r["symbol"]] == r["tendencia"], (
            f"{r['symbol']}: spark={by_symbol[r['symbol']]} golden={r['tendencia']}"
        )

    dist = {}
    for r in out:
        dist[r["tendencia"]] = dist.get(r["tendencia"], 0) + 1
    assert dist == {
        "Tendencia estable": 51,
        "Tendencia moderada bajista": 34,
        "Tendencia moderada alcista": 11,
        "Tendencia fuerte alcista": 4,
    }


@needs_reference
def test_api_empty_fetch_guard(spark):
    """Empty fetch -> ValueError (crypto_etl_pipeline.py:89-92 guard)."""
    from crypto_etl_pipeline_spark.plans.api import run_api_pipeline

    with pytest.raises(ValueError):
        run_api_pipeline(spark, fetch=lambda: [])


@needs_reference
def test_run_historical_pipeline_end_to_end(spark, tmp_path):
    """EP3 + sinks on the real reference CSV: parquet/CSV/profile all
    written; stats match the golden artifact's shape."""
    from crypto_etl_pipeline_spark.plans.historical import run_historical_pipeline

    res = run_historical_pipeline(spark, RAW_CSV, str(tmp_path))
    assert res["rows"] == 4150 and res["columns"] == 12
    back = spark.read.parquet(res["parquet"])
    assert back.where("is_outlier").count() == 861
    prof = spark.read.parquet(res["profile"])
    assert prof.count() == 12  # one row per column
    assert prof.where("nulls > 0").count() == 0  # post-impute: no nulls
    # S5 parity: the profiling HTML artifact is actually rendered
    with open(res["profile_html"], encoding="utf-8") as f:
        html = f.read()
    assert html.startswith("<!DOCTYPE html>") and "current_price" in html
    assert "12 columns" in html and "4150 rows profiled" in html


@needs_reference
def test_run_api_pipeline_writes_profile_html(spark, tmp_path):
    from crypto_etl_pipeline_spark.plans.api import run_api_pipeline

    rows = [
        {"symbol": "btc", "current_price": 50000.0, "price_change_percentage_24h": 6.0,
         "market_cap": 1e12, "total_volume": 3e10, "high_24h": 51000.0, "low_24h": 49000.0},
        {"symbol": "eth", "current_price": 3000.0, "price_change_percentage_24h": -0.2,
         "market_cap": 4e11, "total_volume": 2e10, "high_24h": 3100.0, "low_24h": 2900.0},
    ]
    out = run_api_pipeline(spark, fetch=lambda: rows, out_dir=str(tmp_path))
    assert out.count() == 2
    with open(tmp_path / "api_profile.html", encoding="utf-8") as f:
        html = f.read()
    assert "tendencia" in html and "2 rows profiled" in html
