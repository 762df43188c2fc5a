"""Round-13b operator tests: the technical-indicator family.

Planted daily-bar fixtures (one event per (type, day), so the picked
close IS the planted value) pin the indicator semantics end-to-end
through the registered queries: Bollinger full-window discipline and
breach classification, Cutler-RSI saturation at monotone trends and
the zero-movement guard, max-drawdown depth + first-trough day on a
planted peak/trough path, realized-vol agreement with numpy's sample
stddev, and exact +/-1 return correlation for (anti-)proportional
geometric series.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _write_events(spark, tmp_path, series: dict):
    """Write an events.parquet fixture (driver schema) with ONE event
    per (event_type, day): series maps type -> [close_day0, ...].
    Days are consecutive from 2024-01-01; returns the sf_dir."""
    rows = []
    eid = 0
    for etype, closes in series.items():
        for t, v in enumerate(closes):
            eid += 1
            rows.append((eid, f"2024-01-{t + 1:02d} 12:00:00", etype, float(v)))
    df = (
        spark.createDataFrame(rows, "event_id long, d string, event_type string, value double")
        .select(
            "event_id",
            F.to_timestamp("d").alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            "event_type",
            "value",
            F.lit(None).cast("string").alias("props"),
        )
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(sf_dir + "/events.parquet")
    return sf_dir


_N = 16  # >= 15 bars so the 14-diff RSI window fills

#: planted per-type daily close paths
def _series():
    r = [0.01 * ((t % 3) + 1) for t in range(_N - 1)]  # varying returns
    geoup, geodown = [100.0], [100.0]
    for x in r:
        geoup.append(geoup[-1] * math.exp(x))
        geodown.append(geodown[-1] * math.exp(-x))
    return {
        "flat": [100.0] * _N,
        "up": [100.0 + t for t in range(_N)],
        "down": [100.0 - 2.0 * t for t in range(_N)],
        "vee": [100.0, 120.0, 60.0, 90.0],
        "geoup": geoup,
        "geodown": geodown,
    }


def test_bollinger_flat_series_and_full_window_discipline(spark, tmp_path):
    """A constant series has sd = 0: bands collapse onto the SMA,
    %B is NULL (zero-width band guard) and every day is 'inside'.
    Rows start at the 7th bar (full windows only)."""
    from crypto_etl_pipeline_spark.queries.market import ta_bollinger_bands

    sf = _write_events(spark, tmp_path, {"flat": [100.0] * 10})
    rows = ta_bollinger_bands(spark, sf).orderBy("day_s").collect()
    assert len(rows) == 10 - 6  # days 7..10
    assert rows[0]["day_s"] == "2024-01-07"
    for r in rows:
        assert r["mid"] == r["upper"] == r["lower"] == 100.0
        assert r["pct_b"] is None
        assert r["band_state"] == "inside"


def test_bollinger_spike_breaches_upper_band(spark, tmp_path):
    """An alternating ~100 series with a 200 spike on day 8: the spike
    day must classify 'above' even though the self-inclusive window
    inflates sd (expected bands recomputed in pure Python here)."""
    from crypto_etl_pipeline_spark.queries.market import ta_bollinger_bands

    closes = [100.5, 99.5, 100.5, 99.5, 100.5, 99.5, 100.5, 200.0]
    sf = _write_events(spark, tmp_path, {"s": closes})
    rows = {r["day_s"]: r for r in ta_bollinger_bands(spark, sf).collect()}
    win = closes[1:8]
    mu = sum(win) / 7
    sd = math.sqrt(sum((x - mu) ** 2 for x in win) / 6)
    assert abs(rows["2024-01-08"]["upper"] - round(mu + 2 * sd, 4)) < 1e-9
    assert rows["2024-01-08"]["band_state"] == "above"
    assert rows["2024-01-07"]["band_state"] == "inside"


def test_rsi_saturates_on_monotone_trends_and_guards_zero_motion(spark, tmp_path):
    """Strictly-up bars pin RSI = 100 ('overbought'), strictly-down
    pin 0 ('oversold'); a flat series has sum_gain + sum_loss = 0 and
    must emit NO row (division guard), not RSI = NaN."""
    from crypto_etl_pipeline_spark.queries.market import ta_rsi_cutler

    sf = _write_events(spark, tmp_path, _series())
    out = ta_rsi_cutler(spark, sf).collect()
    by_type: dict = {}
    for r in out:
        by_type.setdefault(r["event_type"], []).append(r)
    assert "flat" not in by_type
    assert "vee" not in by_type  # only 4 bars, window never fills
    assert {r["rsi"] for r in by_type["up"]} == {100.0}
    assert {r["rsi_state"] for r in by_type["up"]} == {"overbought"}
    assert {r["rsi"] for r in by_type["down"]} == {0.0}
    assert {r["rsi_state"] for r in by_type["down"]} == {"oversold"}
    # full-window discipline: first RSI row is bar 15 (14 diffs)
    assert min(r["day_s"] for r in by_type["up"]) == "2024-01-15"


def test_max_drawdown_depth_and_first_trough_day(spark, tmp_path):
    """vee path 100 -> 120 -> 60 -> 90: peak 120, trough 60, depth
    0.5 on day 3. Monotone-up never draws down (0.0, trough = day 1,
    the first day attaining dd = 0); monotone-down's depth is
    1 - last/first."""
    from crypto_etl_pipeline_spark.queries.market import ta_max_drawdown

    sf = _write_events(spark, tmp_path, _series())
    out = {r["event_type"]: r for r in ta_max_drawdown(spark, sf).collect()}
    assert out["vee"]["max_drawdown"] == 0.5
    assert out["vee"]["trough_day"] == "2024-01-03"
    assert out["vee"]["n_days"] == 4
    assert out["up"]["max_drawdown"] == 0.0
    assert out["up"]["trough_day"] == "2024-01-01"
    down = _series()["down"]
    assert out["down"]["max_drawdown"] == round(1 - down[-1] / down[0], 6)
    assert out["down"]["trough_day"] == f"2024-01-{_N:02d}"


def test_realized_vol_matches_numpy_and_flat_is_zero(spark, tmp_path):
    """Realized vol on the 'up' path matches numpy's ddof=1 stddev of
    the log returns x sqrt(365) for the last full window; the flat
    series is exactly 0 everywhere."""
    import numpy as np

    from crypto_etl_pipeline_spark.queries.market import ta_realized_volatility

    sf = _write_events(spark, tmp_path, _series())
    out = ta_realized_volatility(spark, sf).collect()
    flat = [r for r in out if r["event_type"] == "flat"]
    assert flat and {r["vol_ann"] for r in flat} == {0.0}
    up = sorted((r for r in out if r["event_type"] == "up"), key=lambda r: r["day_s"])
    closes = _series()["up"]
    rets = np.diff(np.log(closes))
    want = round(float(np.std(rets[-7:], ddof=1)) * math.sqrt(365.0), 6)
    assert abs(up[-1]["vol_ann"] - want) < 1e-9
    # full-window discipline: returns exist from bar 2, vol from bar 8
    assert up[0]["day_s"] == "2024-01-08"


def test_returns_correlation_exact_for_proportional_series(spark, tmp_path):
    """geoup/geodown share the same |log return| with opposite sign
    each day -> Pearson r = -1 on the 6-decimal grid; 'up2' (a scaled
    copy of geoup: identical returns) -> r = +1. n_days counts the
    aligned return days (bars - 1)."""
    from crypto_etl_pipeline_spark.queries.market import ta_returns_correlation

    s = _series()
    s["up2"] = [2.0 * v for v in s["geoup"]]
    sf = _write_events(spark, tmp_path, {k: s[k] for k in ("geoup", "geodown", "up2")})
    out = {(r["type_a"], r["type_b"]): r for r in ta_returns_correlation(spark, sf).collect()}
    assert out[("geodown", "geoup")]["pearson_r"] == -1.0
    assert out[("geoup", "up2")]["pearson_r"] == 1.0
    assert out[("geoup", "up2")]["n_days"] == _N - 1
