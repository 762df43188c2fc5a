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


# ---------------------------------------------------------------------------
# Annotation-agreement family (r13): planted-fixture semantics
# ---------------------------------------------------------------------------

def _write_docs(spark, tmp_path, rows):
    """documents.parquet fixture (driver schema) from
    (doc_id, n_chars, text) rows — n_chars is an independent column,
    so annotator A (length) is plantable separately from B (tokens)
    and C (TTR)."""
    df = (
        spark.createDataFrame(rows, "doc_id long, n_chars long, text string")
        .select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            F.lit("s0").alias("source"),
            "n_chars",
        )
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(sf_dir + "/documents.parquet")
    return sf_dir


def _doc(cls: str, i: int) -> tuple:
    """A document all three annotators label ``cls``: A via n_chars,
    B via token count, C via type-token ratio."""
    if cls == "low":  # 30 tokens, 10 unique -> ttr 0.33
        return (i, 100, " ".join(f"w{j % 10}" for j in range(30)))
    if cls == "mid":  # 50 tokens, 25 unique -> ttr 0.5
        return (i, 300, " ".join(f"w{j % 25}" for j in range(50)))
    return (i, 500, " ".join(f"w{j}" for j in range(80)))  # ttr 1.0


def test_kappa_perfect_agreement_is_one(spark, tmp_path):
    """All three annotators agree on every document -> Cohen and
    Fleiss kappa both exactly 1 (integer-exact, not 0.999...)."""
    from crypto_etl_pipeline_spark.queries.quality import (
        quality_cohen_kappa,
        quality_fleiss_kappa,
    )

    rows = [_doc("low", 1), _doc("low", 2), _doc("mid", 3), _doc("high", 4), _doc("high", 5)]
    sf = _write_docs(spark, tmp_path, rows)
    c = quality_cohen_kappa(spark, sf).collect()[0]
    assert (c["po"], c["kappa"]) == (1.0, 1.0)
    f = quality_fleiss_kappa(spark, sf).collect()[0]
    assert (f["p_bar"], f["kappa"]) == (1.0, 1.0)


def test_cohen_kappa_matches_hand_computed_contingency(spark, tmp_path):
    """A planted 4-doc disagreement pattern (A = [low,low,mid,high],
    B = [low,mid,mid,low]) reproduces the hand-computed kappa from
    the exact-integer form (n*agree - S)/(n^2 - S)."""
    from crypto_etl_pipeline_spark.queries.quality import quality_cohen_kappa

    # A controlled by n_chars; B by token count. C unused here.
    def doc(i, a_cls, b_tokens_cls):
        n_chars = {"low": 100, "mid": 300, "high": 500}[a_cls]
        n_tok = {"low": 30, "mid": 50, "high": 80}[b_tokens_cls]
        return (i, n_chars, " ".join(f"w{j}" for j in range(n_tok)))

    rows = [doc(1, "low", "low"), doc(2, "low", "mid"), doc(3, "mid", "mid"), doc(4, "high", "low")]
    sf = _write_docs(spark, tmp_path, rows)
    r = quality_cohen_kappa(spark, sf).collect()[0]
    n, agree = 4, 2
    # marginals: A = (2 low, 1 mid, 1 high), B = (2 low, 2 mid, 0 high)
    s = 2 * 2 + 1 * 2 + 1 * 0
    want = round((n * agree - s) / (n * n - s), 6)
    assert r["n_docs"] == 4 and r["po"] == 0.5
    assert r["kappa"] == want


def test_fd_violations_g3_on_planted_tables(spark, tmp_path):
    """Planted orders/events/lineitem: the key FD has 0 violations;
    o_custkey -> o_orderpriority has exactly one violating group whose
    cheapest repair removes 1 of 4 rows (g3 = 0.25)."""
    from crypto_etl_pipeline_spark.queries.quality import quality_fd_violations

    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5.0, "2024-01-01", "P1"),
            (2, 10, "F", 5.0, "2024-01-01", "P1"),
            (3, 10, "O", 5.0, "2024-01-01", "P2"),
            (4, 20, "O", 5.0, "2024-01-01", "P3"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, d string, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.to_timestamp("d").alias("o_orderdate"), "o_orderpriority",
    )
    events = spark.createDataFrame(
        [(1, "2024-01-01", 7, "click", 1.0), (2, "2024-01-01", 7, "click", 1.0)],
        "event_id long, d string, user_id long, event_type string, value double",
    ).select(
        "event_id", F.to_timestamp("d").alias("ts"), "user_id", "event_type",
        "value", F.lit(None).cast("string").alias("props"),
    )
    li = spark.createDataFrame(
        [(1, 100, 5, 1), (2, 100, 5, 1), (3, 100, 6, 1)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        F.lit(1.0).alias("l_quantity"), F.lit(1.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"), F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"), F.lit("O").alias("l_linestatus"),
        F.to_timestamp(F.lit("2024-01-01")).alias("l_shipdate"),
    )
    d = str(tmp_path)
    orders.coalesce(1).write.mode("overwrite").parquet(d + "/orders.parquet")
    events.coalesce(1).write.mode("overwrite").parquet(d + "/events.parquet")
    li.coalesce(1).write.mode("overwrite").parquet(d + "/lineitem.parquet")

    out = {r["fd"]: r for r in quality_fd_violations(spark, d).collect()}
    key = out["orders.o_orderkey->o_orderstatus"]
    assert key["violating_groups"] == 0 and key["min_fix_rows"] == 0 and key["g3_error"] == 0.0
    cp = out["orders.o_custkey->o_orderpriority"]
    # custkey 10: priorities P1,P1,P2 -> drop 1 row; custkey 20 clean
    assert cp["n_groups"] == 2 and cp["violating_groups"] == 1
    assert cp["min_fix_rows"] == 1 and cp["g3_error"] == 0.25
    ps = out["lineitem.l_partkey->l_suppkey"]
    assert ps["violating_groups"] == 1 and ps["min_fix_rows"] == 1
    ev = out["events.user_id->event_type"]
    assert ev["violating_groups"] == 0 and ev["g3_error"] == 0.0


# ---------------------------------------------------------------------------
# Preference-aggregation family (r13): Copeland + Bradley-Terry
# ---------------------------------------------------------------------------

def _geo_closes(returns):
    out = [100.0]
    for r in returns:
        out.append(out[-1] * math.exp(r))
    return out


def test_copeland_and_bt_on_total_dominance_chain(spark, tmp_path):
    """a's daily return always beats b's, b's always beats c's:
    Copeland is the exact chain (+2, 0, -2); Bradley-Terry strengths
    are strictly ordered with the never-winning item at exactly 0 and
    the anchor (alphabetically first = 'a') at exactly 1."""
    from crypto_etl_pipeline_spark.queries.preference import (
        pref_bradley_terry,
        pref_copeland_scores,
    )

    days = 6
    series = {
        "a": _geo_closes([0.03] * days),
        "b": _geo_closes([0.02] * days),
        "c": _geo_closes([0.01] * days),
    }
    sf = _write_events(spark, tmp_path, series)
    cop = {r["event_type"]: r for r in pref_copeland_scores(spark, sf).collect()}
    assert [cop[t]["copeland"] for t in ("a", "b", "c")] == [2, 0, -2]
    assert cop["a"]["pair_wins"] == 2 and cop["a"]["pair_losses"] == 0
    assert cop["c"]["pair_wins"] == 0 and cop["c"]["pair_losses"] == 2

    bt = {r["event_type"]: r for r in pref_bradley_terry(spark, sf).collect()}
    assert bt["a"]["strength"] == 1.0  # the anchor
    assert bt["c"]["strength"] == 0.0  # zero wins -> zero ML strength
    assert 0.0 < bt["b"]["strength"] < 1.0
    assert bt["a"]["total_wins"] == 2 * days and bt["c"]["total_wins"] == 0
    assert bt["a"]["n_decisive"] == 2 * days


def test_copeland_detects_condorcet_cycle(spark, tmp_path):
    """A planted rock-paper-scissors majority (a>b, b>c, c>a, each
    2-of-3 days) must land every item at Copeland 0 with one pairwise
    win and one loss — the intransitive-labeling audit signal."""
    from crypto_etl_pipeline_spark.queries.preference import pref_copeland_scores

    # per-day return ranks rotate: day1 a>b>c, day2 b>c>a, day3 c>a>b
    day_rets = {
        "a": [0.03, 0.01, 0.02],
        "b": [0.02, 0.03, 0.01],
        "c": [0.01, 0.02, 0.03],
    }
    series = {t: _geo_closes(rs) for t, rs in day_rets.items()}
    sf = _write_events(spark, tmp_path, series)
    out = {r["event_type"]: r for r in pref_copeland_scores(spark, sf).collect()}
    for t in ("a", "b", "c"):
        assert out[t]["copeland"] == 0
        assert out[t]["pair_wins"] == 1 and out[t]["pair_losses"] == 1
