"""Semantic checks for the round-7 sixth-wave queries (incremental
rollup merge, Wilson PII bounds, n-gram novelty curve).

Oracle parity is covered by tests/test_oracle_parity.py — these pin
the algebraic properties the parity hash can't see: merge == full
recompute (the mergeability contract), Wilson interval sanity
(contains the point rate, inside [0,1], tighter with larger n), and
novelty-curve conservation (batch 0 is all-new; cumulative vocab ==
global distinct trigram count).
"""

from __future__ import annotations

import math

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    from crypto_etl_pipeline_spark.queries import REGISTRY

    return REGISTRY


def test_incremental_merge_equals_full_recompute(registry, spark):
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.sources.tables import load_table

    merged = {
        (r["hour_start"], r["event_type"]): r
        for r in registry["incremental_rollup_merge"].fn(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    full = {
        (r["hour_start"], r["event_type"]): r
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(merged) == set(full)
    for key, m in merged.items():
        f = full[key]
        assert m["n_events"] == f["n_events"]
        assert abs(m["sum_value"] - f["sum_value"]) < 1e-3
        assert abs(m["min_value"] - f["min_value"]) < 1e-6
        assert abs(m["max_value"] - f["max_value"]) < 1e-6
    # the cutoff actually splits the data: some hours exist only in
    # base, some only in delta (otherwise the merge is vacuous)
    hours = sorted({k[0] for k in merged})
    assert hours[0] < "2024-01-21" < hours[-1]


def test_wilson_interval_properties(registry, spark):
    rows = [
        tuple(r) for r in registry["pii_rate_wilson_by_source"].fn(spark, SF).collect()
    ]
    assert rows and sum(r[1] for r in rows) == 500
    z = 1.96
    for _, n, k, rate, lo, hi in rows:
        assert 0 <= k <= n
        assert abs(rate - k / n) < 1e-6
        assert 0.0 <= lo <= rate <= hi <= 1.0
        # closed-form replay
        p = k / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        denom = 1 + z * z / n
        assert abs(lo - (center - half) / denom) < 1e-5
        assert abs(hi - (center + half) / denom) < 1e-5
        # the seeded incidence (~30%) is inside every source's interval
        assert lo < 0.5 and hi > 0.1


def test_novelty_curve_conservation(registry, spark):
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.sources.tables import load_table

    out = sorted(
        tuple(r) for r in registry["text_ngram_novelty_curve"].fn(spark, SF).collect()
    )
    assert [r[0] for r in out] == [0, 1, 2, 3, 4]  # 500 docs / 100
    # batch 0 is all-new by definition
    assert out[0][3] == out[0][2] and abs(out[0][4] - 1.0) < 1e-9
    for batch, occ, distinct, new, rate, cum in out:
        assert 0 <= new <= distinct <= occ
        assert abs(rate - new / distinct) < 1e-6
    # cumulative vocab is the running sum of new grams and ends at the
    # global distinct trigram count
    running = 0
    for r in out:
        running += r[3]
        assert r[5] == running
    docs = load_table(spark, SF, "documents")
    n_tri = (
        docs.select(F.split("text", r"\s+").alias("t"))
        .where(F.expr("size(t) >= 3"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3), "
                    "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"
                )
            ).alias("g")
        )
        .agg(F.countDistinct("g"))
        .collect()[0][0]
    )
    assert out[-1][5] == n_tri


def test_basket_rules_internally_consistent(registry, spark):
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.sources.tables import load_table

    rules = [
        tuple(r) for r in registry["basket_association_rules"].fn(spark, SF).collect()
    ]
    assert 0 < len(rules) <= 20
    lifts = [r[6] for r in rules]
    assert lifts == sorted(lifts, reverse=True)
    li = load_table(spark, SF, "lineitem")
    n_orders = li.select("l_orderkey").distinct().count()
    for p_a, p_b, s_ab, s_a, s_b, conf, lift in rules:
        assert p_a < p_b
        assert 3 <= s_ab <= min(s_a, s_b)
        assert abs(conf - s_ab / s_a) < 1e-6
        assert abs(lift - s_ab * n_orders / (s_a * s_b)) < 1e-3
        assert lift > 1.0  # top-by-lift on real co-purchases

    # spot-verify one pair's support by direct count
    p_a, p_b, s_ab = rules[0][0], rules[0][1], rules[0][2]
    both = (
        li.where(F.col("l_partkey").isin([p_a, p_b]))
        .select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .count()
        .where("count = 2")
        .count()
    )
    assert both == s_ab


def test_zipf_heaps_fit_in_natural_ranges(registry, spark):
    row = registry["text_zipf_heaps_fit"].fn(spark, SF).collect()
    assert len(row) == 1
    r = row[0]
    # the synthetic corpus has a ~31-word vocabulary, so the Zipf fit
    # uses every rank available (min(vocab, 100))
    assert 0 < r["zipf_points"] <= 100 and r["heaps_points"] == 5
    # frequency is non-increasing in rank, so the slope is negative;
    # the small synthetic vocabulary flattens the tail, but the fit
    # must stay clearly below zero
    assert -3.0 < r["zipf_slope"] < -0.05
    # Heaps over trigram types: vocabulary grows sublinearly
    # (0 < beta < 1) with K > 0
    assert 0.0 < r["heaps_beta"] < 1.0
    assert r["heaps_k"] > 0.0
    # cross-query consistency: the Heaps curve's final vocabulary is
    # the novelty curve's cumulative trigram vocabulary
    import math as _math

    novelty = sorted(
        tuple(x) for x in registry["text_ngram_novelty_curve"].fn(spark, SF).collect()
    )
    v_final = novelty[-1][5]
    # replay the fit's final point: ln V_final must sit near the line
    # beta * ln T_final + ln K (within fit residual tolerance)
    assert v_final > 31  # trigram vocab is the growing one
    # intercept recovers roughly the top frequency: ln f(1) ~ intercept
    import math

    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    top_f = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("t"))
        .groupBy("t")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert abs(r["zipf_intercept"] - math.log(top_f)) < 2.0


def test_lsh_sweep_nesting_and_bounds(registry, spark):
    rows = {
        r["bands"]: r
        for r in registry["dedup_lsh_parameter_sweep"].fn(spark, SF).collect()
    }
    assert set(rows) == {4, 8, 16}
    n_truth = {r["n_truth"] for r in rows.values()}
    assert len(n_truth) == 1 and n_truth.pop() > 0
    for b, r in rows.items():
        assert r["rows_per_band"] == 32 // b
        assert abs(r["s_curve_thresh"] - round((1 / b) ** (b / 32), 4)) < 1e-9
        assert 0 <= r["n_verified"] <= r["n_candidates"]
        assert r["n_verified"] <= r["n_truth"]
        if r["n_candidates"]:
            assert abs(r["precision"] - r["n_verified"] / r["n_candidates"]) < 1e-6
        assert abs(r["recall"] - r["n_verified"] / r["n_truth"]) < 1e-6
    # consecutive band slicing nests the candidate sets: an 8-row band
    # match implies its 2-row sub-bands match, so candidates and
    # verified counts are monotone in bands
    assert rows[4]["n_candidates"] <= rows[8]["n_candidates"] <= rows[16]["n_candidates"]
    assert rows[4]["n_verified"] <= rows[8]["n_verified"] <= rows[16]["n_verified"]
    assert rows[4]["recall"] <= rows[8]["recall"] <= rows[16]["recall"]
    # the recall-leaning config (s-curve 0.25 vs truth J 0.5) must
    # catch the large majority of true pairs
    assert rows[16]["recall"] >= 0.8


def test_mann_whitney_consistent_with_scipy_style_replay(registry, spark):
    import duckdb

    r = registry["ab_mann_whitney_u"].fn(spark, SF).collect()[0]
    con = duckdb.connect()
    vals = con.sql(
        f"SELECT round(value,2) AS v, event_type FROM '{SF}/events.parquet' "
        "WHERE value IS NOT NULL AND event_type IN ('purchase','click')"
    ).fetchall()
    a = sorted(v for v, t in vals if t == "purchase")
    b = sorted(v for v, t in vals if t == "click")
    assert r["n_a"] == len(a) and r["n_b"] == len(b)
    # dense U replay: U_a = sum over pairs [x>y] + 0.5*[x==y]
    import bisect

    u = 0.0
    for x in a:
        lo = bisect.bisect_left(b, x)
        hi = bisect.bisect_right(b, x)
        u += lo + 0.5 * (hi - lo)
    assert abs(r["u_a"] - u) < 0.01
    assert abs(r["mu_u"] - len(a) * len(b) / 2.0) < 0.01
    assert r["sigma_u"] > 0
    assert abs(r["z"] - (u - len(a) * len(b) / 2.0) / r["sigma_u"]) < 1e-2
    assert 0.0 <= r["p_approx"] <= 1.0
    # replay the A&S 26.2.17 tail from the reported z
    x = abs(r["z"])
    tt = 1.0 / (1.0 + 0.2316419 * x)
    pdf = math.exp(-x * x / 2.0) / math.sqrt(2.0 * math.pi)
    poly = (
        0.319381530 * tt
        - 0.356563782 * tt**2
        + 1.781477937 * tt**3
        - 1.821255978 * tt**4
        + 1.330274429 * tt**5
    )
    assert abs(r["p_approx"] - min(1.0, 2.0 * pdf * poly)) < 5e-4


def test_attribution_conserves_revenue(registry, spark):
    import duckdb

    rows = {
        r["channel"]: r
        for r in registry["event_attribution_linear"].fn(spark, SF).collect()
    }
    assert set(rows) <= {"click", "view", "direct"} and len(rows) >= 2
    total_share = sum(r["revenue_share"] for r in rows.values())
    assert abs(total_share - 1.0) < 1e-4
    con = duckdb.connect()
    total = con.sql(
        f"SELECT sum(value) FROM '{SF}/events.parquet' "
        "WHERE event_type='purchase' AND value IS NOT NULL"
    ).fetchone()[0]
    attributed = sum(r["attributed_revenue"] for r in rows.values())
    assert abs(attributed - total) < 0.01 * len(rows)
    for r in rows.values():
        assert r["n_events"] > 0 and r["attributed_revenue"] > 0


def test_footer_stats_match_pyarrow_direct(registry, spark):
    import pyarrow.parquet as pq

    rows = {
        r["column_name"]: r
        for r in registry["parquet_footer_stats_audit"].fn(spark, SF).collect()
    }
    assert set(rows) == {"l_extendedprice", "l_quantity", "l_discount", "l_tax"}
    f = pq.ParquetFile(f"{SF}/lineitem.parquet")
    idx = {n: i for i, n in enumerate(f.schema_arrow.names)}
    for c, r in rows.items():
        mn, mx, nv = float("inf"), float("-inf"), 0
        for rg in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(rg).column(idx[c]).statistics
            mn, mx, nv = min(mn, st.min), max(mx, st.max), nv + st.num_values
        assert r["num_values"] == nv
        assert abs(r["min_value"] - round(mn, 4)) < 1e-9
        assert abs(r["max_value"] - round(mx, 4)) < 1e-9


def test_matryoshka_monotone_fidelity(registry, spark):
    rows = {
        r["k"]: r
        for r in registry["embedding_matryoshka_fidelity"].fn(spark, SF).collect()
    }
    assert set(rows) == {8, 16, 32, 64}
    n_pairs = {r["n_pairs"] for r in rows.values()}
    assert len(n_pairs) == 1 and n_pairs.pop() > 0
    # energy retained grows with prefix length; full dim keeps it all
    mefs = [rows[k]["mean_energy_frac"] for k in (8, 16, 32, 64)]
    assert mefs == sorted(mefs)
    assert abs(rows[64]["mean_energy_frac"] - 1.0) < 1e-9
    # full-dim truncation is the identity: drift exactly 0
    assert rows[64]["mean_abs_cos_delta"] == 0.0
    assert rows[64]["max_abs_cos_delta"] == 0.0
    for k, r in rows.items():
        assert 0.0 < r["mean_energy_frac"] <= 1.0
        assert 0.0 <= r["mean_abs_cos_delta"] <= r["max_abs_cos_delta"] <= 2.0


def test_stream_mv_merge_multibatch_equals_batch(registry, spark):
    """Force MULTIPLE micro-batches (copies=3 staging) so the merge
    path genuinely exercises cross-batch folding, then compare against
    the one-shot batch aggregate of the same tripled input."""
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.queries.streaming import (
        _checkpoint,
        _stage_dir,
        _tmpdir,
    )
    from crypto_etl_pipeline_spark.streaming.incremental import (
        read_event_stream,
        run_mv_rollup_stream,
    )

    staged = _stage_dir(SF, copies=3)
    events = read_event_stream(spark, staged)
    got = {
        (r["hour_start"], r["event_type"]): r
        for r in run_mv_rollup_stream(
            events, store_dir=_tmpdir("mv_t_"), checkpoint_dir=_checkpoint()
        ).collect()
    }
    want = {
        (r["hour_start"], r["event_type"]): r
        for r in spark.read.parquet(staged)
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k, g in got.items():
        w = want[k]
        assert g["n_events"] == w["n_events"]
        assert abs(g["sum_value"] - w["sum_value"]) < 1e-3
        assert abs(g["min_value"] - w["min_value"]) < 1e-6
        assert abs(g["max_value"] - w["max_value"]) < 1e-6


def test_holt_matches_dense_python_replay(registry, spark):
    import duckdb

    rows = {
        r["event_type"]: r
        for r in registry["forecast_holt_daily_revenue"].fn(spark, SF).collect()
    }
    assert set(rows) == {"purchase", "view"}
    con = duckdb.connect()
    for etype, r in rows.items():
        ys = [
            v[0]
            for v in con.sql(
                f"SELECT sum(value) FROM '{SF}/events.parquet' "
                f"WHERE event_type='{etype}' "
                "GROUP BY date_trunc('day', ts) ORDER BY date_trunc('day', ts)"
            ).fetchall()
        ]
        assert r["n_days"] == len(ys) == 30
        lvl, tr = ys[0], ys[1] - ys[0]
        for y in ys[1:]:
            nl = 0.5 * y + 0.5 * (lvl + tr)
            tr = 0.25 * (nl - lvl) + 0.75 * tr
            lvl = nl
        assert abs(r["level"] - lvl) < 1e-4
        assert abs(r["trend"] - tr) < 1e-4
        assert abs(r["forecast_1d"] - (lvl + tr)) < 1e-4
        assert abs(r["forecast_7d"] - (lvl + 7 * tr)) < 1e-4
        # the forecast extrapolates the level along the trend line
        assert (r["forecast_7d"] - r["forecast_1d"]) * r["trend"] >= 0


def test_grouped_quantile_matches_direct_sort(registry, spark):
    import duckdb

    rows = {
        (r["event_type"], r["p"]): r
        for r in registry["quantile_grouped_exact_histogram"].fn(spark, SF).collect()
    }
    con = duckdb.connect()
    groups = [
        g[0]
        for g in con.sql(
            f"SELECT DISTINCT event_type FROM '{SF}/events.parquet' WHERE value IS NOT NULL"
        ).fetchall()
    ]
    assert set(rows) == {(g, p) for g in groups for p in (0.5, 0.99)}
    for g in groups:
        cents = [
            c[0]
            for c in con.sql(
                f"SELECT CAST(round(value*100,0) AS BIGINT) AS c "
                f"FROM '{SF}/events.parquet' "
                f"WHERE value IS NOT NULL AND event_type='{g}' ORDER BY c"
            ).fetchall()
        ]
        for p in (0.5, 0.99):
            r = rows[(g, p)]
            k = math.ceil(p * len(cents))
            assert r["n_rows"] == len(cents) and r["rank_k"] == k
            assert r["value_cents"] == cents[k - 1]
        assert rows[(g, 0.5)]["value_cents"] <= rows[(g, 0.99)]["value_cents"]


def test_langid_confusion_partitions_and_diagonal(registry, spark):
    rows = [
        tuple(r) for r in registry["text_langid_confusion"].fn(spark, SF).collect()
    ]
    assert sum(r[2] for r in rows) == 500  # partitions the corpus
    for actual, pred, n, ok in rows:
        assert n > 0 and ok == (actual == pred)
    # the synthetic corpus mixes stopwords across langs, so the cheap
    # heuristic is WEAK here (~0.40 accuracy, below the 0.436 'en'
    # majority) — exactly the fact this eval surface exists to expose;
    # pin non-degeneracy, not quality
    correct = sum(r[2] for r in rows if r[3])
    assert 0.2 < correct / 500 < 0.95
    # per actual language, counts sum to the label distribution
    by_actual = {}
    for actual, _, n, _ in rows:
        by_actual[actual] = by_actual.get(actual, 0) + n
    assert by_actual["en"] == 218 and sum(by_actual.values()) == 500


def test_cusum_matches_dense_replay(registry, spark):
    import duckdb

    rows = {
        r["event_type"]: r
        for r in registry["quality_cusum_drift_alarm"].fn(spark, SF).collect()
    }
    assert len(rows) == 5
    con = duckdb.connect()
    for etype, r in rows.items():
        ys = [
            float(v[0])
            for v in con.sql(
                f"SELECT count(*) FROM '{SF}/events.parquet' "
                f"WHERE event_type='{etype}' "
                "GROUP BY date_trunc('day', ts) ORDER BY date_trunc('day', ts)"
            ).fetchall()
        ]
        n = len(ys)
        mu = sum(ys) / n
        sd = (sum((y - mu) ** 2 for y in ys) / (n - 1)) ** 0.5
        cp = cn = mxp = mxn = 0.0
        for y in ys:
            cp = max(0.0, cp + y - mu - 0.5 * sd)
            cn = max(0.0, cn + mu - 0.5 * sd - y)
            mxp, mxn = max(mxp, cp), max(mxn, cn)
        assert r["n_days"] == n
        assert abs(r["mu"] - mu) < 1e-3 and abs(r["sd"] - sd) < 1e-3
        assert abs(r["cusum_pos_final"] - cp) < 1e-3
        assert abs(r["cusum_neg_final"] - cn) < 1e-3
        assert abs(r["cusum_pos_max"] - mxp) < 1e-3
        assert r["alarm"] == (mxp > 4.0 * sd or mxn > 4.0 * sd)
        # max statistics dominate finals by construction
        assert r["cusum_pos_max"] >= r["cusum_pos_final"] - 1e-9


def test_backlog_sweepline_conserves_orders(registry, spark):
    rows = sorted(
        tuple(r) for r in registry["orders_backlog_sweepline"].fn(spark, SF).collect()
    )
    assert rows
    months = [r[0] for r in rows]
    assert months == sorted(months)
    total_open = sum(r[1] for r in rows)
    total_close = sum(r[2] for r in rows)
    # every order opens once and closes once
    assert total_open == total_close > 0
    # backlog is the running delta sum, never negative, ends at zero
    run = 0
    for _, op, cl, eom in rows:
        run += op - cl
        assert eom == run
        assert eom >= 0
    assert rows[-1][3] == 0
    from crypto_etl_pipeline_spark.sources.tables import load_table

    n_orders = load_table(spark, SF, "orders").count()
    # orders with no lineitems (if any) are excluded by the inner join
    assert 0 < total_open <= n_orders


def test_streaks_conserve_active_days(registry, spark):
    import duckdb

    rows = sorted(
        tuple(r) for r in registry["user_activity_streaks"].fn(spark, SF).collect()
    )
    assert rows
    con = duckdb.connect()
    n_active = con.sql(
        f"SELECT count(*) FROM (SELECT DISTINCT user_id, date_trunc('day', ts) "
        f"FROM '{SF}/events.parquet')"
    ).fetchone()[0]
    # streak lengths x counts partition the distinct (user, day) set
    assert sum(ln * n for ln, n, _ in rows) == n_active
    for ln, n_streaks, n_users in rows:
        assert ln >= 1 and 1 <= n_users <= n_streaks


def test_dp_release_noise_replay(registry, spark):
    import hashlib
    import math as m

    rows = [
        tuple(r) for r in registry["privacy_dp_noised_counts"].fn(spark, SF).collect()
    ]
    assert len(rows) == 25
    for nation, true_count, released, abs_noise, eps in rows:
        assert eps == 1.0 and true_count > 0
        u = int(hashlib.md5(nation.encode()).hexdigest()[:12], 16) / (1 << 48) - 0.5
        noise = -(1.0 / eps) * (1.0 if u >= 0 else -1.0) * m.log(1.0 - 2.0 * abs(u))
        assert abs(released - (true_count + noise)) < 1e-3
        assert abs(abs_noise - abs(noise)) < 1e-3
        # Laplace b=1: noise is small relative to hundreds-sized counts
        assert abs_noise < 25.0


def test_nprobe_sweep_monotone_recall(registry, spark):
    rows = {
        r["nprobe"]: r for r in registry["ann_ivf_nprobe_sweep"].fn(spark, SF).collect()
    }
    assert set(rows) == {1, 2, 4}
    for p, r in rows.items():
        assert 0 <= r["recall_at_10"] <= 1.0
        assert r["n_returned"] <= 10 * 10  # <= k per query
        assert r["n_returned"] <= r["n_candidates"]
    # probe sets nest, so candidates and recall are monotone in nprobe
    assert rows[1]["n_candidates"] <= rows[2]["n_candidates"] <= rows[4]["n_candidates"]
    assert rows[1]["recall_at_10"] <= rows[2]["recall_at_10"] <= rows[4]["recall_at_10"]
    # at nprobe=4 the registry's recall gate level holds
    assert rows[4]["recall_at_10"] >= 0.8


def test_minhash_estimate_contract(registry, spark):
    r = registry["dedup_minhash_estimate_error"].fn(spark, SF).collect()[0]
    assert r["n_pairs"] > 0
    assert 0.0 <= r["mean_abs_err"] <= r["max_abs_err"] <= 1.0
    assert 0.0 < r["mean_exact"] <= 1.0
    # the audit's own contract: mean abs error within 2 standard
    # errors of the 32-hash Bernoulli-mean estimator
    assert r["within_2se"] is True
    assert r["mean_abs_err"] <= 2.0 / math.sqrt(32.0)


def test_embedding_drift_matches_numpy(registry, spark):
    import numpy as np
    import pyarrow.parquet as pq

    rows = {
        r["label"]: r
        for r in registry["embedding_drift_centroid_shift"].fn(spark, SF).collect()
    }
    assert len(rows) == 10
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pydict()
    ids = np.asarray(t["vec_id"]); labels = np.asarray(t["label"])
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    grp_a = (ids * 2654435761) % 100 < 50
    for lab, r in rows.items():
        ma = X[(labels == lab) & grp_a].mean(axis=0)
        mb = X[(labels == lab) & ~grp_a].mean(axis=0)
        assert r["n_a"] == int(((labels == lab) & grp_a).sum())
        assert r["n_b"] == int(((labels == lab) & ~grp_a).sum())
        assert abs(r["centroid_shift_l2"] - float(np.sqrt(((ma - mb) ** 2).sum()))) < 1e-3
        # i.i.d. halves: the shift sits at the sampling-noise floor,
        # well under the typical vector norm (~1)
        assert 0.0 < r["centroid_shift_l2"] < 1.0


def test_corr_matrix_symmetry_and_bounds(registry, spark):
    import duckdb

    rows = [
        tuple(r) for r in registry["corr_matrix_lineitem"].fn(spark, SF).collect()
    ]
    assert len(rows) == 6  # C(4,2) pairs
    n = {r[3] for r in rows}
    assert len(n) == 1
    # upper triangle in declaration order: unique unordered pairs
    assert len({frozenset((a, b)) for a, b, _, _ in rows}) == 6
    con = duckdb.connect()
    for col_a, col_b, r, _ in rows:
        assert col_a != col_b
        assert -1.0 <= r <= 1.0
        want = con.sql(
            f"SELECT corr({col_a}, {col_b}) FROM '{SF}/lineitem.parquet'"
        ).fetchone()[0]
        assert abs(r - want) < 1e-5
