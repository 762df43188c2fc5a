"""Round-10b operator semantics: the training-batch prep wave
(span-corruption accounting, length-bucketed batching, CCNet quality
buckets, cluster-balanced sampling) — structural invariants the oracle
hash can't see."""

from __future__ import annotations

import pytest

from crypto_etl_pipeline_spark.queries import REGISTRY

SF_GATE = "/root/testdata/sf0.01"


@pytest.mark.quick
def test_span_corruption_invariants(spark):
    """Mask layout invariants: islands merge overlapping spans (so a
    span count bounds masked coverage only from below — one island can
    chain many starts; a start at the last token masks a single
    position), the corpus mask fraction sits near the 5% * 3 design
    point, and counts are internally consistent."""
    rows = REGISTRY["span_corruption_mask_stats"].fn(spark, SF_GATE).collect()
    assert rows
    total = sum(r["total_tokens"] for r in rows)
    masked = sum(r["masked_tokens"] for r in rows)
    spans = sum(r["n_spans"] for r in rows)
    for r in rows:
        assert 0 <= r["n_spans"] <= r["masked_tokens"] <= r["total_tokens"]
        assert abs(r["mask_frac"] - r["masked_tokens"] / r["total_tokens"]) < 1e-4
    # 5% start rate, width 3, overlaps/doc-end truncation only shrink
    # coverage: E[frac] is a hair under 0.15 — generous hash-variance band
    assert 0.08 < masked / total < 0.20
    # mean island width = masked / islands: strictly > 1 (lone starts
    # cover up to 3 tokens; truncation-to-1 needs a doc-final start) but
    # NOT bounded by 3 — chained starts merge into wider islands (two
    # starts 2 apart make one width-5 island). Design point ~3.2 here.
    assert 1.0 < masked / spans < 5.0


@pytest.mark.quick
def test_length_bucketed_batching_invariants(spark):
    """Batch accounting: every doc lands in exactly one bucket, batch
    count is consistent with the 32-doc cap, and padding is
    non-negative and below the padded volume."""
    rows = REGISTRY["length_bucketed_batching"].fn(spark, SF_GATE).collect()
    docs = spark.read.parquet(f"{SF_GATE}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        # >= ceil(n_docs/32) batches (shard splits can only add batches)
        assert r["n_batches"] >= -(-r["n_docs"] // 32)
        assert 0 <= r["padded_tokens"]
        assert 0.0 <= r["pad_frac"] < 1.0
        padded_volume = r["padded_tokens"] + r["total_tokens"]
        assert abs(r["pad_frac"] - r["padded_tokens"] / padded_volume) < 1e-4


def test_ccnet_buckets_non_degenerate(spark):
    """The mean-normalized cutoffs must produce all three buckets at
    the gate SF (the fixed-cutoff form was degenerate — everything
    'head' — which is why the registered form self-normalizes)."""
    rows = REGISTRY["ccnet_quality_buckets"].fn(spark, SF_GATE).collect()
    buckets = {r["bucket"] for r in rows}
    assert buckets == {"head", "middle", "tail"}
    # docs with >= 2 tokens all land somewhere; rare mass is conserved
    for r in rows:
        assert 0 <= r["rare_bigrams"] <= r["total_bigrams"]
    # en docs score their own training model: their rare fraction must
    # be below the corpus mean, so 'tail' should be minority for en
    en = {r["bucket"]: r["n_docs"] for r in rows if r["lang"] == "en"}
    assert en.get("head", 0) > en.get("tail", 0)


def test_cluster_balanced_sample_rates(spark):
    """Acceptance semantics: cells at-or-under TARGET keep everything
    (every residue mod n_total is < TARGET); larger cells keep an
    expected TARGET with a binomial band; totals cover the corpus."""
    rows = REGISTRY["cluster_balanced_sample"].fn(spark, SF_GATE).collect()
    emb_n = spark.read.parquet(f"{SF_GATE}/embeddings.parquet").count()
    assert sum(r["n_total"] for r in rows) == emb_n
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_total"]
        if r["n_total"] <= 40:
            assert r["n_sampled"] == r["n_total"]
        else:
            # expected 40; 5-sigma binomial band keeps this deterministic
            # in practice (the hash is fixed) while documenting intent
            import math

            p = 40 / r["n_total"]
            sigma = math.sqrt(r["n_total"] * p * (1 - p))
            assert abs(r["n_sampled"] - 40) <= 5 * sigma + 1


def test_textrank_keywords_properties(spark):
    """Graph sanity: ranks are positive, the floor is the dangling
    value 0.15 + damped mass, and the top-25 is strictly ordered by
    (rank desc, token) with no duplicate tokens."""
    rows = REGISTRY["textrank_keywords"].fn(spark, SF_GATE).collect()
    assert len(rows) == 25
    assert len({r["token"] for r in rows}) == 25
    for r in rows:
        assert r["rank"] > 0.15  # symmetric graph: every node has in-mass
    ordered = sorted(rows, key=lambda r: (-r["rank"], r["token"]))
    assert [r["token"] for r in rows] == [r["token"] for r in ordered]


def test_adamic_adar_scores_exact(spark):
    """Score semantics against a hand-computed pair: aa_micro must be
    the exact BIGINT sum of round(1e6/ln(deg)) over the shared
    suppliers, and common_suppliers consistent with the posting sets."""
    import math

    rows = REGISTRY["graph_adamic_adar_linkpred"].fn(spark, SF_GATE).collect()
    assert rows and all(1 <= r["rank"] <= 5 for r in rows)
    # recompute one probe pair from raw postings
    li = spark.read.parquet(f"{SF_GATE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_GATE}/orders.parquet")
    from pyspark.sql import functions as F

    posts = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    r0 = rows[0]
    a = {r["s"] for r in posts.where(F.col("c") == r0["probe_cust"]).collect()}
    b = {r["s"] for r in posts.where(F.col("c") == r0["cand_cust"]).collect()}
    shared = a & b
    assert len(shared) == r0["common_suppliers"]
    deg = {
        r["s"]: r["d"]
        for r in posts.groupBy("s").agg(F.count(F.lit(1)).alias("d")).collect()
    }
    expect = sum(int(round(1_000_000.0 / math.log(deg[s]))) for s in shared)
    assert expect == r0["aa_micro"]


def test_rake_phrase_semantics(spark):
    """RAKE invariants: every phrase is 2-4 stopword-free tokens, the
    score is the exact sum of its members' integer word scores, and a
    known two-word phrase's score reconstructs from raw deg/freq."""
    from crypto_etl_pipeline_spark.operators.textops import STOPWORDS

    rows = REGISTRY["text_rake_keyphrases"].fn(spark, SF_GATE).collect()
    assert len(rows) == 15
    stops = set(STOPWORDS["en"])
    for r in rows:
        words = r["phrase"].split(" ")
        assert 2 <= len(words) <= 4
        assert not (set(words) & stops)
        assert r["score_micro"] > 0 and r["n_occurrences"] >= 1


def test_theil_sen_robust_to_outlier(spark):
    """Estimator robustness on a synthetic series: a slope-2 line with
    one wild outlier day. The same pairwise-slope + lower-median
    composition as the registered query (pair join on x1 < x2,
    positional median with (slope, x1, x2) tie-break) must recover
    slope exactly 2.0, while the MEAN of pairwise slopes — what a
    naive estimator would report — is pulled far off the line."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # y = 2x, except the LAST day spikes to 1e6 (an endpoint outlier —
    # a centered one cancels symmetrically in the mean and would make
    # the contrast assertion vacuous)
    pts = [(x, 1_000_000.0 if x == 20 else 2.0 * x) for x in range(21)]
    idx = spark.createDataFrame(pts, "x int, y double")
    a = idx.select(F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = idx.select(F.col("x").alias("x2"), F.col("y").alias("y2"))
    slopes = a.join(b, F.col("x1") < F.col("x2")).select(
        "x1",
        "x2",
        ((F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1"))).alias(
            "slope"
        ),
    )
    n_pairs = slopes.count()
    assert n_pairs == 21 * 20 // 2
    med_row = (
        slopes.withColumn(
            "rn", F.row_number().over(Window.orderBy("slope", "x1", "x2"))
        )
        .where(F.col("rn") == (n_pairs + 1) // 2)
        .collect()[0]
    )
    assert med_row["slope"] == 2.0  # outlier cannot move the median
    mean_slope = slopes.agg(F.avg("slope")).collect()[0][0]
    assert abs(mean_slope - 2.0) > 100  # ...but it wrecks the mean


def test_theil_sen_lower_median_convention(spark):
    """Registered-output consistency: n_pairs reconstructs from n_days,
    and the slope matches a direct numpy lower-median cross-check over
    the same daily aggregate."""
    rows = REGISTRY["theil_sen_trend_daily_revenue"].fn(spark, SF_GATE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
    # reconstruct the estimate from the daily aggregate
    import numpy as np
    from pyspark.sql import functions as F

    from crypto_etl_pipeline_spark.sources.tables import load_table

    events = load_table(spark, SF_GATE, "events")
    daily = (
        events.where(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.round(F.sum("value"), 4).alias("y"))
        .orderBy("d")
        .collect()
    )
    y = np.array([row["y"] for row in daily])
    n = len(y)
    slopes = sorted(
        ((y[j] - y[i]) / (j - i), i, j)
        for i in range(n) for j in range(i + 1, n)
    )
    lower_med = slopes[(len(slopes) + 1) // 2 - 1][0]
    assert abs(round(lower_med, 6) - r["slope_per_day"]) < 1e-9
    assert r["n_days"] == n


def test_psi_contributions_reconstruct(spark):
    """PSI semantics: each per-type micro contribution reconstructs
    from the smoothed counts, and the total is the exact BIGINT sum."""
    import math

    rows = REGISTRY["quality_psi_event_drift"].fn(spark, SF_GATE).collect()
    assert len(rows) == 5
    n_ref = sum(r["n_before"] + 1 for r in rows)
    n_cur = sum(r["n_after"] + 1 for r in rows)
    for r in rows:
        p = (r["n_after"] + 1) / n_cur
        q = (r["n_before"] + 1) / n_ref
        expect = int(round(1_000_000.0 * (p - q) * math.log(p / q)))
        assert expect == r["psi_micro"]


def test_confident_learning_joint_semantics(spark):
    """CL joint invariants: 2x2 (or fewer) cells partition the corpus,
    thresholds behave as class means (every 'ok'-predicted doc scores
    >= every min of the ok-threshold cell bound), and off-diagonal
    cells — the candidate label errors — are a minority."""
    rows = REGISTRY["quality_confident_learning"].fn(spark, SF_GATE).collect()
    docs_n = spark.read.parquet(f"{SF_GATE}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == docs_n
    cells = {(r["given"], r["predicted"]): r for r in rows}
    assert set(cells) <= {("ok", "ok"), ("ok", "flagged"),
                          ("flagged", "ok"), ("flagged", "flagged")}
    diag = sum(r["n_docs"] for (g, p), r in cells.items() if g == p)
    off = sum(r["n_docs"] for (g, p), r in cells.items() if g != p)
    assert diag > off  # labels mostly agree with the scorer
    # ok-predicted cells sit above flagged-predicted cells in score
    if ("ok", "ok") in cells and ("ok", "flagged") in cells:
        assert (cells[("ok", "ok")]["min_score_micro"]
                > cells[("ok", "flagged")]["max_score_micro"])


def test_window_funnel_levels_monotone(spark):
    """Funnel semantics: levels partition users, counts are monotone
    down the funnel (level k reachable only through k-1), and the
    level-3 users verifiably have view<click<purchase within 12h."""
    rows = {r["level"]: r["n_users"]
            for r in REGISTRY["window_funnel_horizon"].fn(spark, SF_GATE).collect()}
    from crypto_etl_pipeline_spark.sources.tables import load_table

    events = load_table(spark, SF_GATE, "events")
    n_users = events.select("user_id").distinct().count()
    assert sum(rows.values()) == n_users
    reached_1 = sum(v for k, v in rows.items() if k >= 1)
    reached_2 = sum(v for k, v in rows.items() if k >= 2)
    reached_3 = rows.get(3, 0)
    assert reached_1 >= reached_2 >= reached_3
    assert reached_3 >= 1  # non-vacuous at the gate SF
