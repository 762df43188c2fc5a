"""User-behavior analytics (funnel, cohort retention, pivot) and
deterministic stratified sampling.

Extension surface (reference has no multi-row analytics at all —
SURVEY.md §2.3 "no joins"); these are the event-stream shapes a
production pipeline derives from the same ingested data, each with a
hash-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crypto_etl_pipeline_spark.queries.base import register
from crypto_etl_pipeline_spark.sources.tables import load_table


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_click_after_view,
           (SELECT count(*) FROM p) AS n_purchase_after_click,
           round((SELECT count(*) FROM c) * 1.0 / (SELECT count(*) FROM v), 6)
             AS view_to_click,
           round((SELECT count(*) FROM p) * 1.0 / (SELECT count(*) FROM c), 6)
             AS click_to_purchase
    """,
    description="Ordered 3-stage funnel (view -> later click -> later purchase) with conversion rates",
    tags=("behavior", "funnel", "join", "agg"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: a stage only counts if it happens
    AFTER the user's previous stage (min-ts chaining, not mere
    presence). Each stage is one groupBy(user_id) over a filtered
    event slice joined to the previous stage's per-user row — all
    three stages cluster on user_id, so the exchanges line up, and the
    per-user stage tables are collision-thin (AQE broadcasts them
    against the event scan at any realistic selectivity)."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_after_view"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
    return (
        nv.crossJoin(nc).crossJoin(np_)
        .select(
            "n_view",
            "n_click_after_view",
            "n_purchase_after_click",
            F.round(F.col("n_click_after_view") / F.col("n_view"), 6).alias("view_to_click"),
            F.round(F.col("n_purchase_after_click") / F.col("n_click_after_view"), 6).alias("click_to_purchase"),
        )
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, date_trunc('week', min(ts)) AS w0
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id, f.w0,
             date_diff('day', f.w0, date_trunc('week', e.ts)) // 7 AS k
      FROM events e JOIN first f ON e.user_id = f.user_id
    )
    SELECT strftime(w0, '%Y-%m-%d') AS cohort_week,
           k                        AS week_offset,
           count(*)                 AS n_active
    FROM act WHERE k BETWEEN 0 AND 3
    GROUP BY w0, k
    """,
    description="Weekly cohort retention: users grouped by first-seen week, counted per offset week 0-3",
    tags=("behavior", "cohort", "agg", "timeseries"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort = Monday-truncated week of a user's first event; a user
    counts once per (cohort, offset) week they were active in. Both
    engines truncate weeks to Monday and compute the offset as whole
    days / 7 (exact: both endpoints are week starts). Two shuffles:
    the first-seen agg and the distinct — the cohort join rides the
    user_id clustering, and `first` is per-user thin so AQE broadcasts
    it against the event scan."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("w0"))
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "w0",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("w0"))
                / F.lit(7)
            ).cast("long").alias("k"),
        )
        .distinct()
    )
    return (
        act.where((F.col("k") >= 0) & (F.col("k") <= 3))
        .groupBy("w0", "k")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.date_format("w0", "yyyy-MM-dd").alias("cohort_week"),
            F.col("k").alias("week_offset"),
            "n_active",
        )
    )


@register(
    "pivot_event_type_daily",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)::BIGINT AS n_view,
           sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)::BIGINT AS n_click,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
           sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)::BIGINT AS n_signup,
           sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)::BIGINT AS n_error
    FROM events GROUP BY 1
    """,
    description="Pivot (long->wide): daily event counts, one column per event type",
    tags=("behavior", "pivot", "agg"),
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame pivot with EXPLICIT values — passing the value list
    skips the extra distinct-collection job Spark otherwise runs to
    discover pivot columns (a full scan saved at 100 TB; with AQE the
    implicit variant is also a shuffle). Absent (day, type) cells
    come back null from pivot and are coalesced to 0 to match the
    conditional-sum oracle."""
    types = ["view", "click", "purchase", "signup", "error"]
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
    )


@register(
    "sample_stratified_topn",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(doc_id::VARCHAR || 'strat-v1'), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, lang, rn FROM r WHERE rn <= 50
    """,
    description="Deterministic stratified sample: exactly min(n,50) docs per language by md5 order",
    tags=("sampling", "text", "window"),
)
def sample_stratified_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified sampling (min(n, 50) rows per language),
    ordered by a salted md5 of the id — deterministic across engines,
    runs, and partition layouts, unlike df.sample/sampleBy which are
    seed- and layout-dependent. The rank filter compiles to
    WindowGroupLimit, so each stratum is pruned at the window operator
    without materializing full per-stratum sorts downstream; the md5
    order key makes the "top 50" a uniform draw rather than an
    id-ordered prefix."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("strat-v1"))),
        F.col("doc_id"),
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 50)
    )


@register(
    "event_type_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_users
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    description="Market-basket co-occurrence: users performing both event types, per unordered type pair",
    tags=("behavior", "join", "agg"),
)
def event_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence via self-join of the DISTINCT (user, type) table —
    the distinct collapses the event stream to at most
    |users| x |types| rows BEFORE the join, so the pair blow-up is
    bounded by types^2 per user, never events^2. The `<` predicate
    halves the output (unordered pairs) and the join clusters on
    user_id, reusing the distinct's exchange."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
