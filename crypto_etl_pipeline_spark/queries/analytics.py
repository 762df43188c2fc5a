"""Analytics-surface queries: pivot, explode, date arithmetic,
deterministic sampling, cube, correlation, profiling.

These round out the §2.12 absence ledger — operators the reference
lacks entirely but a complete engine must offer. All are built-ins;
each SQL-expressible one carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.queries.base import register
from crypto_etl_pipeline_spark.sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "view")  # stable pivot columns


@register(
    "pivot_user_event_values",
    oracle="""
    SELECT user_id,
           round(coalesce(sum(CASE WHEN event_type = 'click'    THEN value END), 0), 4) AS click,
           round(coalesce(sum(CASE WHEN event_type = 'error'    THEN value END), 0), 4) AS error,
           round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 4) AS purchase,
           round(coalesce(sum(CASE WHEN event_type = 'view'     THEN value END), 0), 4) AS view
    FROM events
    GROUP BY user_id
    """,
    description="Pivot event_type -> columns (explicit value list, no extra scan)",
    tags=("analytics",),
)
def pivot_user_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Explicit pivot values: skips Spark's distinct-collection pre-scan
    # and fixes the output schema (required at scale and for the oracle).
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 4))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in EVENT_TYPES]
    )


@register(
    "explode_doc_tokens",
    oracle="""
    SELECT t.tok AS token, count(*) AS n
    FROM documents, LATERAL unnest(regexp_split_to_array(text, '\\s+')) AS t(tok)
    WHERE length(t.tok) >= 4
    GROUP BY t.tok
    HAVING count(*) >= 3
    """,
    description="explode(split(text)) token frequency (flatten + filter + agg)",
    tags=("analytics", "text"),
)
def explode_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("token"))
        .where(F.length("token") >= 4)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 3)
    )


@register(
    "date_shipping_delay",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_delay_days,
           max(date_diff('day', o_orderdate, l_shipdate))           AS max_delay_days
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    description="Date arithmetic: ship-vs-order day deltas by priority",
    tags=("analytics", "join"),
)
def date_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(delay), 4).alias("avg_delay_days"),
            F.max(delay).alias("max_delay_days"),
        )
    )


@register(
    "sample_by_key",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
    description="Deterministic 5% key-mod sample (reproducible, partition-prunable)",
    tags=("analytics",),
)
def sample_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Key-mod sampling is deterministic across engines and runs — unlike
    # df.sample(), whose RNG is partition-layout-dependent. At scale the
    # predicate pushes into the scan.
    orders = load_table(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice")
    )


@register(
    "cube_order_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')    AS orderstatus,
           coalesce(o_orderpriority, 'ALL')  AS orderpriority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="CUBE over two dims (all grouping-set combinations)",
    tags=("analytics", "agg"),
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "n",
            "total",
        )
    )


@register(
    "corr_lineitem_price_qty",
    oracle="""
    SELECT round(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
           round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc
    FROM lineitem
    """,
    description="Pearson correlations in one agg pass (profiling S5 component)",
    tags=("analytics", "stats"),
)
def corr_lineitem_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_price_qty"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("corr_price_disc"),
    )


@register(
    "profile_events_table",
    oracle=None,  # approx_count_distinct (HLL) differs per engine — rows-only
    description="Single-pass per-column profile (S5): nulls/distinct/stats/skew/kurtosis",
    tags=("profiling", "rows-only"),
)
def profile_events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.operators.profiling import profile

    return profile(load_table(spark, sf_dir, "events"))


@register(
    "grouping_sets_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS orderstatus,
           coalesce(o_orderpriority, 'ALL') AS orderpriority,
           grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS gid,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description="Explicit GROUPING SETS with grouping_id (two single-dim sets + grand total)",
    tags=("analytics", "agg"),
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed grouping sets — the shape rollup/cube can't express (each
    dim alone plus the grand total, no (status, priority) pairs).
    grouping_id disambiguates a real NULL key from a superaggregate
    row; one Expand + one hash agg, same partial/final split as any
    groupBy at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "gid",
            "n",
            "total",
        )
    )


@register(
    "json_extract_props_stats",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS n_with_k,
           round(avg(k), 6) AS avg_k,
           min(k) AS min_k, max(k) AS max_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type
    """,
    description="Semi-structured JSON extraction (from_json) + grouped stats over event props",
    tags=("json", "agg"),
)
def json_extract_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing of the props column via from_json with an
    explicit schema (never schema inference on the hot path — the
    parser is a codegen'd expression, one map-only pass at any scale),
    then grouped stats including a null-audit count."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0)).alias("n_with_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
