"""Data-quality queries and the SQL entry point.

``sql_interface_q1`` proves the engine's second API surface: the same
plan expressed as SQL text over registered views — Catalyst compiles
both identically, and the oracle is shared with the DataFrame variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.queries.base import register
from crypto_etl_pipeline_spark.sources.tables import load_table


@register(
    "quality_completeness_events",
    oracle="""
    SELECT 'event_id' AS column, count(*) AS n, count(event_id) AS n_nonnull,
           round(count(event_id) * 1.0 / count(*), 6) AS ratio FROM events
    UNION ALL
    SELECT 'value', count(*), count(value),
           round(count(value) * 1.0 / count(*), 6) FROM events
    UNION ALL
    SELECT 'props', count(*), count(props),
           round(count(props) * 1.0 / count(*), 6) FROM events
    """,
    description="Per-column completeness ratios (the reference's prose SLO, measured)",
    tags=("quality",),
)
def quality_completeness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.operators.validate import completeness

    ev = load_table(spark, sf_dir, "events")
    return completeness(ev, ["event_id", "value", "props"])


@register(
    "quality_violations_orders",
    oracle="""
    WITH checked AS (
      SELECT o_orderkey,
             coalesce(o_totalprice > 0 AND o_totalprice < 490000, FALSE) AS ok_price,
             coalesce(o_orderstatus IN ('O','F','P'), FALSE)             AS ok_status
      FROM orders
    )
    SELECT o_orderkey,
           concat_ws(',',
             CASE WHEN NOT ok_price THEN 'price_in_range' END,
             CASE WHEN NOT ok_status THEN 'known_status' END) AS failed
    FROM checked
    WHERE NOT ok_price OR NOT ok_status
    """,
    description="Declarative row-validity checks; failing rows flagged with check names",
    tags=("quality",),
)
def quality_violations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.operators.validate import violations

    orders = load_table(spark, sf_dir, "orders")
    bad = violations(
        orders,
        {
            "price_in_range": (F.col("o_totalprice") > 0) & (F.col("o_totalprice") < 490_000),
            "known_status": F.col("o_orderstatus").isin("O", "F", "P"),
        },
    )
    return bad.select(
        "o_orderkey", F.array_join("failed_checks", ",").alias("failed")
    )


@register(
    "sql_interface_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                        AS sum_qty,
           round(avg(l_extendedprice), 4)                   AS avg_price,
           count(*)                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="Same engine, SQL surface: spark.sql over registered views",
    tags=("sql", "agg"),
)
def sql_interface_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.sources.tables import register_temp_views

    register_temp_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               count(*)                       AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "grouped_map_zscore",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER w) / stddev(value) OVER w, 6) AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    description="Grouped-map applyInPandas z-score == SQL window normalization",
    tags=("pandas-udf", "quality"),
)
def grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crypto_etl_pipeline_spark.operators.grouped import zscore_by_group

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    out = zscore_by_group(ev, "user_id", "value")
    return out.select("event_id", "user_id", F.round("zscore", 6).alias("zscore"))
