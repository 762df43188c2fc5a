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


@register(
    "quality_rule_report",
    oracle="""
    SELECT 'quantity_in_range' AS rule,
           sum(CASE WHEN NOT coalesce(l_quantity >= 1 AND l_quantity <= 50, FALSE)
                    THEN 1 ELSE 0 END)::BIGINT AS n_violations
    FROM lineitem
    UNION ALL
    SELECT 'price_positive',
           sum(CASE WHEN NOT coalesce(l_extendedprice > 0, FALSE)
                    THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'discount_bounded',
           sum(CASE WHEN NOT coalesce(l_discount >= 0 AND l_discount <= 0.1, FALSE)
                    THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'returnflag_known',
           sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R'), FALSE)
                    THEN 1 ELSE 0 END)::BIGINT
    FROM lineitem
    UNION ALL
    SELECT 'orderkey_references_orders',
           count(*)::BIGINT
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    """,
    description="Data-contract report: N declarative rules counted in one scan + referential-integrity anti-join",
    tags=("quality", "agg", "join"),
)
def quality_rule_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly data-contract shape: every value rule is a conditional
    sum inside ONE aggregate pass over the fact table (N rules never
    cost N scans), unpivoted to long form with stack(); the FK rule is
    a key-projected LEFT ANTI join appended by union. Null predicate
    results count as violations (unknown validity is not validity)."""
    from crypto_etl_pipeline_spark.operators.validate import fk_orphan_count, rule_report

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rules = rule_report(
        li,
        {
            "quantity_in_range": (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50),
            "price_positive": F.col("l_extendedprice") > 0,
            "discount_bounded": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1),
            "returnflag_known": F.col("l_returnflag").isin("A", "N", "R"),
        },
    )
    fk = fk_orphan_count(li, "l_orderkey", orders, "o_orderkey", "orderkey_references_orders")
    return rules.unionByName(fk)


@register(
    "json_roundtrip_documents",
    oracle=f"""
    SELECT lang,
           count(*)                 AS n_docs,
           sum(n_chars)::BIGINT     AS total_chars,
           sum(('0x' || substr(md5(text), 1, 11))::BIGINT)::BIGINT AS text_checksum
    FROM documents
    GROUP BY lang
    """,
    description="JSONL sink->source round-trip fidelity: per-lang md5 checksum of text survives serialization",
    tags=("source", "sink", "json", "agg"),
)
def json_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writes the documents table to JSON Lines, reads it back with an
    explicit schema (never inference — a malformed corpus must fail
    loudly, not re-type silently), and aggregates a per-language md5
    checksum of the text. The oracle computes the same checksum from
    the ORIGINAL parquet, so a green row proves byte-level fidelity of
    the JSON escape/unescape path for real corpus text (embedded
    quotes, newlines, unicode). The md5-prefix length (11 hex chars)
    keeps the per-lang sum far under int64 even at sf1."""
    import tempfile

    from crypto_etl_pipeline_spark.operators.phash import md5_long

    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="docs_jsonl_")
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(md5_long(F.col("text"), 11)).alias("text_checksum"),
    )


@register(
    "ndjson_sink_roundtrip",
    oracle="""
    SELECT lang,
           count(*)             AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           sum(('0x' || substr(md5(text), 1, 11))::BIGINT)::BIGINT AS text_checksum
    FROM documents
    GROUP BY lang
    """,
    description="Custom Python DataSource writer round-trip: two-phase-commit NDJSON sink, checksum vs original parquet",
    tags=("sink", "json", "agg", "datasource"),
)
def ndjson_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the ndjson_sink Python DataSource WRITER end to end:
    documents -> staged part files -> driver commit (manifest) ->
    read-back -> per-lang md5 checksum equal to the ORIGINAL parquet's.
    Proves the custom sink's write/commit path loses nothing, the same
    way json_roundtrip_documents proves the built-in JSON codec."""
    import os
    import tempfile

    from crypto_etl_pipeline_spark.operators.phash import md5_long
    from crypto_etl_pipeline_spark.sources.ndjson_sink import NdjsonSinkDataSource

    spark.dataSource.register(NdjsonSinkDataSource)
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="ndjson_sink_")
    docs.write.format("ndjson_sink").mode("overwrite").option("path", out).save()
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(os.path.join(out, "part-*.ndjson"))
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(md5_long(F.col("text"), 11)).alias("text_checksum"),
    )
