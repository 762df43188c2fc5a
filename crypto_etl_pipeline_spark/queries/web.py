"""URL-level curation queries (CCNet §2 / C4 dedup-by-URL; r13).

The documents table carries no URL column (TESTDATA.md), so — exactly
like the r12 unicode family synthesized its mixed encodings — these
queries DERIVE a deterministic crawl-shaped URL per (document, fetch
variant) identically in both engines, then exercise the real operator
(operators/urlops.canonical_url) on it. Fetch variant 0 is the clean
form; variant 1 is the same page refetched with every normalization
hazard at once: case-variant scheme+host, ``www.`` prefix, explicit
default port, trailing slash, shuffled query keys, tracking params,
and a fragment. Canonicalization must collapse each pair while keeping
distinct pages apart.

Reference: no URL surface anywhere in the reference (its only web
interaction is one REST GET, P:52-58) — north-star extension
(VERDICT r12 "worth adding" #1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.operators.urlops import canonical_url, canonical_url_sql
from crypto_etl_pipeline_spark.queries.base import register
from crypto_etl_pipeline_spark.sources.tables import load_table

#: host/path bucket moduli for the synthetic crawl — chosen non-coprime
#: with the 20-source cycle so a FEW distinct documents legitimately
#: share a canonical URL (the same-URL-different-content case a real
#: crawl has), exercising n_docs > 1 groups in dedup_by_url
_HOST_MOD = 40
_PATH_MOD = 25


def _url_cases() -> tuple[str, str]:
    """(clean, messy) SQL expressions for the synthetic URL, DuckDB
    dialect — doc_id and lang must be in scope."""
    hp = f"CAST(doc_id % {_HOST_MOD} AS VARCHAR)"
    pp = f"CAST(doc_id % {_PATH_MOD} AS VARCHAR)"
    clean = (
        f"'https://h' || {hp} || '.example.org/' || source || '/d' || {pp} "
        "|| '?a=1&b=' || lang"
    )
    messy = (
        f"'HTTPS://WWW.H' || {hp} || '.EXAMPLE.ORG:443/' || source || '/d' || {pp} "
        "|| '/?b=' || lang || '&utm_source=feed&a=1&gclid=x' "
        "|| CAST(doc_id AS VARCHAR) || '#s' || CAST(doc_id AS VARCHAR)"
    )
    return clean, messy


_URL_CLEAN_SQL, _URL_MESSY_SQL = _url_cases()

#: DuckDB CTE ``fetches(doc_id, lang, source, variant, url)`` — two
#: fetch variants per document, byte-identical to :func:`_fetches_df`
_FETCHES_CTE = f"""
    fetches AS (
      SELECT doc_id, lang, source, v.variant,
             CASE v.variant WHEN 0 THEN {_URL_CLEAN_SQL}
                            ELSE {_URL_MESSY_SQL} END AS url
      FROM documents CROSS JOIN (VALUES (0), (1)) v(variant)
    )
"""


def _fetches_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of :data:`_FETCHES_CTE`."""
    docs = load_table(spark, sf_dir, "documents")
    hp = (F.col("doc_id") % _HOST_MOD).cast("string")
    pp = (F.col("doc_id") % _PATH_MOD).cast("string")
    did = F.col("doc_id").cast("string")
    clean = F.concat(
        F.lit("https://h"), hp, F.lit(".example.org/"), F.col("source"),
        F.lit("/d"), pp, F.lit("?a=1&b="), F.col("lang"),
    )
    messy = F.concat(
        F.lit("HTTPS://WWW.H"), hp, F.lit(".EXAMPLE.ORG:443/"), F.col("source"),
        F.lit("/d"), pp, F.lit("/?b="), F.col("lang"),
        F.lit("&utm_source=feed&a=1&gclid=x"), did, F.lit("#s"), did,
    )
    variants = F.array(
        F.struct(F.lit(0).alias("variant"), clean.alias("url")),
        F.struct(F.lit(1).alias("variant"), messy.alias("url")),
    )
    return docs.select(
        "doc_id", "lang", "source", F.explode(variants).alias("v")
    ).select(
        "doc_id", "lang", "source",
        F.col("v.variant").alias("variant"), F.col("v.url").alias("url"),
    )


@register(
    "clean_url_canonicalize",
    oracle=f"""
    WITH {_FETCHES_CTE}
    SELECT doc_id, variant, url AS url_raw,
           {canonical_url_sql("url")} AS url_canon
    FROM fetches
    """,
    description="URL canonicalization: scheme/host case, www., default port, trailing slash, tracking params, fragment, query-key order",
    tags=("cleaning", "web"),
)
def clean_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per fetch: the raw URL and its canonical form. Pure map over
    the scan (zero shuffle) — at 100 TB this rides inside the ingest
    projection; the invariant that variant 0 and 1 of a document
    produce the SAME canonical string is what dedup_by_url keys on
    (asserted in tests/test_round13_ops.py)."""
    return _fetches_df(spark, sf_dir).select(
        "doc_id", "variant",
        F.col("url").alias("url_raw"),
        canonical_url(F.col("url")).alias("url_canon"),
    )


@register(
    "dedup_by_url",
    oracle=f"""
    WITH {_FETCHES_CTE}
    SELECT {canonical_url_sql("url")} AS url_canon,
           min(doc_id * 2 + variant) AS keep_key,
           count(*) AS n_fetches,
           count(DISTINCT doc_id) AS n_docs
    FROM fetches
    GROUP BY 1
    """,
    description="Per-URL dedup (CCNet step): group fetches by canonical URL, keep min-key representative, count refetches vs distinct docs",
    tags=("dedup", "web"),
)
def dedup_by_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet/C4 pre-content dedup: ONE hash shuffle on the
    canonical URL (computed map-side), min-key keeper per group —
    identical scale shape to fingerprint dedup, so the 100 TB posture
    is the same: no pair feed, no skew beyond hot hosts (which the
    n_fetches histogram surfaces for capping)."""
    f = _fetches_df(spark, sf_dir)
    return (
        f.select(
            canonical_url(F.col("url")).alias("url_canon"),
            (F.col("doc_id") * 2 + F.col("variant")).alias("k"),
            "doc_id",
        )
        .groupBy("url_canon")
        .agg(
            F.min("k").alias("keep_key"),
            F.count(F.lit(1)).alias("n_fetches"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@register(
    "web_host_profile",
    oracle=f"""
    WITH {_FETCHES_CTE},
    canon AS (
      SELECT doc_id, {canonical_url_sql("url")} AS c FROM fetches
    )
    SELECT regexp_extract(c, '^[a-z]+://([^/]*)', 1) AS host,
           count(*) AS n_fetches,
           count(DISTINCT c) AS n_urls,
           count(DISTINCT doc_id) AS n_docs
    FROM canon
    GROUP BY 1
    """,
    description="Per-host crawl profile over canonical URLs: fetch/url/doc counts (the host-cap planning signal)",
    tags=("web", "profiling"),
)
def web_host_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level rollup of the canonical crawl — the signal a
    curation pipeline caps on (cap_docs_per_source's web twin: hot
    hosts dominate real crawls). One dim-keyed groupBy; host
    cardinality is bounded (_HOST_MOD here, ~1e7 real-world), so the
    agg broadcasts fine downstream."""
    f = _fetches_df(spark, sf_dir)
    canon = f.select(
        "doc_id", canonical_url(F.col("url")).alias("c")
    )
    return (
        canon.select(
            F.regexp_extract("c", "^[a-z]+://([^/]*)", 1).alias("host"),
            "c",
            "doc_id",
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.countDistinct("c").alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


HOST_CAP = 20  #: max fetches kept per canonical host (C4 domain-cap twin)

_HOST_SQL = "regexp_extract({c}, '^[a-z]+://([^/]*)', 1)"


@register(
    "cap_fetches_per_host",
    oracle=f"""
    WITH {_FETCHES_CTE},
    canon AS (
      SELECT doc_id, variant, doc_id * 2 + variant AS fetch_key,
             {_HOST_SQL.format(c=canonical_url_sql("url"))} AS host
      FROM fetches
    ),
    ranked AS (
      SELECT doc_id, variant, host,
             row_number() OVER (
               PARTITION BY host
               ORDER BY ('0x' || substr(md5(fetch_key::VARCHAR || 'hostcap-v1'), 1, 15))::BIGINT
                          % 1000000, fetch_key) AS host_rank,
             count(*) OVER (PARTITION BY host) AS n_host
      FROM canon
    )
    SELECT doc_id, variant, host, host_rank, n_host,
           n_host > {HOST_CAP} AS cap_applied
    FROM ranked WHERE host_rank <= {HOST_CAP}
    """,
    description="Per-host fetch cap (C4 domain cap over canonical hosts): hash-ranked keep of at most N fetches per host, truncation observable",
    tags=("sampling", "web", "window"),
)
def cap_fetches_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The web twin of cap_docs_per_source: hot hosts dominate real
    crawls (web_host_profile is the planning signal; this is the
    enforcement). Keep at most HOST_CAP fetches per canonical host,
    chosen by md5 hash rank — deterministic and unbiased within the
    host. Same WindowGroupLimit bounded-heap shape as the source cap
    (each task keeps a cap-sized heap per host; nothing sorts a whole
    partition), and the same silent-cap discipline: cap_applied and
    n_host make every truncation observable."""
    from pyspark.sql.window import Window

    from crypto_etl_pipeline_spark.operators.sampling import hash_gate

    f = _fetches_df(spark, sf_dir)
    canon = f.select(
        "doc_id",
        "variant",
        (F.col("doc_id") * 2 + F.col("variant")).alias("fetch_key"),
        F.regexp_extract(
            canonical_url(F.col("url")), "^[a-z]+://([^/]*)", 1
        ).alias("host"),
    ).localCheckpoint(eager=False)
    w = Window.partitionBy("host").orderBy(
        hash_gate(F.col("fetch_key"), "hostcap-v1").asc(), F.asc("fetch_key")
    )
    wc = Window.partitionBy("host")
    return (
        canon.select(
            "doc_id",
            "variant",
            "host",
            F.row_number().over(w).alias("host_rank"),
            F.count(F.lit(1)).over(wc).alias("n_host"),
        )
        .where(F.col("host_rank") <= HOST_CAP)
        .select(
            "doc_id", "variant", "host", "host_rank", "n_host",
            (F.col("n_host") > HOST_CAP).alias("cap_applied"),
        )
    )
