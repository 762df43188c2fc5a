"""Extended TPC-H-shape coverage over the testdata star schema.

Rounds out the §2.3/§2.4 relational surface with the classic query
shapes not yet exercised by queries/relational.py: single-block
filter-agg (Q6), nation-pair volume (Q7), conditional-aggregate market
share (Q8), top-returned-customers (Q10), promo share (Q14), argmax via
scalar subquery (Q15), IN-over-HAVING (Q18), disjunctive multi-predicate
join (Q19), plus schema-adapted shapes of Q2 (correlated min),
Q9 (profit rollup), Q20 (nested-aggregate semi join) and Q21
(last-shipping-supplier exists/not-exists). The testdata has no
partsupp table and no commit/receipt dates, so the adapted four keep
the plan SHAPE (correlated aggregates, nested semi joins,
per-group argmax) over the columns that exist.

Broadcast policy: ``F.broadcast`` hints appear ONLY on bounded frames —
nation/region dimensions and scalar (1-row) aggregates. Every side
derived from an SF-scaled table (lineitem/orders/customer/supplier/
part) is left UNHINTED: a forced hint overrides Spark's 64 MB
autoBroadcastJoinThreshold with no AQE fallback, so at 100x data it
OOMs the driver, while an unhinted plan lets AQE broadcast the side at
small SF (where it fits — measured no-op on local bench) and fall back
to a shuffle join + DPP/bucketing at scale. Every float aggregate is
rounded identically in the Spark builder and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_etl_pipeline_spark.queries.base import register
from crypto_etl_pipeline_spark.sources.tables import load_table

def _disc_price():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="Single-block filter + global agg (TPC-H Q6): pure scan pushdown",
    tags=("agg", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           date_part('year', l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
      JOIN orders    ON l_orderkey = o_orderkey
      JOIN customer  ON o_custkey  = c_custkey
      JOIN supplier  ON l_suppkey  = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY sn.n_name, cn.n_name, date_part('year', l_shipdate)
    """,
    description="Nation-pair shipping volume (TPC-H Q7): two dimension roles of one table",
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    cn = nat.select(F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation"))
    sn = nat.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cnk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_snk"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(_disc_price()), 4).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT date_part('year', o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem
        JOIN part      ON l_partkey = p_partkey
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
    )
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    description="Conditional-aggregate market share (TPC-H Q8): share of one nation's suppliers",
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = nat.select(F.col("n_nationkey").alias("_cnk"), F.col("n_regionkey").alias("_crk"))
    sn = nat.select(F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation"))
    vol = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_cnk"))
        .join(F.broadcast(region.select("r_regionkey")), F.col("_crk") == F.col("r_regionkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_snk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    share = F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0)) / F.sum("volume")
    return vol.groupBy("o_year").agg(F.round(share, 6).alias("mkt_share"))


@register(
    "q10_returned_item_customers",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(c_acctbal, 2) AS acctbal, n_name
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="Top customers by returned-item revenue (TPC-H Q10)",
    tags=("join", "topk"),
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        # 4-decimal rounding: disc-price sums are EXACT 4-decimal
        # values (2dp price x 2dp discount), so the 4-decimal grid has
        # no ties — a 2-decimal round would sit exactly on .xx5
        # boundaries where Spark (decimal-string HALF_UP) and DuckDB
        # (binary arithmetic) disagree
        .agg(F.round(F.sum(_disc_price()), 4).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.round("c_acctbal", 2).alias("acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
    description="Promo revenue percentage (TPC-H Q14): conditional agg over a month",
    tags=("join", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(0.0))
    return (
        li.join(part.select("p_partkey", "p_type"), li.l_partkey == F.col("p_partkey"))
        .agg(F.round(100.0 * promo / F.sum(_disc_price()), 6).alias("promo_revenue_pct"))
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    description="Argmax supplier via scalar subquery over an agg view (TPC-H Q15)",
    tags=("join", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    # revenue is rounded to 4 BEFORE the max-compare, so which supplier
    # is the argmax cannot flip on engine-dependent summation order
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_disc_price()), 4).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_mx"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("_mx"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o_totalprice, 2) AS totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
    description="IN over a HAVING-filtered aggregate (TPC-H Q18): large-volume orders",
    tags=("join", "subquery", "topk"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "_bok"), li.l_orderkey == F.col("_bok"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """,
    description="Disjunctive multi-predicate join (TPC-H Q19 shape)",
    tags=("join", "agg"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part.select("p_partkey", "p_brand", "p_size"), li.l_partkey == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 50) & F.col("l_quantity").between(20, 30))
    )
    return j.where(cond).agg(
        F.round(F.sum(_disc_price()), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q2_cheapest_supplier",
    oracle="""
    WITH offer AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS eff_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, min(eff_price) AS best_price
      FROM offer GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
           round(best_price, 2) AS best_unit_price
    FROM part
      JOIN best  ON p_partkey = best.l_partkey
      JOIN offer ON offer.l_partkey = p_partkey AND eff_price = best_price
      JOIN supplier ON s_suppkey = offer.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size = 10 AND p_type = 'SMALL'
    ORDER BY p_partkey, s_suppkey
    """,
    description="Correlated-min supplier selection (TPC-H Q2 shape, partsupp-free)",
    tags=("join", "subquery"),
)
def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2's shape without a partsupp table: the 'offer' is the minimum
    observed unit price per (part, supplier) in lineitem; the correlated
    subquery picks, per part, every supplier matching the per-part min.
    The min/equality compare is on the EXACT double (one division, bit-
    identical in both engines); rounding is output-only."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 10) & (F.col("p_type") == "SMALL")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    offer = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("eff_price")
    )
    best = offer.groupBy(F.col("l_partkey").alias("_bpk")).agg(
        F.min("eff_price").alias("best_price")
    )
    return (
        offer.join(best, (F.col("l_partkey") == F.col("_bpk")) & (F.col("eff_price") == F.col("best_price")))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            F.round("best_price", 2).alias("best_unit_price"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, date_part('year', o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.6 * p_retailprice * l_quantity), 4) AS profit
    FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, date_part('year', o_orderdate)
    """,
    description="Profit rollup by supplier nation and year (TPC-H Q9 shape; cost = 0.6 x retail)",
    tags=("join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 without partsupp.ps_supplycost: unit cost is modeled as
    0.6 * p_retailprice, keeping the 5-way join + nation/year rollup
    shape intact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = _disc_price() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part.select("p_partkey", "p_retailprice"), li.l_partkey == F.col("p_partkey"))
        .join(supp.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("profit"))
    )


@register(
    "q20_big_promo_suppliers",
    oracle="""
    WITH supp_part AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS sq
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_type = 'PROMO'
      GROUP BY l_suppkey, l_partkey
    ),
    part_tot AS (
      SELECT l_partkey, sum(sq) AS tq, count(*) AS n_supp
      FROM supp_part GROUP BY l_partkey
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier JOIN supp_part ON s_suppkey = l_suppkey
                  JOIN part_tot USING (l_partkey)
    WHERE sq * n_supp > 2.5 * tq
    ORDER BY s_suppkey
    """,
    description="Nested-aggregate semi join (TPC-H Q20 shape): dominant promo-part suppliers",
    tags=("join", "subquery"),
)
def q20_big_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than 2.5x the average per-supplier
    quantity of some PROMO part. The threshold is RELATIVE (scales with
    how many suppliers share a part), so the query stays non-empty and
    selective at every SF; quantities are small integral doubles and
    n_supp is an int — sums and the compare are exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    supp_part = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
    )
    part_tot = supp_part.groupBy(F.col("l_partkey").alias("_ptk")).agg(
        F.sum("sq").alias("tq"), F.count(F.lit(1)).alias("n_supp")
    )
    dominant = (
        supp_part.join(part_tot, F.col("l_partkey") == F.col("_ptk"))
        .where(F.col("sq") * F.col("n_supp") > 2.5 * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dominant, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_last_shipping_suppliers",
    oracle="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey, max(s_max) AS o_max,
             count(*) AS n_supp,
             sum(CASE WHEN s_max = mx THEN 1 ELSE 0 END) AS n_at_max
      FROM (SELECT *, max(s_max) OVER (PARTITION BY l_orderkey) AS mx FROM per_supp)
      GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM per_supp
      JOIN per_order USING (l_orderkey)
      JOIN supplier ON s_suppkey = l_suppkey
    WHERE s_max = o_max AND n_supp > 1 AND n_at_max = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    description="Sole-last-shipper per multi-supplier order (TPC-H Q21 shape: exists + not-exists)",
    tags=("join", "window", "topk"),
)
def q21_last_shipping_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 without commit/receipt dates: the 'blocking' supplier is the
    UNIQUE last shipper of a multi-supplier order (exists another
    supplier in the order; not exists another supplier shipping at the
    order's max shipdate). Window + agg formulation — no self-joins."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("s_max"))
    # n_at_max via a second compact agg over per_supp joined to o_max
    omax = per_supp.groupBy("l_orderkey").agg(
        F.max("s_max").alias("o_max"), F.count(F.lit(1)).alias("n_supp")
    )
    at_max = (
        per_supp.join(omax, "l_orderkey")
        .groupBy("l_orderkey", "o_max", "n_supp")
        .agg(F.sum(F.when(F.col("s_max") == F.col("o_max"), 1).otherwise(0)).alias("n_at_max"))
    )
    blocking = (
        per_supp.join(at_max, "l_orderkey")
        .where((F.col("s_max") == F.col("o_max")) & (F.col("n_supp") > 1) & (F.col("n_at_max") == 1))
    )
    return (
        blocking.join(supp, blocking.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q11_important_suppliers",
    oracle="""
    WITH sv AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS value
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, value
    FROM sv
    WHERE value > (
      SELECT round(sum(l_extendedprice * (1 - l_discount)) * 0.005, 4) FROM lineitem
    )
    ORDER BY value DESC, l_suppkey
    """,
    description="Value-concentration HAVING vs global-fraction scalar subquery (TPC-H Q11 shape, partsupp-free)",
    tags=("join", "agg", "subquery"),
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's signature: a grouped aggregate filtered against a SCALAR
    subquery over the SAME fact table (group value > fraction of the
    global total). Spark decorrelates this as one shared scan feeding
    two aggregates; the threshold side is a 1-row broadcast cross
    join, so the fact table is read once per aggregate and never
    re-shuffled for the comparison. BOTH compared quantities are
    rounded on the same 4-decimal grid so engine-side FP summation
    order cannot flip membership at the threshold boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    sv = li.groupBy("l_suppkey").agg(F.round(F.sum(_disc_price()), 4).alias("value"))
    thresh = li.agg(F.round(F.sum(_disc_price()) * F.lit(0.005), 4).alias("_t"))
    return (
        sv.crossJoin(F.broadcast(thresh))
        .where(F.col("value") > F.col("_t"))
        .select("l_suppkey", "value")
        .orderBy(F.desc("value"), F.asc("l_suppkey"))
    )


@register(
    "q12_linestatus_priority",
    oracle="""
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    description="IN-list filter + priority-split conditional counts (TPC-H Q12 shape, shipmode-free)",
    tags=("join", "agg"),
)
def q12_linestatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's shape — join the fact to orders, filter by an IN-list and
    a date range, then split counts by priority class in ONE
    conditional aggregation (never two passes). l_linestatus stands in
    for the absent l_shipmode; the filter pushes to the lineitem scan
    below the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            F.col("l_returnflag").isin("A", "R")
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    description="NOT-IN anti subquery + multi-key count-distinct rollup (TPC-H Q16 shape, partsupp-free)",
    tags=("join", "agg", "subquery"),
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16's shape: exclude a blacklist of suppliers with NOT IN
    (rewritten as LEFT ANTI — the blacklist is provably non-null here,
    so anti-join semantics match NOT IN), then count DISTINCT
    suppliers per (brand, type, size). Both joined sides are SF-scaled,
    so neither carries a hint (AQE broadcasts them at small SF);
    the count-distinct runs as Spark's two-phase partial-distinct
    aggregate, so the only wide shuffle carries (group keys, suppkey)
    pairs, already deduplicated map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    bad = supp.where(F.col("s_acctbal") < 0).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(
            part.where(
                (F.col("p_brand") != "Brand#1")
                & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
