"""Extended TPC-H-style coverage, adapted to the driver schema (no partsupp
table, no commit/receipt dates — lateness is expressed against o_orderdate).

Same scale discipline as plans/relational.py: explicit F.broadcast only on
bounded frames (nation/region/filtered part/scalar aggregates) — customer
and supplier GROW with SF, so they ride autoBroadcastJoinThreshold + AQE —
filters on base columns (pushdown), deterministic tiebreakers on every
top-k, aliases identical to the DuckDB oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from .registry import money_sum, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join (lateness
    re-based on o_orderdate since the schema has no commit/receipt dates)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q7_nation_volume",
    oracle="""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
GROUP BY ns.n_name, nc.n_name, CAST(year(l.l_shipdate) AS INT)
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship year.
    Both nation joins broadcast; the pair filter lands after them so only
    two shuffles remain (lineitem x orders, final agg)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
WITH all_sales AS (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           l.l_extendedprice * (1 - l.l_discount) AS volume,
           ns.n_name AS supp_nation
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM all_sales GROUP BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue sold into
    ASIA customers, by order year. Conditional-sum ratio, single final agg."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle="""
SELECT ns.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - 0.5 * p.p_retailprice * l.l_quantity
                           AS DECIMAL(18, 6))), 2) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
JOIN part p     ON l.l_partkey = p.p_partkey
WHERE p.p_name LIKE '%widget%'
GROUP BY ns.n_name, CAST(year(o.o_orderdate) AS INT)
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation and year for one product
    family; supply cost proxied as 0.5 * p_retailprice (no partsupp table)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation")
    )
    # per-item cast to DECIMAL before summing: double-sum order differs
    # between engines and can flip the cent rounding; exact decimal
    # accumulation makes round(2) deterministic on both sides
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


@query(
    "q12_late_shipments",
    oracle="""
SELECT o.o_orderpriority,
       CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
       CAST(count(*) AS BIGINT) AS total_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: shipment lateness (>60 days after order) profiled by
    order priority — conditional counts in one aggregation."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late_count"),
            F.count(F.lit(1)).alias("total_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-02-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: PROMO revenue share in one ship month; part broadcast."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(round(r.total_rev, 2) AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The max-subquery
    becomes a rank-over-empty-partition on the (small) per-supplier agg —
    no second scan of lineitem."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,6)"
            )
        ).alias("total_rev")
    )
    w = Window.orderBy(F.col("total_rev").desc())
    top = revenue.withColumn("__rk", F.rank().over(w)).filter(F.col("__rk") == 1)
    return (
        # broadcast the single-digit-row `top` frame, not supplier (which
        # grows with SF): the big side stays in place, top ships to it
        F.broadcast(top).join(s, top.supplier_no == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
    )


@query(
    "q17_small_quantity",
    oracle="""
SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated avg subquery decorrelated into a per-part
    aggregate joined back (the small per-part frame broadcasts)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # restrict lineitem to the filtered brand's parts BEFORE the per-part
    # aggregate — the correlated avg only needs each part's own rows, so
    # the broadcast semi join prunes ~96% of the agg input at 100 TB
    l = l.join(
        F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    per_part = l.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), F.col("l_partkey") == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) / 7.0, 2))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q18_large_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 25
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold; the
    HAVING subquery is a semi join on the aggregated keys."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__sq"))
        .filter(F.col("__sq") > 250)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "__bk"),
               F.col("l_orderkey") == F.col("__bk"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(money_sum(F.col("l_quantity")).alias("sum_qty"))
        .withColumn("o_totalprice", F.round("o_totalprice", 2))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


@query(
    "q19_disjunctive",
    oracle="""
SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 15)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 25 AND 50
       AND l.l_quantity BETWEEN 25 AND 50)
""",
)
def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctive brand/size/quantity predicates —
    the classic OR-of-ANDs the optimizer must not turn into a cross join."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(25, 50)
            & F.col("l_quantity").between(25, 50)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@query(
    "q22_idle_customers",
    oracle="""
WITH rich AS (
    SELECT * FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
)
SELECT r.c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(round(sum(CAST(r.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
FROM rich r
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = r.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY r.c_mktsegment
""",
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no *recent*
    orders — scalar subquery (broadcast single row) + anti join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
WITH ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
),
mc AS (
    SELECT ps_partkey, min(ps_supplycost) AS min_cost
    FROM ps GROUP BY ps_partkey
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
       ps.ps_supplycost AS supplycost
FROM part p
JOIN ps ON ps.ps_partkey = p.p_partkey
JOIN mc ON mc.ps_partkey = ps.ps_partkey AND ps.ps_supplycost = mc.min_cost
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_size <= 15 AND p.p_type = 'SMALL'
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part. The schema has no
    partsupp, so the supply relation is derived from lineitem
    (min unit price per part x supplier) — the correlated MIN subquery is
    decorrelated into a per-part min + equality join (exact: min over
    identical IEEE doubles is bit-stable on both engines). Bounded sides
    (filtered part, nation) broadcast; supplier rides AQE; the only wide
    shuffles are the two lineitem aggregations, which reuse one
    (partkey, suppkey) partitioning."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    # push the part predicate BELOW the aggregation: a broadcast semi join
    # restricts lineitem to qualifying parts before the wide groupBy, so the
    # shuffle carries ~|selectivity| of the fact table instead of all of it
    # (per-part min cost only needs that part's own rows — safe to prune).
    # Catalyst can't infer this itself because the filter is on a joined
    # dimension, not a scan column.
    l = l.join(
        F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    ps = l.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    mc = ps.groupBy("ps_partkey").agg(F.min("ps_supplycost").alias("min_cost"))
    return (
        ps.join(
            mc,
            (ps.ps_partkey == mc.ps_partkey)
            & (ps.ps_supplycost == mc.min_cost),
        )
        .drop(mc.ps_partkey)
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .join(s, F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("ps_supplycost").alias("supplycost"),
        )
    )


@query(
    "q11_important_stock",
    oracle="""
WITH ps AS (
    SELECT l.l_partkey,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS value_d
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(round(value_d, 2) AS DOUBLE) AS value
FROM ps
WHERE value_d > (SELECT sum(value_d) * 0.002 FROM ps)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's supply value (lineitem stands in for partsupp). The HAVING
    threshold is a scalar aggregate broadcast against the per-part rollup;
    exact DECIMAL accumulation keeps the > comparison engine-order-proof."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    ps = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).alias("value_d"))
    )
    total = ps.agg((F.sum("value_d") * F.lit(0.002)).alias("__thr"))
    return (
        ps.join(F.broadcast(total))
        .filter(F.col("value_d") > F.col("__thr"))
        .select(
            "l_partkey", F.round("value_d", 2).cast("double").alias("value")
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
WITH c_orders AS (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer,
    zero-order customers included via the outer join (priority filter in
    the join condition, not WHERE, so it can't turn the join inner)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    c_orders = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q16_supplier_relationship",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#9'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size),
    excluding a denylist of suppliers (NOT IN -> left anti join against the
    negative-balance supplier set; AQE broadcasts it while it fits)."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    l = _t(spark, sf_dir, "lineitem")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_suppliers",
    oracle="""
WITH pq AS (
    SELECT l_partkey, l_suppkey,
           sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                     AND l_shipdate <  TIMESTAMP '1998-01-01'
                    THEN l_quantity ELSE 0 END) AS qty_1997,
           sum(l_quantity) AS qty_total
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
)
SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
FROM pq
JOIN part p     ON p.p_partkey = pq.l_partkey AND p.p_name LIKE 'red%'
JOIN supplier s ON s.s_suppkey = pq.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE pq.qty_1997 > 0.5 * pq.qty_total
""",
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved most of a part's volume in one
    year (availqty stands in as shipped quantity; quantities are integral
    doubles, so the sums are exact and the 0.5x comparison is stable).
    One lineitem aggregation; bounded sides (filtered part, nation)
    broadcast, supplier rides AQE."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    # prune lineitem to LIKE-matching parts before the wide rollup (the
    # share test is per (part, supplier) — other parts' rows are dead weight)
    l = l.join(
        F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
        "l_partkey",
        "left_semi",
    )
    in_1997 = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    pq = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0.0)).alias(
            "qty_1997"
        ),
        F.sum("l_quantity").alias("qty_total"),
    )
    return (
        pq.filter(F.col("qty_1997") > 0.5 * F.col("qty_total"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
WITH ls AS (
    SELECT l.l_orderkey, l.l_suppkey,
           max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 1 ELSE 0 END) AS is_late
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY l.l_orderkey, l.l_suppkey
),
po AS (
    SELECT l_orderkey,
           count(*)     AS n_supp,
           sum(is_late) AS n_late
    FROM ls GROUP BY l_orderkey
)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM ls
JOIN po ON ls.l_orderkey = po.l_orderkey
JOIN supplier s ON s.s_suppkey = ls.l_suppkey
WHERE ls.is_late = 1 AND po.n_supp > 1 AND po.n_late = 1
GROUP BY s.s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order (late = shipped >60d after order date; the schema
    has no commit/receipt dates). The EXISTS / NOT EXISTS self-joins are
    decorrelated into one per-(order, supplier) rollup plus a window over
    the order — one extra shuffle instead of two self-joins of lineitem."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    ls = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        ls.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter(
            (F.col("is_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
