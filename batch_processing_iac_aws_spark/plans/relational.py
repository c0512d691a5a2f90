"""Relational operator surface (SURVEY.md §2B): TPC-H-style analytics, every
join type (incl. broadcast / semi / anti / non-equi range / as-of / interval
overlap), aggregation variants (distinct, approx, rollup/cube/grouping sets,
pivot), sort/limit, set ops, and subquery patterns.

Scale notes that apply throughout:
* only BOUNDED-size frames carry an explicit F.broadcast hint: region (5
  rows), nation (25 rows), and single-row/scalar aggregates. customer,
  supplier, and part GROW with scale factor (at TPC-H 100 TB customer is
  ~15 B rows) — a forced broadcast hint bypasses AQE's size check and OOMs
  executors, so those ride spark.sql.autoBroadcastJoinThreshold + AQE
  dynamic join selection instead: broadcast when small, shuffle join when
  not. tests/test_plans.py asserts no forced broadcast on scaling tables;
* filters are expressed on base columns before joins so Catalyst pushes them
  into the parquet scan (verified in tests/test_plans.py);
* every top-k uses a unique tiebreaker so results are deterministic under
  parallel execution.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import ensure_views, load_table
from ..operators.joins import asof_join
from .registry import money_sum, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# TPC-H-style analytics
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)  AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
       round(avg(l_quantity), 6)                                    AS avg_qty,
       round(avg(l_extendedprice), 6)                               AS avg_price,
       round(avg(l_discount), 6)                                    AS avg_disc,
       CAST(count(*) AS BIGINT)                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            money_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "q5_region_revenue",
    oracle="""
SELECT n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_top_customers",
    oracle="""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def q10_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


# --------------------------------------------------------------------------
# Join types
# --------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
SELECT o.o_orderkey, c.c_name, round(o.o_totalprice, 2) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", F.round("o_totalprice", 2).alias("total")
    )


@query(
    "join_left",
    oracle="""
SELECT c.c_custkey,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
       coalesce(CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE), 0.0) AS total_spend
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(money_sum(F.col("o_totalprice")), F.lit(0.0)).alias(
                "total_spend"
            ),
        )
    )


@query(
    "join_right",
    oracle="""
SELECT c.c_custkey, o.o_orderkey
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "o_orderkey"
    )


@query(
    "join_full",
    oracle="""
WITH cc AS (
    SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer GROUP BY c_nationkey
), ss AS (
    SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_suppliers
    FROM supplier GROUP BY s_nationkey
)
SELECT coalesce(cc.nk, ss.nk) AS nationkey, cc.n_customers, ss.n_suppliers
FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
""",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
SELECT p_partkey, p_name FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_partkey = p.p_partkey AND year(l.l_shipdate) = 1995
)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: parts never shipped in 1995."""
    l = _t(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1995)
    p = _t(spark, sf_dir, "part")
    return p.join(l, p.p_partkey == l.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@query(
    "join_cross",
    oracle="SELECT r.r_name, s.s_name FROM region r CROSS JOIN supplier s",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    s = _t(spark, sf_dir, "supplier")
    return r.crossJoin(s).select("r_name", "s_name")


@query(
    "join_range",
    oracle="""
SELECT e1.user_id, CAST(count(*) AS BIGINT) AS n_pairs
FROM events e1
JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts
 AND e2.ts <= e1.ts + INTERVAL 1 HOUR
GROUP BY e1.user_id
""",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join: event pairs within one hour, per user. The
    equi part (user_id) keeps this a hash/sort-merge join, not a cartesian;
    at scale, bucketing both sides by user_id makes it co-located."""
    e = _t(spark, sf_dir, "events")
    e1 = e.select(F.col("user_id"), F.col("ts").alias("ts1"))
    e2 = e.select(F.col("user_id").alias("user_id2"), F.col("ts").alias("ts2"))
    return (
        e1.join(
            e2,
            (e1.user_id == e2.user_id2)
            & (e2.ts2 > e1.ts1)
            & (e2.ts2 <= e1.ts1 + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_asof",
    oracle="""
SELECT p.event_id, p.user_id,
       epoch_us(p.ts) AS purchase_us,
       epoch_us(v.ts) AS view_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
)
def join_asof_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the latest view at-or-before it
    for the same user — implemented shuffle-once via union + window
    (operators/joins.py), the Spark-native pattern for point-in-time joins."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view")
    joined = asof_join(
        purchases,
        views.select("user_id", "ts"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("purchase_us"),
        F.unix_micros(F.col("ts_right").cast("timestamp")).alias("view_us"),
    )


@query(
    "join_interval_overlap",
    oracle="""
WITH a AS (
    SELECT user_id, min(ts) AS s, max(ts) AS e FROM events
    WHERE event_type = 'click' GROUP BY user_id
), b AS (
    SELECT user_id, min(ts) AS s, max(ts) AS e FROM events
    WHERE event_type = 'view' GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_overlaps
FROM a JOIN b ON a.user_id < b.user_id AND a.s < b.e AND b.s < a.e
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (a.start < b.end AND b.start < a.end) between
    per-user activity spans of two event types."""
    e = _t(spark, sf_dir, "events")

    def spans(etype: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        )

    a = spans("click").alias("a")
    b = spans("view").alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
    )


# --------------------------------------------------------------------------
# Aggregation variants
# --------------------------------------------------------------------------


@query(
    "agg_stats",
    oracle="""
SELECT CAST(count(*) AS BIGINT)            AS n_rows,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
       round(avg(l_extendedprice), 6)      AS avg_price,
       round(min(l_extendedprice), 2)      AS min_price,
       round(max(l_extendedprice), 2)      AS max_price,
       round(stddev_samp(l_quantity), 6)   AS sd_qty,
       round(var_samp(l_quantity), 6)      AS var_qty
FROM lineitem
""",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum(F.col("l_quantity")).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
    )


@query(
    "agg_count_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)  AS exact_parts,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders
FROM lineitem
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB substitute for exact
    countDistinct's full shuffle — with the accuracy contract made driver-
    checkable: the query computes BOTH sketch and exact counts in one
    aggregate and the row only survives if each estimate lands within 5%
    (2.5x the configured rsd=0.02) of truth. The oracle pins the exact
    values; a drifting sketch kills the row and the row-count check."""
    l = _t(spark, sf_dir, "lineitem")
    tol = 0.05
    agg = l.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    within = (
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        <= tol * F.col("exact_parts")
    ) & (
        F.abs(F.col("approx_orders") - F.col("exact_orders"))
        <= tol * F.col("exact_orders")
    )
    return agg.filter(within).select("exact_parts", "exact_orders")


@query(
    "table_profile",
    oracle="""
SELECT CAST(count(*) AS BIGINT)                    AS n_rows,
       CAST(count(DISTINCT l_orderkey) AS BIGINT)  AS n_orders,
       CAST(count(DISTINCT l_partkey) AS BIGINT)   AS n_parts,
       CAST(count(*) - count(l_returnflag) AS BIGINT) AS null_returnflag,
       round(min(l_extendedprice), 2)              AS min_price,
       round(max(l_extendedprice), 2)              AS max_price,
       round(avg(l_discount), 6)                   AS avg_discount,
       epoch_us(min(l_shipdate))                   AS first_ship_us,
       epoch_us(max(l_shipdate))                   AS last_ship_us
FROM lineitem
""",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data profiling (the SUMMARIZE feature): row count,
    per-column distinct/null counts, numeric ranges, string length bounds —
    ONE scan + one aggregation, all partials map-side combined. At 100 TB
    swap the exact countDistincts for approx_count_distinct (the HLL query
    family) to keep the shuffle payload constant."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        (F.count(F.lit(1)) - F.count("l_returnflag")).alias("null_returnflag"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
        F.unix_micros(F.min("l_shipdate").cast("timestamp")).alias(
            "first_ship_us"
        ),
        F.unix_micros(F.max("l_shipdate").cast("timestamp")).alias(
            "last_ship_us"
        ),
    )


@query(
    "agg_freq_items",
    oracle="""
WITH n AS (SELECT count(*) AS c FROM lineitem),
rf AS (
    SELECT l_returnflag AS v FROM lineitem, n
    GROUP BY v, c HAVING count(*) > 0.2 * c
),
ls AS (
    SELECT l_linestatus AS v FROM lineitem, n
    GROUP BY v, c HAVING count(*) > 0.2 * c
)
SELECT (SELECT array_to_string(list_sort(list(v)), ',') FROM rf)
           AS returnflag_heavy,
       (SELECT array_to_string(list_sort(list(v)), ',') FROM ls)
           AS linestatus_heavy
""",
)
def agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via df.stat.freqItems (Karp-Papadimitriou-Shenker):
    single pass, constant memory per column — the 100 TB answer to 'which
    values dominate this column' without a full groupBy+sort.

    The KPS guarantee is one-sided: every truly-frequent item IS present,
    false positives possible. That makes the invariant-oracle recipe work
    (dedup_minhash's pattern): intersect the sketch output with the exact
    > 20%-frequency set (computed alongside) — the guarantee makes the
    intersection EQUAL the exact set, which the oracle pins; a sketch that
    ever dropped a frequent item would go red. Sorted, comma-joined
    strings because the driver's pandas hash can't canonicalize ArrayType
    cells (registry.py rule; round-3 red row)."""
    l = _t(spark, sf_dir, "lineitem")
    tot = l.agg(F.count(F.lit(1)).alias("c"))
    fi = l.stat.freqItems(["l_returnflag", "l_linestatus"], support=0.2)

    def verified(col: str, fi_col: str, out: str) -> DataFrame:
        sketch_vals = fi.select(F.explode(fi_col).alias("v"))
        exact_vals = (
            l.groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(F.broadcast(tot))
            .filter(F.col("n") > 0.2 * F.col("c"))
            .select("v")
        )
        # nullif: an EMPTY heavy-hitter set must emit NULL, matching the
        # oracle's list() aggregate over zero rows (array_join over an
        # empty collect_list would emit '' and hash-mismatch)
        return sketch_vals.join(exact_vals, "v", "left_semi").agg(
            F.nullif(
                F.array_join(F.sort_array(F.collect_list("v")), ","),
                F.lit(""),
            ).alias(out)
        )

    return verified("l_returnflag", "l_returnflag_freqItems", "returnflag_heavy").crossJoin(
        verified("l_linestatus", "l_linestatus_freqItems", "linestatus_heavy")
    )


@query(
    "agg_quantile_bins",
    oracle="""
WITH b AS (
    SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bin,
           count(*) AS n
    FROM events GROUP BY 1, 2
),
c AS (
    SELECT event_type, bin, n,
           sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
           sum(n) OVER (PARTITION BY event_type) AS total
    FROM b
)
SELECT event_type,
       CAST(max(total) AS BIGINT) AS n_total,
       CAST(min(CASE WHEN cum >= ceil(0.5 * total) THEN bin END) * 5.0
            AS DOUBLE) AS p50_est,
       CAST(min(CASE WHEN cum >= ceil(0.95 * total) THEN bin END) * 5.0
            AS DOUBLE) AS p95_est
FROM c GROUP BY event_type
""",
)
def agg_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketch from fixed-width bin counts: the per-
    (group, bin) count table is the sketch — partials from any partition,
    day, or cluster merge by integer addition, and any quantile is then the
    first bin whose cumulative count crosses ceil(q*n), exact to bin width
    (here 5.0). Unlike percentile_approx's opaque internal state, the
    partials are plain rows you can persist and roll up incrementally
    (agg_hll_rollup's pattern, for quantiles) — and the whole plan is two
    hash aggregations plus a per-group window, fully deterministic, no
    doubles summed. Estimate-vs-exact error bound asserted in
    tests/test_sketches.py."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    binned = e.groupBy(
        "event_type", F.floor(F.col("value") / 5.0).alias("bin")
    ).agg(F.count(F.lit(1)).alias("n"))
    wcum = Window.partitionBy("event_type").orderBy("bin")
    wall = Window.partitionBy("event_type")
    c = binned.withColumn("cum", F.sum("n").over(wcum)).withColumn(
        "total", F.sum("n").over(wall)
    )
    return c.groupBy("event_type").agg(
        F.max("total").alias("n_total"),
        (
            F.min(F.when(F.col("cum") >= F.ceil(0.5 * F.col("total")), F.col("bin")))
            * 5.0
        ).alias("p50_est"),
        (
            F.min(F.when(F.col("cum") >= F.ceil(0.95 * F.col("total")), F.col("bin")))
            * 5.0
        ).alias("p95_est"),
    )


@query(
    "agg_hll_rollup",
    oracle="""
SELECT CAST(count(DISTINCT user_id) AS BIGINT)          AS exact_users,
       CAST(count(*) AS BIGINT)                         AS n_events,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
FROM events
""",
)
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count sketches (DataSketches HLL) — the 100 TB
    incremental pattern: per-day partial sketches are persisted once, then
    any cross-day rollup is a cheap hll_union_agg over sketch BYTES — no
    rescan of the fact table, and late partitions just union in.

    Accuracy contract driver-checkable (agg_approx_distinct's recipe): the
    merged-sketch estimate must land within 5% of the exact cross-day
    distinct count (computed alongside) or the output row dies; the oracle
    pins the exact user/event/day counts. Sketch bytes themselves stay
    non-portable, which is why the ESTIMATE is gated rather than hashed."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    rolled = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    return (
        rolled.crossJoin(exact)  # two single-row aggregates
        .filter(
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        )
        .select("exact_users", "n_events", "n_days")
    )


@query(
    "agg_rollup",
    oracle="""
SELECT n.n_name, c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(F.col("c_acctbal")).alias("sum_bal"),
        )
    )


@query(
    "agg_cube",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum(F.col("l_quantity")).alias("sum_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT n.n_name, c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name, c.c_mktsegment, count(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY GROUPING SETS ((n.n_name), (c.c_mktsegment), ())
        """
    )


@query(
    "pivot_status",
    oracle="""
SELECT c.c_mktsegment,
       CAST(count(*) FILTER (WHERE o.o_orderstatus = 'F') AS BIGINT) AS F,
       CAST(count(*) FILTER (WHERE o.o_orderstatus = 'O') AS BIGINT) AS O,
       CAST(count(*) FILTER (WHERE o.o_orderstatus = 'P') AS BIGINT) AS P
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .fillna(0, subset=["F", "O", "P"])
    )


# --------------------------------------------------------------------------
# Sort / limit / distinct / set ops
# --------------------------------------------------------------------------


@query(
    "sort_limit",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


@query(
    "distinct_set",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "union_all",
    oracle="""
SELECT nationkey, CAST(count(*) AS BIGINT) AS n
FROM (
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
)
GROUP BY nationkey
""",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
SELECT p_size FROM part WHERE p_size <= 30
EXCEPT
SELECT p_size FROM part WHERE p_size <= 20
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    a = p.filter(F.col("p_size") <= 30).select("p_size")
    b = p.filter(F.col("p_size") <= 20).select("p_size")
    return a.subtract(b)


@query(
    "set_except_all",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


# --------------------------------------------------------------------------
# Subquery patterns
# --------------------------------------------------------------------------


@query(
    "scalar_subquery",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_above,
       round(avg(o_totalprice), 4) AS avg_above
FROM orders
WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
""",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    mean = o.agg(F.avg("o_totalprice").alias("mean_price"))
    return (
        o.join(F.broadcast(mean))
        .filter(F.col("o_totalprice") > F.col("mean_price"))
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_above"),
        )
    )


@query(
    "in_subquery",
    oracle="""
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_nationkey IN (
    SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
)
GROUP BY c_mktsegment
""",
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey"
    )
    return (
        c.join(
            F.broadcast(asia_nations),
            c.c_nationkey == asia_nations.n_nationkey,
            "left_semi",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "agg_skew_salted",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a pathologically hot key space
    (l_returnflag has 3 values — every group IS a hot key): phase one
    spreads each key over 32 (key, salt) reducers, phase two merges. The
    oracle is the PLAIN group-by — salting must be invisible in results.
    l_quantity is integral, so the two-phase sum is exact (cast to BIGINT
    on both sides)."""
    from ..operators.skew import salted_aggregate

    l = _t(spark, sf_dir, "lineitem").withColumn(
        "__qty_long", F.col("l_quantity").cast("long")
    )
    return salted_aggregate(
        l,
        "l_returnflag",
        {"sum_qty": "sum:__qty_long", "n_rows": "count:*"},
        salt_col="l_orderkey",
        n_salts=32,
    ).select(
        "l_returnflag",
        F.col("sum_qty").cast("long").alias("sum_qty"),
        "n_rows",
    )


@query(
    "join_skew_salted",
    oracle="""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi-join: fact rows get a deterministic salt, the
    dimension side is replicated once per salt, and the join key becomes
    (key, salt) — one hot customer fans across 8 tasks instead of one.
    The oracle is the PLAIN join + group-by: salting is semantics-free."""
    from ..operators.skew import salted_join

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, "o_custkey", salt_from="o_orderkey", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total"),
    )


@query(
    "agg_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4)  AS p50_qty,
       round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
       round(quantile_cont(l_quantity, 0.75), 4) AS p75_qty,
       round(median(l_extendedprice), 4)         AS med_price
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics match
    DuckDB's quantile_cont). At 100 TB prefer approx_percentile — exact
    percentile keeps per-group value buffers."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("p25_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 4).alias("p75_qty"),
        F.round(F.median("l_extendedprice"), 4).alias("med_price"),
    )


@query(
    "agg_string_concat",
    oracle="""
SELECT c_mktsegment,
       string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY c_mktsegment
""",
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct string aggregation — collect_set + sort + join
    (deterministic regardless of task order)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "unpivot_measures",
    oracle="""
SELECT l_orderkey, l_linenumber, 'qty' AS measure,
       round(l_quantity, 2) AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'price', round(l_extendedprice, 2)
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', round(l_discount, 2)
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax', round(l_tax, 2) FROM lineitem
""",
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long reshape with DataFrame.unpivot (SQL UNPIVOT / melt):
    one output row per (row, measure). Map-only — the generator expands
    in-task, no shuffle, no UNION re-scan (the oracle's UNION ALL form
    scans lineitem 4x; unpivot scans once)."""
    l = _t(spark, sf_dir, "lineitem")
    renamed = l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    return renamed.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["qty", "price", "discount", "tax"],
        "measure",
        "__v",
    ).select(
        "l_orderkey", "l_linenumber", "measure", F.round("__v", 2).alias("value")
    )


@query(
    "sql_entrypoint",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
""",
)
def sql_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql(...) entry point: ensure_views registers every dataset
    as a temp view (the idempotent-bootstrap pattern replacing the
    reference's check-then-create provisioning, batch_processing_IaC.py:45-567)
    and the query is a plain SQL string through Catalyst's parser — same
    engine, same plan as the DataFrame API."""
    from ..catalog import ensure_views

    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
        """
    )


@query(
    "events_funnel",
    oracle="""
WITH v AS (
    SELECT user_id, min(ts) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_after_view,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_after_click
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential conversion funnel (first view -> later click -> later
    purchase) per user. Each stage joins events to the previous stage's
    per-user timestamps ON user_id and re-aggregates BY user_id — the join
    shuffle partitioning is reused by the groupBy, so each stage costs one
    exchange of the (shrinking) event subset, not two; stage frames shrink
    monotonically, and AQE picks broadcast for them when small."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_click")))
    )


@query(
    "agg_corr",
    oracle="""
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       round(covar_pop(l_quantity, l_discount), 8)       AS qty_disc_covar_pop
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / covariance) per return flag — both
    engines accumulate co-moments; rounding grids absorb the sub-ulp
    order drift of the partial-merge tree."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.covar_pop("l_quantity", "l_discount"), 8).alias(
            "qty_disc_covar_pop"
        ),
    )


@query(
    "histogram_prices",
    oracle="""
SELECT CAST(floor(l_extendedprice * 22 / 110000) + 1 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY bucket
""",
)
def histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via width_bucket — single map-side-combined
    aggregation, the scalable way to profile a 100 TB column (vs orderBy
    or percentile passes)."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.width_bucket("l_extendedprice", F.lit(0), F.lit(110000), F.lit(22))
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "timeseries_gapfill",
    oracle="""
WITH bounds AS (
    SELECT user_id,
           date_trunc('hour', min(ts)) AS t0,
           date_trunc('hour', max(ts)) AS t1
    FROM events GROUP BY user_id
), grid AS (
    SELECT user_id,
           unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_start
    FROM bounds
), actual AS (
    SELECT user_id, date_trunc('hour', ts) AS hour_start,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id, date_trunc('hour', ts)
)
SELECT g.user_id,
       epoch_us(g.hour_start) AS hour_us,
       coalesce(a.n_events, 0) AS n_events
FROM grid g
LEFT JOIN actual a
  ON a.user_id = g.user_id AND a.hour_start = g.hour_start
""",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample per user: a dense time grid generated
    with sequence+explode (the reference's own interval-expansion idiom,
    pyspark_skript/pyspark_script.py:80-105, turned into a resampler),
    left-joined with actual per-hour counts, gaps filled with 0. The grid
    generation is map-only over the tiny per-user bounds frame; the only
    wide shuffles are the two per-user aggs and the grid-to-actual join,
    all on (user_id, hour)."""
    e = _t(spark, sf_dir, "events")
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start"),
    )
    actual = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        grid.join(actual, ["user_id", "hour_start"], "left")
        .select(
            "user_id",
            F.unix_micros(F.col("hour_start").cast("timestamp")).alias("hour_us"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


@query(
    "agg_argminmax",
    oracle="""
SELECT l_returnflag,
       arg_max(l_orderkey, l_extendedprice) AS priciest_order,
       arg_min(l_orderkey, l_extendedprice) AS cheapest_order,
       round(max(l_extendedprice), 2)       AS max_price,
       round(min(l_extendedprice), 2)       AS min_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (argmax/argmin) aggregates — one pass, no window,
    no self-join; deterministic here because l_extendedprice has no ties
    at the extremes per group (both engines would otherwise pick an
    arbitrary row)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", "l_extendedprice").alias("priciest_order"),
        F.min_by("l_orderkey", "l_extendedprice").alias("cheapest_order"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
    )


@query(
    "agg_regression",
    oracle="""
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares via the SQL regr_* aggregate
    family (price regressed on quantity per returnflag). One hash-agg with
    map-side partials — the closed-form regression aggregates are the
    scalable way to fit millions of tiny per-key models (one pass, no ML
    library, no iteration)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 4
        ).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").cast("long").alias("n"),
    )


@query(
    "events_retention_cohorts",
    oracle="""
WITH cohort AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id,
           CAST(date_trunc('week', e.ts) AS DATE) AS active_week
    FROM events e
)
SELECT c.cohort_week,
       CAST(datediff('day', c.cohort_week, a.active_week) / 7 AS BIGINT)
           AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM cohort c JOIN activity a USING (user_id)
GROUP BY 1, 2
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, counted in
    each subsequent active week. Two hash-aggs on user_id (the second is
    a DISTINCT collapse), then one count per (cohort, offset). The cohort
    frame is user-cardinality — joins back on user_id, which AQE resolves
    to broadcast at small SF and shuffle join at fact scale. Week math is
    Monday-truncated dates on both engines, so offsets divide exactly."""
    e = _t(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("active_week")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "ts_time_weighted_avg",
    oracle="""
WITH pts AS (
    SELECT user_id, value, epoch_us(ts) AS t,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS t_next
    FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       round(CAST(sum(CAST(value * (t_next - t) AS DECIMAL(28,6))) AS DOUBLE)
             / sum(t_next - t), 4) AS twa_value
FROM pts WHERE t_next IS NOT NULL
GROUP BY user_id
""",
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (the hypertable-rollup aggregate): each
    reading weighted by how long it was current (until the next reading),
    per user. Irregularly-sampled sensors make plain avg() wrong — this is
    the correct integral / duration.

    One per-user window (lead) + one hash-agg. Timestamps go through
    exact integer microseconds (unix_micros / epoch_us — NOT float
    seconds), and the value*duration products accumulate as DECIMAL, so
    the result is identical under any partition order."""
    e = _t(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # ts arrives TIMESTAMP_NTZ; unix_micros needs TIMESTAMP. The NTZ->LTZ
    # cast applies the session timezone (UTC here), and durations are
    # offset-invariant anyway.
    t_us = F.unix_micros(F.col("ts").cast("timestamp"))
    pts = e.select(
        "user_id",
        "value",
        t_us.alias("t"),
        F.lead(t_us).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    dur = F.col("t_next") - F.col("t")
    return pts.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.round(
            F.sum((F.col("value") * dur).cast("decimal(28,6)")).cast("double")
            / F.sum(dur),
            4,
        ).alias("twa_value"),
    )


@query(
    "events_transition_matrix",
    oracle="""
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
), c AS (
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, next_type, CAST(n AS BIGINT) AS n_transitions,
       round(n * 1.0 / sum(n) OVER (PARTITION BY event_type), 6) AS prob
FROM c
""",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    P(next event type | current type). One per-user window (lead) + one
    hash-agg to a type×type frame (bounded: |types|²), then the row
    normalization is a window over that TINY aggregate — the heavy per-user
    sequencing shuffles once on user_id. Probabilities are exact integer
    ratios -> identical across engines."""
    from pyspark.sql import Window as W

    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wn = W.partitionBy("event_type")
    return c.select(
        "event_type",
        "next_type",
        F.col("n").cast("long").alias("n_transitions"),
        F.round(F.col("n") * 1.0 / F.sum("n").over(wn), 6).alias("prob"),
    )


@query(
    "events_rolling_distinct_users",
    oracle="""
WITH du AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
), days AS (
    SELECT DISTINCT d FROM du
)
SELECT days.d AS day,
       CAST(count(DISTINCT du.user_id) AS BIGINT) AS users_7d
FROM days JOIN du ON du.d >= days.d - 6 AND du.d <= days.d
GROUP BY days.d
""",
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the rolling-retention
    metric a plain window can't express (DISTINCT isn't valid in a range
    frame). Shape: collapse to the (day, user) incidence first (one
    hash-agg — the fact table is touched once), then a bounded band join
    (each incidence row lands in <= 7 day buckets) against the
    date-cardinality day spine, then an exact distinct count per day. At
    larger horizons swap the exact count for HLL partial merge
    (agg_hll_rollup's pattern)."""
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct().withColumnRenamed("d", "day")
    j = days.join(
        du,
        (F.col("d") >= F.date_sub(F.col("day"), 6))
        & (F.col("d") <= F.col("day")),
    )
    return j.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("users_7d")
    )


@query(
    "agg_mode",
    oracle="""
WITH c AS (
    SELECT l_returnflag, l_quantity, count(*) AS n
    FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, l_quantity AS mode_qty, CAST(n AS BIGINT) AS n_occurrences
FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY n DESC, l_quantity) AS rn
      FROM c)
WHERE rn = 1
""",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic most-frequent-value per group (built-in mode() leaves
    ties engine-defined, so this is the explicit two-agg form: value counts,
    then argmax with the smallest value as tie-break). Both aggs hash with
    map-side partials; the window runs over the value-cardinality frame,
    not the fact table."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("l_quantity")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").cast("long").alias("n_occurrences"),
        )
    )


@query(
    "agg_higher_moments",
    oracle="""
WITH m AS (
    SELECT l_returnflag, avg(l_quantity) AS mean
    FROM lineitem GROUP BY l_returnflag
), s AS (
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(pow(l.l_quantity - m.mean, 2)
                    AS DECIMAL(28,10))) AS DOUBLE) AS s2,
           CAST(sum(CAST(pow(l.l_quantity - m.mean, 3)
                    AS DECIMAL(28,10))) AS DOUBLE) AS s3,
           CAST(sum(CAST(pow(l.l_quantity - m.mean, 4)
                    AS DECIMAL(28,10))) AS DOUBLE) AS s4
    FROM lineitem l JOIN m USING (l_returnflag)
    GROUP BY l.l_returnflag
)
SELECT l_returnflag, n,
       round((s3 / n) / pow(s2 / n, 1.5), 6) AS skewness,
       round((s4 / n) / pow(s2 / n, 2) - 3.0, 6) AS kurtosis_excess
FROM s
""",
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis from explicit central-moment
    sums. The built-in skewness()/kurtosis() use different bias corrections
    across engines AND accumulate doubles in partition order; explicit
    decimal-accumulated power sums make the statistic identical everywhere
    (l_quantity is integer-valued, so the mean is exact). Two passes: a
    bounded mean frame broadcast back over the fact table, one moment agg."""
    li = _t(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(F.avg("l_quantity").alias("mean"))
    d = F.col("l_quantity") - F.col("mean")
    s = (
        li.join(F.broadcast(m), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.pow(d, 2).cast("decimal(28,10)")).cast("double").alias("s2"),
            F.sum(F.pow(d, 3).cast("decimal(28,10)")).cast("double").alias("s3"),
            F.sum(F.pow(d, 4).cast("decimal(28,10)")).cast("double").alias("s4"),
        )
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round((F.col("s3") / F.col("n")) / F.pow(F.col("s2") / F.col("n"), 1.5), 6).alias("skewness"),
        F.round((F.col("s4") / F.col("n")) / F.pow(F.col("s2") / F.col("n"), 2) - 3.0, 6).alias("kurtosis_excess"),
    )
