"""Window-function surface (SURVEY.md §2B): ranking, lag/lead, running and
range-framed aggregates, ntile/percentiles, top-k per group.

Every window ORDER BY includes a unique tiebreaker column so rank/row_number
results are deterministic under parallel execution — ties are the classic
source of flaky distributed window results.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "window_rank",
    oracle="""
SELECT * FROM (
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS total,
           row_number() OVER w AS rn,
           rank()       OVER w AS rk,
           dense_rank() OVER w AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_lag_lead",
    oracle="""
SELECT user_id, event_id,
       epoch_us(ts) - lag(epoch_us(ts))  OVER w AS us_since_prev,
       lead(epoch_us(ts)) OVER w - epoch_us(ts) AS us_until_next
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        (F.col("us") - F.lag("us").over(w)).alias("us_since_prev"),
        (F.lead("us").over(w) - F.col("us")).alias("us_until_next"),
    )


@query(
    "window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
       CAST(count(*) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nth_order
FROM orders
""",
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("nth_order"),
    )


@query(
    "window_range_frame",
    oracle="""
SELECT event_id, user_id,
       CAST(count(*) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS events_last_24h
FROM events
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over epoch micros: events in the trailing 24 h per user —
    a value-based frame, not a row-count frame."""
    e = _t(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("events_last_24h"),
    )


@query(
    "window_ntile",
    oracle="""
SELECT c_custkey,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
""",
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIMENSION-ONLY demonstration of the SQL window form: an
    unpartitioned ORDER BY window funnels the whole input through ONE task.
    The DEFAULT path for anything that grows with the data is
    window_ntile_scalable / operators/ranking.py (global_row_number /
    global_ntile / global_percent_rank: range shuffle + per-partition
    offsets, bounded one-row-per-partition driver collect, verified equal
    to these window results in tests/test_ranking.py and by the shared
    oracle below)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           row_number() OVER (
               PARTITION BY p_brand
               ORDER BY p_retailprice DESC, p_partkey) AS rn
    FROM part
) WHERE rn <= 2
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via ranking window — the scalable alternative to a
    groupBy + sort + driver-side loop; one shuffle on the group key."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


@query(
    "window_ntile_scalable",
    oracle="""
SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer
""",
)
def window_ntile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fact-scale ntile path (operators/ranking.py): range shuffle +
    per-partition offsets, no single-task window — same oracle as the
    window formulation."""
    from ..operators.ranking import global_ntile

    c = _t(spark, sf_dir, "customer")
    return global_ntile(c, 4, "c_acctbal", "c_custkey", out="quartile").select(
        "c_custkey", "quartile"
    )


@query(
    "window_first_last",
    oracle="""
SELECT o_orderkey, o_custkey,
       first_value(o_orderkey) OVER w                  AS first_key,
       last_value(o_orderkey)  OVER w                  AS latest_key,
       nth_value(o_orderkey, 2) OVER w                 AS second_key,
       round(o_totalprice - first_value(o_totalprice) OVER w, 2)
                                                       AS delta_vs_first
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit growing frame
    per customer order history. The frame is UNBOUNDED PRECEDING..CURRENT
    ROW on BOTH sides (it is Spark's default but NOT DuckDB's for
    last_value, which defaults to a full-partition frame)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("latest_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        F.round(
            F.col("o_totalprice") - F.first("o_totalprice").over(w), 2
        ).alias("delta_vs_first"),
    )


@query(
    "window_percent_rank",
    oracle="""
SELECT s_nationkey, s_suppkey, s_acctbal,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
""",
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions: percent_rank ((rank-1)/(n-1))
    and cume_dist per nation over supplier account balance. The order key
    includes s_suppkey so every rank is unique -> both ratios are exact
    rationals, deterministic under any partitioning. One hash shuffle on
    the (bounded-cardinality) nation key."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_nationkey",
        "s_suppkey",
        "s_acctbal",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
