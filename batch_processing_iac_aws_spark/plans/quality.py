"""Data-quality audit query: a whole-warehouse contract check as one
long-format table. Null rules and range rules fold into one aggregation
pass per table (operators/quality.check_counts); uniqueness and
referential integrity are single hash-agg / anti-join counts. The ranges
are chosen so some checks genuinely trip on TPC-H data (negative
``c_acctbal`` exists by spec) and others are genuinely zero — both sides
of the counter are exercised against the DuckDB oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.quality import check_counts, orphan_count, uniqueness_violations
from .registry import money_sum, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "data_quality_audit",
    oracle="""
SELECT 'customer.name_null' AS check,
       CAST(count(*) FILTER (WHERE c_name IS NULL) AS BIGINT) AS n_violations
FROM customer
UNION ALL
SELECT 'customer.acctbal_nonneg',
       CAST(count(*) FILTER (WHERE NOT c_acctbal >= 0
                                OR c_acctbal IS NULL) AS BIGINT)
FROM customer
UNION ALL
SELECT 'customer.key_unique', CAST(COALESCE(sum(n), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM customer GROUP BY c_custkey HAVING count(*) > 1)
UNION ALL
SELECT 'orders.date_in_range',
       CAST(count(*) FILTER (
            WHERE NOT (o_orderdate BETWEEN DATE '1992-01-01'
                                       AND DATE '1998-12-31')
               OR o_orderdate IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders.totalprice_positive',
       CAST(count(*) FILTER (WHERE NOT o_totalprice > 0
                                OR o_totalprice IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'orders.custkey_resolves',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem.discount_in_range',
       CAST(count(*) FILTER (WHERE NOT (l_discount BETWEEN 0.0 AND 0.1)
                                OR l_discount IS NULL) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'lineitem.line_unique', CAST(COALESCE(sum(n), 0) AS BIGINT)
FROM (SELECT count(*) AS n FROM lineitem
      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)
UNION ALL
SELECT 'lineitem.orderkey_resolves',
       CAST(count(*) AS BIGINT)
FROM lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
""",
)
def data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse contract audit in long form ``(check, n_violations)``:
    per-table null/range rules share one scan each; uniqueness and
    referential checks are single-shuffle counts. 9 rules, 5 jobs, zero
    collects — the shape that audits a 100 TB warehouse inside the
    ingest pipeline itself."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    parts = [
        check_counts(
            c,
            {
                "customer.name_null": F.col("c_name").isNull(),
                "customer.acctbal_nonneg": ~(F.col("c_acctbal") >= 0),
            },
        ),
        uniqueness_violations(c, ["c_custkey"], "customer.key_unique"),
        check_counts(
            o,
            {
                "orders.date_in_range": ~F.col("o_orderdate").between(
                    "1992-01-01", "1998-12-31"
                ),
                "orders.totalprice_positive": ~(F.col("o_totalprice") > 0),
            },
        ),
        orphan_count(
            o, c, child_key="o_custkey", parent_key="c_custkey",
            name="orders.custkey_resolves",
        ),
        check_counts(
            li,
            {
                "lineitem.discount_in_range": ~F.col("l_discount").between(
                    0.0, 0.1
                ),
            },
        ),
        uniqueness_violations(
            li, ["l_orderkey", "l_linenumber"], "lineitem.line_unique"
        ),
        orphan_count(
            li, o, child_key="l_orderkey", parent_key="o_orderkey",
            name="lineitem.orderkey_resolves",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "stat_winsorize",
    oracle="""
WITH pct AS (
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.05), 4) AS p_lo,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p_hi
    FROM lineitem GROUP BY l_returnflag
), clipped AS (
    SELECT l.l_returnflag, pct.p_lo, pct.p_hi, l.l_extendedprice AS orig,
           least(greatest(l.l_extendedprice, pct.p_lo), pct.p_hi) AS v
    FROM lineitem l JOIN pct USING (l_returnflag)
)
SELECT l_returnflag, p_lo, p_hi,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE orig < p_lo OR orig > p_hi) AS BIGINT)
           AS n_clipped,
       CAST(round(sum(CAST(v AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS sum_winsorized
FROM clipped GROUP BY l_returnflag, p_lo, p_hi
""",
)
def stat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust cleaning: winsorize l_extendedprice per returnflag at
    the exact [p05, p95] percentiles, reporting clip counts and the
    decimal-accumulated sum of the clipped column.

    Scale shape: percentile pass is one groupBy over a bounded key (3
    groups) whose 3-row result joins back via broadcast (bounded
    AGGREGATE frame — the forced-broadcast policy allows it); the clip +
    re-agg is a single map + hash-agg pass. Percentile thresholds are
    rounded to 4 decimals on BOTH engines before comparing/clipping so
    interpolation ulp differences cannot flip a clip decision. At 100 TB
    swap percentile -> approx_percentile (exact keeps per-group buffers)."""
    li = load_table(spark, sf_dir, "lineitem")
    pct = li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.05)), 4).alias("p_lo"),
        F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p_hi"),
    )
    clipped = li.join(F.broadcast(pct), "l_returnflag").withColumn(
        "__v",
        F.least(F.greatest(F.col("l_extendedprice"), F.col("p_lo")), F.col("p_hi")),
    )
    return clipped.groupBy("l_returnflag", "p_lo", "p_hi").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (
                (F.col("l_extendedprice") < F.col("p_lo"))
                | (F.col("l_extendedprice") > F.col("p_hi"))
            ).cast("long")
        ).alias("n_clipped"),
        money_sum(F.col("__v")).alias("sum_winsorized"),
    )


@query(
    "stat_robust_zscore",
    oracle="""
WITH med AS (
    SELECT l_returnflag, round(median(l_extendedprice), 4) AS med
    FROM lineitem GROUP BY l_returnflag
), dev AS (
    SELECT l.l_returnflag, med.med,
           abs(l.l_extendedprice - med.med) AS absdev
    FROM lineitem l JOIN med USING (l_returnflag)
), mad AS (
    SELECT l_returnflag, med, round(median(absdev), 4) AS mad
    FROM dev GROUP BY l_returnflag, med
)
SELECT d.l_returnflag, m.med, m.mad,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (WHERE 0.6745 * d.absdev / m.mad > 3.5)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.l_returnflag = m.l_returnflag
GROUP BY d.l_returnflag, m.med, m.mad
""",
)
def stat_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median/MAD z-scores (|0.6745·dev/MAD| >
    3.5, the standard modified z-score): mean/stddev break under the very
    outliers you hunt; median/MAD don't.

    Two exact-median passes over a bounded group key, each producing a
    3-row frame that joins back via broadcast (bounded AGGREGATE — the
    forced-broadcast policy allows it); medians are rounded to 4 decimals
    on both engines before the deviation pass so interpolation ulp can't
    flip a threshold comparison. At 100 TB swap median -> approx_percentile."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 4).alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "absdev", F.abs(F.col("l_extendedprice") - F.col("med"))
    )
    mad = dev.groupBy("l_returnflag", "med").agg(
        F.round(F.median("absdev"), 4).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad.select("l_returnflag", "mad")), "l_returnflag")
        .groupBy("l_returnflag", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                (F.lit(0.6745) * F.col("absdev") / F.col("mad") > 3.5).cast(
                    "long"
                )
            ).alias("n_outliers"),
        )
    )
