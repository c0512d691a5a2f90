"""CDC / mutable-table surface: MERGE-INTO upsert apply and SCD2 history.

The changeset in ``merge_upsert`` is synthesized deterministically from
``customer`` (modulo gates) so the query is self-contained and the DuckDB
twin can state the exact same merge in ANSI SQL. ``scd2_history`` treats
``orders`` as a per-customer changelog of price versions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.merge import merge_changes, scd2_from_changelog, snapshot_diff
from .registry import money_sum, query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "merge_upsert",
    oracle="""
WITH target AS (
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_custkey % 3 != 0
),
changes AS (
    SELECT c_custkey,
           upper(c_name) AS c_name,
           -- halve in exact decimal (* 0.5 decimal literal — `/` would
           -- degrade to DOUBLE): cents/2 hits .005 midpoints, where
           -- binary-double rounding diverges between engines
           CAST(round(CAST(c_acctbal AS DECIMAL(18,6))
                      * CAST(0.5 AS DECIMAL(2,1)), 2) AS DOUBLE) AS acctbal,
           CASE WHEN c_custkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
    FROM customer WHERE c_custkey % 2 = 0
)
SELECT COALESCE(c.c_custkey, t.c_custkey) AS c_custkey,
       COALESCE(c.c_name, t.c_name) AS c_name,
       COALESCE(c.acctbal, t.acctbal) AS acctbal
FROM target t FULL OUTER JOIN changes c ON t.c_custkey = c.c_custkey
WHERE c.op IS NULL OR c.op != 'D'
""",
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO: apply a deterministic synthetic changeset (updates,
    inserts, deletes) to a customer snapshot via operators.merge.
    merge_changes — one full-outer shuffle join, zero UDFs. The snapshot is
    customers with custkey % 3 != 0; the changeset halves the balance and
    uppercases the name for even keys, deleting keys divisible by 7."""
    c = _t(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )
    changes = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.upper("c_name").alias("c_name"),
        # decimal * decimal(0.5) stays exact; both engines then round the
        # same .005 midpoint away from zero (HALF_UP)
        F.round(
            F.col("c_acctbal").cast("decimal(18,6)")
            * F.expr("CAST(0.5 AS DECIMAL(2,1))"),
            2,
        )
        .cast("double")
        .alias("acctbal"),
        F.when(F.col("c_custkey") % 7 == 0, "D").otherwise("U").alias("op"),
    )
    return merge_changes(target, changes, key="c_custkey")


@query(
    "scd2_history",
    oracle="""
SELECT o_custkey AS custkey,
       CAST(row_number() OVER w AS BIGINT) AS version,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w AS valid_to,
       round(o_totalprice, 2) AS price,
       (lead(o_orderdate) OVER w IS NULL) AS is_current
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD build: orders as a per-customer changelog of price
    versions, each valid until the next order date; latest is current.
    operators.merge.scd2_from_changelog — one key shuffle + in-partition
    lead window (no global sort)."""
    o = _t(spark, sf_dir, "orders")
    changes = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tie"),
        F.round("o_totalprice", 2).alias("price"),
    )
    out = scd2_from_changelog(
        changes, key="custkey", ts="ts", tiebreak="tie", attrs=["price"]
    )
    return out.select(
        "custkey", "version", "valid_from", "valid_to", "price", "is_current"
    )


@query(
    "snapshot_diff",
    oracle="""
WITH before AS (
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_custkey % 5 != 0
),
after AS (
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 11 = 0 THEN 0.0
                ELSE round(c_acctbal, 2) END AS acctbal
    FROM customer WHERE c_custkey % 4 != 0
)
SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
       CASE WHEN b.c_custkey IS NULL THEN 'added'
            WHEN a.c_custkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       -- WHOLE-image semantics, matching the operator's struct coalesce:
       -- changed/added rows carry the after-image (including its NULLs),
       -- removed rows the before-image — per-column COALESCE(a.c, b.c)
       -- would smuggle a before value into a changed row whose after
       -- column is legitimately NULL
       CASE WHEN a.c_custkey IS NULL THEN b.c_name ELSE a.c_name END
           AS c_name,
       CASE WHEN a.c_custkey IS NULL THEN b.acctbal ELSE a.acctbal END
           AS acctbal
FROM before b FULL OUTER JOIN after a ON b.c_custkey = a.c_custkey
WHERE b.c_custkey IS NULL OR a.c_custkey IS NULL
   OR a.c_name IS DISTINCT FROM b.c_name
   OR a.acctbal IS DISTINCT FROM b.acctbal
""",
)
def snapshot_diff_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (incremental re-publish): two deterministic customer
    snapshots — "after" drops keys % 4, adds back keys % 5, and zeroes the
    balance for keys % 11 — diffed into an added/removed/changed changeset
    via operators.merge.snapshot_diff: one full-outer join + one null-safe
    struct comparison, no per-column Python."""
    c = _t(spark, sf_dir, "customer")
    base = c.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal")
    )
    before = base.filter(F.col("c_custkey") % 5 != 0)
    after = base.filter(F.col("c_custkey") % 4 != 0).withColumn(
        "acctbal",
        F.when(F.col("c_custkey") % 11 == 0, F.lit(0.0)).otherwise(
            F.col("acctbal")
        ),
    )
    return snapshot_diff(before, after, key="c_custkey")


@query(
    "join_point_in_time",
    oracle="""
WITH scd AS (
    SELECT o_custkey AS custkey,
           CAST(row_number() OVER w AS BIGINT) AS version,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
), f AS (
    SELECT o.o_custkey AS custkey, l.l_shipdate AS ts,
           l.l_extendedprice AS price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT s.version,
       CAST(count(*) AS BIGINT) AS n_facts,
       CAST(round(sum(CAST(f.price AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS sum_price
FROM f JOIN scd s
  ON f.custkey = s.custkey
 AND f.ts >= s.valid_from
 AND (s.valid_to IS NULL OR f.ts < s.valid_to)
GROUP BY s.version
""",
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of-validity) lookup against an SCD2 dimension:
    every shipment joins the price version that was CURRENT at its ship
    date — [valid_from, valid_to) semantics, the query every
    correctly-versioned warehouse runs. Facts aggregate per version number.

    Scale shape: the SCD build is one key shuffle + lead window; the PIT
    join is an equi-join on the dimension key with the validity range as a
    residual filter — it shuffles on custkey like any fact-dim join (NO
    nested-loop: the range never becomes the join key). Each fact matches
    exactly one version by construction."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    changes = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("tie"),
    )
    scd = scd2_from_changelog(
        changes, key="custkey", ts="ts", tiebreak="tie", attrs=[]
    ).select("custkey", "version", "valid_from", "valid_to")
    f = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("custkey"),
        F.col("l_shipdate").alias("fact_ts"),
        F.col("l_extendedprice").alias("price"),
    )
    j = f.join(
        scd,
        (f.custkey == scd.custkey)
        & (F.col("fact_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("fact_ts") < F.col("valid_to"))),
    )
    return j.groupBy("version").agg(
        F.count(F.lit(1)).cast("long").alias("n_facts"),
        money_sum(F.col("price")).alias("sum_price"),
    )
