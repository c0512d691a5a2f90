"""Salting operators must produce results identical to their unsalted
equivalents (the whole point: same answer, different shuffle shape)."""

from __future__ import annotations

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.catalog import load_table
from batch_processing_iac_aws_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_direct(spark):
    e = load_table(spark, SF, "events")
    direct = {
        r["event_type"]: (r["n"], round(r["s"], 6), r["mn"], r["mx"])
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], round(r["s"], 6), r["mn"], r["mx"])
        for r in salted_aggregate(
            e,
            "event_type",
            {
                "n": "count:*",
                "s": "sum:value",
                "mn": "min:value",
                "mx": "max:value",
            },
            salt_col="event_id",
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_unsalted(spark):
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        o.join(c, "o_custkey")
        .select("o_orderkey", "c_name")
        .collect()
    )
    salted = (
        salted_join(o, c, "o_custkey", salt_from="o_orderkey", n_salts=4)
        .select("o_orderkey", "c_name")
        .collect()
    )
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_salted_aggregate_spreads_hot_key(spark):
    """The partial aggregation must actually split a hot key across salts."""
    df = spark.range(0, 10000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("v")), F.lit(8))
    )
    n_groups = salted.groupBy("k", "__salt").count().count()
    assert n_groups == 8  # one hot key -> eight partial groups
