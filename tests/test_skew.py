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


def test_salted_join_refuses_right_and_full_outer(spark):
    import pytest

    l = spark.createDataFrame([(1, "x")], "k long, s string")
    r = spark.createDataFrame([(2, 9)], "k long, v long")
    for how in ("right", "full", "right_outer", "fullouter"):
        with pytest.raises(ValueError, match="n_salts times"):
            salted_join(l, r, "k", salt_from="s", how=how)


def test_salted_aggregate_count_column_skips_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", None), (1, "c", 30)],
        "k long, s string, v long",
    )
    row = salted_aggregate(
        df, "k", {"n_rows": "count:*", "n_vals": "count:v"}, salt_col="s"
    ).collect()[0]
    assert row["n_rows"] == 3
    assert row["n_vals"] == 2  # NULL v not counted, matching F.count(v)
