"""Distributed ranking must agree exactly with the single-task window
formulation — same numbers, scalable shuffle shape."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from batch_processing_iac_aws_spark.catalog import load_table
from batch_processing_iac_aws_spark.operators.ranking import (
    global_ntile,
    global_percent_rank,
    global_row_number,
)

SF = "/root/testdata/sf0.01"


def _window_expected(spark, fn):
    c = load_table(spark, SF, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return {r["c_custkey"]: r["x"] for r in c.select("c_custkey", fn(w).alias("x")).collect()}


def test_global_row_number_matches_window(spark):
    c = load_table(spark, SF, "customer")
    got = {
        r["c_custkey"]: r["rn"]
        for r in global_row_number(c, "c_acctbal", "c_custkey").collect()
    }
    exp = _window_expected(spark, lambda w: F.row_number().over(w))
    assert got == exp


def test_global_percent_rank_matches_window(spark):
    c = load_table(spark, SF, "customer")
    got = {
        r["c_custkey"]: round(r["pct_rank"], 9)
        for r in global_percent_rank(c, "c_acctbal", "c_custkey").collect()
    }
    exp = {
        k: round(v, 9)
        for k, v in _window_expected(
            spark, lambda w: F.percent_rank().over(w)
        ).items()
    }
    assert got == exp


def test_global_ntile_matches_window(spark):
    c = load_table(spark, SF, "customer")
    got = {
        r["c_custkey"]: r["tile"]
        for r in global_ntile(c, 4, "c_acctbal", "c_custkey").collect()
    }
    exp = _window_expected(spark, lambda w: F.ntile(4).over(w))
    assert got == exp


def test_no_single_task_window_in_plan(spark):
    c = load_table(spark, SF, "customer")
    df = global_row_number(c, "c_acctbal", "c_custkey")
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan.split("\n\n")[0]
