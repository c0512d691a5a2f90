"""asof_join tolerance (pandas merge_asof semantics): matches farther than
the tolerance revert to NULL right columns."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.operators.joins import asof_join


def test_backward_tolerance(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(hours=3))], "k int, lt timestamp"
    )
    right = spark.createDataFrame(
        [(1, t0 - dt.timedelta(minutes=2), "near")], "k int, rt timestamp, tag string"
    )
    out = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        tolerance=F.expr("INTERVAL 10 MINUTES"),
    )
    got = {r["lt"]: r["tag_right"] for r in out.collect()}
    assert got[t0] == "near"            # 2 min back: inside tolerance
    assert got[t0 + dt.timedelta(hours=3)] is None  # 3 h back: too far


def test_forward_tolerance_numeric(spark):
    left = spark.createDataFrame([(1, 100), (1, 200)], "k int, lt long")
    right = spark.createDataFrame([(1, 104, "a"), (1, 290, "b")],
                                  "k int, rt long, tag string")
    out = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        direction="forward", tolerance=F.lit(10),
    )
    got = {r["lt"]: r["tag_right"] for r in out.collect()}
    assert got[100] == "a"   # rt=104, distance 4 <= 10
    assert got[200] is None  # nearest forward rt=290, distance 90 > 10


def test_no_tolerance_unchanged(spark):
    left = spark.createDataFrame([(1, 100)], "k int, lt long")
    right = spark.createDataFrame([(1, 1, "old")], "k int, rt long, tag string")
    out = asof_join(left, right, on="k", left_ts="lt", right_ts="rt")
    assert out.first()["tag_right"] == "old"


def test_asof_fills_matched_row_as_a_unit(spark):
    """Review regression: per-column forward fill would replace a NULL
    attribute in the truly-matched right row with the attribute of an
    OLDER right row (outside tolerance) — the fill must move whole rows,
    like merge_asof."""
    right = spark.createDataFrame(
        [(1, 1, "old"), (1, 100, None)], "k long, rt long, tag string"
    )
    left = spark.createDataFrame([(1, 101)], "k long, lt long")
    row = asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt",
        direction="backward", tolerance=10,
    ).collect()[0]
    assert row["rt_right"] == 100
    assert row["tag_right"] is None  # NOT 'old' leaked from rt=1
