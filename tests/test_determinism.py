"""Shuffle-width determinism: registered results must not depend on
partitioning. The money_sum/decimal-accumulation discipline exists exactly
so that re-running at a different parallelism (a different cluster!) gives
byte-identical answers — assert it by re-running representative queries
under a radically different shuffle width."""

from __future__ import annotations

import pytest

from batch_processing_iac_aws_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"

# one double-aggregating query per family: TPC-H money sums, windowed money
# sums, salted two-phase, corr co-moments, hash-gated sampling
REPRESENTATIVES = [
    "q1_pricing_summary",
    "window_tumbling",
    "agg_skew_salted",
    "agg_corr",
    "sample_deterministic",
    "join_left",
]


def _rows(spark, name):
    df = QUERIES[name](spark, SF)
    return sorted(map(str, df.collect()))


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_results_invariant_to_shuffle_width(spark, name):
    wide = _rows(spark, name)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        narrow = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert wide == narrow
