"""Hypothesis property tests for interval expansion (SURVEY.md §5.2):
invariants must hold for ARBITRARY interval frames, not just the fixture.

Spark has high per-action overhead, so each hypothesis example is a small
frame and max_examples is kept low — breadth comes from the generator, not
the example count.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

from batch_processing_iac_aws_spark.operators.timeseries import expand_intervals

SCHEMA = StructType(
    [
        StructField("start_time", TimestampType()),
        StructField("end_time", TimestampType()),
        StructField("samples", IntegerType()),
        StructField("temperature", DoubleType()),
    ]
)

BASE = dt.datetime(2023, 7, 3)

interval_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),     # start offset (s)
        st.integers(min_value=0, max_value=10_000),     # duration (s)
        st.one_of(st.none(), st.integers(min_value=0, max_value=50)),
        st.floats(
            min_value=-50, max_value=50, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=0,
    max_size=8,
)


def _frame(spark, rows):
    data = [
        (
            BASE + dt.timedelta(seconds=off),
            BASE + dt.timedelta(seconds=off + dur),
            n,
            temp,
        )
        for off, dur, n, temp in rows
    ]
    return spark.createDataFrame(data, SCHEMA)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=interval_rows)
def test_row_count_is_sum_of_valid_samples(spark, rows):
    out = expand_intervals(_frame(spark, rows), mode="strict")
    expected = sum(n for _, _, n, _ in rows if n is not None and n >= 1)
    assert out.count() == expected


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=interval_rows)
def test_bounds_and_monotonicity(spark, rows):
    """Per input interval: first sample starts at start_time, last sample
    ends within 1us of end_time, and sample starts are non-decreasing."""
    df = _frame(spark, rows)
    out = (
        expand_intervals(
            df.withColumn("iid", F.monotonically_increasing_id()), mode="strict"
        )
        .orderBy("iid", "sample_idx")
        .collect()
    )
    by_iid: dict[int, list] = {}
    for r in out:
        by_iid.setdefault(r["iid"], []).append(r)
    inputs = {
        r["iid"]: r
        for r in df.withColumn("iid", F.monotonically_increasing_id()).collect()
    }
    for iid, group in by_iid.items():
        src = inputs[iid]
        assert group[0]["start_time"] == src["start_time"]
        assert abs(group[-1]["end_time"] - src["end_time"]) <= dt.timedelta(
            microseconds=1
        )
        starts = [g["start_time"] for g in group]
        assert starts == sorted(starts)
        assert [g["sample_idx"] for g in group] == list(range(len(group)))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    text=st.text(
        alphabet=st.sampled_from("ab c\t\n"), min_size=0, max_size=40
    )
)
def test_fingerprint_is_formatting_invariant(spark, text):
    """fingerprint() must collapse case and whitespace runs: any
    formatting-only variant of a doc collides with the original."""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.operators.text import fingerprint

    messy = "  " + text.upper().replace(" ", "   ") + "\t"
    df = spark.createDataFrame([(1, text), (2, messy)], "doc_id long, text string")
    fps = [r["fingerprint"] for r in fingerprint(df).collect()]
    assert fps[0] == fps[1]
