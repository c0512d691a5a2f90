"""Unit semantics for operators/merge.py (MERGE INTO + SCD2) on tiny
hand-built frames — each CDC outcome (update, insert, delete,
delete-of-absent-key, untouched) pinned individually; the sf0.01
differential check is the registered merge_upsert / scd2_history oracles."""

from __future__ import annotations

import datetime

import pytest

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.operators.merge import (
    merge_changes,
    scd2_from_changelog,
    snapshot_diff,
)


def test_merge_changes_outcomes(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "name", "val"],
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 22.0, "U"),  # matched update
            (3, None, 0.0, "D"),  # matched delete
            (4, "d", 40.0, "U"),  # unmatched insert
            (5, None, 0.0, "D"),  # delete of absent key: no-op
        ],
        ["k", "name", "val", "op"],
    )
    got = {
        r["k"]: (r["name"], r["val"])
        for r in merge_changes(target, changes, key="k").collect()
    }
    assert got == {1: ("a", 10.0), 2: ("b2", 22.0), 4: ("d", 40.0)}


def test_merge_changes_requires_full_column_set(spark):
    target = spark.createDataFrame([(1, "a")], ["k", "name"])
    changes = spark.createDataFrame([(1, "U")], ["k", "op"])
    with pytest.raises(ValueError, match="missing target columns"):
        merge_changes(target, changes, key="k")


def test_scd2_versions_and_current_flag(spark):
    d = datetime.date
    changes = spark.createDataFrame(
        [
            (1, d(2024, 1, 1), 1, 10.0),
            (1, d(2024, 2, 1), 2, 11.0),
            # same-day pair: tiebreak orders them; first version zero-length
            (2, d(2024, 1, 5), 1, 20.0),
            (2, d(2024, 1, 5), 2, 21.0),
        ],
        ["k", "ts", "tie", "price"],
    )
    out = scd2_from_changelog(
        changes, key="k", ts="ts", tiebreak="tie", attrs=["price"]
    )
    rows = {
        (r["k"], r["version"]): (
            r["valid_from"],
            r["valid_to"],
            r["price"],
            r["is_current"],
        )
        for r in out.collect()
    }
    assert len(rows) == 4  # version count == change count (idempotent)
    assert rows[(1, 1)] == (d(2024, 1, 1), d(2024, 2, 1), 10.0, False)
    assert rows[(1, 2)] == (d(2024, 2, 1), None, 11.0, True)
    # zero-length same-day version kept, deterministic via tiebreak
    assert rows[(2, 1)] == (d(2024, 1, 5), d(2024, 1, 5), 20.0, False)
    assert rows[(2, 2)] == (d(2024, 1, 5), None, 21.0, True)
    # exactly one current version per key
    cur = [k for (k, _v), (_f, to, _p, c) in rows.items() if c]
    assert sorted(cur) == [1, 2]


def test_snapshot_diff_classifies_changes(spark):
    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", None)],
        ["k", "name", "val"],
    )
    after = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 21.0), (5, "e", 50.0), (4, "d", None)],
        ["k", "name", "val"],
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(before, after, key="k").collect()
    }
    # k=1 unchanged and k=4 null-equal unchanged -> absent from the diff
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_applied_to_before_reproduces_after(spark):
    """The docstring's inverse claim: merge_changes(A, diff(A, B)) == B."""
    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "name", "val"],
    )
    after = spark.createDataFrame(
        [(2, "b2", 22.0), (3, "c", 30.0), (9, "z", 90.0)],
        ["k", "name", "val"],
    )
    diff = snapshot_diff(before, after, key="k").withColumn(
        "op", F.when(F.col("change_type") == "removed", "D").otherwise("U")
    )
    rebuilt = merge_changes(before, diff, key="k")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, after.collect())
    )


def test_snapshot_diff_rejects_schema_mismatch(spark):
    a = spark.createDataFrame([(1, "a")], ["k", "name"])
    b = spark.createDataFrame([(1, 2.0)], ["k", "val"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="share one schema"):
        snapshot_diff(a, b, key="k")


def test_merge_changes_null_op_fails_loudly(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "b", None)], "k long, v string, op string"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        merge_changes(target, changes, key="k").collect()


def test_merge_changes_plan_has_no_full_outer_join(spark):
    """The broadcastability fix: the merge must be anti-join + union
    (both broadcast-capable on the changes side), never a FULL OUTER
    join (no broadcast build side exists for it in Spark)."""
    target = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(2, "b", "U")], "k long, v string, op string"
    )
    plan = merge_changes(target, changes, key="k")._jdf.queryExecution().toString()
    assert "FullOuter" not in plan
    assert "LeftAnti" in plan
