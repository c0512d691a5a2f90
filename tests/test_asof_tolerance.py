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


# --- fuzzy_join (record linkage, round 11) ----------------------------


def _link_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "acme corporation", "us"),
            (2, "globex inc", "us"),
            (3, "initech", "de"),
        ],
        "id long, name string, region string",
    )
    right = spark.createDataFrame(
        [
            (10, "acme corp oration", "us"),   # dist 1 to id 1
            (11, "acme corporationx", "us"),   # dist 1 to id 1 (tie dist)
            (12, "globex incorporated", "us"), # dist 9 to id 2 -> too far
            (13, "initech gmbh", "de"),        # dist 5 to id 3 -> too far
            (14, "completely different", "us"),
        ],
        "rid long, name string, region string",
    )
    return left, right


def test_fuzzy_join_best_match_threshold_and_ties(spark):
    """Blocking equi-join + integer-exact threshold + deterministic
    best-match: id 1 links to BOTH near matches but keeps the lower
    right id on the distance tie; ids 2/3 have candidates that fail the
    30% length-relative verify, so they are absent (compose an
    anti-join for the unmatched remainder)."""
    from batch_processing_iac_aws_spark.operators.joins import fuzzy_join

    left, right = _link_frames(spark)
    best = fuzzy_join(
        left, right, text_col="name", block_cols=["region"],
        left_id="id", right_id="rid", max_dist_frac=0.3, keep="best",
    ).collect()
    assert [(r["id"], r["rid"], r["dist"]) for r in best] == [(1, 10, 1)]
    allm = fuzzy_join(
        left, right, text_col="name", block_cols=["region"],
        left_id="id", right_id="rid", max_dist_frac=0.3, keep="all",
    )
    assert sorted(
        (r["id"], r["rid"]) for r in allm.collect()
    ) == [(1, 10), (1, 11)]
    # never a cartesian plan: blocking is an equi-join
    plan = allm._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    import pytest

    with pytest.raises(ValueError, match="keep must be"):
        fuzzy_join(
            left, right, text_col="name", block_cols=["region"],
            left_id="id", right_id="rid", keep="nope",
        )


def test_fuzzy_join_integer_threshold_boundary(spark):
    """The cross-multiplied threshold admits dist/maxlen == frac exactly
    (<=) and rejects one unit above — no float cast anywhere, so the
    boundary is the same in every engine."""
    from batch_processing_iac_aws_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [(1, "aaaaaaaaaa", "x")], "id long, name string, region string"
    )
    right = spark.createDataFrame(
        [(10, "aaaaaaabbb", "x"), (11, "aaaaaabbbb", "x")],
        "rid long, name string, region string",
    )
    # maxlen 10, frac 0.3 -> dist 3 in, dist 4 out
    got = fuzzy_join(
        left, right, text_col="name", block_cols=["region"],
        left_id="id", right_id="rid", max_dist_frac=0.3, keep="all",
    ).collect()
    assert [(r["rid"], r["dist"]) for r in got] == [(10, 3)]


def test_fuzzy_join_refuses_unblocked(spark):
    """No blocking keys = a cross join in disguise — refuse loudly."""
    import pytest

    from batch_processing_iac_aws_spark.operators.joins import fuzzy_join

    left, right = _link_frames(spark)
    with pytest.raises(ValueError, match="block_cols must be non-empty"):
        fuzzy_join(
            left, right, text_col="name", block_cols=[],
            left_id="id", right_id="rid",
        )
