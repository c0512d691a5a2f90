"""Unit semantics for operators/quality.py: each audit primitive pinned on
tiny frames with planted violations (including the NULL-counts-as-violation
rule); the sf0.01 differential check is the registered data_quality_audit
oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.operators.quality import (
    check_counts,
    orphan_count,
    uniqueness_violations,
)


def test_check_counts_single_pass_and_null_rule(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 40.0)], ["k", "val"]
    )
    out = {
        r["check"]: r["n_violations"]
        for r in check_counts(
            df,
            {
                "val_nonneg": ~(F.col("val") >= 0),  # NULL -> violation
                "k_small": F.col("k") > 10,  # never trips
            },
        ).collect()
    }
    assert out == {"val_nonneg": 2, "k_small": 0}


def test_uniqueness_violations_counts_participating_rows(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (3,)], ["k"]
    )
    [row] = uniqueness_violations(df, ["k"], "k_unique").collect()
    assert (row["check"], row["n_violations"]) == ("k_unique", 5)


def test_uniqueness_violations_zero_on_unique(spark):
    df = spark.createDataFrame([(1,), (2,)], ["k"])
    [row] = uniqueness_violations(df, ["k"], "k_unique").collect()
    assert row["n_violations"] == 0


def test_orphan_count(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    [row] = orphan_count(
        child, parent, child_key="fk", parent_key="pk", name="fk_resolves"
    ).collect()
    assert (row["check"], row["n_violations"]) == ("fk_resolves", 2)


def test_winsorize_clips_and_counts(spark):
    from batch_processing_iac_aws_spark.plans.quality import stat_winsorize

    out = {r["l_returnflag"]: r for r in
           stat_winsorize(spark, "/root/testdata/sf0.001").collect()}
    for flag, r in out.items():
        assert r["p_lo"] < r["p_hi"]
        # ~10% of rows fall outside [p05, p95]
        assert 0 < r["n_clipped"] < 0.2 * r["n"]


def test_check_counts_empty_input_is_zero_not_null(spark):
    df = spark.createDataFrame([], "x long")
    rows = check_counts(df, {"x.null": F.col("x").isNull()}).collect()
    assert rows[0]["n_violations"] == 0  # NULL would fail == 0 gates


def test_check_counts_quoted_name_and_empty_dict(spark):
    import pytest

    df = spark.createDataFrame([(1,), (None,)], "x long")
    rows = check_counts(df, {"x can't be null": F.col("x").isNull()}).collect()
    assert rows[0]["check"] == "x can't be null"
    assert rows[0]["n_violations"] == 1
    with pytest.raises(ValueError):
        check_counts(df, {})
    with pytest.raises(ValueError):
        check_counts(df, {"bad`name": F.col("x").isNull()})


def test_orphan_count_exempts_null_foreign_keys(spark):
    child = spark.createDataFrame([(1,), (None,), (99,)], "fk long")
    parent = spark.createDataFrame([(1,)], "pk long")
    row = orphan_count(
        child, parent, child_key="fk", parent_key="pk", name="fk.resolves"
    ).collect()[0]
    assert row["n_violations"] == 1  # only 99; the NULL FK is exempt


def test_quality_logit_weights_as_data(spark):
    """The weights-file linear classifier: score must equal the pure-
    Python dot product on the same features (engine-exact — fixed
    expression tree of IEEE doubles), be partition-invariant, propagate
    NULL for unscorable docs, and REFUSE weights naming absent features
    (a silently dropped feature is a different model)."""
    import pytest as _pytest

    from batch_processing_iac_aws_spark.operators.quality import (
        load_quality_weights,
        quality_logit_score,
    )
    from batch_processing_iac_aws_spark.operators.text import (
        quality_features,
    )

    w = load_quality_weights("/root/repo/fixtures/quality_weights.tsv")
    assert w["bias"] == -1.5 and set(w) == {
        "bias", "n_tokens", "uniq_ratio", "avg_token_len"
    }
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "spark spark spark spark spark"),
        (3, ""),  # zero tokens -> NULL ratios -> NULL logit
    ]
    df = quality_features(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    got = {
        r["doc_id"]: r["quality_logit"]
        for r in quality_logit_score(df, w).collect()
    }
    feats = {
        r["doc_id"]: r.asDict() for r in df.collect()
    }
    for i in (1, 2):
        expect = w["bias"]
        for name in sorted(w):
            if name == "bias":
                continue
            expect = expect + w[name] * float(feats[i][name])
        assert got[i] == expect, (i, got[i], expect)
    assert got[3] is None
    # diverse doc 1 must outscore the repetition bomb doc 2
    assert got[1] > got[2]
    # partition invariance
    again = {
        r["doc_id"]: r["quality_logit"]
        for r in quality_logit_score(df.repartition(7), w).collect()
    }
    assert again == got
    with _pytest.raises(ValueError, match="no matching feature"):
        quality_logit_score(df, {"bias": 0.0, "nonexistent_feature": 1.0})
