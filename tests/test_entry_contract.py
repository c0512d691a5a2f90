"""Driver-contract probes beyond the smoke test: repeatability, clean
failure on a bad data dir, and idempotent view provisioning."""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException

from .conftest import SF_SMOKE


def test_entry_is_repeatable_in_one_session(spark):
    import __spark_entry__ as mod

    first = mod.entry(spark).count()
    second = mod.entry(spark).count()
    assert first == second > 0


def test_nonexistent_sf_dir_fails_cleanly(spark):
    """A wrong path must raise Spark's PATH_NOT_FOUND analysis error, not
    return an empty frame or crash the session."""
    import __spark_entry__ as mod

    q = mod.queries()["interval_expand"]
    with pytest.raises(AnalysisException):
        q(spark, "/root/testdata/sf-does-not-exist").count()
    # session still healthy afterwards
    assert mod.entry(spark).count() > 0


def test_ensure_views_is_idempotent(spark):
    from batch_processing_iac_aws_spark.catalog import ensure_views

    ensure_views(spark, SF_SMOKE)
    ensure_views(spark, SF_SMOKE)  # re-run must not fail
    assert spark.sql("SELECT count(*) FROM lineitem").first()[0] > 0
