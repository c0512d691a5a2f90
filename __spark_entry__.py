"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship interval-expansion query on sf0.001 (smoke).
queries()    — every implemented operator from SURVEY.md §2, keyed by name.
oracle_sql() — DuckDB twins for the SQL-expressible subset (same column
               names + canonicalization; see plans/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from batch_processing_iac_aws_spark.plans import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["interval_expand"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
