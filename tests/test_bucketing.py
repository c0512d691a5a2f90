"""Bucketing: pre-partitioned tables joined WITHOUT a shuffle — the
co-located-join strategy for repeated large-large joins at 100 TB.

Both sides bucketed on the join key into the same bucket count means the
join's children already satisfy the required hash distribution: the plan
must contain zero shuffle Exchanges (only possibly sorts)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    import shutil
    from pathlib import Path

    from batch_processing_iac_aws_spark.catalog import load_table

    o = load_table(spark, SF, "orders")
    l = load_table(spark, SF, "lineitem")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    wh = Path(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"))
    for name, df, key in (("b_orders", o, "o_orderkey"), ("b_lineitem", l, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS bucketdemo.{name}")
        # the in-memory catalog is per-session, so a previous session's
        # managed-table directory survives DROP — remove it explicitly
        shutil.rmtree(wh / "bucketdemo.db" / name, ignore_errors=True)
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"bucketdemo.{name}")
        )
    yield "bucketdemo"
    shutil.rmtree(wh / "bucketdemo.db", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    o = spark.table(f"{warehouse}.b_orders")
    l = spark.table(f"{warehouse}.b_lineitem")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "o_totalprice", "l_quantity"
    )
    # at test scale the small side would broadcast (also shuffle-free, but
    # not what this test demonstrates) — force the sort-merge path the way
    # a fact x fact join at 100 TB would resolve
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    tree = plan.split("\n\n")[0]
    # both sides bucketed on the key into the same bucket count: the join's
    # distribution requirement is already satisfied -> zero Exchange
    assert "Exchange" not in tree, tree
    assert "SortMergeJoin" in tree, tree


def test_bucketed_join_correct(spark, warehouse):
    o = spark.table(f"{warehouse}.b_orders")
    l = spark.table(f"{warehouse}.b_lineitem")
    n_bucketed = l.join(o, l.l_orderkey == o.o_orderkey).count()

    from batch_processing_iac_aws_spark.catalog import load_table

    lo = load_table(spark, SF, "orders")
    ll = load_table(spark, SF, "lineitem")
    n_plain = ll.join(lo, ll.l_orderkey == lo.o_orderkey).count()
    assert n_bucketed == n_plain
