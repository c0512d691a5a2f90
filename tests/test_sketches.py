"""Quantitative bounds for sketch-based aggregates (the rows-only ops the
DuckDB oracle can't hash-match): the estimate must land within the
configured error envelope of the exact answer."""

from __future__ import annotations

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    l = load_table(spark, SF, "lineitem")
    row = l.agg(
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    # rsd=0.05 is one standard deviation; 3 sigma is a safe deterministic
    # bound for a fixed dataset (the sketch itself is deterministic)
    assert abs(row["approx"] - row["exact"]) <= 0.15 * row["exact"]


def test_approx_percentile_brackets_exact(spark):
    l = load_table(spark, SF, "lineitem")
    row = l.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_med"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_med"),
    ).collect()[0]
    assert abs(row["approx_med"] - row["exact_med"]) <= 0.02 * row["exact_med"]


def test_cluster_conf_scales_with_fleet():
    from batch_processing_iac_aws_spark.session import cluster_conf

    conf = cluster_conf(executors=1000, cores_per_executor=4)
    assert conf["spark.sql.shuffle.partitions"] == str(3 * 1000 * 4)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    small = cluster_conf(executors=10, cores_per_executor=8)
    assert small["spark.sql.shuffle.partitions"] == str(3 * 10 * 8)


def test_hll_rollup_matches_exact_and_merges(spark):
    """The per-day-sketch union must estimate the same cardinality as a
    direct whole-table sketch (merge correctness) and land within 5% of
    exact (accuracy) — which is also the gate the registered query applies
    before emitting its (now exact-valued) summary row."""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.catalog import load_table
    from batch_processing_iac_aws_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    e = load_table(spark, sf, "events")
    exact = e.select(F.countDistinct("user_id").alias("n")).first()["n"]
    direct = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n")
    ).first()["n"]
    merged = (
        e.groupBy(F.to_date("ts").alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n"))
        .first()["n"]
    )
    assert merged == direct  # union of partials == one pass
    assert abs(merged - exact) / exact < 0.05
    # the registered query gates on that 5% tolerance; its row must
    # survive and carry the exact values the oracle pins
    row = QUERIES["agg_hll_rollup"](spark, sf).first()
    assert row is not None and row["exact_users"] == exact
    assert row["n_events"] == e.count()


def test_quantile_bins_within_bin_width_of_exact(spark, duck):
    """The binned-quantile estimate is the lower edge of the bin where the
    cumulative count crosses ceil(q*n), so it can sit at most one bin width
    (5.0) below the exact quantile and never above it."""
    from batch_processing_iac_aws_spark.plans import QUERIES

    rows = {
        r["event_type"]: r
        for r in QUERIES["agg_quantile_bins"](spark, "/root/testdata/sf0.01").collect()
    }
    for et, q, col in [
        (et, q, col)
        for et in rows
        for q, col in ((0.5, "p50_est"), (0.95, "p95_est"))
    ]:
        exact = duck.execute(
            "SELECT quantile_disc(value, ?) FROM events WHERE event_type = ?",
            [q, et],
        ).fetchone()[0]
        est = rows[et][col]
        assert est <= exact <= est + 5.0, (et, q, est, exact)


def test_freq_items_contains_all_true_heavy_hitters(spark):
    """KPS guarantee is one-sided: every value with true frequency >= the
    support threshold MUST appear (false positives are allowed)."""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.catalog import load_table
    from batch_processing_iac_aws_spark.plans import QUERIES

    sf = "/root/testdata/sf0.01"
    row = QUERIES["agg_freq_items"](spark, sf).first()
    l = load_table(spark, sf, "lineitem")
    n = l.count()
    for col, out in (
        ("l_returnflag", "returnflag_heavy"),
        ("l_linestatus", "linestatus_heavy"),
    ):
        truth = [
            r[col]
            for r in l.groupBy(col).agg(F.count(F.lit(1)).alias("c")).collect()
            # strict >, matching the query's exact-side filter and oracle
            if r["c"] > 0.2 * n
        ]
        # the output is a comma-joined string — split it, don't iterate
        # characters (multi-char heavy values would break a char-set check)
        got = set((row[out] or "").split(","))
        assert set(truth) <= got, f"{col} missed a heavy hitter"
