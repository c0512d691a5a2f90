"""Registry self-checks: the driver hard-verifies the FIRST 50 registered
queries, so the registration order IS coverage policy — lock it down, along
with the exact query/oracle counts and the rows-only allowlist."""

from __future__ import annotations

from batch_processing_iac_aws_spark.plans import ORACLES, QUERIES, _PRIORITY

# genuinely non-SQL-expressible ops (sketches, seeded LSH internals,
# iterative component propagation): rows-only by design, each compensated
# with property tests
ROWS_ONLY = {
    "agg_approx_distinct",
    "agg_freq_items",
    "agg_hll_rollup",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_fuzzy_pipeline",
    "embedding_pca",
    "similarity_ivf",
    "similarity_lsh",
    "text_langid",
}


def test_counts():
    assert len(QUERIES) == 167
    assert len(ORACLES) == 156


def test_rows_only_set_is_exactly_the_allowlist():
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


#: Round-2 driver failures (testdata ts-encoding switch + array-hash crash);
#: all repaired this round and required to re-earn green rows.
REPAIRED_R2_FAILURES = {
    "interval_expand",
    "window_range_frame",
    "array_funcs",
    "json_funcs",
    "udaf_geomean",
    "udf_grouped_zscore",
    "streaming_tumbling",
    "streaming_session",
    "streaming_dedup",
    "streaming_stateful_totals",
    "streaming_join_stream",
    "agg_quantile_bins",
}


def test_first_50_is_the_round3_rotation_window():
    """Rotation policy: the driver's 50-slot window carries every repaired
    round-2 failure plus never-green queries; already-green queries rotate
    out (their rows persist in CORRECTNESS_r01/r02)."""
    assert len(_PRIORITY) == 50
    assert list(QUERIES)[:50] == _PRIORITY
    assert REPAIRED_R2_FAILURES <= set(_PRIORITY)
    # every priority slot is either hard-oracled or on the rows-only
    # allowlist (compensated by property tests)
    assert all(n in ORACLES or n in ROWS_ONLY for n in _PRIORITY)
