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
    assert len(QUERIES) == 158
    assert len(ORACLES) == 147


def test_rows_only_set_is_exactly_the_allowlist():
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_first_50_are_the_curated_component_representatives():
    """One representative of every SURVEY §2 component must sit inside the
    driver's 50-query correctness window."""
    assert len(_PRIORITY) == 50
    assert list(QUERIES)[:50] == _PRIORITY
    # every priority slot is oracled (hard value-hash check, not rows-only)
    assert all(n in ORACLES for n in _PRIORITY)


def test_component_coverage_in_driver_window():
    head = set(list(QUERIES)[:50])
    representatives = {
        "reference": {"interval_expand", "csv_expand"},
        "layout": {"zorder_roundtrip"},
        "windows": {"window_rank", "window_ntile", "window_ntile_scalable"},
        "scalars": {"string_funcs", "array_hof_funcs", "json_funcs"},
        "tpch_unseen_r1": {"q2_min_cost_supplier", "q21_waiting_suppliers"},
        "udfs": {"udaf_geomean", "udf_grouped_zscore"},
        "real_streaming": {
            "streaming_tumbling",
            "streaming_session",
            "streaming_dedup",
            "streaming_stateful_totals",
            "streaming_join_stream",
        },
        "cdc": {"merge_upsert", "scd2_history"},
        "sketch_skew": {"agg_quantile_bins", "join_skew_salted"},
        "dedup": {"dedup_exact", "dedup_ngram_jaccard", "dedup_edit_distance"},
        "similarity": {"similarity_topk"},
        "text": {"text_quality", "text_lang_profile", "text_decontaminate"},
        "corpus": {
            "text_pii_scrub",
            "sample_deterministic",
            "dataset_mixture",
            "docs_pack_sequences",
        },
        "multimodal": {"multimodal_meta", "multimodal_features"},
        "pipeline": {"docs_prep_pipeline"},
    }
    for component, names in representatives.items():
        assert names <= head, f"{component} lost its driver-window slot"
