"""Query registry: every implemented operator from SURVEY.md §2 registers a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a DuckDB
oracle twin with identical column names and value canonicalization."""

from __future__ import annotations

from .registry import ORACLES, QUERIES

# importing a module registers its queries
from . import reference  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import tpch_extra  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import scalars  # noqa: E402,F401
from . import llm  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import stream_windows  # noqa: E402,F401
from . import cdc  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import quality  # noqa: E402,F401

# The correctness driver hard-checks the FIRST 50 registered queries in
# insertion order; everything after gets no driver row. Keep one (or a few)
# representative(s) of EVERY SURVEY.md §2 component inside that window —
# redundant variants of already-proven shapes (the 10 join types, set ops,
# the classic TPC-H q1/q3/... already green in round 1) sort after it.
# ROTATION LEDGER:
#   round 1 greened the classic relational surface (joins, aggs, set ops,
#     subqueries, 13 TPC-H, the reference pipeline).
#   round 2 greened windows, scalars, the 9 remaining TPC-H, CDC/merge,
#     skew joins, and the core LLM surface — but 12 in-window queries
#     failed on a testdata regeneration (events.ts switched INT64-nanos ->
#     TIMESTAMP_MICROS; fixed type-adaptively in catalog.normalize_event_time)
#     plus one driver-hash crash on array-typed output (fixed: oracled
#     queries now emit only scalar columns).
#   round 3 window (this one) = the 12 repaired round-2 failures + 38
#     never-green queries (sources, sketches, events analytics, corpus
#     search/stats, ANN, CDC snapshot, quality audit).
#   round 4 rotates in the ~22 deferred low-risk variants, each of which
#     has a green or in-window sibling: lag/lead, first/last, top-k,
#     percent_rank, case/cast scalars, hash/keep-first/fingerprint dedup,
#     simhash_pairs, fuzzy pipeline, rowwise UDF demo, resize/frames,
#     batch window twins, sliding/rollup/join-static streams, salted agg,
#     langid.
_PRIORITY = [
    # repaired round-2 failures — must re-earn green rows this round
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
    # sources / layout (never green)
    "json_expand",
    "orc_roundtrip",
    "parquet_schema_merge",
    # sketches + stats aggregates
    "agg_approx_distinct",
    "agg_hll_rollup",
    "agg_freq_items",
    "agg_mode",
    "agg_higher_moments",
    "agg_regression",
    "table_profile",
    "data_quality_audit",
    "stat_winsorize",
    "stat_robust_zscore",
    # events analytics
    "events_retention_cohorts",
    "ts_time_weighted_avg",
    "events_transition_matrix",
    "events_rolling_distinct_users",
    # scalar families (array-agg/map serialization fixed this round)
    "array_agg_funcs",
    "map_funcs",
    # near-dup + ANN (rows-only where non-SQL-expressible)
    "dedup_minhash",
    "dedup_simhash",
    "similarity_ivf",
    "similarity_lsh",
    # corpus / text statistics + search
    "text_rolling_hash",
    "text_perplexity",
    "text_tfidf_topk",
    "search_bm25",
    "search_inverted_index",
    "text_dedup_sentences",
    "text_pmi_pairs",
    # embeddings pipeline
    "embedding_centroid_outliers",
    "embedding_quantize",
    "embedding_pca",
    # UDTF + CDC/corpus management
    "udtf_chunk_words",
    "snapshot_diff",
    "join_point_in_time",
    "corpus_quota_cap",
    "dataset_split",
]


def _reorder() -> None:
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    for name, fn in QUERIES.items():
        ordered.setdefault(name, fn)
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {n: ORACLES[n] for n in QUERIES if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(o_ordered)


_reorder()

__all__ = ["QUERIES", "ORACLES"]
