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
#   round 3 greened its whole 50-slot window except agg_freq_items (driver
#     hash crashed on ArrayType output — fixed: array_join'd to strings):
#     sources, sketches, events analytics, corpus search/stats, ANN (rows-
#     only), CDC snapshot, quality audit.
#   round 4 window (this one) = the 32 queries that have NEVER had a driver
#     row (the round-3 verification debt, incl. the repaired agg_freq_items)
#     + the sketch/ANN rows-only queries re-shaped with invariant oracles
#     + 6 canaries for the events.ts-encoding repair + the 5 queries new
#     this round (Gopher repetition/filter, substring-span dedup, exact
#     PageRank, portable-hash SimHash twin) + 1 round-1-only green.
_PRIORITY = [
    # -- the 32 never-driver-confirmed queries (round-3 verification debt) --
    # repaired round-3 red (ArrayType output -> array_join'd)
    "agg_freq_items",
    # window variants
    "window_lag_lead",
    "window_first_last",
    "window_percent_rank",
    "topk_per_group",
    # scalar families
    "case_null_funcs",
    "cast_funcs",
    "variant_funcs",
    "try_funcs",
    "generator_funcs",
    "interval_funcs",
    # dedup family
    "dedup_exact_hash",
    "dedup_keep_first",
    "dedup_fingerprint",
    "dedup_fuzzy_pipeline",
    "dedup_simhash_pairs",
    "dedup_incremental",
    # text / graph
    "text_langid",
    "text_token_entropy",
    "graph_degree_centrality",
    # multimodal
    "multimodal_resize",
    "multimodal_frames",
    # UDF slow-path demo
    "udf_rowwise_python",
    # batch window twins of the streaming queries
    "window_tumbling",
    "window_sliding",
    "window_session",
    # streaming variants
    "streaming_rollup",
    "streaming_join_static",
    "streaming_sliding",
    # skew + corpus sampling
    "agg_skew_salted",
    "sample_per_group",
    "docs_token_budget",
    # -- sketch/ANN queries upgraded from no_oracle to invariant oracles --
    "agg_approx_distinct",
    "agg_hll_rollup",
    "dedup_minhash",
    "dedup_simhash",
    "similarity_lsh",
    "similarity_ivf",
    # -- canaries for the events.ts encoding repair (catalog.py) --
    "interval_expand",
    "window_range_frame",
    "json_funcs",
    "udf_grouped_zscore",
    "streaming_tumbling",
    "ts_time_weighted_avg",
    # -- new this round: Gopher filters + span dedup + exact PageRank --
    "text_repetition_profile",
    "corpus_gopher_filter",
    "dedup_substring_spans",
    "graph_pagerank",
    "dedup_simhash_portable",
    # -- round-1-only green, never re-validated since --
    "csv_expand",
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
