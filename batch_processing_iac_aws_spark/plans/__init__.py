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
# ROTATION: round 1 greened the classic relational surface (joins, aggs,
# set ops, subqueries, 13 TPC-H). Round 2's window covers every component
# with no green row yet — windows, scalars, the 9 driver-unseen TPC-H,
# UDFs, the streaming engine, CDC/merge, z-order layout, sketches, skew,
# and the whole LLM corpus surface. Variants proven by an in-window
# sibling (lag/lead, first/last, map/cast/case scalars, batch stream
# twins, hash/fingerprint dedup, resize/frames, json/orc sources) rotate
# into round 3's window.
_PRIORITY = [
    # §2A reference surface + clustered layouts
    "interval_expand",
    "csv_expand",
    "zorder_roundtrip",
    # window functions
    "window_rank",
    "window_running",
    "window_range_frame",
    "window_ntile",
    "window_ntile_scalable",
    # scalar function families
    "string_funcs",
    "date_funcs",
    "math_funcs",
    "array_funcs",
    "array_hof_funcs",
    "json_funcs",
    # TPC-H shapes without a round-1 driver row
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q13_customer_distribution",
    "q16_supplier_relationship",
    "q18_large_orders",
    "q19_disjunctive",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    # UDF surface (pandas UDAF + grouped applyInPandas)
    "udaf_geomean",
    "udf_grouped_zscore",
    # streaming engine (each oracled vs identical batch SQL) + batch twin
    "streaming_tumbling",
    "streaming_session",
    "streaming_dedup",
    "streaming_stateful_totals",
    "streaming_join_stream",
    # CDC / mutable tables
    "merge_upsert",
    "scd2_history",
    # sketches + skew
    "agg_quantile_bins",
    "join_skew_salted",
    # LLM-data surface: dedup / similarity / text / corpus / multimodal
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_edit_distance",
    "similarity_topk",
    "text_quality",
    "text_lang_profile",
    "text_token_topk",
    "text_decontaminate",
    "text_pii_scrub",
    "sample_deterministic",
    "dataset_mixture",
    "docs_pack_sequences",
    "multimodal_meta",
    "multimodal_features",
    "docs_prep_pipeline",
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
