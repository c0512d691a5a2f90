"""Registry self-checks: the driver hard-verifies the FIRST 50 registered
queries, so the registration order IS coverage policy — lock it down, along
with the exact query/oracle counts and the rows-only allowlist."""

from __future__ import annotations

import json
import pathlib

from batch_processing_iac_aws_spark.plans import ORACLES, QUERIES, _PRIORITY

# genuinely non-SQL-expressible ops (xxhash64-based SimHash signatures
# and their banded pairs — DuckDB has no xxhash64): rows-only by design,
# each compensated with property tests. Round 4
# upgraded agg_approx_distinct / agg_hll_rollup (tolerance-gated exact
# counts), dedup_minhash (exhaustive-Jaccard recall oracle), and
# similarity_ivf / similarity_lsh (recall-floor summary), and text_langid
# (lexicon-generated SQL twin), and agg_freq_items (KPS one-sided
# guarantee -> sketch-intersect-exact equals exact), and
# dedup_fuzzy_pipeline (exhaustive graph + recursive-CTE closure twin),
# and embedding_pca (centering/ordering/eigenvalue-floor invariants gated
# in-engine, summary row oracled) OUT of this set.
ROWS_ONLY = {
    "dedup_simhash",
    "dedup_simhash_pairs",
}


def test_counts():
    assert len(QUERIES) == 190
    assert len(ORACLES) == 188


def test_rows_only_set_is_exactly_the_allowlist():
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def _ever_driver_confirmed() -> set[str]:
    """Queries with a green (or declared-rows-only) row in any recorded
    CORRECTNESS_r*.json — the cumulative proof ledger the rotation policy
    is built around."""
    seen: set[str] = set()
    for p in sorted(pathlib.Path(__file__).parents[1].glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(p.read_text()).items():
            if row.get("hash_match") or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            ):
                seen.add(name)
    return seen


def test_first_50_is_the_round6_rotation_window():
    """Rotation policy: the round-6 window = the six queries new this
    round (similarity_incremental — the persisted rolling-corpus IVF
    index; dedup_minhash_capped — the max_bucket production guard oracled
    equal to exhaustive LSH on the clean corpus; dedup_bloom_prefilter —
    the broadcast membership-summary prefilter, oracled equal to the
    plain anti-join; docs_balanced_shards — token-balanced serpentine
    sharding over the scalable global rank; streaming_incremental_ann —
    the streaming composition of the persisted IVF index;
    dedup_keep_best — quality-aware cluster representative, oracled
    through the recursive-closure + argmax rule) + the
    staleness-debt cohorts
    exactly as pinned at the end of round 5: the 12 r1 slot donors (last
    green r1), 31 of the 37-query r2 cohort (window_ntile,
    dataset_mixture, dedup_ngram_jaccard, math_funcs, multimodal_meta,
    and sample_deterministic displaced to r7 by the six new queries —
    each shape-covered or arithmetic-proven in-window/r5), and the
    json_expand r3 backfill."""
    assert len(_PRIORITY) == 50
    assert list(QUERIES)[:50] == _PRIORITY
    # every never-driver-confirmed query must be in the window (modulo the
    # rows-only allowlist, whose algorithm is proven by the r4-green
    # portable-hash twin) — that is the whole point of the rotation
    never = set(QUERIES) - _ever_driver_confirmed() - ROWS_ONLY
    missing = never - set(_PRIORITY)
    assert not missing, f"never-confirmed queries outside the window: {missing}"
    # every priority slot is either hard-oracled or on the rows-only
    # allowlist (compensated by property tests) ...
    assert all(n in ORACLES or n in ROWS_ONLY for n in _PRIORITY)
    # ... and rows-only slots may never crowd out hard correctness rows:
    # at least 44/50 slots must carry a DuckDB oracle
    n_oracled = sum(n in ORACLES for n in _PRIORITY)
    assert n_oracled >= 44, f"only {n_oracled}/50 window slots are oracled"
