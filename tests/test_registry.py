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
    assert len(QUERIES) == 184
    assert len(ORACLES) == 182


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


def test_first_50_is_the_round5_rotation_window():
    """Rotation policy: the round-5 window = the two fixable never-greens
    (docs_token_budget after its oracle-CAST fix, embedding_pca with its
    r4 invariant oracle), the four queries new this round (the
    incremental near-dup family vs stored indexes — MinHash, SimHash,
    embedding — plus the cross-source overlap matrix), the five
    hash-oracled queries added later in the round (corpus-wide line
    dedup, SemDeDup, exact-integer k-means, epoch-upsampling mixture,
    C4 text normalization, the k-means SemDeDup composition, the
    streaming rolling-ingest dedup, quality-weighted sampling), and
    the stalest cohort — 36 of the 48
    round-1-only greens, unvisited by the driver since round 1."""
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
