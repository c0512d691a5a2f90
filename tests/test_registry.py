"""Registry self-checks: the driver hard-verifies the FIRST 50 registered
queries, so the registration order IS coverage policy — lock it down, along
with the exact query/oracle counts and the rows-only allowlist."""

from __future__ import annotations

import json
import pathlib

from batch_processing_iac_aws_spark.plans import (
    ORACLES,
    QUERIES,
    _PRIORITY,
    _ROUND8_QUEUE,
)

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
    assert len(QUERIES) == 196
    assert len(ORACLES) == 194


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


def test_first_50_is_the_round7_rotation_window():
    """Rotation policy: the round-7 window = the six queries new this
    round (docs_token_budget_bpe — the real merge-loop BPE through the
    count_tokens seam, oracle-replayed in a DuckDB recursive CTE;
    dedup_incremental_fuzzy_bloom — pre-banded index + broadcast band-key
    Bloom prefilter, oracled equal to exhaustive scoring;
    similarity_pq_rerank — PQ compression + ADC shortlist + exact rerank,
    recall-floor audited; similarity_ivf_pq — the full cell-pruned
    composition; docs_sparse_knn — exact inverted-index sparse KNN,
    hash-oracled; dedup_incremental_sparse — the fifth rolling-corpus
    dedup modality, lexical-cosine vs the persisted inverted index) +
    the
    staleness-debt cohorts exactly as pinned at the end of round 6: the
    7-query r2 remainder (zorder_roundtrip — r6's one red row, its green
    proves the scratch_dir import fix — plus the 6 queries the r6 news
    displaced), the ENTIRE 35-query r3 remainder (incl. orc_roundtrip and
    parquet_schema_merge, the other import-regression casualties), and 6
    r4 fills (flagship, CSV path, core streaming/LSH/fuzzy-composite, and
    the iterative-graph representative). After this round no query's last
    driver-green is older than r4."""
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


def test_round8_queue_names_are_registered():
    """The pinned next-round rotation queue must name only real queries —
    a typo'd entry would silently never rotate in (the r6 lesson applied
    to the queue itself, not just the window)."""
    missing = [n for n in _ROUND8_QUEUE if n not in QUERIES]
    assert not missing, f"queue names not in QUERIES: {missing}"
    # and the queue is exactly the set that will be oldest after round 7:
    # no overlap with the current window, no duplicates
    assert len(set(_ROUND8_QUEUE)) == len(_ROUND8_QUEUE)
    assert not set(_ROUND8_QUEUE) & set(_PRIORITY)


def test_scratch_source_cache_reuse_and_partial_build_wipe(tmp_path, monkeypatch):
    """scratch_source_cache: second call in the same process reuses the
    built tree (already_built=True); a partial build (no sentinel) is
    WIPED on the next call, not appended to."""
    import os

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile as _tf

    _tf.tempdir = None  # force re-read of TMPDIR
    try:
        from batch_processing_iac_aws_spark.plans.registry import (
            scratch_source_cache,
        )

        p1, built1 = scratch_source_cache("t", "/some/sf")
        assert built1 is False
        with open(f"{p1}/partial.parquet", "w") as f:
            f.write("half-written")
        # no sentinel -> next call must wipe the partial content
        p2, built2 = scratch_source_cache("t", "/some/sf")
        assert p2 == p1 and built2 is False
        assert not os.path.exists(f"{p1}/partial.parquet")
        with open(f"{p1}/data.parquet", "w") as f:
            f.write("full")
        with open(f"{p1}/_BUILT", "w") as f:
            f.write("ok")
        p3, built3 = scratch_source_cache("t", "/some/sf")
        assert p3 == p1 and built3 is True
        assert os.path.exists(f"{p1}/data.parquet")
        # different (prefix, sf) -> different trees
        q, _ = scratch_source_cache("t", "/other/sf")
        assert q != p1
    finally:
        _tf.tempdir = None


def test_streaming_source_cache_second_call_identical(spark):
    """Calling a cached-source streaming query twice in one process must
    produce identical results — the second call takes the reuse path."""
    from batch_processing_iac_aws_spark.plans import QUERIES

    fn = QUERIES["streaming_incremental_dedup"]
    a = sorted(map(str, fn(spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(str, fn(spark, "/root/testdata/sf0.001").collect()))
    assert a == b and len(a) > 0
