"""Registration decorator for the queries()/oracle_sql() driver contract.

Canonicalization rules every registered pair follows (so the driver's
order-insensitive value hash matches across Spark and DuckDB):

* every computed column is aliased identically on both sides;
* double aggregates are ``round``-ed (2 decimals for money-grid sums,
  4-6 for averages and transcendentals) — both engines land on the same
  nearest-double;
* DuckDB integer sums are ``CAST(... AS BIGINT)`` (DuckDB widens to
  HUGEINT, Spark to LONG);
* timestamps are compared as TIMESTAMP_NTZ (session TZ pinned to UTC) or as
  BIGINT epoch micros; events.ts is normalized to micros by
  catalog.normalize_event_time whatever the parquet writer encoded
  (INT64 nanos or TIMESTAMP), matching DuckDB's reader;
* no ArrayType/MapType output columns — the driver's pandas-based hash
  compare can't sort/hash them (lists are array_join-ed, or unpacked);
* any LIMIT/top-k is made deterministic with a unique tiebreaker key.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def money_sum(expr: Column, scale: int = 2) -> Column:
    """Engine-order-proof money aggregation: cast each item to
    DECIMAL(18,6) before summing, round, return DOUBLE.

    Plain double sums depend on partition/accumulation order; when a
    rounded sum lands within an ulp of a .005 boundary the Spark and DuckDB
    cent roundings diverge. Exact decimal accumulation makes round(scale)
    identical on both sides. SQL twin:
    ``CAST(round(sum(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)``.
    """
    return F.round(F.sum(expr.cast("decimal(18,6)")), scale).cast("double")

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def fixture_path(*parts: str) -> str:
    """Absolute path of a committed fixture, derived from the PACKAGE
    location (…/repo/fixtures/<parts>), never from the process cwd or a
    hardcoded checkout path — importing the plans package from a checkout
    that is not /root/repo must still find its own fixtures."""
    import os

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), "fixtures", *parts)


def _wrap_for_registry(fn: QueryFn) -> QueryFn:
    """The shared registration wrapper: ship the package to executor
    Python workers once per session — UDF closures referencing module
    helpers pickle by reference, and a driver launched outside the repo
    root has no other way to satisfy the worker-side import
    (session.ensure_worker_imports)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..session import ensure_worker_imports

        ensure_worker_imports(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    wrapped.__wrapped__ = fn
    return wrapped


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle twin.

    Queries without an oracle get the driver's weaker rows-only check; keep
    those to genuinely non-SQL-expressible ops (MinHash-LSH, approx sketches,
    stateful streaming) and compensate with property tests.
    """

    def deco(fn: QueryFn) -> QueryFn:
        # symmetric to staged_query's guard: a live registration reusing
        # a STAGED name would otherwise pass silently, and the dict-merge
        # union in tests/test_oracle.py would let one pair shadow the
        # other — silently dropping a pair from the differential proof
        if name in QUERIES or name in STAGED_QUERIES:
            raise ValueError(f"query name registered twice: {name}")
        wrapped = _wrap_for_registry(fn)
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


#: Next-round staging area. The driver-window invariant is structural
#: (plans/__init__.py: the 50-slot window is always the queries with the
#: OLDEST last-driver-green, never-driver-seen first), so every NEW
#: registration immediately enters the window and displaces a stale
#: query — rounds whose window budget is spoken for (round 11: one new
#: slot + the entire 49-name r6-stale cohort) stage finished pairs here
#: instead. Staged pairs are held to the SAME proof bar as registered
#: ones NOW — tests/test_oracle.py parametrizes over the union, so every
#: suite run differentially checks them against DuckDB at sf0.01 — and
#: the flip is mechanical: swap ``staged_query`` for ``query`` next
#: round. They are invisible to __spark_entry__.queries()/oracle_sql()
#: until then.
STAGED_QUERIES: dict[str, QueryFn] = {}
STAGED_ORACLES: dict[str, str] = {}


def staged_query(
    name: str, oracle: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register a finished (query, oracle) pair into the STAGING area —
    suite-proven now, driver-registered next round (see STAGED_QUERIES
    note). Name collisions with live registrations are a bug."""

    def deco(fn: QueryFn) -> QueryFn:
        # a duplicate staged name would silently shadow its twin and
        # drop one pair from the every-suite-run differential proof
        if name in QUERIES or name in STAGED_QUERIES:
            raise ValueError(f"staged name already registered: {name}")
        wrapped = _wrap_for_registry(fn)
        STAGED_QUERIES[name] = wrapped
        if oracle is not None:
            STAGED_ORACLES[name] = oracle
        return wrapped

    return deco


def _sweep_dead_siblings(base_no_pid: str) -> None:
    """Remove sibling scratch trees (same ``<name>_p<pid>`` stem, other
    pids) whose owning process is gone. Per-pid naming isolates CONCURRENT
    runs, but a dir that outlives its process is just leaked parquet —
    without this sweep every bench/pytest/driver invocation left one tree
    per (query, sf) in /tmp forever, losing the bounded-usage property the
    old deterministic name provided."""
    import glob
    import os
    import shutil

    for d in glob.glob(f"{base_no_pid}_p*"):
        pid_s = d.rsplit("_p", 1)[-1]
        if not pid_s.isdigit() or int(pid_s) == os.getpid():
            continue
        try:
            os.kill(int(pid_s), 0)  # 0 = existence probe, no signal sent
        except ProcessLookupError:
            shutil.rmtree(d, ignore_errors=True)
        except PermissionError:
            pass  # alive under another uid — leave it


def scratch_dir(prefix: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf) scratch directory under the system
    temp root, WIPED on every call. Registered plan functions that
    persist state (index builds, streaming sources/checkpoints) run many
    times per round — bench alone executes each 1 cold + 3 warm times —
    and a fresh mkdtemp per call leaks a full parquet tree per run;
    reusing one deterministic path bounds scratch usage at one tree per
    (query, sf) regardless of how often the driver/bench/probes call it.
    The wipe also guarantees streaming queries a FRESH checkpoint, which
    the mkdtemp form provided implicitly.

    The path embeds the OWNING PROCESS's pid: two concurrent runs of the
    same (query, sf) — bench alongside the driver, or parallel pytest
    workers — must not rmtree each other's live parquet/checkpoint trees
    mid-read, and a fully predictable /tmp name would be a symlink/squat
    hazard on shared hosts; per-pid naming keeps the bounded-reuse
    property (one tree per (query, sf) per process) while restoring the
    isolation mkdtemp provided."""
    import hashlib
    import os
    import shutil
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stem = os.path.join(tempfile.gettempdir(), f"spark_graft_{prefix}_{key}")
    _sweep_dead_siblings(stem)
    base = f"{stem}_p{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    return base


def scratch_source_cache(prefix: str, sf_dir: str) -> "tuple[str, bool]":
    """Scratch dir for DETERMINISTIC test scaffolding (e.g. a streaming
    query's pre-built source files) that is KEPT across calls within one
    process, unlike :func:`scratch_dir`: bench runs each registered query
    1 cold + 3 warm times, and rebuilding a byte-identical source corpus
    per invocation measures scaffolding, not the operator. Returns
    ``(path, already_built)``; when ``already_built`` is False any
    partial previous content has been wiped (a crash between build and
    the sentinel would otherwise leave half a source that a mode=append
    rebuild silently doubles) and the caller must create
    ``<path>/_BUILT`` after finishing the build. Same per-pid isolation
    as scratch_dir; per-process lifetime keeps reuse bounded."""
    import hashlib
    import os
    import shutil
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    stem = os.path.join(
        tempfile.gettempdir(), f"spark_graft_cache_{prefix}_{key}"
    )
    _sweep_dead_siblings(stem)
    base = f"{stem}_p{os.getpid()}"
    if os.path.exists(os.path.join(base, "_BUILT")):
        return base, True
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    return base, False
