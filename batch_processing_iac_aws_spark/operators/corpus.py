"""Corpus-management operators for training-data pipelines: reproducible
sampling, weighted dataset mixing, greedy sequence packing, and PII
scrubbing.

Everything here is deterministic WITHOUT a random number generator: sampling
decisions hash the row key (md5 prefix compared lexicographically), so a
sample is reproducible across runs, engines, cluster sizes, and partition
layouts — the property that matters when a 100 TB training mix must be
re-materializable bit-for-bit. (Spark's df.sample() is seed-stable only for
a fixed partitioning; hash-gating is stable unconditionally.)

All ops are single-pass column expressions or one window/groupBy — no UDFs,
no driver loops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def salted_digest(key: Column, salt: str = "") -> Column:
    """THE salted md5 digest every hash-keyed corpus op shares — gates,
    per-group sampling, and quality weighting must stay byte-identical to
    each other and to their DuckDB oracle twins, so the expression lives
    in exactly one place. NULL keys digest to NULL (concat of NULL):
    every gate built on this treats a NULL key as "not sampled" — a row
    without a stable identity has no reproducible sample membership."""
    return F.md5(F.concat(F.lit(salt), key.cast("string")))


def _validate_hex2(value: str, what: str) -> str:
    if len(value) != 2:
        raise ValueError(f"{what} must be 2 hex chars (or '100'): {value!r}")
    try:
        int(value, 16)
    except ValueError:
        raise ValueError(
            f"{what} must be hexadecimal: {value!r} — every md5 hex char "
            "sorts below a non-hex letter, so a typo like 'zz' would "
            "silently keep ~100% of rows"
        ) from None
    return value.lower()


def hash_gate(key: Column, keep_below_hex: str, *, salt: str = "") -> Column:
    """Boolean sampling gate: md5(salt || key) first-2-hex-chars compared
    lexicographically against ``keep_below_hex`` ('00'..'100'). The md5 hex
    alphabet is uniform, so '29' keeps ~0x29/0x100 = 16% of keys; '100'
    keeps everything. Lowercase-hex string comparison is identical in every
    engine (the DuckDB oracle twin uses the same expression verbatim).
    NULL keys gate to NULL — dropped by filters (see salted_digest)."""
    if keep_below_hex == "100":
        # keep-all must short-circuit: lexicographic compare of a 2-char
        # digest prefix against the 3-char '100' would only pass '0?'
        return F.lit(True)
    thr = _validate_hex2(keep_below_hex, "keep_below_hex")
    return F.substring(salted_digest(key, salt), 1, 2) < F.lit(thr)


def deterministic_sample(
    df: DataFrame,
    *,
    key_col: str,
    keep_below_hex: str,
    salt: str = "",
) -> DataFrame:
    """Reproducible ~(0xNN/256) sample of ``df`` keyed on ``key_col``.

    Scale shape: a map-only filter on a hash of the key — pushes into the
    scan stage, no shuffle, and (unlike LIMIT/TABLESAMPLE) yields the SAME
    rows regardless of parallelism. Different ``salt`` values give
    independent samples (e.g. train/validation splits that can never
    overlap: gate with disjoint hex ranges on one salt)."""
    return df.filter(hash_gate(F.col(key_col), keep_below_hex, salt=salt))


def dataset_mixture(
    sources: dict[str, tuple[DataFrame, str]],
    *,
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Weighted deterministic mixture of corpora: each named source
    contributes its hash-gated sample, tagged with ``mix_source``. The
    weights are the per-source hex thresholds (a 100 TB mixture is then
    fully described by {name: threshold} — re-materializable anywhere).

    unionByName keeps it one wide scan per source with no shuffle; the
    caller controls schema alignment."""
    if not sources:
        raise ValueError("dataset_mixture: sources must be non-empty")
    parts = []
    for name, (df, keep_below_hex) in sorted(sources.items()):
        parts.append(
            deterministic_sample(
                df, key_col=key_col, keep_below_hex=keep_below_hex, salt=salt
            ).withColumn("mix_source", F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def balanced_shards(
    df: DataFrame,
    *,
    weight_col: str,
    id_col: str,
    n_shards: int,
    out_col: str = "shard",
) -> DataFrame:
    """Assign rows to ``n_shards`` with near-equal total weight — the
    shard layout step before writing pretraining data, where every shard
    (file group / worker) should carry the same token mass or the slowest
    shard gates the epoch. Deterministic serpentine (boustrophedon) LPT
    approximation: order rows by weight DESC (id tiebreak), then walk
    shards 0..k-1, k-1..0, repeating — each round of 2k rows adds one
    heavy+one light item per shard, so totals stay within one max-weight
    of each other without any sequential state.

    Scale shape: the global order comes from operators.ranking's
    two-pass range-shuffle row_number (never a one-task window), and the
    shard formula is a map-only expression on the rank — one range
    shuffle total, deterministic on any partitioning, SQL-twin-exact.
    NULL weights sort as heaviest (Spark ascending-nulls-first on the
    negated weight; engines disagree on DESC null order, so coalesce the
    weight column upstream if NULLs are possible)."""
    from .ranking import global_row_number

    ordered = df.withColumn(
        "__negw", -F.col(weight_col).cast("double")
    )
    ranked = global_row_number(ordered, "__negw", id_col, out="__rn")
    fold = (F.col("__rn") - 1) % (2 * n_shards)
    return (
        ranked.withColumn(
            out_col,
            F.when(fold < n_shards, fold)
            .otherwise(2 * n_shards - 1 - fold)
            .cast("int"),
        )
        .drop("__negw", "__rn")
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    context_len: int = 512,
    shard_col: str | None = None,
) -> DataFrame:
    """Greedy concat-then-chunk sequence packing (LLM pretraining layout):
    documents are laid end-to-end in ``id_col`` order and cut into
    ``context_len``-token bins; each doc gets (bin_id, bin_offset) of where
    its first token lands. Token count = whitespace word count; for a
    real vocabulary, compute the count upstream with
    operators.text.count_tokens (pluggable tokenize_fn seam) and pass it
    through — the packing math is count-source-agnostic.

    Scale shape: ONE running-sum window. With ``shard_col`` the window
    partitions by shard — fully parallel packing, each shard packing its
    own bins (the standard sharded-pretraining layout). Without it the
    window is global = single task: dimension-scale only — always pass a
    shard at fact scale.
    """
    n_tok = F.size(F.split(F.col(text_col), r"\s+"))
    part = [shard_col] if shard_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = df.select(
        *( [shard_col] if shard_col else [] ),
        F.col(id_col),
        n_tok.alias("n_tokens"),
    )
    return out.select(
        *( [shard_col] if shard_col else [] ),
        id_col,
        "n_tokens",
        F.floor(cum_before / context_len).cast("long").alias("bin_id"),
        (cum_before % context_len).cast("long").alias("bin_offset"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?\d[\d ()-]{6,}\d"


def scrub_pii(
    df: DataFrame, *, text_col: str = "text", out_col: str = "scrubbed"
) -> DataFrame:
    """Redact email addresses and phone-number-shaped digit runs with
    typed placeholders, counting redactions per row. Map-only regexp
    projection (both patterns are RE2-safe: no backtracking blowup on
    adversarial documents)."""
    emails = F.regexp_count(F.col(text_col), F.lit(_EMAIL_RE))
    no_email = F.regexp_replace(F.col(text_col), _EMAIL_RE, "<EMAIL>")
    phones = F.regexp_count(no_email, F.lit(_PHONE_RE))
    return df.withColumn(
        out_col, F.regexp_replace(no_email, _PHONE_RE, "<PHONE>")
    ).withColumn("n_redactions", (emails + phones).cast("long"))


def quota_cap(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    id_col: str,
    max_per_group: int,
) -> DataFrame:
    """Per-group quota capping: keep at most ``max_per_group`` rows per
    group, best-first by ``order_col`` (ties broken by ``id_col`` so the
    kept set is deterministic under any partitioning). The corpus-curation
    governor: no source may exceed its share of the final mixture
    regardless of how much it contributes upstream.

    One hash shuffle on the group key + an in-partition top-k window.
    Skewed sources (one domain = half the crawl) should pre-aggregate with
    the salted two-phase pattern in operators/skew.py; here the group
    count is source-bounded, so a plain window is the right plan."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= max_per_group)
        .drop("__rank")
    )


def deterministic_split(
    df: DataFrame,
    *,
    id_col: str,
    boundaries: dict[str, str] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Reproducible train/val/test assignment by content hash: bucket =
    md5(id) prefix compared against hex boundaries (default ~80/10/10).
    Engine-portable (md5 prefixes compare identically everywhere), stable
    under re-runs, repartitions, and corpus growth — a given id never
    changes split. Map-only; composes with quota_cap / sample_gate."""
    bounds = boundaries or {"train": "cc", "val": "e6"}
    # the when-chain is first-match-wins, so build it in ASCENDING
    # threshold order regardless of dict insertion order — otherwise
    # {'val': 'e6', 'train': 'cc'} would silently label every h<'cc' row
    # 'val' and starve 'train'. '100' (keep-everything-below) sorts last.
    def _key(item):
        _, upper = item
        return 256 if upper == "100" else int(_validate_hex2(upper, "boundary"), 16)

    h = F.substring(salted_digest(F.col(id_col)), 1, 2)
    expr = None
    for name, upper in sorted(bounds.items(), key=_key):
        cond = F.lit(True) if upper == "100" else h < F.lit(upper.lower())
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr.otherwise("test"))


def uniform_sample_per_group(
    df: DataFrame,
    *,
    group_col: str,
    id_col: str,
    k: int,
    salt: str = "usg",
) -> DataFrame:
    """Exactly-k uniform deterministic sample per group (reservoir-sampling
    semantics without an RNG): rank rows inside each group by
    md5(salt || id) and keep the k smallest digests. Unlike
    :func:`quota_cap` (best-first by a quality column) the kept set is
    UNIFORM over the group — every row has the same inclusion probability —
    yet still reproducible bit-for-bit across engines and cluster layouts.

    Scale shape: one hash shuffle on the group key + in-partition top-k
    window over the digest; only (group, k) rows survive. The classic
    distributed-reservoir alternative needs stateful merging; hash-ranking
    gets the same distribution with plain relational ops."""
    digest = salted_digest(F.col(id_col), salt)
    w = Window.partitionBy(group_col).orderBy(digest.asc(), F.col(id_col))
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def token_budget_cap(
    df: DataFrame,
    *,
    group_col: str,
    quality_col: str,
    id_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Greedy quality-first token-budget fill, per group: order each
    group's docs by ``quality_col`` descending and keep docs while the
    running token total stays within ``budget``. The training-mix governor
    when the target is "N tokens per source", not "N documents" —
    sources with long docs contribute fewer of them.

    A doc is kept iff the cumulative token count of strictly-better docs
    is still below the budget (so the first doc that crosses the line is
    included — budget is a floor on coverage, matching greedy knapsack).
    One window shuffle on the group key; no global sort, no driver loop."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(quality_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn("cum_tokens_before", before).filter(
        F.col("cum_tokens_before") < budget
    )


def dataset_mixture_epochs(
    sources: dict[str, tuple[DataFrame, int, str]],
    *,
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Mixture with EPOCH UPSAMPLING — the pretraining-mixture shape
    ``dataset_mixture`` can't express: a source weighted 2.3 epochs emits
    every document twice plus a ~0.3 hash-gated third copy, so
    high-quality sources repeat while bulk sources thin out, and the whole
    mixture stays deterministic (same salt => same copies on any engine,
    any partitioning — no RNG). Each source maps to
    ``(df, whole_epochs, frac_keep_below_hex)`` where the fractional
    epoch uses the same 2-hex md5 gate as :func:`hash_gate` ('00' = no
    extra copy, '100' unsupported here — fold it into ``whole_epochs``).
    Output rows carry ``mix_source`` and ``epoch`` (0-based copy index).

    Scale shape: map-only per source — a bounded explode of at most
    ``whole_epochs + 1`` copies fused into the scan stage, then
    unionByName; no shuffle anywhere. Rows whose copy count is zero are
    filtered BEFORE the explode (Spark's ``sequence(0, -1)`` yields
    [0, -1], not empty — the guard is load-bearing)."""
    if not sources:
        raise ValueError("dataset_mixture_epochs: sources must be non-empty")
    parts = []
    for name, (df, whole, frac_hex) in sorted(sources.items()):
        if whole < 0:
            raise ValueError(f"{name}: whole_epochs must be >= 0")
        n_copies = F.lit(whole) + F.when(
            hash_gate(F.col(key_col), frac_hex, salt=salt), 1
        ).otherwise(0)
        parts.append(
            # NULL keys have no reproducible sample membership: every
            # hash-keyed op here excludes them (the gate alone would
            # still emit their whole-epoch copies — inconsistent with
            # deterministic_sample/dataset_mixture, which drop them)
            df.filter(F.col(key_col).isNotNull())
            .withColumn("__n", n_copies)
            .filter(F.col("__n") > 0)
            .withColumn(
                "epoch",
                F.explode(F.sequence(F.lit(0), F.col("__n") - 1)),
            )
            .drop("__n")
            .withColumn("mix_source", F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def quality_weighted_sample(
    df: DataFrame,
    *,
    key_col: str,
    weight_col: str,
    salt: str = "qw",
) -> DataFrame:
    """Quality-weighted deterministic sampling (the DCLM/FineWeb shape:
    keep probability proportional to a per-row quality score): a row with
    weight w in [0, 1] survives iff the first-2-hex md5 gate of its key
    falls below floor(w*256) — so w=0 drops everything, w>=1 keeps
    everything (exact, special-cased), and intermediate weights keep
    ~w of rows, reproducibly on ANY engine/partitioning (no RNG). The
    gate threshold is built as a lowercase 2-hex string per row, so the
    comparison is the same lexicographic compare :func:`hash_gate` uses;
    granularity is 1/256 — widen the prefix for finer weights.

    Map-only filter — fuses into the scan. ``weight_col`` must already be
    engine-portable (compute it with rounded arithmetic, like the
    oracled quality features)."""
    w = F.col(weight_col)
    digest = salted_digest(F.col(key_col), salt)
    thr = F.lpad(
        F.lower(F.hex(F.floor(F.least(w, F.lit(1.0)) * 256))), 2, "0"
    )
    keep = (w >= 1) | (
        (w > 0) & (F.substring(digest, 1, 2) < thr)
    )
    return df.filter(keep)
