"""Document deduplication for large-scale training-data pipelines: exact
(hash groupBy), MinHash + LSH banding (fuzzy), SimHash, and exact n-gram
Jaccard verification. All pure DataFrame ops — hashing, shingling, and the
per-permutation minimum all run JVM-side with map-side partial aggregation,
which is what makes this shape viable at 100 TB: the only shuffles are
(1) the per-doc signature aggregation and (2) the LSH bucket join, both on
keys we choose.

Determinism: hash-family parameters derive from a seed via a fixed LCG, so
the same inputs always produce the same signatures/candidates (required for
the driver's repeated correctness runs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# Mersenne prime 2^31 - 1: keeps a*h+b inside signed-64 without overflow
# (h is first folded into [0, P), and a,b < P, so a*h+b < 2^62).
_P = 2_147_483_647


def _hash_params(num_perm: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs from a fixed multiplicative LCG."""
    params = []
    state = seed or 1
    for _ in range(num_perm):
        state = (state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (
            2**63
        )
        a = state % (_P - 1) + 1
        state = (state * 6_364_136_223_846_793_005 + 1_442_695_040_888_963_407) % (
            2**63
        )
        b = state % _P
        params.append((a, b))
    return params


def exact_dedup(
    df: DataFrame, cols: list[str], *, tiebreaker: str
) -> DataFrame:
    """Keep exactly one row per distinct value of ``cols`` — the one with the
    smallest ``tiebreaker`` (deterministic, unlike dropDuplicates whose
    survivor depends on task scheduling)."""
    w = Window.partitionBy(*cols).orderBy(F.col(tiebreaker).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(text_col, k: int = 3):
    """Distinct word k-shingles of a text column: lowercase, whitespace
    split, sliding windows of k words joined by single spaces. Pure HOFs."""
    words = F.split(F.lower(text_col), r"\s+")
    n = F.size(words)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def shingle_rows(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(id, shingle) rows — one per word k-shingle — via explode + slice
    PROJECTION (whole-stage codegen), not an array HOF (interpreted; the
    measured cliff). Duplicate shingles are kept (callers distinct() when
    set semantics matter); docs shorter than k yield one whole-doc
    shingle (slice clamps past the end)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    base = df.select(
        F.col(id_col), words.alias("__w"), F.size(words).alias("__n")
    )
    pos = base.select(
        id_col,
        "__w",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("__n") - k, F.lit(0)))
        ).alias("__i"),
    )
    return pos.select(
        F.col(id_col),
        F.concat_ws(" ", F.slice("__w", F.col("__i") + 1, k)).alias("shingle"),
    )


def contaminated_ids(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 8,
) -> DataFrame:
    """Eval-set decontamination: ids of training docs sharing ANY word
    ``ngram``-shingle with the benchmark corpus (the standard n-gram-overlap
    contamination test for pretraining data).

    Scale shape: the train side streams through codegen shingling into a
    semi join; the benchmark shingle set is DISTINCT and broadcast —
    eval sets are bounded by construction (thousands of docs), so the 100 TB
    side never shuffles. If the benchmark outgrows the broadcast cap, drop
    the hint and let AQE fall back to a shuffle semi join."""
    t = shingle_rows(train, id_col=id_col, text_col=text_col, k=ngram)
    b = (
        shingle_rows(benchmark, id_col=id_col, text_col=text_col, k=ngram)
        .select("shingle")
        .distinct()
    )
    return (
        t.join(F.broadcast(b), "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig array<long>[num_perm]) — min over shingles of (a*h+b) mod P
    per permutation.

    Computed entirely with array HOFs: hash the shingle array once
    (xxhash64 folded into [0, P)), then per permutation take
    ``array_min(transform(...))`` over the hashed array. This is MAP-ONLY —
    no explode, no groupBy, no shuffle; at 100 TB the signature stage
    costs exactly one pass over the documents."""
    params = _hash_params(num_perm, seed)
    # shingle_rows keeps everything inside whole-stage codegen (the array-HOF
    # form evaluates interpreted at num_perm * n_shingles ops/doc — the
    # difference between seconds and minutes); duplicate shingles need no
    # dedup under min()
    #
    # The whole signature is ONE parsed SQL expression (r14 optimization):
    # building num_perm Column aggregates through the functions API costs
    # ~6 py4j round trips each (~400 total, measured 1.2 s of driver time
    # per construction at 64 perms — more than the sf0.1 execution), and
    # this frame is constructed several times per incremental/streaming
    # query. One expr string is one round trip; the parsed plan (64 min
    # aggregates feeding an array) and the results are identical.
    sh = shingle_rows(
        df, id_col=id_col, text_col=text_col, k=shingle_k
    ).select(
        F.col(id_col),
        F.expr(f"pmod(xxhash64(shingle), {_P}L) AS __h"),
    )
    mins = ", ".join(
        f"min(pmod({a}L * __h + {b}L, {_P}L))" for a, b in params
    )
    return sh.groupBy(id_col).agg(F.expr(f"array({mins}) AS sig"))


def banded_signatures(
    sig: DataFrame,
    *,
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    verify_length: bool = False,
) -> DataFrame:
    """(id, band_idx, band_hash) rows from a (id, sig array<long>) frame:
    the signature split into ``bands`` equal bands, each hashed to one
    64-bit bucket key. The single banding implementation shared by
    :func:`minhash_lsh_candidates` (intra-corpus) and
    :func:`incremental_fuzzy_dedup` (batch vs stored index) — identical
    band hashes are what make signatures WRITTEN by one run joinable by a
    later run, so this function is the index's on-disk contract.

    ``verify_length=True`` adds a per-row signature-length check: a
    STORED index written with a different num_perm would otherwise band
    a silent prefix-slice of each signature, produce band hashes that
    never collide with the current family's, and turn the downstream
    dedup into a no-op — external data must fail loudly. Keep it off
    (the default) for signatures built in the same plan, whose length is
    num_perm by construction — the branch measured ~7% on the LSH
    queries, worth paying only at the trust boundary."""
    if num_perm % bands:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                    lambda v: v.cast("string"),
                ),
            )
        ),
    )
    if verify_length:
        band_arr = F.when(
            F.size(F.col("sig")) == num_perm, band_arr
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "banded_signatures: signature length != num_perm="
                        f"{num_perm} (index written with a different hash "
                        "family?): "
                    ),
                    F.size(F.col("sig")).cast("string"),
                )
            ).cast("array<bigint>")
        )
    return sig.select(
        F.col(id_col),
        F.posexplode(band_arr).alias("band_idx", "band_hash"),
    )


def signature_est_jaccard(sig_a, sig_b, num_perm: int):
    """Column expression: signature-estimated Jaccard — the fraction of
    equal components between two MinHash signatures, rounded to 4dp. The
    ONE estimator shared by :func:`minhash_lsh_candidates` and
    :func:`incremental_fuzzy_dedup`'s index-only mode, so threshold
    decisions at the boundary cannot drift between the two APIs."""
    return F.round(
        F.aggregate(
            F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(num_perm),
        4,
    )


def minhash_lsh_candidates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding.

    Signature split into ``bands`` bands of num_perm/bands rows; docs
    sharing any band hash become a candidate pair, scored with the
    signature-estimated Jaccard. Returns (id_a, id_b, est_jaccard),
    id_a < id_b, one row per pair.

    Scale: the band bucket join is an equi-join on (band_idx, band_hash) —
    skew (a degenerate bucket full of boilerplate docs) is the risk: a
    bucket of b members yields b² candidate pairs, so one templated-text
    bucket of 10⁶ docs is 10¹² pairs. AQE skew-join only rebalances the
    shuffle; ``max_bucket`` is the STRUCTURAL guard — band buckets wider
    than it are dropped before the self-join (one extra bounded
    aggregation on the band keys), bounding worst-case candidates at
    n_buckets * max_bucket². The recall trade is real and should be
    understood precisely: a pair losing one over-wide bucket is still
    proposed by any of its other ``bands - 1`` bands, but a J→1 pair has
    probability ~J^num_perm of an IDENTICAL full signature (J=0.99 →
    ~0.5 at 64 perms) — such pairs share every bucket, and if their
    cluster is wider than the cap they are silently not proposed. Exact
    dedup upstream removes only the byte-identical subset of those, so
    capping concedes recall exactly on ultra-high-similarity boilerplate
    clusters wider than the cap — which is the content the cap exists to
    keep from melting the verify stage; size the cap well above the
    widest legitimate duplicate cluster, and treat dropped buckets as
    dedup clusters in their own right if those docs must still be
    collapsed (every member of a shared full-band bucket is a near-dup
    of the others with high probability). Default None keeps the
    exhaustive-recall semantics the dedup_minhash oracle proves.
    """
    sig = minhash_signatures(
        df,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        shingle_k=shingle_k,
        seed=seed,
    ).cache()

    banded = banded_signatures(
        sig, id_col=id_col, num_perm=num_perm, bands=bands
    )
    if max_bucket is not None:
        # bucket widths via ONE count window keyed like the band join
        # (r15, guide §2.4 — a window partitioned by the same key as the
        # following operation needs no extra shuffle): the previous
        # groupBy + self-semi-join shuffled the banded rows TWICE (agg,
        # then join back). Identical survivors (in-session collect
        # comparison at sf0.1 + the exhaustive oracle), 2.65 -> 1.93 s
        # warm. A degenerate giant bucket sorts/spills inside its window
        # partition and is dropped right after the count — the same rows
        # the old semi-join shuffled to one reducer anyway.
        w_cap = Window.partitionBy("band_idx", "band_hash")
        banded = (
            banded.withColumn("__w", F.count(F.lit(1)).over(w_cap))
            .filter(F.col("__w") <= max_bucket)
            .drop("__w")
        )
    a = banded.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_hash"
    )
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            signature_est_jaccard(
                F.col("sig_a"), F.col("sig_b"), num_perm
            ).alias("est_jaccard"),
        )
    )


def exact_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify step after
    LSH): |A ∩ B| / (|A| + |B| - |A ∩ B|), computed RELATIONALLY —
    codegen shingle explode + equi-joins, no interpreted array HOFs
    (array_intersect over materialized set arrays paid the HOF-shingling
    cliff; measured ~2x the whole query at sf0.1).

    Shingle rows are built ONLY for documents that appear in ``pairs``
    (semi-join first): post-LSH candidates touch a vanishing fraction of
    the corpus, so the 100 TB side contributes nothing to the verify."""
    cand_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionAll(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sh = (
        shingle_rows(
            df.join(cand_ids, id_col, "left_semi"),
            id_col=id_col,
            text_col=text_col,
            k=shingle_k,
        )
        .distinct()  # set semantics
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    a_sz = sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza"))
    b_sz = sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb"))
    inter = (
        pairs.join(
            sh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a"
        )
        .join(
            sh.select(F.col(id_col).alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    return (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .join(a_sz, "id_a")
        .join(b_sz, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.coalesce(F.col("__inter"), F.lit(0)).cast("double")
                / (
                    F.col("__sza") + F.col("__szb")
                    - F.coalesce(F.col("__inter"), F.lit(0))
                ),
                4,
            ).alias("jaccard"),
        )
    )


def simhash(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """64-bit SimHash over word tokens: per bit j, sign of the sum of
    (+1/-1) weighted by token-hash bit j; near-duplicates have small
    Hamming distance.

    Codegen form (the minhash_signatures recipe): explode tokens, hash each
    once, then ONE groupBy(id) carrying ``bits`` conditional sums — all
    inside whole-stage codegen with map-side partial aggregation, so only
    (id, bits+1 longs) per doc cross the shuffle. The earlier array-HOF
    ``aggregate`` form evaluated its lambdas interpreted (outside codegen)
    at bits * n_tokens ops per doc — the same perf cliff measured on
    minhash (223 s -> 2.5 s at sf0.1).

    Per bit j the +1/-1 sum is recovered from the cheaper popcount sum:
    sign(sum +/-1) > 0  <=>  2 * sum(bit_j) > n_tokens (bit-exact with the
    previous HOF implementation, including the j=63 sign bit).

    ``token_hash`` swaps the per-token hash family (default xxhash64, the
    fast JVM path). Pass a Column->Column builder for an engine-portable
    family (see plans/llm.py dedup_simhash_portable: md5-derived 60-bit,
    reproducible in DuckDB for differential testing)."""
    hash_of = token_hash if token_hash is not None else F.xxhash64
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("__t"),
    ).select(F.col(id_col), hash_of(F.col("__t")).alias("__h"))
    # disjoint bit terms OR-ed together; j=63 must be the wrapped sign-bit
    # constant (1<<63 overflows signed long — shiftleft(1L, 63) wraps to
    # it deterministically in Spark SQL, avoiding the unparseable
    # -9223372036854775808 literal).
    #
    # The whole hash is ONE parsed SQL expression (r14 optimization): the
    # previous form built ``bits`` sum-aggregates plus a ``bits``-term
    # when/bitwiseOR chain through the functions API — ~640 py4j round
    # trips of driver time per construction (the minhash_signatures
    # finding, measured there at 1.2 s per 64-agg build). One expr string
    # is one round trip; the aggregates, the popcount>half rule, and the
    # packed result are identical.
    terms = " | ".join(
        "(CASE WHEN 2 * sum(shiftright(__h, {j}) & 1) > count(1) "
        "THEN {m} ELSE 0L END)".format(
            j=j, m=f"{1 << j}L" if j < 63 else "shiftleft(1L, 63)"
        )
        for j in range(bits)
    )
    return toks.groupBy(id_col).agg(F.expr(f"({terms}) AS simhash"))


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of an undirected pair list via smallest-label
    propagation: every vertex starts labeled with itself; each round takes
    ``min(own label, neighbors' labels)``; converges in O(graph diameter)
    rounds (near-dup clusters are dense, so diameter is tiny in practice).

    Returns (vertex, component) where ``component`` is the smallest vertex
    id in the component.

    Scale shape: each round is one join + one groupBy on the edge list —
    all equi-shuffles on vertex id. ``localCheckpoint`` truncates the plan
    lineage every round (an iterative loop otherwise grows the plan
    exponentially); the convergence probe is one count() job per round over
    the label frame. On a real cluster, point the session at a reliable
    checkpoint dir and swap localCheckpoint for checkpoint."""
    # materialize the edge list once: every propagation round joins it, and
    # without the checkpoint each round would recompute the full upstream
    # plan (for fuzzy dedup: LSH banding + Jaccard verify, per round).
    # LAZY localCheckpoints (r15, guide §1.5 fewer actions): eager pins
    # ran one materialization job per frame per round PLUS the
    # convergence count — lazy ones persist-on-first-compute, so the
    # count probe's own job materializes the round's labels (and, in
    # round one, the edge list): one job per round instead of two, same
    # blocks pinned, same lineage truncation.
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        neigh_min = (
            edges.join(labels, edges.v == labels.vertex)
            .groupBy("u")
            .agg(F.min("component").alias("__nl"))
        )
        updated = (
            labels.join(neigh_min, labels.vertex == neigh_min.u, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("__nl", F.col("component"))
                ).alias("component"),
                (F.col("__nl") < F.col("component")).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    return labels


def verified_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    jaccard_threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification in
    one call: (id_a, id_b, jaccard) pairs at or above the threshold — the
    canonical candidates->verify preamble shared by the dedup_minhash
    query and :func:`fuzzy_dedup_keep_one` (one implementation, so the
    oracled query and the production pipeline can never drift).

    Candidate pairs are tiny by LSH design and referenced three times by
    the verify stage (ids_a, ids_b, pair join); the localCheckpoint
    truncates lineage so the signature+banding subplan computes once
    instead of once per reference. NOTE: under AQE, checkpointing (eager
    or lazy) materializes the candidate stages at plan-construction time
    — schema-only probes of this frame pay a few seconds, which is the
    accepted cost for cheaper execution; every real consumer executes
    immediately after building. Strategy MEASURED at sf0.1 (local[16],
    steady-state, 4 rounds): localCheckpoint 2.4-2.6s, cands.cache()
    3.8-4.2s (cache still re-plans the banding join per reference and
    pays block-manager reads), no materialization 6.1-6.3s — the
    checkpoint stays."""
    cands = (
        minhash_lsh_candidates(
            df,
            id_col=id_col,
            text_col=text_col,
            num_perm=num_perm,
            bands=bands,
            shingle_k=shingle_k,
            seed=seed,
            max_bucket=max_bucket,
        )
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    return exact_jaccard(
        df, cands, id_col=id_col, text_col=text_col, shingle_k=shingle_k
    ).filter(F.col("jaccard") >= jaccard_threshold)


def fuzzy_dedup_keep_one(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    jaccard_threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """The full production near-duplicate flow in one call:

    1. MinHash-LSH banding proposes candidate pairs (never all-pairs);
    2. exact shingle Jaccard verifies each candidate against the threshold
       (LSH est_jaccard over-proposes by design);
    3. connected components groups transitive duplicates (a~b, b~c => one
       cluster even when a~c was never proposed);
    4. the smallest id per component survives; all other members drop.

    Returns the surviving rows of ``df`` (all columns). Deterministic for a
    fixed seed. Every stage is an equi-join / groupBy — the only iterative
    part is the component propagation over the (tiny relative to the
    corpus) verified-duplicate edge list."""
    verified = verified_near_duplicates(
        df,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        seed=seed,
        jaccard_threshold=jaccard_threshold,
        max_bucket=max_bucket,
    )
    comp = connected_components(verified, src="id_a", dst="id_b")
    losers = comp.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def fuzzy_dedup_keep_best(
    df: DataFrame,
    *,
    quality_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    jaccard_threshold: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """:func:`fuzzy_dedup_keep_one` with QUALITY-AWARE representative
    selection: per near-duplicate cluster the ``quality_col``-best member
    survives (ties to the lowest id) instead of the lowest id — the
    production knob when duplicates differ (truncated vs full page,
    boilerplate-wrapped vs clean extraction) and you want to keep the
    best copy, not the first-crawled one.

    Same LSH -> exact-verify -> connected-components preamble (shared
    code, shared cost); the selection adds one broadcast-sized join of
    (id, quality) onto the component table — which is EDGE-list sized
    (duplicates only), orders of magnitude smaller than the corpus — and
    one window over components. Nothing corpus-sized shuffles beyond the
    shared preamble."""
    verified = verified_near_duplicates(
        df,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        seed=seed,
        jaccard_threshold=jaccard_threshold,
        max_bucket=max_bucket,
    )
    comp = connected_components(verified, src="id_a", dst="id_b")
    quality = df.select(
        F.col(id_col).alias("vertex"), F.col(quality_col).alias("__q")
    )
    w = Window.partitionBy("component").orderBy(
        F.col("__q").desc(), F.col("vertex")
    )
    losers = (
        comp.join(quality, "vertex")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("vertex").alias(id_col))
    )
    return df.join(losers, id_col, "left_anti")


def chunked_simhash(
    sh: DataFrame, *, id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, simhash, chunk_idx, chunk) rows: the ``bits``-wide hash split
    into 4 equal chunks. The single chunking implementation shared by
    :func:`simhash_near_duplicates` (intra-corpus) and
    :func:`incremental_simhash_dedup` (batch vs stored index) — identical
    chunk keys are the index's on-disk contract, and the 4-way split is
    what carries the pigeonhole guarantee (hamming<=3 pairs share >=1
    chunk)."""
    if bits % 4:
        raise ValueError("bits must be divisible by 4 chunks")
    chunk_bits = bits // 4
    mask = (1 << chunk_bits) - 1
    return sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), chunk_bits * i).bitwiseAND(
                        F.lit(mask)
                    )
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )


def simhash_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """Candidate near-dup pairs by SimHash: band the ``bits``-wide hash
    into 4 equal chunks (pigeonhole: hamming<=3 pairs share at least one
    chunk — a STRUCTURAL recall guarantee, asserted exhaustively in
    tests/test_dedup.py), bucket-join on chunks, verify with
    bit_count(xor) <= max_hamming."""
    if max_hamming > 3:
        raise ValueError(
            "4-chunk banding only guarantees recall for max_hamming <= 3 "
            "(pigeonhole); larger distances would be silently missed"
        )
    sh = simhash(
        df, id_col=id_col, text_col=text_col, bits=bits, token_hash=token_hash
    ).cache()
    return hamming_band_pairs(
        sh, id_col=id_col, hash_col="simhash", bits=bits,
        max_hamming=max_hamming,
    )


def hamming_band_pairs(
    df: DataFrame,
    *,
    id_col: str,
    hash_col: str,
    bits: int,
    max_hamming: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """All pairs within ``max_hamming`` of any ``bits``-wide hash column
    via 4-chunk pigeonhole banding (hamming<=3 pairs share >=1 chunk — a
    STRUCTURAL recall guarantee), bucket-join on chunks, exact
    bit_count(xor) verify. The shared tail of every hamming-space
    near-dup family (SimHash text dedup, perceptual-hash media dedup):
    the equi-join on (chunk_idx, chunk) is the only shuffle, never a
    self-cross."""
    if max_hamming > 3:
        raise ValueError(
            "4-chunk banding only guarantees recall for max_hamming <= 3 "
            "(pigeonhole); larger distances would be silently missed"
        )
    sh = df.select(F.col(id_col), F.col(hash_col).alias("simhash"))
    chunked = chunked_simhash(sh, id_col=id_col, bits=bits)
    a = chunked.select(
        F.col(id_col).alias(id_a), F.col("simhash").alias("h_a"), "chunk_idx", "chunk"
    )
    b = chunked.select(
        F.col(id_col).alias(id_b), F.col("simhash").alias("h_b"), "chunk_idx", "chunk"
    )
    return (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col(id_a) < F.col(id_b))
        .select(id_a, id_b, F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def incremental_dedup(
    batch: DataFrame,
    history_index: DataFrame,
    *,
    text_col: str = "text",
    index_col: str = "content_hash",
) -> DataFrame:
    """Drop batch rows whose content already exists in a historical
    fingerprint index (anti-join only — intra-batch duplicates survive;
    compose with :func:`exact_dedup` for those, see below).

    The production shape for rolling corpus ingestion: the history side is
    an index of 32-byte sha256 digests (not document bodies), so the
    anti-join shuffles hashes only — at 100 TB of accumulated corpus the
    index is ~3 orders of magnitude smaller than the data, and with the
    index bucketed by hash the join is shuffle-free on the history side.
    New-batch survivors append their digests to the index for the next run
    (same exactly-once pattern as streaming/pipeline bookmarks). Compose
    with :func:`exact_dedup` on ``index_col`` when one batch may also
    repeat itself internally."""
    hashed = batch.withColumn(index_col, F.sha2(F.col(text_col), 256))
    return hashed.join(history_index, index_col, "left_anti")


def _bloom_positions(
    hash_col: Column, *, m_bits: int, n_hashes: int
) -> Column:
    """``array<long>`` of Bloom bit positions for one content hash:
    position_i = lower-60-bit md5 of ``hash:i`` mod ``m_bits`` — the
    engine-portable md5 family (plans/llm.py:_md5_lower60 arithmetic), so
    a DuckDB twin can reproduce build AND probe bit-exactly. ``m_bits``
    must be a power of two: (x % 2^60) % m == x % m only then, which is
    what keeps the two-step form identical across engines."""
    return F.array(
        *[
            _bloom_position(hash_col, i, m_bits=m_bits)
            for i in range(n_hashes)
        ]
    )


def _bloom_position(hash_col: Column, i: int, *, m_bits: int) -> Column:
    """The i-th Bloom bit position alone — callers probing one position
    per pass (the chained-semi-join prefilter) must not pay for building
    and indexing the full n_hashes array per row."""
    m = F.md5(F.concat(hash_col, F.lit(f":{i}")))
    le = F.concat(*[F.substring(m, 31 - 2 * j, 2) for j in range(8)])
    return F.conv(F.substring(le, 2, 15), 16, 10).cast("long") % m_bits


def build_bloom_index(
    history: DataFrame,
    *,
    text_col: str = "text",
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Distinct Bloom bit positions set by the history corpus — the
    MEMBERSHIP SUMMARY a rolling ingest broadcasts instead of shuffling
    the full fingerprint index against every batch. One history pass:
    hash -> ``n_hashes`` positions (map-only explode) -> distinct (the
    only shuffle, output bounded by ``m_bits`` rows of one long each).
    Persist it like the signature indexes; rebuild is incremental too
    (union + distinct — bits only turn on)."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    return (
        history.select(F.sha2(F.col(text_col), 256).alias("__h"))
        .filter(F.col("__h").isNotNull())
        .select(
            F.explode(
                _bloom_positions(
                    F.col("__h"), m_bits=m_bits, n_hashes=n_hashes
                )
            ).alias("bloom_pos")
        )
        .distinct()
        # hash-family metadata travels WITH the index (persist it and the
        # parameters can't drift from the bits): the probe side verifies
        # them at the trust boundary, same discipline as the MinHash /
        # SimHash index family checks
        .select(
            "bloom_pos",
            F.lit(m_bits).alias("m_bits"),
            F.lit(n_hashes).alias("n_hashes"),
        )
    )


def bloom_prefilter_dedup(
    batch: DataFrame,
    history_index: DataFrame,
    bloom: DataFrame,
    *,
    text_col: str = "text",
    index_col: str = "content_hash",
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Exact incremental dedup with a Bloom PREFILTER: batch rows whose
    ``n_hashes`` bit positions are not all set in ``bloom`` are DEFINITELY
    new (Bloom filters have no false negatives when build and probe share
    the hash family — here literally the same :func:`_bloom_positions`
    expression) and skip the anti-join entirely; only the candidates
    (true duplicates + the ~fpp false-positive sliver) verify against the
    real fingerprint index. The result is EXACT — bit-identical to the
    plain anti-join, which is what the registered oracle asserts; a
    build/probe arithmetic mismatch would create false negatives and show
    up as surviving duplicates, so the hash equality proves the plumbing.

    Scale shape: the bloom table is at most ``m_bits`` rows of one long
    (8 MiB at 2^20) — broadcast, so the prefilter pass is MAP-ONLY over
    the batch; the anti-join's probe side shrinks from |batch| to
    |dups| + fpp*|batch|, which is the whole point when 99% of a crawl
    batch is new content and the history index is 10^10 rows. Size
    ``m_bits`` ~ 10-15 bits per history doc for ~0.1-1% fpp; beyond
    broadcast range, shard the position table by position prefix and the
    probe becomes a bucketed equi-join instead (same arithmetic).
    Engine-portable md5 positions keep it oracle-able; swap
    ``xxhash64(hash, i)`` in for raw JVM speed once differentially
    proven, as dedup_simhash does."""
    # trust boundary: probing with different parameters than the build is
    # a SILENT false-negative machine (every duplicate sails through the
    # definitely-new shortcut) — verify the family metadata the index
    # carries before using a single bit, as the signature indexes do
    # (shared check: also rejects a position table unioned from two
    # families, and pins the frame so the in-plan build runs once, not
    # once per consumer)
    positions = _check_bloom_family(
        bloom, m_bits=m_bits, n_hashes=n_hashes, what="bloom_prefilter_dedup"
    )
    hashed = batch.withColumn(index_col, F.sha2(F.col(text_col), 256))
    # NULL-text rows hash to NULL: under anti-join semantics NULL never
    # equals anything, so the plain form KEEPS them — carry them past the
    # prefilter unconditionally instead of letting the NULL group die in
    # the left_semi below
    null_rows = hashed.filter(F.col(index_col).isNull())
    nn = hashed.filter(F.col(index_col).isNotNull())
    probed = (
        nn.select(
            index_col,
            F.posexplode(
                _bloom_positions(
                    F.col(index_col), m_bits=m_bits, n_hashes=n_hashes
                )
            ).alias("__i", "bloom_pos"),
        )
        .join(F.broadcast(positions.withColumn("__hit", F.lit(1))),
              "bloom_pos", "left")
        .groupBy(index_col)
        # count DISTINCT hit positions, not raw hit rows: a hash appearing
        # c times in the batch contributes c copies of every (hash, i)
        # probe row, so a plain count gives c*hits — when c*hits exceeds
        # n_hashes the hash lands in NEITHER branch below and every copy
        # silently vanishes. Distinct-by-position is c-invariant and stays
        # in [0, n_hashes].
        .agg(
            F.count_distinct(
                F.when(F.col("__hit").isNotNull(), F.col("__i"))
            ).alias("__hits")
        )
    )
    definite_new = probed.filter(F.col("__hits") < n_hashes).select(index_col)
    candidates = probed.filter(F.col("__hits") == n_hashes).select(index_col)
    verified_new = candidates.join(history_index, index_col, "left_anti")
    return nn.join(
        definite_new.unionByName(verified_new), index_col, "left_semi"
    ).unionByName(null_rows)


def _check_bloom_family(
    bloom: DataFrame, *, m_bits: int, n_hashes: int, what: str
) -> DataFrame:
    """Verify a Bloom position table's carried family metadata against the
    probe parameters (mismatch = silent false-negative machine) and strip
    it down to the positions column. The table is MATERIALIZED here
    (eager localCheckpoint, bounded by m_bits rows): every caller probes
    it several times — the family agg plus one broadcast per hash
    function — and without pinning, a bloom frame derived from a
    history-sized build pipeline would re-run that build per consumer
    (measured 5x the build cost in the registered fuzzy query before
    this). Production reads the persisted position parquet instead; the
    checkpoint stands in for it when the frame is built in-plan."""
    pinned = bloom.localCheckpoint(eager=True)
    meta = pinned.agg(
        F.min("m_bits").alias("m"), F.max("m_bits").alias("m_hi"),
        F.min("n_hashes").alias("j"), F.max("n_hashes").alias("j_hi"),
    ).first()
    # min==max first: a position table accidentally unioned from TWO
    # families would pass a min-only probe whenever the probe matches the
    # smaller family while half the bits are wrong — exactly the silent
    # false negatives this check exists to prevent
    if meta["m"] is not None and (
        meta["m"] != meta["m_hi"] or meta["j"] != meta["j_hi"]
    ):
        raise ValueError(
            f"{what}: bloom index mixes families: m_bits "
            f"{meta['m']}..{meta['m_hi']}, n_hashes "
            f"{meta['j']}..{meta['j_hi']} — positions from different "
            "(m_bits, n_hashes) builds can never be probed together"
        )
    if meta["m"] is not None and (
        meta["m"] != m_bits or meta["j"] != n_hashes
    ):
        raise ValueError(
            f"{what}: bloom index family mismatch: index built with "
            f"m_bits={meta['m']}, n_hashes={meta['j']}; probe requested "
            f"m_bits={m_bits}, n_hashes={n_hashes}"
        )
    return pinned.select("bloom_pos")


def build_band_bloom_index(
    banded_index: DataFrame,
    *,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Bloom membership summary over a PRE-BANDED MinHash index's
    (band_idx, band_hash) keys — the fuzzy twin of
    :func:`build_bloom_index`: a rolling ingest broadcasts this (at most
    ``m_bits`` rows of one long) and batch band keys that are definitely
    absent from history skip the banded equi-join entirely. One pass over
    the stored band keys (map-only position expansion, one distinct
    bounded by ``m_bits``); maintain it incrementally by unioning new
    batches' positions (bits only turn on). Same engine-portable md5
    family as the exact index's bloom, keyed on
    ``band_idx || ':' || band_hash``."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    key = F.concat(
        F.col("band_idx").cast("string"),
        F.lit(":"),
        F.col("band_hash").cast("string"),
    )
    return (
        banded_index.select(
            F.explode(
                _bloom_positions(key, m_bits=m_bits, n_hashes=n_hashes)
            ).alias("bloom_pos")
        )
        .distinct()
        .select(
            "bloom_pos",
            F.lit(m_bits).alias("m_bits"),
            F.lit(n_hashes).alias("n_hashes"),
        )
    )


def _band_bloom_prefilter(
    banded_batch: DataFrame,
    band_bloom: DataFrame,
    *,
    m_bits: int,
    n_hashes: int,
    n_probe: int = 1,
) -> DataFrame:
    """Keep only batch band-key rows whose key is POSSIBLY present in the
    history band-key Bloom set: map-only broadcast left-semi joins, one
    per PROBED position — a row survives join ``i`` iff its i-th bit is
    set. Dropped rows provably have no history partner (no false
    negatives under a shared family), so the downstream banded join
    result is IDENTICAL — just cheaper for mostly-new batches.

    ``n_probe`` defaults to 1, NOT ``n_hashes``: this is a prefilter in
    front of an exact join, not a membership oracle. One bit test already
    drops (1 - load_factor) of the absent keys, every extra probe is a
    whole broadcast-join barrier, and the surviving false-positive
    sliver is verified by the banded join anyway — so additional probes
    buy fpp reduction the pipeline doesn't need. (``n_hashes`` still
    describes the BUILD family and is verified against the index
    metadata; probing any prefix of the family is sound.)"""
    if not 1 <= n_probe <= n_hashes:
        raise ValueError(
            f"n_probe must be in [1, n_hashes={n_hashes}], got {n_probe}"
        )
    positions = _check_bloom_family(
        band_bloom, m_bits=m_bits, n_hashes=n_hashes,
        what="incremental_fuzzy_dedup",
    )
    key = F.concat(
        F.col("band_idx").cast("string"),
        F.lit(":"),
        F.col("band_hash").cast("string"),
    )
    out = banded_batch
    for i in range(n_probe):
        out = out.withColumn(
            "__bp", _bloom_position(key, i, m_bits=m_bits)
        ).join(
            F.broadcast(positions.withColumnRenamed("bloom_pos", "__bp")),
            "__bp",
            "left_semi",
        )
    return out.drop("__bp")


def incremental_fuzzy_dedup(
    batch: DataFrame,
    signature_index: DataFrame,
    *,
    history: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    jaccard_threshold: float = 0.9,
    band_bloom: DataFrame | None = None,
    bloom_m_bits: int = 1 << 20,
    bloom_n_hashes: int = 4,
    bloom_n_probe: int = 1,
) -> DataFrame:
    """Drop batch rows that are NEAR-duplicates of the already-ingested
    corpus — the fuzzy twin of :func:`incremental_dedup` and the missing
    production shape for rolling-corpus ingestion: exact hashing catches
    byte-identical re-crawls, but the web re-serves the same page with a
    new timestamp/banner every day.

    ``signature_index`` is the persisted (id, sig array<long>) MinHash
    index of history — built by :func:`minhash_signatures` with the SAME
    (num_perm, shingle_k, seed) and round-tripped through parquet (same
    bookmark pattern as the exact index; reference:
    batch_processing_IaC.py job-bookmark incremental scans). Flow:

    1. batch signatures: one map-only pass over the new batch;
    2. band BOTH sides with :func:`banded_signatures` and equi-join on
       (band_idx, band_hash) — batch-vs-history only, never history x
       history (the index is never self-joined) and never all-pairs;
    3. verify candidates: if ``history`` (id, text) is supplied, exact
       shingle Jaccard via :func:`exact_jaccard` over the candidate-bounded
       union — the point-lookup fetch of candidate history bodies is a
       semi join by id, so the 100 TB history contributes only its matched
       docs (batch and history ids are prefix-disambiguated internally,
       so the two sides may safely reuse one id space — e.g. stable
       URL-derived ids across crawls); without ``history``, fall back to
       the signature-estimated
       Jaccard (num_perm-fraction of equal components), the index-only mode
       for when bodies are archived cold;
    4. anti-join: batch rows with ANY verified match >= threshold drop.

    Returns the surviving batch rows (all columns). Survivors' signatures
    (recompute via :func:`minhash_signatures`, or reuse step 1) append to
    the index for the next run — exercised by the restart test in
    tests/test_dedup.py.

    Scale shape: shuffles are (a) the batch signature groupBy (batch-sized),
    (b) the banded equi-join where the index side shuffles band keys only
    (16 longs per historical doc, ~3 orders smaller than the corpus;
    bucket the stored index by band_hash to make it shuffle-free), and
    (c) the candidate-bounded verify.

    ``signature_index`` may be stored in either layout:

    * ``(id, sig array<long>)`` — compact; re-banded here each run (an
      O(history-index) map per batch);
    * ``(id, band_idx, band_hash)`` — the PRE-BANDED layout (write it once
      with :func:`banded_signatures`, bucket by band_hash): each run then
      skips history banding entirely and, bucketed, the join is
      shuffle-free on the history side — the right layout when batches
      are frequent and history is 100 TB-scale. Detected by columns.
      Index-only mode (``history=None``) needs the per-permutation
      signatures for est-Jaccard scoring and therefore requires the
      compact layout."""
    prebanded = {"band_idx", "band_hash"} <= set(signature_index.columns)
    if prebanded and history is None:
        # validate BEFORE building the plan: the localCheckpoint below is
        # eager, so a late raise would pay the whole candidate join first
        raise ValueError(
            "index-only mode (history=None) scores candidates with the "
            "signature-estimated Jaccard and needs the compact "
            "(id, sig) index layout, not the pre-banded one"
        )
    sig_b = minhash_signatures(
        batch,
        id_col=id_col,
        text_col=text_col,
        num_perm=num_perm,
        shingle_k=shingle_k,
        seed=seed,
    )
    if history is None:
        # index-only mode references sig_b twice (banding + est-Jaccard
        # scoring); without this the dominant batch-side stage (shingle
        # explode + 64-min groupBy) runs twice
        sig_b = sig_b.localCheckpoint()
    kw = dict(id_col=id_col, num_perm=num_perm, bands=bands)
    bb = banded_signatures(sig_b, **kw).select(
        F.col(id_col).alias("id_a"), "band_idx", "band_hash"
    )
    if band_bloom is not None:
        bb = _band_bloom_prefilter(
            bb, band_bloom, m_bits=bloom_m_bits, n_hashes=bloom_n_hashes,
            n_probe=bloom_n_probe,
        )
    if prebanded:
        # the band hashes of a pre-banded index written under a different
        # (num_perm, bands, seed) family can never collide with ours —
        # which would silently no-op the dedup. Band count is the one
        # family parameter visible in the data: every id emits band_idx
        # 0..bands-1, so a non-empty index's max band_idx must be exactly
        # bands-1 (catches BOTH more and fewer bands). The check is one
        # eager map-side-combined scan of the band_idx column — the join
        # scans the index each run anyway, and this function is already
        # eager via the localCheckpoint below. A same-band-count
        # different (num_perm, seed) family is indistinguishable from
        # data — keep the family parameters with the index path.
        top = signature_index.agg(F.max("band_idx")).first()[0]
        if top is not None and top != bands - 1:
            raise ValueError(
                "incremental_fuzzy_dedup: pre-banded index has max "
                f"band_idx {top}, expected bands-1={bands - 1} — index "
                "written with a different banding"
            )
        bh = signature_index.select(
            F.col(id_col).alias("id_b"), "band_idx", "band_hash"
        )
    else:
        # external data: verify the stored signatures' length per row
        bh = banded_signatures(
            signature_index, verify_length=True, **kw
        ).select(F.col(id_col).alias("id_b"), "band_idx", "band_hash")
    cands = (
        bb.join(bh, ["band_idx", "band_hash"])
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint()
    )
    if history is not None:
        # verify against DISAMBIGUATED keys: batch and history may reuse
        # the same id space (a re-crawl keyed by URL), and exact_jaccard
        # keys its union frame by id — colliding ids would merge the two
        # documents' shingle sets and inflate every score they touch.
        # The tag is a (side, id) STRUCT, not a string prefix: struct
        # keys group/join like the raw id (a string concat measured
        # ~1.3 s extra at sf0.1 — string shuffles through the whole
        # shingle verify), and the original id comes back by field
        # access with its type intact.
        def _tag(frame: DataFrame, side: int) -> DataFrame:
            return frame.select(
                F.struct(
                    F.lit(side).cast("tinyint").alias("side"),
                    F.col(id_col).alias("k"),
                ).alias(id_col),
                F.col(text_col),
            )

        def _tag_col(c, side: int):
            return F.struct(
                F.lit(side).cast("tinyint").alias("side"), c.alias("k")
            )

        corpus = _tag(batch, 0).unionByName(_tag(history, 1))
        tagged_cands = cands.select(
            _tag_col(F.col("id_a"), 0).alias("id_a"),
            _tag_col(F.col("id_b"), 1).alias("id_b"),
        )
        scored = exact_jaccard(
            corpus,
            tagged_cands,
            id_col=id_col,
            text_col=text_col,
            shingle_k=shingle_k,
        ).withColumnRenamed("jaccard", "__score")
        dropped_keys = (
            scored.filter(F.col("__score") >= jaccard_threshold)
            .select(F.col("id_a").getField("k").alias(id_col))
            .distinct()
        )
        return batch.join(dropped_keys, id_col, "left_anti")
    sa = sig_b.select(F.col(id_col).alias("id_a"), F.col("sig").alias("__sa"))
    sb = signature_index.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("__sb")
    )
    scored = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            signature_est_jaccard(
                F.col("__sa"), F.col("__sb"), num_perm
            ).alias("__score"),
        )
    )
    dup_ids = (
        scored.filter(F.col("__score") >= jaccard_threshold)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return batch.join(dup_ids, id_col, "left_anti")


def incremental_simhash_dedup(
    batch: DataFrame,
    simhash_index: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
    token_hash=None,
) -> DataFrame:
    """SimHash twin of :func:`incremental_fuzzy_dedup`: drop batch rows
    within ``max_hamming`` bits of any already-ingested document, where
    history is a persisted (id, simhash) index — ONE long per historical
    doc, the cheapest near-dup index that exists. Unlike the MinHash path
    the recall guarantee is STRUCTURAL, not probabilistic: by pigeonhole,
    a batch x history pair at hamming <= 3 differs in at most 3 of the 4
    hash chunks, so at least one chunk matches exactly and the banded
    equi-join MUST propose it — the verify (bit_count of xor) then makes
    the decision exact. No verification corpus fetch is ever needed.

    Build the index with :func:`simhash` using the same (bits,
    token_hash); append survivors' hashes per era (same bookmark pattern
    as the MinHash index; reference: batch_processing_IaC.py:301's job
    bookmarks). ``simhash_index`` may be stored in either layout:
    ``(id, simhash)`` (compact — re-chunked here each run), or the
    output of :func:`chunked_simhash` persisted as
    ``(id, simhash, chunk_idx, chunk)`` — the PRE-CHUNKED layout
    (detected by columns); bucketed by ``chunk``, the history side of
    the equi-join is then shuffle-free AND skips per-run re-chunking.
    Shuffles: the batch simhash groupBy, then the 4-rows-per-doc chunk
    equi-join; the verify is a codegen expression on the joined rows, no
    extra pass.

    Family guard (trust boundary, like the MinHash index's
    verify_length): for ``bits < 64`` any stored hash with bits set at
    or above position ``bits`` proves the index was written by a wider
    family (e.g. a 64-bit xxhash64 index consumed at 60 portable bits
    trips this for ~15/16 of docs) and raises per row instead of
    silently producing zero chunk collisions. A same-width different
    ``token_hash`` family is indistinguishable from data — keep the
    family parameters with the index path."""
    if max_hamming > 3:
        raise ValueError(
            "4-chunk banding only guarantees recall for max_hamming <= 3 "
            "(pigeonhole); larger distances would be silently missed"
        )
    if bits < 64:
        checked = F.when(
            F.shiftrightunsigned(F.col("simhash"), bits) == 0, F.col("simhash")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "incremental_simhash_dedup: stored simhash has bits "
                        f"above position {bits} — index written with a "
                        "wider hash family? "
                    ),
                    F.col("simhash").cast("string"),
                )
            ).cast("long")
        )
        simhash_index = simhash_index.withColumn("simhash", checked)
    sh_b = simhash(
        batch, id_col=id_col, text_col=text_col, bits=bits, token_hash=token_hash
    )
    cb = chunked_simhash(sh_b, id_col=id_col, bits=bits).select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"),
        "chunk_idx", "chunk",
    )
    if {"chunk_idx", "chunk"} <= set(simhash_index.columns):
        ch = simhash_index.select(
            F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"),
            "chunk_idx", "chunk",
        )
    else:
        ch = chunked_simhash(
            simhash_index, id_col=id_col, bits=bits
        ).select(
            F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"),
            "chunk_idx", "chunk",
        )
    dup_ids = (
        cb.join(ch, ["chunk_idx", "chunk"])
        .filter(
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= max_hamming
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return batch.join(dup_ids, id_col, "left_anti")


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 8,
    threshold: float = 0.6,
    score_round: int = 6,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    embedding space, then drop any vector with a LOWER-id same-cluster
    neighbor at cosine >= ``threshold`` (the one-pass keep-lowest variant;
    the transitive-closure variant is ``fuzzy_dedup_pipeline``'s CC).
    Returns kept (id, cluster) rows.

    ``assignments`` — an optional externally-computed (id, cluster) frame
    (e.g. :func:`~..operators.similarity.kmeans_exact`, the clustering
    the published algorithm actually uses). When given, the built-in
    nearest-of-first-k assignment is skipped and the near-dup scan runs
    over the supplied cells via an equi-join on id.

    Scale shape: centroids are a deterministic bounded collect (first
    ``n_clusters`` by id — a k-means++ / trained-centroid injection
    point); assignment is map-only (Arrow matmul scores, JVM argmax);
    the near-dup scan shuffles each vector ONCE on its cluster id into a
    per-cell Arrow ``applyInPandas`` that scores the cell's ~ (n/k)² pair
    block as one unit-row matmul — the SemDeDup point is that work is
    per-cell quadratic, never corpus-wide n² (a first HOF-cosine
    self-join version measured 8.2s warm at sf0.1 vs 0.9s for this
    matmul form; real deployments size k so cells stay ~1e3-1e5 rows).
    Both the assignment scores and the pair cosines round to
    ``score_round`` dp (ties to the lowest cluster id / lower vector id)
    so argmax and threshold tests are engine-portable."""
    from .similarity import _centroid_scores_udf

    if assignments is not None:
        assigned = df.join(
            assignments.select(id_col, "cluster"), id_col
        )
    else:
        cent_rows = (
            df.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(n_clusters)
            .collect()
        )
        centroids = [(i, list(r[vec_col])) for i, r in enumerate(cent_rows)]
        scored = df.withColumn(
            "__scores", _centroid_scores_udf(centroids)(F.col(vec_col))
        )
        rounded = F.transform(
            F.col("__scores"), lambda s: F.round(s, score_round)
        )
        assigned = scored.withColumn(
            "cluster",
            (F.array_position(rounded, F.array_max(rounded)) - 1).cast(
                "long"
            ),
        ).drop("__scores")

    def _keep_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        X = np.vstack(pdf[vec_col].to_numpy())[order].astype(np.float64)
        n = np.linalg.norm(X, axis=1, keepdims=True)
        n[n == 0] = np.inf  # zero-norm cosine is NULL -> never a dup
        S = np.round((X / n) @ (X / n).T, score_round)
        dup = np.tril(S >= threshold, k=-1).any(axis=1)
        keep = ids[order][~dup]
        out = pdf[pdf[id_col].isin(keep)]
        return out[[id_col, "cluster"]]

    id_type = dict(df.dtypes)[id_col]
    return assigned.select(id_col, "cluster", vec_col).groupBy(
        "cluster"
    ).applyInPandas(
        _keep_cell, schema=f"{id_col} {id_type}, cluster long"
    )


def incremental_sparse_dedup(
    batch: DataFrame,
    sparse_index: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    threshold: float = 0.8,
    max_posting: int | None = None,
) -> DataFrame:
    """Drop batch docs whose hashed-BoW COSINE to any already-ingested
    doc reaches ``threshold`` — the LEXICAL-cosine member of the
    incremental dedup family (exact/MinHash/SimHash/embedding are the
    other four): word-permuted or lightly-reordered re-crawls that
    shingle-based MinHash scores low land at cosine 1.0 here, and unlike
    the embedding member it needs no model — the index is the corpus
    itself, hashed.

    ``sparse_index`` is the persisted inverted-index layout
    (operators/text.py:hashed_doc_vectors rows: id, idx, c, norm2_sum —
    write it partitioned/bucketed by ``idx`` and the candidate join is
    co-located on the history side). Flow: batch docs vectorize in one
    map-only pass + one batch-sized hash-agg; candidates = the equi-join
    on shared hash slots (batch docs sharing NO slot with history cannot
    reach any positive cosine and never pair — the inverted index IS the
    prefilter, no Bloom needed); scores are exact integer dot products,
    so the drop decision is bit-identical in any engine and the
    registered query hash-oracles end-to-end. Survivors' rows (their
    hashed vectors) append to the index for the next run — the same
    bookmark pattern as every other index in this family.

    Scale shape: history ships only its MATCHED slots' rows through the
    join (slot-pruned by the batch's distinct slots — broadcast them as
    a semi-filter when the batch is small); the per-pair work is one
    integer multiply per shared slot; ``max_posting`` caps stopword
    slots (NOTE: unlike the Bloom guards this can lower scores of pairs
    that shared only hot slots — a recall trade documented at the call
    site, off by default)."""
    from .text import hashed_doc_vectors  # local: avoid module cycle

    bv = (
        hashed_doc_vectors(
            batch, id_col=id_col, text_col=text_col, dim=dim,
            max_posting=max_posting,
        )
        .select(
            F.col("id").alias("__bid"),
            "idx",
            F.col("c").alias("__bc"),
            F.col("norm2_sum").alias("__bn2"),
        )
        # consumed twice (slot semi-filter + candidate join); the frame
        # is batch-sized by contract — pin it instead of re-running the
        # explode+agg+window pipeline per consumer
        .localCheckpoint(eager=True)
    )
    # slot-prune the history side BEFORE the candidate join: only slots
    # the batch touches can produce a pair (left_semi on the batch's
    # distinct slots — broadcast-sized for a bounded batch)
    hv = sparse_index.join(
        F.broadcast(bv.select("idx").distinct()), "idx", "left_semi"
    ).select(
        F.col("id").alias("__hid"),
        "idx",
        F.col("c").alias("__hc"),
        F.col("norm2_sum").alias("__hn2"),
    )
    scored = (
        bv.join(hv, "idx")
        .groupBy("__bid", "__hid")
        .agg(
            F.sum(F.col("__bc") * F.col("__hc")).alias("__dp"),
            F.first("__bn2").alias("__bn2"),
            F.first("__hn2").alias("__hn2"),
        )
    )
    dup_ids = (
        scored.filter(
            F.col("__dp")
            >= F.lit(threshold) * F.sqrt(F.col("__bn2") * F.col("__hn2"))
        )
        .select(F.col("__bid").alias(id_col))
        .distinct()
    )
    return batch.join(dup_ids, id_col, "left_anti")
