"""Data-selection operators: DSIR — Data Selection with Importance
Resampling (Xie et al., NeurIPS 2023), the hashed-n-gram variant used
for pretraining-corpus curation: score every raw document by how much
more likely its hashed n-gram profile is under a TARGET distribution
(e.g. a high-quality seed corpus) than under the RAW pool's own
distribution, then keep the top-k (or Gumbel-resample).

Spark-first shape, sized for 100 TB of raw docs against a bounded
target corpus:

- featurization is the shared explode+slice n-gram projection
  (``operators/dedup.py:shingle_rows`` — whole-stage codegen, no
  interpreted array HOFs) followed by a map-side-combined
  ``groupBy(id, bucket)`` count whose key space is doc x bucket;
- both corpus-level distributions collapse to at most ``n_buckets``
  rows (default 10k) — MODEL-sized, independent of corpus size — so
  the bucket -> log(p/q) table is a broadcast and per-doc scoring is
  one broadcast hash join plus one map-side-combined sum: the raw
  corpus is read ONCE and never shuffled at gram granularity beyond
  the (id, bucket) combine;
- selection is ``orderBy(...).limit(k)`` = TakeOrdered (per-partition
  top-k then a k-row driver merge), never a full sort.

Hash family follows the dedup convention: ``F.xxhash64`` is the
production default (fast, JVM-side); pass an engine-portable
``token_hash`` (plans/llm.py:_md5_lower60) when a DuckDB oracle must
replay bucket assignment bit-exactly. Reference anchor: the reference
engine has no data-selection surface (its analytics is one projection
script, pyspark_skript/pyspark_script.py); this extends the corpus-
management family (SURVEY.md §2B) with the published method.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .corpus import salted_digest
from .dedup import shingle_rows


def hashed_ngram_buckets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    ns: "tuple[int, ...]" = (1, 2),
    token_hash=None,
) -> DataFrame:
    """Hashed n-gram profile: one ``(id, bucket, cnt)`` row per distinct
    bucket a document's n-grams hash into (the hashing-trick feature
    vector in sparse row form). ``ns`` picks the gram orders (DSIR's
    published configuration is unigrams + bigrams); grams of every
    order share one bucket space, exactly as the paper's single hash
    table does. Docs shorter than an order contribute that order's
    whole-doc gram once (``shingle_rows``' clamp)."""
    hash_of = token_hash if token_hash is not None else F.xxhash64
    parts = [
        shingle_rows(df, id_col=id_col, text_col=text_col, k=k)
        for k in ns
    ]
    grams = parts[0]
    for p in parts[1:]:
        grams = grams.unionByName(p)
    return (
        grams.select(
            id_col,
            F.pmod(hash_of(F.col("shingle")), F.lit(n_buckets))
            .cast("int")
            .alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_bucket_logratio(
    target_profile: DataFrame,
    raw_profile: DataFrame,
    *,
    n_buckets: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """The bounded scoring table: ``(bucket, logratio)`` with
    ``logratio = ln p_b - ln q_b`` under Laplace-``alpha`` smoothing
    (p from the target corpus profile, q from the raw pool's own).
    At most ``n_buckets`` rows regardless of corpus size — the
    distributions are the MODEL here, and the caller broadcasts the
    result into the per-doc join. Buckets absent from both corpora are
    omitted: a raw doc can only ever look up buckets present in the
    raw profile, and those carry their exact smoothed ratio."""
    t = target_profile.groupBy("bucket").agg(F.sum("cnt").alias("t_cnt"))
    r = raw_profile.groupBy("bucket").agg(F.sum("cnt").alias("r_cnt"))
    t_tot = t.agg(F.sum("t_cnt").alias("t_tot"))
    r_tot = r.agg(F.sum("r_cnt").alias("r_tot"))
    # union + re-agg instead of a FULL OUTER join: Spark cannot
    # broadcast full-outer sides, so the join form costs a sort-merge
    # even on two model-sized inputs — one hash agg does the same spine
    zero = F.lit(0).cast("bigint")
    spine = (
        t.select("bucket", "t_cnt", zero.alias("r_cnt"))
        .unionByName(r.select("bucket", zero.alias("t_cnt"), "r_cnt"))
        .groupBy("bucket")
        .agg(F.sum("t_cnt").alias("t_cnt"), F.sum("r_cnt").alias("r_cnt"))
    )
    # single-row totals enter as broadcast scalars (the established
    # single-row crossJoin pattern — one long each, never data-sized)
    return (
        spine.crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.col("t_cnt") + F.lit(alpha))
                    / (F.col("t_tot") + F.lit(alpha * n_buckets))
                )
                - F.log(
                    (F.col("r_cnt") + F.lit(alpha))
                    / (F.col("r_tot") + F.lit(alpha * n_buckets))
                )
            ).alias("logratio"),
        )
    )


def dsir_importance_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    ns: "tuple[int, ...]" = (1, 2),
    alpha: float = 1.0,
    token_hash=None,
    round_dp: "int | None" = 6,
) -> DataFrame:
    """Per-document DSIR log importance weight:
    ``w(x) = sum_b cnt_b(x) * (ln p_b - ln q_b)`` — one row per raw doc,
    ``(id, dsir_weight)``. The scoring table is broadcast (bounded by
    ``n_buckets``); the raw corpus contributes one featurization pass
    and one map-side-combined per-doc sum. ``round_dp`` rounds the
    weight for engine-portable comparisons (sums of logs never sit on
    the decimal grid, so rounding is tie-free in the
    float-rounding-trap sense); pass None for raw doubles."""
    raw_prof = hashed_ngram_buckets(
        raw_docs, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, ns=ns, token_hash=token_hash,
    )
    # PIN the raw profile (r14 optimization, guide §5 caching): the plan
    # references raw_prof twice — once under the logratio broadcast,
    # once in the scoring join — so without pinning, the raw corpus's
    # featurize pass (shingle explode + n-gram hashing, the dominant
    # cost of every DSIR row) executes TWICE per query. An eager
    # localCheckpoint computes it once; blocks release on GC (the
    # kmeans_exact rationale). Same at 100 TB, where a curation
    # pipeline persists the featurized profile precisely so the corpus
    # is read once (DSIR paper §3 pipeline); measured ~1 s off each
    # dsir_* row at sf0.1.
    #
    # Two documented caveats (r15, ADVICE items): (a) the pin is EAGER,
    # so merely CONSTRUCTING a dsir_* frame (explain, schema probe) runs
    # the featurize pass — every real caller executes immediately after
    # building, and the alternative (lazy) would re-run the pass once
    # per consumer; (b) localCheckpoint blocks have no lineage — on a
    # real cluster an executor loss mid-query fails the job instead of
    # recomputing, and the profile here is CORPUS-sized, so the 100 TB
    # form is a reliable `checkpoint()` into the job's checkpoint dir or
    # an explicit persisted-profile step (the dedup.py graph-loop note,
    # applied to DSIR).
    raw_prof = raw_prof.localCheckpoint(eager=True)
    tgt_prof = hashed_ngram_buckets(
        target_docs, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, ns=ns, token_hash=token_hash,
    )
    lr = dsir_bucket_logratio(
        tgt_prof, raw_prof, n_buckets=n_buckets, alpha=alpha
    )
    w = (
        raw_prof.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("logratio")).alias("dsir_weight"))
    )
    if round_dp is not None:
        w = w.select(
            id_col, F.round("dsir_weight", round_dp).alias("dsir_weight")
        )
    return w


def dsir_select_topk(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    *,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    ns: "tuple[int, ...]" = (1, 2),
    alpha: float = 1.0,
    token_hash=None,
) -> DataFrame:
    """The deterministic selection head: the ``k`` raw docs with the
    highest DSIR weight (id ascending on exact ties — ties happen only
    for byte-identical gram profiles, e.g. duplicate texts), with the
    weight attached. ``orderBy().limit(k)`` executes as TakeOrdered:
    per-partition heap top-k, k-row merge — no global sort. (The
    paper's Gumbel resampling draws WITHOUT replacement proportionally
    to exp(weight); top-k is its zero-temperature limit and the
    reproducible default for pipelines — a seeded Gumbel can be added
    per-corpus by perturbing the weight with a salted-hash uniform
    before this head.)"""
    w = dsir_importance_weights(
        raw_docs, target_docs,
        id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        ns=ns, alpha=alpha, token_hash=token_hash,
    )
    return (
        w.orderBy(F.col("dsir_weight").desc(), F.col(id_col))
        .limit(k)
    )


def dsir_gumbel_sample(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    *,
    k: int,
    salt: str = "",
    temperature: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    ns: "tuple[int, ...]" = (1, 2),
    alpha: float = 1.0,
    token_hash=None,
) -> DataFrame:
    """The paper's actual selection rule: sample ``k`` docs WITHOUT
    replacement with probability proportional to ``exp(weight /
    temperature)`` via the Gumbel-top-k identity (argtop-k of
    ``w/T + G_i`` with i.i.d. standard Gumbel noise IS such a sample).
    The noise is DETERMINISTIC and engine-portable — the corpus ops'
    shared salted-md5 digest (operators/corpus.py:salted_digest) maps
    each doc id to a uniform u in (0,1) and ``G = -ln(-ln u)`` — so the
    sample is reproducible across runs, partitionings, and engines,
    re-drawable by changing ``salt`` (the same re-draw lever every
    hash-gated sampler here exposes), and oracle-able in DuckDB with
    the same md5 arithmetic. Executes as TakeOrdered on the perturbed
    key, exactly like the top-k head; ``temperature -> 0`` recovers
    :func:`dsir_select_topk`. Uniform construction: the digest's first
    12 hex chars scale to (0,1) with a +1 offset so u is never exactly
    0 (ln(0) guard); NULL-id docs digest to NULL and are never sampled,
    matching every gate built on the shared digest."""
    w = dsir_importance_weights(
        raw_docs, target_docs,
        id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        ns=ns, alpha=alpha, token_hash=token_hash,
    )
    u = (
        F.conv(F.substring(salted_digest(F.col(id_col), salt), 1, 12), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16 ** 12 + 2))
    key = (
        F.col("dsir_weight") / F.lit(float(temperature))
        - F.log(-F.log(u))
    )
    return (
        w.withColumn("gumbel_key", F.round(key, 6))
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k)
    )
