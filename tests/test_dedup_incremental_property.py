"""Hypothesis property tests for incremental_fuzzy_dedup: for ARBITRARY
small corpora the operator must agree with an independent pure-Python
ground truth (shingle-set Jaccard computed with no Spark, no DuckDB — a
third implementation, so a shared bug with the SQL oracle can't hide).

At threshold 0.9 with 64 perms / 16 bands the per-pair LSH miss
probability is (1 - 0.9^4)^16 ~= 4e-8, so full equality with the ground
truth is safe to assert (not just one-sided precision). Docs draw from a
10-word vocabulary with lengths 1-8, which makes exact duplicates and
high-Jaccard near-dups common in every example batch.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batch_processing_iac_aws_spark.operators.dedup import (
    incremental_fuzzy_dedup,
    minhash_signatures,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa"]

doc = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8).map(" ".join)
corpus = st.tuples(
    st.lists(doc, min_size=1, max_size=6),  # history
    st.lists(doc, min_size=1, max_size=6),  # batch
)


def _shingles(text: str, k: int = 3) -> frozenset[str]:
    words = text.lower().split()
    if len(words) < k:
        return frozenset([" ".join(words)])
    return frozenset(
        " ".join(words[i : i + k]) for i in range(len(words) - k + 1)
    )


def _true_survivors(history: list[str], batch: list[str], thr: float) -> set[int]:
    out = set()
    for i, b in enumerate(batch):
        sb = _shingles(b)
        dropped = False
        for h in history:
            sh = _shingles(h)
            j = len(sb & sh) / len(sb | sh)
            # mirror exact_jaccard's 4dp rounding
            if round(j, 4) >= thr:
                dropped = True
                break
        if not dropped:
            out.add(i)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus)
def test_incremental_fuzzy_matches_python_ground_truth(spark, corp):
    history_texts, batch_texts = corp
    history = spark.createDataFrame(
        [(i, t) for i, t in enumerate(history_texts)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"] - 1000
        for r in incremental_fuzzy_dedup(
            batch,
            minhash_signatures(history),
            history=history,
            jaccard_threshold=0.9,
        ).collect()
    }
    assert got == _true_survivors(history_texts, batch_texts, 0.9)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus)
def test_bloom_prefilter_matches_plain_antijoin(spark, corp):
    """For ARBITRARY small corpora (heavy duplicate overlap by
    construction) the bloom-prefiltered exact dedup must equal set-exact
    first-principles anti-join semantics: batch docs whose text appears
    anywhere in history are dropped, everything else survives — Bloom
    false positives get verified away, and false negatives cannot exist
    when build and probe share the position expression."""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.operators.dedup import (
        bloom_prefilter_dedup,
        build_bloom_index,
    )

    history_texts, batch_texts = corp
    history = spark.createDataFrame(
        [(i, t) for i, t in enumerate(history_texts)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(batch_texts)],
        "doc_id long, text string",
    )
    index = history.select(
        F.sha2(F.col("text"), 256).alias("content_hash")
    ).distinct()
    bloom = build_bloom_index(history, m_bits=1 << 10, n_hashes=3)
    got = {
        r["doc_id"] - 1000
        for r in bloom_prefilter_dedup(
            batch, index, bloom, m_bits=1 << 10, n_hashes=3
        ).collect()
    }
    want = {
        i for i, t in enumerate(batch_texts) if t not in set(history_texts)
    }
    assert got == want
