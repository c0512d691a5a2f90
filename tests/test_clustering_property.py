"""Hypothesis property tests for kmeans_exact and
remove_boilerplate_segments: for ARBITRARY small inputs each operator
must agree with an independent pure-Python ground truth (no Spark, no
DuckDB — a third implementation, so a bug shared with the SQL oracle
can't hide). kmeans_exact's integer-lattice arithmetic makes FULL
equality assertable: both implementations compute identical int64
distances, floor divisions, and first-minimum tie-breaks, so any
disagreement is a real defect, not float noise."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from batch_processing_iac_aws_spark.operators.similarity import kmeans_exact
from batch_processing_iac_aws_spark.operators.text import (
    remove_boilerplate_segments,
)

# small dimension + tight value range => frequent distance ties, the
# hardest case for cross-implementation agreement
vec = st.lists(
    st.decimals(
        min_value="-2.000", max_value="2.000", places=3, allow_nan=False
    ).map(float),
    min_size=2,
    max_size=3,
)
corpus = st.lists(vec, min_size=1, max_size=12).filter(
    lambda vs: len({len(v) for v in vs}) == 1
)


def _py_kmeans(vecs, k, iters, grid=1000, cscale=100):
    """Pure-Python twin of kmeans_exact (ids = 0..n-1)."""
    # quantize: round-half-away-from-zero on the DOUBLE product x*grid —
    # the same IEEE multiply the engines perform (using the exact rational
    # product instead would disagree whenever rounding the product to
    # double crosses a .5 boundary); Python round() is banker's, so the
    # half-away step goes through Fraction
    def q(x):
        f = Fraction(x * grid)
        if f >= 0:
            g = f + Fraction(1, 2)
            return g.numerator // g.denominator
        g = -f + Fraction(1, 2)
        return -(g.numerator // g.denominator)

    X = [[q(x) for x in v] for v in vecs]
    k_eff = min(k, len(X))
    cents = [[x * cscale for x in X[i]] for i in range(k_eff)]
    assign = None
    for t in range(iters):
        assign = []
        for row in X:
            dists = [
                sum((x * cscale - c) ** 2 for x, c in zip(row, cent))
                for cent in cents
            ]
            assign.append(dists.index(min(dists)))
        if t == iters - 1:
            break
        for cid in range(k_eff):
            members = [X[i] for i, a in enumerate(assign) if a == cid]
            if not members:
                continue
            n = len(members)
            cents[cid] = [
                (sum(col) * cscale) // n for col in zip(*members)
            ]
    return assign


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus)
def test_kmeans_matches_pure_python(spark, vecs):
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_exact(df, k=3, iters=2).collect()
    }
    want = _py_kmeans(vecs, k=3, iters=2)
    assert got == {i: c for i, c in enumerate(want)}


VOCAB = ["aa", "bb", "cc", "dd", "ee"]
doc_text = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=9).map(
    " ".join
)
docs_strategy = st.lists(doc_text, min_size=1, max_size=8)


def _py_line_dedup(texts, seg_words=2, max_df=1):
    """Pure-Python twin of remove_boilerplate_segments."""
    segged = []
    for t in texts:
        words = t.lower().split()
        segs = [
            " ".join(words[i : i + seg_words])
            for i in range(0, max(len(words), 1), seg_words)
        ]
        segged.append(segs)
    df_count: dict[str, set[int]] = {}
    for i, segs in enumerate(segged):
        for s in segs:
            df_count.setdefault(s, set()).add(i)
    out = {}
    for i, segs in enumerate(segged):
        kept = [s for s in segs if len(df_count[s]) <= max_df]
        out[i] = (
            " ".join(kept),
            len(segs),
            sum(len(df_count[s]) > max_df for s in segs),
        )
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs_strategy)
def test_line_dedup_matches_pure_python(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_segments"], r["n_dropped"])
        for r in remove_boilerplate_segments(
            df, segment_words=2, max_doc_freq=1
        ).collect()
    }
    assert got == _py_line_dedup(texts, seg_words=2, max_df=1)


# ---------------------------------------------------------------------------
# dataset_mixture_epochs vs a pure-Python md5 twin
# ---------------------------------------------------------------------------

epoch_weights = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.sampled_from(["00", "40", "80", "c0", "ff"]),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(st.integers(0, 500), min_size=1, max_size=30, unique=True),
       epoch_weights)
def test_mixture_epochs_matches_pure_python(spark, ids, w):
    import hashlib

    from batch_processing_iac_aws_spark.operators.corpus import (
        dataset_mixture_epochs,
    )

    whole, frac_hex = w
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in ids], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["epoch"])
        for r in dataset_mixture_epochs(
            {"s": (df, whole, frac_hex)}, key_col="doc_id"
        ).collect()
    )
    want = []
    for i in ids:
        gate = (
            frac_hex != "100"
            and hashlib.md5(f"mix{i}".encode()).hexdigest()[:2] < frac_hex
        )
        n = whole + (1 if gate else 0)
        want += [(i, e) for e in range(n)]
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# normalize_text vs a pure-Python twin (Java's ASCII \s, not Python's
# unicode-aware one)
# ---------------------------------------------------------------------------

_norm_chars = st.sampled_from(
    list("ab c\t\n") + ["‘", "’", "“", "”", "–", "—", " ", "\x01", "\x1f", "A"]
)
norm_text = st.lists(_norm_chars, min_size=0, max_size=30).map("".join)


def _py_normalize(t: str) -> str:
    import re

    table = str.maketrans("‘’“”–— ", "''\"\"-- ")
    t = t.translate(table)
    t = re.sub(r"[\x00-\x1F\x7F]", " ", t)
    t = re.sub(r"[ \t\n\x0b\f\r]+", " ", t)  # Java \s is ASCII-only
    return t.strip(" \t\n\x0b\f\r").lower()


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(norm_text, min_size=1, max_size=5))
def test_normalize_matches_pure_python(spark, texts):
    from batch_processing_iac_aws_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text_norm"] for r in normalize_text(df).collect()
    }
    assert got == {i: _py_normalize(t) for i, t in enumerate(texts)}
