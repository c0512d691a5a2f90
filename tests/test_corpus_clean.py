"""Behavior tests for the corpus-wide cleaning / clustering operators new
this round: remove_boilerplate_segments (CCNet line dedup across docs),
semantic_dedup (SemDeDup), and kmeans_exact (exact-integer Lloyd's).
Their hash-level correctness is proven by the DuckDB twins in
tests/test_oracle.py; these tests pin the semantic contracts the oracle
match alone doesn't spell out (empty-doc survival, partition invariance,
tie-breaking, empty-cluster handling)."""

from __future__ import annotations

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.operators.dedup import semantic_dedup
from batch_processing_iac_aws_spark.operators.similarity import kmeans_exact
from batch_processing_iac_aws_spark.operators.text import (
    remove_boilerplate_segments,
)


def _docs(spark):
    boiler = "cookie banner " * 5  # one 10-word segment, in 3 docs
    rows = [
        (1, boiler + "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, boiler + "one two three four five six seven eight nine ten"),
        (3, boiler.strip()),  # pure boilerplate
        (4, "solo text that appears nowhere else at all today friend"),
        # within-doc repetition but corpus df == 1: must be KEPT
        (5, ("unique phrase repeated inside " * 4).strip()),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_dropped_corpus_wide(spark):
    out = remove_boilerplate_segments(
        _docs(spark), segment_words=10, max_doc_freq=2
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # one row per input doc — nothing silently vanishes
    assert set(rows) == {1, 2, 3, 4, 5}
    # the df=3 boilerplate segment is gone from every doc
    for i in (1, 2, 3):
        assert "cookie banner" not in rows[i]["text_clean"]
    # the pure-boilerplate doc survives as an empty string
    assert rows[3]["text_clean"] == ""
    assert rows[3]["n_dropped"] == rows[3]["n_segments"]
    # unique docs are untouched, even with WITHIN-doc repetition
    assert rows[4]["n_dropped"] == 0
    assert rows[5]["n_dropped"] == 0
    assert "unique phrase repeated" in rows[5]["text_clean"]
    # survivors keep their original order
    assert rows[1]["text_clean"].startswith("alpha beta gamma")


def test_boilerplate_partition_invariant(spark):
    d = _docs(spark)
    a = remove_boilerplate_segments(d, segment_words=10, max_doc_freq=2)
    b = remove_boilerplate_segments(
        d.repartition(7), segment_words=10, max_doc_freq=2
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def _vecs(spark):
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0]),
        (11, [1.0, 0.0, 0.0, 0.0]),  # exact dup of 10
        (12, [0.99, 0.01, 0.0, 0.0]),  # near-dup of 10
        (20, [0.0, 1.0, 0.0, 0.0]),
        (21, [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_keeps_lowest_id(spark):
    # n_clusters=2 -> both centroids are [1,0,0,0] (ids 10/11), so every
    # vector ties into cluster 0 except none — one big cluster: the
    # within-cluster scan must drop exactly the near-dups of 10
    kept = semantic_dedup(
        _vecs(spark), n_clusters=2, threshold=0.9
    ).collect()
    ids = {r["vec_id"] for r in kept}
    # 10 survives; its exact and near dups (same cluster, cos >= .9) drop
    assert 10 in ids and 11 not in ids and 12 not in ids
    # orthogonal vectors survive
    assert {20, 21} <= ids


def test_kmeans_exact_partition_invariant_and_separating(spark):
    rows = [(i, [10.0 + (i % 3) * 0.01, 0.0]) for i in range(6)] + [
        (i, [0.0, 10.0 + (i % 3) * 0.01]) for i in range(6, 12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = {r["vec_id"]: r["cluster"] for r in kmeans_exact(df, k=2, iters=2).collect()}
    b = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_exact(df.repartition(5), k=2, iters=2).collect()
    }
    assert a == b  # integer arithmetic: partitioning cannot move a point
    # two obvious blobs end up in two distinct clusters
    assert len({a[i] for i in range(6)}) == 1
    assert len({a[i] for i in range(6, 12)}) == 1
    assert a[0] != a[6]


def test_kmeans_exact_empty_cluster_and_empty_input(spark):
    # identical init vectors: one centroid captures everything, the other
    # cluster goes empty and must keep its previous centroid (no crash)
    rows = [(i, [1.0, 1.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_exact(df, k=2, iters=2).collect()
    assert len(out) == 5
    assert {r["cluster"] for r in out} == {0}  # ties go to the lowest id
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_exact(empty, k=2, iters=2).count() == 0


def test_mixture_epochs_copy_counts(spark):
    from batch_processing_iac_aws_spark.operators.corpus import (
        dataset_mixture_epochs,
    )

    rows = [(i, f"doc {i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mixed = dataset_mixture_epochs(
        {"a": (df, 2, "80"), "b": (df, 0, "80"), "c": (df, 1, "00")},
        key_col="doc_id",
    )
    per = {
        (r["mix_source"], r["doc_id"]): r["n"]
        for r in mixed.groupBy("mix_source", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    a_counts = [v for (s, _), v in per.items() if s == "a"]
    # source a: every doc 2 or 3 copies; ~half get the gated third epoch
    assert set(a_counts) <= {2, 3}
    assert 0.3 < sum(c == 3 for c in a_counts) / len(a_counts) < 0.7
    # source b (0 whole epochs): only gated docs appear, exactly once —
    # and they are EXACTLY the docs source a upsampled (same salt+gate)
    b_ids = {d for (s, d) in per if s == "b"}
    assert all(per[("b", d)] == 1 for d in b_ids)
    assert b_ids == {d for (s, d), v in per.items() if s == "a" and v == 3}
    # source c: exactly one copy of every doc, epoch 0
    assert sorted(d for (s, d) in per if s == "c") == list(range(200))
    # epochs are 0-based consecutive per copy set
    eps = {
        r["doc_id"]: r["es"]
        for r in mixed.filter(F.col("mix_source") == "a")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("epoch")).alias("es"))
        .collect()
    }
    assert all(es == list(range(len(es))) for es in eps.values())


def test_mixture_epochs_partition_invariant(spark):
    from batch_processing_iac_aws_spark.operators.corpus import (
        dataset_mixture_epochs,
    )

    rows = [(i, "x") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out1 = dataset_mixture_epochs({"a": (df, 1, "40")}, key_col="doc_id")
    out2 = dataset_mixture_epochs(
        {"a": (df.repartition(13), 1, "40")}, key_col="doc_id"
    )
    assert sorted(map(tuple, out1.collect())) == sorted(
        map(tuple, out2.collect())
    )


def test_normalize_text_rules_and_idempotence(spark):
    from batch_processing_iac_aws_spark.operators.text import normalize_text

    rows = [
        (1, "“Hello”—world\t\t   café\x01END"),
        (2, "  already clean  "),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text_norm"] == '"hello"-world café end'
    assert out[2]["text_norm"] == "already clean"
    assert out[3]["text_norm"] == ""
    assert out[1]["n_chars_raw"] > out[1]["n_chars_norm"]
    # idempotence: a second pass must be the identity
    once = normalize_text(df).select(
        "doc_id", F.col("text_norm").alias("text")
    )
    twice = {r["doc_id"]: r["text_norm"] for r in normalize_text(once).collect()}
    assert twice == {k: v["text_norm"] for k, v in out.items()}


def test_semantic_dedup_and_kmeans_accept_string_ids(spark):
    """Review regression: the applyInPandas / empty-input schemas used to
    hardcode the id column as long, crashing (or silently retyping) any
    frame with string ids — e.g. URL-keyed corpora."""
    rows = [
        ("u10", [1.0, 0.0]),
        ("u11", [1.0, 0.0]),
        ("u20", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    kept = semantic_dedup(df, n_clusters=2, threshold=0.9).collect()
    assert {r["vec_id"] for r in kept} == {"u10", "u20"}
    out = kmeans_exact(df, k=2, iters=1).collect()
    assert {r["vec_id"] for r in out} == {"u10", "u11", "u20"}
    empty = spark.createDataFrame([], "vec_id string, embedding array<float>")
    assert dict(kmeans_exact(empty, k=2, iters=1).dtypes)["vec_id"] == "string"


def test_quality_weighted_sample_rates_and_invariance(spark):
    from batch_processing_iac_aws_spark.operators.corpus import (
        quality_weighted_sample,
    )

    rows = [(i, [0.0, 0.25, 0.5, 0.75, 1.0][i % 5]) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = quality_weighted_sample(
        df, key_col="doc_id", weight_col="w"
    ).collect()
    by_w = {}
    for r in kept:
        by_w.setdefault(r["w"], set()).add(r["doc_id"])
    # w=0 drops everything, w=1 keeps everything — exactly
    assert 0.0 not in by_w
    assert len(by_w[1.0]) == 200
    # intermediate weights keep ~w of their 200 rows (md5 gate, ±40%)
    for w in (0.25, 0.5, 0.75):
        assert abs(len(by_w.get(w, set())) / 200 - w) < 0.4 * w
    # deterministic under repartitioning
    kept2 = quality_weighted_sample(
        df.repartition(17), key_col="doc_id", weight_col="w"
    ).collect()
    assert {r["doc_id"] for r in kept} == {r["doc_id"] for r in kept2}


def test_split_boundaries_order_independent_and_100(spark):
    import pytest
    from batch_processing_iac_aws_spark.operators.corpus import (
        deterministic_split,
    )

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = deterministic_split(
        df, id_col="doc_id", boundaries={"train": "cc", "val": "e6"}
    )
    b = deterministic_split(  # same mapping, reversed insertion order
        df, id_col="doc_id", boundaries={"val": "e6", "train": "cc"}
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # '100' = everything below it: no row can fall through to 'test'
    all_train = deterministic_split(
        df, id_col="doc_id", boundaries={"train": "100"}
    )
    assert {r["split"] for r in all_train.collect()} == {"train"}
    with pytest.raises(ValueError, match="hex"):
        deterministic_split(df, id_col="doc_id", boundaries={"t": "zz"}).collect()


def test_hash_gate_rejects_non_hex_threshold(spark):
    import pytest
    from batch_processing_iac_aws_spark.operators.corpus import hash_gate

    with pytest.raises(ValueError, match="hex"):
        hash_gate(F.col("doc_id"), "zz")  # would silently keep ~100%


def test_vector_dot_raises_on_length_mismatch(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from batch_processing_iac_aws_spark.functions.vectors import cosine

    df = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0, 3.0])],
        "a array<float>, b array<float>",
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        df.select(cosine("a", "b")).collect()  # NOT a silent NULL score


def test_tokens_drop_empties_everywhere(spark):
    """Batch-4 review regressions, all live-verified failures before the
    fix: empty/padded docs miscounting tokens, padded docs dodging
    corpus-wide segment dedup, degenerate docs vanishing from scoring."""
    from batch_processing_iac_aws_spark.operators.text import (
        bigram_surprisal,
        dedup_sentences,
        quality_features,
    )

    rows = [(1, ""), (2, " a b "), (3, "a b c d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert q[1]["n_tokens"] == 0  # was 1 -> quality 0.505 passed the gate
    assert q[2]["n_tokens"] == 2  # was 4
    assert q[2]["avg_token_len"] == 1.0  # was 0.5
    # degenerate docs stay in the scored outputs
    s = {r["doc_id"]: r for r in dedup_sentences(df).collect()}
    assert s[1]["text_dedup"] == "" and s[1]["n_sentences"] == 0
    b = {r["doc_id"]: r for r in bigram_surprisal(df).collect()}
    assert set(b) == {1, 2, 3}
    assert b[1]["n_bigrams"] == 0 and b[1]["avg_bits"] is None


def test_boilerplate_dedup_survives_padding(spark):
    """A leading space used to shift the segment windows so a 3-doc
    boilerplate run hashed differently in the padded doc and slipped
    under the document-frequency threshold."""
    base = "cookie banner one two three four five six seven eight"
    rows = [(1, base), (2, base), (3, " " + base)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_boilerplate_segments(
        df, segment_words=10, max_doc_freq=2
    ).collect()}
    for i in (1, 2, 3):
        assert out[i]["n_dropped"] == 1, f"doc {i} kept the boilerplate"


def test_bm25_query_terms_case_insensitive(spark):
    from batch_processing_iac_aws_spark.operators.text import bm25_scores

    df = spark.createDataFrame(
        [(1, "the real thing")], "doc_id long, text string"
    )
    assert bm25_scores(df, ["Real"]).count() == 1  # was 0
