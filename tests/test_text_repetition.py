"""Hand-computed semantics for the Gopher repetition metrics and the
exact substring-span dedup work-list."""

from __future__ import annotations

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.operators.text import repetition_features


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_features_hand_example(spark):
    # "a b a b a": 2-grams = [a b, b a, a b, b a] -> total 4,
    # top gram count 2 -> 0.5, every occurrence duplicated -> 1.0
    df = _docs(spark, [(1, "a b a b a"), (2, "w x y z")])
    got = {
        r["doc_id"]: r
        for r in repetition_features(df, ngram=2).collect()
    }
    assert got[1]["n_2grams"] == 4
    assert got[1]["top2gram_frac"] == 0.5
    assert got[1]["dup2gram_frac"] == 1.0
    # "w x y z": 3 distinct 2-grams, no repetition
    assert got[2]["n_2grams"] == 3
    assert got[2]["top2gram_frac"] == round(1 / 3, 4)
    assert got[2]["dup2gram_frac"] == 0.0


def test_repetition_features_short_doc_single_gram(spark):
    # below the n-gram width the whole doc is the single gram
    # (shingle_rows clamp semantics)
    df = _docs(spark, [(1, "solo")])
    row = repetition_features(df, ngram=2).first()
    assert row["n_2grams"] == 1
    assert row["top2gram_frac"] == 1.0
    assert row["dup2gram_frac"] == 0.0


def test_substring_spans_planted_duplicate(spark, tmp_path):
    """Two docs sharing an exact 10-word span must both surface with
    exactly the shared spans counted; an unrelated doc must not."""
    span = " ".join(f"tok{i}" for i in range(10))
    rows = [
        (1, f"alpha beta {span} gamma"),
        (2, f"{span} delta epsilon"),
        (3, "completely different words " + " ".join(f"z{i}" for i in range(10))),
    ]
    sfdir = str(tmp_path)
    _docs(spark, rows).write.parquet(f"{sfdir}/documents.parquet")

    from batch_processing_iac_aws_spark.plans import QUERIES

    got = {
        r["doc_id"]: r["n_dup_spans"]
        for r in QUERIES["dedup_substring_spans"](spark, sfdir).collect()
    }
    # doc1 windows containing the full span: positions where the 10-gram
    # equals doc2's windows — doc1 has 13 tokens -> windows at offsets
    # 0..3; doc2 has 12 tokens -> windows 0..2; shared exact 10-grams:
    # only the span itself ("tok0..tok9"), present in both.
    assert got.get(1) == 1
    assert got.get(2) == 1
    assert 3 not in got


def test_repetition_features_partition_invariant(spark):
    """Metrics must not depend on physical layout: integer counts + one
    final division give identical results under any repartitioning."""
    rows = [(i, f"w{i % 7} common span text w{i % 3} common span") for i in range(50)]
    df = _docs(spark, rows)
    a = sorted(map(tuple, repetition_features(df, ngram=2).collect()))
    b = sorted(
        map(tuple, repetition_features(df.repartition(13), ngram=2).collect())
    )
    assert a == b


def test_substring_spans_partition_invariant(spark, tmp_path):
    span = " ".join(f"s{i}" for i in range(10))
    rows = [(i, f"{span} tail{i}") for i in range(20)] + [
        (100 + i, f"unique{i} " + " ".join(f"u{i}_{j}" for j in range(10)))
        for i in range(5)
    ]
    for sub, n_parts in (("one", 1), ("many", 11)):
        _docs(spark, rows).repartition(n_parts).write.parquet(
            f"{tmp_path}/{sub}/documents.parquet"
        )
    from batch_processing_iac_aws_spark.plans import QUERIES

    a = sorted(map(tuple, QUERIES["dedup_substring_spans"](spark, f"{tmp_path}/one").collect()))
    b = sorted(map(tuple, QUERIES["dedup_substring_spans"](spark, f"{tmp_path}/many").collect()))
    assert a == b and len(a) == 20  # the 20 span-sharing docs, not the unique ones
