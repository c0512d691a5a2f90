"""bigram_surprisal semantics: hand-checkable tiny corpus + the ordering
property that repetitive text scores lower (more predictable) than text
full of one-off bigrams. The sf0.01 differential check is the registered
text_perplexity oracle."""

from __future__ import annotations

import math

from batch_processing_iac_aws_spark.operators.text import bigram_surprisal


def test_bigram_surprisal_hand_computed(spark):
    # corpus: one doc "a b a b" -> bigrams (a,b) x2? no: a-b, b-a, a-b
    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    [row] = bigram_surprisal(df).collect()
    # bigrams: (a,b),(b,a),(a,b); counts: c(a,b)=2, c(b,a)=1; prefix:
    # c(a)=2, c(b)=1; vocab=2. add-1: P(b|a)=(2+1)/(2+2)=0.75,
    # P(a|b)=(1+1)/(1+2)=2/3
    want = -(2 * math.log2(0.75) + math.log2(2 / 3)) / 3
    assert row["n_bigrams"] == 3
    assert abs(row["avg_bits"] - round(want, 4)) < 1e-9


def test_repetitive_text_is_more_predictable(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["avg_bits"] for r in bigram_surprisal(df).collect()}
    assert got[1] < got[2]


def test_dedup_sentences_keeps_first_in_order(spark):
    from batch_processing_iac_aws_spark.operators.text import dedup_sentences

    df = spark.createDataFrame(
        [(1, "alpha. beta. alpha. gamma. beta"), (2, "solo")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in dedup_sentences(df).collect()}
    assert got[1]["text_dedup"] == "alpha. beta. gamma"
    assert got[1]["n_sentences"] == 5 and got[1]["n_removed"] == 2
    assert got[2]["text_dedup"] == "solo"
    assert got[2]["n_removed"] == 0
