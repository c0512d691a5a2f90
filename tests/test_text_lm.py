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


def test_tfidf_rare_term_outranks_common(spark):
    from batch_processing_iac_aws_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "common common rare"),
            (2, "common filler words"),
            (3, "common other stuff"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tfidf_top_terms(df, k=1).collect()
    }
    # doc 1: tf(common)=2 but 'rare' has df=1 -> idf wins at equal-ish tf?
    # tf*idf: common 2*(ln(4/4)+1)=2.0, rare 1*(ln(4/2)+1)=1.693 -> common
    assert (1, "common") in got and abs(got[(1, "common")] - 2.0) < 1e-9
    # docs 2,3: every term tf=1; doc-unique terms (idf ln2+1) beat 'common'
    top2 = [k for k in got if k[0] == 2]
    assert top2 and top2[0][1] != "common"


def test_bm25_prefers_term_dense_short_docs(spark):
    from batch_processing_iac_aws_spark.operators.text import bm25_scores

    df = spark.createDataFrame(
        [
            (1, "spark spark spark"),
            (2, "spark padding padding padding padding padding padding"),
            (3, "unrelated words only here"),
        ],
        ["doc_id", "text"],
    )
    got = bm25_scores(df, ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 1 and 2 in ids and 3 not in ids
    assert all(r["n_query_terms_hit"] == 1 for r in got)
