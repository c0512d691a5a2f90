"""bpe_ish_tokens behavior + the no-private-API guard.

The tokenizer was rebuilt from a `Column._jc`-based `F.expr` hack to a pure
public-API composition (regexp_extract_all + filter); these tests pin the
tokenization semantics across that rewrite and grep the package so private
py4j attribute access can never come back (it breaks across Spark versions
and is incompatible with Spark Connect).
"""

from __future__ import annotations

import pathlib
import re

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.operators.text import bpe_ish_tokens


def test_bpe_ish_tokens_classes(spark):
    df = spark.createDataFrame(
        [
            (1, "don't stop-me now, it's 42x better!!"),
            (2, "   "),
            (3, "hello"),
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r["toks"]
        for r in df.select(
            "id", bpe_ish_tokens(F.col("text")).alias("toks")
        ).collect()
    }
    # GPT-2-style classes: contractions split off, letter runs, digit runs,
    # punctuation runs — whitespace never survives
    assert out[1] == [
        "don", "'t", "stop", "-", "me", "now", ",", "it", "'s",
        "42", "x", "better", "!!",
    ]
    assert out[2] == []
    assert out[3] == ["hello"]


def test_no_private_py4j_attribute_access():
    """No `._jc` / `._jdf` / `._jvm` / `._jsparkSession` anywhere in the
    package: the public DataFrame/Column API is the contract."""
    pkg = pathlib.Path(__file__).parents[1] / "batch_processing_iac_aws_spark"
    pattern = re.compile(r"\._j(c|df|vm|sparkSession)\b")
    offenders = [
        f"{p}:{i}"
        for p in sorted(pkg.rglob("*.py"))
        for i, line in enumerate(p.read_text().splitlines(), 1)
        if pattern.search(line)
    ]
    assert not offenders, f"private py4j access: {offenders}"


def test_count_tokens_fallback_matches_column_twin(spark):
    """In-sandbox the auto_tokenizer falls back to bpe_ish_tokenize_py —
    whose counts must equal the codegen Column path (same regex constant)
    on real corpus text, so registered-query oracles are unchanged."""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.operators.text import (
        bpe_ish_tokens,
        count_tokens,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    got = count_tokens(docs, out_col="n_udf").withColumn(
        "n_col", F.size(bpe_ish_tokens(F.col("text"))).cast("long")
    )
    assert got.filter(F.col("n_udf") != F.col("n_col")).count() == 0


def test_count_tokens_pluggable_fn_reaches_executors(spark):
    """The seam contract: a monkeypatched tokenize_fn is the one the
    EXECUTORS run (counts reflect it, not the fallback)."""
    from batch_processing_iac_aws_spark.operators.text import count_tokens

    df = spark.createDataFrame(
        [(1, "a|b|c"), (2, "x|y"), (3, None)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["n"]
        for r in count_tokens(
            df, out_col="n", tokenize_fn=lambda s: (s or "").split("|")
        ).collect()
    }
    # "".split("|") == [""] -> 1, so None scores 1 under this toy fn:
    # proof the PLUGGED fn ran, since the fallback scores None as 0
    assert out == {1: 3, 2: 2, 3: 1}


def test_bpe_ish_python_twin_matches_column(spark):
    from pyspark.sql import functions as F

    from batch_processing_iac_aws_spark.operators.text import (
        bpe_ish_tokenize_py,
        bpe_ish_tokens,
    )

    rows = [
        (1, "don't stop-me now, it's 42x better!!"),
        (2, "  "),
        (3, None),
        (4, "naïve café ΩΩ 3.14"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    col = {
        r["i"]: r["t"]
        for r in df.select(
            "i", bpe_ish_tokens(F.col("text")).alias("t")
        ).collect()
    }
    for i, text in rows:
        expect = bpe_ish_tokenize_py(text)
        got = col[i] if col[i] is not None else []
        assert got == expect, (i, got, expect)


def test_bpe_merge_loop_cascades_and_is_deterministic():
    """Canonical lowest-rank merge loop: merged symbols must feed LATER
    merges (cascading — 'w'+'indow' only exists after 'in'+'dow'), all
    left-to-right occurrences of the selected pair merge per round, and
    training twice on the same corpus yields identical merges."""
    from batch_processing_iac_aws_spark.operators.text import (
        make_bpe_tokenizer,
        train_bpe_merges,
    )

    merges = [("i", "n"), ("o", "w"), ("d", "ow"), ("in", "dow"),
              ("w", "indow")]
    tok = make_bpe_tokenizer(merges)
    assert tok("window") == ["window"]          # 5-level cascade
    assert tok("in in") == ["in", "in"]
    assert tok("iii") == ["i", "i", "i"]        # no (i,i) rule
    # all-occurrences-per-round: 'inin' -> in,in (rank 0 twice), no
    # cross-boundary ('n','i') merge exists
    assert tok("inin") == ["in", "in"]
    assert tok(None) == []
    corpus = ["window in dow", "window window in"] * 3
    assert train_bpe_merges(corpus, n_merges=6) == train_bpe_merges(
        corpus, n_merges=6
    )


def test_bpe_seam_counts_match_pure_python(spark):
    """count_tokens with the merge-loop BPE plugged through the seam must
    equal the pure-Python tokenizer applied row-by-row."""
    from pyspark.sql import functions as F  # noqa: F401

    from batch_processing_iac_aws_spark.operators.text import (
        count_tokens,
        load_bpe_merges,
        make_bpe_tokenizer,
    )

    merges = load_bpe_merges("/root/repo/fixtures/bpe_merges.txt")
    tok = make_bpe_tokenizer(merges)
    rows = [
        (1, "the fast key order sort table scan"),
        (2, "window column merge part"),
        (3, None),
        (4, "zzz unseen word!!"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r["i"]: r["n_tokens"]
        for r in count_tokens(
            df, text_col="text", tokenize_fn=make_bpe_tokenizer(merges)
        ).collect()
    }
    want = {i: len(tok(t)) for i, t in rows}
    assert got == want


def test_bpe_property_lossless_and_memo_consistent():
    """Property (Hypothesis): for ANY text and ANY trained merge list,
    (a) concatenating the BPE tokens of a word reproduces the word
    (merging never loses or invents characters), (b) every token is
    non-empty, (c) tokenizing twice (memo-warm) equals tokenizing with a
    fresh tokenizer (the memo can never change answers), and (d) token
    count is <= the character count of the pre-tokens (merges only
    shrink)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from batch_processing_iac_aws_spark.operators.text import (
        bpe_ish_tokenize_py,
        make_bpe_tokenizer,
        train_bpe_merges,
    )

    texts = st.lists(
        st.text(
            alphabet=st.sampled_from("abcdef '!.-0123 "), max_size=40
        ),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=60, deadline=None)
    @given(corpus=texts, probe=st.text(
        alphabet=st.sampled_from("abcdef '!.-0123 "), max_size=60
    ), n_merges=st.integers(min_value=0, max_value=12))
    def check(corpus, probe, n_merges):
        merges = train_bpe_merges(corpus, n_merges=n_merges)
        tok = make_bpe_tokenizer(merges)
        words = bpe_ish_tokenize_py(probe)
        out1 = tok(probe)
        out2 = make_bpe_tokenizer(merges)(probe)
        assert out1 == out2  # memo-warm == fresh
        assert all(t for t in out1)
        assert "".join(out1) == "".join(words)  # lossless
        assert len(out1) <= sum(len(w) for w in words)

    check()
