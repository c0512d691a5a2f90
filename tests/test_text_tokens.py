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
