"""Property tests for corpus-management operators: the guarantees that make
hash-gated sampling and packing usable as REPRODUCIBLE training-data
infrastructure (partition-invariance, split disjointness, packing layout
invariants) — properties the DuckDB oracles alone don't pin down."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from batch_processing_iac_aws_spark.operators.corpus import (
    dataset_mixture,
    deterministic_sample,
    pack_sequences,
    scrub_pii,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    from batch_processing_iac_aws_spark.catalog import load_table

    return load_table(spark, SF, "documents")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_sample_is_partition_invariant(docs):
    """The gate hashes the key, never the layout: any repartitioning must
    yield the SAME sample (df.sample() does not have this property)."""
    a = _ids(deterministic_sample(docs, key_col="doc_id", keep_below_hex="40"))
    b = _ids(
        deterministic_sample(
            docs.repartition(7), key_col="doc_id", keep_below_hex="40"
        )
    )
    assert a == b and 0 < len(a) < docs.count()


def test_disjoint_gates_make_disjoint_splits(docs):
    """Train/validation from disjoint hex ranges on one salt can never
    overlap, and the '100' gate keeps everything."""
    train = set(
        _ids(deterministic_sample(docs, key_col="doc_id", keep_below_hex="e0"))
    )
    val = set(
        _ids(docs.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) >= "e0"
        ))
    )
    assert train.isdisjoint(val)
    assert len(train) + len(val) == docs.count()
    everything = _ids(
        deterministic_sample(docs, key_col="doc_id", keep_below_hex="100")
    )
    assert len(everything) == docs.count()


def test_different_salts_give_independent_samples(docs):
    a = set(_ids(deterministic_sample(docs, key_col="doc_id",
                                      keep_below_hex="40", salt="a")))
    b = set(_ids(deterministic_sample(docs, key_col="doc_id",
                                      keep_below_hex="40", salt="b")))
    assert a != b  # astronomically unlikely to collide if independent


def test_mixture_tags_and_respects_sources(docs):
    mixed = dataset_mixture(
        {
            "en": (docs.filter(F.col("lang") == "en"), "80"),
            "rest": (docs.filter(F.col("lang") != "en"), "20"),
        },
        key_col="doc_id",
    )
    rows = mixed.select("lang", "mix_source").collect()
    assert all(
        (r["mix_source"] == "en") == (r["lang"] == "en") for r in rows
    )


def test_pack_sequences_layout_invariants(docs):
    """Within a shard: bins fill contiguously — each doc starts exactly
    where the previous doc's tokens ended (cumulative layout), offsets are
    inside [0, ctx), and bin ids never decrease in id order."""
    ctx = 512
    packed = pack_sequences(
        docs, id_col="doc_id", text_col="text", context_len=ctx,
        shard_col="source",
    ).collect()
    by_shard: dict = {}
    for r in sorted(packed, key=lambda r: (r["source"], r["doc_id"])):
        assert 0 <= r["bin_offset"] < ctx
        cum = by_shard.get(r["source"], 0)
        assert r["bin_id"] * ctx + r["bin_offset"] == cum
        by_shard[r["source"]] = cum + r["n_tokens"]


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or call +44 20 7946 0958 now"),
            (2, "no pii here at all"),
        ],
        "id int, text string",
    )
    out = {r["id"]: r for r in scrub_pii(df).collect()}
    assert "<EMAIL>" in out[1]["scrubbed"] and "<PHONE>" in out[1]["scrubbed"]
    assert "example.org" not in out[1]["scrubbed"]
    assert "7946" not in out[1]["scrubbed"]
    assert out[1]["n_redactions"] == 2
    assert out[2]["scrubbed"] == "no pii here at all"
    assert out[2]["n_redactions"] == 0


def test_quota_cap_deterministic_best_first(spark):
    from batch_processing_iac_aws_spark.operators.corpus import quota_cap

    rows = [("a", i, float(i % 3)) for i in range(10)] + [("b", 99, 5.0)]
    df = spark.createDataFrame(rows, ["src", "id", "score"])
    got = quota_cap(
        df, group_col="src", order_col="score", id_col="id", max_per_group=3
    ).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], []).append(r["id"])
    # best score 2.0 at ids 2,5,8 -> tie-broken by id ascending
    assert sorted(by_src["a"]) == [2, 5, 8]
    assert by_src["b"] == [99]


def test_deterministic_split_proportions_and_stability(spark):
    from batch_processing_iac_aws_spark.operators.corpus import (
        deterministic_split,
    )

    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    got = deterministic_split(df, id_col="id").groupBy("split").count()
    counts = {r["split"]: r["count"] for r in got.collect()}
    assert 0.74 < counts["train"] / 2000 < 0.86
    assert 0.06 < counts["val"] / 2000 < 0.14
    assert 0.06 < counts["test"] / 2000 < 0.14
    # same id -> same split on a differently-partitioned recomputation
    again = deterministic_split(df.repartition(7), id_col="id")
    merged = (
        deterministic_split(df, id_col="id")
        .withColumnRenamed("split", "a")
        .join(again.withColumnRenamed("split", "b"), "id")
    )
    assert merged.filter("a != b").count() == 0


def test_balanced_shards_balance_and_coverage(spark):
    """Serpentine sharding on real corpus weights: every row assigned,
    all shards used, and shard token totals within one max-doc-weight of
    each other (the serpentine guarantee for sorted-desc input)."""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.operators.corpus import (
        balanced_shards,
    )

    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            "doc_id",
            F.size(F.split("text", r"\s+")).cast("long").alias("w"),
        )
    )
    out = balanced_shards(d, weight_col="w", id_col="doc_id", n_shards=8)
    assert out.count() == d.count()
    totals = {
        r["shard"]: r["t"]
        for r in out.groupBy("shard").agg(F.sum("w").alias("t")).collect()
    }
    assert sorted(totals) == list(range(8))
    max_w = d.agg(F.max("w")).collect()[0][0]
    assert max(totals.values()) - min(totals.values()) <= max_w
