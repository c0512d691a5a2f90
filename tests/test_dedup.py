"""Property tests for dedup operators: determinism, MinHash estimate quality
vs exact Jaccard, SimHash behavior on near-identical texts."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from batch_processing_iac_aws_spark.operators.dedup import (
    exact_dedup,
    exact_jaccard,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash,
    simhash_near_duplicates,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact duplicate of 1
        (3, BASE.replace("lazy", "sleepy")),  # near-duplicate of 1
        (4, "completely different text about spark query engines and shuffles"),
        (5, "another unrelated document discussing parquet column pruning"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_smallest_id(spark, docs):
    out = exact_dedup(docs, ["text"], tiebreaker="doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 3, 4, 5}


def test_minhash_identical_docs_identical_signatures(spark, docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[4]


def test_minhash_deterministic(spark, docs):
    a = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    b = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert a == b


def test_lsh_finds_exact_and_near_duplicates(spark, docs):
    pairs = minhash_lsh_candidates(docs, num_perm=64, bands=16)
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got and got[(1, 3)] > 0.5
    assert (4, 5) not in got


def test_minhash_estimate_close_to_exact_jaccard(spark, docs):
    pairs = minhash_lsh_candidates(docs, num_perm=64, bands=16)
    exact = exact_jaccard(docs, pairs.select("id_a", "id_b"))
    joined = {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in exact.collect()
    }
    for r in pairs.collect():
        est, true = r["est_jaccard"], joined[(r["id_a"], r["id_b"])]
        assert abs(est - true) < 0.25, (r["id_a"], r["id_b"], est, true)


def test_simhash_properties(spark, docs):
    hashes = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert hashes[1] == hashes[2]  # identical text -> identical hash

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert hamming(hashes[1], hashes[3]) < hamming(hashes[1], hashes[4])


def test_simhash_near_duplicates(spark, docs):
    out = simhash_near_duplicates(docs, max_hamming=3)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs  # identical text -> hamming 0
    assert (4, 5) not in pairs

    # distances beyond the 4-chunk pigeonhole guarantee must refuse, not
    # silently lose recall (a hamming-4 pair can differ in all 4 chunks)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_duplicates(docs, max_hamming=4)


def test_minhash_on_real_documents(spark):
    """sf0.001 documents: candidates (if any) must all verify with nonzero
    exact shingle overlap — LSH shouldn't produce wild false positives at
    64/16 parameters."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_candidates(docs, num_perm=64, bands=16)
    verified = exact_jaccard(docs, pairs.select("id_a", "id_b"))
    rows = verified.collect()
    for r in rows:
        assert r["jaccard"] > 0.0, f"false positive pair {r}"


def test_connected_components_transitive(spark):
    from batch_processing_iac_aws_spark.operators.dedup import (
        connected_components,
    )

    # two components: {1,2,3,4} via a chain (1-2, 2-3, 3-4) and {7,9}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 9)], "id_a long, id_b long"
    )
    comp = {
        r["vertex"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}


def test_fuzzy_dedup_keep_one_planted_clusters(spark):
    from batch_processing_iac_aws_spark.operators.dedup import (
        fuzzy_dedup_keep_one,
    )

    # planted cluster A = {1, 2, 3} (exact + one-word-change near-dups,
    # transitively linked), cluster B = {10, 11}, uniques = {4, 5}
    rows = [
        (1, BASE),
        (2, BASE),
        (3, BASE.replace("lazy", "sleepy")),
        (4, "completely different text about spark query engines and shuffles"),
        (5, "another unrelated document discussing parquet column pruning"),
        (10, BASE.replace("fox", "wolf").replace("garden", "meadow")),
        (11, BASE.replace("fox", "wolf").replace("garden", "meadow")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # one changed word in a 24-word doc shifts 3 of ~22 shingles:
    # J(1,3) ~ 0.76, so the verify threshold must sit below that to link
    # the near-dup (and the default 0.8 correctly would NOT)
    survivors = sorted(
        r["doc_id"]
        for r in fuzzy_dedup_keep_one(df, jaccard_threshold=0.7).collect()
    )
    assert survivors == [1, 4, 5, 10]
    strict = sorted(r["doc_id"] for r in fuzzy_dedup_keep_one(df).collect())
    assert strict == [1, 3, 4, 5, 10]  # 0.8 keeps the 0.76-similar doc


def test_simhash_banding_is_exhaustive_by_pigeonhole(spark):
    """STRUCTURAL recall guarantee: with 4 chunks of 16 bits, any pair at
    hamming distance <= 3 differs in at most 3 chunks, so at least one
    chunk matches exactly and the banded equi-join MUST propose the pair
    (no probabilistic miss, unlike MinHash banding). Verify the banded
    candidate set equals an exhaustive all-pairs hamming scan on real
    sf0.001 documents."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hashes = [(r["doc_id"], r["simhash"]) for r in simhash(docs).collect()]

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & (2**64 - 1)).count("1")

    truth = {
        (min(i, j), max(i, j))
        for k, (i, hi) in enumerate(hashes)
        for j, hj in hashes[k + 1:]
        if hamming(hi, hj) <= 3
    }
    banded = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in simhash_near_duplicates(docs, max_hamming=3).collect()
    }
    assert banded == truth and truth  # non-vacuous on this corpus


def test_incremental_fuzzy_dedup_index_roundtrip(spark, tmp_path):
    """The rolling-corpus restart story: run 1 builds the MinHash signature
    index from history and persists it to parquet; run 2 (a fresh lineage —
    only the parquet survives a driver restart) reads the index back, dedups
    a new batch against it, and must reach the IDENTICAL survivor set as an
    in-memory pass. Also proves the exact-verify and index-only (est
    Jaccard) modes agree on planted near-dups, and that appending the
    survivors' signatures makes the next run catch intra-era repeats."""
    from batch_processing_iac_aws_spark.operators.dedup import (
        incremental_fuzzy_dedup,
    )

    history = spark.createDataFrame(
        [(1, BASE), (4, "completely different text about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, BASE),  # exact re-crawl of history doc 1 -> drop
            (11, BASE.replace("lazy", "sleepy")),  # near-dup of 1 -> drop
            (12, "fresh unrelated document about parquet column pruning"),
        ],
        "doc_id long, text string",
    )
    idx_path = str(tmp_path / "sig_index")
    minhash_signatures(history).write.parquet(idx_path)

    index = spark.read.parquet(idx_path)
    survivors = incremental_fuzzy_dedup(
        batch, index, history=history, jaccard_threshold=0.7
    )
    got = sorted(r["doc_id"] for r in survivors.collect())
    assert got == [12]

    # in-memory twin must agree exactly (parquet round-trip is lossless)
    in_mem = incremental_fuzzy_dedup(
        batch, minhash_signatures(history), history=history,
        jaccard_threshold=0.7,
    )
    assert sorted(r["doc_id"] for r in in_mem.collect()) == got

    # index-only mode (bodies archived cold): est-Jaccard decision drops the
    # same planted dups at a threshold below the estimator's variance band
    est_mode = incremental_fuzzy_dedup(
        batch, index, history=None, jaccard_threshold=0.6
    )
    assert sorted(r["doc_id"] for r in est_mode.collect()) == [12]

    # era 2: survivors land in the corpus store and their signatures append
    # to the index (the bookmark step) — both as parquet, which is exactly
    # what survives a driver restart (the new index at a versioned path:
    # overwriting a path still being lazily read is a read-under-write).
    # Re-ingesting a re-crawl of doc 12 only the GROWN index can catch.
    corpus_path = str(tmp_path / "corpus_era1")
    idx_path2 = str(tmp_path / "sig_index_v2")
    survivors.write.parquet(corpus_path)
    era1 = spark.read.parquet(corpus_path)
    index.unionByName(minhash_signatures(era1)).write.parquet(idx_path2)
    batch2 = spark.createDataFrame(
        [(20, "fresh unrelated document about parquet column pruning")],
        "doc_id long, text string",
    )
    bodies = history.unionByName(era1.select("doc_id", "text"))
    out2 = incremental_fuzzy_dedup(
        batch2, spark.read.parquet(idx_path2), history=bodies,
        jaccard_threshold=0.7,
    )
    assert out2.count() == 0


def test_incremental_fuzzy_dedup_prebanded_index(spark, tmp_path):
    """The 100 TB index layout: (id, band_idx, band_hash) written once via
    banded_signatures and persisted, so each batch run skips history
    banding. Must produce survivors identical to the compact (id, sig)
    layout, and index-only mode must refuse it loudly (no signatures to
    estimate Jaccard from)."""
    from batch_processing_iac_aws_spark.operators.dedup import (
        banded_signatures,
        incremental_fuzzy_dedup,
    )

    history = spark.createDataFrame(
        [(1, BASE), (4, "completely different text about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, BASE),
            (11, BASE.replace("lazy", "sleepy")),
            (12, "fresh unrelated document about parquet column pruning"),
        ],
        "doc_id long, text string",
    )
    banded_path = str(tmp_path / "banded_index")
    banded_signatures(minhash_signatures(history)).write.parquet(banded_path)
    banded = spark.read.parquet(banded_path)

    via_banded = incremental_fuzzy_dedup(
        batch, banded, history=history, jaccard_threshold=0.7
    )
    assert sorted(r["doc_id"] for r in via_banded.collect()) == [12]

    via_compact = incremental_fuzzy_dedup(
        batch, minhash_signatures(history), history=history,
        jaccard_threshold=0.7,
    )
    assert sorted(r["doc_id"] for r in via_compact.collect()) == [12]

    with pytest.raises(ValueError, match="compact"):
        incremental_fuzzy_dedup(batch, banded, history=None)


def test_lsh_max_bucket_caps_degenerate_buckets(spark):
    """The boilerplate-bomb guard: 40 byte-identical docs put 40 members in
    every one of their band buckets; with max_bucket=10 those buckets drop
    and the clique contributes ZERO candidate pairs (bounded worst case —
    exact dedup owns byte-identical content), while a small near-dup
    cluster in normal-width buckets is still proposed."""
    rows = [(i, "identical boilerplate template text repeated everywhere "
                "on every page of the site") for i in range(40)]
    rows += [
        (100, BASE),
        (101, BASE.replace("lazy", "sleepy")),
        (102, "completely different text about spark query engines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(df, max_bucket=10).collect()
    }
    assert all(a >= 100 and b >= 100 for a, b in capped), capped
    assert (100, 101) in capped  # normal buckets unaffected

    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(df).collect()
    }
    # default None keeps exhaustive behavior: the 40-clique's 780 pairs
    assert len([p for p in uncapped if p[0] < 40 and p[1] < 40]) == 780


def test_incremental_simhash_dedup_roundtrip_and_exhaustive(spark, tmp_path):
    """SimHash incremental dedup on real sf0.001 documents with a parquet
    round-tripped (id, simhash) index: survivors must EXACTLY equal an
    all-pairs batch x history hamming scan computed driver-side — the
    pigeonhole guarantee is structural, so unlike MinHash there is no
    probabilistic miss to tolerate."""
    from batch_processing_iac_aws_spark.operators.dedup import (
        incremental_simhash_dedup,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    history = docs.filter(F.col("doc_id") % 5 == 0)
    batch = docs.filter(F.col("doc_id") % 5 != 0)

    idx_path = str(tmp_path / "simhash_index")
    simhash(history).select("doc_id", "simhash").write.parquet(idx_path)
    survivors = incremental_simhash_dedup(
        batch, spark.read.parquet(idx_path), max_hamming=3
    )
    got = sorted(r["doc_id"] for r in survivors.collect())

    hh = [(r["doc_id"], r["simhash"]) for r in simhash(history).collect()]
    hb = [(r["doc_id"], r["simhash"]) for r in simhash(batch).collect()]

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & (2**64 - 1)).count("1")

    truth = sorted(
        i for i, hi in hb if all(hamming(hi, hj) > 3 for _, hj in hh)
    )
    assert got == truth
    assert len(truth) < batch.count()  # non-vacuous: some batch docs drop


def test_signature_index_family_mismatch_fails_loudly(spark):
    """A stored index written under a different hash family must raise,
    not silently produce zero candidates: banding verifies signature
    length per row, and the pre-banded layout verifies band_idx range."""
    from batch_processing_iac_aws_spark.operators.dedup import (
        banded_signatures,
        incremental_fuzzy_dedup,
    )

    batch = spark.createDataFrame([(10, BASE)], "doc_id long, text string")
    # index written with num_perm=128, consumed at the default 64
    idx128 = minhash_signatures(
        spark.createDataFrame([(1, BASE)], "doc_id long, text string"),
        num_perm=128,
    )
    with pytest.raises(Exception, match="signature length"):
        incremental_fuzzy_dedup(batch, idx128, history=None).collect()

    # pre-banded index with the WRONG band count — both directions must
    # refuse (max band_idx != bands-1 catches more AND fewer bands)
    hist = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    hist_sig = minhash_signatures(hist)
    for wrong_bands in (32, 8):
        wrong = banded_signatures(hist_sig, bands=wrong_bands, num_perm=64)
        with pytest.raises(ValueError, match="band_idx"):
            incremental_fuzzy_dedup(batch, wrong, history=hist, bands=16)


def test_incremental_fuzzy_dedup_tolerates_colliding_id_spaces(spark):
    """Batch and history reusing one id space (stable URL-keyed re-crawls)
    must not merge shingle sets: doc id=1 exists on BOTH sides with
    unrelated content, and the unrelated batch doc must survive — before
    the prefix disambiguation, the merged id-1 shingle set could inflate
    scores and drop it."""
    from batch_processing_iac_aws_spark.operators.dedup import (
        incremental_fuzzy_dedup,
    )

    history = spark.createDataFrame(
        [(1, BASE), (2, "completely different text about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "totally fresh reworked page sharing nothing with before"),
            (3, BASE),  # true near-dup of history doc 1 -> drop
        ],
        "doc_id long, text string",
    )
    out = incremental_fuzzy_dedup(
        batch, minhash_signatures(history), history=history,
        jaccard_threshold=0.7,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1]


def test_incremental_simhash_family_guard_and_prechunked_layout(spark):
    """(a) a 64-bit xxhash64 index consumed at 60 portable bits must raise
    (stored hashes carry bits above position 60); (b) the pre-chunked
    (id, simhash, chunk_idx, chunk) layout must produce survivors
    identical to the compact (id, simhash) layout."""
    from batch_processing_iac_aws_spark.operators.dedup import (
        chunked_simhash,
        incremental_simhash_dedup,
    )

    history = spark.createDataFrame(
        [(1, BASE), (4, "completely different text about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, BASE), (12, "fresh unrelated document about column pruning")],
        "doc_id long, text string",
    )

    idx64 = simhash(history, bits=64)  # wider family than bits=60
    with pytest.raises(Exception, match="wider hash family"):
        incremental_simhash_dedup(batch, idx64, bits=60).collect()

    compact = simhash(history, bits=64)
    via_compact = sorted(
        r["doc_id"]
        for r in incremental_simhash_dedup(batch, compact, bits=64).collect()
    )
    prechunked = chunked_simhash(simhash(history, bits=64), bits=64)
    via_chunked = sorted(
        r["doc_id"]
        for r in incremental_simhash_dedup(
            batch, prechunked, bits=64
        ).collect()
    )
    assert via_compact == via_chunked == [12]


def test_capped_lsh_zero_collateral_on_clean_docs(spark):
    """Promotes the ARCHITECTURE.md boilerplate-bomb measurement to an
    assertion: inject a 200-doc byte-identical clique into the real
    sf0.001 corpus; with max_bucket=100 the capped run must produce
    EXACTLY the clean corpus's verified near-dup pairs — the bomb
    contributes zero candidates and costs zero recall on clean content
    (the guarantee dedup_minhash_capped's oracle equality rests on)."""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.operators.dedup import (
        verified_near_duplicates,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    bomb = spark.createDataFrame(
        [(1_000_000 + i, "identical boilerplate template text repeated "
                         "verbatim on every page of the site")
         for i in range(200)],
        "doc_id long, text string",
    )
    clean_pairs = {
        (r["id_a"], r["id_b"])
        for r in verified_near_duplicates(
            docs, jaccard_threshold=0.9, max_bucket=100
        ).collect()
    }
    bombed_pairs = {
        (r["id_a"], r["id_b"])
        for r in verified_near_duplicates(
            docs.unionByName(bomb), jaccard_threshold=0.9, max_bucket=100
        ).collect()
    }
    assert bombed_pairs == clean_pairs  # bomb gone, zero collateral loss
    assert all(a < 1_000_000 and b < 1_000_000 for a, b in bombed_pairs)


def test_bloom_prefilter_exact_and_both_paths_fire(spark):
    """Relational Bloom prefilter: result must equal the plain anti-join
    (exactness), the definitely-new shortcut must actually skip docs
    (hits < n_hashes exists), and the candidate path must carry the true
    duplicate. Also: m_bits must reject non-powers-of-two (the two-step
    mod is only engine-portable for powers of two)."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from batch_processing_iac_aws_spark.operators.dedup import (
        _bloom_positions,
        bloom_prefilter_dedup,
        build_bloom_index,
    )

    history = spark.createDataFrame(
        [(0, "alpha text"), (5, "beta text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1, "alpha text"), (2, "gamma text"), (3, "delta text")],
        "doc_id long, text string",
    )
    index = history.select(
        F.sha2(F.col("text"), 256).alias("content_hash")
    ).distinct()
    bloom = build_bloom_index(history, m_bits=1 << 12, n_hashes=4)
    got = bloom_prefilter_dedup(
        batch, index, bloom, m_bits=1 << 12, n_hashes=4
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [2, 3]

    # the shortcut really fires: at 4096 bits with 8 set, a random new
    # doc's 4 positions are (essentially) never all set
    probed = (
        batch.withColumn("content_hash", F.sha2(F.col("text"), 256))
        .select(
            "doc_id",
            F.explode(
                _bloom_positions(
                    F.col("content_hash"), m_bits=1 << 12, n_hashes=4
                )
            ).alias("bloom_pos"),
        )
        .join(bloom, "bloom_pos", "left_semi")
        .groupBy("doc_id")
        .count()
    )
    hits = {r["doc_id"]: r["count"] for r in probed.collect()}
    assert hits.get(1) == 4  # the true dup is a full-hit candidate
    assert hits.get(2, 0) < 4 and hits.get(3, 0) < 4  # shortcut fired

    with _pytest.raises(ValueError, match="power of two"):
        build_bloom_index(history, m_bits=1000, n_hashes=4)


def test_bloom_prefilter_within_batch_duplicates(spark):
    """A hash repeated c times in the batch must behave exactly as in the
    plain anti-join: every copy of a repeated NEW text survives, every
    copy of a repeated KNOWN text is dropped. (Regression: counting raw
    probe-hit rows instead of distinct hit positions made a c-times
    repeated hash score c*hits, landing in neither the definitely-new nor
    the candidate branch — all copies silently vanished.)"""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.operators.dedup import (
        bloom_prefilter_dedup,
        build_bloom_index,
    )

    history = spark.createDataFrame(
        [(0, "alpha text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "repeated new text"),
            (2, "repeated new text"),
            (3, "repeated new text"),
            (4, "alpha text"),
            (5, "alpha text"),
        ],
        "doc_id long, text string",
    )
    index = history.select(
        F.sha2(F.col("text"), 256).alias("content_hash")
    ).distinct()
    # tiny filter saturated by construction: 2 bits, everything collides,
    # so the repeated-new hash takes the CANDIDATE path (hits==n_hashes)
    bloom_sat = build_bloom_index(history, m_bits=1 << 1, n_hashes=4)
    got = bloom_prefilter_dedup(
        batch, index, bloom_sat, m_bits=1 << 1, n_hashes=4
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2, 3]

    # roomy filter: the repeated-new hash takes the definitely-new path
    bloom = build_bloom_index(history, m_bits=1 << 12, n_hashes=4)
    got2 = bloom_prefilter_dedup(
        batch, index, bloom, m_bits=1 << 12, n_hashes=4
    )
    assert sorted(r["doc_id"] for r in got2.collect()) == [1, 2, 3]


def test_band_bloom_prefilter_exact_prunes_and_checks_family(spark):
    """The band-key Bloom in front of the banded MinHash join: result
    must EQUAL the unfiltered incremental fuzzy dedup (no false
    negatives), the prefilter must actually DROP band keys with no
    history partner (the mostly-new-batch win), and a family mismatch
    must raise loudly."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from batch_processing_iac_aws_spark.operators.dedup import (
        _band_bloom_prefilter,
        banded_signatures,
        build_band_bloom_index,
        incremental_fuzzy_dedup,
        minhash_signatures,
    )

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight looking for food")
    rows = [(i, f"{base} variant {i} " + "filler words " * i) for i in range(8)]
    rows.append((100, base))  # near-dup of doc 0's text family
    df = spark.createDataFrame(rows, "doc_id long, text string")
    history = df.filter(F.col("doc_id") % 2 == 0)
    batch = df.filter(F.col("doc_id") % 2 != 0)
    index = minhash_signatures(history, id_col="doc_id", text_col="text")
    prebanded = banded_signatures(index, id_col="doc_id").select(
        "doc_id", "band_idx", "band_hash"
    )
    bloom = build_band_bloom_index(prebanded, m_bits=1 << 12, n_hashes=4)

    plain = sorted(
        r["doc_id"]
        for r in incremental_fuzzy_dedup(
            batch, index, history=history, jaccard_threshold=0.5
        ).collect()
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_fuzzy_dedup(
            batch,
            prebanded,
            history=history,
            jaccard_threshold=0.5,
            band_bloom=bloom,
            bloom_m_bits=1 << 12,
            bloom_n_hashes=4,
        ).collect()
    )
    assert got == plain

    # the prefilter really prunes: batch band keys not in history shrink
    bb = banded_signatures(
        minhash_signatures(batch, id_col="doc_id", text_col="text"),
        id_col="doc_id",
    ).select("doc_id", "band_idx", "band_hash")
    kept = _band_bloom_prefilter(
        bb, bloom, m_bits=1 << 12, n_hashes=4
    ).count()
    assert kept < bb.count()

    with _pytest.raises(ValueError, match="family mismatch"):
        incremental_fuzzy_dedup(
            batch,
            prebanded,
            history=history,
            band_bloom=bloom,
            bloom_m_bits=1 << 13,
            bloom_n_hashes=4,
        ).collect()


def test_keep_best_picks_quality_not_id(spark):
    """keep-best must keep the highest-quality cluster member even when
    it has the HIGHEST id (where keep-one would keep the lowest id), and
    must agree with keep-one on singleton (non-duplicate) docs."""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.operators.dedup import (
        fuzzy_dedup_keep_best,
        fuzzy_dedup_keep_one,
    )

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest tonight")
    rows = [
        (1, base, 10),
        (2, base, 30),          # same text, higher quality, higher id
        (3, "completely unrelated text about spark engines", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q long")
    best = sorted(
        r["doc_id"]
        for r in fuzzy_dedup_keep_best(
            df, quality_col="q", jaccard_threshold=0.8
        ).collect()
    )
    one = sorted(
        r["doc_id"]
        for r in fuzzy_dedup_keep_one(df, jaccard_threshold=0.8).collect()
    )
    assert best == [2, 3]  # quality wins
    assert one == [1, 3]   # lowest id wins


def test_bloom_prefilter_null_text_and_family_mismatch(spark):
    """Anti-join parity for degenerate rows and the loud trust boundary:
    NULL-text batch docs must SURVIVE (NULL hash never equals anything
    under anti-join semantics), and probing with parameters different
    from the build must raise instead of silently leaking duplicates
    through the definitely-new shortcut."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    from batch_processing_iac_aws_spark.operators.dedup import (
        bloom_prefilter_dedup,
        build_bloom_index,
    )

    history = spark.createDataFrame(
        [(0, "alpha text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1, "alpha text"), (2, None), (3, "new text")],
        "doc_id long, text string",
    )
    index = history.select(
        F.sha2(F.col("text"), 256).alias("content_hash")
    ).distinct()
    bloom = build_bloom_index(history, m_bits=1 << 12, n_hashes=4)
    got = bloom_prefilter_dedup(
        batch, index, bloom, m_bits=1 << 12, n_hashes=4
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [2, 3]

    with _pytest.raises(ValueError, match="family mismatch"):
        bloom_prefilter_dedup(
            batch, index, bloom, m_bits=1 << 13, n_hashes=4
        )
    with _pytest.raises(ValueError, match="family mismatch"):
        bloom_prefilter_dedup(
            batch, index, bloom, m_bits=1 << 12, n_hashes=3
        )


def test_incremental_sparse_catches_permutations_minhash_misses(spark):
    """The fifth incremental modality's reason to exist: a word-reversed
    re-crawl shares almost no 3-shingles (MinHash keeps it) but has
    bag-of-words cosine exactly 1.0 (sparse dedup drops it). Also: a
    genuinely different doc survives, NULL-text batch rows survive, and
    batch docs sharing NO hash slot with history never pair."""
    import pyspark.sql.functions as F

    from batch_processing_iac_aws_spark.operators.dedup import (
        incremental_fuzzy_dedup,
        incremental_sparse_dedup,
        minhash_signatures,
    )
    from batch_processing_iac_aws_spark.operators.text import (
        hashed_doc_vectors,
    )

    hist_text = ("the quick brown fox jumps over the lazy dog and runs "
                 "far away into the deep dark forest tonight")
    rev_text = " ".join(reversed(hist_text.split()))
    history = spark.createDataFrame(
        [(0, hist_text)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, rev_text),                     # permuted re-crawl
            (2, "zebra xylophone quasar nebula umbra"),  # disjoint words
            (3, None),                         # null text
        ],
        "doc_id long, text string",
    )
    index = hashed_doc_vectors(history, dim=1 << 12)
    sparse_out = sorted(
        r["doc_id"]
        for r in incremental_sparse_dedup(
            batch, index, dim=1 << 12, threshold=0.95
        ).collect()
    )
    assert sparse_out == [2, 3]  # the permutation dropped, others kept

    sig_index = minhash_signatures(history, id_col="doc_id")
    fuzzy_out = sorted(
        r["doc_id"]
        for r in incremental_fuzzy_dedup(
            batch, sig_index, history=history, jaccard_threshold=0.9
        ).collect()
    )
    assert 1 in fuzzy_out  # MinHash keeps the permutation — the gap


def test_bloom_family_check_rejects_mixed_union(spark):
    """A position table accidentally unioned from TWO families must raise
    even when the probe matches one of them: a min-only metadata check
    passed whenever the probe equaled the smaller family while half the
    bits were hashed under the other — exactly the silent false negatives
    the family check exists to prevent."""
    import pytest as _pytest

    from batch_processing_iac_aws_spark.operators.dedup import (
        bloom_prefilter_dedup,
        build_bloom_index,
    )

    history = spark.createDataFrame(
        [(0, "alpha text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1, "alpha text")], "doc_id long, text string"
    )
    index = history.select(
        F.sha2(F.col("text"), 256).alias("content_hash")
    ).distinct()
    small = build_bloom_index(history, m_bits=1 << 12, n_hashes=4)
    big = build_bloom_index(history, m_bits=1 << 13, n_hashes=4)
    mixed = small.unionByName(big)
    # probe matches the SMALLER family's parameters — the case a min-only
    # check waved through
    with _pytest.raises(ValueError, match="mixes families"):
        bloom_prefilter_dedup(
            batch, index, mixed, m_bits=1 << 12, n_hashes=4
        )
