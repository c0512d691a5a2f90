"""Multimodal plumbing contracts: schema, cardinality, determinism of the
mapInPandas media operators (codec work is stubbed by design — the Spark
side is what's under test)."""

from __future__ import annotations

import pyspark.sql.functions as F

from batch_processing_iac_aws_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    resize_media,
    sample_frames,
    text_as_media,
)


def _media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "quick brown fox"), (3, "")],
        "doc_id long, text string",
    )
    return text_as_media(docs)


def test_text_as_media_matches_schema(spark):
    m = _media(spark)
    assert m.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    meta = {r["media_id"]: r["meta"] for r in m.collect()}
    assert meta[1]["n_bytes"] == len(b"hello world")
    assert meta[1]["mime"] == "text/plain"


def test_extract_features_deterministic(spark):
    m = _media(spark)
    out = extract_features(m)
    assert out.schema.simpleString() == FEATURE_SCHEMA.simpleString()
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, extract_features(_media(spark)).collect()))
    assert a == b
    assert all(len(r["features"]) == 8 for r in out.collect())


def test_resize_media_rewrites_meta_and_payload(spark):
    out = resize_media(_media(spark), width=64, height=48)
    assert out.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    for r in out.collect():
        assert r["meta"]["width"] == 64
        assert r["meta"]["height"] == 48
        assert len(r["payload"]) == min(64 * 48, 4096)
        assert r["meta"]["n_bytes"] == len(r["payload"])


def test_sample_frames_cardinality_and_grid(spark):
    out = sample_frames(_media(spark), n_frames=3, frame_ms=500)
    assert out.schema.simpleString() == FRAME_SCHEMA.simpleString()
    rows = out.collect()
    assert len(rows) == 3 * 3  # 3 media rows x 3 frames
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    for grp in by_media.values():
        grp.sort(key=lambda r: r["frame_idx"])
        assert [g["frame_idx"] for g in grp] == [0, 1, 2]
        assert [g["pts_ms"] for g in grp] == [0, 500, 1000]
        # distinct frames from one payload (idx is salted into the digest)
        assert len({bytes(g["frame"]) for g in grp}) == 3


def test_auto_decoder_falls_back_without_pil():
    """In this codec-free container the auto decoder must select the
    deterministic fake, and the real path must raise NotImplementedError."""
    import pytest

    from batch_processing_iac_aws_spark.operators.multimodal import (
        _fake_features,
        auto_image_decoder,
        decode_image_real,
    )

    fn = auto_image_decoder(feature_dim=8)
    assert fn(b"payload") == _fake_features(b"payload", 8)
    with pytest.raises(NotImplementedError):
        decode_image_real(b"payload")


def test_auto_decoder_uses_real_pil_when_importable(monkeypatch):
    """Monkeypatch a minimal fake PIL into sys.modules: the auto decoder
    must route through the REAL decode path (Image.open -> convert ->
    resize -> getdata), proving the off-sandbox wiring without shipping an
    image library."""
    import sys
    import types

    calls = {}

    class _FakeImg:
        def convert(self, mode):
            calls["convert"] = mode
            return self

        def resize(self, wh):
            calls["resize"] = wh
            return self

        def getdata(self):
            return [0, 51, 102, 153, 204, 255, 0, 51]

    fake_image_mod = types.SimpleNamespace(
        open=lambda buf: calls.setdefault("opened", True) and _FakeImg()
        or _FakeImg()
    )
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(
        sys.modules, "PIL.Image", types.ModuleType("PIL.Image")
    )
    sys.modules["PIL.Image"].open = fake_image_mod.open

    from batch_processing_iac_aws_spark.operators.multimodal import (
        auto_image_decoder,
    )

    fn = auto_image_decoder(feature_dim=8)
    out = fn(b"\x89PNG-ish")
    assert calls == {"opened": True, "convert": "L", "resize": (8, 1)}
    assert out == [v / 255.0 for v in [0, 51, 102, 153, 204, 255, 0, 51]]


def _py_ahash(feats: list[float], dim: int) -> int:
    s = sum(feats)
    return sum((1 << j) for j, f in enumerate(feats) if f * dim > s)


def test_ahash_pack_matches_python_including_ties(spark):
    """ahash_pack = brighter-than-mean bits packed little-endian, with the
    integer cross-multiplied comparison (dim * f > sum) and ties rounding
    DOWN — checked bit-for-bit against a pure-Python fold, including an
    all-equal vector (every comparison a tie -> phash 0)."""
    from batch_processing_iac_aws_spark.operators.multimodal import ahash_pack

    rows = [
        (1, [float(b) for b in range(8)]),
        (2, [3.0] * 8),                      # all ties -> 0
        (3, [0.0, 255.0] * 4),
        (4, [7.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "media_id long, features array<double>")
    got = {
        r["media_id"]: r["phash"]
        for r in ahash_pack(df, dim=8).collect()
    }
    for mid, feats in rows:
        assert got[mid] == _py_ahash(feats, 8), mid
    assert got[2] == 0


def test_media_phash_pairs_pigeonhole_recall_vs_bruteforce(spark):
    """hamming_band_pairs' 4-chunk pigeonhole through the media path:
    feature vectors CRAFTED so their aHashes sit at exact hamming
    distances 0/1/2/3/4 from a base — pairs at <= max_hamming are all
    found (structural recall, no sampling), the hamming-3 pair appears at
    max_hamming=3 but not 2, and hamming-4 never (beyond the pigeonhole
    contract). Verified against an exhaustive numpy scan of the packed
    hashes."""
    from itertools import combinations

    from batch_processing_iac_aws_spark.operators.multimodal import (
        ahash_pack,
        media_phash_pairs,
    )

    dim = 32
    base = [10.0] * 16 + [200.0] * 16  # bits 16..31 set
    def flip(v, *bits):  # flipping bit j: cross mean at position j
        out = list(v)
        for j in bits:
            out[j] = 200.0 if out[j] == 10.0 else 10.0
        return out

    rows = [
        (0, base),
        (1, flip(base, 0)),          # hamming 1 from base
        (2, flip(base, 1, 2)),       # hamming 2
        (3, flip(base, 3, 4, 5)),    # hamming 3
        (4, flip(base, 6, 7, 8, 9)), # hamming 4
    ]
    df = spark.createDataFrame(rows, "media_id long, features array<double>")
    hashes = {
        r["media_id"]: r["phash"]
        for r in ahash_pack(df, dim=dim).collect()
    }
    # the crafted flips must land where intended (mean stays between the
    # two levels since exactly half the values sit at each level +- flips)
    exact = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in combinations(sorted(hashes), 2)
    }
    assert exact[(0, 1)] == 1 and exact[(0, 2)] == 2
    assert exact[(0, 3)] == 3 and exact[(0, 4)] == 4
    for mh in (2, 3):
        got = {
            (r["media_id_a"], r["media_id_b"]): r["hamming"]
            for r in media_phash_pairs(df, dim=dim, max_hamming=mh).collect()
        }
        want = {p: h for p, h in exact.items() if h <= mh}
        assert got == want, (mh, got, want)


def test_media_phash_pairs_through_decode_seam(spark):
    """The SAME pack+band plan over the real decode seam (extract_features'
    stub decoder -> 8-dim features): byte-identical payloads collide at
    hamming 0, and the result matches an exhaustive scan of the packed
    hashes — the engine-side proof the registered portable query's
    machinery carries over to decoder features verbatim."""
    from itertools import combinations

    from batch_processing_iac_aws_spark.operators.multimodal import (
        ahash_pack,
        extract_features,
        media_phash_pairs,
        text_as_media,
    )

    docs = spark.createDataFrame(
        [(i, f"document body {i}") for i in range(20)]
        + [(100 + i, f"document body {i}") for i in range(5)],
        "doc_id long, text string",
    )
    feats = extract_features(text_as_media(docs)).select(
        "media_id", F.col("features").cast("array<double>").alias("features")
    )
    hashes = {
        r["media_id"]: r["phash"]
        for r in ahash_pack(feats, dim=8).collect()
    }
    want = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 1
    }
    got = {
        (r["media_id_a"], r["media_id_b"]): r["hamming"]
        for r in media_phash_pairs(feats, dim=8, max_hamming=1).collect()
    }
    assert got == want
    for i in range(5):
        assert got.get((i, 100 + i)) == 0


def test_registered_relational_ahash_equals_ahash_pack(spark):
    """The registered query's exploded relational aHash (posexplode ->
    window sum -> conditional bit agg — used because its md5
    expression-family features would be re-inlined by projection
    collapse) is bit-for-bit the same hash as ahash_pack over the same
    features, for every document."""
    from pyspark.sql import Window as W

    from batch_processing_iac_aws_spark.operators.multimodal import (
        ahash_pack,
        text_as_media,
    )
    from batch_processing_iac_aws_spark.plans.llm import _md5_lower60

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text").limit(100)
    media = text_as_media(docs)
    ps = F.col("payload").cast("string")
    feats = F.array(
        *[
            (_md5_lower60(F.concat(ps, F.lit(f":{j}"))) % 256).cast("double")
            for j in range(32)
        ]
    )
    packed = {
        r["media_id"]: r["phash"]
        for r in ahash_pack(
            media.select("media_id", feats.alias("features")), dim=32
        ).collect()
    }
    f = media.select("media_id", F.posexplode(feats).alias("j", "v"))
    relational = {
        r["media_id"]: r["phash"]
        for r in f.withColumn(
            "s", F.sum("v").over(W.partitionBy("media_id"))
        )
        .groupBy("media_id")
        .agg(
            F.sum(
                F.when(
                    F.col("v") * 32 > F.col("s"),
                    F.pow(F.lit(2.0), F.col("j")).cast("long"),
                ).otherwise(F.lit(0))
            ).alias("phash")
        )
        .collect()
    }
    assert packed == relational and len(packed) == 100
