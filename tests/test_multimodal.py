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


# ---------------------------------------------------------------------------
# Real-codec branch on true image bits (round 9): PNG decodes with stdlib
# zlib + unfiltering, so the REAL seam executes even in this PIL-free
# container — closing the "real-codec branch never ran" gap with actual
# decoding, not a surrogate.
# ---------------------------------------------------------------------------


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _png_encode(pixels, width, height, color=0, filters=None):
    """Minimal PNG writer (test scaffolding): 8-bit gray/RGB/RGBA, one
    IDAT, per-row filter types as requested — lets the tests prove the
    decoder's unfiltering against independently-constructed bytes."""
    import binascii
    import struct
    import zlib

    channels = {0: 1, 2: 3, 6: 4}[color]
    stride = width * channels
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = bytes(pixels[y * stride : (y + 1) * stride])
        f = filters[y]
        raw.append(f)
        if f == 0:
            enc = line
        elif f == 1:
            enc = bytes(
                (line[i] - (line[i - channels] if i >= channels else 0))
                & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            enc = bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:
            enc = bytes(
                (
                    line[i]
                    - (
                        (
                            (line[i - channels] if i >= channels else 0)
                            + prev[i]
                        )
                        >> 1
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        elif f == 4:
            enc = bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        raw.extend(enc)
        prev = line

    def chunk(t, body):
        return (
            struct.pack(">I", len(body))
            + t
            + body
            + struct.pack(">I", binascii.crc32(t + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_decode_png_stdlib_gray_exact_roundtrip():
    """8x4 grayscale, feature_dim == pixel count: every block is one
    pixel, so the decode must return the exact written intensities."""
    from batch_processing_iac_aws_spark.operators.multimodal import (
        decode_png_stdlib,
    )

    pixels = [(x * 7 + y * 31) % 256 for y in range(4) for x in range(8)]
    png = _png_encode(pixels, 8, 4, color=0)
    feats = decode_png_stdlib(png, feature_dim=32)
    assert feats == [p / 255.0 for p in pixels]


def test_decode_png_stdlib_all_filter_types_agree():
    """The same image encoded with filter types 0..4 (and a mixed
    sequence) must decode identically — proving Sub/Up/Average/Paeth
    unfiltering against an independent forward-filter implementation,
    for gray AND RGB."""
    from batch_processing_iac_aws_spark.operators.multimodal import (
        decode_png_stdlib,
    )

    for color, channels in ((0, 1), (2, 3)):
        pixels = [
            (x * 13 + y * 57 + c * 11) % 256
            for y in range(5)
            for x in range(6)
            for c in range(channels)
        ]
        base = decode_png_stdlib(
            _png_encode(pixels, 6, 5, color=color), feature_dim=10
        )
        for filt in (1, 2, 3, 4):
            got = decode_png_stdlib(
                _png_encode(pixels, 6, 5, color=color, filters=[filt] * 5),
                feature_dim=10,
            )
            assert got == base, f"filter {filt} color {color}"
        mixed = decode_png_stdlib(
            _png_encode(pixels, 6, 5, color=color, filters=[0, 1, 2, 3, 4]),
            feature_dim=10,
        )
        assert mixed == base


def test_decode_png_stdlib_luma_and_alpha():
    """Color converts with the ITU-R 601-2 integer luma; RGBA ignores
    alpha (same rule PIL's convert('L') applies to the RGB channels)."""
    from batch_processing_iac_aws_spark.operators.multimodal import (
        decode_png_stdlib,
    )

    rgb = _png_encode([255, 0, 0], 1, 1, color=2)
    assert decode_png_stdlib(rgb, feature_dim=1) == [
        (299 * 255) // 1000 / 255.0
    ]
    rgba = _png_encode([10, 20, 30, 255], 1, 1, color=6)
    expect = (299 * 10 + 587 * 20 + 114 * 30) // 1000 / 255.0
    assert decode_png_stdlib(rgba, feature_dim=1) == [expect]


def test_decode_image_real_executes_png_branch_without_pil():
    """The REAL decoder branch runs in this PIL-free container on true
    PNG bits; non-PNG payloads keep the fail-loud contract."""
    import pytest

    from batch_processing_iac_aws_spark.operators.multimodal import (
        decode_image_real,
        decode_png_stdlib,
    )

    png = _png_encode(list(range(0, 256, 16)), 16, 1, color=0)
    assert decode_image_real(png, feature_dim=4) == decode_png_stdlib(
        png, feature_dim=4
    )
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff not-a-png")


def test_media_phash_pairs_on_real_png_decode(spark):
    """End-to-end media near-dup over REAL decoded PNGs through the
    registered plan's machinery (extract_features mapInPandas on
    executors -> ahash_pack -> pigeonhole band join): a lightly-edited
    re-encode pairs with its original; an inverted image does not."""
    from batch_processing_iac_aws_spark.operators.multimodal import (
        decode_image_real,
        extract_features,
        media_phash_pairs,
    )

    grad = [(x * 4) % 256 for x in range(64)]
    edited = list(grad)
    edited[5] = (edited[5] + 2) % 256  # one-pixel touch-up re-encode
    inverted = [255 - p for p in grad]
    rows = [
        (0, bytearray(_png_encode(grad, 64, 1, color=0))),
        (1, bytearray(_png_encode(edited, 64, 1, color=0))),
        (2, bytearray(_png_encode(inverted, 64, 1, color=0))),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    feats = extract_features(
        media,
        decode_fn=lambda p: decode_image_real(p, feature_dim=32),
        feature_dim=32,
    ).select(
        "media_id",
        F.col("features").cast("array<double>").alias("features"),
    )
    pairs = {
        (r["media_id_a"], r["media_id_b"])
        for r in media_phash_pairs(feats, dim=32, max_hamming=3).collect()
    }
    assert pairs == {(0, 1)}
