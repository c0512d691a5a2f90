"""Multimodal plumbing contracts: schema, cardinality, determinism of the
mapInPandas media operators (codec work is stubbed by design — the Spark
side is what's under test)."""

from __future__ import annotations

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
