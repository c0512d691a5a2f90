"""Multimodal columns: image/audio/video as opaque BinaryType payloads with
typed metadata structs, processed via Arrow-batched mapInPandas.

The Spark-side plumbing here is real and tested — schema contracts,
partition-sized Arrow batches, deterministic outputs. Codec work: PNG
decodes FOR REAL with the standard library (``decode_png_stdlib`` — zlib
inflate + RFC 2083 unfiltering + integer luma), so the real branch of the
seam executes and is engine-tested even in this library-free container;
JPEG/audio/video need a real library (PIL/ffmpeg) and their
``decode_fn=None`` default remains the deterministic fake "decoder"
(content-hash features), with ``decode_image_real`` as the single
integration point (PIL when importable, stdlib PNG otherwise, loud
NotImplementedError for formats it cannot truly decode).

Scale notes: binary payloads ride Parquet natively; keep them OUT of shuffle
keys and project them away before wide operations. mapInPandas streams Arrow
batches, so peak executor memory is one batch of payloads, not a partition —
set spark.sql.execution.arrow.maxRecordsPerBatch to bound it for large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal column convention: payload + typed metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType(), True),
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("n_bytes", LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_image_real(payload: bytes, *, feature_dim: int = 8) -> list[float]:
    """Real decoder integration point: PIL, imported AT CALL TIME so the
    module stays importable in codec-free environments. Decodes the image,
    converts to grayscale, resamples to ``feature_dim`` pixels, and emits
    their [0,1] intensities — a minimal real featurization proving the
    codec seam end-to-end.

    Without PIL (this container), PNG payloads still decode FOR REAL via
    :func:`decode_png_stdlib` — zlib inflate + scanline unfiltering is
    the actual PNG codec work and needs only the standard library — so
    the real branch is executable and engine-tested here on true image
    bits (tests/test_multimodal.py). Non-PNG formats (JPEG's DCT needs a
    real library) raise NotImplementedError, keeping the
    fail-loud-not-fake contract for payloads we cannot truly decode.
    The two real branches share the decode+grayscale semantics but not
    the resampling kernel (PIL resamples bicubically, the stdlib path
    block-means), so pin ONE branch per corpus — mixing families across
    a heterogeneous cluster is the auto_image_decoder caveat."""
    try:
        from PIL import Image
    except ImportError as exc:
        if (payload or b"")[:8] == _PNG_MAGIC:
            return decode_png_stdlib(payload, feature_dim=feature_dim)
        raise NotImplementedError(
            "image decoding requires PIL/opencv for non-PNG formats, "
            "not present in this environment; pass decode_fn=... with a "
            "real implementation"
        ) from exc
    import io

    img = Image.open(io.BytesIO(payload or b"")).convert("L")
    img = img.resize((feature_dim, 1))
    return [p / 255.0 for p in list(img.getdata())[:feature_dim]]


def decode_png_stdlib(payload: bytes, *, feature_dim: int = 8) -> list[float]:
    """REAL PNG decode with the standard library only: chunk walk, IDAT
    zlib inflate, per-scanline unfiltering (all five PNG filter types:
    None/Sub/Up/Average/Paeth, RFC 2083 §6), ITU-R 601-2 integer luma
    for color images, then ``feature_dim`` block-mean intensities in
    [0, 1]. Supports the non-interlaced 8-bit gray / RGB / RGBA subset —
    enough to prove the codec seam on true image bits in a library-free
    sandbox; anything else raises NotImplementedError (fail loud, never
    fake). Pure Python per pixel: fine as the seam's integration test
    and for thumbnail-sized payloads; at corpus scale ship PIL to the
    executors and the identical mapInPandas plan runs unchanged."""
    import struct
    import zlib

    data = payload or b""
    if data[:8] != _PNG_MAGIC:
        raise NotImplementedError("decode_png_stdlib: not a PNG payload")
    pos, width, height, depth, color = 8, None, None, None, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or color not in (0, 2, 6) or interlace != 0:
                raise NotImplementedError(
                    "decode_png_stdlib supports non-interlaced 8-bit "
                    f"gray/RGB/RGBA only (depth={depth}, color={color})"
                )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise NotImplementedError("decode_png_stdlib: missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise NotImplementedError("decode_png_stdlib: truncated scanlines")
    prev = bytearray(stride)
    gray: list[int] = []
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = bytearray(raw[row_start + 1 : row_start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise NotImplementedError(
                f"decode_png_stdlib: unknown filter type {ftype}"
            )
        prev = line
        if channels == 1:
            gray.extend(line)
        else:
            for x in range(width):
                o = x * channels
                gray.append(
                    (299 * line[o] + 587 * line[o + 1] + 114 * line[o + 2])
                    // 1000
                )
    # feature_dim block means over the row-major intensity sequence —
    # deterministic integer arithmetic until the single final division
    n = len(gray)
    feats = []
    for j in range(feature_dim):
        lo, hi = (j * n) // feature_dim, ((j + 1) * n) // feature_dim
        block = gray[lo:hi] or [0]
        feats.append(sum(block) / (len(block) * 255.0))
    return feats


def auto_image_decoder(feature_dim: int = 8):
    """``bytes -> list[float]`` decoder that probes for PIL in the process
    that EXECUTES it — on a cluster that is the worker, not the driver
    (a driver-side probe would pickle the wrong branch when the driver
    image is slimmer than the executors'). Falls back to the
    deterministic fake, so one pipeline definition runs
    identically-shaped in both environments. The probe resolves ONCE per
    process (a pid-keyed memo — pickled state from another process is
    ignored, so a driver-side call can never freeze its branch into the
    executors), steady-state rows pay one dict lookup. CAVEAT: on a heterogeneous
    cluster (PIL on some workers only) the fallback is per-process and
    features would silently mix families — pin ``decode_fn`` explicitly
    there."""

    # memo keyed by PID: a plain closure list would be pickled BY VALUE,
    # so one driver-side sanity call (resolving the driver's branch)
    # would ship a pre-filled memo and freeze that branch into every
    # executor — the exact failure the worker-side probe exists to avoid.
    # A different pid after unpickling forces a fresh probe per process.
    resolved: dict[int, object] = {}

    def decode(p: bytes) -> list[float]:
        import os

        pid = os.getpid()
        fn = resolved.get(pid)
        if fn is None:
            try:
                import PIL  # noqa: F401

                fn = lambda q: decode_image_real(q, feature_dim=feature_dim)  # noqa: E731
            except ImportError:
                fn = lambda q: _fake_features(q, feature_dim)  # noqa: E731
            resolved.clear()  # drop stale pids shipped from other processes
            resolved[pid] = fn
        return fn(p)

    return decode


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic content-derived pseudo-features: sha256 bytes scaled to
    [0,1). Stands in for a decoder so the full pipeline shape is testable."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:dim]]


def extract_features(
    media: DataFrame,
    *,
    decode_fn=None,
    feature_dim: int = 8,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    ``decode_fn: bytes -> list[float]`` defaults to the deterministic fake.
    Arrow-batched: one pandas frame per batch, vectorized metadata, per-row
    decode only for the payload itself.
    """
    fn = decode_fn or (lambda p: _fake_features(p, feature_dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    # NULL payload -> NULL features, matching
                    # text_as_media's meta.n_bytes (octet_length
                    # semantics): reporting 0 bytes + the hash of b''
                    # made the meta and feature outputs disagree on the
                    # same media_id for null media
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else None
                    ).astype("Int64"),
                    "sha256": payloads.map(
                        lambda p: (
                            hashlib.sha256(p).hexdigest()
                            if p is not None
                            else None
                        )
                    ),
                    "features": payloads.map(
                        lambda p: fn(p) if p is not None else None
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("pts_ms", LongType(), True),
        StructField("frame", BinaryType(), True),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a pixel resample: content-hash bytes
    cycled to a size proportional to the target area (capped small)."""
    digest = hashlib.sha256(payload or b"").digest()
    n = min(width * height, 4096)
    return (digest * (n // len(digest) + 1))[:n]


def resize_media(
    media: DataFrame,
    *,
    width: int,
    height: int,
    resize_fn=None,
) -> DataFrame:
    """Resize pass over MEDIA_SCHEMA frames: mapInPandas, output is again
    MEDIA_SCHEMA with payload transformed and meta.width/height updated.

    ``resize_fn: (bytes, w, h) -> bytes`` is the codec integration point
    (PIL/opencv not in this container — the default is a deterministic
    fake so the schema contract and batch plumbing stay testable).
    Map-only: no shuffle; Arrow batch size bounds peak memory, not
    partition size.
    """
    fn = resize_fn or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda p: fn(p, width, height))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "meta": [
                        {
                            "mime": (m or {}).get("mime"),
                            "width": width,
                            "height": height,
                            "n_bytes": len(r),
                        }
                        for m, r in zip(pdf["meta"], resized)
                    ],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame,
    *,
    n_frames: int = 4,
    frame_ms: int = 1000,
    frame_fn=None,
) -> DataFrame:
    """Frame sampling over video payloads: each input row fans out to
    ``n_frames`` FRAME_SCHEMA rows (mapInPandas is a generator — output
    cardinality is free, the Spark-native LATERAL VIEW for Python).

    ``frame_fn: (bytes, idx) -> bytes`` extracts one frame (ffmpeg
    integration point; default deterministic fake). Presentation times are
    ``idx * frame_ms``. Keep payloads out of downstream shuffle keys —
    project to (media_id, frame_idx) + derived features before joining.
    """
    fn = frame_fn or (
        lambda p, i: hashlib.sha256((p or b"") + bytes([i & 0xFF])).digest()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_idx": [],
                "pts_ms": [],
                "frame": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["pts_ms"].append(i * frame_ms)
                    out["frame"].append(fn(payload, i))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def text_as_media(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: build a MEDIA_SCHEMA frame from the documents table (UTF-8
    payloads) so the multimodal plumbing is exercisable on the test data."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("long").alias("width"),
            F.lit(None).cast("long").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def ahash_pack(
    df: DataFrame,
    *,
    features_col: str = "features",
    out_col: str = "phash",
    dim: int = 32,
) -> DataFrame:
    """Average-hash (aHash) a feature/intensity vector into one ``dim``-bit
    long: bit j is set iff ``dim * f_j > sum(f)`` — the classic
    brighter-than-mean rule, written as an integer-exact cross-multiplied
    comparison so engines that agree on the (integer-valued) features
    agree on every bit, no float mean in sight (ties round DOWN, the rule
    a SQL twin reproduces verbatim). Pure relational zip_with/aggregate —
    whole-stage codegen, no UDF, no shuffle. dim <= 62 keeps the packed
    hash inside a signed long.

    The perceptual-hash step of media near-dup: with a real decoder the
    features are pixel intensities and this is aHash as published; with
    the deterministic stub family it exercises the identical plan."""
    if not 1 <= dim <= 62:
        raise ValueError("ahash_pack: dim must be in [1, 62]")
    feats = F.col(features_col)
    total = F.aggregate(
        feats, F.lit(0.0), lambda acc, x: acc + x
    )
    powers = F.array(*[F.lit(1 << j).cast("long") for j in range(dim)])
    bit_terms = F.zip_with(
        feats,
        powers,
        lambda f, p: F.when(f * dim > total, p).otherwise(
            F.lit(0).cast("long")
        ),
    )
    phash = F.aggregate(
        bit_terms, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return df.withColumn(out_col, phash)


def media_phash_pairs(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    features_col: str = "features",
    dim: int = 32,
    max_hamming: int = 2,
) -> DataFrame:
    """Perceptual near-duplicate media pairs: aHash the feature vectors
    (:func:`ahash_pack`) and find all pairs within ``max_hamming`` via the
    shared 4-chunk pigeonhole band join
    (operators/dedup.py:hamming_band_pairs — structural recall for
    hamming <= 3, exact bit_count(xor) verify). One equi-join shuffle on
    (chunk_idx, chunk); payloads never shuffle — only ids and one long
    per media item, the same index-not-data rule as every dedup family.

    Feature source is the caller's decode seam: extract_features /
    auto_image_decoder for real or stub codecs, or a relational
    pseudo-intensity family for an engine-portable oracle twin
    (plans/llm.py:multimodal_phash_pairs)."""
    # cache: the band join references the hashed frame on both sides, and
    # recomputing it would re-run the feature source (a Python decode via
    # mapInPandas on the real seam) twice — the simhash_near_duplicates
    # convention. Registered portable query uses the exploded relational
    # twin instead (plans/llm.py) because ITS features are an md5
    # expression family that projection collapse would re-inline.
    hashed = ahash_pack(
        media.select(F.col(id_col), F.col(features_col)),
        features_col=features_col,
        dim=dim,
    ).select(F.col(id_col), "phash").cache()
    from .dedup import hamming_band_pairs

    return hamming_band_pairs(
        hashed,
        id_col=id_col,
        hash_col="phash",
        bits=dim,
        max_hamming=max_hamming,
        id_a=f"{id_col}_a",
        id_b=f"{id_col}_b",
    )
