"""Multimodal columns: image/audio/video as opaque BinaryType payloads with
typed metadata structs, processed via Arrow-batched mapInPandas.

The Spark-side plumbing here is real and tested — schema contracts,
partition-sized Arrow batches, deterministic outputs. Codec work: THREE
media formats decode FOR REAL with the standard library — PNG
(``decode_png_stdlib``: zlib inflate + RFC 2083 unfiltering + integer
luma), JPEG (``decode_jpeg_stdlib``: baseline + progressive huffman
DCT, luma or full RGB), and PCM WAV audio (``decode_wav_stdlib``: RIFF
walk + 8/16-bit PCM + mono mix + block-RMS envelope) — so the real
branch of the seam executes and is engine-tested on true bits in this
library-free container. Compressed audio / video need a real library
(ffmpeg) and their ``decode_fn=None`` default remains the
deterministic fake "decoder" (content-hash features), with
``decode_image_real`` as the single image integration point (PIL when
importable, stdlib kernels otherwise, loud NotImplementedError for
formats nothing here can truly decode).

Scale notes: binary payloads ride Parquet natively; keep them OUT of shuffle
keys and project them away before wide operations. mapInPandas streams Arrow
batches, so peak executor memory is one batch of payloads, not a partition —
set spark.sql.execution.arrow.maxRecordsPerBatch to bound it for large blobs.
"""

from __future__ import annotations

import functools as _functools
import hashlib
from collections.abc import Iterator

import numpy as np
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

#: Adam7 interlace grid (RFC 2083 §2.6): (x0, y0, dx, dy) per pass
_PNG_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _block_means(vals, feature_dim: int, scale: float = 255.0) -> "list[float]":
    """THE shared block-mean fold every image/frame kernel emits — one
    implementation so the cross-codec comparability guarantee ("same
    feature family, same [0, 1] scale") cannot drift per codec: a tweak
    to the empty-block fallback or the division grouping in one copy
    would silently split the feature family."""
    n = len(vals)
    feats = []
    for j in range(feature_dim):
        lo, hi = (j * n) // feature_dim, ((j + 1) * n) // feature_dim
        block = vals[lo:hi]
        feats.append(sum(block) / (len(block) * scale) if block else 0.0)
    return feats


def _rgb_triples_luma(raw: bytes) -> "list[int]":
    """Color table -> ITU-R 601-2 integer luma per entry — shared by the
    PNG PLTE and GIF color-table paths (the same 299/587/114 rule every
    image kernel here uses)."""
    return [
        (299 * raw[3 * i] + 587 * raw[3 * i + 1] + 114 * raw[3 * i + 2])
        // 1000
        for i in range(len(raw) // 3)
    ]


def decode_image_real(
    payload: bytes,
    *,
    feature_dim: int = 8,
    decoder: str = "auto",
) -> list[float]:
    """Real decoder integration point: PIL, imported AT CALL TIME so the
    module stays importable in codec-free environments. Decodes the image,
    converts to grayscale, resamples to ``feature_dim`` pixels, and emits
    their [0,1] intensities — a minimal real featurization proving the
    codec seam end-to-end.

    Without PIL (this container), BOTH major codecs still decode FOR
    REAL: PNG via :func:`decode_png_stdlib` (zlib inflate + scanline
    unfiltering) and baseline JPEG via :func:`decode_jpeg_stdlib`
    (huffman entropy decode + dequant + IDCT, differentially verified
    against the JVM's ImageIO in tests/test_multimodal.py) — so the
    real branch is executable and engine-tested here on true image bits
    for both (baseline AND progressive JPEG since round 11). Other
    formats raise NotImplementedError, keeping the fail-loud-not-fake
    contract for payloads we cannot truly decode.

    ``decoder`` PINS the kernel, because the two real branches share the
    decode+grayscale semantics but not the resampling kernel (PIL
    resamples bicubically, the stdlib path block-means) — under
    ``"auto"`` the same PNG payload yields DIFFERENT feature vectors on
    executors with and without PIL, silently mixing feature families
    across a heterogeneous cluster:

    - ``"stdlib_png"``: always :func:`decode_png_stdlib`, even when PIL
      is importable — one deterministic kernel on every executor (the
      production pin for PNG corpora).
    - ``"stdlib_jpeg"``: always :func:`decode_jpeg_stdlib` — the same
      pin for JPEG corpora (baseline and progressive).
    - ``"stdlib_jpeg_rgb"``: always :func:`decode_jpeg_rgb_stdlib` —
      the COLOR pin (round 11): ``3 * feature_dim`` per-block mean-RGB
      features, a different feature FAMILY from every luma kernel (and
      a different length), for corpora where luma conflates
      differently-colored variants. Never mixed with a luma pin in one
      index — the length mismatch makes accidental mixing fail loudly
      downstream.
    - ``"stdlib_gif"``: always :func:`decode_gif_stdlib` — first-frame
      block-mean luma (round 11; animated frame SAMPLING goes through
      :func:`gif_frame_fn` + sample_frames, not this single-vector pin).
    - ``"stdlib"``: route by magic to the matching stdlib kernel (PNG,
      JPEG, or GIF) — one deterministic kernel family everywhere,
      for mixed-codec corpora.
    - ``"pil"``: require PIL; an executor without it fails LOUDLY
      instead of degrading to a different kernel.
    - ``"auto"`` (default): probe per process — convenient in a
      homogeneous environment, hazardous on mixed fleets (documented
      here and in :func:`auto_image_decoder`)."""
    if decoder not in (
        "auto", "pil", "stdlib", "stdlib_png", "stdlib_jpeg",
        "stdlib_jpeg_rgb", "stdlib_gif",
    ):
        raise ValueError(
            f"decode_image_real: unknown decoder {decoder!r} (expected "
            "'auto', 'pil', 'stdlib', 'stdlib_png', 'stdlib_jpeg', "
            "'stdlib_jpeg_rgb', or 'stdlib_gif')"
        )
    if decoder == "stdlib_png":
        return decode_png_stdlib(payload, feature_dim=feature_dim)
    if decoder == "stdlib_jpeg":
        return decode_jpeg_stdlib(payload, feature_dim=feature_dim)
    if decoder == "stdlib_jpeg_rgb":
        return decode_jpeg_rgb_stdlib(payload, feature_dim=feature_dim)
    if decoder == "stdlib_gif":
        return decode_gif_stdlib(payload, feature_dim=feature_dim)
    if decoder == "stdlib":
        if (payload or b"")[:8] == _PNG_MAGIC:
            return decode_png_stdlib(payload, feature_dim=feature_dim)
        if (payload or b"")[:3] == _JPEG_MAGIC:
            return decode_jpeg_stdlib(payload, feature_dim=feature_dim)
        if (payload or b"")[:6] in _GIF_MAGICS:
            return decode_gif_stdlib(payload, feature_dim=feature_dim)
        raise NotImplementedError(
            "decode_image_real(decoder='stdlib'): payload is not "
            "PNG/JPEG/GIF — no stdlib kernel for this format"
        )
    try:
        from PIL import Image
    except ImportError as exc:
        if decoder == "pil":
            raise RuntimeError(
                "decode_image_real(decoder='pil'): PIL pinned but not "
                "importable on this executor — refusing to fall back to "
                "the stdlib kernel (it block-means where PIL resamples "
                "bicubically; mixed kernels corrupt feature comparisons)"
            ) from exc
        if (payload or b"")[:8] == _PNG_MAGIC:
            return decode_png_stdlib(payload, feature_dim=feature_dim)
        if (payload or b"")[:3] == _JPEG_MAGIC:
            return decode_jpeg_stdlib(payload, feature_dim=feature_dim)
        if (payload or b"")[:6] in _GIF_MAGICS:
            return decode_gif_stdlib(payload, feature_dim=feature_dim)
        raise NotImplementedError(
            "image decoding requires PIL/opencv for non-PNG/JPEG/GIF "
            "formats, not present in this environment; pass "
            "decode_fn=... with a real implementation"
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
    [0, 1]. Supports 8-bit gray / RGB / RGBA plus PALETTE images at bit
    depths 1/2/4/8 (PLTE lookup; sub-byte rows unpack MSB-first per
    RFC 2083 §2.3, filtering at bpp=1 byte), each in BOTH progressive
    orders — sequential and Adam7 interlaced (seven sub-images, each
    with its own scanline filtering at its own stride, scattered onto
    the canvas by the pass grid) — enough to prove the codec seam on
    true image bits in a library-free sandbox; anything else raises
    NotImplementedError (fail loud, never fake). Pure Python per pixel:
    fine as the seam's integration test and for thumbnail-sized
    payloads; at corpus scale ship PIL to the executors and the
    identical mapInPandas plan runs unchanged."""
    import struct
    import zlib

    data = payload or b""
    if data[:8] != _PNG_MAGIC:
        raise NotImplementedError("decode_png_stdlib: not a PNG payload")
    pos, width, height, depth, color = 8, None, None, None, None
    idat = bytearray()
    plte: "bytes | None" = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            supported = (depth == 8 and color in (0, 2, 6)) or (
                color == 3 and depth in (1, 2, 4, 8)
            )
            if not supported or interlace not in (0, 1):
                raise NotImplementedError(
                    "decode_png_stdlib supports 8-bit gray/RGB/RGBA "
                    "and 1/2/4/8-bit palette (sequential or Adam7) "
                    f"only (depth={depth}, color={color}, "
                    f"interlace={interlace})"
                )
        elif ctype == b"PLTE":
            plte = bytes(body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise NotImplementedError("decode_png_stdlib: missing IHDR/IDAT")
    plte_luma: "list[int] | None" = None
    if color == 3:
        if plte is None or len(plte) % 3:
            raise NotImplementedError(
                "decode_png_stdlib: palette image without a valid PLTE"
            )
        plte_luma = _rgb_triples_luma(plte)
        channels = 1
    else:
        channels = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(bytes(idat))
    gray = [0] * (width * height)
    mask = (1 << depth) - 1
    # Adam7 scatters seven independently-filtered sub-images onto the
    # (x0 + i*dx, y0 + j*dy) grid; sequential is the single (0,0,1,1)
    # pass of the same walk
    passes = [(0, 0, 1, 1)] if interlace == 0 else _PNG_ADAM7
    off = 0
    for x0, y0, dx, dy in passes:
        pw = 0 if width <= x0 else (width - x0 + dx - 1) // dx
        ph = 0 if height <= y0 else (height - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue  # empty pass stores no scanlines (RFC 2083 §2.6)
        if color == 3:
            stride = (pw * depth + 7) // 8
            bpp = 1  # filters act on bytes; sub-byte pixels share them
        else:
            stride = pw * channels
            bpp = channels
        prev = bytearray(stride)
        for j in range(ph):
            if off + 1 + stride > len(raw):
                raise NotImplementedError(
                    "decode_png_stdlib: truncated scanlines"
                )
            ftype = raw[off]
            line = bytearray(raw[off + 1 : off + 1 + stride])
            off += 1 + stride
            if ftype == 1:  # Sub
                for i in range(bpp, stride):
                    line[i] = (line[i] + line[i - bpp]) & 0xFF
            elif ftype == 2:  # Up
                for i in range(stride):
                    line[i] = (line[i] + prev[i]) & 0xFF
            elif ftype == 3:  # Average
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for i in range(stride):
                    a = line[i - bpp] if i >= bpp else 0
                    b = prev[i]
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc)
                        else (b if pb <= pc else c)
                    )
                    line[i] = (line[i] + pred) & 0xFF
            elif ftype != 0:
                raise NotImplementedError(
                    f"decode_png_stdlib: unknown filter type {ftype}"
                )
            prev = line
            if color == 3:
                vals = []
                for x in range(pw):
                    o = x * depth
                    v = (line[o >> 3] >> (8 - depth - (o & 7))) & mask
                    if v >= len(plte_luma):
                        raise NotImplementedError(
                            "decode_png_stdlib: pixel index beyond PLTE"
                        )
                    vals.append(plte_luma[v])
            elif bpp == 1:
                vals = list(line)
            else:
                vals = [
                    (299 * line[x * bpp] + 587 * line[x * bpp + 1]
                     + 114 * line[x * bpp + 2]) // 1000
                    for x in range(pw)
                ]
            row = (y0 + j * dy) * width
            for i, v in enumerate(vals):
                gray[row + x0 + i * dx] = v
    if off != len(raw):
        raise NotImplementedError("decode_png_stdlib: truncated scanlines")
    # deterministic integer arithmetic until _block_means' one division
    return _block_means(gray, feature_dim)


_JPEG_MAGIC = b"\xff\xd8\xff"

# zigzag scan order: position k in the entropy stream -> raster index in
# the 8x8 block (ISO/IEC 10918-1 Figure 5)
_JPEG_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# separable IDCT basis with the C(u) = 1/sqrt(2) DC normalization folded
# in: _JPEG_IDCT_COS[x][u] = C(u) * cos((2x+1) * u * pi / 16)
import math as _math  # noqa: E402  (module-level: built once per process)

_JPEG_IDCT_COS = [
    [
        (_math.sqrt(0.5) if u == 0 else 1.0)
        * _math.cos((2 * x + 1) * u * _math.pi / 16)
        for u in range(8)
    ]
    for x in range(8)
]


class _JpegBits:
    """Entropy-stream bit reader with 0xFF 0x00 byte-unstuffing."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data, self.pos = data, pos
        self.buf, self.n = 0, 0

    def bit(self) -> int:
        if self.n == 0:
            # running off the end of a truncated file must surface as the
            # documented fail-loud signal, not a bare IndexError
            if self.pos >= len(self.data):
                raise NotImplementedError(
                    "decode_jpeg_stdlib: truncated entropy data"
                )
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise NotImplementedError(
                        "decode_jpeg_stdlib: truncated entropy data"
                    )
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise NotImplementedError(
                        "decode_jpeg_stdlib: unexpected marker "
                        f"0xFF{nxt:02X} inside entropy-coded data"
                    )
            self.buf, self.n = b, 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0


def _jpeg_huffman(counts: "list[int]", symbols: "list[int]"):
    """Canonical (length, code) -> symbol map from a DHT segment."""
    lut: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lut[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _jpeg_huff_decode(br: _JpegBits, lut) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("decode_jpeg_stdlib: invalid huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude per ISO 10918-1 F.2.2.1 EXTEND."""
    if t and v < (1 << (t - 1)):
        return v - (1 << t) + 1
    return v


def _jpeg_idct_block(coef: "list[float]") -> "list[int]":
    """8x8 2-D IDCT (separable float, spec-exact basis) + level shift +
    clamp, returning 64 raster-order pixels in [0, 255]."""
    tmp = [0.0] * 64
    for v in range(8):  # 1-D over u for each coefficient row
        row = coef[v * 8 : v * 8 + 8]
        base = v * 8
        for x in range(8):
            c = _JPEG_IDCT_COS[x]
            tmp[base + x] = 0.5 * (
                c[0] * row[0] + c[1] * row[1] + c[2] * row[2]
                + c[3] * row[3] + c[4] * row[4] + c[5] * row[5]
                + c[6] * row[6] + c[7] * row[7]
            )
    out = [0] * 64
    for x in range(8):  # 1-D over v for each column
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            c = _JPEG_IDCT_COS[y]
            s = 0.5 * (
                c[0] * col[0] + c[1] * col[1] + c[2] * col[2]
                + c[3] * col[3] + c[4] * col[4] + c[5] * col[5]
                + c[6] * col[6] + c[7] * col[7]
            )
            p = int(_math.floor(s + 128.5))
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def _jpeg_decode_luma(
    data: bytes, *, color: bool = False
) -> "tuple[int, int, list[int]]":
    """Baseline-sequential JPEG decode of the LUMA channel with the
    standard library only: marker walk, DQT/DHT/SOF0/DRI/SOS parsing,
    canonical huffman entropy decode (DC predictors + AC run-length,
    restart intervals), dequantization, zigzag, float IDCT. Returns
    (width, height, row-major Y pixels). Chroma components are
    entropy-decoded (the bitstream interleaves them) but skip
    dequant/IDCT — grayscale features need Y only, and JPEG's Y *is*
    the ITU-R 601 luma the PNG path computes from RGB. Supports 8-bit
    baseline (SOF0/SOF1) and progressive (SOF2, round 11 — spectral
    selection + successive approximation via
    :func:`_jpeg_decode_progressive`) with the luma at full sampling
    resolution; arithmetic coding, hierarchical, and lossless modes
    raise NotImplementedError (fail loud, never fake).

    ``color=True`` (round 11 stretch) additionally runs the chroma
    IDCT and returns (width, height, row-major interleaved RGB) — JFIF
    YCbCr conversion with pixel-replication chroma upsampling; on
    grayscale frames R = G = B = Y."""
    import struct

    if data[:3] != _JPEG_MAGIC:
        raise NotImplementedError("decode_jpeg_stdlib: not a JPEG payload")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    ri = 0
    progressive = False
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError(
                f"decode_jpeg_stdlib: bad marker byte at {pos}"
            )
        # ISO 10918-1 B.1.1.2: markers may be padded by any number of
        # 0xFF fill bytes — skip them so a fill byte is never parsed as
        # the marker id (spec-valid wild files pad this way)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            raise NotImplementedError(
                "decode_jpeg_stdlib: truncated marker stream"
            )
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            _jpeg_parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            _jpeg_parse_dht(seg, huff)
        elif marker in (0xC0, 0xC1):  # baseline / ext. sequential huffman
            prec = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            if prec != 8:
                raise NotImplementedError(
                    f"decode_jpeg_stdlib: {prec}-bit precision"
                )
            comps = []
            for i in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = (w, h, comps)
        elif marker == 0xC2:  # progressive DCT, huffman (round 11)
            prec = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            if prec != 8:
                raise NotImplementedError(
                    f"decode_jpeg_stdlib: {prec}-bit precision"
                )
            comps = []
            for i in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            frame = (w, h, comps)
            progressive = True
        elif marker in (
            0xC3, 0xC5, 0xC6, 0xC7,
            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
        ):
            raise NotImplementedError(
                "decode_jpeg_stdlib supports baseline sequential and "
                f"progressive huffman DCT only (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise NotImplementedError(
                    "decode_jpeg_stdlib: SOS before SOF"
                )
            if progressive:
                return _jpeg_decode_progressive(
                    data, pos, frame, qt, huff, ri, color=color
                )
            scan = []
            for i in range(seg[0]):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                fc = next(c for c in frame[2] if c["id"] == cs)
                scan.append((fc, tt >> 4, tt & 15))
            return _jpeg_decode_scan(
                data, pos + seglen, frame, scan, qt, huff, ri,
                color=color,
            )
        pos += seglen
    raise NotImplementedError("decode_jpeg_stdlib: no scan found")


def _jpeg_decode_scan(data, pos, frame, scan, qt, huff, ri, color=False):
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    luma = comps[0]
    if luma["h"] != hmax or luma["v"] != vmax:
        raise NotImplementedError(
            "decode_jpeg_stdlib: luma below full sampling resolution"
        )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # one MCU-padded plane per WANTED component, each at its own
    # sampling resolution (chroma planes are smaller under 4:2:0/4:2:2)
    planes: dict[int, bytearray] = {}
    plane_ws: dict[int, int] = {}
    for c in comps:
        if color or c is luma:
            pw = mcux * c["h"] * 8
            planes[c["id"]] = bytearray(pw * mcuy * c["v"] * 8)
            plane_ws[c["id"]] = pw
    br = _JpegBits(data, pos)
    pred = {c["id"]: 0 for c in comps}
    for m in range(mcux * mcuy):
        if ri and m and m % ri == 0:
            br.align()
            if (
                br.pos + 1 < len(data)
                and data[br.pos] == 0xFF
                and 0xD0 <= data[br.pos + 1] <= 0xD7
            ):
                br.pos += 2
            else:
                raise NotImplementedError(
                    "decode_jpeg_stdlib: missing restart marker"
                )
            for k in pred:
                pred[k] = 0
        my, mx = divmod(m, mcux)
        for fc, td, ta in scan:
            want = color or fc is luma
            q = qt[fc["tq"]]
            for by in range(fc["v"]):
                for bx in range(fc["h"]):
                    # DC: predictor + huffman-coded category diff
                    t = _jpeg_huff_decode(br, huff[(0, td)])
                    pred[fc["id"]] += _jpeg_extend(br.receive(t), t)
                    coef = [0.0] * 64
                    coef[0] = pred[fc["id"]] * q[0]
                    k = 1
                    while k < 64:  # AC: (run, size) run-length pairs
                        rs = _jpeg_huff_decode(br, huff[(1, ta)])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL: sixteen zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise NotImplementedError(
                                "decode_jpeg_stdlib: AC index overflow"
                            )
                        coef[_JPEG_ZZ[k]] = (
                            _jpeg_extend(br.receive(s), s) * q[k]
                        )
                        k += 1
                    if not want:
                        continue  # chroma: bitstream advanced, no IDCT
                    px = _jpeg_idct_block(coef)
                    pw = plane_ws[fc["id"]]
                    plane = planes[fc["id"]]
                    ox = (mx * fc["h"] + bx) * 8
                    oy = (my * fc["v"] + by) * 8
                    for yy in range(8):
                        row = (oy + yy) * pw + ox
                        plane[row : row + 8] = bytes(
                            px[yy * 8 : yy * 8 + 8]
                        )
    if color:
        return _jpeg_ycc_to_rgb(
            w, h, comps, planes, plane_ws, hmax, vmax
        )
    # crop the MCU-padded luma plane to the true image dims
    plane = planes[luma["id"]]
    plane_w = plane_ws[luma["id"]]
    out = [0] * (w * h)
    for y in range(h):
        out[y * w : (y + 1) * w] = plane[y * plane_w : y * plane_w + w]
    return w, h, out


def _jpeg_ycc_to_rgb(w, h, comps, planes, plane_ws, hmax, vmax):
    """JFIF YCbCr -> interleaved RGB with pixel-replication chroma
    upsampling (libjpeg's "plain" mode; fancy/triangular upsampling is a
    decoder choice, not part of the standard — wild-file comparisons
    against decoders that default to fancy differ slightly on chroma
    edges, bounded in tests). A single-component frame is grayscale:
    R = G = B = Y. Frames with other component counts (e.g. Adobe CMYK)
    refuse loudly."""
    if len(comps) == 1:
        yp = planes[comps[0]["id"]]
        pw = plane_ws[comps[0]["id"]]
        out = [0] * (3 * w * h)
        for y in range(h):
            row = y * pw
            o = 3 * y * w
            for x in range(w):
                v = yp[row + x]
                out[o] = out[o + 1] = out[o + 2] = v
                o += 3
        return w, h, out
    if len(comps) != 3:
        raise NotImplementedError(
            f"decode_jpeg_stdlib: {len(comps)}-component color space"
        )
    cy, ccb, ccr = comps
    yp, pwy = planes[cy["id"]], plane_ws[cy["id"]]
    cbp, pwb = planes[ccb["id"]], plane_ws[ccb["id"]]
    crp, pwr = planes[ccr["id"]], plane_ws[ccr["id"]]
    out = [0] * (3 * w * h)
    o = 0
    for y in range(h):
        ry = y * pwy
        rb = (y * ccb["v"] // vmax) * pwb
        rr = (y * ccr["v"] // vmax) * pwr
        for x in range(w):
            yy = yp[ry + x]
            cb = cbp[rb + x * ccb["h"] // hmax] - 128
            cr = crp[rr + x * ccr["h"] // hmax] - 128
            r = yy + 1.402 * cr
            g = yy - 0.344136 * cb - 0.714136 * cr
            b = yy + 1.772 * cb
            out[o] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
            out[o + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
            out[o + 2] = 0 if b < 0 else (255 if b > 255 else int(b + 0.5))
            o += 3
    return w, h, out


def _jpeg_parse_dqt(seg: bytes, qt: dict) -> None:
    """DQT segment -> zigzag-order 8-bit tables (several per segment)."""
    o = 0
    while o < len(seg):
        pq, tq = seg[o] >> 4, seg[o] & 15
        o += 1
        if pq != 0:
            raise NotImplementedError(
                "decode_jpeg_stdlib: 16-bit quantization tables"
            )
        qt[tq] = list(seg[o : o + 64])
        o += 64


def _jpeg_parse_dht(seg: bytes, huff: dict) -> None:
    """DHT segment -> canonical huffman LUTs (several per segment);
    progressive files routinely REDEFINE tables between scans, so this
    overwrites in place."""
    o = 0
    while o < len(seg):
        tc, th = seg[o] >> 4, seg[o] & 15
        o += 1
        counts = list(seg[o : o + 16])
        o += 16
        n = sum(counts)
        huff[(tc, th)] = _jpeg_huffman(counts, list(seg[o : o + n]))
        o += n


def _jpeg_next_marker(data: bytes, pos: int) -> int:
    """Position of the next true marker at or after ``pos``, skipping
    entropy bytes, stuffed 0xFF00, restart markers, and 0xFF fill runs —
    how a decoder steps past entropy-coded data it has finished with (or
    chose to skip: a chroma-only progressive scan never touches luma
    bits, so it can be skipped WITHOUT entropy-decoding it)."""
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            pos += 2
        elif nxt == 0xFF:
            pos += 1
        else:
            return pos
    raise NotImplementedError("decode_jpeg_stdlib: truncated marker stream")


def _jpeg_expect_rst(br: _JpegBits, data: bytes) -> None:
    br.align()
    if (
        br.pos + 1 < len(data)
        and data[br.pos] == 0xFF
        and 0xD0 <= data[br.pos + 1] <= 0xD7
    ):
        br.pos += 2
    else:
        raise NotImplementedError(
            "decode_jpeg_stdlib: missing restart marker"
        )


def _jpeg_dc_scan_block(br, block, lut, Ah, Al, pred, cid) -> None:
    """One block of a progressive DC scan (ISO 10918-1 G.1.2.1).
    First pass (Ah=0): the baseline DC difference coding, stored
    pre-shifted by the successive-approximation point Al. Refinement
    (Ah>0): exactly one bit per block, OR-ed into position Al.
    ``block`` is None for a chroma component in an interleaved scan —
    the bits must still be consumed to keep the stream aligned."""
    if Ah == 0:
        if lut is None:
            raise NotImplementedError(
                "decode_jpeg_stdlib: scan references an undefined "
                "huffman table"
            )
        t = _jpeg_huff_decode(br, lut)
        pred[cid] += _jpeg_extend(br.receive(t), t)
        if block is not None:
            block[0] = pred[cid] << Al
    else:
        bit = br.bit()
        if bit and block is not None:
            block[0] |= 1 << Al


def _jpeg_ac_first_block(br, block, lut, ss, se, al, state) -> None:
    """One block of a first AC scan (G.1.2.2): baseline run-length
    coding restricted to the [ss, se] spectral band, plus the EOBn
    run-length codes (an EOB run of up to 2^14 all-ends-here blocks —
    the compression progressive gets from sending sparse high bands)."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _jpeg_huff_decode(br, lut)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eob = 1 << r
                if r:
                    eob += br.receive(r)
                state["eobrun"] = eob - 1  # this block is run member 0
                return
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise NotImplementedError(
                    "decode_jpeg_stdlib: AC index overflow"
                )
            block[_JPEG_ZZ[k]] = _jpeg_extend(br.receive(s), s) << al
            k += 1


def _jpeg_ac_refine_block(br, block, lut, ss, se, al, state) -> None:
    """One block of an AC refinement scan (G.1.2.3) — the subtle one:
    every coefficient made nonzero by an EARLIER pass gets a correction
    bit whenever the scan passes over it, while run lengths and EOB runs
    count only zero-history positions; newly-significant coefficients
    arrive as ±1 pre-shifted by Al. Structure follows the spec's decode
    procedure (the same one libjpeg's jdphuff implements)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _jpeg_huff_decode(br, lut)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r != 15:
                    eob = 1 << r
                    if r:
                        eob += br.receive(r)
                    state["eobrun"] = eob
                    break  # rest of this block refined below
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                # refinement newly-significant magnitude is always 1
                val = p1 if br.bit() else m1
            # advance r zero-history positions, correcting the nonzero
            # coefficients passed over on the way
            while k <= se:
                z = _JPEG_ZZ[k]
                if block[z] != 0:
                    if br.bit() and (block[z] & p1) == 0:
                        block[z] += p1 if block[z] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[_JPEG_ZZ[k]] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = _JPEG_ZZ[k]
            if block[z] != 0:
                if br.bit() and (block[z] & p1) == 0:
                    block[z] += p1 if block[z] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def _jpeg_progressive_scan(
    data, pos, seg, frame, coef_by, gws, qt, huff, ri, mcux, mcuy
):
    """Decode ONE progressive SOS into the accumulated per-component
    coefficient grids (``coef_by``: cid -> block list, ``gws``: cid ->
    grid block width; only WANTED components have grids) and return the
    position of the next marker. Interleaved scans (DC, several
    components) run in MCU order with unwanted components entropy-
    decoded-and-discarded; single-component scans run in raster order
    over that component's own block grid; scans containing no wanted
    component are skipped outright via the marker scan — their bits
    cannot affect any wanted plane."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    ns = seg[0]
    scomps = []
    for i in range(ns):
        cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        fc = next(c for c in comps if c["id"] == cs)
        scomps.append((fc, tt >> 4, tt & 15))
    o = 1 + 2 * ns
    ss, se, ahl = seg[o], seg[o + 1], seg[o + 2]
    ah, al = ahl >> 4, ahl & 15
    if not any(fc["id"] in coef_by for fc, _, _ in scomps):
        return _jpeg_next_marker(data, pos)
    br = _JpegBits(data, pos)
    state = {"eobrun": 0}
    if ss == 0 and ns > 1:
        # interleaved DC scan (AC scans are single-component by spec)
        pred = {fc["id"]: 0 for fc, _, _ in scomps}
        for m in range(mcux * mcuy):
            if ri and m and m % ri == 0:
                _jpeg_expect_rst(br, data)
                for cid in pred:
                    pred[cid] = 0
            my, mx = divmod(m, mcux)
            for fc, td, _ta in scomps:
                grid = coef_by.get(fc["id"])
                for by in range(fc["v"]):
                    for bx in range(fc["h"]):
                        block = (
                            grid[
                                (my * fc["v"] + by) * gws[fc["id"]]
                                + mx * fc["h"] + bx
                            ]
                            if grid is not None
                            else None
                        )
                        _jpeg_dc_scan_block(
                            br, block, huff.get((0, td)), ah, al,
                            pred, fc["id"],
                        )
    else:
        if ns != 1:
            raise NotImplementedError(
                "decode_jpeg_stdlib: interleaved progressive AC scan"
            )
        fc, td, ta = scomps[0]  # wanted (the scan passed the filter)
        cw = -(-(w * fc["h"]) // hmax)
        ch = -(-(h * fc["v"]) // vmax)
        bw, bh = -(-cw // 8), -(-ch // 8)
        gw = gws[fc["id"]]
        grid = coef_by[fc["id"]]
        pred = {fc["id"]: 0}
        lut = huff.get((0, td)) if ss == 0 else huff.get((1, ta))
        if lut is None and not (ss == 0 and ah > 0):
            raise NotImplementedError(
                "decode_jpeg_stdlib: scan references an undefined "
                "huffman table"
            )
        for i in range(bw * bh):
            if ri and i and i % ri == 0:
                _jpeg_expect_rst(br, data)
                pred[fc["id"]] = 0
                state["eobrun"] = 0
            by, bx = divmod(i, bw)
            block = grid[by * gw + bx]
            if ss == 0:
                _jpeg_dc_scan_block(
                    br, block, lut, ah, al, pred, fc["id"]
                )
            elif ah == 0:
                _jpeg_ac_first_block(br, block, lut, ss, se, al, state)
            else:
                _jpeg_ac_refine_block(br, block, lut, ss, se, al, state)
    return _jpeg_next_marker(data, br.pos)


def _jpeg_decode_progressive(data, pos, frame, qt, huff, ri, color=False):
    """Progressive (SOF2) huffman JPEG decode of the LUMA plane — round
    11, closing the one refusal measured on the real corpus
    (ARCHITECTURE.md round-11 notes). Coefficients for every luma block
    accumulate across scans — spectral-selection bands land slices of
    the zigzag order, successive-approximation passes land high bits
    first and refine one bit per pass (that accumulation is inherent to
    progressive: nothing can be rendered until all scans arrive, which
    is why the baseline path streams block-by-block and this one holds
    a w*h/64-block int grid). Called from the baseline marker walk at
    the FIRST SOS (``pos`` at its length field); runs its own walk from
    there because progressive files interleave DHT/DQT/DRI segments
    between scans. Chroma-only scans are skipped without entropy
    decoding; interleaved DC scans decode-and-discard chroma bits.
    Dequant + IDCT + crop run once at EOI through the same
    `_jpeg_idct_block` the baseline path uses."""
    import struct

    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    luma = comps[0]
    if luma["h"] != hmax or luma["v"] != vmax:
        raise NotImplementedError(
            "decode_jpeg_stdlib: luma below full sampling resolution"
        )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coef_by: dict[int, list] = {}
    gws: dict[int, int] = {}
    for c in comps:
        if color or c is luma:
            gw, gh = mcux * c["h"], mcuy * c["v"]
            coef_by[c["id"]] = [[0] * 64 for _ in range(gw * gh)]
            gws[c["id"]] = gw
    at_sos = True
    saw_scan = False
    while True:
        if at_sos:
            (seglen,) = struct.unpack(">H", data[pos : pos + 2])
            seg = data[pos + 2 : pos + seglen]
            pos = _jpeg_progressive_scan(
                data, pos + seglen, seg, frame, coef_by, gws,
                qt, huff, ri, mcux, mcuy,
            )
            saw_scan = True
            at_sos = False
            continue
        if pos + 2 > len(data) or data[pos] != 0xFF:
            raise NotImplementedError(
                "decode_jpeg_stdlib: truncated marker stream"
            )
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            raise NotImplementedError(
                "decode_jpeg_stdlib: truncated marker stream"
            )
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDA:
            at_sos = True
            continue
        if marker == 0xC4:
            _jpeg_parse_dht(seg, huff)
        elif marker == 0xDB:
            _jpeg_parse_dqt(seg, qt)
        elif marker == 0xDD:
            (ri,) = struct.unpack(">H", seg[:2])
        pos += seglen
    if not saw_scan:
        raise NotImplementedError("decode_jpeg_stdlib: no scan found")
    # dequant + IDCT per wanted component, once all scans accumulated
    planes: dict[int, bytearray] = {}
    plane_ws: dict[int, int] = {}
    for c in comps:
        if c["id"] not in coef_by:
            continue
        q = qt[c["tq"]]
        gw = gws[c["id"]]
        grid = coef_by[c["id"]]
        pw = gw * 8
        plane = bytearray(pw * (len(grid) // gw) * 8)
        for i, block in enumerate(grid):
            by, bx = divmod(i, gw)
            cf = [0.0] * 64
            for k in range(64):
                z = _JPEG_ZZ[k]
                v = block[z]
                if v:
                    cf[z] = v * q[k]
            px = _jpeg_idct_block(cf)
            ox, oy = bx * 8, by * 8
            for yy in range(8):
                row = (oy + yy) * pw + ox
                plane[row : row + 8] = bytes(px[yy * 8 : yy * 8 + 8])
        planes[c["id"]] = plane
        plane_ws[c["id"]] = pw
    if color:
        return _jpeg_ycc_to_rgb(
            w, h, comps, planes, plane_ws, hmax, vmax
        )
    plane = planes[luma["id"]]
    plane_w = plane_ws[luma["id"]]
    out = [0] * (w * h)
    for y in range(h):
        out[y * w : (y + 1) * w] = plane[y * plane_w : y * plane_w + w]
    return w, h, out


def decode_jpeg_stdlib(payload: bytes, *, feature_dim: int = 8) -> list[float]:
    """REAL baseline-JPEG decode with the standard library only — the
    decode_png_stdlib contract on the other major codec: marker walk,
    huffman entropy decode, dequantize, IDCT, then ``feature_dim``
    block-mean luma intensities in [0, 1]. JPEG's Y channel IS the
    ITU-R 601 luma the PNG path computes, so both codecs land in the
    same feature space. Supports 8-bit baseline sequential AND
    progressive (grayscale or YCbCr at any standard subsampling —
    chroma is entropy-decoded to keep interleaved bitstreams aligned
    but skips IDCT; chroma-only progressive scans are skipped without
    decoding); arithmetic / 12-bit / hierarchical raise
    NotImplementedError (fail loud, never fake). Pure Python per pixel
    — the codec seam's integration test
    and thumbnail-scale path; at corpus scale ship PIL to the executors
    and the identical mapInPandas plan runs unchanged."""
    _w, _h, luma = _jpeg_decode_luma(payload or b"")
    return _block_means(luma, feature_dim)


def decode_jpeg_rgb_stdlib(
    payload: bytes, *, feature_dim: int = 8
) -> list[float]:
    """COLOR twin of :func:`decode_jpeg_stdlib` (round 11 stretch —
    chroma IDCT): full YCbCr decode (baseline AND progressive) with
    JFIF conversion and pixel-replication chroma upsampling, then
    ``feature_dim`` blocks x (mean R, mean G, mean B) flattened to
    ``3 * feature_dim`` floats in [0, 1] — the color feature space for
    media near-dup where luma alone conflates differently-colored
    variants. Grayscale frames yield R = G = B so the features degrade
    gracefully to the luma family."""
    _w, _h, rgb = _jpeg_decode_luma(payload or b"", color=True)
    n = len(rgb) // 3
    feats = []
    for j in range(feature_dim):
        lo, hi = (j * n) // feature_dim, ((j + 1) * n) // feature_dim
        if hi <= lo:
            feats += [0.0, 0.0, 0.0]
            continue
        sums = [0, 0, 0]
        for i in range(lo, hi):
            sums[0] += rgb[3 * i]
            sums[1] += rgb[3 * i + 1]
            sums[2] += rgb[3 * i + 2]
        feats += [s / ((hi - lo) * 255.0) for s in sums]
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


# --- stdlib PCM WAV decoder (round 11) --------------------------------


def _g711_decode_table(law: int) -> "list[int]":
    """256-entry G.711 companded-byte -> linear-16 decode table
    (ITU-T G.711; law 6 = A-law, 7 = mu-law — the WAVE format codes).
    Closed-form expansion, no library: mu-law complements the byte,
    then magnitude = ((mantissa*8 + 0x84) << exponent) - 0x84; A-law
    XORs 0x55, then the exponent-0 segment is linear (mant*16 + 8) and
    higher segments add the 0x108 bias — both per the spec's segment
    tables, differentially pinned against the C audioop module in
    tests/test_multimodal.py."""
    out = []
    for b in range(256):
        if law == 7:  # mu-law
            u = ~b & 0xFF
            mag = (((u & 0x0F) << 3) + 0x84 << ((u >> 4) & 0x07)) - 0x84
            out.append(-mag if u & 0x80 else mag)
        else:  # A-law
            a = b ^ 0x55
            exp, mant = (a >> 4) & 0x07, a & 0x0F
            mag = (
                (mant << 4) + 8
                if exp == 0
                else ((mant << 4) + 0x108) << (exp - 1)
            )
            # A-law sign is INVERTED relative to mu-law: bit 7 SET (after
            # the 0x55 toggle) marks a POSITIVE sample per G.711 table 1
            out.append(mag if a & 0x80 else -mag)
    return out


@_functools.lru_cache(maxsize=2)
def _g711_np_table(law: int) -> "np.ndarray":
    """The G.711 decode table as an int64 numpy array, built once per
    worker per law (r15): the list form was rebuilt per payload, and the
    byte->linear expansion is now one vectorized fancy-index per chunk
    instead of a per-byte Python loop. Same integers, same values."""
    return np.asarray(_g711_decode_table(law), dtype=np.int64)


def compand_g711(samples: "list[int]", law: int) -> bytes:
    """G.711 COMPANDER (linear-16 -> companded byte; law 6 = A-law,
    7 = mu-law, the WAVE format codes) — the lossy encode
    :func:`encode_wav_g711` deliberately does not do implicitly: a
    caller quantizing studio PCM down to telephony runs this
    explicitly, then wraps the bytes verbatim. Direct port of the
    canonical public-domain Sun G.711 reference algorithm (the one the
    C audioop module ships): mu-law works on the arithmetic-shifted
    14-bit value with bias 33 and clip 8159; A-law on the 13-bit value
    with the negative ``-v - 1`` fold and the segment-0/1 half-step
    mantissa. Differentially pinned against audioop
    (lin2ulaw/lin2alaw) over the FULL 16-bit range in tests, and the
    expand->compand fixpoint holds for all 256 byte values per law
    (companding is idempotent on codec-exact levels). Out-of-range
    samples refuse loudly."""
    if law not in (6, 7):
        raise ValueError(
            f"compand_g711: law {law} (6=A-law / 7=mu-law WAVE codes)"
        )
    useg = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
    aseg = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)

    def _seg(v: int, table: "tuple[int, ...]") -> int:
        for i, bound in enumerate(table):
            if v <= bound:
                return i
        return len(table)

    out = bytearray()
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(
                f"compand_g711: sample {s} outside 16-bit range"
            )
        if law == 7:  # mu-law: 14-bit domain, bias 33, clip 8159
            v = s >> 2  # arithmetic shift: floors negatives, per spec
            if v < 0:
                v, mask = -v, 0x7F
            else:
                mask = 0xFF
            v = min(v, 8159) + 33
            seg = _seg(v, useg)
            byte = (
                0x7F
                if seg >= 8
                else (seg << 4) | ((v >> (seg + 1)) & 0x0F)
            )
            out.append(byte ^ mask)
        else:  # A-law: 13-bit domain, negative -v-1 fold
            v = s >> 3
            if v >= 0:
                mask = 0xD5  # sign bit set, then the 0x55 toggle
            else:
                v, mask = -v - 1, 0x55
            seg = _seg(v, aseg)
            if seg >= 8:
                byte = 0x7F
            elif seg < 2:  # linear segments: half-step mantissa
                byte = (seg << 4) | ((v >> 1) & 0x0F)
            else:
                byte = (seg << 4) | ((v >> seg) & 0x0F)
            out.append(byte ^ mask)
    return bytes(out)



#: IMA/DVI ADPCM quantizer step table (89 entries) and per-nibble index
#: adjustments — the published IMA spec constants, byte-identical to
#: the ones the C audioop module ships (the differential test pins the
#: whole recurrence against audioop.adpcm2lin).
_ADPCM_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)

_ADPCM_INDEX_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8)


def _adpcm_step(pred: int, idx: int, nib: int) -> "tuple[int, int]":
    """One IMA ADPCM decoder step: current (predictor, step index) +
    one 4-bit code -> next (predictor, step index). The reconstruction
    uses the spec's shift form — diff = step/8 + step·b2 + step/2·b1 +
    step/4·b0, negated when the sign bit (8) is set — with the
    predictor clamped to int16 and the index to [0, 88]. Exactly
    audioop's arithmetic (differentially pinned over full nibble/state
    sweeps in tests)."""
    step = _ADPCM_STEPS[idx]
    diff = step >> 3
    if nib & 4:
        diff += step
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step >> 2
    pred = pred - diff if nib & 8 else pred + diff
    pred = -32768 if pred < -32768 else (32767 if pred > 32767 else pred)
    idx += _ADPCM_INDEX_ADJ[nib & 7]
    return pred, (0 if idx < 0 else (88 if idx > 88 else idx))


def compress_adpcm(
    samples: "list[int]", pred: int = 0, idx: int = 0
) -> "tuple[bytes, int, int]":
    """IMA ADPCM COMPRESSOR (linear-16 -> 4-bit codes) — the lossy
    encode :func:`encode_wav_adpcm` deliberately does not do
    implicitly: a caller quantizing PCM down to ADPCM runs this
    explicitly, then assembles blocks (header = the carried state) and
    wraps them verbatim. The canonical IMA successive-approximation
    quantizer (the one the C audioop module ships): magnitude bits
    greedily subtract step, step/2, step/4 from |sample - predictor|
    while the reconstruction diff accumulates the same terms plus the
    step/8 floor, so encoder and decoder predictors stay bit-identical
    — the encoder THREADS :func:`_adpcm_step` to prove it. Returns
    ``(packed_bytes, predictor, step_index)`` with codes packed low
    nibble first (the WAV layout; pad nibble 0 on odd counts) and the
    carried state ready to head the next block. Differentially pinned
    against audioop.lin2adpcm in tests; refuses out-of-range samples
    and state loudly."""
    if not -32768 <= pred <= 32767:
        raise ValueError(f"compress_adpcm: predictor {pred} out of range")
    if not 0 <= idx <= 88:
        raise ValueError(f"compress_adpcm: step index {idx} > 88")
    nibbles = []
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(
                f"compress_adpcm: sample {s} outside 16-bit range"
            )
        step = _ADPCM_STEPS[idx]
        diff = s - pred
        nib = 8 if diff < 0 else 0
        if nib:
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        pred, idx = _adpcm_step(pred, idx, nib)
        nibbles.append(nib)
    if len(nibbles) & 1:
        nibbles.append(0)
    packed = bytes(
        nibbles[i] | (nibbles[i + 1] << 4)
        for i in range(0, len(nibbles), 2)
    )
    return packed, pred, idx


def _wav_decode_samples(payload: bytes) -> "tuple[int, list[float]]":
    """RIFF/WAVE walk + PCM sample decode, stdlib container walk with
    numpy-vectorized sample expansion (r15, guide §4.2): returns
    (sample_rate, mono samples in [-1, 1]) — every value bit-identical
    to the per-sample Python loops this replaces (integer unpack/table/
    downmix arithmetic is exact; float ops are the same correctly-rounded
    IEEE ops in the same order; the list boundary is kept so callers and
    the differential suites see the exact old API). Supports
    integer PCM (format 1) at 8-bit unsigned and 16-bit signed, any
    channel count (channels mix to mono by mean — the standard
    downmix); unknown RIFF chunks (LIST, fact, cue, ...) are skipped by
    their declared size exactly as the spec intends. IEEE-float (format
    3, 32/64-bit — round 11) decodes too, samples already in [-1, 1];
    G.711 A-law/mu-law telephony WAVs (formats 6/7, 8-bit companded —
    round 13) expand through the closed-form segment tables, pinned
    against the C audioop module; IMA/DVI ADPCM (format 17, 4-bit —
    round 14) decompresses block-by-block through the spec step table
    (:func:`_adpcm_step`, audioop-pinned), mono or interleaved stereo.
    Extensible (0xFFFE), other bit depths, and formats claiming the
    wrong per-sample width raise NotImplementedError (fail loud, never
    fake), as do truncated headers/chunks and partial ADPCM blocks."""
    import struct

    data = payload or b""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("decode_wav_stdlib: not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid in (b"fmt ", b"data") and len(body) < size:
            raise NotImplementedError(
                f"decode_wav_stdlib: truncated {cid.decode()!r} chunk"
            )
        if cid == b"fmt ":
            if size < 16:
                raise NotImplementedError(
                    "decode_wav_stdlib: short fmt chunk"
                )
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            frames = body
            if fmt is not None:
                break  # spec orders fmt before data; stop at the samples
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise NotImplementedError(
            "decode_wav_stdlib: missing fmt or data chunk"
        )
    audio_format, n_ch, rate, _brate, balign, bits = fmt
    if audio_format not in (1, 3, 6, 7, 17):
        raise NotImplementedError(
            f"decode_wav_stdlib: audio format {audio_format} "
            "(extensible/compressed need a real library)"
        )
    if n_ch < 1:
        raise NotImplementedError("decode_wav_stdlib: zero channels")
    if audio_format in (6, 7):  # G.711 A-law / mu-law (round 13)
        if bits != 8:
            raise NotImplementedError(
                f"decode_wav_stdlib: {bits}-bit "
                f"{'A-law' if audio_format == 6 else 'mu-law'} "
                "(G.711 companded samples are 8-bit)"
            )
        # numpy table lookup (r15, guide §4.2 vectorize inside the
        # kernel): integer table values are exact, so this is
        # bit-identical to the per-byte Python loop it replaces
        # (differential audioop suite + the G.711 oracles re-prove it)
        ints = _g711_np_table(audio_format)[
            np.frombuffer(frames, dtype=np.uint8)
        ]
        scale = 32768.0
    elif audio_format == 3:  # IEEE float (round 11): nominally [-1, 1]
        if bits == 32:
            n = len(frames) // 4
            ints = np.frombuffer(frames, dtype="<f4", count=n).astype(
                np.float64  # f32 -> f64 widening is exact
            )
        elif bits == 64:
            n = len(frames) // 8
            ints = np.frombuffer(frames, dtype="<f8", count=n).astype(
                np.float64
            )
        else:
            raise NotImplementedError(
                f"decode_wav_stdlib: {bits}-bit IEEE float "
                "(32/64 supported)"
            )
        # integer PCM can never produce these, so only the float path
        # guards: non-finite samples poison every downstream feature
        # (NaN comparisons are silently False in ahash voting) — fail
        # loud; legal-but-unclipped masters (|v| > 1) clip to full
        # scale, exactly as playback would, keeping the [0, 1] feature
        # contract
        if not np.isfinite(ints).all():
            raise NotImplementedError(
                "decode_wav_stdlib: non-finite IEEE-float samples"
            )
        ints = np.clip(ints, -1.0, 1.0)
        scale = 1.0
    elif audio_format == 17:  # IMA/DVI ADPCM (round 14)
        if bits != 4:
            raise NotImplementedError(
                f"decode_wav_stdlib: {bits}-bit IMA ADPCM "
                "(codes are 4-bit nibbles)"
            )
        # block = one 4-byte state header per channel (int16 predictor,
        # step index, reserved), then 4-byte nibble groups interleaved
        # per channel; the header predictor IS the block's first output
        # sample (the spec stores it literally)
        if balign < 8 * n_ch or (balign - 4 * n_ch) % (4 * n_ch):
            raise NotImplementedError(
                f"decode_wav_stdlib: IMA ADPCM block align {balign} "
                f"invalid for {n_ch} channel(s)"
            )
        if not frames or len(frames) % balign:
            raise NotImplementedError(
                "decode_wav_stdlib: IMA ADPCM data is not whole blocks"
            )
        ints = []
        for base in range(0, len(frames), balign):
            chans = []
            for c in range(n_ch):
                pred, idx, _rsv = struct.unpack_from(
                    "<hBB", frames, base + 4 * c
                )
                if idx > 88:
                    raise NotImplementedError(
                        f"decode_wav_stdlib: IMA ADPCM step index {idx}"
                        " > 88"
                    )
                chans.append([pred, idx, [pred]])
            for goff in range(base + 4 * n_ch, base + balign, 4 * n_ch):
                for c, st in enumerate(chans):
                    pred, idx, out = st
                    for b in frames[goff + 4 * c : goff + 4 * c + 4]:
                        for nib in (b & 0x0F, b >> 4):  # low nibble 1st
                            pred, idx = _adpcm_step(pred, idx, nib)
                            out.append(pred)
                    st[0], st[1] = pred, idx
            for i in range(len(chans[0][2])):
                for st in chans:
                    ints.append(st[2][i])
        ints = np.asarray(ints, dtype=np.int64)
        scale = 32768.0
    elif bits == 16:
        n = len(frames) // 2
        ints = np.frombuffer(frames, dtype="<i2", count=n).astype(np.int64)
        scale = 32768.0
    elif bits == 8:
        # 8-bit WAV is unsigned
        ints = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
        scale = 128.0
    else:
        raise NotImplementedError(
            f"decode_wav_stdlib: {bits}-bit PCM (8/16 supported)"
        )
    # Vectorized downmix (r15, guide §4.2), value-identical to the old
    # per-frame Python loop: integer formats sum exactly in int64 and pay
    # ONE float division per frame (the same single correctly-rounded op
    # the loop performed); the float format accumulates channels LEFT TO
    # RIGHT (elementwise `acc + col`, the same op order as the loop's
    # sum()) — never np.sum, whose pairwise reduction could differ in the
    # last ulp.
    n_frames = len(ints) // n_ch
    if n_ch == 1:
        mono = ints[:n_frames] / scale
    else:
        chans2 = ints[: n_frames * n_ch].reshape(n_frames, n_ch)
        if ints.dtype == np.int64:
            mono = chans2.sum(axis=1) / (n_ch * scale)
        else:
            acc = chans2[:, 0].copy()
            for c in range(1, n_ch):
                acc = acc + chans2[:, c]
            mono = acc / (n_ch * scale)
    return rate, mono.tolist()


def decode_wav_stdlib(payload: bytes, *, feature_dim: int = 8) -> list[float]:
    """REAL PCM-WAV decode with the standard library only — the third
    medium after PNG/JPEG to execute the seam's real branch on true
    bits: RIFF walk, 8/16-bit PCM, mono downmix, then the block-RMS
    loudness envelope — ``feature_dim`` root-mean-square energies over
    contiguous sample blocks, each in [0, 1]. The envelope is the audio
    analogue of the image kernels' block-mean luma: it rides the SAME
    downstream machinery (extract_features -> ahash_pack ->
    hamming_band_pairs), so near-duplicate audio dedup — re-encoded,
    re-gained, or padded uploads of one recording — is the identical
    pigeonhole plan the image corpus runs. Deterministic: no resampling,
    no windowing choices; empty audio yields all-zero features."""
    import math as _m

    _rate, mono = _wav_decode_samples(payload)
    n = len(mono)
    # vectorized block RMS (r15): squares are elementwise (same rounding
    # as the loop) and the block sum uses CUMSUM, whose accumulation is
    # sequential left-to-right — bit-identical to the Python sum() it
    # replaces (np.sum's pairwise reduction would not be)
    m = np.asarray(mono, dtype=np.float64)
    sq = m * m
    feats = []
    for j in range(feature_dim):
        lo, hi = (j * n) // feature_dim, ((j + 1) * n) // feature_dim
        if hi <= lo:
            feats.append(0.0)
            continue
        feats.append(
            _m.sqrt(float(np.cumsum(sq[lo:hi])[-1]) / (hi - lo))
        )
    return feats


# --- GIF decode: the fourth real-bits medium, and the video seam's ----
#     frame extraction made real (animated GIF = frames on true bits) --

_GIF_MAGICS = (b"GIF87a", b"GIF89a")

#: interlace passes (GIF89a spec appendix E): (first row, row step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(
    min_code_size: int, data: bytes, max_pixels: int
) -> "list[int]":
    """GIF-flavored LZW (variable code width 3..12 bits, LSB-first bit
    packing, in-stream clear/end codes, deferred-clear tolerated):
    ``data`` is the concatenated image sub-blocks, returns palette
    indexes. Corrupt codes and streams that end before ``max_pixels``
    indexes arrive raise NotImplementedError — fail loud, never fake."""
    if not 2 <= min_code_size <= 11:
        raise NotImplementedError(
            f"decode_gif_stdlib: bad LZW min code size {min_code_size}"
        )
    clear = 1 << min_code_size
    end = clear + 1
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    width = min_code_size + 1
    buf = nbits = bytepos = 0
    prev = None
    out: "list[int]" = []

    while True:
        while nbits < width:
            if bytepos >= len(data):
                raise NotImplementedError(
                    "decode_gif_stdlib: truncated LZW stream"
                )
            buf |= data[bytepos] << nbits
            bytepos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise NotImplementedError(
                    "decode_gif_stdlib: corrupt LZW (first code not in "
                    "table)"
                )
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + (table[prev][0],)
        else:
            raise NotImplementedError(
                "decode_gif_stdlib: corrupt LZW (code beyond table)"
            )
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(table[prev] + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = code
        if len(out) >= max_pixels:
            break
    if len(out) < max_pixels:
        raise NotImplementedError(
            f"decode_gif_stdlib: LZW stream ended at {len(out)} of "
            f"{max_pixels} pixels"
        )
    return out[:max_pixels]


def _gif_subblocks(data: bytes, pos: int) -> "tuple[bytes, int]":
    """Assemble a GIF data-sub-block chain ([len][bytes]... 0) starting
    at ``pos``; returns (payload, position after the terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise NotImplementedError(
                "decode_gif_stdlib: truncated sub-block chain"
            )
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise NotImplementedError(
                "decode_gif_stdlib: truncated sub-block"
            )
        chunks.append(data[pos : pos + n])
        pos += n


# (palette -> luma lives in the shared _rgb_triples_luma near the top)


def decode_gif_frames(
    payload: bytes, *, max_frames: "int | None" = None
) -> "list[tuple[int, int, list[int]]]":
    """REAL GIF decode with the standard library only — GIF87a/89a
    header walk, global/local color tables, LZW decompression,
    interlace reorder, and full ANIMATION COMPOSITION (frame rects,
    GIF89a transparency, disposal methods none/keep/restore-background/
    restore-previous). Returns one COMPOSED full-canvas luma frame
    (width, height, row-major intensities) per image in the stream —
    what a viewer would show, not the raw sub-rectangles the file
    stores — so an animated GIF is the sandbox's true-bits stand-in for
    video: :func:`gif_frame_fn` feeds these frames through the SAME
    sample_frames -> features -> ahash near-dup plan a real video
    corpus would run behind the ffmpeg seam. Unknown block types and
    truncated streams raise NotImplementedError (fail loud, never
    fake); pure Python per pixel, fine for thumbnail-scale payloads
    (the documented stdlib-kernel trade, see decode_png_stdlib)."""
    import struct

    data = payload or b""
    if data[:6] not in _GIF_MAGICS:
        raise NotImplementedError("decode_gif_stdlib: not a GIF payload")
    if len(data) < 13:
        raise NotImplementedError("decode_gif_stdlib: truncated header")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed, bg_index = data[10], data[11]
    if sw == 0 or sh == 0:
        raise NotImplementedError("decode_gif_stdlib: empty logical screen")
    pos = 13
    gct_luma: "list[int] | None" = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise NotImplementedError(
                "decode_gif_stdlib: truncated global color table"
            )
        gct_luma = _rgb_triples_luma(data[pos : pos + 3 * n])
        pos += 3 * n
    bg_luma = (
        gct_luma[bg_index]
        if gct_luma is not None and bg_index < len(gct_luma)
        else 0
    )
    canvas = [bg_luma] * (sw * sh)
    frames: "list[tuple[int, int, list[int]]]" = []
    disposal, transparent = 0, None
    while True:
        if pos >= len(data):
            # missing trailer: tolerate only if we already have frames
            # (common in the wild); an imageless stream is corrupt
            if frames:
                break
            raise NotImplementedError(
                "decode_gif_stdlib: stream ends before any image"
            )
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise NotImplementedError(
                    "decode_gif_stdlib: truncated extension"
                )
            label = data[pos]
            pos += 1
            body, pos = _gif_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                disposal = (body[0] >> 2) & 0x07
                transparent = body[3] if body[0] & 0x01 else None
            # comment/application/plain-text extensions: skipped whole
            continue
        if block != 0x2C:
            raise NotImplementedError(
                f"decode_gif_stdlib: unknown block 0x{block:02x}"
            )
        if pos + 9 > len(data):
            raise NotImplementedError(
                "decode_gif_stdlib: truncated image descriptor"
            )
        left, top, iw, ih = struct.unpack("<HHHH", data[pos : pos + 8])
        ipacked = data[pos + 8]
        pos += 9
        if iw == 0 or ih == 0 or left + iw > sw or top + ih > sh:
            raise NotImplementedError(
                "decode_gif_stdlib: image rect outside logical screen"
            )
        luma = gct_luma
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise NotImplementedError(
                    "decode_gif_stdlib: truncated local color table"
                )
            luma = _rgb_triples_luma(data[pos : pos + 3 * n])
            pos += 3 * n
        if luma is None:
            raise NotImplementedError(
                "decode_gif_stdlib: image with no color table"
            )
        if pos >= len(data):
            raise NotImplementedError(
                "decode_gif_stdlib: truncated image data"
            )
        min_code = data[pos]
        pos += 1
        lzw, pos = _gif_subblocks(data, pos)
        idx = _gif_lzw_decode(min_code, lzw, iw * ih)
        # interlace: decoded row i lands on canvas row rows[i]
        if ipacked & 0x40:
            rows = [
                r
                for first, step in _GIF_INTERLACE
                for r in range(first, ih, step)
            ]
        else:
            rows = list(range(ih))
        before = list(canvas) if disposal == 3 else None
        for i, r in enumerate(rows):
            src = idx[i * iw : (i + 1) * iw]
            dst = (top + r) * sw + left
            for x, v in enumerate(src):
                if v == transparent:
                    continue
                if v >= len(luma):
                    raise NotImplementedError(
                        "decode_gif_stdlib: pixel index beyond palette"
                    )
                canvas[dst + x] = luma[v]
        frames.append((sw, sh, list(canvas)))
        if max_frames is not None and len(frames) >= max_frames:
            break
        # disposal applies AFTER the frame is shown, to its rect only
        if disposal == 2:  # restore to background color
            for r in range(ih):
                dst = (top + r) * sw + left
                canvas[dst : dst + iw] = [bg_luma] * iw
        elif disposal == 3 and before is not None:  # restore previous
            canvas = before
        disposal, transparent = 0, None
    if not frames:
        raise NotImplementedError("decode_gif_stdlib: no image in stream")
    return frames


def decode_gif_stdlib(payload: bytes, *, feature_dim: int = 8) -> list[float]:
    """First-frame GIF featurization on true bits — the block-mean luma
    kernel every stdlib image codec here emits, so GIF corpora ride the
    identical extract_features -> ahash_pack -> hamming_band_pairs
    near-dup plan as PNG/JPEG ones (same feature family, same [0,1]
    scale, comparable only within one pinned kernel)."""
    w, h, luma = decode_gif_frames(payload, max_frames=1)[0]
    return _block_means(luma, feature_dim)


#: tiny deterministic gray-frame container for FRAME_SCHEMA payloads:
#: magic + <u32 w><u32 h> + row-major luma bytes — the shape a real
#: video frame extractor (the ffmpeg seam) would hand downstream
_GRAY_FRAME_MAGIC = b"GRY8"


def pack_gray_frame(width: int, height: int, luma: "list[int]") -> bytes:
    import struct

    if len(luma) != width * height:
        raise ValueError("pack_gray_frame: luma size != width * height")
    return (
        _GRAY_FRAME_MAGIC
        + struct.pack("<II", width, height)
        + bytes(luma)
    )


def gray_frame_features(frame: bytes, *, feature_dim: int = 8) -> list[float]:
    """Featurize one GRY8 frame container: the same block-mean luma
    kernel as the image codecs, so sampled VIDEO frames join images in
    one near-dup index when that is what the pipeline wants."""
    import struct

    data = frame or b""
    if data[:4] != _GRAY_FRAME_MAGIC or len(data) < 12:
        raise NotImplementedError("gray_frame_features: not a GRY8 frame")
    w, h = struct.unpack("<II", data[4:12])
    luma = data[12 : 12 + w * h]
    if len(luma) != w * h:
        raise NotImplementedError("gray_frame_features: truncated frame")
    return _block_means(luma, feature_dim)


@_functools.lru_cache(maxsize=4)
def _gif_frames_cached(payload: bytes) -> "tuple[bytes, ...]":
    # cache PACKED GRY8 containers, not int lists: a composed frame as a
    # Python list costs ~28 bytes/pixel pinned per executor process for
    # the cache's lifetime, so 4 cached 500x500x100-frame animations
    # would hold ~2.8 GB; as bytes the same residency is ~100 MB, and
    # gif_frame_fn returns the cached object without re-packing
    return tuple(
        pack_gray_frame(w, h, luma)
        for w, h, luma in decode_gif_frames(payload)
    )


def gif_frame_fn(payload: bytes, idx: int) -> bytes:
    """REAL ``frame_fn`` for :func:`sample_frames`: composed frame
    ``idx`` of an animated GIF as a GRY8 container. A sample grid
    longer than the animation holds the LAST frame (the standard
    video-sampler behavior for clips shorter than the grid — and what
    a GIF viewer shows after playback stops); a non-GIF payload still
    refuses loudly through decode_gif_frames. The seam signature is
    per (payload, idx), but the decode is memoized per payload (small
    per-process LRU of packed byte frames — sample_frames emits a media
    item's frames consecutively, so each payload decodes ONCE per
    executor instead of once per sampled frame; without the memo an
    n-frame grid costs a quadratic 1+2+...+n composition passes)."""
    frames = _gif_frames_cached(bytes(payload or b""))
    return frames[min(idx, len(frames) - 1)]


def _gif_lzw_encode(
    min_code_size: int,
    indexes: "list[int]",
    *,
    _stats: "dict | None" = None,
) -> bytes:
    """GIF-flavored LZW COMPRESSOR (the sink twin of
    :func:`_gif_lzw_decode`): greedy longest-match dictionary build,
    variable code width 3..12 bits with the canonical grow rule (width
    bumps when the just-assigned code fills it), LSB-first bit packing,
    and the spec's 12-bit ceiling handled deferred-clear style — at
    code 4096 the dictionary FREEZES and matching continues against the
    frozen table (GIF89a spec appendix F; decoders, including ours,
    stop adding at 4096 for exactly this case). Thumbnail-scale frames
    never reach the ceiling, but a correct sink must honor it.
    ``_stats``, when given, receives ``max_next_code`` — test-only
    instrumentation proving the ceiling branch actually fired."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    buf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: "dict[tuple[int, ...], int]" = {(i,): i for i in range(clear)}
    next_code, width = end + 1, min_code_size + 1
    emit(clear, width)
    prev: "tuple[int, ...]" = ()
    for v in indexes:
        if not 0 <= v < clear:
            raise ValueError(
                f"encode_gif: index {v} outside the {clear}-symbol "
                "LZW alphabet"
            )
        cur = prev + (v,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            if next_code == 1 << width and width < 12:
                width += 1
            next_code += 1
        prev = (v,)
    if prev:
        emit(table[prev], width)
    emit(end, width)
    if nbits:
        out.append(buf & 0xFF)
    if _stats is not None:
        _stats["max_next_code"] = next_code
    return bytes(out)


def encode_gif(
    screen_w: int,
    screen_h: int,
    palette_rgb: "list[tuple[int, int, int]]",
    frames: "list[tuple[int, int, int, int, list[int], dict]]",
    *,
    bg_index: int = 0,
) -> bytes:
    """Animated-GIF SINK for palette-indexed frame sequences — the
    write half of the multimodal codec family (GIF89a: logical screen +
    global color table, per-frame graphic-control extensions for
    disposal/transparency, image descriptors with optional interlace,
    LZW-compressed sub-blocks, trailer). ``frames`` entries are
    ``(left, top, w, h, row_major_indexes, opts)`` with opts keys
    ``disposal`` (0-3), ``transparent`` (palette index or None), and
    ``interlace`` (bool) — the exact vocabulary
    :func:`decode_gif_frames` composes, so a sampled-frame pipeline can
    round-trip sink -> source bit-losslessly (GIF is lossless on
    indexed pixels). Validation is loud: rects must sit inside the
    logical screen and indexes inside the palette. Pure Python per
    pixel — the documented thumbnail-scale stdlib trade shared by every
    codec here; the Spark-side plumbing (mapInPandas batch shape)
    carries any drop-in encoder unchanged."""
    import struct

    if screen_w <= 0 or screen_h <= 0:
        raise ValueError("encode_gif: empty logical screen")
    if not 2 <= len(palette_rgb) <= 256:
        raise ValueError("encode_gif: palette must hold 2..256 colors")
    if not frames:
        # a frameless stream is one every decoder (including ours)
        # rejects — refuse at encode time, not at the first decode
        raise ValueError("encode_gif: at least one frame is required")
    if not 0 <= bg_index < len(palette_rgb):
        # same validate-loudly contract as pixel indexes: a background
        # in the black-padded color-table tail would encode silently
        raise ValueError(
            f"encode_gif: bg_index {bg_index} outside the "
            f"{len(palette_rgb)}-color palette"
        )
    depth = 1
    while (2 << (depth - 1)) < len(palette_rgb):
        depth += 1
    n_colors = 2 << (depth - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", screen_w, screen_h)
    out.append(0x80 | (depth - 1))  # GCT present, size = 2^(depth)
    out.append(bg_index)
    out.append(0)  # pixel aspect ratio: unspecified
    for i in range(n_colors):
        r, g, b = palette_rgb[i] if i < len(palette_rgb) else (0, 0, 0)
        out += bytes((r, g, b))
    for left, top, w, h, idx, opts in frames:
        if w <= 0 or h <= 0 or left + w > screen_w or top + h > screen_h:
            raise ValueError("encode_gif: frame rect outside the screen")
        if len(idx) != w * h:
            raise ValueError("encode_gif: index count != rect size")
        # validate against the PALETTE, not the (padded) color-table /
        # LZW alphabet size: an index in the black-padded tail would
        # encode fine and silently decode as luma 0
        bad = next((v for v in idx if not 0 <= v < len(palette_rgb)), None)
        if bad is not None:
            raise ValueError(
                f"encode_gif: palette index {bad} outside the "
                f"{len(palette_rgb)}-color palette"
            )
        disposal = int(opts.get("disposal", 0))
        transparent = opts.get("transparent")
        if transparent is not None and not (
            0 <= int(transparent) < len(palette_rgb)
        ):
            raise ValueError(
                f"encode_gif: transparent index {int(transparent)} "
                f"outside the {len(palette_rgb)}-color palette"
            )
        if disposal or transparent is not None:
            out += bytes([0x21, 0xF9, 4])  # graphic control extension
            out.append(
                ((disposal & 0x07) << 2)
                | (1 if transparent is not None else 0)
            )
            out += struct.pack("<H", 0)  # delay: unspecified
            out.append(int(transparent) if transparent is not None else 0)
            out.append(0)
        out.append(0x2C)  # image descriptor
        out += struct.pack("<HHHH", left, top, w, h)
        interlace = bool(opts.get("interlace"))
        out.append(0x40 if interlace else 0x00)
        if interlace:
            rows = [
                r
                for first, step in _GIF_INTERLACE
                for r in range(first, h, step)
            ]
            idx = [v for r in rows for v in idx[r * w : (r + 1) * w]]
        mcs = max(2, depth)
        out.append(mcs)
        lzw = _gif_lzw_encode(mcs, list(idx))
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # sub-block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def encode_wav(
    channels: "list[list[int]]", *, rate: int = 8000, bits: int = 16
) -> bytes:
    """PCM-WAV SINK (RIFF/WAVE format 1) — the audio twin of
    :func:`encode_gif`: interleaves equal-length integer sample
    channels into one canonical fmt+data stream the decoder (and any
    player) reads back exactly. 16-bit signed and 8-bit unsigned PCM,
    any channel count; range violations and ragged channels refuse
    loudly. Pure Python, thumbnail-scale payloads — the documented
    stdlib-kernel trade."""
    import struct

    if not channels or not all(
        len(c) == len(channels[0]) for c in channels
    ):
        raise ValueError("encode_wav: channels must be equal-length")
    n_ch, n_frames = len(channels), len(channels[0])
    if bits == 16:
        lo, hi, fmt_char = -32768, 32767, "h"
    elif bits == 8:  # 8-bit WAV is unsigned by spec
        lo, hi, fmt_char = 0, 255, "B"
    else:
        raise ValueError(f"encode_wav: {bits}-bit PCM (8/16 supported)")
    inter = []
    for i in range(n_frames):
        for c in channels:
            v = c[i]
            if not lo <= v <= hi:
                raise ValueError(
                    f"encode_wav: sample {v} outside {bits}-bit range"
                )
            inter.append(v)
    frames = struct.pack(f"<{len(inter)}{fmt_char}", *inter)
    block_align = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * block_align, block_align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
        + (b"\x00" if len(frames) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_g711(companded: bytes, *, law: int, rate: int = 8000) -> bytes:
    """Telephony-WAV SINK (RIFF/WAVE formats 6/7): wrap already-
    companded G.711 bytes — A-law (``law=6``) or mu-law (``law=7``),
    the WAVE format codes — into the canonical mono 8-bit fmt+data
    stream :func:`decode_wav_stdlib` expands back through the
    closed-form segment tables (:func:`_g711_decode_table`). The
    encoder does NOT compand: G.711 sources (telephony captures, RTP
    dumps) arrive as companded bytes, and round-tripping them verbatim
    is the lossless contract; companding linear PCM is a lossy encode
    a caller does explicitly. Refuses unknown law codes and empty
    payloads loudly."""
    import struct

    if law not in (6, 7):
        raise ValueError(
            f"encode_wav_g711: law {law} (6=A-law / 7=mu-law WAVE codes)"
        )
    if not companded:
        raise ValueError("encode_wav_g711: empty sample stream")
    frames = bytes(companded)
    fmt = struct.pack("<HHIIHH", law, 1, rate, rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
        + (b"\x00" if len(frames) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_adpcm(
    blocks: bytes, *, block_align: int, channels: int = 1, rate: int = 8000
) -> bytes:
    """IMA-ADPCM WAV SINK (RIFF/WAVE format 17): wrap already-
    compressed IMA/DVI ADPCM blocks verbatim into the canonical
    fmt(+extension)+fact+data stream :func:`_wav_decode_samples`
    decompresses back through the spec step table. Same lossless
    contract as the G.711 sink: ADPCM sources arrive as coded blocks,
    and round-tripping them verbatim is the sink's job — compressing
    linear PCM is a lossy encode a caller does explicitly. The fmt
    chunk carries the standard cbSize=2 ``wSamplesPerBlock`` extension
    and a ``fact`` chunk declares the total frame count, exactly as
    encoders in the wild emit. Refuses empty/partial block streams,
    malformed block geometry, and out-of-range step indexes up front —
    at the sink, not mid-decode."""
    import struct

    if channels < 1:
        raise ValueError("encode_wav_adpcm: zero channels")
    if block_align < 8 * channels or (block_align - 4 * channels) % (
        4 * channels
    ):
        raise ValueError(
            f"encode_wav_adpcm: block align {block_align} invalid for "
            f"{channels} channel(s)"
        )
    data = bytes(blocks)
    if not data or len(data) % block_align:
        raise ValueError(
            "encode_wav_adpcm: stream is not a whole number of blocks"
        )
    for base in range(0, len(data), block_align):
        for c in range(channels):
            idx = data[base + 4 * c + 2]
            if idx > 88:
                raise ValueError(
                    f"encode_wav_adpcm: step index {idx} > 88 in block "
                    f"at byte {base}"
                )
    spb = (block_align - 4 * channels) * 2 // channels + 1
    n_frames = (len(data) // block_align) * spb
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 17, channels, rate, byte_rate, block_align, 4, 2, spb
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_frames)
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _jpeg_canonical_tables():
    """The minimal canonical Huffman pair every encoder here uses: all
    12 DC category symbols at one code length, and EOB/ZRL plus every
    (run 0-15, size 1-10) AC symbol at one (longer) length. Returns
    ``(dc_counts, dc_syms, dc_map, ac_counts, ac_syms, ac_map)`` with
    ``*_map: symbol -> (bit_length, code)``."""
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    dc_counts, ac_counts = [0] * 16, [0] * 16
    dc_counts[3] = len(dc_syms)  # 12 codes fit at length 4
    ac_counts[7] = len(ac_syms)  # 162 codes fit at length 8

    def canonical(counts, syms):
        table, code, k = {}, 0, 0
        for bit_len in range(1, 17):
            for _ in range(counts[bit_len - 1]):
                table[syms[k]] = (bit_len, code)
                code += 1
                k += 1
            code <<= 1
        return table

    return (
        dc_counts, dc_syms, canonical(dc_counts, dc_syms),
        ac_counts, ac_syms, canonical(ac_counts, ac_syms),
    )


def _jpeg_encode_entropy(
    comp_blocks: "list[list[dict[int, int]]]", name: str
) -> bytes:
    """Interleaved baseline entropy scan for components with 1x1
    sampling sharing the canonical table pair: one block from each
    component per MCU (component order = list order), per-COMPONENT DC
    predictors, byte stuffing, 1-padded tail — the gray encoder's exact
    coder generalized over the component axis (one component reproduces
    the original byte-for-byte; tests pin the round-trip)."""
    _dc_counts, _dc_syms, dc_map, _ac_counts, _ac_syms, ac_map = (
        _jpeg_canonical_tables()
    )
    buf = bytearray()
    acc, nbits = 0, 0

    def put(bit_len: int, code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << bit_len) | (code & ((1 << bit_len) - 1))
        nbits += bit_len
        while nbits >= 8:
            byte = (acc >> (nbits - 8)) & 0xFF
            buf.append(byte)
            if byte == 0xFF:
                buf.append(0x00)  # entropy byte stuffing
            nbits -= 8

    preds = [0] * len(comp_blocks)
    for bi in range(len(comp_blocks[0])):
        for ci, blocks in enumerate(comp_blocks):
            coef = blocks[bi]
            bad = next((k for k in coef if not 0 <= k < 64), None)
            if bad is not None:
                raise ValueError(
                    f"{name}: zigzag index {bad} outside 0..63"
                )
            dc = int(coef.get(0, 0))
            diff = dc - preds[ci]
            preds[ci] = dc
            cat = abs(diff).bit_length()
            if cat > 11:
                raise ValueError(
                    f"{name}: DC step {diff} exceeds category 11"
                )
            put(*dc_map[cat])
            if cat:
                put(cat, diff if diff >= 0 else diff + (1 << cat) - 1)
            run = 0
            for k in range(1, 64):
                v = int(coef.get(k, 0))
                if v == 0:
                    run += 1
                    continue
                size = abs(v).bit_length()
                if size > 10:
                    raise ValueError(
                        f"{name}: AC value {v} exceeds size 10"
                    )
                while run >= 16:
                    put(*ac_map[0xF0])
                    run -= 16
                put(*ac_map[(run << 4) | size])
                put(size, v if v >= 0 else v + (1 << size) - 1)
                run = 0
            if run:
                put(*ac_map[0x00])  # EOB
    if nbits:
        pad = 8 - nbits
        put(pad, (1 << pad) - 1)  # pad with 1s per spec
    return bytes(buf)


def encode_jpeg_gray(
    blocks_coef: "list[dict[int, int]]",
    width: int,
    height: int,
    quant: "list[int]",
) -> bytes:
    """Baseline grayscale JPEG SINK from caller-chosen QUANTIZED zigzag
    coefficients (one dict per 8x8 block, MCU raster order) — the image
    twin of :func:`encode_gif`/:func:`encode_wav`, and the frame
    producer for :func:`encode_avi_mjpeg`. Taking quantized
    coefficients rather than pixels keeps the sink exact: a DC-only
    block decodes to the closed-form flat value ``clamp(round(dc *
    quant[0] / 8) + 128)``, so test patterns and oracles can predict
    every decoded pixel with integer arithmetic (the encode_gif
    strategy applied to a lossy codec — lossy in general, bit-exact on
    the patterns we emit). Validation is loud: zigzag keys must be
    0..63, coefficient magnitudes must fit a 10-bit AC / 11-bit DC
    category, the quant table must be 64 entries of 1..255, and the
    block list must tile width x height exactly. Pure Python per
    block — the documented thumbnail-scale stdlib trade."""
    import struct

    if width <= 0 or height <= 0:
        raise ValueError("encode_jpeg_gray: empty image")
    if len(quant) != 64 or not all(1 <= q <= 255 for q in quant):
        raise ValueError(
            "encode_jpeg_gray: quant must be 64 entries in 1..255"
        )
    bx, by = (width + 7) // 8, (height + 7) // 8
    if len(blocks_coef) != bx * by:
        raise ValueError(
            f"encode_jpeg_gray: {bx * by} blocks tile {width}x{height}, "
            f"got {len(blocks_coef)}"
        )
    dc_counts, dc_syms, _dc_map, ac_counts, ac_syms, _ac_map = (
        _jpeg_canonical_tables()
    )
    buf = _jpeg_encode_entropy([blocks_coef], "encode_jpeg_gray")

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    return b"".join(
        (
            b"\xff\xd8",
            seg(0xDB, bytes([0]) + bytes(quant)),
            seg(
                0xC0,
                bytes([8])
                + struct.pack(">HH", height, width)
                + bytes([1, 1, 0x11, 0]),
            ),
            seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms)),
            seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms)),
            seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])),
            bytes(buf),
            b"\xff\xd9",
        )
    )


def encode_jpeg_color(
    blocks_y: "list[dict[int, int]]",
    blocks_cb: "list[dict[int, int]]",
    blocks_cr: "list[dict[int, int]]",
    width: int,
    height: int,
    quant: "list[int]",
) -> bytes:
    """Baseline COLOR JPEG SINK (YCbCr 4:4:4, interleaved) from
    caller-chosen quantized zigzag coefficients per component — the
    color twin of :func:`encode_jpeg_gray` with the same exactness
    contract: a DC-only block decodes each PLANE to the closed-form
    flat value, and the JFIF YCbCr->RGB conversion
    (:func:`_jpeg_ycc_to_rgb`) is a fixed arithmetic expression over
    those plane values, so oracles predict every decoded RGB pixel
    with closed-form arithmetic. 4:4:4 keeps all three planes at full
    resolution (no subsampling grid to re-derive); the scan
    interleaves one block per component per MCU with per-component DC
    predictors (the helper the gray encoder shares). All three block
    lists must tile width x height exactly; validation is the gray
    sink's, per component."""
    import struct

    if width <= 0 or height <= 0:
        raise ValueError("encode_jpeg_color: empty image")
    if len(quant) != 64 or not all(1 <= q <= 255 for q in quant):
        raise ValueError(
            "encode_jpeg_color: quant must be 64 entries in 1..255"
        )
    bx, by = (width + 7) // 8, (height + 7) // 8
    for nm, blocks in (
        ("Y", blocks_y), ("Cb", blocks_cb), ("Cr", blocks_cr)
    ):
        if len(blocks) != bx * by:
            raise ValueError(
                f"encode_jpeg_color: {bx * by} {nm} blocks tile "
                f"{width}x{height}, got {len(blocks)}"
            )
    dc_counts, dc_syms, _dc_map, ac_counts, ac_syms, _ac_map = (
        _jpeg_canonical_tables()
    )
    buf = _jpeg_encode_entropy(
        [blocks_y, blocks_cb, blocks_cr], "encode_jpeg_color"
    )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    return b"".join(
        (
            b"\xff\xd8",
            seg(0xDB, bytes([0]) + bytes(quant)),
            seg(
                0xC0,
                bytes([8])
                + struct.pack(">HH", height, width)
                # three components, all 1x1 sampling, shared quant 0
                + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
            ),
            seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms)),
            seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms)),
            seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])),
            buf,
            b"\xff\xd9",
        )
    )


def encode_avi_mjpeg(
    width: int,
    height: int,
    jpeg_frames: "list[bytes]",
    *,
    fps: int = 10,
) -> bytes:
    """Motion-JPEG-in-AVI SINK — the VIDEO CONTAINER twin of
    :func:`encode_wav` (both are RIFF): LIST hdrl (avih main header +
    one vids/MJPG stream with its BITMAPINFOHEADER), LIST movi holding
    each frame's complete JPEG bytes as a word-aligned ``00dc`` chunk,
    and the idx1 chunk index players use to seek. Every frame of an
    MJPEG stream is an independent keyframe — which is exactly why it
    is the honest first real video container here: frame extraction is
    a chunk walk plus the already-proven JPEG decoder, no inter-frame
    prediction. Frames must be well-formed JPEGs (SOI..EOI) and at
    least one is required; refusals are loud."""
    import struct

    if width <= 0 or height <= 0:
        raise ValueError("encode_avi_mjpeg: empty frame size")
    if fps <= 0:
        raise ValueError("encode_avi_mjpeg: fps must be positive")
    if not jpeg_frames:
        raise ValueError("encode_avi_mjpeg: at least one frame is required")
    for i, f in enumerate(jpeg_frames):
        if len(f) < 4 or f[:2] != b"\xff\xd8" or f[-2:] != b"\xff\xd9":
            raise ValueError(
                f"encode_avi_mjpeg: frame {i} is not a complete JPEG "
                "(SOI..EOI)"
            )

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (
            fourcc
            + struct.pack("<I", len(body))
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_frame = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_frame * fps,  # dwMaxBytesPerSec (upper bound)
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(jpeg_frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_frame,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale / dwRate = frame period
            0,  # dwStart
            len(jpeg_frames),  # dwLength (frames)
            max_frame,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality: default
            0,  # dwSampleSize: 0 = one sample per chunk
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx_entries = []
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position and
        # point at each chunk's ckid (movi_body starts with the fourcc)
        idx_entries.append((len(movi_body), len(f)))
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_video_frames(payload: bytes) -> "tuple[int, int, list[bytes]]":
    """RIFF-AVI walk (the WAV chunk walk pointed at the video
    container): validate the single video stream is MJPG, collect every
    ``00dc``/``00db`` frame chunk from LIST movi, and return
    ``(width, height, jpeg_frames)``. Compressed codecs (XVID/H264/...),
    audio-only files, DIB/raw streams, and truncated chunks refuse with
    NotImplementedError naming what a real library (ffmpeg) would add —
    fail loud, never fake."""
    import struct

    data = payload or b""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError(
            "_avi_video_frames: not a RIFF/AVI payload"
        )

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + size > end:
                raise NotImplementedError(
                    f"_avi_video_frames: truncated {cid!r} chunk"
                )
            yield cid, body_start, size
            pos = body_start + size + (size & 1)

    width = height = None
    handler = compression = None
    # streams are numbered by strl POSITION in hdrl; movi chunk ids carry
    # that two-digit number. Track it so a file that also carries an
    # audio stream neither reports WAVEFORMATEX bytes as the video codec
    # (strf is per-STREAM, not global) nor interleaves the audio
    # stream's chunks into the frame list (r13 ADVICE item 1).
    vid_stream = None
    stream_no = 0
    raw_frames: "list[tuple[bytes, bytes]]" = []  # (2-digit id, frame)

    def collect_movi(body_start: int, body_size: int) -> None:
        for c2, s2, z2 in walk(data, body_start + 4, body_start + body_size):
            if c2 == b"LIST" and data[s2 : s2 + 4] == b"rec ":
                # interleaved files group one frame-time's chunks under
                # LIST 'rec ' — recurse, same body shape as movi
                collect_movi(s2, z2)
            elif c2[2:4] in (b"dc", b"db"):
                raw_frames.append((c2[:2], data[s2 : s2 + z2]))

    for cid, start, size in walk(data, 12, len(data)):
        if cid != b"LIST":
            continue
        kind = data[start : start + 4]
        if kind == b"hdrl":
            for c2, s2, z2 in walk(data, start + 4, start + size):
                if c2 == b"avih" and z2 >= 40:
                    vals = struct.unpack("<10I", data[s2 : s2 + 40])
                    width, height = vals[8], vals[9]
                elif c2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    fcc = s_handler = s_comp = None
                    for c3, s3, z3 in walk(data, s2 + 4, s2 + z2):
                        if c3 == b"strh" and z3 >= 8:
                            fcc = data[s3 : s3 + 4]
                            s_handler = data[s3 + 4 : s3 + 8]
                        elif c3 == b"strf" and z3 >= 20:
                            s_comp = data[s3 + 16 : s3 + 20]
                    if fcc == b"vids" and vid_stream is None:
                        vid_stream = stream_no
                        handler = s_handler
                        compression = s_comp
                    stream_no += 1
        elif kind == b"movi":
            collect_movi(start, size)
    if width is None or handler is None or vid_stream is None:
        raise NotImplementedError(
            "_avi_video_frames: missing hdrl/avih/vids stream header"
        )
    want = b"%02d" % vid_stream
    frames = [f for sid, f in raw_frames if sid == want]
    codec = (compression or handler or b"????").decode(
        "ascii", "replace"
    )
    if handler != b"MJPG" or (
        compression is not None and compression != b"MJPG"
    ):
        raise NotImplementedError(
            f"_avi_video_frames: codec {codec!r} needs a real decoder "
            "(ffmpeg); only MJPG streams decode here"
        )
    if not frames:
        raise NotImplementedError("_avi_video_frames: empty movi list")
    return width, height, frames


@_functools.lru_cache(maxsize=4)
def _avi_frames_cached(payload: bytes) -> "tuple[bytes, ...]":
    # same packed-GRY8 residency discipline as _gif_frames_cached: the
    # cache pins bytes, never per-pixel Python lists
    _w, _h, jpegs = _avi_video_frames(payload)
    out = []
    for j in jpegs:
        fw, fh, luma = _jpeg_decode_luma(j)
        out.append(pack_gray_frame(fw, fh, luma))
    return tuple(out)


def avi_frame_fn(payload: bytes, idx: int) -> bytes:
    """REAL video ``frame_fn`` for :func:`sample_frames` — frame
    ``idx`` of an MJPEG-in-AVI clip as a GRY8 container, through the
    container walk plus the proven JPEG luma decoder (zero new pixel
    math: the container contributes chunk offsets only). A sample grid
    longer than the clip holds the LAST frame, matching
    :func:`gif_frame_fn`; non-AVI payloads and non-MJPG codecs refuse
    loudly through :func:`_avi_video_frames`. Decode is memoized per
    payload (packed-bytes LRU), so an n-frame grid decodes each clip
    once per executor."""
    frames = _avi_frames_cached(bytes(payload or b""))
    return frames[min(idx, len(frames) - 1)]
