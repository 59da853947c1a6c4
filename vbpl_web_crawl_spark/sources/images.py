"""Synthetic image payloads + pure-numpy codecs for the image+caption
corpus (BASELINE.json input_hint).

The reference downloads scanned legal documents as PDF/DOC binaries
(/root/reference/app/service/get_pdf.py:63-65); here the "scan" is a
deterministic synthetic image so the per-row invariants (decoded-pixel
allclose / PSNR >= 40 dB, phash recomputation) are verifiable without
network or external decoders.

Container has no PIL/imageio, so:
- ``png``: real PNG (RGB8, filter 0) encoded/decoded with zlib+numpy —
  lossless, byte-exact roundtrip.
- ``vdct``: a deterministic lossy codec (8x8 block DCT + quantization +
  zlib), standing in for JPEG. Loss is bounded so PSNR >= 40 dB at the
  default quality — the same invariant a real JPEG q=85 path satisfies.
  A production deployment swaps in PIL/libjpeg behind decode_image();
  the Spark-side plumbing (binary column, Arrow batches, schema) is
  identical and is what these tests exercise.

Everything is vectorized numpy over whole images; the Spark entry points
batch rows through mapInPandas (no per-row Python at the row level —
the loop is per image inside an Arrow batch, which is the intended
pattern for opaque binary payloads).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# PNG (lossless). Encoder: RGB8, filter 0 (optionally Adam7-interlaced
# for decoder coverage). Decoder: the real-world surface — all five
# scanline filters (none/sub/up/average/Paeth), Adam7 interlace, color
# types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) at
# 8-bit depth, multi-IDAT. Sub-8-bit and 16-bit depths raise the
# documented boundary.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7: (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """RGB8 HxWx3 uint8 -> PNG bytes (filter 0, zlib level 6)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            sh, sw = sub.shape[:2]
            parts.append(
                np.concatenate(
                    [np.zeros((sh, 1), dtype=np.uint8), sub.reshape(sh, sw * 3)],
                    axis=1,
                ).tobytes()
            )
        raw = b"".join(parts)
    else:
        raw = np.concatenate(
            [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
        ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Filtered scanlines -> (h, w*bpp) reconstructed bytes."""
    stride = w * bpp
    src = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = src[y, 0]
        line = src[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else zero_row.astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # up
            rec = line + prev
        elif ftype == 1:  # sub: per-lane prefix sum mod 256
            lanes = line.reshape(w, bpp)
            rec = np.cumsum(lanes, axis=0).reshape(stride)
        elif ftype == 3:  # average
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] & 0xFF if x >= bpp else 0
                rec[x] = line[x] + ((left + (prev[x] & 0xFF)) >> 1)
        elif ftype == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] & 0xFF if x >= bpp else 0
                ul = prev[x - bpp] & 0xFF if x >= bpp else 0
                rec[x] = line[x] + _paeth(left, prev[x] & 0xFF, ul)
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    return out


def _png_channels(ctype: int) -> int:
    return {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]


def _png_to_rgb(arr: np.ndarray, ctype: int, palette: np.ndarray | None) -> np.ndarray:
    """(h, w, channels) -> RGB8 (alpha dropped; palette expanded)."""
    if ctype == 2:
        return arr
    if ctype == 6:
        return arr[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(arr, 3, axis=2)
    if ctype == 4:
        return np.repeat(arr[:, :, :1], 3, axis=2)
    if ctype == 3:
        assert palette is not None, "palette image without PLTE"
        return palette[arr[:, :, 0]]
    raise NotImplementedError(f"PNG color type {ctype}")


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> RGB8 HxWx3 (all filters, Adam7, color types
    0/2/3/4/6 at 8-bit depth)."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, idat, w, h, bits, ctype, ilace = 8, b"", 0, 0, 8, 2, 0
    palette = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bits, ctype, _, _, ilace = struct.unpack(">IIBBBBB", payload[:13])
            if bits != 8:
                raise NotImplementedError(
                    f"PNG bit depth {bits}: only 8-bit decodes natively"
                )
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    bpp = _png_channels(ctype)
    raw = zlib.decompress(idat)
    if ilace == 0:
        rec = _png_unfilter(raw, h, w, bpp).reshape(h, w, bpp)
        return _png_to_rgb(rec, ctype, palette)
    # Adam7: each pass is an independently filtered sub-image
    out = np.zeros((h, w, bpp), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        sw = (w - x0 + dx - 1) // dx
        sh = (h - y0 + dy - 1) // dy
        if sw == 0 or sh == 0:
            continue
        n = sh * (sw * bpp + 1)
        out[y0::dy, x0::dx] = _png_unfilter(raw[off : off + n], sh, sw, bpp).reshape(
            sh, sw, bpp
        )
        off += n
    return _png_to_rgb(out, ctype, palette)


# --------------------------------------------------------------------------
# vdct (deterministic lossy) — 8x8 block DCT, quantize, zlib.
# --------------------------------------------------------------------------

_VDCT_MAGIC = b"VDCT"

_DCT8 = np.zeros((8, 8), dtype=np.float32)
for _k in range(8):
    for _n in range(8):
        _DCT8[_k, _n] = np.cos(np.pi * (_n + 0.5) * _k / 8.0)
_DCT8 *= np.float32(np.sqrt(2.0 / 8.0))
_DCT8[0] /= np.float32(np.sqrt(2.0))

# flat quantization step; 4.0 keeps worst-case error ~2/channel -> PSNR>40
_Q_STEP = 4.0


def _blockify(chan: np.ndarray) -> np.ndarray:
    h, w = chan.shape
    return chan.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return blocks.transpose(0, 2, 1, 3).reshape(h, w)


def vdct_encode(pixels: np.ndarray) -> bytes:
    """RGB8 HxWx3 (H,W multiples of 8) -> lossy-compressed bytes."""
    h, w, c = pixels.shape
    assert h % 8 == 0 and w % 8 == 0 and c == 3
    coeffs = []
    for ch in range(3):
        blocks = _blockify(pixels[:, :, ch].astype(np.float32) - np.float32(128.0))
        dct = np.einsum("ij,abjk,lk->abil", _DCT8, blocks, _DCT8)
        q = np.round(dct / np.float32(_Q_STEP)).astype(np.int16)
        coeffs.append(q)
    payload = zlib.compress(np.stack(coeffs).tobytes(), 6)
    return _VDCT_MAGIC + struct.pack(">HH", w, h) + payload


def vdct_decode(data: bytes) -> np.ndarray:
    assert data[:4] == _VDCT_MAGIC, "not vdct"
    w, h = struct.unpack(">HH", data[4:8])
    q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.int16).reshape(
        3, h // 8, w // 8, 8, 8
    )
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for ch in range(3):
        dct = q[ch].astype(np.float32) * np.float32(_Q_STEP)
        blocks = np.einsum("ji,abjk,kl->abil", _DCT8, dct, _DCT8)
        out[:, :, ch] = np.clip(
            np.round(_unblockify(blocks, h, w) + np.float32(128.0)), 0, 255
        ).astype(np.uint8)
    return out


# --------------------------------------------------------------------------
# Codec registry — the pluggable decode boundary (X3). Built-ins: png
# (lossless, own impl), jpeg (real baseline JPEG, sources/jpeg.py), vdct
# (deterministic lossy stand-in). A deployment with PIL/libjpeg/ffmpeg
# registers richer codecs here (e.g. register_codec("webp", enc, dec))
# and every Spark-side consumer — fetch UDF, decode stats, thumbnailer —
# picks them up without change.
# --------------------------------------------------------------------------

from collections.abc import Callable as _Callable  # noqa: E402

_CODECS: dict[str, tuple[_Callable, _Callable]] = {}


def register_codec(fmt: str, encode: _Callable, decode: _Callable) -> None:
    _CODECS[fmt] = (encode, decode)


def registered_formats() -> tuple[str, ...]:
    return tuple(sorted(_CODECS))


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    try:
        enc, _ = _CODECS[fmt]
    except KeyError:
        raise NotImplementedError(
            f"no codec registered for {fmt!r} (have {registered_formats()}); "
            "register one via images.register_codec(fmt, encode, decode)"
        ) from None
    return enc(pixels)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    try:
        _, dec = _CODECS[fmt]
    except KeyError:
        raise NotImplementedError(
            f"no codec registered for {fmt!r} (have {registered_formats()}); "
            "register one via images.register_codec(fmt, encode, decode)"
        ) from None
    return dec(data)


def _register_builtins() -> None:
    from vbpl_web_crawl_spark.sources import bmp as _bmp
    from vbpl_web_crawl_spark.sources import gif as _gif
    from vbpl_web_crawl_spark.sources import jpeg as _jpeg

    register_codec("png", png_encode, png_decode)
    register_codec("vdct", vdct_encode, vdct_decode)
    register_codec("jpeg", _jpeg.jpeg_encode, _jpeg.jpeg_decode)
    # GIF: lossless for <= 256 unique colors, deterministic median-cut
    # quantization above (the format's own palette limit)
    register_codec(
        "gif",
        lambda px: _gif.gif_encode(px, quantize=True),
        _gif.gif_decode,
    )
    register_codec("bmp", _bmp.bmp_encode, _bmp.bmp_decode)
    from vbpl_web_crawl_spark.sources import tiff as _tiff

    register_codec("tiff", _tiff.tiff_encode, _tiff.tiff_decode)


_register_builtins()


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# --------------------------------------------------------------------------
# Perceptual hash: 32x32 grayscale -> 32-pt DCT -> top-left 8x8 (minus DC)
# -> median threshold -> 64-bit int.
#
# The DCT runs in scaled int64 arithmetic, NOT float matmul: float `@`
# dispatches to BLAS whose reduction order varies with thread count, so
# the same image could hash differently in a Spark worker vs the driver.
# Integer addition is associative — the hash is bit-stable everywhere.
# --------------------------------------------------------------------------

_DCT32_INT = np.zeros((32, 32), dtype=np.int64)
for _k in range(32):
    for _n in range(32):
        _DCT32_INT[_k, _n] = round(np.cos(np.pi * (_n + 0.5) * _k / 32.0) * (1 << 14))


def phash64(pixels: np.ndarray) -> int:
    h, w, _ = pixels.shape
    gray16 = pixels.astype(np.int64).sum(axis=2)  # 3x gray, scale-invariant
    # block-sum resize to 32x32 (h, w are multiples of 32 in our corpus;
    # index-sampling fallback otherwise) — sums, not means: the median
    # threshold is scale-invariant so no division is needed
    if h % 32 == 0 and w % 32 == 0:
        bh, bw = h // 32, w // 32
        small = gray16.reshape(32, bh, 32, bw).sum(axis=(1, 3)) // (bh * bw)
    else:
        yi = (np.arange(32) * h) // 32
        xi = (np.arange(32) * w) // 32
        small = gray16[np.ix_(yi, xi)]
    dct = _DCT32_INT @ small @ _DCT32_INT.T  # int64 matmul: deterministic
    block = dct[:8, :8].flatten()[1:]
    med = int(np.median(block))
    bits = (block > med).astype(np.uint64)
    val = np.uint64(0)
    for i, b in enumerate(bits):
        val |= b << np.uint64(i)
    return int(val.astype(np.int64))  # two's complement into Spark LongType


# --------------------------------------------------------------------------
# Deterministic synthetic "scan" generation
# --------------------------------------------------------------------------


def splitmix64(x: np.ndarray | int):
    """Deterministic 64-bit mix (public-domain splitmix64 constants)."""
    x = np.uint64(x) if np.isscalar(x) else x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
            0xFFFFFFFFFFFFFFFF
        )
        return z ^ (z >> np.uint64(31))


def synth_pixels(image_id: str) -> np.ndarray:
    """Pixels are a pure function of the image_id (FIXTURES.md §1):
    a banded 'scanned page' texture — light background, dark text-like
    rows — so lossy compression behaves like it would on real scans."""
    seed = int(splitmix64(zlib.crc32(image_id.encode()) & 0xFFFFFFFF))
    rng = np.random.Generator(np.random.PCG64(seed))
    dims = [64, 128, 256]
    h = dims[seed % 3]
    w = dims[(seed // 3) % 3]
    # integer ops, minimal passes: this stage runs once per fetched
    # image across the whole cluster — keeping it ALU-bound (not DRAM-
    # bound) is what preserves N->4N scaling efficiency at high core
    # occupancy. int16 noise + saturating cast, no float temporaries.
    img = np.full((h, w, 3), 235, dtype=np.int16)
    # text-like dark bands every 8 rows
    n_lines = h // 8
    line_dark = rng.integers(20, 90, size=n_lines)
    for i in range(n_lines):
        rows = slice(i * 8 + 2, i * 8 + 6)
        cols = slice(4, w - 4 - int(rng.integers(0, w // 4)))
        img[rows, cols, :] = line_dark[i]
    # uniform scan noise (integer, cheaper than gaussian)
    img += rng.integers(-3, 4, size=img.shape, dtype=np.int16)
    return np.clip(img, 0, 255).astype(np.uint8)


_TOPICS = (
    "quản lý đất đai",
    "thuế thu nhập doanh nghiệp",
    "bảo vệ môi trường",
    "giao thông đường bộ",
    "lao động và việc làm",
    "giáo dục đại học",
    "y tế dự phòng",
    "đầu tư công",
)


def synth_caption(image_id: str) -> str:
    """Deterministic Vietnamese-like title keyed by image_id
    (FIXTURES.md §1; caption ↔ reference title/metadata text)."""
    seed = int(splitmix64(zlib.crc32(image_id.encode()) & 0xFFFFFFFF))
    n = seed % 900 + 100
    year = 2000 + (seed // 7) % 25
    topic = _TOPICS[(seed // 11) % len(_TOPICS)]
    return f"Nghị định số {n}/{year}/NĐ-CP về {topic}"


def synth_image_record(image_id: str) -> dict:
    """Full corpus row for one image_id: bytes, dims, fmt, caption, phash.

    fmt mix: ~60% png (lossless) / 20% jpeg (real baseline JPEG,
    sources/jpeg.py) / 20% vdct (lossy stand-in), per FIXTURES.md §1.
    """
    pixels = synth_pixels(image_id)
    seed = int(splitmix64(zlib.crc32(image_id.encode()) & 0xFFFFFFFF))
    r = (seed // 13) % 10
    fmt = "png" if r < 6 else ("jpeg" if r < 8 else "vdct")
    data = encode_image(pixels, fmt)
    return {
        "image_id": image_id,
        "bytes": data,
        "w": int(pixels.shape[1]),
        "h": int(pixels.shape[0]),
        "fmt": fmt,
        "caption": synth_caption(image_id),
        "phash": phash64(decode_image(data, fmt)),
    }
