"""Real-world PNG decode (sources/images.py): all five scanline
filters, Adam7 interlace, color types 0/2/3/4/6, multi-IDAT — decoder
coverage a crawler actually needs (external writers pick filters
adaptively and emit palette/gray/alpha variants). Cross-validated
against the JDK's PNG writer/reader."""

import struct
import zlib

import numpy as np
import pytest

from vbpl_web_crawl_spark.sources import images as IMG


def _filter_rows(px: np.ndarray, ftype: int) -> bytes:
    """Reference encoder-side filtering for one type across all rows."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y in range(h):
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        cur = flat[y]
        left = np.concatenate([np.zeros(c, dtype=np.int32), cur[:-c]])
        ul = np.concatenate([np.zeros(c, dtype=np.int32), prev[:-c]])
        if ftype == 0:
            f = cur
        elif ftype == 1:
            f = cur - left
        elif ftype == 2:
            f = cur - prev
        elif ftype == 3:
            f = cur - ((left + prev) >> 1)
        else:  # paeth
            f = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                f[x] = cur[x] - IMG._paeth(int(left[x]), int(prev[x]), int(ul[x]))
        out.append(ftype)
        out += (f & 0xFF).astype(np.uint8).tobytes()
    return bytes(out)


def _build_png(raw: bytes, w: int, h: int, ctype: int = 2, plte: bytes = b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = IMG._PNG_SIG + IMG._chunk(b"IHDR", ihdr)
    if plte:
        out += IMG._chunk(b"PLTE", plte)
    return out + IMG._chunk(b"IDAT", zlib.compress(raw)) + IMG._chunk(b"IEND", b"")


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_type_decodes_exact(ftype):
    px = IMG.synth_pixels("png-filters")[:24, :17]
    data = _build_png(_filter_rows(px, ftype), 17, 24)
    assert np.array_equal(IMG.png_decode(data), px), f"filter {ftype}"


def test_mixed_filters_per_row():
    px = IMG.synth_pixels("png-mixed")[:10, :9]
    rows = bytearray()
    for y in range(10):
        rows += _filter_rows(px[: y + 1], (y % 5))[-(9 * 3 + 1) :]
    assert np.array_equal(IMG.png_decode(_build_png(bytes(rows), 9, 10)), px)


@pytest.mark.parametrize("hw", [(1, 1), (2, 3), (7, 5), (9, 16), (33, 31), (64, 64)])
def test_adam7_roundtrip_all_dims(hw):
    px = np.ascontiguousarray(IMG.synth_pixels("png-adam")[: hw[0], : hw[1]])
    assert np.array_equal(IMG.png_decode(IMG.png_encode(px, interlace=True)), px)


def test_palette_and_gray_and_alpha_types():
    # palette (type 3)
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3) * 5
    idx = (np.arange(6 * 7, dtype=np.uint8) % 16).reshape(6, 7)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(6))
    data = _build_png(raw, 7, 6, ctype=3, plte=pal.tobytes())
    assert np.array_equal(IMG.png_decode(data), pal[idx])
    # gray (type 0)
    g = IMG.synth_pixels("png-gray")[:5, :8, 0]
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(5))
    assert np.array_equal(
        IMG.png_decode(_build_png(raw, 8, 5, ctype=0)), np.repeat(g[:, :, None], 3, 2)
    )
    # RGBA (type 6): alpha dropped
    px = IMG.synth_pixels("png-rgba")[:5, :8]
    rgba = np.dstack([px, np.full((5, 8), 77, np.uint8)])
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(5))
    assert np.array_equal(IMG.png_decode(_build_png(raw, 8, 5, ctype=6)), px)


def test_16bit_raises_boundary():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    data = IMG._PNG_SIG + IMG._chunk(b"IHDR", ihdr) + IMG._chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="bit depth"):
        IMG.png_decode(data)


def _jint(v: int) -> int:
    return v - (1 << 32) if v >= (1 << 31) else v


@pytest.mark.parametrize("btype", [1, 10, 13, 2])  # RGB, GRAY, INDEXED, ARGB
def test_javax_written_png_decodes_raw_exact(spark, btype):
    """The JDK PNG writer picks filters adaptively and emits color
    type 2/0/3/6 for these BufferedImage types; our decode must equal
    the JDK reader's RAW raster samples (getRGB applies a gray->sRGB
    colorspace curve, so raster samples are the honest comparison)."""
    jvm = spark._jvm
    px = IMG.synth_pixels("png-java")[:32, :32]
    img = jvm.java.awt.image.BufferedImage(32, 32, btype)
    for y in range(32):
        for x in range(32):
            r, g, b = (int(v) for v in px[y, x])
            img.setRGB(x, y, _jint((255 << 24) | (r << 16) | (g << 8) | b))
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "png", baos)
    data = bytes(baos.toByteArray())
    ours = IMG.png_decode(data)
    jr = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(data)))
    ras = jr.getRaster()
    bands = ras.getNumBands()
    cm = jr.getColorModel()
    for y in range(0, 32, 3):
        for x in range(0, 32, 3):
            if bands >= 3:
                want = tuple(ras.getSample(x, y, i) for i in range(3))
            elif cm.getClass().getSimpleName() == "IndexColorModel":
                i = ras.getSample(x, y, 0)
                want = (cm.getRed(i), cm.getGreen(i), cm.getBlue(i))
            else:  # gray
                s = ras.getSample(x, y, 0)
                want = (s, s, s)
            assert tuple(int(v) for v in ours[y, x]) == want, (btype, x, y)


def test_javax_reads_our_interlaced_png(spark):
    jvm = spark._jvm
    px = IMG.synth_pixels("png-ours-ilace")[:32, :32]
    data = IMG.png_encode(np.ascontiguousarray(px), interlace=True)
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(data)))
    assert img is not None
    for y in range(0, 32, 3):
        for x in range(0, 32, 3):
            v = img.getRGB(x, y)
            assert tuple(int(c) for c in px[y, x]) == (
                (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF,
            )
