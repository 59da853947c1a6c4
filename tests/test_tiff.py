"""TIFF codec (sources/tiff.py): LZW early-change timing, predictor,
strip assembly, PackBits, gray expansion, fail-loud boundaries, and
interchange cross-checks against the JVM's javax.imageio TIFF plugin
(shipped since JDK 9 — an independent implementation, so agreement
proves the files are real TIFF)."""

import struct

import numpy as np
import pytest

from vbpl_web_crawl_spark.sources import images as I
from vbpl_web_crawl_spark.sources import tiff as TF


def test_lzw_roundtrip_through_every_width():
    data = bytes(
        (np.arange(100_000, dtype=np.uint64) * 2654435761 % 251).astype(np.uint8)
    )
    enc = TF._tiff_lzw_encode(data)
    assert TF._tiff_lzw_decode(enc) == data
    assert len(enc) < len(data)


def test_packbits_runs_and_literals():
    # literal block of 3, then a run of 3
    assert TF._packbits_decode(bytes([2, 1, 2, 3, 254, 7])) == bytes(
        [1, 2, 3, 7, 7, 7]
    )


@pytest.mark.parametrize("iid", ["a", "tiff-x", "long/id"])
def test_roundtrip_lossless_and_deterministic(iid):
    px = I.synth_pixels(iid)
    data = TF.tiff_encode(px)
    assert data[:4] == b"II*\x00"
    assert np.array_equal(TF.tiff_decode(data), px)
    assert TF.tiff_encode(px) == data


def test_multi_strip_assembly():
    px = I.synth_pixels("strips")[:70]  # 70 rows, rows_per_strip 32 -> 3 strips
    data = TF.tiff_encode(px, rows_per_strip=32)
    assert np.array_equal(TF.tiff_decode(data), px)


def test_gray_expands_to_rgb():
    """Hand-build an uncompressed photometric-1 grayscale TIFF."""
    g = I.synth_pixels("gray-tiff")[:16, :16, 0]
    h, w = g.shape

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHII", tag, typ, cnt, val)

    ifd = struct.pack("<H", 8)
    data_off = 8 + 2 + 12 * 8 + 4
    ifd += entry(256, 4, 1, w) + entry(257, 4, 1, h) + entry(258, 3, 1, 8)
    ifd += entry(259, 3, 1, 1) + entry(262, 3, 1, 1)
    ifd += entry(273, 4, 1, data_off) + entry(277, 3, 1, 1)
    ifd += entry(279, 4, 1, h * w)
    ifd += struct.pack("<I", 0)
    raw = b"II*\x00" + struct.pack("<I", 8) + ifd + g.tobytes()
    out = TF.tiff_decode(raw)
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_boundaries_fail_loud():
    px = I.synth_pixels("bound")[:8, :8]
    data = bytearray(TF.tiff_encode(px))
    # flip the compression tag (259) value to JPEG-in-TIFF (7)
    bo_ifd = struct.unpack("<I", data[4:8])[0]
    (n,) = struct.unpack("<H", data[bo_ifd : bo_ifd + 2])
    for i in range(n):
        e = bo_ifd + 2 + 12 * i
        tag = struct.unpack("<H", data[e : e + 2])[0]
        if tag == 259:
            data[e + 8 : e + 12] = struct.pack("<I", 7)
    with pytest.raises(NotImplementedError, match="compression"):
        TF.tiff_decode(bytes(data))
    with pytest.raises(ValueError, match="not a TIFF"):
        TF.tiff_decode(b"XXXX1234")


def test_registry_dispatch():
    px = I.synth_pixels("tiff-reg")
    assert np.array_equal(I.decode_image(I.encode_image(px, "tiff"), "tiff"), px)
    assert "tiff" in I.registered_formats()


# ---------------------------------------------------------------------------
# Interchange with javax.imageio (TIFF plugin, JDK 9+)
# ---------------------------------------------------------------------------


def _java_img(jvm, px):
    h, w = px.shape[:2]
    img = jvm.java.awt.image.BufferedImage(w, h, 1)
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    return img


def test_javax_reads_our_tiff_exactly(spark):
    jvm = spark._jvm
    px = I.synth_pixels("tiff-interop")[:48, :48]
    data = TF.tiff_encode(np.ascontiguousarray(px))
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(data))
    )
    assert img is not None, "javax.imageio could not parse our TIFF"
    assert (img.getHeight(), img.getWidth()) == px.shape[:2]
    for y in range(0, 48, 5):
        for x in range(0, 48, 5):
            rgb = img.getRGB(x, y)
            got = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
            assert got == tuple(int(v) for v in px[y, x]), (x, y)


@pytest.mark.parametrize("comp", ["LZW", "PackBits", "Deflate", None])
def test_we_read_javax_tiff_exactly(spark, comp):
    """The JDK writer's LZW (with its own predictor choice), PackBits,
    Deflate and uncompressed streams all decode pixel-exact."""
    jvm = spark._jvm
    px = I.synth_pixels("tiff-interop-2")[:48, :48]
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("tif").next()
    params = writer.getDefaultWriteParam()
    if comp:
        params.setCompressionMode(2)
        params.setCompressionType(comp)
    baos = jvm.java.io.ByteArrayOutputStream()
    out = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(out)
    writer.write(
        None, jvm.javax.imageio.IIOImage(_java_img(jvm, px), None, None), params
    )
    out.flush()
    assert np.array_equal(TF.tiff_decode(bytes(baos.toByteArray())), px)
