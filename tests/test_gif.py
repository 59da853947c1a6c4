"""GIF codec (sources/gif.py): LZW width-bump/reset coverage, lossless
palette roundtrip, interlace, animation compositing (transparency +
disposal), deterministic quantization, and interchange cross-checks
against the JVM's javax.imageio GIF reader/writer (an independent
implementation shipped with the Spark runtime — proves the files are
real GIF, not a private format)."""

import struct

import numpy as np
import pytest

from vbpl_web_crawl_spark.sources import gif as G
from vbpl_web_crawl_spark.sources import images as IMG


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def test_lzw_roundtrip_width_bumps_and_reset():
    """90k symbols over a 64-symbol alphabet: the table grows through
    every width bump 7->12 and hits the 4096 cap (encoder reset path)."""
    idx = (np.arange(300 * 300, dtype=np.uint64) * 2654435761 % 251 % 64).astype(
        np.uint8
    )
    enc = G._lzw_encode(idx.tobytes(), 6)
    assert G._lzw_decode(enc, 6) == idx.tobytes()
    assert len(enc) < len(idx)  # actually compresses


def test_lzw_handles_deferred_clear_tail():
    """A stream that ends without EOI (some writers truncate) decodes
    what it has instead of crashing."""
    enc = G._lzw_encode(bytes(range(16)) * 4, 4)
    assert G._lzw_decode(enc[:-1], 4)  # no exception, prefix decoded


# ---------------------------------------------------------------------------
# Roundtrip invariants
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("gid", ["a", "stamp-7", "x/y"])
def test_lossless_roundtrip_and_determinism(gid):
    frames = G.synth_gif_frames(gid, 5)
    data = G.gif_encode_frames(frames, delay_cs=7, loop=3)
    assert data[:6] == b"GIF89a" and data[-1:] == b"\x3b"
    dec, delays, loop = G.gif_decode_frames(data)
    assert len(dec) == 5 and delays == [7] * 5 and loop == 3
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)  # palette-limited => bit-lossless
    assert G.gif_encode_frames(frames, delay_cs=7, loop=3) == data


def test_interlaced_roundtrip():
    px = G.synth_gif_frames("ilace", 1)[0]
    data = G.gif_encode(px, interlace=True)
    assert np.array_equal(G.gif_decode(data), px)


def test_quantize_boundary_and_quality():
    """Truecolor input: plain encode raises (GIF's 256-color format
    limit), quantize=True median-cuts deterministically at >= 35 dB on
    scan-like content."""
    px = IMG.synth_pixels("gifq")
    assert len(np.unique(px.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(NotImplementedError, match="256"):
        G.gif_encode(px)
    data = G.gif_encode(px, quantize=True)
    assert data == G.gif_encode(px, quantize=True)
    assert IMG.psnr(px, G.gif_decode(data)) >= 35.0


def test_registry_dispatch():
    px = G.synth_gif_frames("reg", 1)[0]
    data = IMG.encode_image(px, "gif")
    assert np.array_equal(IMG.decode_image(data, "gif"), px)
    assert "gif" in IMG.registered_formats()


# ---------------------------------------------------------------------------
# Animation semantics: transparency + disposal, handcrafted streams
# ---------------------------------------------------------------------------


def _tiny_gif(disposal: int, transparent: bool) -> bytes:
    """2-frame 4x4 GIF: frame 0 all-red; frame 1 a 2x2 green patch at
    (1,1) with index-0 transparent holes, given disposal mode."""
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])  # 4 colors
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 0x01, 3, 0)  # gct 4, bg=3 white
    out += pal
    f0 = np.zeros((4, 4), dtype=np.uint8)  # all red (index 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    out.append(2)
    out += G._sub_blocks(G._lzw_encode(f0.tobytes(), 2))
    gflags = (disposal << 2) | (0x01 if transparent else 0x00)
    out += b"\x21\xf9\x04" + struct.pack("<BHB", gflags, 5, 0) + b"\x00"
    f1 = np.array([[1, 0], [0, 1]], dtype=np.uint8)  # green diag, index-0 holes
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    out.append(2)
    out += G._sub_blocks(G._lzw_encode(f1.tobytes(), 2))
    out += b"\x3b"
    return bytes(out)


def test_transparency_composites_over_previous():
    frames, _, _ = G.gif_decode_frames(_tiny_gif(disposal=1, transparent=True))
    assert np.array_equal(frames[0], np.broadcast_to([255, 0, 0], (4, 4, 3)))
    f1 = frames[1]
    assert tuple(f1[1, 1]) == (0, 255, 0)  # drawn green
    assert tuple(f1[1, 2]) == (255, 0, 0)  # transparent hole shows frame 0
    assert tuple(f1[2, 2]) == (0, 255, 0)


def test_opaque_patch_overwrites():
    frames, _, _ = G.gif_decode_frames(_tiny_gif(disposal=1, transparent=False))
    assert tuple(frames[1][1, 2]) == (255, 0, 0)  # index 0 drawn = red (opaque)


def test_disposal_restore_background():
    """Disposal 2 on frame 0's GCE would wipe its region before frame 1;
    here the GCE precedes frame 1, so check the canvas state by adding a
    third frame after a disposal-2 frame 1."""
    base = bytearray(_tiny_gif(disposal=2, transparent=True))
    # append a full-transparent 4x4 frame -> shows post-disposal canvas
    f2 = np.zeros((4, 4), dtype=np.uint8)
    tail = bytearray()
    tail += b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 5, 0) + b"\x00"
    tail += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    tail.append(2)
    tail += G._sub_blocks(G._lzw_encode(f2.tobytes(), 2))
    data = bytes(base[:-1]) + bytes(tail) + b"\x3b"
    frames, _, _ = G.gif_decode_frames(data)
    assert len(frames) == 3
    # frame 1's 2x2 region restored to background (white, index 3)
    assert tuple(frames[2][1, 1]) == (255, 255, 255)
    assert tuple(frames[2][0, 0]) == (255, 0, 0)  # outside region untouched


def test_disposal_restore_previous():
    frames, _, _ = G.gif_decode_frames(_tiny_gif(disposal=3, transparent=True))
    f2 = np.zeros((4, 4), dtype=np.uint8)
    base = bytearray(_tiny_gif(disposal=3, transparent=True))
    tail = bytearray()
    tail += b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 5, 0) + b"\x00"
    tail += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    tail.append(2)
    tail += G._sub_blocks(G._lzw_encode(f2.tobytes(), 2))
    data = bytes(base[:-1]) + bytes(tail) + b"\x3b"
    frames, _, _ = G.gif_decode_frames(data)
    # disposal 3: frame 1's draw undone -> frame 2 shows frame 0's canvas
    assert np.array_equal(frames[2], frames[0])


# ---------------------------------------------------------------------------
# Interchange with javax.imageio
# ---------------------------------------------------------------------------


def test_javax_reads_our_gif_exactly(spark):
    """Our encode -> JVM ImageIO read: pixel-exact (GIF is lossless at
    <= 256 colors, so any deviation is a framing/LZW bug)."""
    jvm = spark._jvm
    px = G.synth_gif_frames("interop", 1)[0][:32, :32]
    data = G.gif_encode(px)
    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(data)))
    assert img is not None, "javax.imageio could not parse our GIF"
    assert (img.getHeight(), img.getWidth()) == px.shape[:2]
    for y in range(0, 32, 3):
        for x in range(0, 32, 3):
            rgb = img.getRGB(x, y)
            got = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
            assert got == tuple(int(v) for v in px[y, x]), (x, y)


def test_we_read_javax_gif_exactly(spark):
    """JVM ImageIO write('gif') -> our decode == JVM's own re-read of
    the same bytes, pixel-exact (both sides decode one palettized
    truth)."""
    jvm = spark._jvm
    px = G.synth_gif_frames("interop-2", 1)[0][:32, :32]
    img = jvm.java.awt.image.BufferedImage(32, 32, 1)  # TYPE_INT_RGB
    for y in range(32):
        for x in range(32):
            r, g, b = (int(v) for v in px[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "gif", baos)
    data = bytes(baos.toByteArray())
    ours = G.gif_decode(data)
    theirs = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(data))
    )
    for y in range(0, 32, 3):
        for x in range(0, 32, 3):
            rgb = theirs.getRGB(x, y)
            want = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
            assert tuple(int(v) for v in ours[y, x]) == want, (x, y)
