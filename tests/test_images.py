"""Per-row payload invariants (BASELINE.json input_hint): decoded-pixel
exactness for lossless, PSNR >= 40 dB for lossy, caption equality,
phash recomputation match."""

import numpy as np
import pytest

from vbpl_web_crawl_spark.sources import images as I

IDS = [f"img{n:08d}" for n in range(24)]


def test_png_roundtrip_exact():
    px = I.synth_pixels("roundtrip")
    assert np.array_equal(I.png_decode(I.png_encode(px)), px)


def test_vdct_psnr_at_least_40():
    for iid in IDS[:8]:
        px = I.synth_pixels(iid)
        dec = I.vdct_decode(I.vdct_encode(px))
        assert I.psnr(px, dec) >= 40.0, iid


def test_corpus_record_invariants():
    seen_fmts = set()
    for iid in IDS:
        rec = I.synth_image_record(iid)
        seen_fmts.add(rec["fmt"])
        px = I.synth_pixels(iid)
        dec = I.decode_image(rec["bytes"], rec["fmt"])
        assert dec.shape == (rec["h"], rec["w"], 3)
        if rec["fmt"] == "png":
            assert np.array_equal(dec, px)
        else:
            assert I.psnr(px, dec) >= 40.0
        # caption equality + phash recomputation
        assert rec["caption"] == I.synth_caption(iid)
        assert I.phash64(dec) == rec["phash"]
    assert seen_fmts == {"png", "jpeg", "vdct"}  # all codec paths exercised


def test_determinism_across_calls():
    a = I.synth_image_record("img00000007")
    b = I.synth_image_record("img00000007")
    assert a["bytes"] == b["bytes"] and a["phash"] == b["phash"]


def test_phash_similar_images_close():
    """phash must be robust to the lossy codec (small Hamming dist)."""
    px = I.synth_pixels("stable")
    dec = I.vdct_decode(I.vdct_encode(px))
    d = bin(I.phash64(px) ^ I.phash64(dec)).count("1")
    assert d <= 4


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        I.decode_image(b"xxxx", "webp")


# ---------------------------------------------------------------------------
# BMP (sources/bmp.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("w", [15, 16, 17, 18])  # all 4-byte pad phases
def test_bmp_roundtrip_all_padding_widths(w):
    from vbpl_web_crawl_spark.sources import bmp as B

    px = I.synth_pixels("bmp-pad")[:20, :w]
    data = B.bmp_encode(np.ascontiguousarray(px))
    assert data[:2] == b"BM"
    assert np.array_equal(B.bmp_decode(data), px)
    assert B.bmp_encode(np.ascontiguousarray(px)) == data  # bit-stable


def test_bmp_topdown_and_32bit_decode():
    """Decode variants our encoder never writes: top-down row order
    (negative height) and 32-bit BGRA — both appear in the wild."""
    import struct

    from vbpl_web_crawl_spark.sources import bmp as B

    px = I.synth_pixels("bmp-var")[:8, :5]
    h, w = px.shape[:2]
    # hand-build a top-down 32-bit BMP
    bgra = np.zeros((h, w, 4), dtype=np.uint8)
    bgra[:, :, :3] = px[:, :, ::-1]
    data = bgra.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(data), 0, 0, 0, 0)
    raw = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54) + info + data
    assert np.array_equal(B.bmp_decode(raw), px)


def test_bmp_compressed_raises():
    import struct

    from vbpl_web_crawl_spark.sources import bmp as B

    data = bytearray(B.bmp_encode(I.synth_pixels("bmp-rle")[:8, :8]))
    data[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        B.bmp_decode(bytes(data))


def test_bmp_registry_dispatch():
    px = I.synth_pixels("bmp-reg")
    assert np.array_equal(I.decode_image(I.encode_image(px, "bmp"), "bmp"), px)


def test_bmp_interchange_with_javax_imageio(spark):
    """Lossless both directions vs the JVM's BMP plugin: our file reads
    back pixel-exact there; its file decodes pixel-exact here."""
    from vbpl_web_crawl_spark.sources import bmp as B

    jvm = spark._jvm
    px = I.synth_pixels("bmp-xval")[:32, :32]
    img = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(B.bmp_encode(np.ascontiguousarray(px))))
    )
    assert img is not None and (img.getHeight(), img.getWidth()) == (32, 32)
    for y in range(0, 32, 3):
        for x in range(0, 32, 3):
            rgb = img.getRGB(x, y)
            got = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
            assert got == tuple(int(v) for v in px[y, x]), (x, y)
    # reverse: Java writes BMP, we decode
    jimg = jvm.java.awt.image.BufferedImage(32, 32, 1)
    for y in range(32):
        for x in range(32):
            r, g, b = (int(v) for v in px[y, x])
            jimg.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(jimg, "bmp", baos)
    ours = B.bmp_decode(bytes(baos.toByteArray()))
    assert np.array_equal(ours, px)
