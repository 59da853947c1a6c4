"""Baseline JPEG codec (sources/jpeg.py): roundtrip invariants,
bit-determinism, registry plumbing, and interchange cross-checks against
the JVM's javax.imageio (an independent implementation shipped with the
Spark runtime — proves the files are real JPEG, not a private format)."""

import numpy as np
import pytest

from vbpl_web_crawl_spark.sources import images as IMG
from vbpl_web_crawl_spark.sources import jpeg as J


def test_zigzag_is_standard_permutation():
    assert sorted(J._ZZ.tolist()) == list(range(64))
    # the canonical first 16 entries of the T.81 zigzag
    assert J._ZZ[:16].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]


@pytest.mark.parametrize("iid", ["a", "b", "long-id-123", "x/y"])
def test_roundtrip_psnr_and_determinism(iid):
    px = IMG.synth_pixels(iid)
    data = J.jpeg_encode(px)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = J.jpeg_decode(data)
    assert dec.shape == px.shape
    assert IMG.psnr(px, dec) >= 40.0
    assert J.jpeg_encode(px) == data  # bit-deterministic
    assert np.array_equal(J.jpeg_decode(data), dec)


def test_noise_image_roundtrip():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (64, 64, 3), dtype=np.int64).astype(np.uint8)
    assert IMG.psnr(noise, J.jpeg_decode(J.jpeg_encode(noise))) >= 40.0


def test_grayscale_roundtrip():
    g = IMG.synth_pixels("gray-case")[:, :, 0]
    dec = J.jpeg_decode(J.jpeg_encode(g))
    assert dec.shape == (g.shape[0], g.shape[1], 3)
    assert IMG.psnr(np.stack([g, g, g], axis=-1), dec) >= 40.0


def test_registry_dispatch_and_boundary():
    px = IMG.synth_pixels("reg")
    data = IMG.encode_image(px, "jpeg")
    assert IMG.psnr(px, IMG.decode_image(data, "jpeg")) >= 40.0
    assert {"png", "jpeg", "vdct"} <= set(IMG.registered_formats())
    with pytest.raises(NotImplementedError, match="register_codec"):
        IMG.decode_image(b"xx", "webp")


def test_fmt_mix_includes_jpeg():
    fmts = {IMG.synth_image_record(f"id{i}")["fmt"] for i in range(40)}
    assert fmts == {"png", "jpeg", "vdct"}


def test_interchange_with_javax_imageio(spark):
    """Encode with our codec, decode with the JVM's ImageIO: the file
    must parse with correct dimensions and reconstruct the original at
    >= 40 dB (sampled grid — getRGB via py4j is per-pixel)."""
    jvm = spark._jvm
    px = IMG.synth_pixels("interop")
    data = J.jpeg_encode(px)
    stream = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img = jvm.javax.imageio.ImageIO.read(stream)
    assert img is not None, "javax.imageio could not parse our JPEG"
    h, w = img.getHeight(), img.getWidth()
    assert (h, w) == px.shape[:2]
    step = 7
    se, n = 0.0, 0
    for y in range(0, h, step):
        for x in range(0, w, step):
            rgb = img.getRGB(x, y)
            got = np.array([(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF])
            se += float(((got - px[y, x].astype(np.int64)) ** 2).sum())
            n += 3
    psnr = 10 * np.log10(255.0**2 / max(se / n, 1e-9))
    assert psnr >= 40.0, psnr


def _imageio_encode(jvm, px, quality=None, progressive=False):
    h, w = px.shape[:2]
    img = jvm.java.awt.image.BufferedImage(w, h, 1)  # TYPE_INT_RGB
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in px[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    if quality is None and not progressive:
        assert jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
        return bytes(baos.toByteArray())
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    params = writer.getDefaultWriteParam()
    if progressive:
        params.setProgressiveMode(1)  # MODE_DEFAULT
    if quality is not None:
        params.setCompressionMode(2)  # MODE_EXPLICIT
        params.setCompressionQuality(float(quality))
    out = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(out)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), params)
    out.flush()
    return bytes(baos.toByteArray())


def _sof0_sampling(data):
    """(h, v) factors of the first SOF0 component, parsed off the wire."""
    import struct

    pos = 2
    while pos < len(data):
        while data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        if marker == 0xC0:
            hv = data[pos + 2 + 7]
            return hv >> 4, hv & 0xF
        pos += seg_len
    raise AssertionError("no SOF0")


def test_external_encoder_decodes(spark):
    """Decode a JPEG produced by an EXTERNAL encoder (javax.imageio) at
    its DEFAULT settings — whatever sampling it picks, the decode must
    reconstruct the source (no NotImplementedError escape hatch)."""
    jvm = spark._jvm
    px = IMG.synth_pixels("ext-enc")
    data = _imageio_encode(jvm, px)
    dec = J.jpeg_decode(data)
    assert dec.shape == px.shape
    assert IMG.psnr(px, dec) >= 25.0  # external quality setting unknown


def test_external_progressive_decodes(spark):
    """Progressive (SOF2) cross-validation: javax.imageio's progressive
    mode emits real multi-scan streams (spectral selection + successive
    approximation); decode must reconstruct them — most JPEGs on the
    open web a crawler actually fetches are progressive."""
    jvm = spark._jvm
    px = IMG.synth_pixels("ext-prog")
    data = _imageio_encode(jvm, px, quality=0.9, progressive=True)
    assert b"\xff\xc2" in data, "imageio did not emit SOF2"
    dec = J.jpeg_decode(data)
    assert dec.shape == px.shape
    assert IMG.psnr(px, dec) >= 35.0
    assert np.array_equal(J.jpeg_decode(data), dec)  # bit-deterministic


def test_external_progressive_subsampled_decodes(spark):
    """The hardest external shape: progressive AND 4:2:0 in one stream
    (low-quality imageio output) — multi-scan chroma bands on the
    MCU-padded subsampled grid."""
    jvm = spark._jvm
    px = IMG.synth_pixels("ext-prog-420")
    data = _imageio_encode(jvm, px, quality=0.4, progressive=True)
    assert b"\xff\xc2" in data
    assert _sof0_sampling_any(data) != (1, 1), "expected subsampling at q0.4"
    dec = J.jpeg_decode(data)
    assert dec.shape == px.shape
    assert IMG.psnr(px, dec) >= 25.0


def _sof0_sampling_any(data):
    """(h, v) of the first component of SOF0 OR SOF2."""
    import struct

    pos = 2
    while pos < len(data):
        while data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        if marker in (0xC0, 0xC2):
            hv = data[pos + 2 + 7]
            return hv >> 4, hv & 0xF
        pos += seg_len
    raise AssertionError("no SOF")


def test_external_subsampled_420_decodes(spark):
    """4:2:0 cross-validation: javax.imageio subsamples chroma at low
    compression quality; assert the stream really is subsampled (SOF0
    sampling factors > 1x1), then decode it against the source."""
    jvm = spark._jvm
    px = IMG.synth_pixels("ext-420")
    data = None
    for q in (0.5, 0.4, 0.3, 0.7):
        cand = _imageio_encode(jvm, px, quality=q)
        if _sof0_sampling(cand) != (1, 1):
            data = cand
            break
    assert data is not None, "imageio never subsampled; widen the quality sweep"
    dec = J.jpeg_decode(data)
    assert dec.shape == px.shape
    assert IMG.psnr(px, dec) >= 25.0
    # decode is still bit-deterministic on the subsampled path
    assert np.array_equal(J.jpeg_decode(data), dec)


def test_multi_scan_baseline_roundtrip_and_equality():
    """Multi-scan baseline (one SOS per component, T.81 B.2.2): our
    decoder must accumulate coefficients across scans and reconstruct
    EXACTLY the pixels of the equivalent single-scan stream (same
    coefficients, different scan layout), at >= 40 dB vs the source."""
    px = IMG.synth_pixels("multiscan")
    single = J.jpeg_encode(px)
    multi = J.jpeg_encode(px, multi_scan=True)
    assert multi != single
    assert multi.count(b"\xff\xda") == 3, "expected one SOS per component"
    dec_m = J.jpeg_decode(multi)
    dec_s = J.jpeg_decode(single)
    assert np.array_equal(dec_m, dec_s)
    assert IMG.psnr(px, dec_m) >= 40.0


def test_multi_scan_baseline_javax_interop(spark):
    """External cross-check of the multi-scan layout: javax.imageio (an
    independent decoder) must parse our multi-scan stream and agree
    with our decoder (sampled grid, >= 40 dB vs our decode)."""
    jvm = spark._jvm
    px = IMG.synth_pixels("multiscan-x")
    data = J.jpeg_encode(px, multi_scan=True)
    stream = jvm.java.io.ByteArrayInputStream(bytearray(data))
    img = jvm.javax.imageio.ImageIO.read(stream)
    assert img is not None, "javax.imageio could not parse multi-scan stream"
    ours = J.jpeg_decode(data)
    h, w = img.getHeight(), img.getWidth()
    assert (h, w) == px.shape[:2]
    step = 7
    se, n = 0.0, 0
    for y in range(0, h, step):
        for x in range(0, w, step):
            rgb = img.getRGB(x, y)
            got = np.array([(rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF])
            se += float(((got - ours[y, x].astype(np.int64)) ** 2).sum())
            n += 3
    psnr = 10 * np.log10(255.0**2 / max(se / n, 1e-9))
    assert psnr >= 40.0, psnr
