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
