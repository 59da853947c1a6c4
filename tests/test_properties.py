"""Property-based tests (hypothesis) for the pure-python kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vbpl_web_crawl_spark.operators.sketches import BloomFilter, CuckooFilter
from vbpl_web_crawl_spark.sources import images as IMG

int64s = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=300, unique=True
)


@settings(max_examples=25, deadline=None)
@given(int64s)
def test_bloom_never_false_negative(keys):
    bf = BloomFilter(1 << 14, 4)
    arr = np.array(keys, dtype=np.int64)
    bf.add(arr)
    assert bf.contains(arr).all()
    # serialization preserves membership
    assert BloomFilter.from_bytes(bf.to_bytes()).contains(arr).all()


@settings(max_examples=25, deadline=None)
@given(int64s)
def test_cuckoo_add_delete_roundtrip(keys):
    cf = CuckooFilter(1 << 11)
    arr = np.array(keys, dtype=np.int64)
    cf.add(arr)
    assert cf.contains(arr).all()
    assert cf.delete(arr).all()
    assert not cf.contains(arr).any()
    cf.add(arr)  # re-admission after delete (retry semantics)
    assert cf.contains(arr).all()


@settings(max_examples=10, deadline=None)
@given(st.text(min_size=1, max_size=40))
def test_image_record_invariants_any_id(image_id):
    rec = IMG.synth_image_record(image_id)
    dec = IMG.decode_image(rec["bytes"], rec["fmt"])
    assert dec.shape == (rec["h"], rec["w"], 3)
    px = IMG.synth_pixels(image_id)
    if rec["fmt"] == "png":
        assert np.array_equal(dec, px)
    else:
        assert IMG.psnr(px, dec) >= 40.0
    assert IMG.phash64(dec) == rec["phash"]
    # determinism
    assert IMG.synth_image_record(image_id)["bytes"] == rec["bytes"]
