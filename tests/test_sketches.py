import numpy as np
import pytest

from vbpl_web_crawl_spark.operators.sketches import BloomFilter, CuckooFilter


@pytest.fixture
def keys():
    rng = np.random.default_rng(42)
    return rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)


def test_bloom_no_false_negatives(keys):
    bf = BloomFilter(1 << 18, 5)
    bf.add(keys)
    assert bf.contains(keys).all()


def test_bloom_fpr_bounded(keys):
    rng = np.random.default_rng(7)
    other = rng.integers(-(2**62), 2**62, size=50000, dtype=np.int64)
    bf = BloomFilter(1 << 18, 5)
    bf.add(keys)
    # theoretical FPR at this load ~ (1-e^{-5*5000/262144})^5 ~ 5e-6
    assert bf.contains(other).mean() < 0.01


def test_bloom_roundtrip(keys):
    bf = BloomFilter(1 << 16, 4)
    bf.add(keys[:100])
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.n_bits == bf.n_bits and bf2.k == bf.k
    assert bf2.contains(keys[:100]).all()
    assert np.array_equal(bf.bits, bf2.bits)


def test_cuckoo_insert_contains_delete(keys):
    cf = CuckooFilter(1 << 12)
    cf.add(keys)
    assert cf.contains(keys).all()
    dele = keys[:1000]
    assert cf.delete(dele).all()
    # deleted keys report absent (no other copy was inserted)
    assert not cf.contains(dele).any()
    # remaining keys still present
    assert cf.contains(keys[1000:]).all()


def test_cuckoo_readdition_after_delete(keys):
    """The retry-requeue primitive: delete -> contains False -> re-add."""
    cf = CuckooFilter(1 << 10)
    k = keys[:10]
    cf.add(k)
    cf.delete(k)
    assert not cf.contains(k).any()
    cf.add(k)
    assert cf.contains(k).all()


def test_cuckoo_roundtrip(keys):
    cf = CuckooFilter(1 << 12)
    cf.add(keys[:500])
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains(keys[:500]).all()
    assert np.array_equal(cf.table, cf2.table)


def test_cuckoo_full_raises():
    cf = CuckooFilter(1 << 2)  # 16 slots
    rng = np.random.default_rng(1)
    with pytest.raises(RuntimeError):
        cf.add(rng.integers(-(2**62), 2**62, size=200, dtype=np.int64))
