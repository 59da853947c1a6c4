"""Bloom and cuckoo filters over int64 keys, numpy-vectorized, with a
byte-serializable state so each sketch lives as one row of a partitioned
Iceberg/parquet table (FIXTURES.md §3 ``seen_sketch``).

Role in the engine (north_rule): the URL-seen set at 10^10 scale cannot
be an exact join alone — the Bloom filter is a per-partition *prefilter*
(batch membership inside an Arrow batch; only Bloom-positive rows
proceed to the exact anti-join), and the cuckoo filter supports
*deletion* so a failed fetch can be un-marked and re-admitted for retry
(reference retry semantics: /root/reference/app/service/anle.py:37-57).

False positives are harmless for correctness (exact join confirms);
false negatives cannot happen in a Bloom filter, so the final seen set
is exactly equal to the reference's (SURVEY.md §7 step 4).

All membership/insert paths take numpy int64 arrays — one call per
Arrow batch, no per-row Python.
"""

from __future__ import annotations

import struct

import numpy as np

_U64 = np.uint64
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 with a salt — derives the k hash functions."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + _U64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF) + _U64(0x9E3779B97F4A7C15)) & _MASK
        z = x
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK
        return z ^ (z >> _U64(31))


class BloomFilter:
    """Classic k-hash Bloom over a bit array; batch add/contains."""

    MAGIC = b"BLM1"

    def __init__(self, n_bits: int = 1 << 20, k: int = 5, bits: np.ndarray | None = None):
        assert n_bits % 8 == 0
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64)
        pos = np.empty((self.k, len(keys)), dtype=np.int64)
        for i in range(self.k):
            pos[i] = (_mix(keys.view(np.uint64), i + 1) % _U64(self.n_bits)).astype(np.int64)
        return pos

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool array (True may be a false
        positive; False is definitive)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            p = pos[i]
            hit &= (self.bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1 == 1
        return hit

    def to_bytes(self) -> bytes:
        return self.MAGIC + struct.pack(">IB", self.n_bits, self.k) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        assert data[:4] == cls.MAGIC
        n_bits, k = struct.unpack(">IB", data[4:9])
        bits = np.frombuffer(data[9:], dtype=np.uint8).copy()
        return cls(n_bits, k, bits)


class CuckooFilter:
    """Cuckoo filter (4-slot buckets, 16-bit fingerprints) supporting
    delete — the retry-requeue primitive. Standard partial-key cuckoo
    hashing: bucket2 = bucket1 XOR hash(fingerprint).
    """

    MAGIC = b"CKF1"
    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 16, table: np.ndarray | None = None):
        assert n_buckets & (n_buckets - 1) == 0, "power of two"
        self.n_buckets = n_buckets
        # 0 = empty slot; fingerprints are 1..65535
        self.table = (
            table if table is not None else np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        )

    def _fp_and_buckets(self, keys: np.ndarray):
        keys = np.asarray(keys, dtype=np.int64).view(np.uint64)
        fp = (_mix(keys, 101) % _U64(65535) + _U64(1)).astype(np.uint16)
        b1 = (_mix(keys, 7) % _U64(self.n_buckets)).astype(np.int64)
        b2 = (b1 ^ (_mix(fp.astype(np.uint64), 13) % _U64(self.n_buckets)).astype(np.int64)) % self.n_buckets
        return fp, b1, b2

    def _alt(self, bucket: int, fp: int) -> int:
        h = int(_mix(np.array([fp], dtype=np.uint64), 13)[0] % _U64(self.n_buckets))
        return (bucket ^ h) % self.n_buckets

    def add(self, keys: np.ndarray) -> int:
        """Insert each key; returns number successfully inserted (a full
        filter raises — size it for the partition's key budget)."""
        fp, b1, b2 = self._fp_and_buckets(keys)
        rng_state = 0x12345678  # deterministic eviction choice
        for i in range(len(keys)):
            f, x, y = int(fp[i]), int(b1[i]), int(b2[i])
            row = self.table[x]
            if (row == f).any() or (self.table[y] == f).any():
                continue  # already present
            placed = False
            for b in (x, y):
                empty = np.where(self.table[b] == 0)[0]
                if len(empty):
                    self.table[b][empty[0]] = f
                    placed = True
                    break
            if placed:
                continue
            # evict loop
            b = x
            for _ in range(self.MAX_KICKS):
                rng_state = (rng_state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
                slot = rng_state % self.SLOTS
                f, self.table[b][slot] = int(self.table[b][slot]), f
                b = self._alt(b, f)
                empty = np.where(self.table[b] == 0)[0]
                if len(empty):
                    self.table[b][empty[0]] = f
                    placed = True
                    break
            if not placed:
                raise RuntimeError("cuckoo filter full — increase n_buckets")
        return len(keys)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, b1, b2 = self._fp_and_buckets(keys)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one fingerprint copy per key; bool array of success.
        This is the retry-requeue primitive (north_rule)."""
        fp, b1, b2 = self._fp_and_buckets(keys)
        ok = np.zeros(len(keys), dtype=bool)
        for i in range(len(keys)):
            f = fp[i]
            for b in (int(b1[i]), int(b2[i])):
                slots = np.where(self.table[b] == f)[0]
                if len(slots):
                    self.table[b][slots[0]] = 0
                    ok[i] = True
                    break
        return ok

    def to_bytes(self) -> bytes:
        return self.MAGIC + struct.pack(">I", self.n_buckets) + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        assert data[:4] == cls.MAGIC
        (n_buckets,) = struct.unpack(">I", data[4:8])
        table = np.frombuffer(data[8:], dtype=np.uint16).reshape(n_buckets, cls.SLOTS).copy()
        return cls(n_buckets, table)
