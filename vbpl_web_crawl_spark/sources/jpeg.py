"""Baseline JPEG (ITU T.81 sequential DCT, JFIF) encoder/decoder in
pure numpy — no PIL/libjpeg in this container, and the reference
downloads real scanned-document binaries
(/root/reference/app/service/get_pdf.py:24-74), so the corpus layer
needs a genuine interchange format, not only the synthetic stand-ins.

Scope:
- Encoder: 8-bit RGB (4:4:4, no subsampling) or grayscale; flat
  quantization sized for PSNR >= 40 dB on scan-like content; uniform-
  length canonical Huffman tables (written to DHT, so ANY standard
  decoder reads these files — uniform tables trade a few % of size for
  simplicity, and the tables travel in the stream as T.81 requires).
- Decoder: general baseline sequential (SOF0) — single-scan
  interleaved, MULTI-SCAN baseline (components across several scans,
  T.81 B.2.2), and progressive (SOF2, spectral selection + successive
  approximation) — parsing DQT/DHT/SOF/SOS/DRI from the stream
  (arbitrary standard tables, e.g. libjpeg output), byte stuffing,
  restart markers, and MCU-interleaved subsampled chroma
  (4:2:0 / 4:2:2 / 4:4:0 — any integer sampling factors,
  nearest-neighbor upsample). Unsupported (fail-loud
  NotImplementedError): hierarchical, lossless, arithmetic-coded, and
  12-bit variants.
- All DCT/IDCT math is scaled-int64 einsum (like phash64): float matmul
  dispatches to BLAS whose reduction order varies with thread count, and
  decoded pixels feed content hashes — a worker must decode bit-
  identically to the driver.

Per-image loops live inside Arrow batches (mapInPandas), the intended
pattern for opaque binary payloads.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared integer transform kernels
# ---------------------------------------------------------------------------

_SCALE_BITS = 13
_DCT8_INT = np.zeros((8, 8), dtype=np.int64)
for _k in range(8):
    for _n in range(8):
        _c = np.cos(np.pi * (_n + 0.5) * _k / 8.0) * np.sqrt(2.0 / 8.0)
        if _k == 0:
            _c /= np.sqrt(2.0)
        _DCT8_INT[_k, _n] = round(_c * (1 << _SCALE_BITS))


def _zigzag_order() -> np.ndarray:
    """The standard zigzag index order, generated (not memorized)."""
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(s - 7, 0) - 1, -1) if s % 2 == 0 else range(
            max(s - 7, 0), min(s, 7) + 1
        )
        for i in rng:
            order.append(i * 8 + (s - i))
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag_order()
_UNZZ = np.argsort(_ZZ)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Forward 2D DCT over (n, 8, 8) int64 blocks (level-shifted)."""
    t = np.einsum("ij,njk->nik", _DCT8_INT, blocks.astype(np.int64))
    t = np.einsum("nik,lk->nil", t, _DCT8_INT)
    # undo the two 2^13 scales with rounding
    half = np.int64(1) << (2 * _SCALE_BITS - 1)
    return (t + half) >> np.int64(2 * _SCALE_BITS)


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Inverse 2D DCT over (n, 8, 8) int64 coefficient blocks."""
    t = np.einsum("ji,njk->nik", _DCT8_INT, blocks.astype(np.int64))
    t = np.einsum("nik,kl->nil", t, _DCT8_INT)
    half = np.int64(1) << (2 * _SCALE_BITS - 1)
    return (t + half) >> np.int64(2 * _SCALE_BITS)


def _blockify(chan: np.ndarray) -> np.ndarray:
    h, w = chan.shape
    return (
        chan.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


# ---------------------------------------------------------------------------
# Color transforms (integer, JFIF full-range BT.601)
# ---------------------------------------------------------------------------

_FIX = 16  # fixed-point bits


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    one = 1 << _FIX
    half = one // 2

    def fx(v):
        return round(v * one)

    y = (fx(0.299) * r + fx(0.587) * g + fx(0.114) * b + half) >> _FIX
    cb = ((fx(-0.168736) * r - fx(0.331264) * g + fx(0.5) * b + half) >> _FIX) + 128
    cr = ((fx(0.5) * r - fx(0.418688) * g - fx(0.081312) * b + half) >> _FIX) + 128
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.int64)
    cb = ycc[..., 1].astype(np.int64) - 128
    cr = ycc[..., 2].astype(np.int64) - 128
    one = 1 << _FIX
    half = one // 2

    def fx(v):
        return round(v * one)

    r = (y * one + fx(1.402) * cr + half) >> _FIX
    g = (y * one - fx(0.344136) * cb - fx(0.714136) * cr + half) >> _FIX
    b = (y * one + fx(1.772) * cb + half) >> _FIX
    out = np.stack([r, g, b], axis=-1)
    return np.clip(out, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Huffman tables (encoder): uniform-length canonical codes. Valid T.81
# tables (written to DHT), chosen so no code is the all-ones prefix.
# ---------------------------------------------------------------------------


def _uniform_table(symbols: list[int], length: int) -> tuple[list[int], list[int], dict]:
    """BITS/HUFFVAL for a canonical code giving every symbol ``length``
    bits; returns (bits16, huffval, {symbol: (code, length)})."""
    assert len(symbols) < (1 << length), "would use the all-ones code"
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    codes = {sym: (i, length) for i, sym in enumerate(symbols)}
    return bits, list(symbols), codes


_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]  # EOB, ZRL, then (run,size)

_DC_BITS, _DC_VALS, _DC_CODES = _uniform_table(_DC_SYMS, 4)
_AC_BITS, _AC_VALS, _AC_CODES = _uniform_table(_AC_SYMS, 9)

# flat quantization step: RMS error ~ step/sqrt(12) per coefficient ->
# >= 40 dB after color transform amplification (tested in test_jpeg.py)
_Q_LUMA = 4
_Q_CHROMA = 4


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt_seg(tq: int, table64_zz: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tq]) + bytes(int(v) for v in table64_zz))


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


# ---------------------------------------------------------------------------
# Vectorized entropy coder. The reference loop (_entropy_pack_slow below,
# kept as the spec and for the equality test) costs ~100 ms/image in
# Python; at crawl scale the encoder sits inside the fetch mapInPandas
# hot path, so the whole (symbolize -> order -> bit-pack -> stuff)
# pipeline runs as numpy array ops. Uniform-length Huffman makes
# code == symbol-index, so symbolization is pure arithmetic.
# ---------------------------------------------------------------------------

_AC_INDEX = np.full(256, -1, dtype=np.int64)
for _i, _s in enumerate(_AC_SYMS):
    _AC_INDEX[_s] = _i
_DC_LEN = 4
_AC_LEN = 9


def _category(v: np.ndarray) -> np.ndarray:
    """bit_length(|v|) per element; 0 stays 0 (exact for |v| < 2^52)."""
    a = np.abs(v)
    return np.where(a == 0, 0, np.floor(np.log2(np.maximum(a, 1))).astype(np.int64) + 1)


def _entropy_pack(plane_zz: list[np.ndarray]) -> bytes:
    """Entropy-code interleaved MCUs (4:4:4 / single component) from
    per-component (nblocks, 64) zigzag coefficient arrays. Byte-equal to
    _entropy_pack_slow."""
    blocks_l, comps_l, seqs_l, vals_l, nbits_l = [], [], [], [], []

    def emit(block, comp, seq, val, nbits):
        blocks_l.append(block)
        comps_l.append(np.full(len(block), comp, dtype=np.int64))
        seqs_l.append(seq)
        vals_l.append(val)
        nbits_l.append(nbits)

    for ci, zz in enumerate(plane_zz):
        nb = zz.shape[0]
        # --- DC: differential, category + extra, merged (code|extra) ---
        diff = np.diff(zz[:, 0], prepend=np.int64(0))
        s = _category(diff)
        extra = np.where(diff >= 0, diff, diff + (np.int64(1) << s) - 1)
        merged = (s << s) | extra  # uniform table: code value == category
        emit(np.arange(nb, dtype=np.int64), ci, np.zeros(nb, dtype=np.int64),
             merged, _DC_LEN + s)
        # --- AC nonzeros ---
        A = zz[:, 1:]
        bi, kj = np.nonzero(A)
        if len(bi):
            v = A[bi, kj]
            ki = kj.astype(np.int64) + 1
            first = np.empty(len(bi), dtype=bool)
            first[0] = True
            first[1:] = bi[1:] != bi[:-1]
            prev_ki = np.where(first, 0, np.concatenate([[0], ki[:-1]]))
            runs = ki - prev_ki - 1
            nzrl = runs >> 4
            s = _category(v)
            sym = ((runs & 15) << 4) | s
            code = _AC_INDEX[sym]
            extra = np.where(v >= 0, v, v + (np.int64(1) << s) - 1)
            emit(bi.astype(np.int64), ci, ki, (code << s) | extra, _AC_LEN + s)
            # --- ZRL events (16-zero runs), ordered before their symbol ---
            total_z = int(nzrl.sum())
            if total_z:
                parent = np.repeat(np.arange(len(ki)), nzrl)
                starts = np.cumsum(nzrl) - nzrl
                z_rank = np.arange(total_z) - np.repeat(starts, nzrl)
                zseq = prev_ki[parent] + 16 * (z_rank + 1)
                zcode = np.full(total_z, _AC_INDEX[0xF0], dtype=np.int64)
                emit(bi[parent].astype(np.int64), ci, zseq, zcode,
                     np.full(total_z, _AC_LEN, dtype=np.int64))
            last_ki = np.zeros(nb, dtype=np.int64)
            np.maximum.at(last_ki, bi, ki)
        else:
            last_ki = np.zeros(nb, dtype=np.int64)
        # --- EOB for blocks whose last nonzero is before k=63 ---
        eob_b = np.nonzero(last_ki < 63)[0].astype(np.int64)
        emit(eob_b, ci, np.full(len(eob_b), 64, dtype=np.int64),
             np.full(len(eob_b), _AC_INDEX[0x00], dtype=np.int64),
             np.full(len(eob_b), _AC_LEN, dtype=np.int64))

    block = np.concatenate(blocks_l)
    comp = np.concatenate(comps_l)
    seq = np.concatenate(seqs_l)
    vals = np.concatenate(vals_l).astype(np.uint64)
    nbits = np.concatenate(nbits_l).astype(np.int64)
    order = np.lexsort((seq, comp, block))  # MCU-interleaved event order
    vals, nbits = vals[order], nbits[order]

    # --- bit packing: each event <= 19 bits + 7 shift fits a 5-byte
    # window; OR the windows into the buffer (bitwise_or.at handles the
    # duplicate byte indices of adjacent events) ---
    total_bits = int(nbits.sum())
    total_bytes = (total_bits + 7) >> 3
    offsets = np.cumsum(nbits) - nbits
    byte_idx = (offsets >> 3).astype(np.int64)
    shift = (offsets & 7).astype(np.uint64)
    window = vals << (np.uint64(40) - shift - nbits.astype(np.uint64))
    buf = np.zeros(total_bytes + 8, dtype=np.uint8)
    for j in range(5):
        np.bitwise_or.at(
            buf, byte_idx + j, ((window >> np.uint64(8 * (4 - j))) & np.uint64(0xFF)).astype(np.uint8)
        )
    if total_bits & 7:
        buf[total_bytes - 1] |= (1 << (8 - (total_bits & 7))) - 1  # 1-pad
    out = buf[:total_bytes]
    # --- byte stuffing: 0xFF -> 0xFF 0x00 ---
    ff = np.nonzero(out == 0xFF)[0]
    if len(ff):
        out = np.insert(out, ff + 1, 0)
    return out.tobytes()


def _entropy_pack_slow(plane_zz: list[np.ndarray]) -> bytes:
    """Reference scalar implementation (spec for _entropy_pack)."""
    bw = _BitWriter()
    n_blocks = plane_zz[0].shape[0]
    ncomp = len(plane_zz)
    prev_dc = [0] * ncomp
    for bi in range(n_blocks):
        for ci in range(ncomp):
            zz = plane_zz[ci][bi]
            diff = int(zz[0]) - prev_dc[ci]
            prev_dc[ci] = int(zz[0])
            s, extra = _magnitude(diff)
            code, ln = _DC_CODES[s]
            bw.write(code, ln)
            if s:
                bw.write(extra, s)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = _AC_CODES[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s, extra = _magnitude(v)
                code, ln = _AC_CODES[(run << 4) | s]
                bw.write(code, ln)
                bw.write(extra, s)
                run = 0
            if last < 63:
                code, ln = _AC_CODES[0x00]  # EOB
                bw.write(code, ln)
    return bw.flush()


def jpeg_encode(pixels: np.ndarray, multi_scan: bool = False) -> bytes:
    """RGB8 HxWx3 or gray HxW uint8 (dims multiples of 8) -> JPEG.

    ``multi_scan=True`` emits a MULTI-SCAN baseline stream (one
    non-interleaved SOS per component, T.81 B.2.2) instead of a single
    interleaved scan — produced for the decoder's multi-scan interop
    tests and readable by any standard decoder (javax.imageio
    cross-checks it)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    assert h % 8 == 0 and w % 8 == 0, "pad to 8-pixel multiples first"
    if gray:
        planes = [pixels]
        qids = [0]
    else:
        ycc = rgb_to_ycbcr(pixels)
        planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
        qids = [0, 1, 1]
    qtables = {
        0: np.full(64, _Q_LUMA, dtype=np.int64),
        1: np.full(64, _Q_CHROMA, dtype=np.int64),
    }

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, qtables[0][_ZZ])
    if not gray:
        out += _dqt_seg(1, qtables[1][_ZZ])
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])  # 1x1 sampling (4:4:4)
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_seg(1, 0, _AC_BITS, _AC_VALS)

    # per-plane quantized zigzag coefficients
    plane_zz = []
    for ci in range(ncomp):
        blocks = _blockify(planes[ci].astype(np.int64) - 128)
        coeffs = _fdct_blocks(blocks).reshape(-1, 64)
        q = qtables[qids[ci]]
        qz = np.round(coeffs.astype(np.float64) / q).astype(np.int64)
        # float division is per-element (no BLAS reduction): deterministic
        plane_zz.append(qz[:, _ZZ])

    if multi_scan and ncomp > 1:
        # one non-interleaved scan per component; each scan's DC
        # predictor starts at 0 (T.81 F.2.1.3.1), which is exactly
        # what _entropy_pack's per-component diff-prepend produces
        for ci in range(ncomp):
            sos = bytes([1, ci + 1, 0x00, 0, 63, 0])
            out += _seg(0xDA, sos)
            out += _entropy_pack([plane_zz[ci]])
    else:
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
        sos += bytes([0, 63, 0])
        out += _seg(0xDA, sos)
        out += _entropy_pack(plane_zz)  # vectorized; byte-equal to the
        # scalar reference (_entropy_pack_slow), asserted in tests
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (general baseline sequential)
# ---------------------------------------------------------------------------


def _split_entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Slice the entropy-coded stream starting at ``pos`` into restart
    segments with byte stuffing removed — all vectorized, so the
    per-symbol decode loop below never inspects markers. Also returns
    the absolute offset of the first real marker after the scan (where
    the enclosing parse resumes — progressive streams hold many scans)."""
    arr = np.frombuffer(data, dtype=np.uint8)[pos:]
    ff = np.nonzero(arr[:-1] == 0xFF)[0]
    nxt = arr[ff + 1]
    stuffed = nxt == 0x00
    rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    real = ~stuffed & ~rst
    end = int(ff[real][0]) if real.any() else len(arr)
    bounds = [0] + [int(p) for p in ff[rst & (ff < end)]] + [end]
    segs = []
    for i in range(len(bounds) - 1):
        a = bounds[i] + (2 if i > 0 else 0)  # skip the RSTn marker itself
        seg = arr[a : bounds[i + 1]]
        pad = np.nonzero(seg[:-1] == 0xFF)[0] + 1  # the stuffed 0x00s
        pad = pad[seg[pad] == 0x00]
        segs.append(np.delete(seg, pad).tobytes() if len(pad) else seg.tobytes())
    return segs, pos + end


class _FastBits:
    """Bit reader over an unstuffed entropy segment (zero-padded past
    the end, which supplies the spec's 1-padding tolerance)."""

    __slots__ = ("buf", "i", "acc", "nacc")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0
        self.acc = 0
        self.nacc = 0

    def _need(self, n: int) -> None:
        buf, i = self.buf, self.i
        while self.nacc < n:
            b = buf[i] if i < len(buf) else 0
            i += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nacc += 8
        self.i = i

    def peek16(self) -> int:
        if self.nacc < 16:
            self._need(16)
        return (self.acc >> (self.nacc - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nacc -= n

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nacc < n:
            self._need(n)
        self.nacc -= n
        return (self.acc >> self.nacc) & ((1 << n) - 1)


def _build_decode_table(bits: list[int], vals: list[int]) -> np.ndarray:
    """Peek-16 LUT from DHT BITS/HUFFVAL: lut[next16bits] = (sym << 5) |
    code_length, -1 for invalid prefixes. One array index decodes any
    code (arbitrary standard tables, not just this encoder's)."""
    lut = np.full(1 << 16, -1, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = (vals[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    return lut


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> RGB8 HxWx3 (or HxWx3 replicated gray).

    Baseline sequential (SOF0) and progressive (SOF2), both including
    MCU-interleaved subsampled chroma (4:2:0 / 4:2:2 / 4:4:0);
    hierarchical/lossless/arithmetic variants raise
    NotImplementedError."""
    assert data[:2] == b"\xff\xd8", "not a JPEG (no SOI)"
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    progressive = False
    prog: dict | None = None  # progressive coefficient state across scans
    while pos < len(data):
        assert data[pos] == 0xFF, f"bad marker sync at {pos}"
        while data[pos + 1] == 0xFF:  # optional fill bytes before a marker
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(payload[p : p + 128], dtype=">u2").astype(
                        np.int64
                    )
                    p += 128
                else:
                    vals = np.frombuffer(payload[p : p + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    p += 64
                t = np.zeros(64, dtype=np.int64)
                t[_ZZ] = vals  # stored in zigzag order
                qtables[tq] = t
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            precision = payload[0]
            assert precision == 8, "only 8-bit precision"
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            for ci in range(ncomp):
                cid, hv, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise NotImplementedError(f"sampling factors {ch}x{cv} out of range")
                comps.append({"id": cid, "tq": tq, "h": ch, "v": cv})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            for c in comps:
                if hmax % c["h"] or vmax % c["v"]:
                    # spec-legal but unseen in practice (non-integer
                    # chroma upsample ratios)
                    raise NotImplementedError(
                        f"non-integer upsampling ratio for sampling {c['h']}x{c['v']}"
                    )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) DCT supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            ns = payload[0]
            if not progressive:
                if ns == len(comps) and prog is None:
                    # single full-interleave scan: the one-pass fast path
                    for si in range(ns):
                        cid, tt = payload[1 + 2 * si : 3 + 2 * si]
                        for c in comps:
                            if c["id"] == cid:
                                c["dc"] = htables[(0, tt >> 4)]
                                c["ac"] = htables[(1, tt & 0xF)]
                    pos += seg_len
                    return _decode_scan(
                        data, pos, h, w, comps, qtables, restart_interval
                    )
                # multi-scan baseline (T.81 B.2.2: a sequential frame
                # may deliver its components across several scans):
                # accumulate full DC+AC coefficients per scan into the
                # shared block grids, reconstruct at EOI — the same
                # cross-scan state the progressive path uses
                if prog is None:
                    prog = _init_progressive(comps, h, w)
                scan = []
                for si in range(ns):
                    cid, tt = payload[1 + 2 * si : 3 + 2 * si]
                    (c,) = [c for c in comps if c["id"] == cid]
                    scan.append(
                        (c, htables[(0, tt >> 4)], htables[(1, tt & 0xF)])
                    )
                pos = _decode_seq_scan(
                    data, pos + seg_len, prog, scan, restart_interval
                )
                continue
            if prog is None:
                prog = _init_progressive(comps, h, w)
            scan = []
            for si in range(ns):
                cid, tt = payload[1 + 2 * si : 3 + 2 * si]
                (c,) = [c for c in comps if c["id"] == cid]
                # tables looked up lazily per scan kind: a DC-only scan
                # carries no (valid) AC table id and vice versa
                scan.append((c, htables.get((0, tt >> 4)), htables.get((1, tt & 0xF))))
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahl = payload[3 + 2 * ns]
            pos = _decode_prog_scan(
                data, pos + seg_len, prog, scan, ss, se, ahl >> 4, ahl & 0xF,
                restart_interval,
            )
            continue
        pos += seg_len
    if prog is not None:
        return _reconstruct(
            prog["comps"], prog["coeff"], qtables, h, w, prog["hmax"], prog["vmax"]
        )
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, h, w, comps, qtables, restart_interval) -> np.ndarray:
    """MCU-interleaved baseline scan, any (h, v) sampling factors.

    4:4:4 is the hmax = vmax = 1 special case; 4:2:0 / 4:2:2 / 4:4:0
    decode through the same loop: each MCU carries h_i * v_i blocks per
    component in raster order, restart intervals count MCUs, and
    subsampled planes are upsampled by pixel replication (spec-legal
    nearest-neighbor; external 4:2:0 encoders round-trip at PSNR well
    above the scanned-page gate). Single-component scans are
    non-interleaved by definition (T.81 A.2.2): the data unit is one
    block and sampling factors do not apply."""
    ncomp = len(comps)
    if ncomp == 1:
        hmax = vmax = comps[0]["h"] = comps[0]["v"] = 1
    else:
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcx * c["h"]
        c["bh"] = mcy * c["v"]
    coeff = [np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64) for c in comps]
    segs, _ = _split_entropy_segments(data, pos)
    seg_i = 0
    br = _FastBits(segs[0])
    prev_dc = [0] * ncomp
    for mi in range(mcx * mcy):
        if restart_interval and mi and mi % restart_interval == 0:
            seg_i += 1  # RSTn: fresh segment, byte-aligned, DC reset
            br = _FastBits(segs[seg_i])
            prev_dc = [0] * ncomp
        my, mx = divmod(mi, mcx)
        for ci, c in enumerate(comps):
            dc_lut, ac_lut = c["dc"], c["ac"]
            for bv in range(c["v"]):
                for bh_ in range(c["h"]):
                    e = int(dc_lut[br.peek16()])
                    if e < 0:
                        raise ValueError("invalid Huffman code (DC)")
                    br.skip(e & 31)
                    s = e >> 5
                    diff = _extend(br.bits(s), s) if s else 0
                    prev_dc[ci] += diff
                    zz = coeff[ci][(my * c["v"] + bv) * c["bw"] + mx * c["h"] + bh_]
                    zz[0] = prev_dc[ci]
                    k = 1
                    while k <= 63:
                        e = int(ac_lut[br.peek16()])
                        if e < 0:
                            raise ValueError("invalid Huffman code (AC)")
                        br.skip(e & 31)
                        sym = e >> 5
                        if sym == 0x00:  # EOB
                            break
                        if sym == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += sym >> 4
                        size = sym & 0xF
                        zz[k] = _extend(br.bits(size), size)
                        k += 1
    return _reconstruct(comps, coeff, qtables, h, w, hmax, vmax)


def _decode_seq_scan(data, pos, prog, scan, restart_interval) -> int:
    """One baseline SEQUENTIAL scan (full DC+AC per data unit) into
    ``prog['coeff']`` — the multi-scan baseline path. Interleaved
    (multi-component) scans walk the frame MCU grid; a
    single-component scan rasters that component's used blocks
    (T.81 A.2.2), with restart intervals counting MCUs / data units
    respectively. Returns the offset of the next marker."""
    coeff = prog["coeff"]
    segs, end = _split_entropy_segments(data, pos)
    state = {"seg": 0, "br": _FastBits(segs[0])}
    prev_dc = [0] * len(prog["comps"])

    def restart():
        state["seg"] += 1
        state["br"] = _FastBits(segs[state["seg"]])
        prev_dc[:] = [0] * len(prev_dc)

    def block(c, dc_lut, ac_lut, idx):
        br = state["br"]
        zz = coeff[c["ci"]][idx]
        _decode_dc_unit(br, dc_lut, zz, prev_dc, c["ci"], 0, 0)
        k = 1
        while k <= 63:
            e = int(ac_lut[br.peek16()])
            if e < 0:
                raise ValueError("invalid Huffman code (baseline AC)")
            br.skip(e & 31)
            sym = e >> 5
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC coefficient index overflow")
            zz[k] = _extend(br.bits(s), s)
            k += 1

    if len(scan) > 1:  # interleaved subset, MCU order over the frame grid
        mcx, mcy = prog["mcx"], prog["mcy"]
        for mi in range(mcx * mcy):
            if restart_interval and mi and mi % restart_interval == 0:
                restart()
            my, mx = divmod(mi, mcx)
            for c, dc_lut, ac_lut in scan:
                for bv in range(c["v"]):
                    for bh_ in range(c["h"]):
                        idx = (my * c["v"] + bv) * c["bw"] + mx * c["h"] + bh_
                        block(c, dc_lut, ac_lut, idx)
    else:  # single component, raster over its used blocks
        c, dc_lut, ac_lut = scan[0]
        bi = 0
        for by in range(c["ubh"]):
            for bx in range(c["ubw"]):
                if restart_interval and bi and bi % restart_interval == 0:
                    restart()
                block(c, dc_lut, ac_lut, by * c["bw"] + bx)
                bi += 1
    return end


def _init_progressive(comps: list[dict], h: int, w: int) -> dict:
    """Coefficient storage shared by all of a progressive stream's
    scans: MCU-padded block grids per component (interleaved DC scans
    walk the padded grid) plus the used sub-grid dims (non-interleaved
    scans cover only blocks holding real samples, T.81 A.2.2)."""
    if len(comps) == 1:
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    for ci, c in enumerate(comps):
        c["ci"] = ci
        c["bw"] = mcx * c["h"]
        c["bh"] = mcy * c["v"]
        comp_w = (w * c["h"] + hmax - 1) // hmax
        comp_h = (h * c["v"] + vmax - 1) // vmax
        c["ubw"] = (comp_w + 7) // 8
        c["ubh"] = (comp_h + 7) // 8
    return {
        "comps": comps,
        "coeff": [np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64) for c in comps],
        "hmax": hmax,
        "vmax": vmax,
        "mcx": mcx,
        "mcy": mcy,
    }


def _decode_dc_unit(br, dc_lut, zz, prev_dc, ci, ah, al):
    """One block's DC contribution: first pass (ah == 0) decodes a
    magnitude-coded diff at point transform al; refinement appends one
    bit at position al."""
    if ah == 0:
        e = int(dc_lut[br.peek16()])
        if e < 0:
            raise ValueError("invalid Huffman code (progressive DC)")
        br.skip(e & 31)
        s = e >> 5
        prev_dc[ci] += _extend(br.bits(s), s) if s else 0
        zz[0] = prev_dc[ci] << al
    elif br.bits(1):
        zz[0] |= 1 << al


def _refine_ac(br, ac_lut, zz, ss, se, p1, m1, eobrun) -> int:
    """AC successive-approximation refinement for one block
    (T.81 G.1.2.3): correction bits for already-nonzero coefficients,
    at most one newly nonzero coefficient per run, EOB runs span
    blocks. Returns the remaining EOB run."""
    k = ss
    if eobrun == 0:
        while k <= se:
            e = int(ac_lut[br.peek16()])
            if e < 0:
                raise ValueError("invalid Huffman code (AC refine)")
            br.skip(e & 31)
            sym = e >> 5
            r, s = sym >> 4, sym & 0xF
            val = 0
            if s == 0:
                if r != 15:  # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients below
            else:
                val = p1 if br.bits(1) else m1
            while k <= se:
                cur = int(zz[k])
                if cur != 0:
                    if br.bits(1) and (cur & p1) == 0:
                        zz[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            cur = int(zz[k])
            if cur != 0:
                if br.bits(1) and (cur & p1) == 0:
                    zz[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    data, pos, prog, scan, ss, se, ah, al, restart_interval
) -> int:
    """One progressive scan (DC or AC band, first pass or refinement)
    into ``prog['coeff']``; returns the offset of the next marker."""
    coeff = prog["coeff"]
    segs, end = _split_entropy_segments(data, pos)
    state = {"seg": 0, "br": _FastBits(segs[0])}

    def restart():
        state["seg"] += 1
        state["br"] = _FastBits(segs[state["seg"]])

    if ss == 0:  # DC scan (Se must be 0)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        prev_dc = [0] * len(prog["comps"])
        if len(scan) > 1:  # interleaved, MCU order
            if len(scan) != len(prog["comps"]):
                raise NotImplementedError("partially interleaved DC scan")
            mcx, mcy = prog["mcx"], prog["mcy"]
            for mi in range(mcx * mcy):
                if restart_interval and mi and mi % restart_interval == 0:
                    restart()
                    prev_dc = [0] * len(prog["comps"])
                my, mx = divmod(mi, mcx)
                for c, dc_lut, _ in scan:
                    for bv in range(c["v"]):
                        for bh_ in range(c["h"]):
                            idx = (my * c["v"] + bv) * c["bw"] + mx * c["h"] + bh_
                            _decode_dc_unit(
                                state["br"], dc_lut, coeff[c["ci"]][idx],
                                prev_dc, c["ci"], ah, al,
                            )
        else:  # single component, raster over used blocks
            c, dc_lut, _ = scan[0]
            bi = 0
            for by in range(c["ubh"]):
                for bx in range(c["ubw"]):
                    if restart_interval and bi and bi % restart_interval == 0:
                        restart()
                        prev_dc = [0] * len(prog["comps"])
                    _decode_dc_unit(
                        state["br"], dc_lut, coeff[c["ci"]][by * c["bw"] + bx],
                        prev_dc, c["ci"], ah, al,
                    )
                    bi += 1
        return end

    # AC scan: always one component (T.81 B.2.3)
    if len(scan) != 1:
        raise ValueError("interleaved AC scan is illegal")
    c, _, ac_lut = scan[0]
    p1, m1 = 1 << al, -(1 << al)
    eobrun = 0
    bi = 0
    for by in range(c["ubh"]):
        for bx in range(c["ubw"]):
            if restart_interval and bi and bi % restart_interval == 0:
                restart()
                eobrun = 0
            br = state["br"]
            zz = coeff[c["ci"]][by * c["bw"] + bx]
            if ah == 0:  # first pass for this band
                if eobrun:
                    eobrun -= 1
                else:
                    k = ss
                    while k <= se:
                        e = int(ac_lut[br.peek16()])
                        if e < 0:
                            raise ValueError("invalid Huffman code (progressive AC)")
                        br.skip(e & 31)
                        sym = e >> 5
                        r, s = sym >> 4, sym & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC coefficient index overflow")
                        zz[k] = _extend(br.bits(s), s) << al
                        k += 1
            else:
                eobrun = _refine_ac(br, ac_lut, zz, ss, se, p1, m1, eobrun)
            bi += 1
    return end


def _reconstruct(comps, coeff, qtables, h, w, hmax, vmax) -> np.ndarray:
    """Shared tail of baseline and progressive decode: dequantize
    (zigzag domain), reorder, IDCT, upsample subsampled planes, crop."""
    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]][_ZZ]  # zigzag-ordered steps
        dq = coeff[ci] * q
        nat = dq[:, _UNZZ].reshape(-1, 8, 8)
        px = _idct_blocks(nat) + 128
        plane = np.clip(_unblockify(px, c["bh"] * 8, c["bw"] * 8), 0, 255)
        sy, sx = vmax // c["v"], hmax // c["h"]
        if sy > 1 or sx > 1:
            plane = np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    ycc = np.stack(planes, axis=-1).astype(np.uint8)
    return ycbcr_to_rgb(ycc)
