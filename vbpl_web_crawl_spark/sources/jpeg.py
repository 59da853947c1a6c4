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
- Decoder: general baseline sequential — parses DQT/DHT/SOF0/SOS/DRI
  from the stream (arbitrary standard tables, e.g. libjpeg output),
  handles byte stuffing and restart markers. Unsupported: progressive
  (SOF2), subsampled chroma (raises NotImplementedError with the
  boundary stated).
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


def jpeg_encode(pixels: np.ndarray) -> bytes:
    """RGB8 HxWx3 or gray HxW uint8 (dims multiples of 8) -> JPEG."""
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
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    # per-plane quantized zigzag coefficients
    plane_zz = []
    for ci in range(ncomp):
        blocks = _blockify(planes[ci].astype(np.int64) - 128)
        coeffs = _fdct_blocks(blocks).reshape(-1, 64)
        q = qtables[qids[ci]]
        qz = np.round(coeffs.astype(np.float64) / q).astype(np.int64)
        # float division is per-element (no BLAS reduction): deterministic
        plane_zz.append(qz[:, _ZZ])

    bw = _BitWriter()
    n_blocks = plane_zz[0].shape[0]
    prev_dc = [0] * ncomp
    for bi in range(n_blocks):  # MCU order == block order at 4:4:4
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
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (general baseline sequential)
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with byte-unstuffing; stops at markers
    and reports restart markers to the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller consumes via sync()
                else:
                    break  # real marker (EOI/next segment): pad below
                self.acc = (self.acc << 8) | byte
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        while self.nbits <= 24:
            self.acc = (self.acc << 8) | 0  # pad past segment end
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def sync_restart(self) -> None:
        """Consume an RSTn marker and realign to the byte boundary."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """{(length, code): symbol} canonical table from DHT BITS/HUFFVAL."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG bytes -> RGB8 HxWx3 (or HxWx3 replicated gray).

    Baseline sequential only; subsampled chroma raises
    NotImplementedError (the reference corpus is scanned pages — encode
    them 4:4:4 or plug libjpeg into the codec registry for 4:2:0)."""
    assert data[:2] == b"\xff\xd8", "not a JPEG (no SOI)"
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
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
        elif marker == 0xC0:  # SOF0 baseline
            precision = payload[0]
            assert precision == 8, "only 8-bit precision"
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            for ci in range(ncomp):
                cid, hv, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled chroma (sampling != 1x1) not supported — "
                        "re-encode 4:4:4 or register a libjpeg-backed codec"
                    )
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            ns = payload[0]
            for si in range(ns):
                cid, tt = payload[1 + 2 * si : 3 + 2 * si]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = htables[(0, tt >> 4)]
                        c["ac"] = htables[(1, tt & 0xF)]
            pos += seg_len
            return _decode_scan(data, pos, h, w, comps, qtables, restart_interval)
        pos += seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, h, w, comps, qtables, restart_interval) -> np.ndarray:
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    n_blocks = bh * bw_
    ncomp = len(comps)
    coeff = np.zeros((ncomp, n_blocks, 64), dtype=np.int64)
    br = _BitReader(data, pos)
    prev_dc = [0] * ncomp
    for bi in range(n_blocks):
        if restart_interval and bi and bi % restart_interval == 0:
            br.sync_restart()
            prev_dc = [0] * ncomp
        for ci, c in enumerate(comps):
            s = _decode_symbol(br, c["dc"])
            diff = _extend(br.bits(s), s) if s else 0
            prev_dc[ci] += diff
            zz = coeff[ci, bi]
            zz[0] = prev_dc[ci]
            k = 1
            while k <= 63:
                sym = _decode_symbol(br, c["ac"])
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                zz[k] = _extend(br.bits(size), size)
                k += 1
    # dequantize (zigzag domain), reorder, IDCT
    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]][_ZZ]  # zigzag-ordered steps
        dq = coeff[ci] * q
        nat = dq[:, _UNZZ].reshape(-1, 8, 8)
        px = _idct_blocks(nat) + 128
        planes.append(np.clip(_unblockify(px, bh * 8, bw_ * 8), 0, 255)[:h, :w])
    if ncomp == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    ycc = np.stack(planes, axis=-1).astype(np.uint8)
    return ycbcr_to_rgb(ycc)
