"""Baseline TIFF codec — pure numpy/stdlib, no external image libs.

Scanned legal documents — the reference portal's actual payload
(/root/reference/app/service/get_pdf.py:24-74 downloads the binary
scans) — ship as TIFF more than any other master format, so the
multimodal layer decodes it natively. Implemented from the public
TIFF 6.0 specification:

- decode: II/MM byte orders, baseline IFD walk, strips (any
  RowsPerStrip), 8-bit RGB (photometric 2) and grayscale (photometric
  1, expanded to RGB like the other codecs), compressions: 1 (none),
  5 (LZW with the TIFF variants: MSB-first bit order + early code
  width change), 32773 (PackBits), and the horizontal-differencing
  predictor (tag 317 = 2).
- encode: canonical little-endian single-IFD RGB, LZW-compressed
  strips with predictor 2 (what most scanner software writes).

Tiled TIFF, 16-bit samples, palette color and JPEG-in-TIFF raise the
documented fail-loud boundary. Interchange is cross-validated against
the JVM's javax.imageio TIFF plugin (shipped since JDK 9) in both
directions in tests/test_tiff.py.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# TIFF-variant LZW: 8-bit symbols, CLEAR=256, EOI=257, codes packed
# MSB-first, and the code width bumps one entry EARLIER than GIF's LSB
# variant (the spec's "early change").
# ---------------------------------------------------------------------------


def _tiff_lzw_decode(data: bytes) -> bytes:
    clear, eoi = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == clear:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        # "early change": width bumps at 2^w - 1 entries, one code
        # earlier than plain LZW (verified against the JDK's
        # TIFFLZWDecompressor, which uses the same thresholds)
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1


def _tiff_lzw_encode(data: bytes) -> bytes:
    clear, eoi = 256, 257
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(clear)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # the encoder's table is one entry ahead of the decoder's, so
        # its early-change point is 2^width (decoder's is 2^width - 1)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: reset
            emit(clear)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data):
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out)


# ---------------------------------------------------------------------------
# IFD parsing
# ---------------------------------------------------------------------------

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(data: bytes, bo: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", data[e : e + 8])
        size = _TYPE_SIZE.get(typ, 1) * cnt
        raw = data[e + 8 : e + 12]
        if size > 4:
            (off,) = struct.unpack(bo + "I", raw)
            raw = data[off : off + size]
        if typ == 3:
            vals = list(struct.unpack(bo + f"{cnt}H", raw[: 2 * cnt]))
        elif typ == 4:
            vals = list(struct.unpack(bo + f"{cnt}I", raw[: 4 * cnt]))
        elif typ == 1:
            vals = list(raw[:cnt])
        else:  # rational / ascii: not needed for pixel decode
            vals = []
        tags[tag] = vals
    return tags


def tiff_decode(data: bytes) -> np.ndarray:
    """TIFF bytes -> RGB8 HxWx3 (baseline strips; see module doc)."""
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    t = _read_ifd(data, bo)
    if 322 in t or 323 in t:
        raise NotImplementedError("tiled TIFF: only stripped baseline decodes")
    w = t[256][0]
    h = t[257][0]
    spp = t.get(277, [1])[0]
    bits = t.get(258, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"{bits}-bit TIFF: only 8-bit samples decode")
    photo = t.get(262, [1])[0]
    if photo not in (1, 2) or spp not in (1, 3):
        raise NotImplementedError(
            f"TIFF photometric={photo} spp={spp}: only 8-bit gray/RGB decode"
        )
    comp = t.get(259, [1])[0]
    rps = t.get(278, [h])[0] or h
    offsets = t[273]
    counts = t[279]
    predictor = t.get(317, [1])[0]

    rows = np.zeros((h, w * spp), dtype=np.uint8)
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = data[off : off + cnt]
        if comp == 1:
            raw = strip
        elif comp == 5:
            raw = _tiff_lzw_decode(strip)
        elif comp in (8, 32946):  # Deflate (Adobe + legacy tags)
            import zlib

            raw = zlib.decompress(strip)
        elif comp == 32773:
            raw = _packbits_decode(strip)
        else:
            raise NotImplementedError(
                f"TIFF compression={comp}: none/LZW/Deflate/PackBits decode natively"
            )
        y0 = si * rps
        n_rows = min(rps, h - y0)
        arr = np.frombuffer(raw, dtype=np.uint8, count=n_rows * w * spp).reshape(
            n_rows, w * spp
        )
        rows[y0 : y0 + n_rows] = arr
    px = rows.reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing per channel
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor={predictor}")
    if spp == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


# ---------------------------------------------------------------------------
# Encode: little-endian, one IFD, RGB strips, LZW + predictor 2.
# ---------------------------------------------------------------------------


def tiff_encode(pixels: np.ndarray, rows_per_strip: int = 32) -> bytes:
    """RGB8 HxWx3 uint8 -> TIFF bytes (LZW, horizontal predictor)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    diff = pixels.astype(np.int16)
    diff[:, 1:, :] -= pixels[:, :-1, :].astype(np.int16)
    diff = (diff & 0xFF).astype(np.uint8).reshape(h, w * 3)

    strips = []
    for y0 in range(0, h, rows_per_strip):
        strips.append(_tiff_lzw_encode(diff[y0 : y0 + rows_per_strip].tobytes()))

    n = len(strips)

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        return struct.pack("<HHII", tag, typ, cnt, val)

    # layout: header(8) | IFD | bits(6) | offsets(4n) | counts(4n) | strips
    n_entries = 11
    ifd_size = 2 + 12 * n_entries + 4
    bits_off = 8 + ifd_size
    soff_off = bits_off + 6
    scnt_off = soff_off + 4 * n
    data_off = scnt_off + 4 * n
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)

    ifd = struct.pack("<H", n_entries)
    ifd += entry(256, 4, 1, w)
    ifd += entry(257, 4, 1, h)
    ifd += entry(258, 3, 3, bits_off)
    ifd += entry(259, 3, 1, 5)  # LZW
    ifd += entry(262, 3, 1, 2)  # RGB
    ifd += entry(273, 4, n, soff_off if n > 1 else offs[0])
    ifd += entry(277, 3, 1, 3)
    ifd += entry(278, 4, 1, rows_per_strip)
    ifd += entry(279, 4, n, scnt_off if n > 1 else len(strips[0]))
    ifd += entry(284, 3, 1, 1)  # chunky
    ifd += entry(317, 3, 1, 2)  # horizontal predictor
    ifd += struct.pack("<I", 0)  # no next IFD

    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += ifd
    out += struct.pack("<HHH", 8, 8, 8)
    out += b"".join(struct.pack("<I", o) for o in offs)
    out += b"".join(struct.pack("<I", len(s)) for s in strips)
    for s in strips:
        out += s
    return bytes(out)
