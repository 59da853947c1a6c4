"""GIF87a/89a codec — pure Python/numpy LZW, no external image libs.

GIF is the third real interchange image format in the registry (after
PNG and baseline/progressive JPEG) and the second real *animation*
container (after AVI-MJPEG, sources/video.py): a web crawl of a
document portal meets GIFs constantly (seals, scanned stamps, banner
animations), and the reference pipeline downloads and decodes real
binary payloads (/root/reference/app/service/get_pdf.py:24-74,
anle.py:193-229) — so the Spark-side corpus needs a real decoder, not
a magic-number stub.

Implemented from the public GIF89a specification:
- decode: header + logical screen descriptor, global/local color
  tables, interlaced and sequential images, LZW with variable code
  width and deferred-clear handling, Graphic Control Extensions
  (transparency, frame delay, disposal methods 0-3), multi-frame
  compositing onto the logical screen.
- encode: exact-palette when the image has <= 256 unique colors
  (lossless roundtrip — GIF's native regime), optional deterministic
  median-cut quantization above that (the format's hard 256-color
  limit; loss is a property of GIF itself, not this codec). Animated
  encode writes one GCE + image per frame over a shared palette.

Interchange is cross-validated in tests/test_gif.py against the JVM's
javax.imageio GIF reader AND writer (an independent implementation
shipped with the Spark runtime) — our files parse there pixel-exactly
and theirs parse here pixel-exactly.
"""

from __future__ import annotations

import struct

import numpy as np

_HDR89 = b"GIF89a"
_HDR87 = b"GIF87a"

# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable 3..12-bit codes,
# CLEAR = 2^min_code_size, EOI = CLEAR+1, table capped at 4096 with
# deferred clear).
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: keep what decoded
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > table size")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # the decoder's table is one entry behind; it bumps width
            # when ITS size hits 2^width, i.e. when our next_code
            # passes 2^width
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            # table full: reset (simpler than deferred-clear emit side)
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        out += data[pos : pos + size]
        pos += size


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _interlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    return rows[order]


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------


def gif_decode_frames(data: bytes) -> tuple[list[np.ndarray], list[int], int]:
    """GIF bytes -> (RGB8 frames composited onto the logical screen,
    per-frame delays in centiseconds, loop count from NETSCAPE2.0 ext
    or -1 if absent). Handles 87a/89a, interlace, local palettes,
    transparency, disposal 0-3."""
    if data[:6] not in (_HDR87, _HDR89):
        raise ValueError("not a GIF")
    sw, sh, flags, bg_idx, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()

    frames: list[np.ndarray] = []
    delays: list[int] = []
    loop = -1
    transparent_idx = -1
    disposal = 0
    delay_cs = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = data[pos]
                gflags, delay_cs, tidx = struct.unpack(
                    "<BHB", data[pos + 1 : pos + 5]
                )
                pos += 1 + size
                assert data[pos] == 0, "GCE must end with a 0 sub-block"
                pos += 1
                disposal = (gflags >> 2) & 0x07
                transparent_idx = tidx if gflags & 0x01 else -1
            else:
                payload, pos = _read_sub_blocks(data, pos)
                if label == 0xFF and payload[:11] == b"NETSCAPE2.0":
                    # sub-block payloads concatenated: 01 <u16 loop>
                    if len(payload) >= 14 and payload[11] == 1:
                        loop = struct.unpack("<H", payload[12:14])[0]
            continue
        if block != 0x2C:  # image descriptor
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos - 1}")
        x, y, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("image has neither local nor global color table")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = np.frombuffer(_lzw_decode(lzw, min_code_size), dtype=np.uint8)
        if len(idx) < w * h:  # tolerate short streams like other readers
            idx = np.concatenate([idx, np.zeros(w * h - len(idx), dtype=np.uint8)])
        idx = idx[: w * h].reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[y : y + h, x : x + w]
        rgb = pal[idx]
        if transparent_idx >= 0:
            opaque = idx != transparent_idx
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_cs)
        if disposal == 2:
            canvas[y : y + h, x : x + w] = bg_rgb
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent_idx = -1
        disposal = 0
        delay_cs = 0
    return frames, delays, loop


def gif_decode(data: bytes) -> np.ndarray:
    """First frame as RGB8 HxWx3 (codec-registry entry point)."""
    frames, _, _ = gif_decode_frames(data)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames[0]


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def median_cut_palette(pixels: np.ndarray, max_colors: int = 256) -> np.ndarray:
    """Deterministic median-cut palette: split the box with the widest
    channel range at its count-weighted median until max_colors boxes;
    palette entry = count-weighted mean of each box. Pure numpy, stable
    ordering (ties broken by box index, colors pre-sorted)."""
    flat = pixels.reshape(-1, 3).astype(np.int64)
    packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    uniq, counts = np.unique(packed, return_counts=True)
    cols = np.stack(
        [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1
    )
    def box(c, n):
        # spread cached at creation: each split is O(box), not O(all boxes)
        spread = int((c.max(axis=0) - c.min(axis=0)).max()) if len(c) > 1 else -1
        return (spread, c, n)

    boxes = [box(cols, counts)]
    while len(boxes) < max_colors:
        widest, bi = -1, -1
        for i, (spread, _, _) in enumerate(boxes):
            if spread > widest:
                widest, bi = spread, i
        if bi < 0:
            break
        _, c, n = boxes.pop(bi)
        ch = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, ch], kind="stable")
        c, n = c[order], n[order]
        half = np.searchsorted(np.cumsum(n), n.sum() / 2.0, side="right")
        half = min(max(half, 1), len(c) - 1)
        boxes.append(box(c[:half], n[:half]))
        boxes.append(box(c[half:], n[half:]))
    pal = np.array(
        [
            np.round((c * n[:, None]).sum(axis=0) / n.sum())
            for _, c, n in boxes
        ],
        dtype=np.uint8,
    )
    # stable palette order (decode output depends only on pixel values)
    key = (pal[:, 0].astype(np.int64) << 16) | (pal[:, 1].astype(np.int64) << 8) | pal[
        :, 2
    ].astype(np.int64)
    return pal[np.argsort(key, kind="stable")]


def _map_to_palette(pixels: np.ndarray, pal: np.ndarray) -> np.ndarray:
    """Nearest-palette-index map (squared L2), vectorized over the
    image's unique colors so cost is O(uniq * pal), not O(pixels * pal)."""
    flat = pixels.reshape(-1, 3).astype(np.int64)
    packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    uniq, inv = np.unique(packed, return_inverse=True)
    cols = np.stack(
        [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1
    )
    # argmin of |c-p|^2 == argmin of -2c.p + |p|^2 (|c|^2 is constant per
    # row). float32 matmul is exact here — every partial is an integer
    # < 2^24 — so the result is bit-deterministic regardless of BLAS.
    colsf = cols.astype(np.float32)
    palf = pal.astype(np.float32)
    d = colsf @ (-2.0 * palf.T) + (palf * palf).sum(axis=1)[None, :]
    nearest = d.argmin(axis=1).astype(np.uint8)
    return nearest[inv].reshape(pixels.shape[:2])


def _exact_palette(frames: list[np.ndarray]) -> np.ndarray | None:
    packed_all = []
    for f in frames:
        flat = f.reshape(-1, 3).astype(np.int64)
        packed_all.append((flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2])
    uniq = np.unique(np.concatenate(packed_all))
    if len(uniq) > 256:
        return None
    return np.stack(
        [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1
    ).astype(np.uint8)


def gif_encode_frames(
    frames: list[np.ndarray],
    delay_cs: int = 10,
    loop: int = 0,
    interlace: bool = False,
    quantize: bool = False,
) -> bytes:
    """RGB8 frames (same dims) -> animated GIF89a with a shared global
    palette. Lossless when the union of frame colors fits 256 (exact
    palette); otherwise raises unless quantize=True (deterministic
    median-cut — GIF's own 256-color format limit, not a codec gap)."""
    assert frames, "need at least one frame"
    h, w = frames[0].shape[:2]
    assert all(
        f.shape == (h, w, 3) and f.dtype == np.uint8 for f in frames
    ), "frames must be uint8 HxWx3 with equal dims"
    pal = _exact_palette(frames)
    if pal is None:
        if not quantize:
            raise NotImplementedError(
                "GIF is palette-limited to 256 colors and these frames "
                f"use more; pass quantize=True for deterministic "
                "median-cut quantization or use png/jpeg for truecolor"
            )
        pal = median_cut_palette(np.concatenate([f.reshape(-1, 1, 3) for f in frames]))
    n_pal = max(2, 1 << int(np.ceil(np.log2(max(len(pal), 2)))))
    pal_full = np.zeros((n_pal, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal
    pal_bits = int(np.log2(n_pal))

    out = bytearray()
    out += _HDR89
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) & 0x07), 0, 0)
    out += pal_full.tobytes()
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    mcs = max(2, pal_bits)
    for f in frames:
        idx = _map_to_palette(f, pal)
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00
        )
        rows = _interlace(idx) if interlace else idx
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(rows.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


def gif_encode(pixels: np.ndarray, quantize: bool = False, interlace: bool = False) -> bytes:
    """Single-frame GIF89a. Lossless for <= 256 unique colors."""
    return gif_encode_frames([pixels], interlace=interlace, quantize=quantize)


# ---------------------------------------------------------------------------
# Synthetic animated payloads (FIXTURES.md §1 shape: deterministic
# function of the id, palette-limited so the encode is lossless).
# ---------------------------------------------------------------------------


def synth_gif_video_record(gif_id: str, n_frames: int, delay_cs: int = 25) -> dict:
    """Animated-GIF corpus row in the VIDEO_SCHEMA shape (corpus.py):
    real GIF89a bytes any browser/decoder plays, lossless frames."""
    frames = synth_gif_frames(gif_id, n_frames)
    return {
        "video_id": gif_id,
        "bytes": gif_encode_frames(frames, delay_cs=delay_cs, loop=0),
        "n_frames": n_frames,
        "fps": 100 // delay_cs,
        "fmt": "gif",
    }


def synth_gif_frames(gif_id: str, n_frames: int) -> list[np.ndarray]:
    """Deterministic palette-limited frames: a dark 'stamp' block moving
    over a light page, 16-tone palette — lossless in GIF."""
    from vbpl_web_crawl_spark.sources.images import splitmix64
    import zlib as _z

    seed = int(splitmix64(_z.crc32(gif_id.encode()) & 0xFFFFFFFF))
    h = 64 if seed % 2 else 96
    w = 96 if (seed // 2) % 2 else 64
    tones = np.linspace(40, 230, 16).astype(np.uint8)
    frames = []
    for t in range(n_frames):
        img = np.full((h, w, 3), 230, dtype=np.uint8)
        bx = (seed + t * 7) % max(w - 16, 1)
        by = (seed // 5 + t * 3) % max(h - 16, 1)
        tone = int(tones[(seed + t) % 16])
        img[by : by + 16, bx : bx + 16] = (tone, tone // 2, tone)
        img[:, :: 8] = tones[(seed + t) % 16]
        frames.append(img)
    return frames
