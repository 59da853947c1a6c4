"""BMP (Windows bitmap) codec — pure numpy, lossless.

The simplest real interchange image format a crawler meets (scanner
exports, legacy portals): BITMAPFILEHEADER + BITMAPINFOHEADER,
uncompressed BI_RGB pixels, BGR byte order, rows bottom-up and padded
to 4 bytes. Decode accepts 24-bit and 32-bit BI_RGB, bottom-up or
top-down (negative height); encode writes canonical 24-bit bottom-up.
Lossless both ways, cross-validated against javax.imageio in
tests/test_images.py. Compressed BMP variants (RLE4/RLE8/bitfields)
raise the documented boundary.
"""

from __future__ import annotations

import struct

import numpy as np


def bmp_encode(pixels: np.ndarray) -> bytes:
    """RGB8 HxWx3 uint8 -> 24-bit bottom-up BI_RGB BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_len = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return file_hdr + info + data


def bmp_decode(data: bytes) -> np.ndarray:
    """BMP bytes -> RGB8 HxWx3 (24/32-bit BI_RGB, either row order)."""
    assert data[:2] == b"BM", "not a BMP"
    (offset,) = struct.unpack("<I", data[10:14])
    hdr_size, w, h = struct.unpack("<Iii", data[14:26])
    assert hdr_size >= 40, f"unsupported BMP header size {hdr_size}"
    planes, bits, compression = struct.unpack("<HHI", data[26:34])
    if compression != 0 or bits not in (24, 32):
        raise NotImplementedError(
            f"BMP {bits}-bit compression={compression}: only uncompressed "
            "24/32-bit BI_RGB decodes natively"
        )
    top_down = h < 0
    h = abs(h)
    bpp = bits // 8
    row_len = (w * bpp + 3) & ~3
    raw = np.frombuffer(data, dtype=np.uint8, count=h * row_len, offset=offset)
    rows = raw.reshape(h, row_len)[:, : w * bpp].reshape(h, w, bpp)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)
