"""Video payloads: a REAL container codec — MJPEG-in-AVI (RIFF 'AVI ')
— in pure Python/numpy, closing the last X3 stub. The reference
genuinely decodes binary documents it downloads
(/root/reference/app/service/anle.py:193-229 parses real PDFs;
get_pdf.py:24-74 streams the binaries); the Spark-side equivalent for
the video modality is a genuine interchange container, not a synthetic
magic-number blob. AVI-MJPEG is the simplest standard video format:
RIFF framing (same chunk grammar as the WAV codec in sources/audio.py)
around one baseline JPEG per frame (sources/jpeg.py), so any standard
player/demuxer (ffmpeg, VLC, Windows Media) reads these files.

Demux is separated from decode on purpose: ``avi_mjpeg_demux`` walks
chunk headers and returns per-frame byte slices WITHOUT decoding, so a
frame sampler touches only the strided frames' JPEG payloads — the
exact seek-then-decode batch shape an ffmpeg-backed sampler has.

Compressed inter-frame codecs (h264/vp9 in mp4/webm) stay a documented
NotImplementedError boundary in corpus.sample_frames (no ffmpeg in this
container); they plug in behind the same demux/decode split.
"""

from __future__ import annotations

import struct

import numpy as np

from vbpl_web_crawl_spark.sources import jpeg as J
from vbpl_web_crawl_spark.sources import images as IMG


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""  # RIFF 2-byte alignment
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_mjpeg_encode(frames: list[np.ndarray], fps: int = 4) -> bytes:
    """RGB8 frames (all HxWx3, same dims) -> standard AVI-MJPEG bytes
    (avih + strl headers, movi chunks, idx1 index). Deterministic:
    byte-stable for stable inputs (jpeg_encode is bit-deterministic)."""
    assert frames, "need at least one frame"
    h, w = frames[0].shape[:2]
    assert all(f.shape[:2] == (h, w) for f in frames), "frames must share dims"
    jpegs = [J.jpeg_encode(f) for f in frames]
    max_bytes = max(len(j) for j in jpegs)

    movi_payload = b""
    idx_entries = []
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((len(movi_payload) + 4, len(j)))
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln)  # AVIIF_KEYFRAME
            for off, ln in idx_entries
        ),
    )

    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # MicroSecPerFrame
            max_bytes * fps,  # MaxBytesPerSec
            0,  # PaddingGranularity
            0x10,  # Flags: AVIF_HASINDEX
            len(frames),  # TotalFrames
            0,  # InitialFrames
            1,  # Streams
            max_bytes,  # SuggestedBufferSize
            w,
            h,
            0,
            0,
            0,
            0,  # Reserved[4]
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # Flags
            0,  # Priority
            0,  # Language
            0,  # InitialFrames
            1,  # Scale
            fps,  # Rate (fps = Rate/Scale)
            0,  # Start
            len(frames),  # Length (in frames)
            max_bytes,  # SuggestedBufferSize
            0,  # Quality
            -1,  # SampleSize (-1: varies)
            0,
            0,
            w,
            h,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40,  # biSize
            w,
            h,
            1,  # biPlanes
            24,  # biBitCount
            b"MJPG",  # biCompression
            w * h * 3,  # biSizeImage
            0,
            0,
            0,
            0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_mjpeg_demux(data: bytes) -> tuple[list[bytes], int, int, int]:
    """AVI bytes -> (per-frame JPEG payloads, fps, width, height).

    Walks the RIFF chunk tree (hdrl for fps/dims, movi for '00dc'/'00db'
    frame chunks); payloads are returned un-decoded — callers decode
    only the frames they sample. Non-MJPEG streams raise."""
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI ", "not an AVI"
    fps, w, h = 0, 0, 0
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal fps, w, h
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            payload_start = pos + 8
            if tag == b"LIST":
                walk(buf, payload_start + 4, payload_start + ln)
            elif tag == b"avih":
                usec, _, _, _, _, _, _, _, aw, ah = struct.unpack(
                    "<10I", buf[payload_start : payload_start + 40]
                )
                fps = round(1_000_000 / usec) if usec else 0
                w, h = aw, ah
            elif tag == b"strh":
                fcc_type = buf[payload_start : payload_start + 4]
                handler = buf[payload_start + 4 : payload_start + 8]
                if fcc_type == b"vids" and handler not in (b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"video codec {handler!r}: only MJPEG is built in — "
                        "register an ffmpeg-backed decoder for others"
                    )
            elif tag in (b"00dc", b"00db"):
                frames.append(buf[payload_start : payload_start + ln])
            pos = payload_start + ln + (ln & 1)  # 2-byte alignment

    walk(data, 12, len(data))
    assert frames, "no frame chunks found"
    return frames, fps, w, h


# ---------------------------------------------------------------------------
# Deterministic synthetic videos (real AVI bytes)
# ---------------------------------------------------------------------------


def synth_frames(video_id: str, n_frames: int) -> list[np.ndarray]:
    """Deterministic frames for a synthetic video: the id's scan-page
    texture vertically scrolling 4 px/frame — temporally coherent like
    a camera pan, constant dims, pure function of (id, frame_no)."""
    base = IMG.synth_pixels(video_id)
    return [np.roll(base, -4 * f, axis=0) for f in range(n_frames)]


def synth_video_record(video_id: str, n_frames: int, fps: int = 4) -> dict:
    frames = synth_frames(video_id, n_frames)
    return {
        "video_id": video_id,
        "bytes": avi_mjpeg_encode(frames, fps),
        "n_frames": n_frames,
        "fps": fps,
        "fmt": "avi-mjpeg",
    }
