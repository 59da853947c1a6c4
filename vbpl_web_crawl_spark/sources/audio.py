"""Audio payloads for the multimodal corpus layer: a REAL codec (RIFF
WAV, PCM16) in pure numpy, a deterministic synthetic "recording"
generator, and vectorized feature extraction.

Role (task brief "multimodal columns"): audio travels as an opaque
``binary`` column with typed metadata (sample_rate, n_samples,
n_channels, fmt); decode / feature-extract / resample run as pandas
UDFs over ``mapInPandas`` — per-file loops live inside Arrow batches,
the same pattern as the image corpus (sources/images.py). WAV is a real
interchange format, so unlike the image side there is no stand-in here:
any standard tool reads these bytes. Compressed codecs (mp3/opus) would
plug into the same registry boundary (images.register_codec-style) and
are out of scope in this container (no ffmpeg) — the documented
NotImplementedError below marks that boundary.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from vbpl_web_crawl_spark.sources.images import splitmix64

# ---------------------------------------------------------------------------
# RIFF/WAVE PCM16 codec (real format, lossless for int16 samples)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) -> WAV bytes."""
    assert samples.dtype == np.int16
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples (n, ch), sample_rate). PCM16 only;
    compressed WAV (e.g. ADPCM) raises NotImplementedError."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a WAV"
    pos = 12
    sample_rate, ch, samples = 0, 0, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            audio_fmt, ch, sample_rate = struct.unpack("<HHI", payload[:8])
            bits = struct.unpack("<H", payload[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM16 WAV supported — plug a decoder in for "
                    f"format tag {audio_fmt}/{bits}bit"
                )
        elif tag == b"data":
            samples = np.frombuffer(payload, dtype="<i2").reshape(-1, ch).copy()
        pos += 8 + ln + (ln & 1)  # RIFF chunks are 2-byte aligned
    assert samples is not None, "no data chunk"
    return samples, sample_rate


# ---------------------------------------------------------------------------
# Deterministic synthetic recordings ("dictated legal document readings")
# ---------------------------------------------------------------------------

SAMPLE_RATE = 8000


def synth_samples(audio_id: str) -> np.ndarray:
    """Deterministic mono int16 signal keyed by id: a sum of two tones
    with an amplitude envelope + integer noise, 0.25-1.0 s at 8 kHz."""
    seed = int(splitmix64(zlib.crc32(audio_id.encode()) & 0xFFFFFFFF))
    n = SAMPLE_RATE // 4 * (1 + seed % 4)  # 2000..8000 samples
    t = np.arange(n, dtype=np.float64) / SAMPLE_RATE
    f1 = 110.0 + (seed >> 3) % 600
    f2 = 400.0 + (seed >> 9) % 2400
    env = 0.5 + 0.5 * np.sin(np.pi * t / t[-1])
    sig = env * (0.6 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t))
    rng = np.random.Generator(np.random.PCG64(seed))
    noise = rng.integers(-200, 201, size=n)
    return np.clip(sig * 12000 + noise, -32768, 32767).astype(np.int16)


def synth_audio_record(audio_id: str) -> dict:
    samples = synth_samples(audio_id)
    data = wav_encode(samples, SAMPLE_RATE)
    return {
        "audio_id": audio_id,
        "bytes": data,
        "sample_rate": SAMPLE_RATE,
        "n_samples": int(samples.shape[0]),
        "n_channels": 1,
        "fmt": "wav",
    }


# ---------------------------------------------------------------------------
# Feature extraction (whole-array numpy per file, inside Arrow batches)
# ---------------------------------------------------------------------------


def audio_features(samples: np.ndarray) -> dict:
    """Deterministic per-file features: RMS energy, zero-crossing rate,
    peak amplitude, dominant frequency bin (integer-indexed rFFT argmax)."""
    x = samples.astype(np.float64).mean(axis=1) if samples.ndim == 2 else samples.astype(np.float64)
    n = len(x)
    rms = float(np.sqrt(np.mean(x**2)))
    zc = int(np.count_nonzero(np.diff(np.signbit(x))))
    spectrum = np.abs(np.fft.rfft(x))
    spectrum[0] = 0.0  # ignore DC
    dom_bin = int(np.argmax(spectrum))
    return {
        "rms": rms,
        "zero_crossings": zc,
        "zcr": zc / max(n - 1, 1),
        "peak": int(np.max(np.abs(x))),
        "dominant_freq_hz": dom_bin * SAMPLE_RATE / n,
    }


def resample_2x_down(samples: np.ndarray) -> np.ndarray:
    """Cheap deterministic 2x downsample (mean of sample pairs) — the
    audio analog of the image thumbnail stage."""
    x = samples if samples.ndim == 2 else samples[:, None]
    n = (x.shape[0] // 2) * 2
    pairs = x[:n].astype(np.int32).reshape(-1, 2, x.shape[1])
    return (pairs.mean(axis=1)).astype(np.int16)
