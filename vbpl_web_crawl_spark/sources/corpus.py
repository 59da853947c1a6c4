"""Multimodal corpus plumbing: image+caption, audio, and video tables
as DataFrame operators (BASELINE.json input_hint schema for images).

Every modality is an opaque ``binary`` column with typed metadata; all
decode/feature work runs inside Arrow batches via mapInPandas. Codec
status per modality:
- images: real PNG + real baseline JPEG (sources/jpeg.py) + the vdct
  stand-in, behind the images.register_codec registry;
- audio: real RIFF/WAV PCM16 (sources/audio.py); compressed codecs
  (mp3/opus) are a documented NotImplementedError boundary (no ffmpeg
  in this container);
- video: container parsing is STUBBED (deterministic frame synthesis
  behind the same boundary) — the frame-sample operator, schema,
  partitioning and batch shape are real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def synth_corpus(spark: SparkSession, n: int, partitions: int = 16) -> DataFrame:
    """Materialize n deterministic image+caption rows, built in Arrow
    batches on the executors (nothing flows through the driver)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vbpl_web_crawl_spark.sources import images as IMG

        for pdf in it:
            recs = [IMG.synth_image_record(f"img{int(i):08d}") for i in pdf["id"]]
            out = pd.DataFrame(recs, columns=[f.name for f in CORPUS_SCHEMA.fields])
            out["phash"] = pd.array([r["phash"] for r in recs], dtype="Int64")
            yield out

    return spark.range(n).repartition(partitions).mapInPandas(gen, CORPUS_SCHEMA)


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
        T.StructField("phash_match", T.BooleanType(), False),
        T.StructField("caption_tokens", T.IntegerType(), False),
    ]
)


def decode_features(corpus: DataFrame) -> DataFrame:
    """Decode each image and extract features (mean luma, phash
    recomputation check) — the decode/feature-extract stage of a
    multimodal training pipeline, one Arrow batch at a time."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vbpl_web_crawl_spark.sources import images as IMG

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = IMG.decode_image(bytes(r.bytes), r.fmt)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "fmt": r.fmt,
                        "w": int(r.w),
                        "h": int(r.h),
                        "mean_luma": float(px.astype("float64").mean()),
                        "phash_match": IMG.phash64(px) == r.phash,
                        "caption_tokens": len(r.caption.split()),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODE_STATS_SCHEMA.fields])

    return corpus.mapInPandas(run, DECODE_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Audio modality (real WAV codec, sources/audio.py)
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)


def synth_audio_corpus(spark: SparkSession, n: int, partitions: int = 16) -> DataFrame:
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vbpl_web_crawl_spark.sources import audio as AUD

        for pdf in it:
            recs = [AUD.synth_audio_record(f"aud{int(i):08d}") for i in pdf["id"]]
            yield pd.DataFrame(recs, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return spark.range(n).repartition(partitions).mapInPandas(gen, AUDIO_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zcr", T.DoubleType(), False),
        T.StructField("peak", T.IntegerType(), False),
        T.StructField("dominant_freq_hz", T.DoubleType(), False),
        T.StructField("roundtrip_exact", T.BooleanType(), False),
    ]
)


def audio_feature_table(corpus: DataFrame) -> DataFrame:
    """Decode WAV bytes and extract features (RMS, zero-crossing rate,
    peak, dominant rFFT bin) — one whole-array numpy pass per file
    inside Arrow batches; ``roundtrip_exact`` re-encodes and compares
    bytes (WAV PCM16 is lossless, so this is a per-row invariant)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from vbpl_web_crawl_spark.sources import audio as AUD

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                samples, rate = AUD.wav_decode(bytes(r.bytes))
                feats = AUD.audio_features(samples)
                rows.append(
                    {
                        "audio_id": r.audio_id,
                        "n_samples": int(samples.shape[0]),
                        "duration_s": samples.shape[0] / rate,
                        "rms": feats["rms"],
                        "zcr": feats["zcr"],
                        "peak": feats["peak"],
                        "dominant_freq_hz": feats["dominant_freq_hz"],
                        "roundtrip_exact": AUD.wav_encode(samples, rate)
                        == bytes(r.bytes),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return corpus.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# Video modality — container decode STUBBED (no ffmpeg in container),
# frame-sample plumbing real: a "video" is k deterministic frames; the
# sampler decodes only every ``stride``-th frame, which is exactly the
# batch shape an ffmpeg-backed sampler has (seek + decode keyframes).
# ---------------------------------------------------------------------------

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fps", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)

_VID_MAGIC = b"VSYN"


def synth_video_corpus(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Synthetic "videos": VSYN container = magic + frame count + the
    seed id. Real containers (mp4/webm) raise NotImplementedError in
    sample_frames — this stub keeps the operator surface testable."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from vbpl_web_crawl_spark.sources.images import splitmix64

        for pdf in it:
            rows = []
            for i in pdf["id"]:
                vid = f"vid{int(i):08d}"
                n_frames = 8 + int(splitmix64(int(i))) % 25
                payload = _VID_MAGIC + struct.pack(">I", n_frames) + vid.encode()
                rows.append(
                    {
                        "video_id": vid,
                        "bytes": payload,
                        "n_frames": n_frames,
                        "fps": 4,
                        "fmt": "vsyn",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_SCHEMA.fields])

    return spark.range(n).repartition(partitions).mapInPandas(gen, VIDEO_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("ts_s", T.DoubleType(), False),
        T.StructField("frame_png", T.BinaryType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)


def sample_frames(videos: DataFrame, stride: int = 4) -> DataFrame:
    """Every stride-th frame of each video as a PNG binary row — the
    frame-sampling stage of a video training pipeline. Only the 'vsyn'
    stub container is decodable here; real codecs raise."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from vbpl_web_crawl_spark.sources import images as IMG

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt != "vsyn":
                    raise NotImplementedError(
                        f"video container {r.fmt!r}: real demux/decode needs "
                        "ffmpeg — plug in here; the vsyn stub exercises the "
                        "sampler plumbing"
                    )
                data = bytes(r.bytes)
                assert data[:4] == _VID_MAGIC
                (n_frames,) = struct.unpack(">I", data[4:8])
                vid = data[8:].decode()
                for f_no in range(0, n_frames, stride):
                    px = IMG.synth_pixels(f"{vid}/frame{f_no}")
                    rows.append(
                        {
                            "video_id": r.video_id,
                            "frame_no": f_no,
                            "ts_s": f_no / r.fps,
                            "frame_png": IMG.png_encode(px),
                            "mean_luma": float(px.astype("float64").mean()),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return videos.mapInPandas(run, FRAME_SCHEMA)


def resize_to_thumbnail(corpus: DataFrame, size: int = 32) -> DataFrame:
    """Resize stage (block-mean downsample; PIL-free) -> thumbnail
    binary column. Shows the transform-and-reencode batch shape."""
    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("thumb_png", T.BinaryType(), False),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from vbpl_web_crawl_spark.sources import images as IMG

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = IMG.decode_image(bytes(r.bytes), r.fmt)
                h, w, _ = px.shape
                bh, bw = max(h // size, 1), max(w // size, 1)
                small = (
                    px[: bh * size, : bw * size]
                    .reshape(size, bh, size, bw, 3)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                rows.append({"image_id": r.image_id, "thumb_png": IMG.png_encode(small)})
            yield pd.DataFrame(rows, columns=["image_id", "thumb_png"])

    return corpus.mapInPandas(run, out_schema)
