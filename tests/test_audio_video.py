"""Audio (real WAV codec) and video (real MJPEG-in-AVI container)
modality tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vbpl_web_crawl_spark.sources import audio as AUD
from vbpl_web_crawl_spark.sources.corpus import (
    audio_feature_table,
    sample_frames,
    synth_audio_corpus,
    synth_video_corpus,
)


def test_wav_roundtrip_lossless():
    s = AUD.synth_samples("roundtrip")
    data = AUD.wav_encode(s, AUD.SAMPLE_RATE)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    dec, rate = AUD.wav_decode(data)
    assert rate == AUD.SAMPLE_RATE
    assert np.array_equal(dec[:, 0], s)
    assert AUD.wav_encode(dec[:, 0].copy(), rate) == data  # bit-stable


def test_wav_stereo_and_odd_chunk_alignment():
    stereo = np.stack([AUD.synth_samples("l")[:999], AUD.synth_samples("r")[:999]], axis=1)
    dec, rate = AUD.wav_decode(AUD.wav_encode(stereo, 16000))
    assert rate == 16000 and np.array_equal(dec, stereo)


def test_wav_non_pcm_raises():
    s = AUD.synth_samples("x")[:64]
    data = bytearray(AUD.wav_encode(s, 8000))
    data[20] = 2  # format tag -> ADPCM
    with pytest.raises(NotImplementedError, match="PCM16"):
        AUD.wav_decode(bytes(data))


def test_feature_sanity_dominant_frequency():
    # pure 440 Hz tone -> dominant bin within one bin of 440
    sr = AUD.SAMPLE_RATE
    t = np.arange(sr, dtype=np.float64) / sr
    tone = (np.sin(2 * np.pi * 440.0 * t) * 10000).astype(np.int16)
    f = AUD.audio_features(tone)
    assert abs(f["dominant_freq_hz"] - 440.0) <= sr / len(tone) + 1e-9
    assert f["peak"] <= 10000
    assert 0 < f["zcr"] < 1


def test_resample_halves_length():
    s = AUD.synth_samples("rs")
    d = AUD.resample_2x_down(s)
    assert d.shape[0] == s.shape[0] // 2


def test_audio_corpus_spark_pipeline(spark):
    feats = audio_feature_table(synth_audio_corpus(spark, 32, partitions=4))
    rows = feats.collect()
    assert len(rows) == 32
    assert all(r.roundtrip_exact for r in rows), "WAV PCM16 must be lossless"
    assert all(r.rms > 0 and 0 < r.zcr < 1 for r in rows)
    # features are parallelism-invariant (pure per-file numpy)
    again = {
        r.audio_id: r.rms
        for r in audio_feature_table(synth_audio_corpus(spark, 32, partitions=1)).collect()
    }
    for r in rows:
        assert again[r.audio_id] == r.rms


def test_avi_mjpeg_roundtrip_psnr40():
    """Real-container invariant (north_rule: PSNR >= 40 dB per frame for
    lossy payloads): encode frames to AVI-MJPEG, demux, decode EVERY
    frame, compare to the source pixels."""
    from vbpl_web_crawl_spark.sources import images as IMG
    from vbpl_web_crawl_spark.sources import jpeg as J
    from vbpl_web_crawl_spark.sources import video as V

    frames = V.synth_frames("rt-vid", 7)
    data = V.avi_mjpeg_encode(frames, fps=5)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    got, fps, w, h = V.avi_mjpeg_demux(data)
    assert fps == 5 and (h, w) == frames[0].shape[:2]
    assert len(got) == 7
    for orig, jbytes in zip(frames, got):
        assert jbytes[:2] == b"\xff\xd8" and jbytes[-2:] == b"\xff\xd9"
        assert IMG.psnr(orig, J.jpeg_decode(jbytes)) >= 40.0
    # container bytes are deterministic (byte-stable re-export)
    assert V.avi_mjpeg_encode(frames, fps=5) == data


def test_avi_mjpeg_demux_rejects_foreign_codec():
    """A vids stream with a non-MJPEG handler must fail loud, never
    hand garbage to the JPEG decoder."""
    import pytest as _pytest

    from vbpl_web_crawl_spark.sources import video as V

    frames = V.synth_frames("codec-x", 3)
    data = bytearray(V.avi_mjpeg_encode(frames, fps=4))
    i = data.find(b"vidsMJPG")
    assert i > 0
    data[i + 4 : i + 8] = b"H264"
    with _pytest.raises(NotImplementedError, match="ffmpeg"):
        V.avi_mjpeg_demux(bytes(data))


def test_video_frame_sampler(spark):
    videos = synth_video_corpus(spark, 8, partitions=2)
    frames = sample_frames(videos, stride=4)
    meta = {r.video_id: r.n_frames for r in videos.collect()}
    got = (
        frames.groupBy("video_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert len(got) == 8
    for r in got:
        expected = (meta[r.video_id] + 3) // 4  # ceil(n_frames / stride)
        assert r.n == expected, (r.video_id, r.n, expected)
    one = frames.limit(1).collect()[0]
    from vbpl_web_crawl_spark.sources import images as IMG

    px = IMG.png_decode(bytes(one.frame_png))
    assert px.ndim == 3 and px.shape[2] == 3


def test_video_corpus_mixes_containers_and_gif_is_lossless(spark):
    """The video corpus carries BOTH real containers; GIF-sampled
    frames are bit-equal to the synthetic source frames (GIF is
    lossless at <= 256 colors) with GCE-delay timestamps."""
    from vbpl_web_crawl_spark.sources import gif as G
    from vbpl_web_crawl_spark.sources import images as IMG

    videos = synth_video_corpus(spark, 16, partitions=2)
    fmts = {r.fmt for r in videos.select("fmt").distinct().collect()}
    assert fmts == {"avi-mjpeg", "gif"}
    gif_vids = videos.filter(F.col("fmt") == "gif")
    one = gif_vids.limit(1).collect()[0]
    sampled = (
        sample_frames(gif_vids, stride=4)
        .filter(F.col("video_id") == one.video_id)
        .orderBy("frame_no")
        .collect()
    )
    want = G.synth_gif_frames(one.video_id, one.n_frames)
    assert len(sampled) == (one.n_frames + 3) // 4
    for row in sampled:
        assert np.array_equal(
            IMG.png_decode(bytes(row.frame_png)), want[row.frame_no]
        )
        assert row.ts_s == pytest.approx(row.frame_no * 0.25)  # 25 cs GCE


def test_video_real_container_states_boundary(spark):
    videos = synth_video_corpus(spark, 2, partitions=1).withColumn(
        "fmt", F.lit("mp4")
    )
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(videos).collect()
