"""Multimodal media operators: audio features, video frame sampling, image
resize — kernel outputs vs direct NumPy recomputation, malformed-row
verdicts, and composition of sampled frames with the image codec path."""

from __future__ import annotations

import numpy as np
import pytest

from approximate_anomaly_detection_in_data_streams_spark.functions import (
    image_codec as icodec,
)
from approximate_anomaly_detection_in_data_streams_spark.functions import (
    media_codec as mcodec,
)
from approximate_anomaly_detection_in_data_streams_spark.operators import media


def test_audio_codec_roundtrip():
    x = np.sin(np.arange(4000) / 20.0) * 15000
    payload = mcodec.encode_audio(x, 8000)
    samples, sr = mcodec.decode_audio(payload)
    assert sr == 8000 and len(samples) == 4000
    assert np.allclose(samples * 32768.0, np.round(x).clip(-32768, 32767), atol=1.0)


def test_video_frame_random_access():
    frames = (np.arange(5 * 6 * 4).reshape(5, 6, 4) % 256).astype(np.uint8)
    payload = mcodec.encode_video(frames)
    assert mcodec.decode_video_header(payload) == (4, 6, 5)
    for i in range(5):
        assert np.array_equal(mcodec.decode_frame(payload, i), frames[i])


def test_external_format_is_marked_stub():
    with pytest.raises(NotImplementedError):
        mcodec.decode_external(b"\x00\x01", "mp4")


def test_audio_features_match_numpy(spark):
    audio = media.generate_audio(spark, 8, seed=7, partitions=2)
    got = {r.audio_id: r for r in media.audio_features(audio).collect()}
    assert len(got) == 8
    for o in range(8):
        payload = mcodec.synth_audio(7, o)
        dur, rms, zcr, peak = mcodec.audio_feature_vector(payload)
        row = got[f"aud_{o:08d}"]
        assert row.decode_ok
        assert row.duration_s == pytest.approx(dur)
        assert row.rms == pytest.approx(rms)
        assert row.zero_crossing_rate == pytest.approx(zcr)
        assert row.peak == pytest.approx(peak)


def test_audio_malformed_rows_become_verdicts(spark):
    rows = [
        ("ok", mcodec.synth_audio(1, 1), 8000, "aada"),
        ("trunc", mcodec.synth_audio(1, 2)[:6], 8000, "aada"),
        ("external", b"ID3\x04" + b"\x00" * 64, 44100, "mp3"),
        ("empty", b"", 0, "aada"),
    ]
    df = spark.createDataFrame(rows, media.AUDIO_SCHEMA)
    got = {r.audio_id: r.decode_ok for r in media.audio_features(df).collect()}
    assert got == {"ok": True, "trunc": False, "external": False, "empty": False}


def test_sample_frames_and_image_composition(spark):
    video = media.generate_video(spark, 6, seed=9, partitions=2)
    frames = media.sample_frames(video, every_k=2).collect()
    by_vid: dict[str, list] = {}
    for r in frames:
        by_vid.setdefault(r.video_id, []).append(r)
    assert set(by_vid) == {f"vid_{o:08d}" for o in range(6)}
    for o in range(6):
        payload = mcodec.synth_video(9, o)
        w, h, nf = mcodec.decode_video_header(payload)
        rows = sorted(by_vid[f"vid_{o:08d}"], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(0, nf, 2))
        # sampled frames are REAL raw-container images: decode and compare
        for r in rows:
            px = icodec.decode(bytes(r.frame_bytes))
            assert px.shape == (h, w)
            assert np.array_equal(px, mcodec.decode_frame(payload, r.frame_idx))


def test_resize_images_nearest_neighbor(spark):
    px = (np.arange(20 * 12).reshape(12, 20) % 256).astype(np.uint8)
    df = spark.createDataFrame(
        [("img_a", icodec.encode_raw(px)), ("bad", b"\x00\x01")],
        "image_id string, bytes binary",
    )
    got = {r.image_id: r for r in media.resize_images(df, 10, 6).collect()}
    assert set(got) == {"img_a"}  # undecodable row dropped, task alive
    out = icodec.decode(bytes(got["img_a"].bytes))
    yi = (np.arange(6) * 12) // 6
    xi = (np.arange(10) * 20) // 10
    assert np.array_equal(out, px[yi[:, None], xi[None, :]])
    assert (got["img_a"].w, got["img_a"].h, got["img_a"].fmt) == (10, 6, "raw")
