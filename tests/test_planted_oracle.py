"""The planted-ground-truth oracle (oracle/planted.py) must reproduce the
distributed validator's outputs exactly — at a DIFFERENT config than the
driver queries use, so both paths are exercised off the memoized sizes."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def small_cfgs():
    from approximate_anomaly_detection_in_data_streams_spark.config import (
        DetectorConfig,
    )
    from approximate_anomaly_detection_in_data_streams_spark.sources.images import (
        ImageTableConfig,
    )
    from approximate_anomaly_detection_in_data_streams_spark.validator import (
        ImageValidatorConfig,
    )

    img = ImageTableConfig(n=500, seed=13, partitions=8)
    vcfg = ImageValidatorConfig(drift=DetectorConfig(w=200, slide=50, r=40.0, k=6))
    return img, vcfg


@pytest.fixture(scope="module")
def truth(small_cfgs):
    from approximate_anomaly_detection_in_data_streams_spark.oracle.planted import (
        image_truth,
    )

    img, vcfg = small_cfgs
    return image_truth(img, vcfg)


@pytest.fixture(scope="module")
def report(spark, small_cfgs):
    from approximate_anomaly_detection_in_data_streams_spark.sources.images import (
        generate_images,
        generate_reference,
    )
    from approximate_anomaly_detection_in_data_streams_spark.validator import (
        validate_images,
    )

    img, vcfg = small_cfgs
    return validate_images(
        generate_images(spark, img), generate_reference(spark, img), vcfg
    )


def test_violations_match_planted_truth(report, truth):
    spark_rows = sorted(
        (r["image_id"], r["kind"], r["detail"])
        for r in report.violations.collect()
    )
    truth_rows = sorted(
        (v["image_id"], v["kind"], v["detail"]) for v in truth["violations"]
    )
    assert spark_rows == truth_rows


def test_partition_verdicts_match_planted_truth(report, truth):
    got = {
        r["fmt"]: (r["n_rows"], r["n_row_violations"], r["passed"])
        for r in report.partition_verdicts.collect()
    }
    want = {
        v["fmt"]: (
            v["n_rows"],
            v["n_row_violations"],
            v["n_row_violations"] / v["n_rows"] <= 0.05,
        )
        for v in truth["verdicts"]
    }
    assert got == want


def test_drift_slides_match_planted_truth(report, truth):
    got = {
        r["slide"]: (r["n_rows"], r["l1"], r["drifted"])
        for r in report.drift_slides.collect()
    }
    want = {
        d["slide"]: (
            d["n_rows"],
            float(np.floor(d["l1"] * 1e4 + 0.5) / 1e4),
            d["l1"] > 45.0,
        )
        for d in truth["drift"]
    }
    assert set(got) == set(want)
    for s in got:
        assert got[s][0] == want[s][0], s
        assert got[s][2] == want[s][2], s
        assert abs(got[s][1] - want[s][1]) < 1.5e-4, (s, got[s], want[s])


def test_audio_video_truth_match_kernels(spark):
    from approximate_anomaly_detection_in_data_streams_spark.operators import media
    from approximate_anomaly_detection_in_data_streams_spark.oracle.planted import (
        audio_truth,
        video_truth,
    )

    n, seed = 40, 23
    feats = {
        r["audio_id"]: r
        for r in media.audio_features(media.generate_audio(spark, n, seed=seed)).collect()
    }
    for t in audio_truth(n, seed):
        got = feats[t["audio_id"]]
        assert got["decode_ok"] == t["decode_ok"]
        for k in ("duration_s", "rms", "zero_crossing_rate", "peak"):
            assert got[k] == t[k], (t["audio_id"], k)

    frames = media.sample_frames(media.generate_video(spark, n, seed=seed), 2)
    got_rows = {
        (r["video_id"], r["frame_idx"]): (
            r["w"],
            r["h"],
            int(hashlib.md5(bytes(r["frame_bytes"])).hexdigest()[:15], 16),
        )
        for r in frames.collect()
    }
    want_rows = {
        (t["video_id"], t["frame_idx"]): (t["w"], t["h"], t["frame_fp"])
        for t in video_truth(n, seed, 2)
    }
    assert got_rows == want_rows


def test_vector_generator_replay_bit_exact(spark):
    """The distributed vector generator and the pure-Python definition it
    shares with the IVF replay (sources/vectors.py::vector_values) must
    produce identical float32 bits row for row — the premise of the
    ivf_ann_refined planted oracle."""
    import numpy as np

    from approximate_anomaly_detection_in_data_streams_spark.sources.vectors import (
        generate_vectors,
        vector_values,
    )

    n, dim, seed, ncen = 200, 8, 17, 6
    rows = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
        for r in generate_vectors(spark, n, dim, seed, ncen, partitions=5).collect()
    }
    assert len(rows) == n
    for i in range(n):
        want = np.array(vector_values(seed, i, dim, ncen), dtype=np.float32)
        assert np.array_equal(rows[i], want), i
