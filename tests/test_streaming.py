"""Streaming mode: the incremental slide-loop engine and the Structured
Streaming driver must reproduce the batch detector exactly."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from approximate_anomaly_detection_in_data_streams_spark.api import run_detector
from approximate_anomaly_detection_in_data_streams_spark.config import DetectorConfig
from approximate_anomaly_detection_in_data_streams_spark.streaming.incremental import (
    run_slide_loop,
    run_structured_stream,
)

CFG = DetectorConfig(w=100, slide=20, r=0.5, k=8)


@pytest.fixture(scope="module")
def batch_result(spark, gauss2d):
    ids = np.arange(1, len(gauss2d) + 1)
    df = spark.createDataFrame(
        [(int(i), [float(a), float(b)]) for i, (a, b) in zip(ids, gauss2d)],
        "id long, features array<double>",
    )
    res = run_detector(df, CFG)
    outliers = [r.id for r in res.outliers.collect()]
    stats = res.stats.first().asDict()
    return outliers, stats


def test_slide_loop_matches_batch_detector(gauss2d, batch_result):
    outliers, stats = batch_result
    ids = np.arange(1, len(gauss2d) + 1)
    res = run_slide_loop(ids, gauss2d, CFG)
    assert res["outliers"] == outliers
    assert res["n_only_inlier"] == stats["n_only_inlier"]
    assert res["n_only_outlier"] == stats["n_only_outlier"]
    assert res["n_both_inlier_outlier"] == stats["n_both_inlier_outlier"]


def test_structured_stream_matches_batch_detector(
    spark, gauss2d, batch_result, tmp_path
):
    outliers, stats = batch_result
    src = tmp_path / "stream_in"
    src.mkdir()
    ids = np.arange(1, len(gauss2d) + 1)
    # one json file per slide, zero-padded so file order == arrival order
    for seq, start in enumerate(range(0, len(ids), CFG.slide)):
        with open(src / f"batch_{seq:06d}.json", "w") as fh:
            for i in range(start, min(start + CFG.slide, len(ids))):
                fh.write(
                    json.dumps(
                        {"id": int(ids[i]), "features": [float(x) for x in gauss2d[i]]}
                    )
                    + "\n"
                )
    res = run_structured_stream(
        spark, str(src), CFG, str(tmp_path / "ck"), dim=2
    )
    assert res["outliers"] == outliers
    assert res["n_only_outlier"] == stats["n_only_outlier"]
