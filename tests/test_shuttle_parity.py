"""Parity on the reference's own benchmark dataset (shuttle.csv subset).

Golden file produced by running the compiled reference
(/root/reference/src/Executor.java) with
``--algorithm MCOD --W 1000 --slide 100 --R 45 --k 30`` on the first 5000
rows of /root/reference/datasets/shuttle.csv. Also covers the LSH path:
missed collisions only lower counts, so the LSHOD outlier set must be a
superset of the exact one (recall 1.0 by construction; precision measured).
"""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from approximate_anomaly_detection_in_data_streams_spark.api import (
    lshod_config,
    run_detector,
)
from approximate_anomaly_detection_in_data_streams_spark.config import DetectorConfig
from approximate_anomaly_detection_in_data_streams_spark.operators.accuracy import (
    compare_outlier_sets,
)

from .conftest import GOLDEN, golden_outliers
from .test_mcod_core import to_points_df


@pytest.fixture(scope="module")
def shuttle5k() -> np.ndarray:
    with gzip.open(GOLDEN / "shuttle5k.csv.gz", "rt") as f:
        return np.loadtxt(f, delimiter=",")


@pytest.fixture(scope="module")
def shuttle_points(spark, shuttle5k):
    return to_points_df(spark, shuttle5k).cache()


def test_mcod_shuttle_golden(spark, shuttle_points):
    cfg = DetectorConfig(w=1000, slide=100, r=45.0, k=30)
    result = run_detector(shuttle_points, cfg)
    got = [row.id for row in result.outliers.collect()]
    assert got == golden_outliers("mcod_shuttle5k_1000_100_45_30.txt")


def test_lshod_superset_and_precision(spark, shuttle_points):
    cfg = DetectorConfig(w=1000, slide=100, r=45.0, k=30)
    exact = run_detector(shuttle_points, cfg)
    approx = run_detector(shuttle_points, lshod_config(1000, 100, 45.0, 30))
    cmp = compare_outlier_sets(exact.outliers, approx.outliers)
    assert cmp["recall"] == 1.0  # structural: candidates subset of neighbors
    assert cmp["precision"] >= 0.4  # quality floor for default LSH params


@pytest.mark.parametrize(
    "dataset,w,s,r,k,golden",
    [
        ("satimage-2.csv.gz", 1000, 100, 80.0, 30, "mcod_satimage2_1000_100_80_30.txt"),
        ("arrhythmia.csv.gz", 200, 50, 200.0, 10, "mcod_arrhythmia_200_50_200_10.txt"),
    ],
)
def test_mcod_reference_datasets_golden(spark, dataset, w, s, r, k, golden):
    """Bit-exact parity on the reference's other committed benchmark
    datasets (36-dim satimage-2, 274-dim arrhythmia); goldens produced by
    running the compiled reference Java with the same parameters."""
    with gzip.open(GOLDEN / dataset, "rt") as f:
        data = np.loadtxt(f, delimiter=",")
    points = to_points_df(spark, data)
    cfg = DetectorConfig(w=w, slide=s, r=r, k=k)
    got = [row.id for row in run_detector(points, cfg).outliers.collect()]
    assert got == golden_outliers(golden)
