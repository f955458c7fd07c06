from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def spark():
    from approximate_anomaly_detection_in_data_streams_spark.session import get_spark

    spark = get_spark(
        app_name="aads-tests",
        cores=int(os.environ.get("AADS_TEST_CORES", "4")),
        shuffle_partitions=8,
        driver_memory="4g",
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def gauss2d() -> np.ndarray:
    return np.loadtxt(GOLDEN / "gauss2d.csv", delimiter=",")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("AADS_TEST_SF_DIR", "/root/testdata/sf0.001")


def golden_outliers(name: str) -> list[int]:
    return sorted(int(line) for line in (GOLDEN / name).read_text().split())
