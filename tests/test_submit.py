"""spark-submit --py-files packaging smoke (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Builds the deterministic py-files zip, then launches a REAL spark-submit
subprocess from a scratch cwd with the repo stripped from PYTHONPATH — so
every package import must resolve through the --py-files archive, proving
the zip is complete — and runs both CLI modes end-to-end at tiny scale.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

SPARK_SUBMIT = shutil.which("spark-submit")


def _run_submit(args: list[str], cwd: str) -> subprocess.CompletedProcess:
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # imports must come from --py-files
    }
    env["SPARK_GRAFT_CPUS"] = "2"
    return subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]", *args],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_pyfiles_zip_submit_validate_and_detect(spark, tmp_path):
    import numpy as np

    from package_pyfiles import build

    zip_path = build(str(tmp_path / "aads_pyfiles.zip"))
    # deterministic archive: a second build is byte-identical
    zip2 = build(str(tmp_path / "aads_pyfiles2.zip"))
    assert open(zip_path, "rb").read() == open(zip2, "rb").read()

    # tiny inputs written with the in-process session
    from approximate_anomaly_detection_in_data_streams_spark.sources.images import (
        ImageTableConfig,
        generate_images,
        generate_reference,
    )

    cfg = ImageTableConfig(n=300, seed=11, partitions=4, size_scale=1)
    img_path = str(tmp_path / "images.parquet")
    ref_path = str(tmp_path / "reference.parquet")
    generate_images(spark, cfg).write.parquet(img_path)
    generate_reference(spark, cfg).write.parquet(ref_path)
    rng = np.random.default_rng(3)
    csv_path = str(tmp_path / "stream.csv")
    with open(csv_path, "w") as fh:
        fh.writelines(f"{x!r}\n" for x in rng.normal(0, 10, 400))

    workdir = tmp_path / "scratch"
    workdir.mkdir()
    shim = os.path.join(REPO, "scripts", "submit_app.py")

    res = _run_submit(
        [
            "--py-files", zip_path, shim, "validate",
            "--images", img_path, "--reference", ref_path,
            "--checkpoint", str(tmp_path / "ck"),
        ],
        cwd=str(workdir),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    ledger = json.loads(res.stdout.strip().splitlines()[-1])
    assert ledger and all("passed" in v for v in ledger.values())

    out_file = tmp_path / "out.txt"
    res = _run_submit(
        [
            "--py-files", zip_path, shim, "detect",
            "--algorithm", "MCOD", "--W", "100", "--slide", "20",
            "--R", "5", "--k", "4", "--datafile", csv_path,
            "--outliersFile", str(out_file),
        ],
        cwd=str(workdir),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert summary["n_outliers"] == sum(1 for _ in open(out_file))
