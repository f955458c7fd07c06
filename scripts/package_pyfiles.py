"""Build the --py-files archive for spark-submit cluster runs.

Zips the package sources (no tests, no caches) into
``dist/aads_spark_pyfiles.zip`` with fixed timestamps, so the archive is
byte-deterministic for a given tree — executors unpack identical code on
every submit and the artifact is content-addressable for cluster caches.

Usage:
    python scripts/package_pyfiles.py [out.zip]
    spark-submit --master <cluster> --py-files dist/aads_spark_pyfiles.zip \\
        scripts/submit_app.py validate --images ... --reference ... --checkpoint ...
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "approximate_anomaly_detection_in_data_streams_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "aads_spark_pyfiles.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    root = os.path.join(REPO, PKG)
    names: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                names.append(os.path.join(dirpath, fn))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in names:
            arc = os.path.relpath(path, REPO)
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(path, "rb") as fh:
                zf.writestr(info, fh.read(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
