"""Stage-level profile of the full image-validation pipeline at the bench
shape (100k cached table, local[$SPARK_GRAFT_CPUS]) via the Spark UI REST
API — the feedback loop for decode/persist/join attribution.

Usage: python scripts/profile_validator.py [n_images]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DIR = os.environ.get("AADS_BENCH_DIR", "/tmp/aads_bench")
IMG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 100000


def main() -> None:
    from concurrent.futures import ThreadPoolExecutor

    from approximate_anomaly_detection_in_data_streams_spark.config import (
        DetectorConfig,
    )
    from approximate_anomaly_detection_in_data_streams_spark.session import get_spark
    from approximate_anomaly_detection_in_data_streams_spark.sources.images import (
        ImageTableConfig,
        generate_images,
        generate_reference,
    )
    from approximate_anomaly_detection_in_data_streams_spark.validator import (
        ImageValidatorConfig,
        validate_images,
    )

    spark = get_spark(
        app_name="aads-profile-val", cores=CPUS, extra={"spark.ui.enabled": "true"}
    )
    cfg = ImageTableConfig(n=IMG_N, seed=7, partitions=4 * CPUS, size_scale=2)
    img_path = os.path.join(BENCH_DIR, f"images_{IMG_N}_s2.parquet")
    ref_path = os.path.join(BENCH_DIR, f"reference_{IMG_N}_s2.parquet")
    if not (os.path.exists(img_path) and os.path.exists(ref_path)):
        generate_images(spark, cfg).write.mode("overwrite").parquet(img_path)
        generate_reference(spark, cfg).write.mode("overwrite").parquet(ref_path)
    images = spark.read.parquet(img_path)
    reference = spark.read.parquet(ref_path)
    images.count()
    reference.count()

    def _warm(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    spark.range(0, CPUS * 8, 1, CPUS * 8).mapInPandas(_warm, "id long").count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    vcfg = ImageValidatorConfig(drift=DetectorConfig(w=400, slide=100, r=40.0, k=6))
    seen = {s["stageId"] for s in stages()}
    t0 = time.perf_counter()
    report = validate_images(images, reference, vcfg, payload_path=img_path)
    report.row_checks.count()
    t1 = time.perf_counter()
    report.features.count()
    t2 = time.perf_counter()
    sinks = [
        ("stats", report.partition_stats),
        ("uniq", report.uniqueness),
        ("dups", report.phash_dups),
        ("viol", report.violations),
        ("drift", report.drift_slides),
        ("verd", report.partition_verdicts),
    ]
    with ThreadPoolExecutor(max_workers=len(sinks)) as pool:
        walls = list(
            pool.map(
                lambda kv: (
                    kv[0],
                    (lambda s: (kv[1].write.format("noop").mode("overwrite").save(), time.perf_counter() - s)[1])(time.perf_counter()),
                ),
                sinks,
            )
        )
    t3 = time.perf_counter()
    print(
        f"row_checks {t1-t0:.2f}s  features {t2-t1:.2f}s  sinks {t3-t2:.2f}s  "
        f"total {t3-t0:.2f}s  ({IMG_N/(t3-t0):.0f} img/s)"
    )
    print("per-sink walls:", {k: round(v, 2) for k, v in walls})
    new = [s for s in stages() if s["stageId"] not in seen]
    new.sort(key=lambda s: -s.get("executorRunTime", 0))
    for s in new[:14]:
        print(
            f"  stage {s['stageId']:>4}  run {s['executorRunTime']/1e3:7.1f}s"
            f"  cpu {s.get('executorCpuTime', 0)/1e9:7.1f}s"
            f"  tasks {s['numCompleteTasks']:>4}"
            f"  shW {s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB"
            f"  shR {s.get('shuffleReadBytes', 0)/1e6:8.1f}MB"
            f"  {s.get('name', '')[:50]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
