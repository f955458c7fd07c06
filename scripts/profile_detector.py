"""Stage-level profile of one headline detector query at sf0.1.

Usage: python scripts/profile_detector.py [query ...]
Runs each query once (noop sink), then dumps per-stage wall / task-time /
shuffle bytes from the Spark UI REST API, largest first — the feedback
loop for kernel-vs-shuffle attribution.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entrymod
    from approximate_anomaly_detection_in_data_streams_spark.session import get_spark

    names = sys.argv[1:] or ["lshod_outliers"]
    spark = get_spark(
        app_name="aads-profile", cores=CPUS, extra={"spark.ui.enabled": "true"}
    )
    qs = entrymod.queries()
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

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

    for name in names:
        seen = {s["stageId"] for s in stages()}
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        new = [s for s in stages() if s["stageId"] not in seen]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {name}: wall {wall:.2f}s ===")
        for s in new[:12]:
            print(
                f"  stage {s['stageId']:>4}  run {s['executorRunTime']/1e3:7.1f}s"
                f"  cpu {s.get('executorCpuTime', 0)/1e9:7.1f}s"
                f"  tasks {s['numCompleteTasks']:>4}"
                f"  shW {s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB"
                f"  shR {s.get('shuffleReadBytes', 0)/1e6:8.1f}MB"
                f"  {s.get('name', '')[:60]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
