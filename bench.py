"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is forced with a noop-sink write (full materialization, no
driver collect). ``value`` is total wall seconds across headline queries;
``throughput_rows_per_s`` reports the flagship detector's validated
rows/sec (the BASELINE.json metric at sandbox scale).

Scaling-efficiency evidence (north_rule: N vs 4N executors, sandbox proxy
local[8] vs local[32]) lives in scripts/bench_scaling.py, results in
BENCH.md / BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: detector core (exact + LSH), validator profile, dedup,
# similarity search, text analysis. Names match __spark_entry__.queries().
HEADLINE = [
    "mcod_outliers",
    "mcod_stats",
    "approx_mcod_outliers",
    "lshod_outliers",
    "col_stats_lineitem",
    "uniqueness_orders",
    "heavy_hitters_events",
    "referential_orphans",
    "join_segment_revenue",
    "pricing_summary",
    "window_hourly_events",
    "minhash_pairs_documents",
    "simhash_pairs_documents",
    "embedding_neardup",
    "knn_bruteforce",
    "srp_ann",
    "lang_id_documents",
    "quality_documents",
    "token_counts_documents",
    "fingerprint_documents",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from approximate_anomaly_detection_in_data_streams_spark.session import get_spark

    spark = get_spark(app_name="aads-bench", cores=CPUS)
    qs = entrymod.queries()

    # Warm the JVM/parquet footers once so per-query times measure compute.
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    det_secs = times["mcod_outliers"]
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf else None,
                "cpus": CPUS,
                "detector_rows_per_s": round(n_events / det_secs, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
