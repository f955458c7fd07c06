"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is forced with a noop-sink write (full materialization, no
driver collect). ``value`` is total wall seconds across headline queries.
``validated_images_per_s`` is the BASELINE.json headline metric: the full
image validation pipeline (decode + PSNR/caption invariants + stats +
uniqueness + dup groups + anomaly + drift + verdicts) timed over a
deterministic synthetic image+caption table (generation is excluded from
the timing; the parquet is cached under $AADS_BENCH_DIR between runs).
``detector_rows_per_s`` reports the flagship detector's throughput.

Scaling-efficiency evidence (north_rule: N vs 4N executors, sandbox proxy
2 vs 8 pinned CPUs) lives in scripts/bench_scaling.py, results in
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
BENCH_DIR = os.environ.get("AADS_BENCH_DIR", "/tmp/aads_bench")
IMG_N = int(os.environ.get("AADS_BENCH_IMG_N", "100000"))
# best-of-N per query: the shared host swings same-code walls 1.3-4.5x
# between phases, and r3's ABBA measurement shows identical configs
# alternating 2.3x (BENCH.md) — min-of-3 measures the engine, not the
# noise (best-of-2 still occasionally catches two slow samples)
REPS = int(os.environ.get("AADS_BENCH_REPS", "3"))

# Headline set: detector core (exact + LSH), validator profile, dedup,
# similarity search, text analysis. Names match __spark_entry__.queries().
HEADLINE = [
    "mcod_outliers",
    "mcod_stats",
    "approx_mcod_outliers",
    "approx_mclshod_outliers",
    "lshod_outliers",
    "col_stats_lineitem",
    "uniqueness_orders",
    "heavy_hitters_events",
    "referential_orphans",
    "join_segment_revenue",
    "pricing_summary",
    "window_hourly_events",
    "value_drift_events",
    "minhash_pairs_documents",
    "jaccard_pairs_capped",
    "simhash_pairs_documents",
    "embedding_neardup",
    "knn_bruteforce",
    "srp_ann",
    "ivf_ann",
    "ivf_ann_refined",
    "audio_features",
    "video_frames",
    "lang_id_documents",
    "quality_documents",
    "token_counts_documents",
    "fingerprint_documents",
]


def _image_validation_throughput(spark) -> float:
    """Validated images/sec for the full pipeline (BASELINE.json metric).
    Table generation is cached to parquet and excluded from the timing."""
    from concurrent.futures import ThreadPoolExecutor

    from approximate_anomaly_detection_in_data_streams_spark.config import (
        DetectorConfig,
    )
    from approximate_anomaly_detection_in_data_streams_spark.sources.images import (
        ImageTableConfig,
        generate_images,
        generate_reference,
    )
    from approximate_anomaly_detection_in_data_streams_spark.validator import (
        ImageValidatorConfig,
        validate_images,
    )

    cfg = ImageTableConfig(n=IMG_N, seed=7, partitions=4 * CPUS, size_scale=2)
    from approximate_anomaly_detection_in_data_streams_spark.functions import (
        image_codec as _codec,
    )

    # cache keyed by codec version: stored phash derives from decode bits,
    # so an IDCT contract change must regenerate the table
    _v = _codec.CODEC_VERSION
    img_path = os.path.join(BENCH_DIR, f"images_{IMG_N}_s2_v{_v}.parquet")
    ref_path = os.path.join(BENCH_DIR, f"reference_{IMG_N}_s2_v{_v}.parquet")
    if not (os.path.exists(img_path) and os.path.exists(ref_path)):
        generate_images(spark, cfg).write.mode("overwrite").parquet(img_path)
        generate_reference(spark, cfg).write.mode("overwrite").parquet(ref_path)
    images = spark.read.parquet(img_path)
    reference = spark.read.parquet(ref_path)
    images.count()
    reference.count()

    vcfg = ImageValidatorConfig(drift=DetectorConfig(w=400, slide=100, r=40.0, k=6))
    best = float("inf")
    # best-of-REPS like the per-query timings: identical validation runs
    # alternate ~2.3x with host phase (BENCH.md ABBA measurement), and
    # min-of-N measures the engine rather than the phase
    for _ in range(max(REPS, 1)):
        t0 = time.perf_counter()
        report = validate_images(images, reference, vcfg, payload_path=img_path)
        report.row_checks.count()
        report.features.count()
        sinks = [
            report.partition_stats,
            report.uniqueness,
            report.phash_dups,
            report.violations,
            report.drift_slides,
            report.partition_verdicts,
        ]
        with ThreadPoolExecutor(max_workers=len(sinks)) as pool:
            list(
                pool.map(
                    lambda df: df.write.format("noop").mode("overwrite").save(), sinks
                )
            )
        best = min(best, time.perf_counter() - t0)
        # release this rep's persisted stages so the next rep measures
        # genuine compute (and memory does not accumulate). clearCache
        # (not a derived-DF unpersist) because the persisted node is the
        # internal `combined` stage; the headline queries have already
        # finished by this point, so nothing else relies on the cache.
        spark.catalog.clearCache()
    return IMG_N / best


def main() -> None:
    import __spark_entry__ as entrymod
    from approximate_anomaly_detection_in_data_streams_spark.session import get_spark

    spark = get_spark(app_name="aads-bench", cores=CPUS)
    qs = entrymod.queries()

    # Warm the JVM/parquet footers AND the Python workers once so per-query
    # times measure compute, not interpreter/worker spin-up (long-lived on
    # a real cluster; same protocol as scripts/bench_scaling.py).
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    def _warm(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    spark.range(0, CPUS * 8, 1, CPUS * 8).mapInPandas(_warm, "id long").count()

    # INTERLEAVED reps: pass 1 runs every query, then pass 2, then pass 3 —
    # so one query's reps sample host phases ~a minute apart instead of
    # back-to-back. The r3 driver record caught a slow phase that lasted
    # through all 3 consecutive reps of ivf_ann/audio/video (3-4x walls vs
    # r2 on identical code+rows); with interleaving a multi-second phase
    # can poison at most one full pass, and the per-query min still
    # measures the engine.
    times: dict[str, float] = {name: float("inf") for name in HEADLINE}
    created: dict[str, set] = {}
    for rep in range(max(REPS, 1)):
        for name in HEADLINE:
            if rep:
                # drop detection-memo entries THIS query created on the
                # first pass so every rep measures genuine compute;
                # cross-query reuse (e.g. mcod_stats reading mcod_outliers'
                # verdict table) stays because the producer re-runs first
                # in pass order
                for k in created.get(name, ()):
                    hit = entrymod._DETECTIONS.pop(k, None)
                    if hit is not None:
                        hit.per_point.unpersist()
            pre_keys = set(entrymod._DETECTIONS)
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[name] = min(times[name], time.perf_counter() - t0)
            if not rep:
                created[name] = set(entrymod._DETECTIONS) - pre_keys
    times = {name: round(v, 3) for name, v in times.items()}

    total = round(sum(times.values()), 3)
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    det_secs = times["mcod_outliers"]
    img_per_s = _image_validation_throughput(spark)
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
                "validated_images_per_s": round(img_per_s, 1),
                "validated_images_n": IMG_N,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
