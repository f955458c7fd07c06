"""spark-submit entry point mirroring the reference CLI
(/root/reference/src/Executor.java:52-92):

    spark-submit --py-files aads.zip -m approximate_anomaly_detection_in_data_streams_spark \\
        --algorithm MCOD --W 1000 --slide 100 --R 45 --k 30 \\
        --datafile datasets/shuttle.csv --outliersFile out.txt

plus validator mode:

    python -m approximate_anomaly_detection_in_data_streams_spark validate \\
        --images /path/images.parquet --reference /path/ref.parquet \\
        --checkpoint /path/ck

Runs on any master (local[*] default; ``--master`` or spark-submit's own
--master for clusters).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _detector_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--algorithm", default="MCOD",
                   choices=["MCOD", "ApproxMCOD", "LSHOD", "ApproxMCLSHOD"])
    p.add_argument("--W", type=int, required=True)
    p.add_argument("--slide", type=int, required=True)
    p.add_argument("--R", type=float, required=True)
    p.add_argument("--k", type=int, required=True)
    p.add_argument("--pdLimit", type=int, default=0)
    p.add_argument("--arFactor", type=float, default=0.0)
    p.add_argument("--datafile", required=True)
    p.add_argument("--containsClass", default="false")
    p.add_argument("--outliersFile", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--engine", default="spark", choices=["spark", "sequential"],
        help="spark: distributed DataFrame plans (default); sequential: "
        "the faithful reference-mechanism engine "
        "(streaming/mcod_engine.py — micro-clusters, event queue, "
        "ApproxMCOD eviction/ANC, seeded), for literal parity runs",
    )


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    mode = "detect"
    if argv and argv[0] in ("detect", "validate"):
        mode = argv.pop(0)

    parser = argparse.ArgumentParser(prog="approximate_anomaly_detection_in_data_streams_spark")
    parser.add_argument("--master", default=None)
    parser.add_argument("--cores", type=int, default=None)
    if mode == "detect":
        _detector_args(parser)
    else:
        parser.add_argument("--images", required=True)
        parser.add_argument("--reference", default=None)
        parser.add_argument("--checkpoint", required=True)
    args = parser.parse_args(argv)

    from .session import get_spark

    spark = get_spark(app_name=f"aads-{mode}", cores=args.cores, master=args.master)
    t0 = time.perf_counter()
    try:
        if mode == "detect":
            from .api import run_detector
            from .config import DetectorConfig
            from .sources.stream_csv import load_stream_csv

            algo = {
                "MCOD": "mcod", "ApproxMCOD": "approx_mcod",
                "LSHOD": "lshod", "ApproxMCLSHOD": "approx_mclshod",
            }[args.algorithm]
            cfg = DetectorConfig(
                w=args.W, slide=args.slide, r=args.R, k=args.k,
                algorithm=algo, pd_limit=args.pdLimit,
                ar_factor=args.arFactor, seed=args.seed,
            )
            points = load_stream_csv(
                spark, args.datafile,
                contains_class=args.containsClass.lower() == "true",
            )
            if args.engine == "sequential":
                # faithful reference-mechanism run (MCOD / ApproxMCOD;
                # LSH variants stay on the Spark engine)
                import numpy as np

                from .streaming.mcod_engine import MCODEngine

                rows = points.orderBy("id").collect()
                X = np.asarray([r.features for r in rows], dtype=np.float64)
                res = MCODEngine(cfg, X.shape[1]).run(X)
                outlier_ids = res["outliers"]
                stats = {
                    "n_only_inlier": res["n_only_inlier"],
                    "n_only_outlier": res["n_only_outlier"],
                    "n_both_inlier_outlier": res["n_both_inlier_outlier"],
                    "n_range_queries": res["n_range_queries"],
                }
            else:
                result = run_detector(points, cfg)
                outlier_ids = [r.id for r in result.outliers.collect()]
                stats = result.stats.first().asDict()
            if args.outliersFile:
                with open(args.outliersFile, "w") as fh:
                    fh.writelines(f"{i}\n" for i in outlier_ids)
            print(json.dumps({
                "n_outliers": len(outlier_ids),
                **stats,
                "seconds": round(time.perf_counter() - t0, 3),
            }))
        else:
            from .checkpoint import run_validation

            images = spark.read.parquet(args.images)
            reference = (
                spark.read.parquet(args.reference) if args.reference else None
            )
            ledger = run_validation(spark, images, args.checkpoint, reference)
            print(json.dumps({
                k: {"passed": v.passed, "n_rows": v.n_rows,
                    "n_violations": v.n_violations}
                for k, v in sorted(ledger.items())
            }))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
