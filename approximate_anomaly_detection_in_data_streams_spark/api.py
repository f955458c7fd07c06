"""Top-level detector API: algorithm dispatch (the reference's CLI surface).

Maps the reference's four algorithms (/root/reference/src/Executor.java:98-110)
onto pair-generation strategies feeding one shared classification pipeline:

  mcod           -> exact banded blockwise self-join (operators/pairs.py)
  lshod          -> seeded LSH bucket equi-join, 4 hashes / 10 tables / w=R
                    (/root/reference/src/Executor.java:102-105)
  approx_mclshod -> seeded LSH, 5 hashes / 10 tables / w=3R/2
                    (/root/reference/src/Executor.java:106-109)
  approx_mcod    -> exact pairs thinned by a seeded deterministic pair sample
                    with rescaled counts — our bounded-work analog of the
                    reference's PD cap + approximation radius
                    (/root/reference/src/algorithms/ApproxMCOD.java:40-72);
                    the reference's own variant is nondeterministic
                    (unseeded Random, ApproxMCOD.java:49), so parity is
                    recall-vs-exact, not bitwise (SURVEY.md section 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DetectorConfig
from .operators.detector import DetectionResult, detect
from .operators.lsh import lsh_neighbor_pairs
from .operators.pairs import exact_neighbor_pairs
from .operators.windows import with_slide


def sampled_neighbor_pairs(
    points_with_slide: DataFrame, cfg: DetectorConfig, fraction: float
) -> DataFrame:
    """Deterministically sample unordered neighbor pairs at ``fraction``.

    The sample decision hashes the unordered pair (min(i,j), max(i,j), seed)
    so both directions of a pair survive or die together and reruns are
    bit-identical.
    """
    pairs = exact_neighbor_pairs(points_with_slide, cfg)
    bucket = F.pmod(
        F.xxhash64(
            F.least("i", "j"), F.greatest("i", "j"), F.lit(cfg.seed)
        ),
        F.lit(1_000_000),
    )
    return pairs.where(bucket < F.lit(int(fraction * 1_000_000)))


def run_detector(points: DataFrame, cfg: DetectorConfig) -> DetectionResult:
    """Dispatch by cfg.algorithm; ``points``: (id, features)."""
    pts = with_slide(points, cfg)
    algo = cfg.algorithm.lower()
    if algo == "mcod":
        pairs = None
    elif algo in ("lshod", "approx_mclshod"):
        pairs = lsh_neighbor_pairs(pts, cfg)
    elif algo == "approx_mcod":
        fraction = 0.5 if cfg.pd_limit <= 0 else min(1.0, cfg.pd_limit / cfg.w)
        pairs = sampled_neighbor_pairs(pts, cfg, fraction)
        # rescale the inlier threshold to the sampled pair density
        cfg = DetectorConfig(
            w=cfg.w,
            slide=cfg.slide,
            r=cfg.r,
            k=max(1, int(round(cfg.k * fraction))),
            algorithm=cfg.algorithm,
            pd_limit=cfg.pd_limit,
            ar_factor=cfg.ar_factor,
            num_hashes=cfg.num_hashes,
            num_tables=cfg.num_tables,
            bucket_width=cfg.bucket_width,
            seed=cfg.seed,
        )
    else:
        raise ValueError(f"unknown algorithm: {cfg.algorithm}")
    return detect(points, cfg, pairs=pairs)


def lshod_config(w: int, slide: int, r: float, k: int, seed: int = 42) -> DetectorConfig:
    """LSHOD defaults per /root/reference/src/Executor.java:102-105."""
    return DetectorConfig(
        w=w, slide=slide, r=r, k=k, algorithm="lshod",
        num_hashes=4, num_tables=10, seed=seed,
    )


def approx_mclshod_config(
    w: int, slide: int, r: float, k: int, seed: int = 42
) -> DetectorConfig:
    """ApproxMCLSHOD defaults per /root/reference/src/Executor.java:106-109."""
    return DetectorConfig(
        w=w, slide=slide, r=r, k=k, algorithm="approx_mclshod",
        num_hashes=5, num_tables=10, seed=seed,
    )
