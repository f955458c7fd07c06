"""Top-level detector API: algorithm dispatch (the reference's CLI surface).

Maps the reference's four algorithms (/root/reference/src/Executor.java:98-110)
onto pair-generation strategies feeding one shared classification pipeline:

  mcod           -> exact banded blockwise self-join (operators/pairs.py)
  lshod          -> seeded LSH bucket equi-join, 4 hashes / 10 tables / w=R
                    (/root/reference/src/Executor.java:102-105)
  approx_mclshod -> seeded LSH, 5 hashes / 10 tables / w=3R/2
                    (/root/reference/src/Executor.java:106-109)
  approx_mcod    -> per-window bounded active set with seeded safe-inlier-
                    only eviction plus the ar approximation radius — the
                    order-free distributed analog of the reference's PD cap
                    (/root/reference/src/algorithms/ApproxMCOD.java:40-72,
                    159-173,205-224; operators/approx_mcod.py). The
                    faithful order-dependent mechanism (micro-clusters,
                    event queue, sequential eviction) is
                    streaming/mcod_engine.py; the reference's own variant
                    is nondeterministic (unseeded Random,
                    ApproxMCOD.java:49), so parity is recall-vs-exact, not
                    bitwise (SURVEY.md section 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .config import DetectorConfig
from .operators.approx_mcod import approx_mcod_detect
from .operators.detector import DetectionResult, detect
from .operators.lsh import lsh_neighbor_counts
from .operators.windows import with_slide


def run_detector(points: DataFrame, cfg: DetectorConfig) -> DetectionResult:
    """Dispatch by cfg.algorithm; ``points``: (id, features)."""
    algo = cfg.algorithm.lower()
    if algo == "mcod":
        return detect(points, cfg)
    if algo in ("lshod", "approx_mclshod"):
        pts = with_slide(points, cfg)
        return detect(points, cfg, slide_counts=lsh_neighbor_counts(pts, cfg))
    if algo == "approx_mcod":
        return approx_mcod_detect(points, cfg)
    raise ValueError(f"unknown algorithm: {cfg.algorithm}")


def lshod_config(
    w: int, slide: int, r: float, k: int, seed: int = 42, dim: int = 0,
    n_total: int = 0,
) -> DetectorConfig:
    """LSHOD defaults per /root/reference/src/Executor.java:102-105."""
    return DetectorConfig(
        w=w, slide=slide, r=r, k=k, algorithm="lshod",
        num_hashes=4, num_tables=10, seed=seed, dim=dim, n_total=n_total,
    )


def approx_mclshod_config(
    w: int, slide: int, r: float, k: int, seed: int = 42, dim: int = 0,
    n_total: int = 0,
) -> DetectorConfig:
    """ApproxMCLSHOD defaults per /root/reference/src/Executor.java:106-109."""
    return DetectorConfig(
        w=w, slide=slide, r=r, k=k, algorithm="approx_mclshod",
        num_hashes=5, num_tables=10, seed=seed, dim=dim, n_total=n_total,
    )
