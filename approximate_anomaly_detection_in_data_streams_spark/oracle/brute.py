"""Brute-force O(n^2)-per-window oracle for the MCOD semantics.

Independent reimplementation used only by tests: literally materializes every
evaluation window and counts neighbors with a full pairwise-distance matrix,
mirroring the reference's processing loop
(/root/reference/src/Executor.java:112-114 batches of S;
window slide + expiry before ingestion,
/root/reference/src/algorithms/MCOD.java:302-317; classification rule
count(dist<=R) >= k, /root/reference/src/algorithms/MCOD.java:69-78;
pure-outlier recording, /root/reference/src/core/OutlierDetector.java:43-62).
"""

from __future__ import annotations

import numpy as np


def _dist2(X: np.ndarray, Y: np.ndarray) -> np.ndarray:
    sx = np.einsum("ij,ij->i", X, X)
    sy = np.einsum("ij,ij->i", Y, Y)
    return np.maximum(sx[:, None] + sy[None, :] - 2.0 * (X @ Y.T), 0.0)


def mcod_brute(
    X: np.ndarray, w: int, slide: int, r: float, k: int
) -> dict:
    """Run the sliding-window outlier detector by brute force.

    Returns dict with: ``outliers`` (sorted 1-based ids, never inlier),
    ``ever_inlier``/``ever_outlier`` boolean arrays, and the lifetime
    counter stats.
    """
    assert w % slide == 0
    X = np.asarray(X, dtype=np.float64)
    if X.ndim == 1:
        X = X[:, None]
    n = len(X)
    ws = w // slide
    n_b = (n + slide - 1) // slide
    r2 = r * r

    ever_inlier = np.zeros(n, dtype=bool)
    ever_outlier = np.zeros(n, dtype=bool)

    for b in range(1, n_b + 1):
        lo_slide = max(1, b - ws + 1)
        lo = (lo_slide - 1) * slide  # 0-based inclusive
        hi = min(b * slide, n)  # 0-based exclusive
        prev_hi = min((b - 1) * slide, n)

        # pre moment: window after expiry, before batch b ingestion
        if prev_hi > lo:
            Wn = X[lo:prev_hi]
            cnt = (_dist2(Wn, Wn) <= r2).sum(axis=1) - 1
            out = cnt < k
            ever_outlier[lo:prev_hi] |= out
            # (pre-inlier implies end-inlier; recorded for completeness)
            ever_inlier[lo:prev_hi] |= ~out

        # arrival moments: each new point vs window-so-far including itself
        for p in range(prev_hi, hi):
            d2 = _dist2(X[p : p + 1], X[lo : p + 1])[0]
            cnt = int((d2 <= r2).sum()) - 1  # exclude self
            if cnt >= k:
                ever_inlier[p] = True
            else:
                ever_outlier[p] = True

        # end moment: full window after ingestion
        Wn = X[lo:hi]
        cnt = (_dist2(Wn, Wn) <= r2).sum(axis=1) - 1
        inl = cnt >= k
        ever_inlier[lo:hi] |= inl
        ever_outlier[lo:hi] |= ~inl

    outliers = np.flatnonzero(~ever_inlier) + 1
    only_in = ever_inlier & ~ever_outlier
    only_out = ~ever_inlier & ever_outlier
    both = ever_inlier & ever_outlier
    return {
        "outliers": outliers.tolist(),
        "ever_inlier": ever_inlier,
        "ever_outlier": ever_outlier,
        "n_only_inlier": int(only_in.sum()),
        "n_only_outlier": int(only_out.sum()),
        "n_both_inlier_outlier": int(both.sum()),
        "n_points": n,
    }
