"""Streaming execution of the windowed outlier detector.

Two layers:

  * ``SlideDetector`` — an incremental engine processing one slide-sized
    batch at a time, mirroring the reference's driver loop
    (/root/reference/src/Executor.java:112-114: ingest S points, expire,
    re-evaluate) with vectorized NumPy instead of per-point index
    maintenance. State = the current window's points + per-point lifetime
    flags; everything else is recomputed per batch (the event queue /
    micro-cluster machinery exists only to speed up single-threaded
    incrementality — SURVEY.md section 4).
  * ``run_structured_stream`` — Structured Streaming wrapper over the
    distributed keyed dataflow (streaming/keyed.py): state lives in
    Spark's state store via ``applyInPandasWithState``, one SlideDetector
    per key, no driver-side collect anywhere in the plan.

Verified equivalent to the batch detector (tests/test_streaming.py):
same pure-outlier set, same lifetime stats.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import DetectorConfig


@dataclass
class _PointState:
    ever_inlier: bool = False
    ever_outlier: bool = False


@dataclass
class SlideDetector:
    """Incremental count-based sliding-window distance outlier detector."""

    cfg: DetectorConfig
    # window arrays (id-ascending)
    _ids: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.int64))
    _slides: np.ndarray = field(default_factory=lambda: np.empty(0, dtype=np.int64))
    _X: np.ndarray | None = None
    _state: dict[int, _PointState] = field(default_factory=dict)
    _outliers: set[int] = field(default_factory=set)
    _batch: int = 0
    _finalized: dict[str, int] = field(
        default_factory=lambda: {"only_inlier": 0, "only_outlier": 0, "both": 0}
    )
    # per-batch diagnostics (the reference's DIAG prints, K3 in SURVEY.md:
    # /root/reference/src/algorithms/MCOD.java:320-332): one dict per
    # processed batch with window population and work counters
    diagnostics: list[dict] = field(default_factory=list)

    def _allowed(self, X: np.ndarray) -> np.ndarray | None:
        """Candidate mask hook: (n, n) bool of pairs the detector may count
        as neighbors, or None for the exact all-pairs semantics (MCOD).
        LSHSlideDetector overrides with bucket-collision candidates."""
        return None

    def _counts(self, X: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """Neighbor counts (dist <= R) of each row among all rows, self
        excluded — one blocked pairwise pass per batch."""
        if len(ids) == 0:
            return np.empty(0, dtype=np.int64)
        r2 = float(self.cfg.r) ** 2
        sq = np.einsum("ij,ij->i", X, X)
        out = np.empty(len(ids), dtype=np.int64)
        allowed = self._allowed(X)
        chunk = 2048
        for s in range(0, len(ids), chunk):
            d2 = sq[s : s + chunk, None] + sq[None, :] - 2.0 * (X[s : s + chunk] @ X.T)
            m = d2 <= r2
            if allowed is not None:
                m &= allowed[s : s + chunk]
            m[np.arange(m.shape[0]), np.arange(s, s + m.shape[0])] = False
            out[s : s + chunk] = m.sum(axis=1)
        return out

    def _mark(self, ids: np.ndarray, counts: np.ndarray, end_eval: bool) -> None:
        k = self.cfg.k
        for pid, cnt in zip(ids.tolist(), counts.tolist()):
            st = self._state[pid]
            if cnt >= k:
                if end_eval:
                    st.ever_inlier = True
            else:
                st.ever_outlier = True

    def _finalize(self, pid: int) -> None:
        st = self._state.pop(pid)
        if st.ever_inlier and not st.ever_outlier:
            self._finalized["only_inlier"] += 1
        elif st.ever_outlier and not st.ever_inlier:
            self._finalized["only_outlier"] += 1
        else:
            self._finalized["both"] += 1
        if not st.ever_inlier:
            self._outliers.add(pid)

    def process_batch(self, ids: np.ndarray, X: np.ndarray) -> None:
        """Ingest one slide-sized batch (the reference's
        ProcessNewStreamObjects, /root/reference/src/algorithms/MCOD.java:302-317):
        expire, pre-re-evaluate survivors, arrival-evaluate new points,
        end-evaluate the full window."""
        cfg = self.cfg
        self._batch += 1
        b = self._batch
        ids = np.asarray(ids, dtype=np.int64)
        X = np.asarray(X, dtype=np.float64)

        # expiry: window after this batch holds slides [b-ws+1 .. b]
        min_slide = b - cfg.ws + 1
        if self._X is not None and len(self._ids):
            expired = self._slides < min_slide
            for pid in self._ids[expired].tolist():
                self._finalize(pid)
            keep = ~expired
            self._ids = self._ids[keep]
            self._slides = self._slides[keep]
            self._X = self._X[keep]

            # pre re-evaluation of survivors (event-queue drain analog,
            # /root/reference/src/algorithms/MCOD.java:228-261) — only
            # meaningful when something expired
            if b > 1:
                counts = self._counts(self._X, self._ids)
                self._mark(self._ids, counts, end_eval=False)

        # arrival evaluations: new point vs survivors + earlier same-batch
        for pid in ids.tolist():
            self._state[pid] = _PointState()
        if self._X is None or not len(self._ids):
            win_X, win_ids = X, ids
        else:
            win_X = np.vstack([self._X, X])
            win_ids = np.concatenate([self._ids, ids])
        n_old = len(win_ids) - len(ids)
        sq = np.einsum("ij,ij->i", win_X, win_X)
        r2 = float(cfg.r) ** 2
        k = cfg.k
        allowed = self._allowed(win_X)
        for i in range(len(ids)):
            gi = n_old + i
            d2 = sq[:gi] + sq[gi] - 2.0 * (win_X[:gi] @ win_X[gi])
            ok = d2 <= r2
            if allowed is not None:
                ok &= allowed[gi, :gi]
            cnt = int(ok.sum())
            if cnt < k:
                self._state[int(ids[i])].ever_outlier = True

        # end evaluations for the whole window
        self._ids = win_ids
        self._slides = np.concatenate(
            [self._slides, np.full(len(ids), b, dtype=np.int64)]
        ) if n_old else np.full(len(ids), b, dtype=np.int64)
        self._X = win_X
        counts = self._counts(self._X, self._ids)
        self._mark(self._ids, counts, end_eval=True)
        self.diagnostics.append(
            {
                "batch": b,
                "window_size": int(len(self._ids)),
                "n_new": int(len(ids)),
                "n_outliers_recorded": len(self._outliers),
            }
        )

    def finish(self) -> dict:
        """Stream exhausted: final flush (W4,
        /root/reference/src/core/OutlierDetector.java:43-47)."""
        for pid in self._ids.tolist():
            self._finalize(pid)
        self._ids = np.empty(0, dtype=np.int64)
        self._slides = np.empty(0, dtype=np.int64)
        self._X = None
        return {
            "outliers": sorted(self._outliers),
            "n_only_inlier": self._finalized["only_inlier"],
            "n_only_outlier": self._finalized["only_outlier"],
            "n_both_inlier_outlier": self._finalized["both"],
        }


@dataclass
class LSHSlideDetector(SlideDetector):
    """LSHOD variant of the incremental engine: neighbor counts are
    restricted to pairs that collide in >= 1 of the L seeded p-stable LSH
    tables (the reference's hash-table candidate union,
    /root/reference/src/algorithms/LSHOD.java:85-103,
    /root/reference/src/core/lsh/LSHIndex.java:33-44), with the exact
    distance predicate applied to candidates only. Projections come from
    the SAME ``make_projections(cfg, dim)`` seed as the batch path, and
    each hash's dot product accumulates left-to-right over dims — the
    identical IEEE op order as the batch path's JVM fold — so bucket keys
    (and therefore the outlier set) are bit-equivalent to the batch LSHOD
    detector (tests/test_streaming.py::test_lshod_slide_loop_matches_batch).
    """

    dim: int = 1

    def __post_init__(self) -> None:
        from ..operators.lsh import make_projections

        self._A, self._b = make_projections(self.cfg, self.dim)
        self._w = float(self.cfg.lsh_bucket_width)

    def _allowed(self, X: np.ndarray) -> np.ndarray | None:
        n = len(X)
        L, m, d = self._A.shape
        keys = np.empty((L, m, n), dtype=np.float64)
        for t in range(L):
            for i in range(m):
                acc = X[:, 0] * self._A[t, i, 0]
                for j in range(1, d):
                    acc = acc + X[:, j] * self._A[t, i, j]
                keys[t, i] = np.floor((acc + self._b[t, i]) / self._w)
        coll = np.zeros((n, n), dtype=bool)
        same = np.empty((n, n), dtype=bool)
        for t in range(L):
            kk = keys[t, 0]
            np.equal(kk[:, None], kk[None, :], out=same)
            for i in range(1, m):
                kk = keys[t, i]
                same &= kk[:, None] == kk[None, :]
            coll |= same
        return coll


def make_slide_detector(cfg: DetectorConfig, dim: int) -> SlideDetector:
    """Algorithm-routed incremental engine (mcod exact | lshod bucketed)."""
    if cfg.algorithm == "lshod":
        return LSHSlideDetector(cfg, dim=dim)
    return SlideDetector(cfg)


def run_slide_loop(ids: np.ndarray, X: np.ndarray, cfg: DetectorConfig) -> dict:
    """Drive the incremental engine over a finite stream, slide by slide
    (the reference's Executor main loop); algorithm-routed via
    ``make_slide_detector``."""
    det = make_slide_detector(cfg, int(np.asarray(X).shape[1]))
    n = len(ids)
    for start in range(0, n, cfg.slide):
        det.process_batch(ids[start : start + cfg.slide], X[start : start + cfg.slide])
    return det.finish()


def run_structured_stream(
    spark,
    input_dir: str,
    cfg: DetectorConfig,
    checkpoint_dir: str,
    dim: int,
) -> dict:
    """Structured Streaming driver for a single unkeyed point stream.

    Thin wrapper over the DISTRIBUTED keyed dataflow (streaming/keyed.py,
    ``applyInPandasWithState`` holding one SlideDetector per key in the
    state store — no ``collect()`` anywhere in the plan): the unkeyed
    stream becomes one key, a sentinel file (id = -n_total, derived from a
    batch scan of the same directory) marks the finite stream's end, and
    the keyed flush returns the same result dict the old driver-side loop
    produced. ``dim`` is kept for signature compatibility; the schema
    carries it.
    """
    import json as _json
    import os

    from pyspark.sql import functions as F

    from .keyed import INPUT_SCHEMA, run_keyed_structured_stream

    point_schema = "id long, features array<double>"
    # cfg.n_total skips the one-time directory scan; the agg fallback runs
    # once before the stream starts (never per micro-batch)
    n_total = cfg.n_total or (
        spark.read.schema(point_schema).json(input_dir).agg(F.max("id")).first()[0]
    )
    staged = os.path.join(checkpoint_dir, "_keyed_input")
    os.makedirs(staged, exist_ok=True)
    (
        spark.read.schema(point_schema)
        .json(input_dir)
        .select(F.lit("_").alias("key"), "id", "features")
        .write.mode("overwrite")
        .json(staged)
    )
    with open(os.path.join(staged, "zz_sentinel.json"), "w") as fh:
        fh.write(
            _json.dumps({"key": "_", "id": -int(n_total), "features": []}) + "\n"
        )
    res = run_keyed_structured_stream(
        spark, staged, cfg, os.path.join(checkpoint_dir, "ck")
    )
    return res["_"]
