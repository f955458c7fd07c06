"""Exact neighbor-pair generation: the windowed distance self-join (J1).

The reference answers "neighbors of p within R in the current window" with an
in-heap M-tree range query per point (/root/reference/src/core/mtree/MTree.java:413-415).
The Spark-native equivalent is a *banded blockwise self-join*:

  * two points can ever share a window iff their slides differ by < W/S
    (see operators/windows.py), so partition the stream into blocks of
    W/S consecutive slides (= W consecutive ids);
  * co-windowed pairs live in the same or adjacent blocks, so fan each
    block's points out to (own block as "home") and (previous block as
    "guest") — a 2x duplication, independent of n;
  * per block, compute pairwise Euclidean distances for <= 2W points in one
    Arrow batch with chunked NumPy matrix math (no per-row Python), emit
    pairs with dist <= R, both directions.

Total work is O(n * W * d / block) spread over n/W independent tasks —
linear in n and embarrassingly parallel, which is what makes the two-cluster
scaling criterion attainable (the reference is single-threaded;
/root/reference/src/Executor.java:112-114).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DetectorConfig

PAIR_SCHEMA = "i long, j long, slide_i long, slide_j long"

# Chunk of left-hand rows per distance-matrix block: bounds peak memory at
# CHUNK * 2W doubles regardless of window size.
CHUNK = 1024


def _pairwise_emit(
    X: np.ndarray,
    ids: np.ndarray,
    slides: np.ndarray,
    home: np.ndarray,
    r2: float,
    max_slide_gap: int,
) -> pd.DataFrame:
    """Emit neighbor pairs (both directions) for one block's home+guest rows."""
    sq = np.einsum("ij,ij->i", X, X)
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    home_idx = np.flatnonzero(home)
    for start in range(0, len(home_idx), CHUNK):
        rows = home_idx[start : start + CHUNK]
        # squared distances rows x all, via ||a||^2 + ||b||^2 - 2ab
        d2 = sq[rows, None] + sq[None, :] - 2.0 * (X[rows] @ X.T)
        mask = d2 <= r2
        # p must be home (rows are), q strictly later, slide gap < W/S
        mask &= ids[None, :] > ids[rows, None]
        mask &= (slides[None, :] - slides[rows, None]) <= max_slide_gap
        pi, qj = np.nonzero(mask)
        out_i.append(rows[pi])
        out_j.append(qj)
    if out_i:
        ii = np.concatenate(out_i)
        jj = np.concatenate(out_j)
    else:
        ii = np.empty(0, dtype=np.int64)
        jj = ii
    return pd.DataFrame(
        {
            "i": np.concatenate([ids[ii], ids[jj]]),
            "j": np.concatenate([ids[jj], ids[ii]]),
            "slide_i": np.concatenate([slides[ii], slides[jj]]),
            "slide_j": np.concatenate([slides[jj], slides[ii]]),
        }
    )


COUNT_SCHEMA = "i long, slide_i long, slide_j long, c long, c_arr long"


def _counts_emit(
    X: np.ndarray,
    ids: np.ndarray,
    slides: np.ndarray,
    home: np.ndarray,
    r2: float,
    max_slide_gap: int,
) -> list[tuple[np.ndarray, ...]]:
    """Per-point neighbor counts binned by the neighbor's slide.

    The downstream aggregations (A1/A2: count_after / preceding-neighbor
    counts) only consume counts per (owner, owner_slide, neighbor_slide) —
    never the pair identities — so emitting the ~(2*ws - 1) count bins per
    point instead of the O(W) raw pairs cuts the shuffle by ~W/ws (100x at
    W=400 on dense data). This is SURVEY.md section 7 hard part (a) taken
    to its conclusion.

    Ownership rule (each co-window pair counted once per owner):
      * home rows count neighbors among ALL block rows (home + guest);
      * guest rows count neighbors among HOME rows only (their guest-block
        pairs are home-home in the next block's group).
    ``c_arr`` bins the subset with neighbor id < owner id (arrival-moment
    counts, /root/reference/src/algorithms/MCOD.java:302-317).

    Returns a list of (i, slide_i, slide_j, c, c_arr) ndarray tuples — the
    caller concatenates ONCE per partition and emits one Arrow batch.
    Building a pandas DataFrame per W-sized block (2,500 of them per 1M
    points) was ~2/3 of the kernel's Python time, and the per-block
    allocation churn is exactly the concurrent-allocation pattern this
    guest anti-scales on (BENCH.md round-3 allocator forensics).
    """
    n = len(ids)
    # Bin counts via ONE padded row-cumsum instead of per-bin mask scans:
    # rows arrive sorted by id, and slide = (id-1)//S + 1 is monotone in
    # id, so the columns belonging to neighbor-slide sj form a CONTIGUOUS
    # range [lo(sj), hi(sj)) — each bin is then a difference of two
    # cumsum gathers. The former formulation re-scanned the full boolean
    # matrix 4x per bin (28 passes at ws=4); this one touches it twice
    # (one cumsum per home/all variant), which matters because these
    # masks, not the BLAS distances, dominated the kernel's memory
    # traffic (BENCH.md round-3 forensics).
    order = np.argsort(ids, kind="stable")
    if not np.array_equal(order, np.arange(n)):
        X, ids, slides, home = X[order], ids[order], slides[order], home[order]
    sq = np.einsum("ij,ij->i", X, X)
    n_bins = 2 * max_slide_gap + 1
    out: list[tuple[np.ndarray, ...]] = []
    # column boundaries per bin offset: for row slide si, bin b covers
    # sj = si + b - max_gap; with ids (hence slides) ascending, columns
    # with slide == sj are slides[lo:hi]
    bin_offsets = np.arange(n_bins) - max_slide_gap
    # first position of each row's own id (strict ids[j] < ids[i] bound —
    # NOT the row position: duplicate ids must exclude each other)
    for start in range(0, n, CHUNK):
        rows = np.arange(start, min(start + CHUNK, n))
        m = len(rows)
        d2 = sq[rows, None] + sq[None, :] - 2.0 * (X[rows] @ X.T)
        msk = d2 <= r2
        msk[np.arange(m), rows] = False  # no self-pairs
        cs_all = np.zeros((m, n + 1), dtype=np.int32)
        np.cumsum(msk, axis=1, out=cs_all[:, 1:], dtype=np.int32)
        np.logical_and(msk, home[None, :], out=msk)
        cs_home = np.zeros((m, n + 1), dtype=np.int32)
        np.cumsum(msk, axis=1, out=cs_home[:, 1:], dtype=np.int32)
        # guest rows count HOME neighbors only (their guest-guest pairs
        # are home-home in the next block's group)
        cs = np.where(home[rows, None], cs_all, cs_home)
        fp = np.searchsorted(ids, ids[rows], side="left")
        rr = np.arange(m)
        c = np.empty((m, n_bins), dtype=np.int64)
        c_arr = np.empty((m, n_bins), dtype=np.int64)
        for b in range(n_bins):
            sj = slides[rows] + bin_offsets[b]
            lo = np.searchsorted(slides, sj, side="left")
            hi = np.searchsorted(slides, sj, side="right")
            c[:, b] = cs[rr, hi] - cs[rr, lo]
            c_arr[:, b] = cs[rr, np.minimum(hi, fp)] - cs[rr, np.minimum(lo, fp)]
        ri, bi = np.nonzero(c)
        out.append(
            (
                ids[rows[ri]],
                slides[rows[ri]],
                slides[rows[ri]] + (bi - max_slide_gap),
                c[ri, bi],
                c_arr[ri, bi],
            )
        )
    return out


def exact_neighbor_counts(
    points_with_slide: DataFrame, cfg: DetectorConfig
) -> DataFrame:
    """Per-(point, neighbor-slide) neighbor counts — the exact detector's
    scalable aggregate input. Output: (i, slide_i, slide_j, c, c_arr).

    Same banded block layout as ``exact_neighbor_pairs`` (2x fan-out,
    <= 2W points per task), but each task emits O(points x ws) count rows
    instead of O(points x W) pairs.
    """
    ws = cfg.ws
    r2 = float(cfg.r) * float(cfg.r)
    max_gap = ws - 1

    block = ((F.col("slide") - 1) / F.lit(ws)).cast("long")
    base = points_with_slide.select("id", "features", "slide")
    fanned = base.withColumn("g", block).withColumn("is_home", F.lit(True)).unionByName(
        base.withColumn("g", block - 1)
        .withColumn("is_home", F.lit(False))
        .where(F.col("g") >= 0)
    )

    # partition-scan (mapInArrow over repartition+sort), not per-group
    # applyInPandas: a long stream has thousands of W-sized blocks and the
    # per-group Arrow round-trip overhead dominates the (small) per-block
    # math — one batch per partition amortizes it (same pattern as the
    # LSH counts kernel and the MinHash band kernel). mapInArrow rather
    # than mapInPandas because the feature column reads as ONE flat
    # float64 buffer reshaped (n, dim) — the pandas path materializes a
    # per-row object ndarray (300k tiny arrays) that costs more than the
    # distance math itself (measured ~8 s vs ~2 s at 300k x 12d).
    def emit(batches):
        import pyarrow as pa

        chunks = [b for b in batches if b.num_rows]
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        if tbl.num_rows < 2:
            return
        g_arr = tbl.column("g").to_numpy(zero_copy_only=False)
        id_arr = tbl.column("id").to_numpy(zero_copy_only=False)
        slides_all = tbl.column("slide").to_numpy(zero_copy_only=False)
        home_all = tbl.column("is_home").to_numpy(zero_copy_only=False)
        feats = tbl.column("features").combine_chunks()
        flat = feats.flatten().to_numpy(zero_copy_only=False)
        offs = feats.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all():
            X_all = flat.reshape(len(widths), int(widths[0])).astype(
                np.float64, copy=False
            )
        else:  # ragged features: fall back to per-row assembly
            X_all = np.stack(
                [flat[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]
            ).astype(np.float64)
        order = np.lexsort((id_arr, g_arr))
        g_arr, id_arr = g_arr[order], id_arr[order]
        slides_all = slides_all[order]
        home_all = home_all[order]
        X_all = X_all[order]
        bounds = np.flatnonzero(np.concatenate(([True], g_arr[1:] != g_arr[:-1])))
        bounds = np.append(bounds, len(g_arr))
        parts: list[tuple[np.ndarray, ...]] = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            if b1 - b0 < 2:
                continue
            parts.extend(
                _counts_emit(
                    X_all[b0:b1], id_arr[b0:b1], slides_all[b0:b1],
                    home_all[b0:b1], r2, max_gap,
                )
            )
        if parts:
            cols = [np.concatenate([p[k] for p in parts]) for k in range(5)]
            yield pa.RecordBatch.from_pydict(
                {
                    "i": pa.array(cols[0], type=pa.int64()),
                    "slide_i": pa.array(cols[1], type=pa.int64()),
                    "slide_j": pa.array(cols[2], type=pa.int64()),
                    "c": pa.array(cols[3], type=pa.int64()),
                    "c_arr": pa.array(cols[4], type=pa.int64()),
                }
            )

    sp = int(
        points_with_slide.sparkSession.conf.get("spark.sql.shuffle.partitions", "64")
    )
    return (
        fanned.repartition(sp, "g")
        .sortWithinPartitions("g", "id")
        .mapInArrow(emit, COUNT_SCHEMA)
    )


def pairs_to_counts(pairs: DataFrame) -> DataFrame:
    """Adapt a raw neighbor-pair table (i, j, slide_i, slide_j — both
    directions) to the count shape the detector consumes."""
    return pairs.groupBy("i", "slide_i", "slide_j").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.when(F.col("j") < F.col("i"), 1).otherwise(0)).alias("c_arr"),
    )


def exact_neighbor_pairs(points_with_slide: DataFrame, cfg: DetectorConfig) -> DataFrame:
    """All ordered pairs (i, j) with dist <= R that ever share a window.

    Input: (id, features, slide). Output: (i, j, slide_i, slide_j), both
    (p,q) and (q,p) for each unordered neighbor pair — downstream
    aggregations are per neighbor-list owner ``i``.
    """
    ws = cfg.ws
    r2 = float(cfg.r) * float(cfg.r)
    max_gap = ws - 1

    block = ((F.col("slide") - 1) / F.lit(ws)).cast("long")
    base = points_with_slide.select("id", "features", "slide")
    fanned = base.withColumn("g", block).withColumn("is_home", F.lit(True)).unionByName(
        base.withColumn("g", block - 1)
        .withColumn("is_home", F.lit(False))
        .where(F.col("g") >= 0)
    )

    empty = pd.DataFrame(
        {
            "i": pd.Series(dtype="int64"),
            "j": pd.Series(dtype="int64"),
            "slide_i": pd.Series(dtype="int64"),
            "slide_j": pd.Series(dtype="int64"),
        }
    )

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return empty
        order = np.argsort(pdf["id"].to_numpy())
        ids = pdf["id"].to_numpy()[order]
        slides = pdf["slide"].to_numpy()[order]
        home = pdf["is_home"].to_numpy()[order]
        X = np.stack(pdf["features"].to_numpy()[order]).astype(np.float64)
        return _pairwise_emit(X, ids, slides, home, r2, max_gap)

    return fanned.groupBy("g").applyInPandas(emit, PAIR_SCHEMA)
