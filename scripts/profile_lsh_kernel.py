"""Standalone micro-profile of the bucket-exploded LSH counts kernel
(the CAPPED path, operators/lsh.py::_lsh_counts_bucketed — the uncapped
production path is the banded block kernel, which this script's round-4
measurements motivated: groups here are tiny and 77% of band-surviving
candidate pairs were duplicate-table copies).

Rebuilds one shuffle partition's worth of kernel input directly in NumPy
(same seeded projections, same fan-out) from events.parquet, then times
the phases — pair expansion, band/dist filters, min-table dedupe,
bincount — so kernel optimization is driven by measurement instead of
stage-level guesses.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from approximate_anomaly_detection_in_data_streams_spark.config import DetectorConfig
from approximate_anomaly_detection_in_data_streams_spark.operators.lsh import (
    make_projections,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PARTS = 64


def main() -> None:
    cfg = DetectorConfig(w=400, slide=100, r=15.0, k=10, algorithm="lshod", dim=1)
    L, m = cfg.num_tables, cfg.num_hashes
    ws = cfg.ws
    vals = pq.read_table(f"{SF_DIR}/events.parquet", columns=["value"])[
        "value"
    ].to_numpy(zero_copy_only=False)
    n = len(vals)
    ids = np.arange(1, n + 1, dtype=np.int64)
    slides = (ids - 1) // cfg.slide + 1
    g = (slides - 1) // ws

    A, b = make_projections(cfg, 1)
    width = float(cfg.lsh_bucket_width)
    hk = np.floor(
        (vals[:, None] * A[:, :, 0].reshape(1, L * m) + b.reshape(1, L * m)) / width
    ).astype(np.int64)

    # fan out: per (point, table) home + guest rows
    t_col = np.repeat(np.arange(L, dtype=np.int64)[None, :], n, axis=0).ravel()
    idx = np.repeat(np.arange(n), L)
    key = hk[idx, t_col * m]  # first component proxies the shuffle key hash
    rows = dict(
        id=ids[idx], slide=slides[idx], g=g[idx], t=t_col, key=key, home=np.ones(len(idx), bool)
    )
    guest_mask = rows["g"] >= 1
    fan = {
        k: np.concatenate([v, v[guest_mask] if k != "g" else (v[guest_mask] - 1)])
        for k, v in rows.items()
    }
    fan["home"] = np.concatenate(
        [np.ones(len(idx), bool), np.zeros(int(guest_mask.sum()), bool)]
    )
    feats = vals[np.concatenate([idx, idx[guest_mask]])].reshape(-1, 1)
    hkm = hk[np.concatenate([idx, idx[guest_mask]])]
    N = len(fan["id"])
    print(f"n={n} fanned={N}")

    # one partition by hash of (t, key, g)
    part = (fan["t"] * 1000003 + fan["key"] * 31 + fan["g"]) % N_PARTS == 0
    sel = np.flatnonzero(part)
    print(f"partition rows: {len(sel)}")

    t_arr = fan["t"][sel]
    g_arr = fan["g"][sel]
    id_arr0 = fan["id"][sel]
    slide_arr0 = fan["slide"][sel]
    home_arr0 = fan["home"][sel]
    feats_all0 = feats[sel]
    hk_all0 = hkm[sel]

    t0 = time.perf_counter()
    K_own = hk_all0[np.arange(len(t_arr))[:, None], (t_arr * m)[:, None] + np.arange(m)]
    t1 = time.perf_counter()
    order = np.lexsort(
        (id_arr0, *(K_own[:, j] for j in range(m - 1, -1, -1)), g_arr, t_arr)
    )
    t2 = time.perf_counter()
    t_s, g_s, K_s = t_arr[order], g_arr[order], K_own[order]
    ids_all = id_arr0[order]
    slides_all = slide_arr0[order]
    home_all = home_arr0[order]
    feats_all = feats_all0[order]
    hk_all = hk_all0[order]
    changed = (
        (t_s[1:] != t_s[:-1])
        | (g_s[1:] != g_s[:-1])
        | (K_s[1:] != K_s[:-1]).any(axis=1)
    )
    bounds = np.flatnonzero(np.concatenate(([True], changed)))
    bounds = np.append(bounds, len(t_s))
    t3 = time.perf_counter()
    sizes = np.diff(bounds)
    print(
        f"gather {t1-t0:.3f}s lexsort {t2-t1:.3f}s reorder+bounds {t3-t2:.3f}s; "
        f"groups={len(sizes)} max={sizes.max()} mean={sizes.mean():.1f} "
        f"p99={np.percentile(sizes, 99):.0f} sum_n2={int((sizes.astype(np.int64)**2).sum())}"
    )

    r2 = float(cfg.r) ** 2
    max_gap = ws - 1
    n_bins = 2 * max_gap + 1
    N = len(t_s)
    t4 = time.perf_counter()
    grp = np.cumsum(np.concatenate(([0], changed.astype(np.int64))))
    rep = sizes[grp]
    g_start = bounds[:-1][grp]
    cnt = np.zeros(N * n_bins, dtype=np.int64)
    cnt_arr = np.zeros(N * n_bins, dtype=np.int64)
    pair_cum = np.concatenate(([0], np.cumsum(sizes.astype(np.int64) ** 2)))
    ga = 0
    n_groups = len(sizes)
    while ga < n_groups:
        gb = int(np.searchsorted(pair_cum, pair_cum[ga] + 8_000_000, side="right")) - 1
        gb = max(gb, ga + 1)
        r0, r1 = int(bounds[ga]), int(bounds[gb])
        ga = gb
        rep_c = rep[r0:r1]
        T = int(rep_c.sum())
        if T == 0:
            continue
        tg = time.perf_counter()
        i_idx = np.repeat(np.arange(r0, r1, dtype=np.int64), rep_c)
        row_pair_start = np.concatenate(([0], np.cumsum(rep_c, dtype=np.int64)[:-1]))
        j_idx = (
            np.arange(T, dtype=np.int64)
            - np.repeat(row_pair_start, rep_c)
            + np.repeat(g_start[r0:r1], rep_c)
        )
        tA = time.perf_counter()
        keep = (i_idx != j_idx) & (home_all[i_idx] | home_all[j_idx])
        si = slides_all[i_idx]
        sj = slides_all[j_idx]
        np.logical_and(keep, np.abs(si - sj) <= max_gap, out=keep)
        i_idx, j_idx = i_idx[keep], j_idx[keep]
        si, sj = si[keep], sj[keep]
        tB = time.perf_counter()
        diff = feats_all[i_idx, 0] - feats_all[j_idx, 0]
        D2 = diff * diff
        keep = D2 <= r2
        i_idx, j_idx = i_idx[keep], j_idx[keep]
        si, sj = si[keep], sj[keep]
        tC = time.perf_counter()
        tpair = t_s[i_idx]
        t_max = int(tpair.max(initial=0))
        coll = np.zeros(len(i_idx), dtype=bool)
        for tp in range(t_max):
            eq = tpair > tp
            base = tp * m
            for jj in range(m):
                eq &= hk_all[i_idx, base + jj] == hk_all[j_idx, base + jj]
            coll |= eq
        surv = ~coll
        tD = time.perf_counter()
        i_s = i_idx[surv]
        key = i_s * n_bins + (sj[surv] - si[surv] + max_gap)
        cnt += np.bincount(key, minlength=N * n_bins)
        arr_mask = ids_all[j_idx[surv]] < ids_all[i_s]
        cnt_arr += np.bincount(key[arr_mask], minlength=N * n_bins)
        tE = time.perf_counter()
        print(
            f"  chunk T={T} band_surv={len(si)} dist_surv={len(i_idx)} "
            f"dedupe_surv={int(surv.sum())} | gen {tA-tg:.3f} band {tB-tA:.3f} "
            f"dist {tC-tB:.3f} dedupe {tD-tC:.3f} bin {tE-tD:.3f}"
        )
    C = cnt.reshape(N, n_bins)
    ri, bi = np.nonzero(C)
    t5 = time.perf_counter()
    print(f"vectorized kernel total {t5-t4:.3f}s emit_rows={len(ri)}")


if __name__ == "__main__":
    main()
