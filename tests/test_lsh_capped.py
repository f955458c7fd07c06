"""Capped-LSH semantics: the bucket_cap path must reproduce the
reference's HashSet union over CAPPED tables — a pair whose member was
evicted from its first-colliding bucket is still found at a later table
where both members survive (/root/reference/src/core/lsh/
HashTable.java:81-101, LSHIndex.java:33-44). The r3 review flagged that
the min-table dedupe used to suppress exactly those pairs; this test
pins the survivor-restricted semantics against an independent Python
replay of cap + union, and checks the pairs/counts variants agree.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from approximate_anomaly_detection_in_data_streams_spark.api import lshod_config
from approximate_anomaly_detection_in_data_streams_spark.operators.lsh import (
    lsh_neighbor_counts,
    lsh_neighbor_pairs,
    with_bucket_key_ints,
)

N, W, S, R, K = 60, 20, 5, 1.0, 3
CAP = 4


@pytest.fixture(scope="module")
def fixture(spark):
    cfg = lshod_config(W, S, R, K, dim=1, n_total=N)
    # values spread across ~a bucket width so each table's random
    # projection splits the same points DIFFERENTLY — per-table survivor
    # sets then differ and CAP=4 thins some first-colliding buckets while
    # later tables keep both members (the regime the survivor restriction
    # exists for)
    rows = [
        (i, (i - 1) // S + 1, [float((i % 11) * 0.1)]) for i in range(1, N + 1)
    ]
    pts = spark.createDataFrame(
        rows, "id long, slide long, features array<double>"
    )
    return cfg, pts, rows


def _python_capped_union(spark, cfg, pts, rows):
    """Independent replay: per-(t,key,block) cap by seeded-hash order,
    candidate = union over tables of co-surviving bucket pairs, then the
    exact slide-band + distance filters. Returns the DIRECTED pair set."""
    L, m = cfg.num_tables, cfg.num_hashes
    ws = cfg.ws
    base = with_bucket_key_ints(pts, cfg, 1).select(
        "id", "slide", "features", "hk",
        F.xxhash64("id", F.lit(cfg.seed)).alias("xx"),
    )
    recs = {r.id: r for r in base.collect()}

    def key(i: int, t: int) -> tuple:
        hk = recs[i].hk
        return tuple(hk[t * m : t * m + m])

    def blk(i: int) -> int:
        return (recs[i].slide - 1) // ws

    surv: dict[tuple, set] = {}
    for t in range(L):
        groups = defaultdict(list)
        for i in recs:
            groups[(key(i, t), blk(i))].append(i)
        for (k_, g), ids in groups.items():
            ids.sort(key=lambda i: recs[i].xx)
            surv[(t, k_, g)] = set(ids[:CAP])

    expected = set()
    suppressed_by_old_predicate = set()
    for i in recs:
        for j in recs:
            if i >= j:
                continue
            if abs(recs[i].slide - recs[j].slide) > ws - 1:
                continue
            if abs(blk(i) - blk(j)) > 1:
                continue
            d = recs[i].features[0] - recs[j].features[0]
            if d * d > float(cfg.r) ** 2:
                continue
            found = None
            first_key_collision = None
            for t in range(L):
                if key(i, t) != key(j, t):
                    continue
                if first_key_collision is None:
                    first_key_collision = t
                if i in surv[(t, key(i, t), blk(i))] and j in surv[
                    (t, key(j, t), blk(j))
                ]:
                    found = t
                    break
            if found is not None:
                expected.add((i, j))
                expected.add((j, i))
                if found != first_key_collision:
                    # the old (unrestricted) min-table predicate would have
                    # suppressed this pair at its first key collision
                    suppressed_by_old_predicate.add((i, j))
    return expected, suppressed_by_old_predicate


def test_capped_pairs_match_reference_union(spark, fixture):
    cfg, pts, rows = fixture
    expected, regression_pairs = _python_capped_union(spark, cfg, pts, rows)
    # the fixture must actually exercise the survivor restriction —
    # otherwise this test proves nothing about the capped path
    assert regression_pairs, "fixture never thins a first-colliding bucket"
    got = {
        (r.i, r.j)
        for r in lsh_neighbor_pairs(pts, cfg, bucket_cap=CAP).collect()
    }
    assert got == expected


def test_capped_counts_variant_agrees(spark, fixture):
    """The kernel counts variant must see the same capped candidate set:
    per-point neighbor-count totals equal the pairs variant's."""
    from approximate_anomaly_detection_in_data_streams_spark.operators.pairs import (
        pairs_to_counts,
    )

    cfg, pts, rows = fixture
    via_pairs = {
        (r.i, r.slide_i, r.slide_j): (r.c, r.c_arr)
        for r in pairs_to_counts(
            lsh_neighbor_pairs(pts, cfg, bucket_cap=CAP)
        ).collect()
    }
    acc = defaultdict(lambda: [0, 0])
    for r in lsh_neighbor_counts(pts, cfg, bucket_cap=CAP).collect():
        acc[(r.i, r.slide_i, r.slide_j)][0] += r.c
        acc[(r.i, r.slide_i, r.slide_j)][1] += r.c_arr
    via_kernel = {k: (v[0], v[1]) for k, v in acc.items()}
    assert via_kernel == via_pairs


def test_uncapped_unchanged(spark, fixture):
    """cap=None keeps the exact-union semantics (superset sanity: the
    capped pair set is a subset of the uncapped one)."""
    cfg, pts, rows = fixture
    uncapped = {
        (r.i, r.j) for r in lsh_neighbor_pairs(pts, cfg).collect()
    }
    capped = {
        (r.i, r.j)
        for r in lsh_neighbor_pairs(pts, cfg, bucket_cap=CAP).collect()
    }
    assert capped <= uncapped
    assert len(capped) < len(uncapped)  # the cap really thinned something
