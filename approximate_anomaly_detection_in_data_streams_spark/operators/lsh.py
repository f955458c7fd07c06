"""Seeded p-stable LSH candidate generation (J4/X3): the approximate join.

Reimplements the reference's LSH index semantics — m p-stable hashes
``h_i = floor((v . a_i + b_i) / w)`` per table, a_i ~ N(0,1)^d,
b_i ~ U[0, w), L tables, candidate set = union of colliding buckets
(/root/reference/src/core/lsh/HashFunction.java:13-40,
/root/reference/src/core/lsh/HashTable.java:81-101,
/root/reference/src/core/lsh/LSHIndex.java:33-44) — as a *bucket-key
equi-join*: precompute one 64-bit combined key per (point, table) with a
single vectorized matmul, explode to (table, key), and run the same banded
blockwise pair scan as the exact path inside each (table, key, id-block)
group. The theta-join becomes an equi-join + exact post-filter, turning the
reference's in-heap probe into a shuffle whose keys we fully control.

Differences from the reference, by design (SURVEY.md section 5):
  * the reference's RNG is unseeded and its buckets evict entries under
    pressure (/root/reference/src/core/lsh/HashTable.java:22-35), making
    results nondeterministic; we seed everything and skip eviction, so our
    candidate set is a superset of what a capped table would retain;
  * missed collisions only *lower* neighbor counts, so the approximate
    outlier set is a superset of the exact one — recall of exact outliers
    is structurally 1.0 and precision is the quality metric (tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DetectorConfig
from .pairs import _pairwise_emit, PAIR_SCHEMA

_MIX = np.uint64(0x9E3779B97F4A7C15)


def make_projections(
    cfg: DetectorConfig, dim: int
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (L, m, d) Gaussian projections and (L, m) uniform biases."""
    rng = np.random.default_rng(cfg.seed)
    A = rng.normal(0.0, 1.0, size=(cfg.num_tables, cfg.num_hashes, dim))
    b = rng.uniform(0.0, cfg.lsh_bucket_width, size=(cfg.num_tables, cfg.num_hashes))
    return A, b


def _combine_keys(H: np.ndarray) -> np.ndarray:
    """Fold an (n, m) int hash matrix into one int64 key per row."""
    acc = np.zeros(len(H), dtype=np.uint64)
    for col in range(H.shape[1]):
        acc = (acc * _MIX) ^ H[:, col].astype(np.int64).view(np.uint64)
        acc *= _MIX
    return acc.view(np.int64)


def with_bucket_keys(
    points: DataFrame, cfg: DetectorConfig, dim: int
) -> DataFrame:
    """Add ``buckets ARRAY<BIGINT>`` — one combined key per LSH table."""
    A, b = make_projections(cfg, dim)
    width = cfg.lsh_bucket_width
    # flatten for a single matmul: (d, L*m)
    A_flat = A.reshape(cfg.num_tables * cfg.num_hashes, dim).T.copy()
    b_flat = b.reshape(-1)
    n_tables, n_hashes = cfg.num_tables, cfg.num_hashes
    # projection plane reused across Arrow batches (worker-lifetime
    # scratch; concurrent fresh allocation anti-scales on this VM)
    scratch: dict[str, np.ndarray] = {}

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket_keys(features: pd.Series) -> pd.Series:
        n = len(features)
        X = np.stack(features.to_numpy()).astype(np.float64)
        P = scratch.get("P")
        if P is None or len(P) < n:
            scratch["P"] = P = np.empty((n, n_tables * n_hashes))
        np.matmul(X, A_flat, out=P[:n])
        P[:n] += b_flat
        P[:n] /= width
        H = np.floor(P[:n]).astype(np.int64).reshape(n, n_tables, n_hashes)
        keys = np.stack(
            [_combine_keys(H[:, t, :]) for t in range(n_tables)], axis=1
        )
        return pd.Series(list(keys))

    return points.withColumn("buckets", bucket_keys("features"))


def lsh_neighbor_pairs(
    points_with_slide: DataFrame,
    cfg: DetectorConfig,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Approximate neighbor pairs: bucket-collision candidates, exact post-filter.

    Same output contract as ``exact_neighbor_pairs`` (both directions), but a
    pair appears only if the two points collide in >= 1 of the L tables while
    co-windowed. Fully JVM-side after key generation:

      1. equi-join the (table, key, id-block)-exploded point table with
         itself — the block of W/S consecutive slides is part of the join
         key (points co-window only within the same or adjacent block, so
         the right side fans to its own and previous block), which bounds
         every join group at <= 2W points even for hot buckets; the exact
         band |slide_i - slide_j| <= W/S - 1 is a post-filter;
      2. dedupe candidate id pairs across tables *before* any distance work
         (the reference's HashSet union, /root/reference/src/core/lsh/
         LSHIndex.java:33-44) — this is the big win over filtering first:
         each surviving pair's distance is computed exactly once;
      3. re-attach the feature vectors by id join and filter with the exact
         Euclidean predicate via zip_with/aggregate (whole-stage codegen,
         no Python round-trip).

    ``bucket_cap`` optionally bounds each (table, key) bucket by seeded-hash
    order — the deterministic analog of the reference's bucket eviction
    (/root/reference/src/core/lsh/HashTable.java:22-35); dropped members can
    only lower neighbor counts, so capped output stays a superset of what a
    capped reference table would produce.
    """
    from pyspark.sql.window import Window

    # cfg.dim avoids a driver-side probe job during plan construction;
    # the .first() fallback exists only for ad-hoc callers
    dim = cfg.dim if cfg.dim > 0 else len(
        points_with_slide.select("features").first()[0]
    )
    max_gap = cfg.ws - 1
    r2 = float(cfg.r) ** 2

    keyed = with_bucket_keys(points_with_slide, cfg, dim).select(
        "id",
        "slide",
        F.posexplode("buckets").alias("t", "key"),
        (((F.col("slide") - 1) / F.lit(cfg.ws)).cast("long")).alias("g"),
    )
    if bucket_cap is not None:
        w = Window.partitionBy("t", "key", "g").orderBy(
            F.xxhash64("id", F.lit(cfg.seed))
        )
        keyed = (
            keyed.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= bucket_cap)
            .drop("_rn")
        )
    x = keyed.select(
        F.col("id").alias("i"), F.col("slide").alias("slide_i"), "t", "key", "g"
    )
    # right side appears under its own block (home) and the previous block
    # (guest): co-windowed pairs are same-block (i<j dedupes the double
    # match) or adjacent-block (guest row joins the earlier block exactly
    # once).
    y_home = keyed.select(
        F.col("id").alias("j"),
        F.col("slide").alias("slide_j"),
        "t",
        "key",
        "g",
        F.lit(True).alias("home_j"),
    )
    y_guest = (
        keyed.select(
            F.col("id").alias("j"),
            F.col("slide").alias("slide_j"),
            "t",
            "key",
            (F.col("g") - 1).alias("g"),
            F.lit(False).alias("home_j"),
        )
        .where(F.col("g") >= 0)
    )
    y = y_home.unionByName(y_guest)
    cand = (
        x.join(y, ["t", "key", "g"])
        .where(
            (
                (F.col("home_j") & (F.col("i") < F.col("j")))
                | (~F.col("home_j"))
            )
            & (F.abs(F.col("slide_i") - F.col("slide_j")) <= max_gap)
        )
        .select("i", "j", "slide_i", "slide_j")
        .dropDuplicates(["i", "j"])
    )
    feats = points_with_slide.select("id", "features")
    fi = feats.select(F.col("id").alias("i"), F.col("features").alias("f_i"))
    fj = feats.select(F.col("id").alias("j"), F.col("features").alias("f_j"))
    d2 = F.aggregate(
        F.zip_with("f_i", "f_j", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        cand.join(fi, "i")
        .join(fj, "j")
        .where(d2 <= F.lit(r2))
        .select("i", "j", "slide_i", "slide_j")
    )
    reverse = pairs.select(
        F.col("j").alias("i"),
        F.col("i").alias("j"),
        F.col("slide_j").alias("slide_i"),
        F.col("slide_i").alias("slide_j"),
    )
    return pairs.unionByName(reverse)
