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

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def bucket_keys(features: pd.Series) -> pd.Series:
        X = np.stack(features.to_numpy()).astype(np.float64)
        H = np.floor((X @ A_flat + b_flat) / width).astype(np.int64)
        H = H.reshape(len(X), n_tables, n_hashes)
        keys = np.stack(
            [_combine_keys(H[:, t, :]) for t in range(n_tables)], axis=1
        )
        return pd.Series(list(keys))

    return points.withColumn("buckets", bucket_keys("features"))


def lsh_neighbor_pairs(points_with_slide: DataFrame, cfg: DetectorConfig) -> DataFrame:
    """Approximate neighbor pairs: bucket-collision candidates, exact post-filter.

    Same output contract as ``exact_neighbor_pairs`` (both directions), but a
    pair appears only if the two points collide in >= 1 of the L tables while
    co-windowed. Group key is (table, bucket_key, id-block), so a skewed
    bucket is still bounded at <= 2W points per task; the cross-table
    duplicate candidates are removed with dropDuplicates on (i, j).
    """
    dim = len(points_with_slide.select("features").first()[0])
    ws = cfg.ws
    r2 = float(cfg.r) ** 2
    max_gap = ws - 1

    keyed = with_bucket_keys(points_with_slide, cfg, dim)
    exploded = keyed.select(
        "id",
        "features",
        "slide",
        F.posexplode("buckets").alias("t", "key"),
        (((F.col("slide") - 1) / F.lit(ws)).cast("long")).alias("g"),
    )
    fanned = exploded.withColumn("is_home", F.lit(True)).unionByName(
        exploded.withColumn("g", F.col("g") - 1)
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

    pairs = fanned.groupBy("t", "key", "g").applyInPandas(emit, PAIR_SCHEMA)
    return pairs.dropDuplicates(["i", "j"])
