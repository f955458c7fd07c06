"""Deterministic synthetic embedding corpus for the ANN planted oracles.

Every row is a pure function of (seed, ordinal): component values come
from splitmix64 integer hashes mapped to [-1, 1) floats, arranged as
``n_centers`` latent cluster centers plus per-vector noise — so IVF
clustering (and its Lloyd refinement) has real structure to find, and a
sequential replay (oracle/planted.py) can regenerate the identical
float32 bits without Spark. Mirrors sources/documents.py::doc_text,
which plays the same role for the SimHash planted oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_M64 = (1 << 64) - 1
_MIX1, _MIX2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB


def _smix(x: int) -> int:
    """splitmix64 finalizer over python ints (exact, portable)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * _MIX1) & _M64
    x = ((x ^ (x >> 27)) * _MIX2) & _M64
    return x ^ (x >> 31)


def _u11(h: int) -> float:
    """uniform [-1, 1) from the top 53 bits of a 64-bit hash."""
    return 2.0 * ((h >> 11) / float(1 << 53)) - 1.0


def vector_values(
    seed: int, i: int, dim: int, n_centers: int = 12, noise: float = 0.25
) -> list[float]:
    """The float32 components of vector ``i`` — THE definition both the
    Spark generator and the sequential oracle replay share. Center
    ``i % n_centers`` plus per-(i, j) noise; each component is a single
    float expression over exact integers, then one float32 rounding."""
    c = i % n_centers
    out = []
    for j in range(dim):
        center = _u11(_smix((seed << 32) ^ (0xC0FFEE * (c + 1)) ^ j))
        nz = _u11(_smix((seed << 40) ^ (i * 0x9E3779B1) ^ (j * 0x85EBCA6B)))
        out.append(float(np.float32(center + noise * nz)))
    return out


def generate_vectors(
    spark: SparkSession,
    n: int,
    dim: int = 16,
    seed: int = 17,
    n_centers: int = 12,
    noise: float = 0.25,
    partitions: int = 16,
) -> DataFrame:
    """(vec_id long, embedding array<float>) — distributed map-only
    generation; every row independently derived from (seed, ordinal)."""

    def gen(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "vec_id": ids,
                    "embedding": [
                        np.array(
                            vector_values(seed, i, dim, n_centers, noise),
                            dtype=np.float32,
                        )
                        for i in ids
                    ],
                }
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, "vec_id long, embedding array<float>"
    )
