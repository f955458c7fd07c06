"""Deterministic synthetic near-dup document corpus with PLANTED clusters.

Input-data definition for the SimHash ``fast``-tier correctness gate (the
production splitmix64 hash family has no portable SQL twin, so — like the
media queries — its oracle is a planted-ground-truth side table computed
by a sequential scalar replay of the same generator,
oracle/planted.py::simhash_fast_truth).

Every document is a pure function of (seed, ordinal): documents belong to
``n_clusters`` template clusters round-robin (ordinal % n_clusters); the
first member of a cluster is the canonical template (~40 words drawn from
a fixed vocabulary), later members carry 0-2 seeded in-place word
substitutions — 0 edits plants exact duplicates (hamming 0), small edits
plant near-dups, and distinct templates are far apart. Cluster size stays
far below the pigeonhole ``bucket_cap`` so the capped join is exact at
gate scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_VOCAB = [
    "amber", "basalt", "cinder", "delta", "ember", "fjord", "garnet",
    "harbor", "indigo", "juniper", "kelp", "lagoon", "marble", "nectar",
    "onyx", "prairie", "quartz", "ridge", "slate", "tundra", "umber",
    "violet", "willow", "xenon", "yarrow", "zephyr", "anchor", "breeze",
    "copper", "drift", "echo", "flint", "glacier", "hollow", "isle",
    "jetty", "knoll", "lantern", "meadow", "north", "orchard", "pebble",
    "quarry", "reef", "summit", "thicket", "upland", "vale", "wharf",
    "zenith",
]


def doc_text(seed: int, idx: int, n_clusters: int = 50, words_per_doc: int = 40) -> str:
    """The document at ordinal ``idx`` — pure function, no I/O."""
    cluster = idx % n_clusters
    base_rng = np.random.default_rng((seed * 104651 + cluster * 13 + 1) & 0xFFFFFFFF)
    picks = base_rng.integers(0, len(_VOCAB), size=words_per_doc)
    words = [_VOCAB[int(i)] for i in picks]
    member = idx // n_clusters
    if member > 0:
        rng = np.random.default_rng((seed * 7907 + idx * 17 + 3) & 0xFFFFFFFF)
        for _ in range(int(rng.integers(0, 3))):  # 0-2 word substitutions
            pos = int(rng.integers(0, words_per_doc))
            words[pos] = _VOCAB[int(rng.integers(0, len(_VOCAB)))]
    return " ".join(words)


def generate_neardup_docs(
    spark: SparkSession, n: int, seed: int = 11, partitions: int = 16
) -> DataFrame:
    """(doc_id long, text string) — distributed map-only generation, every
    row derived independently from (seed, ordinal)."""

    def gen(batches):
        for pdf in batches:
            ids = [int(i) for i in pdf["id"]]
            yield pd.DataFrame(
                {"doc_id": ids, "text": [doc_text(seed, i) for i in ids]}
            )

    return spark.range(0, n, 1, partitions).mapInPandas(gen, "doc_id long, text string")
