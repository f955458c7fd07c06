"""Similarity search over embedding columns: brute-force cosine top-k and
an LSH-bucketed approximate variant (the scale path).

Part of the training-data-pipeline superset. The bucketed variant reuses the
detector's candidate-equi-join shape (operators/lsh.py; reference analog
/root/reference/src/core/lsh/LSHIndex.java:33-44): sign-random-projection
buckets on the *unit sphere* (SRP-LSH approximates angular distance — the
right family for cosine, vs the p-stable family the reference uses for
Euclidean).

Scale notes: brute force is O(Q x N) — exact, fine when Q is small or as a
per-bucket kernel. The SRP variant shuffles each side once on (table, key);
a multi-probe loop (flip one bit) trades extra candidates for recall.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _cosine_col(a, b) -> F.Column:
    """JVM-side cosine: zip_with product fold / norms (no Python)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors of each query over all vectors.

    Broadcast the (small) query side, crossJoin streamed over the corpus,
    cosine via JVM higher-order functions, rank with a window over each
    query partition. Ties broken by neighbor id (deterministic).
    Output: (query_id, neighbor_id, cosine, rank).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).cast("long").alias("query_id"),
            F.col(vec_col).alias("qvec"),
        )
    )
    v = vectors.select(
        F.col(id_col).cast("long").alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    qd = F.transform("qvec", lambda x: x.cast("double"))
    nd = F.transform("nvec", lambda x: x.cast("double"))
    scored = (
        q.crossJoin(v)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine_col(qd, nd), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def srp_bucket_keys(
    df: DataFrame, vec_col: str, dim: int, bits: int = 12, tables: int = 4, seed: int = 42
) -> DataFrame:
    """Sign-random-projection bucket keys: ``buckets ARRAY<BIGINT>`` (one/table).

    One Arrow-batched matmul computes all tables x bits signs; key = packed
    sign bits. Two vectors collide in a table with prob (1 - theta/pi)^bits.
    """
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(tables * bits, dim))
    weights = (1 << np.arange(bits, dtype=np.int64))
    # worker-lifetime scratch: the projection plane is re-used across
    # Arrow batches instead of freshly allocated (this VM collapses under
    # concurrent fresh allocation — BENCH.md)
    scratch: dict[str, np.ndarray] = {}

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def keys(vecs: pd.Series) -> pd.Series:
        n = len(vecs)
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        P = scratch.get("P")
        if P is None or len(P) < n:
            scratch["P"] = P = np.empty((n, tables * bits))
        np.matmul(X, A.T, out=P[:n])
        signs = (P[:n] > 0).reshape(n, tables, bits)
        packed = (signs * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(packed))

    return df.withColumn("buckets", keys(F.col(vec_col)))


def srp_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    bits: int = 8,
    tables: int = 16,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: SRP bucket equi-join candidates, exact re-rank.

    Both sides get bucket keys from the same seeded projections; candidates
    are pairs colliding in >= 1 table (union via explode + dropDuplicates),
    then exact cosine + window rank. Recall measured vs brute_force_topk in
    tests. The corpus-side shuffle is keyed (table, key) — bounded buckets,
    no crossJoin.

    ``multiprobe=1`` additionally probes every Hamming-1 neighbor of each
    QUERY key (the classic multi-probe LSH trade: x(bits+1) query-side
    rows — queries are the small side — instead of more corpus tables):
    a table then recalls a neighbor at angular similarity p with
    probability p^b + b*p^(b-1)*(1-p) instead of p^b, which is what lifts
    recall into the useful range for mid-similarity corpora.
    """
    qk = srp_bucket_keys(
        queries.select(F.col(id_col).cast("long").alias("query_id"), F.col(vec_col).alias("qvec")),
        "qvec",
        dim,
        bits,
        tables,
        seed,
    ).select("query_id", "qvec", F.posexplode("buckets").alias("t", "key"))
    if multiprobe >= 1:
        probe_arr = F.array(
            F.col("key"),
            *[F.col("key").bitwiseXOR(F.lit(1 << j)) for j in range(bits)],
        )
        qk = qk.select(
            "query_id", "qvec", "t", F.explode(probe_arr).alias("key")
        )
    vk = srp_bucket_keys(
        vectors.select(
            F.col(id_col).cast("long").alias("neighbor_id"), F.col(vec_col).alias("nvec")
        ),
        "nvec",
        dim,
        bits,
        tables,
        seed,
    ).select("neighbor_id", "nvec", F.posexplode("buckets").alias("t", "key"))
    cand = (
        qk.join(vk, ["t", "key"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qvec", "neighbor_id", "nvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qd = F.transform("qvec", lambda x: x.cast("double"))
    nd = F.transform("nvec", lambda x: x.cast("double"))
    scored = cand.select(
        "query_id", "neighbor_id", F.round(_cosine_col(qd, nd), 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
