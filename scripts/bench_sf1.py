"""10x scale smoke (r3 verdict #7): synthesize an sf1-shaped dataset by
key-shifted replication of the driver's sf0.1 tables (1M events / 50k docs
/ 6M lineitem / 20k embeddings), then run every ``queries()`` entry once
and record per-query walls. No external data — every copy is a
deterministic transform of the driver parquet. Catches the cliffs sf0.1
cannot: template-bucket growth in MinHash, verify fan-out, percentile
sorts, O(n^2) exact tiers.

Replication semantics per table (copy c of COPIES, base row count n0):
  * ids/keys shift by c*n0 (event_id stays contiguous 0-based — the
    detector's footer-count shortcut validates max(id)+1 == rows);
  * document texts get a per-copy suffix token so cross-copy docs are
    near- but not exact duplicates (template cluster COUNT grows 10x,
    cluster size stays constant — the realistic corpus growth mode);
  * embeddings get a tiny deterministic per-copy perturbation (cosine
    structure preserved, no cross-copy exact dupes);
  * foreign keys shift consistently (orders.o_custkey -> copy's customer
    block, lineitem.l_orderkey -> copy's orders block) so referential
    checks see the same orphan rate.

Usage: python scripts/bench_sf1.py [--dir /tmp/aads_sf1] [--copies 10]
Prints one JSON line: {"sf": 1.0, "queries": {name: sec}, "value": total}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10

COUNTS = {
    "customer": 15000, "supplier": 1000, "part": 20000, "orders": 150000,
    "lineitem": 600000, "events": 100000, "documents": 5000,
    "embeddings": 2000,
}


def build(spark, out_dir: str, copies: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    # tiny dims copy through unchanged
    for t in ("region", "nation"):
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
                "overwrite"
            ).parquet(dst)

    def replicate(table: str, transform) -> None:
        dst = f"{out_dir}/{table}.parquet"
        if os.path.exists(dst):
            return
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        n0 = COUNTS[table]
        parts = []
        for c in range(copies):
            parts.append(transform(base, c, n0))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(64).write.mode("overwrite").parquet(dst)

    replicate(
        "customer",
        lambda df, c, n0: df.withColumn(
            "c_custkey", F.col("c_custkey") + c * n0
        ),
    )
    replicate(
        "supplier",
        lambda df, c, n0: df.withColumn(
            "s_suppkey", F.col("s_suppkey") + c * n0
        ),
    )
    replicate(
        "part",
        lambda df, c, n0: df.withColumn("p_partkey", F.col("p_partkey") + c * n0),
    )
    replicate(
        "orders",
        lambda df, c, n0: df.withColumn("o_orderkey", F.col("o_orderkey") + c * n0)
        .withColumn("o_custkey", F.col("o_custkey") + c * COUNTS["customer"]),
    )
    replicate(
        "lineitem",
        lambda df, c, n0: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + c * COUNTS["orders"]
        )
        .withColumn("l_partkey", F.col("l_partkey") + c * COUNTS["part"])
        .withColumn("l_suppkey", F.col("l_suppkey") + c * COUNTS["supplier"]),
    )
    replicate(
        "events",
        lambda df, c, n0: df.withColumn("event_id", F.col("event_id") + c * n0)
        .withColumn("user_id", F.col("user_id") + c * 100000)
        # per-copy value jitter: keeps the windowed detector's neighbor
        # structure copy-local instead of replaying identical windows
        .withColumn("value", F.col("value") + F.lit(c * 0.001)),
    )
    # per-copy CHARACTER ROTATION, not a suffix: a suffix leaves cross-copy
    # docs ~95% shingle-identical, which MERGES the template clusters into
    # 10x-size mega-clusters (measured: minhash 507 s — the quadratic
    # within-cluster pair count, not an operator cliff). Rotating the
    # alphabet per copy rewrites every shingle, so cluster COUNT grows 10x
    # while cluster SIZE stays constant — the realistic corpus growth mode
    # this smoke is meant to measure.
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def _rot_text(df, c, n0):
        to = alpha[c:] + alpha[:c]
        rotated = F.translate(F.col("text"), alpha, to)
        return (
            df.withColumn("doc_id", F.col("doc_id") + c * n0)
            .withColumn("text", rotated)
            .withColumn("n_chars", F.length(rotated))
        )

    replicate("documents", _rot_text)
    replicate(
        "embeddings",
        lambda df, c, n0: df.withColumn("vec_id", F.col("vec_id") + c * n0)
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (
                    x + (F.lit(c) * (i.cast("float") + F.lit(1.0)) * F.lit(1e-4))
                ).cast("float"),
            ),
        ),
    )


def main() -> None:
    out_dir = "/tmp/aads_sf1"
    copies = COPIES
    only = []
    for a in sys.argv[1:]:
        if a.startswith("--dir="):
            out_dir = a.split("=", 1)[1]
        elif a.startswith("--copies="):
            copies = int(a.split("=", 1)[1])
        else:
            only.append(a)

    from approximate_anomaly_detection_in_data_streams_spark.session import get_spark

    spark = get_spark(app_name="aads-sf1-smoke")
    build(spark, out_dir, copies)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = only or list(qs)

    def _warm(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    spark.range(0, 256, 1, 256).mapInPandas(_warm, "id long").count()
    spark.read.parquet(f"{out_dir}/events.parquet").count()

    walls: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            qs[name](spark, out_dir).write.format("noop").mode("overwrite").save()
            walls[name] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # smoke: record, keep going
            walls[name] = -1.0
            print(f"## {name} FAILED: {exc}", file=sys.stderr)
        print(f"# {name}: {walls[name]}", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "sf": 1.0,
                "copies": copies,
                "value": round(sum(v for v in walls.values() if v > 0), 2),
                "queries": walls,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
