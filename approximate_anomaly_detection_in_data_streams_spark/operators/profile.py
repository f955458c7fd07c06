"""Table-profiling operators: the validator's column-stat / uniqueness /
referential / heavy-hitter checks (SURVEY.md section 7 M3).

These generalize the reference's stats sink (K2,
/root/reference/src/Executor.java:239-260) from a single hard-coded counter
row into declarative per-group profiles. Everything here is a single
shuffle-light DataFrame aggregation:

  * column_stats    — one groupBy(partition) pass; all stats are algebraic
                      aggregates with map-side partial combine (one shuffle
                      of #groups x #cols tiny rows, regardless of input size);
  * uniqueness      — exact distinct counts for the correctness gate plus
                      HLL (approx_count_distinct) for the 10^12-row path,
                      where exact distinct's shuffle would dominate;
  * heavy_hitters   — exact groupBy count for the gate; frequency sketch via
                      count_min_sketch for the at-scale path;
  * referential     — broadcast/shuffle anti-join orphan detection; the
                      small dimension side should be broadcast (we hint it).

At 100 TB every operator is one scan + one reduce-by-key; no collects,
no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Per-group min/max/mean/stddev/count/null-rate for each value column.

    One wide aggregation -> one shuffle keyed on ``group_cols``; all
    aggregates are algebraic so partial aggregation runs map-side.
    Output columns: ``<col>_min, <col>_max, <col>_mean, <col>_std,
    <col>_nulls, n_rows`` (flat names so the DuckDB oracle can mirror them).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in value_cols:
        aggs += [
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.avg(c).alias(f"{c}_mean"),
            F.stddev_samp(c).alias(f"{c}_std"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
        ]
    return df.groupBy(*group_cols).agg(*aggs)


def uniqueness(df: DataFrame, key_cols: list[str], exact: bool = True) -> DataFrame:
    """Duplicate profile of candidate key columns.

    ``exact=True``: precise distinct counts (the correctness-gate path).
    ``exact=False``: HyperLogLog++ ``approx_count_distinct`` — at 10^12 rows
    the exact path's distinct shuffle is the bottleneck; HLL keeps it one
    pass with constant state per partition.
    Output: one row — n_rows, and per key column ``<col>_distinct`` and
    ``<col>_dups`` (rows minus distinct).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in key_cols:
        d = (
            F.countDistinct(c)
            if exact
            else F.approx_count_distinct(c, 0.01)
        )
        aggs.append(d.alias(f"{c}_distinct"))
    out = df.agg(*aggs)
    for c in key_cols:
        out = out.withColumn(f"{c}_dups", F.col("n_rows") - F.col(f"{c}_distinct"))
    return out


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """The violating key values themselves: keys appearing more than once.

    groupBy + HAVING — the shuffle is keyed on the candidate key, so skew
    equals actual duplication (which is what we're measuring).
    Output: key cols + ``n_dup`` descending, key ascending for determinism.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .where(F.col("n_dup") > 1)
        .orderBy(F.desc("n_dup"), *key_cols)
    )


def heavy_hitters(
    df: DataFrame, col: str, min_count: int
) -> DataFrame:
    """Exact heavy hitters: values of ``col`` occurring >= min_count times.

    Threshold-based (not top-N) so results are deterministic under ties.
    The at-scale variant estimates the same set with a Count-Min sketch
    (see ``cms_heavy_hitters``) to avoid a full shuffle on a hot column.
    """
    return (
        df.groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "value")
    )


def cms_heavy_hitters(
    df: DataFrame, col: str, candidates: list[str], eps: float = 0.001, conf: float = 0.99
) -> DataFrame:
    """Count-Min-sketch frequency estimates for candidate values.

    The 10^12-row path for heavy hitters: one pass builds a mergeable CMS
    (map-side partials, constant memory per task), then the (tiny) candidate
    list is probed against the merged sketch. CMS only over-counts, so a
    ``>= threshold`` gate never yields false negatives.
    """
    row = df.agg(
        F.count_min_sketch(
            F.col(col).cast("string"), F.lit(eps), F.lit(conf), F.lit(42)
        ).alias("cms")
    ).first()
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    stream = jvm.java.io.ByteArrayInputStream(bytes(row["cms"]))
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(stream)
    est = [(str(c), sketch.estimateCount(str(c))) for c in candidates]
    return spark.createDataFrame(est, "value string, n_est long")


def referential_orphans(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Foreign-key violations: fact rows whose key has no match in dim.

    Anti-join; the dimension side is broadcast when small (no shuffle of the
    fact table at all — the 100 TB fact side streams through map tasks).
    For dimension tables too large to broadcast, AQE converts to shuffled
    sort-merge and skew-splits hot keys (salting hook in ``salted_join``).
    """
    d = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    if broadcast_dim:
        d = F.broadcast(d)
    return fact.join(d, on=fact_key, how="left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (big, skewed) left side's key.

    Left rows get a deterministic salt in [0, salt) from a stable full-row
    hash (reruns identical); the right side is exploded x salt so every
    (key, salt) partition joins correctly. Use when one key dominates
    (north_rule: explicit skew handling beyond AQE's skew-join splitting).
    """
    l2 = left.withColumn("_salt", F.pmod(F.xxhash64(*left.columns), F.lit(salt)))
    r2 = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l2.join(r2, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def null_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row: per-column null counts and rates (constraint: null-rate cap)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
    out = df.agg(*aggs)
    for c in cols:
        out = out.withColumn(
            f"{c}_null_rate", F.col(f"{c}_nulls") / F.col("n_rows")
        )
    return out


def value_drift_slides(
    df: DataFrame,
    ord_col: str,
    value_col: str,
    slide_size: int,
    n_bins: int = 16,
    l1_limit: float = 0.25,
) -> DataFrame:
    """Metadata distribution-drift check, no decoding required: per slide of
    ``slide_size`` consecutive ordinals, the L1 distance between the
    slide's value histogram (``n_bins`` equal-width bins over the global
    range) and the global histogram, flagged when it exceeds ``l1_limit``.

    The drift counterpart of the windowed point-anomaly detector
    (north_star: distribution drift on metadata/feature columns): a
    sustained shift moves the whole slide's histogram — its points stay
    mutually close, so a distance-based detector correctly does NOT fire;
    this check does. Dataflow: one global min/max aggregate broadcast back
    (cross join with a 1-row table), one groupBy(slide, bin) count, one
    broadcast join of the (tiny) global histogram — all map-side
    combinable, exact arithmetic, so it carries an exact SQL oracle.
    Output: (slide, n_rows, l1, drifted) ordered by slide.
    """
    rng = df.agg(
        F.min(F.col(value_col).cast("double")).alias("mn"),
        F.max(F.col(value_col).cast("double")).alias("mx"),
    )
    binned = df.crossJoin(F.broadcast(rng)).select(
        (F.col(ord_col) / F.lit(slide_size)).cast("long").alias("slide"),
        F.least(
            F.floor(
                (F.col(value_col).cast("double") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * F.lit(n_bins)
            ),
            F.lit(n_bins - 1),
        ).cast("long").alias("bin"),
    )
    from pyspark.sql.window import Window

    slide_hist = binned.groupBy("slide", "bin").agg(F.count(F.lit(1)).alias("c"))
    slide_tot = slide_hist.groupBy("slide").agg(F.sum("c").alias("n_rows"))
    # global fraction per bin: a window total over the (tiny, n_bins-row)
    # histogram keeps the plan fully lazy — no driver-side count at build
    global_hist = (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("gc"))
        .withColumn(
            "gfrac",
            F.col("gc") / F.sum("gc").over(Window.partitionBy(F.lit(1))),
        )
    )
    # every (slide, bin) pair including zero-count bins: the L1 term for a
    # bin absent from a slide is the global fraction itself
    l1 = (
        slide_tot.crossJoin(F.broadcast(global_hist))
        .join(slide_hist, ["slide", "bin"], "left")
        .select(
            "slide",
            "n_rows",
            F.abs(
                F.coalesce(F.col("c"), F.lit(0)) / F.col("n_rows")
                - F.col("gfrac")
            ).alias("term"),
        )
        .groupBy("slide", "n_rows")
        .agg(F.round(F.sum("term"), 6).alias("l1"))
    )
    return l1.select(
        "slide", "n_rows", "l1", (F.col("l1") > F.lit(l1_limit)).alias("drifted")
    ).orderBy("slide")
