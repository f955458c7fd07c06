"""Outlier-set comparison (J7/X4): recall/precision of approximate variants.

Reimplements /root/reference/src/AccuracyComparator.java:14-37 (intersection
via retainAll, recall = common/baseline) as semi-join counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall(baseline: DataFrame, test: DataFrame) -> DataFrame:
    """One-row DataFrame: (n_baseline, n_test, n_common, recall, precision).

    Declarative form of ``compare_outlier_sets`` (no driver-side counts) —
    three tiny aggregates cross-joined; each side is a semi-join away from
    the id sets, so the plan stays fully distributed.
    """
    base = baseline.agg(F.count(F.lit(1)).alias("n_baseline"))
    tst = test.agg(F.count(F.lit(1)).alias("n_test"))
    common = baseline.join(test, "id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    return (
        base.crossJoin(tst)
        .crossJoin(common)
        .select(
            "n_baseline",
            "n_test",
            "n_common",
            F.round(
                F.when(F.col("n_baseline") > 0, F.col("n_common") / F.col("n_baseline"))
                .otherwise(F.lit(1.0)),
                6,
            ).alias("recall"),
            F.round(
                F.when(F.col("n_test") > 0, F.col("n_common") / F.col("n_test"))
                .otherwise(F.lit(1.0)),
                6,
            ).alias("precision"),
        )
    )


def compare_outlier_sets(baseline: DataFrame, test: DataFrame) -> dict:
    """Recall/precision of ``test`` vs ``baseline`` (both: single ``id`` col)."""
    n_base = baseline.count()
    n_test = test.count()
    n_common = baseline.join(test, "id", "left_semi").count()
    return {
        "n_baseline": n_base,
        "n_test": n_test,
        "n_common": n_common,
        "recall": n_common / n_base if n_base else 1.0,
        "precision": n_common / n_test if n_test else 1.0,
    }
