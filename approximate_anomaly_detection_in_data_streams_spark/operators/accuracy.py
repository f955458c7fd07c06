"""Outlier-set comparison (J7/X4): recall/precision of approximate variants.

Reimplements /root/reference/src/AccuracyComparator.java:14-37 (intersection
via retainAll, recall = common/baseline) as semi-join counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
