"""Property-based tests (hypothesis): randomized configs + data against
independent oracles. SURVEY.md §5 names property invariants as part of the
test strategy; these cover the detector (vs the brute NumPy oracle), the
MinHash join (precision-1.0 subset of the exact pair set with identical
jaccard values), the streaming engine (equal to batch on every generated
stream), and the rolling-hash fingerprint (vs a pure-Python fold).

Spark jobs are slow per example, so example counts are small but the data
and parameter spaces are adversarial: duplicated points (hash-identical
rows), constant streams, partial final batches, W == slide, k >= window.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from approximate_anomaly_detection_in_data_streams_spark.api import run_detector
from approximate_anomaly_detection_in_data_streams_spark.config import DetectorConfig
from approximate_anomaly_detection_in_data_streams_spark.oracle.brute import mcod_brute
from approximate_anomaly_detection_in_data_streams_spark.streaming.incremental import (
    run_slide_loop,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@st.composite
def detector_case(draw):
    ws = draw(st.integers(1, 4))  # window span in slides
    slide = draw(st.sampled_from([5, 10, 20]))
    w = ws * slide
    k = draw(st.integers(1, 6))
    r = draw(st.sampled_from([0.3, 0.8, 2.0]))
    n = draw(st.integers(w, 160))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    kind = draw(st.sampled_from(["gauss", "clustered", "constant", "dups"]))
    if kind == "gauss":
        X = rng.normal(0, 1, size=(n, 2))
    elif kind == "clustered":
        centers = rng.normal(0, 5, size=(3, 2))
        X = centers[rng.integers(0, 3, n)] + rng.normal(0, 0.2, size=(n, 2))
    elif kind == "constant":
        X = np.zeros((n, 2))
    else:  # duplicated rows: identical vectors share index hashes
        base = rng.normal(0, 1, size=(max(n // 4, 1), 2))
        X = base[rng.integers(0, len(base), n)]
    return X, DetectorConfig(w=w, slide=slide, r=r, k=k, dim=2)


@SLOW
@given(detector_case())
def test_detector_matches_brute_oracle(spark, case):
    X, cfg = case
    brute = mcod_brute(X, cfg.w, cfg.slide, cfg.r, cfg.k)
    df = spark.createDataFrame(
        [(i + 1, [float(a), float(b)]) for i, (a, b) in enumerate(X)],
        "id long, features array<double>",
    )
    res = run_detector(df, cfg)
    got = [r.id for r in res.outliers.collect()]
    assert got == brute["outliers"]
    stats = res.stats.first().asDict()
    for key in ("n_only_inlier", "n_only_outlier", "n_both_inlier_outlier"):
        assert stats[key] == brute[key]
    # the three lifetime buckets always partition the stream
    assert (
        stats["n_only_inlier"]
        + stats["n_only_outlier"]
        + stats["n_both_inlier_outlier"]
        == len(X)
    )


@SLOW
@given(detector_case())
def test_streaming_engine_equals_brute(case):
    """The incremental slide-loop engine (no Spark — pure NumPy state
    machine) reproduces the brute-force trajectory on every stream."""
    X, cfg = case
    brute = mcod_brute(X, cfg.w, cfg.slide, cfg.r, cfg.k)
    got = run_slide_loop(np.arange(1, len(X) + 1), X, cfg)
    assert got["outliers"] == brute["outliers"]
    for key in ("n_only_inlier", "n_only_outlier", "n_both_inlier_outlier"):
        assert got[key] == brute[key]


@st.composite
def corpus(draw):
    n_templates = draw(st.integers(1, 3))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    words = ["alpha", "beta", "gamma", "delta", "niño", "café", "zeta"]
    docs = []
    did = 0
    for t in range(n_templates):
        base = " ".join(rng.choice(words, size=12))
        for _ in range(draw(st.integers(1, 12))):
            toks = base.split()
            for _ in range(int(rng.integers(0, 3))):
                toks[int(rng.integers(0, len(toks)))] = str(
                    rng.choice(words)
                )
            docs.append((did, " ".join(toks)))
            did += 1
    docs.append((did, ""))  # zero-shingle doc
    docs.append((did + 1, "ab"))  # sub-n doc
    return docs


@SLOW
@given(corpus())
def test_minhash_subset_of_exact_with_equal_values(spark, docs):
    """Precision 1.0 by construction: every MinHash pair must appear in the
    exact Jaccard join with the identical rounded value (banding only ever
    loses pairs, never invents or mis-scores them)."""
    from approximate_anomaly_detection_in_data_streams_spark.operators import dedup

    df = spark.createDataFrame(docs, "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.6).collect()
    }
    mh = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "text", 3, threshold=0.6, block_size=16
        ).collect()
    }
    for pair, jac in mh.items():
        assert pair in exact
        assert jac == pytest.approx(exact[pair], abs=1e-9)


@settings(max_examples=25, deadline=None)
@given(st.text(min_size=0, max_size=200))
def test_fingerprint_matches_python_fold(spark, text):
    """JVM aggregate fold == pure-Python fold for arbitrary unicode text
    (ascii() semantics: code point of the first character; non-BMP safe)."""
    from approximate_anomaly_detection_in_data_streams_spark.functions.text import (
        FP_BASE,
        FP_MOD,
        fingerprint,
    )

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = df.select(fingerprint("text").alias("fp")).first()["fp"]
    exp = 0
    for ch in text:
        exp = (exp * FP_BASE + ord(ch)) % FP_MOD
    assert got == exp
