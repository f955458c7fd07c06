"""Profile/dedup operator coverage: CMS probe, HLL uniqueness, salted
join, approximate detector variants, accuracy comparator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from approximate_anomaly_detection_in_data_streams_spark.api import (
    approx_mclshod_config,
    run_detector,
)
from approximate_anomaly_detection_in_data_streams_spark.config import DetectorConfig
from approximate_anomaly_detection_in_data_streams_spark.operators.accuracy import (
    compare_outlier_sets,
)
from approximate_anomaly_detection_in_data_streams_spark.operators import profile


def test_cms_heavy_hitters_overestimates_only(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["value"]: r["n"]
        for r in profile.heavy_hitters(events, "event_type", 1).collect()
    }
    est = {
        r["value"]: r["n_est"]
        for r in profile.cms_heavy_hitters(
            events, "event_type", list(exact)
        ).collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n  # CMS never undercounts
        assert est[k] <= n * 1.05 + 100


def test_uniqueness_hll_close_to_exact(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = profile.uniqueness(orders, ["o_custkey"], exact=True).first()
    approx = profile.uniqueness(orders, ["o_custkey"], exact=False).first()
    assert exact["n_rows"] == approx["n_rows"]
    rel = abs(approx["o_custkey_distinct"] - exact["o_custkey_distinct"]) / max(
        exact["o_custkey_distinct"], 1
    )
    assert rel < 0.05


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    salted = (
        profile.salted_join(orders, cust, "o_custkey", salt=4)
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    assert sorted((r["c_mktsegment"], r["count"]) for r in plain) == sorted(
        (r["c_mktsegment"], r["count"]) for r in salted
    )


@pytest.fixture(scope="module")
def gauss_points(spark, gauss2d):
    return spark.createDataFrame(
        [(i + 1, [float(a), float(b)]) for i, (a, b) in enumerate(gauss2d)],
        "id long, features array<double>",
    ).cache()


def test_approx_mcod_recall_vs_exact(spark, gauss_points):
    cfg = DetectorConfig(w=100, slide=20, r=0.5, k=8)
    exact = run_detector(gauss_points, cfg).outliers
    approx_cfg = DetectorConfig(
        w=100, slide=20, r=0.5, k=8, algorithm="approx_mcod", pd_limit=50
    )
    approx = run_detector(gauss_points, approx_cfg).outliers
    res = compare_outlier_sets(exact, approx)
    # reference's own committed sample shows 70% recall
    # (/root/reference/src/mcodFile.txt vs approxmcodFile.txt)
    assert res["recall"] >= 0.7


def test_approx_mclshod_recall_vs_exact(spark, gauss_points):
    cfg = DetectorConfig(w=100, slide=20, r=0.5, k=8)
    exact = run_detector(gauss_points, cfg).outliers
    approx = run_detector(
        gauss_points, approx_mclshod_config(100, 20, 0.5, 8)
    ).outliers
    res = compare_outlier_sets(exact, approx)
    assert res["recall"] >= 0.95  # superset property: missed collisions
    # only lower counts -> outliers are a superset of exact


def test_load_stream_csv_drops_trailing_class(spark, tmp_path):
    p = tmp_path / "labeled.csv"
    p.write_text("1.0,2.0,7\n3.0,4.0,9\n")
    from approximate_anomaly_detection_in_data_streams_spark.sources.stream_csv import (
        load_stream_csv,
    )

    rows = load_stream_csv(spark, str(p), contains_class=True).orderBy("id").collect()
    assert [r.features for r in rows] == [[1.0, 2.0], [3.0, 4.0]]
    rows2 = load_stream_csv(spark, str(p), contains_class=False).orderBy("id").collect()
    assert rows2[0].features == [1.0, 2.0, 7.0]


def test_slide_detector_diagnostics(gauss2d):
    import numpy as np

    from approximate_anomaly_detection_in_data_streams_spark.streaming.incremental import (
        SlideDetector,
    )

    det = SlideDetector(DetectorConfig(w=100, slide=20, r=0.5, k=8))
    ids = np.arange(1, 201)
    for s in range(0, 200, 20):
        det.process_batch(ids[s : s + 20], gauss2d[s : s + 20])
    assert len(det.diagnostics) == 10
    assert det.diagnostics[0]["window_size"] == 20
    assert det.diagnostics[-1]["window_size"] == 100  # W cap reached
    assert all(d["n_new"] == 20 for d in det.diagnostics)


def test_dedup_groups_multihop_chain(spark):
    """Label propagation must traverse chains (a-b, b-c, c-d => one
    component labeled by the minimum id), not just direct edges."""
    from approximate_anomaly_detection_in_data_streams_spark.operators.dedup import (
        dedup_groups,
    )

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (100, 200), (7, 40)],
        "id_a long, id_b long",
    )
    got = {r.id: r.group_id for r in dedup_groups(pairs).collect()}
    assert got == {7: 7, 10: 7, 20: 7, 30: 7, 40: 7, 100: 100, 200: 100}


def test_dedup_groups_deep_chain_converges_fast(spark):
    """A 200-node path graph must converge via pointer jumping in
    O(log n) rounds (max_rounds=12 would take 200 rounds without it)."""
    from approximate_anomaly_detection_in_data_streams_spark.operators.dedup import (
        dedup_groups,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 200)], "id_a long, id_b long"
    )
    got = dedup_groups(pairs, max_rounds=12).collect()
    assert len(got) == 200
    assert all(r.group_id == 1 for r in got)


def test_embedding_neardup_blocked_equals_bruteforce(spark):
    """The 2D block self-join must emit exactly the brute-force pair set
    (exact semantics, just distributed over block-pair tasks)."""
    import numpy as np
    from approximate_anomaly_detection_in_data_streams_spark.operators.dedup import (
        _round_half_away,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(3)
    X = rng.normal(size=(120, 16))
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_neardup_pairs(df, "vec_id", "embedding", 0.3, n_blocks=4).collect()
    }
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = _round_half_away(Xn @ Xn.T)
    exp = {}
    for i in range(len(X)):
        for j in range(i + 1, len(X)):
            if C[i, j] >= 0.3:
                exp[(i, j)] = C[i, j]
    assert got == exp and len(exp) > 0


def test_simhash_bucket_cap_bounds_hot_buckets(spark):
    """An adversarial corpus of near-identical docs concentrates one
    (piece, value) key; the deterministic cap must bound the candidate
    join (and capped output stays a subset with exact hamming values)."""
    from approximate_anomaly_detection_in_data_streams_spark.operators.dedup import (
        simhash_neardup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [(i, base + f" tail{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = simhash_neardup_pairs(
        df, "doc_id", "text", max_hamming=3, bucket_cap=50
    )
    n_capped = capped.count()
    # 7 distinct texts -> <= 7 values per piece; each capped bucket
    # contributes at most C(50,2) candidate pairs over 4 pieces
    assert 0 < n_capped <= 4 * 7 * (50 * 49 // 2)
    full = simhash_neardup_pairs(
        df, "doc_id", "text", max_hamming=3, bucket_cap=None
    )
    got_c = {(r.id_a, r.id_b): r.hamming for r in capped.collect()}
    got_f = {(r.id_a, r.id_b): r.hamming for r in full.collect()}
    assert set(got_c) <= set(got_f)
    assert all(got_f[k] == v for k, v in got_c.items())


def test_batch_diagnostics_match_streaming_engine(spark, gauss_points, gauss2d):
    """K3/A7 on the batch path: per-batch window population and arrival
    counts must equal the incremental engine's per-batch diagnostics."""
    from approximate_anomaly_detection_in_data_streams_spark.operators.detector import (
        batch_diagnostics,
    )
    from approximate_anomaly_detection_in_data_streams_spark.streaming.incremental import (
        SlideDetector,
    )
    import numpy as np

    cfg = DetectorConfig(w=100, slide=20, r=0.5, k=8)
    sub = gauss2d[:400]
    pts = spark.createDataFrame(
        [(i + 1, [float(a), float(b)]) for i, (a, b) in enumerate(sub)],
        "id long, features array<double>",
    )
    got = {r.b: r for r in batch_diagnostics(pts, cfg).collect()}
    det = SlideDetector(cfg)
    ids = np.arange(1, len(sub) + 1)
    for s in range(0, len(sub), cfg.slide):
        det.process_batch(ids[s : s + cfg.slide], sub[s : s + cfg.slide])
    assert len(got) == len(det.diagnostics)
    for d in det.diagnostics:
        row = got[d["batch"]]
        assert row.window_size == d["window_size"]
        assert row.n_new == d["n_new"]
    # expiries: nothing expires before the window fills, slide-size after
    assert got[1].n_expired == 0
    assert got[cfg.ws + 1].n_expired == cfg.slide


def test_srp_ann_recall_vs_bruteforce(spark, sf_dir):
    """SRP-LSH with Hamming-1 multi-probe must recall most of the exact
    cosine top-k (was unmeasured before round 2; 0.85 typical on the
    synthetic embeddings, floor set with headroom for scale variation)."""
    from approximate_anomaly_detection_in_data_streams_spark.operators import knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in knn.brute_force_topk(emb, queries, "vec_id", "embedding", 5).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in knn.srp_ann_topk(
            emb, queries, "vec_id", "embedding", dim=64, k=5
        ).collect()
    }
    assert len(brute & ann) / len(brute) >= 0.7


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    """IVF-Flat (nprobe=8 of nlist=32 buckets) must recall most of the
    exact cosine top-k; assignment buckets are deterministic (portable
    md5 codebook), so this is stable across runs."""
    from approximate_anomaly_detection_in_data_streams_spark.operators import knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in knn.brute_force_topk(emb, queries, "vec_id", "embedding", 5).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in knn.ivf_ann_topk(
            emb, queries, "vec_id", "embedding", dim=64, k=5
        ).collect()
    }
    assert len(brute & ann) / len(brute) >= 0.6


def test_ivf_lloyd_refinement_improves_recall(spark, sf_dir):
    """The distributed Lloyd-refined codebook (production tier) must not
    recall less than the md5-seed codebook at the same nprobe, and must
    clear the same floor. (Refined centroids follow the data distribution,
    so each probe covers a tighter candidate set — the standard IVF
    training effect; 2 iterations is enough to move the needle on the
    synthetic embeddings.)"""
    from approximate_anomaly_detection_in_data_streams_spark.operators import knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 20)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in knn.brute_force_topk(emb, queries, "vec_id", "embedding", 5).collect()
    }

    def recall(iters):
        ann = {
            (r.query_id, r.neighbor_id)
            for r in knn.ivf_ann_topk(
                emb, queries, "vec_id", "embedding", dim=64, k=5, lloyd_iters=iters
            ).collect()
        }
        return len(brute & ann) / len(brute)

    base, refined = recall(0), recall(2)
    assert refined >= 0.6
    assert refined >= base - 0.02  # refinement never costs material recall


def test_ivf_lloyd_partitioning_invariant(spark, sf_dir):
    """Refined codebooks keep the one-bucket-per-vector invariant and the
    (nlist, dim) unit-row shape."""
    import numpy as np

    from approximate_anomaly_detection_in_data_streams_spark.operators import knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    C = knn.ivf_centroids(emb, "vec_id", "embedding", nlist=16, lloyd_iters=1)
    assert C.shape == (16, 64)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)


def test_ivf_deterministic_lloyd_matches_sequential_replay(spark):
    """deterministic=True Lloyd refinement (ascending-id left-fold
    per-centroid sums) must reproduce the sequential NumPy replay
    BIT-FOR-BIT — codebook and full rounded top-k — on a small planted
    corpus. This is the same contract the ivf_ann_refined driver oracle
    checks at full size; the small shape keeps it in the unit suite."""
    import numpy as np

    from approximate_anomaly_detection_in_data_streams_spark.operators import knn
    from approximate_anomaly_detection_in_data_streams_spark.oracle.planted import (
        ivf_refined_truth,
    )
    from approximate_anomaly_detection_in_data_streams_spark.sources.vectors import (
        generate_vectors,
    )

    n, dim, seed, n_centers, nlist, nprobe, k, iters, nq = 400, 8, 17, 6, 8, 3, 4, 2, 12
    vecs = generate_vectors(spark, n, dim, seed, n_centers, partitions=7)
    queries = vecs.where(F.col("vec_id") < nq)
    got = [
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in knn.ivf_ann_topk(
            vecs, queries, "vec_id", "embedding", dim=dim, k=k,
            nlist=nlist, nprobe=nprobe, lloyd_iters=iters, deterministic=True,
        ).collect()
    ]
    want = [
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in ivf_refined_truth(
            n, dim, seed, n_centers, nlist, nprobe, k, iters, nq
        )
    ]
    assert got == want  # exact floats included — no tolerance
    # and the deterministic tier refines the same way the free-order tier
    # does (same math, different reduction order): codebooks agree closely
    C_det = knn.ivf_centroids(
        vecs, "vec_id", "embedding", nlist, lloyd_iters=iters, deterministic=True
    )
    C_free = knn.ivf_centroids(
        vecs, "vec_id", "embedding", nlist, lloyd_iters=iters
    )
    assert np.allclose(C_det, C_free, atol=1e-9)


def test_ivf_corpus_partitioning(spark, sf_dir):
    """Every corpus vector lands in exactly one centroid bucket, and the
    buckets cover the corpus (the one-shuffle IVF invariant)."""
    from approximate_anomaly_detection_in_data_streams_spark.operators import knn

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    C = knn.ivf_centroids(emb, "vec_id", "embedding", nlist=32)
    assert C.shape == (32, 64)
    assign = knn._ivf_probe_udf(C, 1)
    counts = (
        emb.select(F.col("vec_id"), assign(F.col("embedding"))[0].alias("cidx"))
        .groupBy("cidx")
        .count()
        .collect()
    )
    n = emb.count()
    assert sum(r["count"] for r in counts) == n
    assert all(0 <= r["cidx"] < 32 for r in counts)


def test_minhash_equals_exact_on_edge_corpus(spark):
    """MinHash banding + in-kernel verify must equal the exact inverted-
    index Jaccard join on an adversarial corpus: sub-n-length docs (zero
    shingles — excluded by both), unicode, exact duplicates, and a
    near-identical template cluster large enough to exercise the bucket
    block-split path."""
    from approximate_anomaly_detection_in_data_streams_spark.operators import dedup

    rows = [(1, "ab"), (2, "ab"), (3, "x"), (4, "")]  # < n chars: no shingles
    rows += [(10 + i, f"café con leche numero {i} por favor") for i in range(5)]
    # template cluster: 500 docs differing in one token
    rows += [
        (1000 + i, f"the quick brown fox jumps over the lazy dog variant {i:03d}")
        for i in range(500)
    ]
    rows += [(2000, "zz completely unique document about turnips zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.7).collect()
    }
    mh = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "text", 3, threshold=0.7, block_size=64
        ).collect()
    }
    assert mh == exact
    assert len(exact) > 1000  # the template cluster really is pairwise similar


def test_minhash_strategies_agree(spark):
    """The cost-based candidate strategies — 2-D blocked all-pairs sketch
    screen (small rep counts) and banded LSH (large) — must produce the
    SAME verified pair set on the same corpus: both are recall-bounded
    candidate generators in front of the same exact verify. Forcing
    allpairs_max_reps=0 exercises the banding path on a corpus the
    default would screen."""
    from approximate_anomaly_detection_in_data_streams_spark.operators import dedup

    rows = [(i, f"shared template body with tail token {i % 7} {i:04d}") for i in range(300)]
    rows += [(1000 + i, f"wholly distinct text number {i} about {i * 17}") for i in range(50)]
    rows += [(2000, "dup dup dup dup dup"), (2001, "dup dup dup dup dup")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    screen = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "text", 3, threshold=0.6, block_size=64
        ).collect()
    }
    banded = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "text", 3, threshold=0.6, block_size=64,
            allpairs_max_reps=0,
        ).collect()
    }
    assert screen == banded
    assert (2000, 2001, 1.0) in screen


def test_minhash_null_and_empty_text(spark):
    """NULL and empty texts are legal input on both strategy paths: they
    carry zero shingles, so they can never be a verified pair (the SQL
    oracle's semantics) — and they must not crash the signature kernel
    even when a null doc is its group's representative."""
    from approximate_anomaly_detection_in_data_streams_spark.operators import dedup

    rows = [(1, None), (2, ""), (3, None), (4, "a real document body here"),
            (5, "a real document body here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for extra in ({}, {"allpairs_max_reps": 0}):
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.minhash_lsh_pairs(
                df, "doc_id", "text", 3, threshold=0.5, block_size=64, **extra
            ).collect()
        }
        assert got == {(4, 5, 1.0)}


def test_plan_build_runs_no_jobs(spark, sf_dir):
    """With dim and n_total carried in DetectorConfig, constructing every
    detector query plan must trigger ZERO Spark jobs (no driver-blocking
    agg/first at plan-build time). Asserted via a dedicated job group."""
    from approximate_anomaly_detection_in_data_streams_spark.api import (
        approx_mclshod_config,
        lshod_config,
        run_detector,
    )
    from approximate_anomaly_detection_in_data_streams_spark.config import (
        DetectorConfig,
    )

    pts = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_id + 1 as id", "array(cast(value as double)) as features"
    )
    n = 10_000  # any positive value works for plan construction
    sc = spark.sparkContext
    sc.setJobGroup("plan-build", "assert no jobs during query construction")
    try:
        for cfg in (
            DetectorConfig(w=400, slide=100, r=15.0, k=10, dim=1, n_total=n),
            lshod_config(400, 100, 15.0, 10, dim=1, n_total=n),
            approx_mclshod_config(400, 100, 15.0, 10, dim=1, n_total=n),
            DetectorConfig(
                w=400, slide=100, r=15.0, k=10, algorithm="approx_mcod",
                pd_limit=300, ar_factor=0.3, dim=1, n_total=n,
            ),
        ):
            res = run_detector(pts, cfg)
            _ = res.outliers, res.stats  # plans only, never executed
    finally:
        sc.setJobGroup("done", "")
    jobs = sc.statusTracker().getJobIdsForGroup("plan-build")
    assert jobs == [], f"plan construction ran Spark jobs: {jobs}"


def test_simhash_fast_tier_preserves_hamming_geometry(spark):
    """The vectorized 'fast' shingle hash is a different member of the
    hash family than the portable md5 tier, but the hamming GEOMETRY must
    hold: identical docs at distance 0 (found as near-dups), distinct
    random docs far apart (not found), and planted one-edit near-dups
    overwhelmingly recovered under both tiers."""
    import numpy as np

    from approximate_anomaly_detection_in_data_streams_spark.operators import dedup

    rng = np.random.default_rng(5)
    vocab = [f"w{v}" for v in rng.integers(0, 10**9, size=5000)]
    docs = []
    for i in range(40):
        toks = list(rng.choice(vocab, size=120))
        base = " ".join(toks)
        if i % 2 == 0:
            variant = base  # exact duplicate
        else:
            toks2 = list(toks)
            toks2[60] = "edited"  # one-token edit out of 120
            variant = " ".join(toks2)
        docs.append((2 * i, base))
        docs.append((2 * i + 1, variant))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def pairs(hash_fn):
        return {
            (r["id_a"], r["id_b"])
            for r in dedup.simhash_neardup_pairs(
                df, "doc_id", "text", max_hamming=3, hash_fn=hash_fn
            ).collect()
        }

    got_md5 = pairs("md5")
    got_fast = pairs("fast")
    exact_dup_pairs = {(2 * i, 2 * i + 1) for i in range(40) if i % 2 == 0}
    # identical docs hash to identical signatures under ANY shingle hash
    assert exact_dup_pairs <= got_md5
    assert exact_dup_pairs <= got_fast
    # one-word-appended near-dups: most recovered under both tiers
    near_pairs = {(2 * i, 2 * i + 1) for i in range(40) if i % 2 == 1}
    assert len(near_pairs & got_md5) >= len(near_pairs) * 0.8
    assert len(near_pairs & got_fast) >= len(near_pairs) * 0.8
    # distinct random docs stay apart: found pairs are dominated by the
    # planted structure under both tiers (no hash-degeneracy explosion)
    planted = exact_dup_pairs | near_pairs
    assert not (got_md5 - planted)
    assert not (got_fast - planted)


@pytest.mark.slow
def test_minhash_50k_docs_bounded_driver(spark):
    """Adversarial scale check for the distributed MinHash verify (r3):
    50k documents with heavy duplication run end-to-end with NO corpus
    collect — planted exact-duplicate pairs must surface at jaccard 1.0,
    and the operator source must contain no driver-side text collection."""
    import inspect

    from pyspark.sql import functions as F

    from approximate_anomaly_detection_in_data_streams_spark.operators import dedup

    src = inspect.getsource(dedup.minhash_lsh_pairs)
    assert ".collect()" not in src  # the r2 scale-killer must stay dead

    n = 50_000
    # deterministic corpus: 500 distinct templates, each repeated 100x ->
    # massive band-bucket pressure (the worst case for LSH dedup)
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox template number "),
            (F.col("id") % 500).cast("string"),
            F.lit(" jumps over the lazy dog with some padding text"),
        ).alias("text"),
    )
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, threshold=0.9, bucket_cap=300
    )
    # verify is exact: every surviving pair really has jaccard >= 0.9
    # (template texts differing only in the trailing number legitimately
    # land at ~0.9; exact template copies land at 1.0)
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"), F.min("jaccard").alias("mn")
    ).first()
    assert agg["n"] > 10_000  # capped recall, but plenty of dup pairs found
    assert agg["mn"] >= 0.9
    sample = pairs.where(F.col("jaccard") == 1.0).limit(200).collect()
    assert sample
    for r in sample:
        assert r["id_a"] % 500 == r["id_b"] % 500  # 1.0 => same template
