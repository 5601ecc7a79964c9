"""Distributed k-means: convergence, determinism, label recovery, and
the trained-quantizer IVF path."""

from __future__ import annotations

import numpy as np
import pytest

from citegraph_spark.functions import clustering, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_kmeans_partitions_all_vectors(spark, emb):
    cents, assign = clustering.kmeans_fit(emb, k=8, max_iter=5)
    assert cents.shape == (8, 64)
    rows = assign.collect()
    assert len(rows) == emb.count()
    assert all(0 <= r["cell"] < 8 and r["sq_dist"] >= 0.0 for r in rows)


def test_kmeans_iterations_reduce_inertia(spark, emb):
    def inertia(iters: int) -> float:
        _, assign = clustering.kmeans_fit(emb, k=8, max_iter=iters, tol=0.0)
        return assign.groupBy().sum("sq_dist").first()[0]

    # Lloyd's is monotone non-increasing in inertia
    assert inertia(4) <= inertia(1) + 1e-6


def test_kmeans_beats_trivial_clustering(spark, emb):
    """Fitted k=10 inertia must beat the k=1 (global-mean) inertia by at
    least the amount k-means can extract from near-uniform data. (The
    synthetic embeddings are ~uniform in 64-d — a perfect nearest-label-
    centroid classifier scores only ~0.37 — so label recovery is not a
    valid expectation, and the theoretical variance reduction for k
    clusters in d dims is only ~1 - k^(2/d) ≈ 7 %.)"""
    def total_inertia(k: int) -> float:
        _, assign = clustering.kmeans_fit(emb, k=k, max_iter=6)
        return assign.groupBy().sum("sq_dist").first()[0]

    assert total_inertia(10) < 0.95 * total_inertia(1)


def test_kmeans_deterministic_under_repartition(spark, emb):
    a, _ = clustering.kmeans_fit(emb, k=6, max_iter=3)
    b, _ = clustering.kmeans_fit(emb.repartition(7), k=6, max_iter=3)
    # same seeds, same assignments; only fp summation order may differ
    assert np.allclose(a, b, atol=1e-9)


def test_ivf_trained_quantizer_recall(spark, emb):
    sub = emb.limit(200)
    bf = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.cosine_topk_bruteforce(sub, k=1).collect()
    }
    cents, _ = clustering.kmeans_fit(sub, k=8, max_iter=4)
    ivf = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.ivf_topk(
            sub, k=1, n_cells=8, n_probe=2, centroids=cents
        ).collect()
    }
    hits = sum(1 for v, n in bf.items() if ivf.get(v) == n)
    assert hits / len(bf) >= 0.3, f"trained-IVF recall too low: {hits}/{len(bf)}"


def test_pq_topk_recall_vs_bruteforce(spark, emb):
    sub = emb.limit(200)
    bf = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.cosine_topk_bruteforce(sub, k=1).collect()
    }
    pq = {
        r["vec_id"]: r["neighbor_id"]
        for r in similarity.pq_topk(sub, k=1, shortlist=32).collect()
    }
    # ADC top-32 shortlist + exact rerank: the true top-1 must appear in
    # the shortlist for most queries even on hard (near-random) vectors
    hits = sum(1 for v, n in bf.items() if pq.get(v) == n)
    assert hits / len(bf) >= 0.5, f"PQ recall too low: {hits}/{len(bf)}"


def test_pq_codes_shape_and_determinism(spark, emb):
    from citegraph_spark.functions.similarity import (
        _corpus_matrix,
        _pq_codebooks,
        _pq_encode_matrix,
    )

    sub = emb.limit(100)
    books1 = _pq_codebooks(sub, 16, 16, "vec_id", "embedding")
    books2 = _pq_codebooks(sub.repartition(5), 16, 16, "vec_id", "embedding")
    assert np.allclose(books1, books2)
    _, mat = _corpus_matrix(sub, "vec_id", "embedding")
    codes = _pq_encode_matrix(mat, books1)
    assert codes.shape == (100, 16) and codes.dtype == np.uint8
    assert codes.max() < 16
