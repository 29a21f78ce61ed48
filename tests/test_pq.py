"""IVF-PQ: recall vs brute force, determinism, code validity.

The embeddings fixture is near-isotropic 64-dim (the hard case for
PQ): raw ADC ranking tops out at ~0.28 top-5 recall at m=8/16 codes
(measured — per-subspace quantization error swamps neighbor score
gaps), so ``ivfpq_topk`` re-ranks the ADC shortlist with exact
cosine, the FAISS IndexRefine shape. With nprobe=4 of 8 cells the
recall ceiling of the probing stage itself is 0.74-0.78 (exact
scoring inside probed cells); the assertions below leave margin
under that ceiling.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_framework_spark.io import table
from flink_framework_spark.operators.pq import (
    ivfpq_topk,
    pq_codes,
    pq_train,
    _unit,
)
from flink_framework_spark.operators.similarity import (
    brute_force_topk,
    train_ivf_centroids,
)
from flink_framework_spark.functions.helpers import to_double_array


def test_pq_codes_in_range_and_deterministic(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    books = pq_train(em, m=8, n_codes=16)
    assert len(books) == 8 and all(len(b) <= 16 for b in books)
    assert pq_train(em, m=8, n_codes=16) == books  # bit-identical
    codes = em.select(
        pq_codes(_unit(to_double_array("embedding")), books).alias("c")
    ).collect()
    for r in codes:
        assert len(r.c) == 8
        assert all(0 <= ci < 16 for ci in r.c)


def test_ivfpq_recall_vs_brute_force(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 10)
    centroids = train_ivf_centroids(em, n_cells=8)
    books = pq_train(em, m=8, n_codes=64)
    approx = ivfpq_topk(
        queries, em, centroids, books, k=5, nprobe=4, rerank=64
    )
    exact = brute_force_topk(queries, em, k=5)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # probing ceiling at nprobe=4 is ~0.74-0.78 on this fixture; the
    # rerank pass tracks it closely (measured 0.74 sf0.001 / 0.76
    # sf0.01 in numpy replica)
    assert recall >= 0.6, recall
    # every query returns exactly k ranked neighbors
    from collections import Counter

    per_q = Counter(q for q, _ in a)
    assert set(per_q.values()) == {5}


def test_ivfpq_scores_close_to_cosine(spark, sf_dir):
    """Post-rerank scores ARE exact cosine — tolerance only covers
    the 4-decimal rounding both operators apply."""
    em = table(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 10)
    centroids = train_ivf_centroids(em, n_cells=8)
    books = pq_train(em, m=8, n_codes=64)
    approx = {
        (r.query_id, r.neighbor_id): r.score
        for r in ivfpq_topk(
            queries, em, centroids, books, k=5, nprobe=4, rerank=64
        ).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id): r.cosim
        for r in brute_force_topk(queries, em, k=50).collect()
    }
    errs = [abs(approx[p] - exact[p]) for p in approx if p in exact]
    assert errs, "no overlap to compare"
    assert max(errs) < 1e-3, max(errs)


def test_gemm_topk_equals_brute_force(spark, sf_dir):
    """The blocked-GEMM exact path returns the identical top-k as the
    sequential-fold brute force, regardless of corpus partitioning
    (per-batch pruning uses the global merge's own total order)."""
    from flink_framework_spark.operators.similarity import gemm_topk

    em = table(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 10)
    want = {
        (r.query_id, r.neighbor_id, r.cosim, r.rn)
        for r in brute_force_topk(q, em, k=5).collect()
    }
    for parts in (1, 7):
        got = {
            (r.query_id, r.neighbor_id, r.cosim, r.rn)
            for r in gemm_topk(q, em.repartition(parts), k=5).collect()
        }
        assert got == want, parts


def test_gemm_topk_query_cap_enforced(spark, sf_dir):
    from flink_framework_spark.operators.similarity import gemm_topk
    import pytest

    em = table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="query_cap"):
        gemm_topk(em, em, k=5, query_cap=10)
