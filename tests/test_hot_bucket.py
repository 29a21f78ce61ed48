"""Hot-bucket guards for the LSH band joins and the celled GEMM
pair kernel (r11, VERDICT r10 #4): a degenerate corpus that lands an
unbounded number of near-identical members in one (band, bucket) /
cell must NOT go quadratic. The guard salts super-buckets into
bounded sub-groups and bridges consecutive sub-group representatives,
so pair output is O(m * cap) while cluster-level connectivity
survives. These tests plant the degenerate corpus, pin the pair-count
bound, the connectivity, and the exactness of the default
(never-firing) cap on the real fixtures."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _components(pairs):
    """Union-find over (a, b) pairs -> {node: root}."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return {n: find(n) for n in parent}


@pytest.fixture(scope="module")
def degenerate_docs(spark):
    """2000 byte-identical documents + 5 distinct ones: every band of
    the identical docs' MinHash signatures collides into ONE bucket."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, text) for i in range(2000)] + [
        (10_000 + i, f"totally different content number {i} " * 5)
        for i in range(5)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_super_bucket_bounded_and_connected(degenerate_docs):
    from flink_framework_spark.operators.dedup import minhash_candidates

    cap = 50
    got = minhash_candidates(degenerate_docs, bucket_cap=cap).collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in got]
    m = 2000
    # quadratic would be m*(m-1)/2 = 1_999_000; the guard bounds the
    # super-bucket at ~m*cap/2 within-group pairs + g-1 bridges
    assert 0 < len(pairs) < 4 * m * cap / 2, len(pairs)
    # cluster connectivity: all 2000 identical docs in ONE component
    comp = _components(pairs)
    ident_roots = {comp[i] for i in range(m) if i in comp}
    assert len(ident_roots) == 1
    assert all(i in comp for i in range(m))
    # the 5 distinct docs never pair with the identical cluster
    assert not any(
        (a >= 10_000) != (b >= 10_000) for a, b in pairs
    )


def test_minhash_guard_preserves_verified_dedup(degenerate_docs):
    """End-to-end: the verified near-dup pair set under the guard
    still marks every identical doc as a duplicate of something
    (jaccard == 1.0 on every surviving pair)."""
    from flink_framework_spark.operators.dedup import near_dup_pairs_minhash

    out = near_dup_pairs_minhash(degenerate_docs).collect()
    assert all(abs(r["jaccard"] - 1.0) < 1e-12 for r in out)
    comp = _components([(r["doc_a"], r["doc_b"]) for r in out])
    assert {comp[i] for i in range(2000)} == {comp[0]}


def test_minhash_default_cap_never_fires_on_fixture(spark, sf_dir):
    """On the real corpus (max bucket size 4 at sf0.1) the default
    cap must be a byte-identical no-op vs the unguarded join — this
    is what keeps the live DuckDB oracles exact."""
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.dedup import minhash_candidates

    docs = table(spark, sf_dir, "documents")
    guarded = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates(docs).collect()
    }
    plain = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates(docs, bucket_cap=None).collect()
    }
    assert guarded == plain and plain


def test_cell_near_dup_super_cell_bounded_and_connected(spark):
    from flink_framework_spark.operators.similarity import (
        cell_near_dup_pairs,
    )

    m = 1000
    base = [0.6, 0.8] + [0.0] * 6
    rows = [(i, base) for i in range(m)] + [
        (10_000, [1.0] + [0.0] * 7),
        (10_001, [0.0] * 7 + [1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cap = 40
    out = cell_near_dup_pairs(
        df, threshold=0.9, cells=F.array(F.lit(0)), cell_cap=cap
    ).collect()
    pairs = [(r["vec_a"], r["vec_b"]) for r in out]
    assert 0 < len(pairs) < 4 * m * cap / 2, len(pairs)
    assert all(abs(r["cos"] - 1.0) < 1e-9 for r in out
               if r["vec_a"] < m and r["vec_b"] < m)
    comp = _components(pairs)
    assert {comp[i] for i in range(m)} == {comp[0]}
    # orthogonal outliers share the cell but never cross the threshold
    assert 10_000 not in comp and 10_001 not in comp


def test_cell_near_dup_default_cap_noop_on_fixture(spark, sf_dir):
    """Guarded vs unguarded equality on the real embeddings under the
    shipped IMI blocking — the oracle-exactness invariant."""
    import math

    from flink_framework_spark.functions.helpers import to_double_array
    from flink_framework_spark.io import table
    from flink_framework_spark.operators.similarity import (
        _imi_probes_vec,
        cell_near_dup_pairs,
        train_imi,
    )

    emb = table(spark, sf_dir, "embeddings")
    n = emb.count()
    books = train_imi(emb, k_per_half=max(3, math.ceil(math.sqrt(n / 250))))
    cells = _imi_probes_vec(books, 4)(to_double_array("embedding"))

    def run(cap):
        return {
            (r["vec_a"], r["vec_b"], round(r["cos"], 9))
            for r in cell_near_dup_pairs(
                emb, threshold=0.4, cells=cells, cell_cap=cap
            ).collect()
        }

    guarded, plain = run(4096), run(None)
    assert guarded == plain and plain
